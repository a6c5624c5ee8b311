package graft.analytics

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** The 100 TB-scale variants of the exact operators (SURVEY.md §2.4 A4:
  * "at 100 TB: approx_count_distinct (HLL)"): sketch-based distincts and
  * quantiles. No DuckDB oracle — sketch outputs are engine-specific by
  * design; ScaleOpsSpec bounds them against the exact answers instead.
  */
object ScaleOps extends QueryModule {

  override val defs: Seq[(String, Q)] = Seq(

    // HLL++ distincts + approximate quantiles in one pass — the form the
    // exact multi-distinct queries take when the key set no longer fits
    // a hash table per group.
    "evt_approx_stats" -> Q(
      (s, dir) =>
        Tables.events(s, dir).agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          approx_count_distinct(col("event_type")).as("approx_types"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_value"),
          percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99_value")),
      None,
      doc = "HLL++ multi-distinct + approx quantiles (scale path of A4)"),

    // Sketch-based per-group distincts (the A3 shape at scale).
    "evt_approx_program_reach" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_wallets"))
          .orderBy(col("cnt").desc, col("event_type")),
      None,
      doc = "per-group HLL distinct (scale path of A3)"),

    // Same shape through the engine's OWN TypedImperativeAggregate HLL
    // sketch (graft.functions.HllAggregate) — constant-size mergeable
    // buffers per group.
    "evt_hll_program_reach" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            graft.functions.HllAggregate.hll_distinct(col("user_id")).as("hll_wallets"))
          .orderBy(col("cnt").desc, col("event_type")),
      None,
      doc = "custom TypedImperativeAggregate HLL sketch (SURVEY §7.3)"),
  )
}
