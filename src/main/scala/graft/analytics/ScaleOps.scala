package graft.analytics

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** The 100 TB-scale variants of the exact operators (SURVEY.md §2.4 A4:
  * "at 100 TB: approx_count_distinct (HLL)"): sketch-based distincts and
  * quantiles. The built-in sketches carry no DuckDB oracle (their
  * internals are engine-specific); ScaleOpsSpec bounds them against the
  * exact answers instead. The engine's OWN HLL is oracle-checked — its
  * md5-derived hash and integer-exact estimator replay in SQL.
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

    // Exact-quantile twin of evt_approx_stats' percentile_approx half:
    // type-1 p50/p99 of `value` per event_type by integer rank selection
    // (row ceil(q·n) of the (value, event_id)-sorted group). Gives the
    // sketch query an oracle-checked exact counterpart (the same pairing
    // discipline as evt_hll_program_reach for HLL): the approx result is
    // bounded against THIS in ScaleOpsSpec, and THIS is hash-compared
    // against DuckDB. Selection picks an existing double (no
    // interpolation), so parity is exact; round only on output. The
    // oracle window orders NULLS FIRST to match Spark's ASC default
    // (DuckDB defaults NULLS LAST) — moot on this fixture, load-bearing
    // the day dirty data brings a null value.
    "evt_value_quantiles" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        Tables.events(s, dir)
          .select(col("event_type"), col("event_id"), col("value"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1))
            .over(Window.partitionBy(col("event_type"))))
          .groupBy(col("event_type"))
          .agg(
            max(col("n")).as("n_events"),
            round(max(when(col("rk") === expr("(n * 50 + 99) div 100"), col("value"))), 4)
              .as("p50_value"),
            round(max(when(col("rk") === expr("(n * 99 + 99) div 100"), col("value"))), 4)
              .as("p99_value"))
          .orderBy(col("event_type"))
      },
      Some("""WITH r AS (
             |  SELECT event_type, value,
             |    ROW_NUMBER() OVER (PARTITION BY event_type
             |      ORDER BY value NULLS FIRST, event_id) AS rk,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events)
             |SELECT event_type, max(n) AS n_events,
             | round(max(CASE WHEN rk = (n * 50 + 99) // 100 THEN value END), 4) AS p50_value,
             | round(max(CASE WHEN rk = (n * 99 + 99) // 100 THEN value END), 4) AS p99_value
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "exact per-type value quantiles (oracle-checked twin of the sketch)"),

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
    // buffers per group. The oracle RE-IMPLEMENTS the sketch in SQL
    // (60-bit md5 hash → 4096 registers → integer-exact estimator with
    // linear-counting correction): a full differential test of the
    // custom aggregate, possible because the estimate is deterministic
    // by construction (max-merge registers + integer register sum).
    "evt_hll_program_reach" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            graft.functions.HllAggregate.hll_distinct(col("user_id")).as("hll_wallets"))
          .orderBy(col("cnt").desc, col("event_type")),
      // p=12: m=4096 buckets on the top 12 of 60 hash bits, 48-bit rank
      // window, scale 2^49; e-notation literals force DOUBLE (a bare
      // 1.079 is DECIMAL in DuckDB and would divide differently).
      Some("""WITH h AS (
             |  SELECT event_type,
             |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
             |  FROM events),
             |regs AS (
             |  SELECT event_type, h >> 48 AS j,
             |    max(49 - CASE WHEN (h & 281474976710655) = 0 THEN 0
             |          ELSE length(bin(h & 281474976710655)) END) AS r
             |  FROM h GROUP BY 1, 2),
             |counts AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
             |allregs AS (
             |  SELECT b.event_type, b.j, coalesce(regs.r, 0) AS r
             |  FROM (SELECT c.event_type, g.j
             |        FROM counts c, UNNEST(generate_series(0, 4095)) AS g(j)) b
             |  LEFT JOIN regs ON regs.event_type = b.event_type AND regs.j = b.j),
             |est AS (
             |  SELECT event_type,
             |    CAST(sum(CAST(1 AS BIGINT) << (49 - r)) AS DOUBLE) AS s,
             |    count(*) FILTER (WHERE r = 0) AS zeros
             |  FROM allregs GROUP BY 1)
             |SELECT c.event_type, c.cnt,
             |  CAST(CASE WHEN (0.7213e0 / (1e0 + 1.079e0 / 4096)) * 4096 * 4096 * 562949953421312e0 / s <= 2.5e0 * 4096
             |             AND zeros > 0
             |    THEN round(4096 * ln(4096e0 / zeros))
             |    ELSE round((0.7213e0 / (1e0 + 1.079e0 / 4096)) * 4096 * 4096 * 562949953421312e0 / s) END AS BIGINT)
             |    AS hll_wallets
             |FROM counts c JOIN est USING (event_type)
             |ORDER BY cnt DESC, event_type""".stripMargin),
      doc = "custom TypedImperativeAggregate HLL sketch, oracle-rederived in SQL (SURVEY §7.3)"),
  )
}
