package graft.analytics

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audits over the warehouse tables — the constraint checks
  * a 100 TB ingest pipeline runs after every load (the reference's
  * health check, health.rs:40-60, probes only row counts; these are the
  * referential and profiling checks its SCHEMA.md foreign keys imply).
  *
  * Scale shape: each audit is one pass over the audited fact table.
  * Foreign-key checks are LEFT joins against deduplicated key sets —
  * dimension keys broadcast, the one big-big check (lineitem→orders)
  * shuffles on the join key exactly once; null-counting happens in the
  * same aggregate, so no per-check rescan. Profiling is a single
  * grouped-free aggregate (partial-aggregable counts), then a constant
  * `stack` unpivot of the 1-row result.
  */
object Audit extends QueryModule {

  /** FK orphan counts, testable on injected frames. Key sides are
    * deduplicated so a (corrupt) duplicated parent key can never inflate
    * the scanned-row accounting via join fan-out. */
  def referentialOn(li: DataFrame, ord: DataFrame, part: DataFrame,
      supp: DataFrame, cust: DataFrame): DataFrame = {
    def keys(df: DataFrame, k: String, flag: String): DataFrame =
      df.select(col(k)).distinct().withColumn(flag, lit(1))
    val liChecked = li
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(keys(ord, "o_orderkey", "ok_o"),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(broadcast(keys(part, "p_partkey", "ok_p")),
        col("l_partkey") === col("p_partkey"), "left")
      .join(broadcast(keys(supp, "s_suppkey", "ok_s")),
        col("l_suppkey") === col("s_suppkey"), "left")
      .agg(
        count(lit(1)).as("li_n"),
        count(when(col("ok_o").isNull, 1)).as("orph_o"),
        count(when(col("ok_p").isNull, 1)).as("orph_p"),
        count(when(col("ok_s").isNull, 1)).as("orph_s"))
    val ordChecked = ord
      .select(col("o_custkey"))
      .join(broadcast(keys(cust, "c_custkey", "ok_c")),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(
        count(lit(1)).as("ord_n"),
        count(when(col("ok_c").isNull, 1)).as("orph_c"))
    // 1-row × 1-row scalar assembly, then a constant unpivot
    liChecked.crossJoin(ordChecked).selectExpr(
      """stack(4,
        |  'lineitem->orders',   li_n,  orph_o,
        |  'lineitem->part',     li_n,  orph_p,
        |  'lineitem->supplier', li_n,  orph_s,
        |  'orders->customer',   ord_n, orph_c) AS (fk, scanned, orphans)
        |""".stripMargin)
      .orderBy(col("fk"))
  }

  /** Per-column null / distinct / blank profile of `events` in ONE scan
    * (Deequ-style column profiling): the multi-countDistinct plans as a
    * single Expand + aggregate, so the fact table is read once however
    * many columns are profiled. */
  def eventsProfile(events: DataFrame): DataFrame = {
    def nulls(c: String): Column = count(when(col(c).isNull, 1)).as(s"null_$c")
    def dist(c: String): Column = countDistinct(col(c)).as(s"dist_$c")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val agg1 = events.agg(
      count(lit(1)).as("n"),
      cols.map(nulls) ++ cols.map(dist): _*)
    val stackArgs = cols
      .map(c => s"'$c', null_$c, dist_$c")
      .mkString(s"stack(${cols.size},\n", ",\n", ") AS (column_name, n_null, n_distinct)")
    agg1.selectExpr("n AS n_rows", stackArgs)
      .select(col("column_name"), col("n_rows"), col("n_null"), col("n_distinct"))
      .orderBy(col("column_name"))
  }

  override val defs: Seq[(String, Q)] = Seq(

    // FK audit across the star: 2 fact scans total (lineitem once for 3
    // checks, orders once), orphan rows counted per declared FK edge.
    "audit_referential" -> Q(
      (s, dir) => referentialOn(
        Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.part(s, dir),
        Tables.supplier(s, dir), Tables.customer(s, dir)),
      Some("""SELECT 'lineitem->orders' AS fk,
             |       (SELECT count(*) FROM lineitem) AS scanned,
             |       (SELECT count(*) FROM lineitem l
             |         WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                           WHERE o.o_orderkey = l.l_orderkey)) AS orphans
             |UNION ALL
             |SELECT 'lineitem->part',
             |       (SELECT count(*) FROM lineitem),
             |       (SELECT count(*) FROM lineitem l
             |         WHERE NOT EXISTS (SELECT 1 FROM part p
             |                           WHERE p.p_partkey = l.l_partkey))
             |UNION ALL
             |SELECT 'lineitem->supplier',
             |       (SELECT count(*) FROM lineitem),
             |       (SELECT count(*) FROM lineitem l
             |         WHERE NOT EXISTS (SELECT 1 FROM supplier sp
             |                           WHERE sp.s_suppkey = l.l_suppkey))
             |UNION ALL
             |SELECT 'orders->customer',
             |       (SELECT count(*) FROM orders),
             |       (SELECT count(*) FROM orders o
             |         WHERE NOT EXISTS (SELECT 1 FROM customer c
             |                           WHERE c.c_custkey = o.o_custkey))
             |ORDER BY fk""".stripMargin),
      doc = "post-load FK audit: orphan counts per declared foreign-key edge"),

    // Column profile of the event stream: nulls + exact distincts per
    // column, one scan.
    "audit_events_profile" -> Q(
      (s, dir) => eventsProfile(Tables.events(s, dir)),
      Some("""SELECT column_name, n_rows, n_null, n_distinct FROM (
             |  SELECT 'event_id' AS column_name, count(*) AS n_rows,
             |         count(*) FILTER (WHERE event_id IS NULL) AS n_null,
             |         count(DISTINCT event_id) AS n_distinct FROM events
             |  UNION ALL
             |  SELECT 'ts', count(*),
             |         count(*) FILTER (WHERE ts IS NULL),
             |         count(DISTINCT ts) FROM events
             |  UNION ALL
             |  SELECT 'user_id', count(*),
             |         count(*) FILTER (WHERE user_id IS NULL),
             |         count(DISTINCT user_id) FROM events
             |  UNION ALL
             |  SELECT 'event_type', count(*),
             |         count(*) FILTER (WHERE event_type IS NULL),
             |         count(DISTINCT event_type) FROM events
             |  UNION ALL
             |  SELECT 'value', count(*),
             |         count(*) FILTER (WHERE value IS NULL),
             |         count(DISTINCT value) FROM events
             |  UNION ALL
             |  SELECT 'props', count(*),
             |         count(*) FILTER (WHERE props IS NULL),
             |         count(DISTINCT props) FROM events
             |) ORDER BY column_name""".stripMargin),
      doc = "Deequ-style one-scan column profile: nulls + exact distincts"),
  )
}
