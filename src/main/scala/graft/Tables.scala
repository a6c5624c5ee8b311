package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Central table loaders + the fixed time anchor used by every
  * time-relative query.
  *
  * The reference anchors its period predicates on `CURRENT_DATE` / `NOW()`
  * (/root/reference/src/analytics.rs:272,292,335) — the #1 nondeterminism
  * trap for differential testing (SURVEY.md §7.4). We re-anchor every
  * relative predicate to a fixed literal instant inside the testdata's
  * time range so Spark and the DuckDB oracle agree bit-for-bit.
  */
object Tables {

  /** Engine-wide time convention (FIXTURES.md §1): `events.ts` is an
    * int64 EPOCH-NANOS column everywhere downstream — all comparisons on
    * int64 nanos, all bucketing on micros (`ts div 1000`), identically
    * truncated on both engines (DuckDB gets nanos via `epoch_ns(ts)`).
    *
    * The parquet encoding of `ts` has varied across testdata generations
    * (INT64 TIMESTAMP(NANOS) read as bigint under
    * `spark.sql.legacy.parquet.nanosAsLong`; now TIMESTAMP(MICROS) read
    * as TIMESTAMP_NTZ), so the loader NORMALIZES: any timestamp-typed
    * `ts` is converted to epoch-nanos bigint at the scan edge
    * (`unix_micros · 1000`; the session is pinned UTC so the NTZ→instant
    * cast is identity). Downstream never sees the physical encoding.
    * Range predicates on the derived nanos column are restored to the
    * scan as native timestamp pushdown by [[graft.plans.NanosFilterRule]].
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType != org.apache.spark.sql.types.LongType =>
        graft.plans.NanosFilter.register(spark)
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case _ => df
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  // ---- fixed time anchor (UTC). Testdata events span 2024-01-01..-30. ----
  private val NanosPerDay = 86400L * 1000000000L
  /** 2024-01-16T00:00:00Z in epoch-nanos — plays the role of CURRENT_DATE. */
  val AnchorNs: Long = 1705363200L * 1000000000L
  val AnchorNextDayNs: Long = AnchorNs + NanosPerDay        // 2024-01-17
  val WeekAgoNs: Long = AnchorNs - 7 * NanosPerDay          // 2024-01-09
  val MonthAgoNs: Long = AnchorNs - 30 * NanosPerDay        // 2023-12-17
  val DayBeforeAnchorNs: Long = AnchorNs - NanosPerDay      // 2024-01-15 (24h window start)

  // ---- shared column helpers over the nanos `ts` ----
  /** ts (epoch nanos, bigint) → TimestampType at micros precision; `div`
    * is exact integral division (a double roundtrip would lose nanos at
    * 2^60 magnitudes). */
  def tsTimestamp(): Column = expr("timestamp_micros(ts div 1000)")
  /** Day bucket as 'yyyy-MM-dd' string (string output avoids parquet
    * date/timestamp physical-type skew between Spark and DuckDB results). */
  def tsDay(): Column = date_format(tsTimestamp(), "yyyy-MM-dd")
  def tsHour(): Column = hour(tsTimestamp())

  /** JSON prop `k` extracted as int — the stand-in for the reference's
    * `raw_payload->>'…'` JSONB path queries (analytics.rs:367,461,538). */
  def propK(): Column = get_json_object(col("props"), "$.k").cast("int")

  /** Repartition-if-narrow: a small-file input plans as ONE split, which
    * serializes all per-row expression work (regexp tokenizers, vector
    * math, JSON parsing) onto a single core until the first shuffle. A
    * production scan of a large table already carries ≥ cores splits —
    * then this is a no-op and no shuffle is paid; only narrow scans pay
    * one small shuffle to engage every core. Use ahead of per-row-heavy
    * stages, never as a blanket default. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
