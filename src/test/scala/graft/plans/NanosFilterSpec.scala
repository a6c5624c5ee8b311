package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Gates for [[NanosFilterRule]]: the loader's nanos view of a
  * timestamp-encoded `ts` must (a) keep exact filter semantics for every
  * comparison op at non-micros-aligned nanos bounds, and (b) reach the
  * parquet scan as a pushed attribute filter (row-group pruning at
  * 100 TB), not as post-scan expression work. */
class NanosFilterSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture written the way the round-7 testdata encodes `ts`
    * (TIMESTAMP(MICROS), isAdjustedToUTC=false → TIMESTAMP_NTZ): rows at
    * 0, 1, 999, 1000, 1500, 86400e6 micros. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    Seq(0L, 1L, 999L, 1000L, 1500L, 86400000000L).zipWithIndex
      .toDF("us", "id")
      .select(col("id").cast("long").as("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }
  private val MicrosFixture = Seq(0L, 1L, 999L, 1000L, 1500L, 86400000000L)

  test("loader presents timestamp-encoded ts as int64 epoch-nanos") {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    assert(df.select("ts").as[Long].collect().sorted.toSeq ==
      MicrosFixture.map(_ * 1000L).sorted)
  }

  test("every comparison op matches brute-force at unaligned nanos bounds") {
    val df = Tables.load(spark, dir, "events").cache()
    try {
      // bounds straddling the micros grid: aligned, ±1 ns, mid-micro
      val bounds = Seq(0L, 1L, 999L, 1000L, 1001L, 999000L, 999001L,
        999999L, 1000000L, 1000001L, 1499999L, 1500000L, 1500001L)
      for (b <- bounds) {
        def ids(c: org.apache.spark.sql.Column): Seq[Long] =
          df.filter(c).select("event_id").as[Long].collect().sorted.toSeq
        def brute(p: Long => Boolean): Seq[Long] =
          MicrosFixture.map(_ * 1000L).zipWithIndex
            .collect { case (ns, i) if p(ns) => i.toLong }.sorted
        assert(ids(col("ts") >= b) == brute(_ >= b), s">= $b")
        assert(ids(col("ts") > b) == brute(_ > b), s"> $b")
        assert(ids(col("ts") < b) == brute(_ < b), s"< $b")
        assert(ids(col("ts") <= b) == brute(_ <= b), s"<= $b")
        assert(ids(col("ts") === b) == brute(_ == b), s"=== $b")
        assert(ids(lit(b) <= col("ts")) == brute(_ >= b), s"mirrored <= $b")
        assert(ids(lit(b) > col("ts")) == brute(_ < b), s"mirrored > $b")
      }
    } finally df.unpersist()
  }

  test("negative (pre-1970) micros: floorDiv bounds stay exact for every op") {
    // floorDiv vs truncating division differ exactly here — a /1000 that
    // truncates toward zero would shift every pre-epoch bound by one
    val d = java.nio.file.Files.createTempDirectory("graft_nanos_neg").toString
    val negMicros = Seq(-86400000000L, -1500L, -1000L, -999L, -1L, 0L, 1L, 999L)
    negMicros.zipWithIndex.toDF("us", "id")
      .select(col("id").cast("long").as("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val df = Tables.load(spark, d, "events").cache()
    try {
      val bounds = Seq(-86400000000001L, -86400000000000L, -1500001L,
        -1500000L, -1499999L, -1000001L, -1000000L, -999999L, -1001L,
        -1000L, -999L, -1L, 0L, 1L)
      for (b <- bounds) {
        def ids(c: org.apache.spark.sql.Column): Seq[Long] =
          df.filter(c).select("event_id").as[Long].collect().sorted.toSeq
        def brute(p: Long => Boolean): Seq[Long] =
          negMicros.map(_ * 1000L).zipWithIndex
            .collect { case (ns, i) if p(ns) => i.toLong }.sorted
        assert(ids(col("ts") >= b) == brute(_ >= b), s">= $b")
        assert(ids(col("ts") > b) == brute(_ > b), s"> $b")
        assert(ids(col("ts") < b) == brute(_ < b), s"< $b")
        assert(ids(col("ts") <= b) == brute(_ <= b), s"<= $b")
        assert(ids(col("ts") === b) == brute(_ == b), s"=== $b")
      }
    } finally df.unpersist()
  }

  test("IN-lists and null-safe equality rewrite exactly (incl. unaligned elements)") {
    val df = Tables.load(spark, dir, "events").cache()
    try {
      def ids(c: org.apache.spark.sql.Column): Seq[Long] =
        df.filter(c).select("event_id").as[Long].collect().sorted.toSeq
      def brute(p: Long => Boolean): Seq[Long] =
        MicrosFixture.map(_ * 1000L).zipWithIndex
          .collect { case (ns, i) if p(ns) => i.toLong }.sorted
      // mixed aligned/unaligned IN: unaligned members can never match
      val inSet = Seq(0L, 1000000L, 1000001L, 1500000L)
      assert(ids(col("ts").isin(inSet: _*)) == brute(inSet.contains))
      assert(ids(!col("ts").isin(inSet: _*)) == brute(ns => !inSet.contains(ns)))
      // null-safe equality: aligned matches, unaligned is constant FALSE
      assert(ids(col("ts") <=> lit(1500000L)) == brute(_ == 1500000L))
      assert(ids(col("ts") <=> lit(1500001L)) == Seq.empty)
      assert(ids(!(col("ts") <=> lit(1500001L))) == brute(_ => true))
    } finally df.unpersist()
    // the IN rewrite reaches the scan as a pushed In filter (checked
    // after unpersist — a live cache would hide the parquet scan)
    val inSet = Seq(0L, 1000000L, 1000001L, 1500000L)
    val q = Tables.load(spark, dir, "events").filter(col("ts").isin(inSet: _*))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("In(ts,"), p)
  }

  test("nanos range predicate reaches the parquet scan as a pushed filter") {
    val df = Tables.load(spark, dir, "events")
      .filter(col("ts") >= lit(1000000L) && col("ts") < lit(86400000000000L))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"), p)
    assert(p.contains("LessThan(ts,"), p)
  }

  test("the real events table pushes its sliding-window bound to the scan") {
    val df = Tables.events(spark, Sf).filter(col("ts") >= Tables.WeekAgoNs)
      .groupBy(col("event_type")).count()
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(ts,"), p)
  }
}
