package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.ingest.Backfill
import org.apache.spark.sql.functions._

/** The S13 warehouse axis over a REAL SQL database (embedded Derby):
  * the reference's actual sink is Postgres (warehouse.rs:41-139), so
  * the axis must be proven beyond file formats — same pipeline, same
  * replay-guard semantics, a database as the sink value. */
class JdbcWarehouseSpec extends SparkSpec {

  private def derbyUrl(): String = {
    val dir = Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("backfill replay guard holds over a JDBC sink (S13 beyond files)") {
    val wh = JdbcWarehouse(derbyUrl(), "events")
    val sink = Backfill.JdbcSink(wh)
    Backfill.runTo(spark, 1L, 101L, workers = 4, sink)
    val first = wh.readIfAny(spark).get
    val n1 = first.count()
    assert(n1 > 0)
    // distinct event ids == rows (the upsert key holds in the DB too)
    assert(first.select("event_id").distinct().count() == n1)
    // identical replay → no-op (event-level anti-join against the DB,
    // slot predicate pushed to the database's WHERE)
    Backfill.runTo(spark, 1L, 101L, workers = 4, sink)
    assert(wh.readIfAny(spark).get.count() == n1)
    // overlapping extension adds exactly the new slots' events
    Backfill.runTo(spark, 50L, 151L, workers = 4, sink)
    val ext = wh.readIfAny(spark).get
    assert(ext.count() > n1)
    assert(ext.select("event_id").distinct().count() == ext.count())
    import spark.implicits._
    assert(ext.agg(max($"slot")).as[Long].head() == 150L)
  }

  test("jdbc upsert = ON CONFLICT DO UPDATE: last-write-wins per key, " +
      "transactional per partition") {
    import spark.implicits._
    // column-precise DDL through the createTableColumnTypes leg of the
    // axis (a production table pins widths; the dialect default is max)
    val wh = JdbcWarehouse(derbyUrl(), "kv",
      createColumnTypes = Some("k VARCHAR(16), payload VARCHAR(64)"))
    wh.upsert(Seq(("a", 1L, "v1"), ("b", 1L, "v1"))
      .toDF("k", "version", "payload"), "k", "version")
    val s1 = wh.readIfAny(spark).get.orderBy("k").collect()
    assert(s1.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("a", 1L, "v1"), ("b", 1L, "v1")))
    // replay with a CHANGED payload + a new key: conflicting keys take
    // the newer version, new keys insert — and a batch carrying BOTH
    // versions of one key resolves before touching the database
    wh.upsert(Seq(("a", 2L, "v2"), ("a", 1L, "stale"), ("c", 1L, "v1"))
      .toDF("k", "version", "payload"), "k", "version")
    val s2 = wh.readIfAny(spark).get.orderBy("k").collect()
    assert(s2.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("a", 2L, "v2"), ("b", 1L, "v1"), ("c", 1L, "v1")))
    // idempotent re-upsert of the same batch → same state
    wh.upsert(Seq(("a", 2L, "v2")).toDF("k", "version", "payload"),
      "k", "version")
    assert(wh.readIfAny(spark).get.count() == 3)
  }

  test("readIfAny is None for a missing table (first-run probe)") {
    assert(JdbcWarehouse(derbyUrl(), "nope").readIfAny(spark).isEmpty)
  }

  test("the replay guard's slot predicate pushes down to the database " +
      "(the probe stays range-sized server-side at any table size)") {
    import spark.implicits._
    val wh = JdbcWarehouse(derbyUrl(), "pushed")
    wh.append(Seq((1L, "a"), (50L, "b"), (900L, "c")).toDF("slot", "event_id"))
    val probe = wh.readIfAny(spark).get
      .filter(col("slot").between(1L, 100L))
    val physical = probe.queryExecution.executedPlan.toString
    // the JDBC scan itself must carry the range — not a Spark-side
    // post-filter over a full-table read
    assert(physical.contains("PushedFilters"), physical)
    assert(physical.toLowerCase.contains("slot"), physical)
    assert(physical.contains("GreaterThanOrEqual") ||
      physical.contains(">="), physical)
    assert(probe.count() == 2)
  }

  test("upsert caps its connection fan-out at maxConnections: a wide " +
      "micro-batch must not connection-storm the database") {
    import spark.implicits._
    val wh = JdbcWarehouse(derbyUrl(), "wide", maxConnections = 2)
    // 32 input partitions = the storm shape (partitions = source
    // parallelism); one connection per partition would open 32
    val batch = (1 to 64).map(i => (s"k$i", 1L, s"v$i"))
      .toDF("k", "version", "payload").repartition(32)
    val group = s"upsert-cap-${System.nanoTime()}"
    spark.sparkContext.setJobGroup(group, "upsert connection-cap probe")
    try wh.upsert(batch, "k", "version")
    finally spark.sparkContext.clearJobGroup()
    assert(wh.readIfAny(spark).get.count() == 64)
    // the write job is the LAST job of the upsert (probe + create-table
    // jobs precede it); its result stage's task count IS the connection
    // count — the cap must hold it at maxConnections
    val tracker = spark.sparkContext.statusTracker
    val writeJob = tracker.getJobIdsForGroup(group).max
    val resultStage = tracker.getJobInfo(writeJob).get.stageIds().max
    val tasks = tracker.getStageInfo(resultStage).get.numTasks()
    assert(tasks <= 2, s"write stage ran $tasks tasks (connections) > cap 2")
    // replay converges through the same capped path
    wh.upsert(batch, "k", "version")
    assert(wh.readIfAny(spark).get.count() == 64)
  }
}
