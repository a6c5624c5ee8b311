package graft.analytics

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Sketch outputs bounded against exact answers (the contract the DuckDB
  * oracle can't express for engine-specific sketches). */
class ScaleOpsSpec extends SparkSpec {

  test("approx distincts within HLL error of exact") {
    val ev = graft.Tables.events(spark, Sf)
    val exactUsers = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val r = SparkEntry.queries("evt_approx_stats")(spark, Sf).collect()(0)
    val approxUsers = r.getLong(0)
    assert(math.abs(approxUsers - exactUsers).toDouble / exactUsers < 0.1,
      s"approx $approxUsers vs exact $exactUsers")
    assert(r.getLong(1) == 5L) // 5 event types — tiny cardinality is exact
    // quantiles ordered and within the observed value range
    val (p50, p99) = (r.getDouble(2), r.getDouble(3))
    assert(p50 <= p99)
    val (lo, hi) = ev.agg(min(col("value")), max(col("value"))).collect()(0) match {
      case row => (row.getDouble(0), row.getDouble(1))
    }
    assert(p50 >= lo && p99 <= hi)
  }

  test("per-group approx reach tracks exact within 5% at rsd=1%") {
    val exact = graft.Tables.events(spark, Sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("evt_approx_program_reach")(spark, Sf).collect().foreach { r =>
      val (et, approx) = (r.getString(0), r.getLong(2))
      val e = exact(et)
      assert(math.abs(approx - e).toDouble / e <= 0.05, s"$et: $approx vs $e")
    }
  }
}
