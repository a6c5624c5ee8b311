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

  test("sketch quantiles land near the exact rank-selected quantiles") {
    // the exact twin is oracle-checked; the sketch must sit within the
    // per-type exact p50..p99 envelope and near the global exact p50
    val exact = SparkEntry.queries("evt_value_quantiles")(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(exact.size == 5)
    exact.values.foreach { case (p50, p99) => assert(p50 <= p99) }
    val approxP50 = SparkEntry.queries("evt_approx_stats")(spark, Sf)
      .collect()(0).getDouble(2)
    val (lo, hi) = (exact.values.map(_._1).min, exact.values.map(_._1).max)
    // global p50 of a mixture lies within the per-type p50 span (wide
    // bound; the point is the sketch isn't wildly off the exact scale)
    assert(approxP50 >= lo * 0.5 && approxP50 <= hi * 1.5,
      s"approx p50 $approxP50 outside sanity envelope [$lo, $hi]")
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

  test("bloom probe: zero false negatives, accounting is consistent") {
    val r = SparkEntry.queries("evt_bloom_probe")(spark, Sf).collect()(0)
    val (nBatch, hits, members, falsePos) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // every member set its own bits, so hits = members + falsePos exactly
    assert(hits == members + falsePos, r.toString)
    assert(hits >= members, "a Bloom filter can never miss a member")
    assert(falsePos <= nBatch - members, r.toString)
    assert(nBatch > 0 && members > 0, "fixture exercises both outcomes")
  }

  test("count-min estimates are one-sided: est >= exact for every key") {
    val rows = SparkEntry.queries("evt_cms_topk")(spark, Sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), s"CMS underestimated: $r")
      assert(r.getLong(4) == r.getLong(3) - r.getLong(2), r.toString)
    }
  }

  test("L1 drift is a bounded distance and counts are conserved") {
    val total = graft.Tables.events(spark, Sf)
      .filter(graft.Tables.propK().isNotNull).count()
    val rows = SparkEntry.queries("evt_drift_l1")(spark, Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
      "every event lands in exactly one half")
    rows.foreach { r =>
      val d = r.getDouble(3)
      assert(d >= 0.0 && d <= 2.0, s"L1 distance of two distributions is in [0,2]: $r")
    }
  }

  test("anomaly z-scores: warm-up rows are null, flags match |z| > 3") {
    val rows = SparkEntry.queries("evt_anomaly_daily")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { seq =>
      // first 7 days per type have no full trailing window
      seq.sortBy(_.getLong(1)).take(7).foreach(r => assert(r.isNullAt(3), r.toString))
    }
    rows.filterNot(_.isNullAt(3)).foreach { r =>
      val (z, flag) = (r.getDouble(3), r.getLong(4))
      assert((math.abs(z) > 3.0) == (flag == 1L) || math.abs(math.abs(z) - 3.0) < 1e-3,
        s"flag must track |z|>3 (rounded z may sit on the boundary): $r")
    }
  }
}
