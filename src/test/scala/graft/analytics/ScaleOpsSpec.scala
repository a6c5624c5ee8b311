package graft.analytics

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Sketch outputs bounded against exact answers (the contract the DuckDB
  * oracle can't express for engine-specific sketches). */
class ScaleOpsSpec extends SparkSpec {

  test("approx stats: exact columns match a recompute, all bounds hold") {
    val ev = graft.Tables.events(spark, Sf)
    val exactUsers = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val r = SparkEntry.queries("evt_approx_stats")(spark, Sf).collect()(0)
    assert(r.getAs[Long]("n_events") == ev.count())
    assert(r.getAs[Long]("exact_users") == exactUsers)
    assert(r.getAs[Long]("exact_types") == 5L) // 5 event types on the fixture
    // the sketch-vs-exact bounds are the query's own output now — the
    // oracle asserts them TRUE, and so does this spec
    Seq("users_ok", "types_ok", "p50_ok", "p99_ok").foreach { c =>
      assert(r.getAs[Boolean](c), s"$c must hold: $r")
    }
  }

  test("HLL sketch rollup: union of per-day sketches equals the direct estimate") {
    // register max is associative — the stored-sketch path must land on
    // EXACTLY the scalar aggregate's estimate, not merely near it; any
    // serialization/merge defect shows up as an off-by-registers drift
    val direct = SparkEntry.queries("evt_hll_program_reach")(spark, Sf)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("hll_wallets")).toMap
    val rolled = SparkEntry.queries("evt_hll_sketch_rollup")(spark, Sf)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("hll_wallets")).toMap
    assert(rolled == direct)
    // a precision-mismatched sketch must fail loudly, never mis-merge
    import spark.implicits._
    val bad = Seq(Array.fill[Byte](16)(0)).toDF("sk")
      .agg(graft.functions.HllAggregate.hll_union_est(col("sk")))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage != null)
  }

  test("per-group approx reach: exact twin matches, rsd=1% bound holds") {
    val exact = graft.Tables.events(spark, Sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("evt_approx_program_reach")(spark, Sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_wallets") == exact(r.getString(0)), r.toString)
      assert(r.getAs[Boolean]("wallets_ok"), s"HLL outside 3 sigma of rsd=1%: $r")
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
