package graft.functions

import graft.SparkSpec
import graft.functions.HllAggregate.hll_distinct
import org.apache.spark.sql.functions._

class HllAggregateSpec extends SparkSpec {

  test("estimate within HLL error of exact, across types") {
    val n = 50000
    val df = spark.range(0, n).select(
      col("id"), concat(lit("user_"), col("id") % 9999).as("s"))
    val r = df.agg(
      hll_distinct(col("id")).as("ids"),
      hll_distinct(col("s")).as("strs"),
      countDistinct(col("s")).as("exact_strs")).collect()(0)
    assert(math.abs(r.getLong(0) - n.toLong).toDouble / n < 0.05, r.getLong(0))
    assert(math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2) < 0.05,
      s"${r.getLong(1)} vs ${r.getLong(2)}")
  }

  test("estimate is partitioning-invariant (mergeable sketch)") {
    val base = spark.range(0, 20000).select((col("id") % 7777).as("v"))
    val est = (1 to 3).map { parts =>
      base.repartition(parts * 3).agg(hll_distinct(col("v"))).collect()(0).getLong(0)
    }
    assert(est.distinct.size == 1, s"partitioning changed the estimate: $est")
  }

  test("small cardinalities are near-exact via linear counting") {
    // linear counting estimates from occupied-bucket counts — a single
    // bucket collision among n ≪ m values shifts the estimate by ~1, so
    // the guarantee is near-exact, not exact
    val df = spark.range(0, 100000).select((col("id") % 42).as("v"))
    val est = df.agg(hll_distinct(col("v"))).collect()(0).getLong(0)
    assert(math.abs(est - 42L) <= 2L, s"got $est")
  }

  test("works per-group and ignores nulls") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None), ("b", Some(1L)))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(hll_distinct(col("v")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }
}
