package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the physical-design lever the reference
  * declares (docs/SCHEMA.md CLUSTER BY) but never executes. Bucketing
  * both sides of a recurring join key removes the per-query shuffle
  * entirely; at 100 TB this converts the orders ⋈ lineitem join from a
  * full two-sided exchange into a zip of pre-sorted buckets. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // external-table locations: warehouse.dir is a static conf, so point
    // each bucketed table at an explicit temp path instead
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    graft.Tables.orders(spark, Sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders")
      .mode("overwrite").saveAsTable("b_orders")
    graft.Tables.lineitem(spark, Sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem")
      .mode("overwrite").saveAsTable("b_lineitem")

    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must consume bucketed scans directly: no Exchange
      // between the scans and the SortMergeJoin
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      val afterJoin = plan.substring(joinIdx)
      val scanSection = afterJoin.substring(0, afterJoin.indexOf("Scan parquet"))
      assert(!scanSection.contains("Exchange hashpartitioning"),
        s"unexpected shuffle between bucketed scans and join:\n$plan")
      // bucket pruning metadata present
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
