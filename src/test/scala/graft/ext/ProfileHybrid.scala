package graft.ext

import org.apache.spark.sql.SparkSession

/** Dev-only: time sim_hybrid_rrf next to its two component rankers and
  * dump the executed plan — the r13 sweep put the fused query at ~4 s
  * where the standalone rankers sum to ~1.1 s; find the recomputation.
  * Run: sbt 'Test/runMain graft.ext.ProfileHybrid /root/testdata/sf0.1'
  */
object ProfileHybrid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[hybrid] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    time("text_bm25_search"); time("sim_knn_brute"); time("sim_hybrid_rrf")
    time("sim_hybrid_rrf") // warm second run
    val df = graft.SparkEntry.queries("sim_hybrid_rrf")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println(s"[hybrid] parquet scans: ${"Scan parquet".r.findAllIn(p).length}")
    println(s"[hybrid] exchanges: ${"Exchange".r.findAllIn(p).length}")
    println(s"[hybrid] TakeOrdered: ${"TakeOrderedAndProject".r.findAllIn(p).length}")
    spark.stop()
  }
}
