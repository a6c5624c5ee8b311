package graft.ext

import org.apache.spark.sql.SparkSession

/** Dev-only: standalone timing for evt_bloom_probe (3.0x bench tripwire
  * after the round-7 testdata regeneration) — isolates code cost from
  * 143-query run-order pressure. Run:
  * sbt 'Test/runMain graft.ext.ProfileBloom /root/testdata/sf0.1'
  */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    for (q <- Seq("evt_bloom_probe", "evt_cms_topk")) {
      time(s"$q cold") {
        graft.SparkEntry.queries(q)(spark, dir).write
          .format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      time(s"$q warm") {
        graft.SparkEntry.queries(q)(spark, dir).write
          .format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, dir)
      .filter(graft.Tables.propK().isNotNull)
    val n = ev.count()
    val nc = ev.filter(col("ts") < graft.Tables.AnchorNs).count()
    println(s"[profile] mint-bearing=$n corpus-side=$nc batch-side=${n - nc}")
    spark.stop()
  }
}
