package graft.ext

import org.apache.spark.sql.SparkSession

/** Dev-only A/B: dedup_jaccard_pairs with vs without caching the capped
  * index, interleaved in one JVM (Test scope — not part of the library).
  * Run: sbt 'Test/runMain graft.ext.ProfileJaccardAB /root/testdata/sf0.1'
  */
object ProfileJaccardAB {
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
    import org.apache.spark.sql.functions.col

    def uncached(): Long =
      Dedup.jaccardPairs(Dedup.shingleRowsOf(graft.Tables.documents(spark, dir)), 0.5)
        .orderBy(col("d1"), col("d2")).count()
    def cached(): Long = {
      val capped = Dedup.capShingles(
        Dedup.shingleRowsOf(graft.Tables.documents(spark, dir)), Dedup.DefaultMaxShingleDf).cache()
      try Dedup.jaccardOnCapped(capped, 0.5).orderBy(col("d1"), col("d2")).count()
      finally capped.unpersist()
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ab] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    // warm both, then interleave measurements
    uncached(); cached()
    (1 to 3).foreach { i => time(s"uncached#$i")(uncached()); time(s"cached#$i")(cached()) }
    spark.stop()
  }
}
