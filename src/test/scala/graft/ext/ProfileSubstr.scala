package graft.ext

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for dedup_substring (Test scope). */
object ProfileSubstr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[substr] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
    docs.count()
    val K = 8
    val wins = Dedup.nGramRowsOf(docs, K, outCol = "g", withPos = true)
      .select(col("doc_id"), col("p"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
    time("wins")(wins.count())
    time("wins again")(wins.count())
    val elig = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2 && col("df") <= 8).select(col("h"))
    time("elig")(elig.count())
    val hw = wins.join(elig, Seq("h"))
    time("hw")(hw.count())
    val pairs = hw.select(col("h"), col("doc_id").as("d1"), col("p").as("p1"))
      .join(hw.select(col("h"), col("doc_id").as("d2"), col("p").as("p2")), Seq("h"))
      .filter(col("d1") < col("d2"))
    time("pairs")(pairs.count())
    println("==== full runs plan ====")
    val full = Dedup.substringRuns(docs, K)
    full.explain("formatted")
    time("full")(full.count())
    spark.stop()
  }
}
