package graft.ext


import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage profiler for the corpus/dedup pipelines (Test scope —
  * not part of the library). Run:
  * sbt 'Test/runMain graft.ext.ProfileCorpus /root/testdata/sf0.1'
  */
object ProfileCorpus {
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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }

    // warm
    Tables.documents(spark, dir).count()

    val docs = Tables.documents(spark, dir)
    val exactKept = docs
      .withColumn("h", md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("text"))
    time("exactKept")(exactKept.count())

    val sh0 = Dedup.shingleRowsOf(exactKept)
    time("shingleRows")(sh0.count())

    val capped = Dedup.capShingles(sh0, 100)
    time("capShingles")(capped.count())

    val cappedC = capped.cache()
    cappedC.count()

    val cand = Dedup.bandCandidatesOf(cappedC)
    time("bandCandidates(cached sh)")(cand.count())

    val verified = Dedup.verifyJaccard(cappedC, cand, 0.5)
    time("verifyJaccard")(verified.count())

    time("full corpus query") {
      spark.catalog.clearCache()
      CorpusPipeline.defs.head._2.fn(spark, dir).count()
    }
    time("full jaccard query") {
      spark.catalog.clearCache()
      graft.SparkEntry.queries("dedup_jaccard_pairs")(spark, dir).count()
    }
    spark.stop()
  }
}
