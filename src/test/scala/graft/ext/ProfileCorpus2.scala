package graft.ext

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only WARM stage profiler for the corpus funnel (Test scope).
  * Each stage is timed on its second run, from pinned inputs, so the
  * numbers are the marginal steady-state cost of THAT stage — the
  * cold-run ProfileCorpus conflates codegen/JIT into every line.
  * Run: sbt 'Test/runMain graft.ext.ProfileCorpus2 /root/testdata/sf0.1'
  */
object ProfileCorpus2 {
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

    def warmTime(name: String)(f: => Long): Unit = {
      f // warm: codegen + JIT + page cache
      val t0 = System.nanoTime()
      val n = f
      println(f"[warm] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
    warmTime("docs scan")(docs.count())

    val exactKept = docs
      .withColumn("h", md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("text"))
    warmTime("exactKept (from scan)")(exactKept.count())

    val ek = exactKept.localCheckpoint(false); ek.count()
    val sh0 = Dedup.shingleRowsOf(ek)
    warmTime("shingleRows (from pinned ek)")(sh0.count())

    val capped = Dedup.capShingles(sh0, Dedup.DefaultMaxShingleDf)
    warmTime("capShingles (from pinned ek)")(capped.count())

    val shp = capped.localCheckpoint(false); shp.count()
    warmTime("bandCandidates (from pinned sh)")(Dedup.bandCandidatesOf(shp).count())
    val cand = Dedup.bandCandidatesOf(shp).localCheckpoint(false); cand.count()
    warmTime("verifyJaccard (pinned sh+cand)")(Dedup.verifyJaccard(shp, cand, 0.5).count())

    val tok = TextAnalytics.tokExpr
    warmTime("quality tokenize (pinned ek)")(
      ek.withColumn("n_tok", expr(s"size($tok)"))
        .filter(col("n_tok") >= 20 && col("n_tok") <= 500).count())

    val d = Tables.documents(spark, dir)
    warmTime("gram5Rows (decontaminate)")(TrainPrep.gram5Rows(d).count())

    warmTime("FULL corpus_clean_summary")(
      graft.SparkEntry.queries("corpus_clean_summary")(spark, dir).count())
    warmTime("FULL corpus_train_export")(
      graft.SparkEntry.queries("corpus_train_export")(spark, dir).count())
    spark.stop()
  }
}
