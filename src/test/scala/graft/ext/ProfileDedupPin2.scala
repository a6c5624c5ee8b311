package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 A/B #2: the one-exchange restructure for dedup_incremental
  * (which key should the shared exchange use?) and dedup_substring.
  * Run: sbt 'Test/runMain graft.ext.ProfileDedupPin2 /root/testdata/sf0.1 3'
  */
object ProfileDedupPin2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def docs = Tables.documents(spark, dir)

    // ---- dedup_incremental body, parameterized by the sh shape ----
    def incremental(sh: DataFrame): DataFrame = {
      val bands = Dedup.bandKeysOf(sh)
      val batch = bands.filter(col("doc_id") % 10 === 9)
        .select(col("band_idx"), col("band_key"), col("doc_id").as("new_doc"))
      val corpus = bands.filter(col("doc_id") % 10 =!= 9)
        .select(col("band_idx"), col("band_key"), col("doc_id").as("corpus_doc"))
      val cand = batch.join(corpus, Seq("band_idx", "band_key"))
        .select(least(col("new_doc"), col("corpus_doc")).as("d1"),
          greatest(col("new_doc"), col("corpus_doc")).as("d2"))
        .distinct()
      Dedup.verifyJaccard(sh, cand, 0.5)
        .select(
          when(col("d1") % 10 === 9, col("d1")).otherwise(col("d2")).as("new_doc"),
          when(col("d1") % 10 === 9, col("d2")).otherwise(col("d1")).as("corpus_doc"),
          col("common"), col("jaccard"))
        .orderBy(col("new_doc"), col("corpus_doc"))
    }
    def shCurrent() = Dedup.capShingles(
      Dedup.shingleRowsOf(docs), Dedup.DefaultMaxShingleDf)
    def shRepDoc() = Dedup.capShingles(
      Dedup.shingleRowsOf(docs).repartition(col("doc_id")), Dedup.DefaultMaxShingleDf)
    def shRepShingle() = Dedup.capShingles(
      Dedup.shingleRowsOf(docs).repartition(col("shingle")), Dedup.DefaultMaxShingleDf)

    // ---- dedup_substring body, parameterized by a wins transform ----
    def substr(rep: DataFrame => DataFrame): DataFrame = {
      val K = 8
      val wins = rep(Dedup.nGramRowsOf(docs, K, outCol = "g", withPos = true)
        .select(col("doc_id"), col("p"), Dedup.h60(col("g")).as("h")))
      val elig = wins.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2 && col("df") <= 8).select(col("h"))
      val hw = wins.join(elig, Seq("h"))
      val pairs = hw.select(col("h"), col("doc_id").as("d1"), col("p").as("p1"))
        .join(hw.select(col("h"), col("doc_id").as("d2"), col("p").as("p2")), Seq("h"))
        .filter(col("d1") < col("d2"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("d1"), col("d2"), col("diag")).orderBy(col("p1"))
      val runs = pairs.withColumn("diag", col("p1") - col("p2"))
        .withColumn("grp", col("p1") - row_number().over(w).cast("long"))
        .groupBy(col("d1"), col("d2"), col("diag"), col("grp"))
        .agg(count(lit(1)).as("nw"), min(col("p1")).as("s1"))
      runs.groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("n_runs"),
          max(col("nw") + (K - 1)).as("max_run_tokens"),
          sum(col("nw")).as("dup_windows"),
          min(col("s1")).as("first_pos"))
        .orderBy(col("d1"), col("d2"))
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "incr A current" -> (() => incremental(shCurrent())),
      "incr B rep-doc" -> (() => incremental(shRepDoc())),
      "incr C rep-shingle" -> (() => incremental(shRepShingle())),
      "substr A current" -> (() => substr(identity)),
      "substr B rep-h" -> (() => substr(_.repartition(col("h")))),
    )
    arms.foreach { case (_, f) => noop(f()) } // warm
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to reps).foreach { r =>
      println(s"--- rep $r ---")
      arms.foreach { case (n, f) =>
        val t0 = System.nanoTime(); noop(f())
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[pin2] $n%-22s $dt%6.2fs")
        acc(n) = dt :: acc.getOrElse(n, Nil)
        spark.catalog.clearCache()
      }
    }
    println("=== best-of ===")
    acc.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"[pin2] $n%-22s best ${ts.min}%6.2fs  med ${ts.sorted.apply(ts.size / 2)}%6.2fs")
    }
    spark.stop()
  }
}
