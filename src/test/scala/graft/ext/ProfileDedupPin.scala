package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B for the round-16 optimization hypothesis: the dedup
  * family's shingle index (tokenizer regexp + explode + md5) is
  * recomputed for every distinct exchange subtree consuming it
  * (hot-shingle agg, join probe side, sizes agg — ReuseExchange only
  * dedupes the two identical self-join sides), so pinning it via lazy
  * localCheckpoint should trade one blocks-write for 2-3 tokenize
  * passes. Interleaved reps so the machine epoch prices both arms.
  *
  * Run: sbt 'Test/runMain graft.ext.ProfileDedupPin /root/testdata/sf0.1 3'
  */
object ProfileDedupPin {
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

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pin] $name%-34s $dt%6.2fs")
      dt
    }

    def docs = Tables.documents(spark, dir)

    // A: current shapes, exactly as declared
    def jaccardA(): DataFrame =
      Dedup.jaccardPairs(Dedup.shingleRowsOf(docs), 0.5)
        .orderBy(col("d1"), col("d2"))
    def containA(): DataFrame =
      Dedup.containmentPairs(Dedup.shingleRowsOf(docs), 0.8)
        .orderBy(col("contained"), col("container"))

    // B: pin the raw shingle rows (tokenize once), keep everything else
    def pinned(df: DataFrame): DataFrame = df.localCheckpoint(false)
    def jaccardB(): DataFrame = {
      val sh = pinned(Dedup.shingleRowsOf(docs))
      Dedup.jaccardOnCapped(Dedup.capShingles(sh, Dedup.DefaultMaxShingleDf), 0.5)
        .orderBy(col("d1"), col("d2"))
    }
    // C: pin the CAPPED index instead (anti-join output; tokenize runs
    // twice — hot agg + probe — but downstream reads stored blocks)
    def jaccardC(): DataFrame = {
      val capped = pinned(
        Dedup.capShingles(Dedup.shingleRowsOf(docs), Dedup.DefaultMaxShingleDf))
      Dedup.jaccardOnCapped(capped, 0.5).orderBy(col("d1"), col("d2"))
    }
    // D: pin both
    def jaccardD(): DataFrame = {
      val sh = pinned(Dedup.shingleRowsOf(docs))
      val capped = pinned(Dedup.capShingles(sh, Dedup.DefaultMaxShingleDf))
      Dedup.jaccardOnCapped(capped, 0.5).orderBy(col("d1"), col("d2"))
    }
    def containB(): DataFrame = {
      val sh = pinned(Dedup.shingleRowsOf(docs))
      Dedup.containmentPairs(sh, 0.8).orderBy(col("contained"), col("container"))
    }

    // E: NO pin — instead key every consumer off ONE exchange: an
    // explicit repartition by shingle right after tokenize, so the
    // hot-shingle agg, both self-join sides, and the sizes agg all hang
    // off the same Exchange subtree and ReuseExchange computes the
    // tokenize once (guide §2.4: share one exchange).
    def jaccardE(): DataFrame = {
      val sh = Dedup.shingleRowsOf(docs).repartition(col("shingle"))
      Dedup.jaccardOnCapped(Dedup.capShingles(sh, Dedup.DefaultMaxShingleDf), 0.5)
        .orderBy(col("d1"), col("d2"))
    }
    def containE(): DataFrame = {
      val sh = Dedup.shingleRowsOf(docs).repartition(col("shingle"))
      Dedup.containmentPairs(sh, 0.8).orderBy(col("contained"), col("container"))
    }

    // warm: one full pass of each arm
    noop(jaccardA()); noop(jaccardB()); noop(jaccardC()); noop(jaccardD())
    noop(jaccardE())
    noop(containA()); noop(containB()); noop(containE())

    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    def rec(name: String)(f: => DataFrame): Unit = {
      val t = time(name)(noop(f))
      acc(name) = t :: acc.getOrElse(name, Nil)
      spark.catalog.clearCache()
    }
    (1 to reps).foreach { r =>
      println(s"--- rep $r ---")
      rec("jaccard A current")(jaccardA())
      rec("jaccard B pin-sh")(jaccardB())
      rec("jaccard C pin-capped")(jaccardC())
      rec("jaccard D pin-both")(jaccardD())
      rec("jaccard E one-exchange")(jaccardE())
      rec("containment A current")(containA())
      rec("containment B pin-sh")(containB())
      rec("containment E one-exchange")(containE())
    }
    println("=== best-of ===")
    acc.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"[pin] $n%-34s best ${ts.min}%6.2fs  med ${ts.sorted.apply(ts.size / 2)}%6.2fs")
    }
    spark.stop()
  }
}
