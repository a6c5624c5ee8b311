package graft.ext

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for dedup_clusters: where does the wall time go —
  * pair generation, or the label-propagation rounds? Run:
  * sbt 'Test/runMain graft.ext.ProfileClusters /root/testdata/sf0.1'
  */
object ProfileClusters {
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

    // steady state: one unmeasured full pass first
    SparkEntry.queries("dedup_clusters")(spark, dir).write
      .format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    // measured: stage split
    val pairs = time("jaccardPairs build+count") {
      val p = Dedup.jaccardPairs(Dedup.shingleRowsOf(
        graft.Tables.documents(spark, dir)), 0.5).select(col("d1"), col("d2"))
      println(s"[profile]   n_pairs=${p.count()}")
      p
    }
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst"))).cache()
    time("edges cache+count")(edges.count())
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).cache()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 64) {
      changed = time(f"round $iter") {
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
          .groupBy(col("src")).agg(min(col("label")).as("nbr"))
        val updated = labels
          .join(nbrMin.select(col("src").as("id"), col("nbr")), Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbr"), col("label"))).as("label"),
            (coalesce(col("nbr"), col("label")) < col("label")).as("chg"))
          .cache()
        val c = updated.filter(col("chg")).count()
        labels.unpersist()
        labels = updated
        c
      }
      iter += 1
    }
    println(s"[profile] converged after $iter rounds")

    spark.catalog.clearCache()
    time("full dedup_clusters e2e") {
      SparkEntry.queries("dedup_clusters")(spark, dir).write
        .format("noop").mode("overwrite").save()
    }
    time("full corpus_clean_summary e2e") {
      SparkEntry.queries("corpus_clean_summary")(spark, dir).write
        .format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
