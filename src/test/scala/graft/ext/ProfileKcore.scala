package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for graph_kcore: where do the ~25 bench seconds go —
  * the shared edge build, the per-round degree scans, or the per-round
  * cache fills? Run:
  * sbt 'Test/runMain graft.ext.ProfileKcore /root/testdata/sf0.1'
  */
object ProfileKcore {
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
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    // steady state: one unmeasured full pass first
    time("cold full graph_kcore") {
      graft.SparkEntry.queries("graph_kcore")(spark, dir).collect()
    }
    spark.catalog.clearCache()

    time("warm full graph_kcore") {
      graft.SparkEntry.queries("graph_kcore")(spark, dir).collect()
    }
    spark.catalog.clearCache()

    // stage split: edge build vs peel rounds
    val ev = graft.Tables.events(spark, dir)
    val e = time("edges build+cache+count") {
      val e = Graph.edges(ev).cache()
      println(s"[profile]   n_edges=${e.count()}")
      e
    }
    time("kcoreTrajectory on cached edges") {
      Graph.kcoreTrajectory(e).collect()
    }
    e.unpersist()
    spark.catalog.clearCache()

    // exact query path, rounds instrumented: replicate withEdges +
    // trajectory with per-action timing
    time("query-path total (instrumented)") {
      Graph.withEdges(ev) { edges =>
        var cur = edges.cache()
        (1 to Graph.KcoreRounds).foreach { round =>
          val deg = cur.select(explode(array(col("u"), col("v"))).as("node"))
            .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          val kept = deg.filter(col("deg") >= Graph.KcoreK)
            .select(col("node")).cache()
          val e1 = cur.join(kept.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
            .join(kept.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
            .select(col("u"), col("v")).cache()
          val kc = time(s"  round $round kept.count") { kept.count() }
          val ec = time(s"  round $round e1.count") { e1.count() }
          println(s"[profile]   round $round kept=$kc edges=$ec")
          cur.unpersist(); cur = e1; kept.unpersist()
        }
        cur.unpersist()
      }
    }
    spark.catalog.clearCache()

    time("no-unpersist variant total") {
      Graph.withEdges(ev) { edges =>
        var cur = edges.cache()
        (1 to Graph.KcoreRounds).foreach { round =>
          val deg = cur.select(explode(array(col("u"), col("v"))).as("node"))
            .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          val kept = deg.filter(col("deg") >= Graph.KcoreK)
            .select(col("node")).cache()
          val e1 = cur.join(kept.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
            .join(kept.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
            .select(col("u"), col("v")).cache()
          val kc = time(s"  nu round $round kept.count") { kept.count() }
          val ec = time(s"  nu round $round e1.count") { e1.count() }
          cur = e1
        }
      }
    }
    spark.catalog.clearCache()

    time("localCheckpoint variant total") {
      Graph.withEdges(ev) { edges =>
        var cur = edges.localCheckpoint(true)
        (1 to Graph.KcoreRounds).foreach { round =>
          val deg = cur.select(explode(array(col("u"), col("v"))).as("node"))
            .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          val kept = deg.filter(col("deg") >= Graph.KcoreK)
            .select(col("node")).localCheckpoint(true)
          val e1 = time(s"  lc round $round checkpoint") {
            cur.join(kept.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
              .join(kept.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
              .select(col("u"), col("v")).localCheckpoint(true)
          }
          val kc = time(s"  lc round $round kept.count") { kept.count() }
          val ec = time(s"  lc round $round e1.count") { e1.count() }
          cur = e1
        }
      }
    }
    spark.stop()
  }
}
