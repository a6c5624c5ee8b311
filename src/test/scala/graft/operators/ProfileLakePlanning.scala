package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only planning-cost rehearsal for [[MergeTable]] (Test scope):
  * drives a trickle-ingestion history (hundreds of tiny MERGE commits —
  * the worst case for log-folding readers), then measures the READ
  * PLANNING cost (liveFiles collect) and full snapshot latency
  * before/after a log checkpoint and after compaction. Substantiates
  * the "planning stays O(recent commits), not O(table history)" claim
  * with numbers (PLANS.md round 8).
  * Run: sbt 'Test/runMain graft.operators.ProfileLakePlanning 200'
  */
object ProfileLakePlanning {
  def main(args: Array[String]): Unit = {
    val nCommits = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-lp")
      .resolve("t").toString

    def timeMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def planMs(label: String): Unit = {
      // warm once, then report the best of 3 (planning is driver-side;
      // we want its floor, not GC jitter)
      MergeTable.liveFiles(spark, root).count()
      val t = (1 to 3).map(_ => timeMs(MergeTable.liveFiles(spark, root).count())).min
      val s = (1 to 3).map(_ => timeMs(MergeTable.snapshot(spark, root).count())).min
      println(f"[lakeplan] $label%-34s liveFiles=$t%7.1f ms  snapshot=$s%7.1f ms")
    }

    MergeTable.append(spark, root,
      (0L until 2000L).map(k => (k, s"v$k")).toDF("k", "v"), "k")
    var t0 = System.nanoTime()
    (1 to nCommits).foreach { i =>
      MergeTable.merge(spark, root,
        (0 until 5).map(j => (((i * 31 + j * 7) % 2000).toLong, s"u$i-$j"))
          .distinct.toDF("k", "v"), "k")
    }
    println(f"[lakeplan] $nCommits trickle MERGE commits in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    planMs(s"after $nCommits commits, no checkpoint")

    MergeTable.checkpoint(spark, root)
    planMs(s"after checkpoint at v${nCommits + 1}")

    (1 to 20).foreach { i =>
      MergeTable.merge(spark, root,
        Seq(((i * 13 % 2000).toLong, s"w$i")).toDF("k", "v"), "k")
    }
    planMs("checkpoint + 20-commit tail")

    val c = MergeTable.compactFiles(spark, root, "k", smallerThan = 1L << 20)
    println(s"[lakeplan] compacted small files at version $c")
    MergeTable.checkpoint(spark, root)
    planMs("after compaction + re-checkpoint")

    val n = MergeTable.vacuum(spark, root,
      MergeTable.versions(spark, root).last, graceMs = 0L)
    println(s"[lakeplan] vacuum deleted $n unreachable objects")
    planMs("after vacuum to latest")
    spark.stop()
  }
}
