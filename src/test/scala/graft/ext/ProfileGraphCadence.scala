package graft.ext

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev-only A/B for VERDICT r15 #6: does label-propagation's per-round
  * localCheckpoint+count cost enough that a cadence-2 checkpoint (skip
  * every other round, nest its plan instead) wins ≥20%? Interleaved
  * A/B/A/B in ONE JVM so the host's 1.4–3.4× epoch swings hit both
  * variants equally. Run:
  * sbt 'Test/runMain graft.ext.ProfileGraphCadence /root/testdata/sf0.1'
  */
object ProfileGraphCadence {
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

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val events = Tables.events(spark, dir)
    // steady state: one unmeasured pass of each variant (codegen/JIT/
    // page cache), then interleaved measured rounds
    Graph.withEdges(events)(e => Graph.labelPropagation(e, checkpointEvery = 1))
    Graph.withEdges(events)(e => Graph.labelPropagation(e, checkpointEvery = 2))
    val reps = 3
    val (a, b) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) {
      a(i) = time(Graph.withEdges(events)(e =>
        Graph.labelPropagation(e, checkpointEvery = 1)))
      b(i) = time(Graph.withEdges(events)(e =>
        Graph.labelPropagation(e, checkpointEvery = 2)))
      println(f"[cadence] rep $i: every-round ${a(i)}%.2fs  every-2nd ${b(i)}%.2fs")
    }
    println(f"[cadence] best every-round ${a.min}%.2fs  best every-2nd ${b.min}%.2fs" +
      f"  ratio ${b.min / a.min}%.3f")
    spark.stop()
  }
}
