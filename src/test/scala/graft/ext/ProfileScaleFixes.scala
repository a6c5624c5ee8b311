package graft.ext

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only re-run of the two 100×-rehearsal findings after their
  * fixes (Test scope): sim_semdedup with the chunked pair stage via the
  * DECLARED query, and the near-dup LSH pipeline at a corpus-sized
  * bucket geometry via the parametrized library path.
  * Run: sbt 'Test/runMain graft.ext.ProfileScaleFixes target/sf10 12'
  */
object ProfileScaleFixes {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10")
    val bits = args.drop(1).headOption.map(_.toInt).getOrElse(12)
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
      println(f"[scalefix] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    time("sim_semdedup (chunked, declared)")(
      graft.SparkEntry.queries("sim_semdedup")(spark, dir).count())

    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val n = e.count()
    println(s"[scalefix] corpus n=$n, neardup bits=$bits " +
      s"(${1 << bits} buckets/table), radius 0, cap ${Similarity.NeardupMaxBucket}")
    time(s"neardupLshPairs(bits=$bits, r=0)")(
      Similarity.neardupLshPairs(e, bits, 0.4, probeRadius = 0).count())

    // the DECLARED query end-to-end: auto-sized geometry (bits =
    // max(LshBits, ceil(log2(n/NeardupTargetBucket))), i.e. log2(n/50))
    // with the radius dropping to 0 past the fixed geometry — the shape
    // every caller gets with no corpus-size guard
    time("sim_neardup_lsh (declared, auto-bits)")(
      graft.SparkEntry.queries("sim_neardup_lsh")(spark, dir).count())
    spark.stop()
  }
}
