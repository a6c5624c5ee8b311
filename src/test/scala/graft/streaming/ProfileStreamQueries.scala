package graft.streaming

import org.apache.spark.sql.SparkSession

/** Dev-only scale rehearsal for the DECLARED streaming queries: runs
  * each end-to-end pipeline (staging → multi-batch stream → state →
  * declared result) against a rehearsal-scaled directory and prints
  * wall-clock + result rows — the 10× check that the chunked staging,
  * watermark margins, and state sizes hold past the bench SF.
  * Run: sbt 'Test/runMain graft.streaming.ProfileStreamQueries target/sf10'
  * (optional 2nd arg: comma-separated query subset)
  */
object ProfileStreamQueries {
  private val All = Seq("stream_cdc_snapshot", "stream_windowed_volume",
    "stream_hopping_volume",
    "stream_sessionize", "stream_running_totals", "stream_interval_join",
    "stream_interval_join_outer", "stream_interval_join_full",
    "stream_static_enrich", "stream_band_dedup", "stream_ivf_assign",
    "stream_pq_encode")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10")
    val Queries = args.drop(1).headOption
      .map(_.split(",").toSeq).getOrElse(All)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Queries.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[streamscale] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    spark.stop()
  }
}
