package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: does `session_window` merge two events whose gap is
  * EXACTLY the session gap? (Determines the `>` vs `>=` in the oracle's
  * lag-based replay.) Run: sbt 'Test/runMain graft.streaming.SessionGapProbe'
  */
object SessionGapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // gap = 10s; pairs at exactly 10s apart, just under, just over
    val rows = Seq(
      ("exact", 0L), ("exact", 10000000L),          // 10s in micros
      ("under", 0L), ("under", 9999999L),
      ("over", 0L), ("over", 10000001L)
    ).toDF("k", "tus").withColumn("tsw", expr("timestamp_micros(tus)"))
    val out = rows.groupBy(session_window(col("tsw"), "10 seconds").as("w"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), col("n"), col("w.start").cast("string"), col("w.end").cast("string"))
      .orderBy("k")
    out.show(false)
    spark.stop()
  }
}
