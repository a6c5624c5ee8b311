package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only streaming throughput rehearsal (Test scope): drives the
  * watermarked streaming operators over the ~sf1 rehearsal events
  * (1M rows, 16 parquet files) as a REAL multi-batch stream —
  * `maxFilesPerTrigger` splits the backlog into micro-batches, so
  * watermark advancement, state eviction, and per-batch planning all
  * exercise as they would on a live feed drained with AvailableNow.
  * Reports end-to-end wall time + rows/s per operator (PLANS.md r8).
  * Run: sbt 'Test/runMain graft.streaming.ProfileStreamThroughput target/sf1'
  */
object ProfileStreamThroughput {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // streaming: static plans
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = s"$dir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val nRows = spark.read.parquet(src).count()

    def stream(batches: Int) = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", math.max(1, 16 / batches))
      .parquet(src)
      // the engine convention stores ts as epoch-nanos int64; streaming
      // windows need a TimestampType event-time column
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    def drive(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-stp").toString
      val t0 = System.nanoTime()
      val q = df.writeStream
        .option("checkpointLocation", ckpt)
        // all four profiled streams are watermark-append shapes (the
        // windowed aggs emit on watermark close), so append is the one
        // correct mode here
        .outputMode("append")
        .format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[stream] $name%-22s $dt%6.2f s  (${nRows / dt / 1000}%7.1fk rows/s in)")
    }

    // 4 micro-batches each: watermark advances across batches, state
    // evicts below it — the live-feed shape, not one giant batch
    drive("dedup", StreamAnalytics.dedupedStream(stream(4)))
    drive("windowed_volume", StreamAnalytics.windowedVolume(stream(4)))
    drive("sliding_volume", StreamAnalytics.windowedVolume(stream(4),
      width = "1 hour", slide = Some("15 minutes")))
    drive("session_activity", StreamAnalytics.sessionActivity(stream(4)))

    // CDC MERGE sink at volume: 4 micro-batches of ~250k rows each,
    // landed as 4 atomic basis-validated MergeTable commits (keyed by
    // user_id, last-write-wins on ts) — the round-8 OCC commit path
    // under streaming, plus a final integrity read
    val root = java.nio.file.Files.createTempDirectory("graft-cdc")
      .resolve("t").toString
    val updates = stream(4).select(col("user_id"), col("ts"),
      col("event_type"), col("value"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcc").toString
    val t0 = System.nanoTime()
    val q = StreamAnalytics.cdcApply(updates, root, "user_id", "ts",
      checkpointDir = Some(ckpt))
    q.awaitTermination()
    val dt = (System.nanoTime() - t0) / 1e9
    val tbl = graft.operators.MergeTable.snapshot(spark, root)
    val nKeys = tbl.count()
    val versions = graft.operators.MergeTable.versions(spark, root)
    println(f"[stream] cdc_merge_sink         $dt%6.2f s  (${nRows / dt / 1000}%7.1fk rows/s in; " +
      s"$nKeys keys live, ${versions.size} commits)")
    spark.stop()
  }
}
