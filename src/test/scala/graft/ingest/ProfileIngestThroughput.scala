package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only ingest-throughput rehearsal (Test scope): the reference's
  * ingest ceiling is its RPC rate limit — 50 blocks/s
  * (BASELINE.md, config.rs:49-52) — so "matches-or-beats single-node
  * throughput" for the ETL half means the PARSE path must clear that
  * with room to spare once the network is out of the picture. This
  * drives `Parse.parse` (block JSON → canonical events, the full
  * single-pass fan-out incl. sha2 ids + dedup) over N synthetic blocks
  * (2 tx each, every parse branch exercised) and reports blocks/s and
  * events/s, end-to-end from JSON text. Run:
  * sbt 'Test/runMain graft.ingest.ProfileIngestThroughput 200000'
  */
object ProfileIngestThroughput {
  def main(args: Array[String]): Unit = {
    val nSlots = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // materialize the raw (slot, block_json) feed once so the timed
    // pass measures PARSING, not synthetic-string generation
    val raw = spark.range(1, nSlots + 1).as[Long]
      .mapPartitions(_.flatMap(s => Backfill.syntheticBlock(s).map((s, _))))
      .toDF("slot", "block_json")
      .localCheckpoint(false)
    val nBlocks = raw.count()

    def timed(name: String, dedup: Boolean): Unit = {
      Parse.parse(raw, dedup = dedup).write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      Parse.parse(raw, dedup = dedup).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val nEvents = Parse.parse(raw, dedup = dedup).count()
      println(f"[ingest] $name%-26s $dt%6.2f s  ${nBlocks / dt}%9.0f blocks/s  ${nEvents / dt}%9.0f events/s")
    }

    println(s"[ingest] $nBlocks blocks (2 tx each, full fan-out)")
    timed("parse (no dedup)", dedup = false)
    timed("parse + event_id dedup", dedup = true)

    // the sink-inclusive form: parse + date-partitioned parquet write
    val out = java.nio.file.Files.createTempDirectory("graft-ing").toString
    val t0 = System.nanoTime()
    Parse.parse(raw, dedup = true)
      .withColumn("block_date", to_date(col("block_time")))
      .write.mode("overwrite").partitionBy("block_date").parquet(s"$out/events")
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[ingest] parse+partitioned sink    $dt%6.2f s  ${nBlocks / dt}%9.0f blocks/s")
    spark.stop()
  }
}
