package graft.streaming

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The streaming+storage stack on the hard oracle signal: a REAL
  * multi-batch Structured Streaming run — file source, watermark,
  * `dropDuplicatesWithinWatermark`, `foreachBatch` CDC MERGE into the
  * copy-on-write [[graft.operators.MergeTable]] — whose FINAL TABLE
  * SNAPSHOT is the declared result, replayed relationally by the DuckDB
  * oracle. This is the reference's incremental entry point
  * (src/incremental.rs:10-31: poll → parse → upsert) end-to-end on the
  * differential check instead of spec-only.
  *
  * Harness shape (bounded test-SF scaffolding; the operators under test
  * are the stream pipeline + the table, not the staging):
  *  - events are staged as 4 single-file chunks in event-time quartile
  *    order, written with strictly increasing modification times, so the
  *    file source's oldest-first ordering delivers 4 deterministic
  *    micro-batches (`maxFilesPerTrigger = 1` + `Trigger.AvailableNow`).
  *  - every 10th event is REPLAYED into the NEXT chunk with a poisoned
  *    value and the same `event_id`/`ts`: a correct watermarked dedup
  *    drops the replay (its key is still inside the watermark horizon —
  *    the delay exceeds one chunk span, the maximum replay lag here); a
  *    broken one lets the poison through, where the unconditional
  *    matched-replace MERGE would regress that user's row to an older
  *    event — turning the oracle row red. The dedup is load-bearing for
  *    correctness, not decorative.
  *  - each micro-batch folds last-write-wins on a version string that
  *    totally orders (ts, event_id), then lands as ONE MERGE commit.
  *    Chunks are ts-range-partitioned, so any later batch's version for
  *    a colliding key is strictly higher — unconditional replace IS
  *    global last-write-wins, which is exactly what the oracle replays:
  *    per user, the row of max (ts, event_id).
  *
  * At scale nothing here changes shape: the file chunks stand in for
  * arriving micro-batches, dedup state is bounded by the watermark
  * horizon, each MERGE rewrites only files its batch's key span touches,
  * and the snapshot read is manifest-planned.
  */
object StreamQueries extends QueryModule {

  private val Chunks = 4

  /** Build the staged chunk files + checkpoint + table root under one
    * temp dir, run `body`, materialize its bounded result, clean up. */
  private def withStreamRun(s: SparkSession, dir: String)(
      body: (String, String, String) => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream")
    try {
      val staging = tmp.resolve("staging").toString
      val ckpt = tmp.resolve("ckpt").toString
      val root = tmp.resolve("events_tbl").toString
      val res = body(staging, ckpt, root)
      val rows = new java.util.ArrayList[Row]()
      res.collect().foreach(rows.add)
      s.createDataFrame(rows, res.schema)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(tmp.toString)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp.toString), true)
    }
  }

  /** Events + chunk assignment (+`ver`, the (ts, event_id) total-order
    * version string; +`tsw`, the TimestampType watermark column). */
  private def chunked(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
    val span = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx")).head()
    val (mn, mx) = (span.getLong(0), span.getLong(1))
    ev.withColumn("chunk",
        (lit(Chunks.toLong) * (col("ts") - lit(mn)) / lit(mx - mn + 1L))
          .cast("bigint"))
      .withColumn("ver", concat(
        lpad(col("ts").cast("string"), 20, "0"),
        lpad(col("event_id").cast("string"), 12, "0")))
      .withColumn("tsw", Tables.tsTimestamp())
  }

  /** Write chunk `c` of `df` as the single file `staging/chunk-c.parquet`
    * with modification time `baseMs + c minutes` — the file source's
    * oldest-first ordering then replays chunks in event-time order. */
  private def writeChunk(s: SparkSession, df: DataFrame, staging: String,
      c: Int, baseMs: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val scratch = s"$staging/.write-$c"
    df.coalesce(1).write.parquet(scratch)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(scratch))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val dest = new org.apache.hadoop.fs.Path(staging, f"chunk-$c%04d.parquet")
    require(fs.rename(part, dest), s"staging rename failed for chunk $c")
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    fs.setTimes(dest, baseMs + c * 60000L, -1L)
  }

  override def defs: Seq[(String, Q)] = Seq(
    "stream_cdc_snapshot" -> Q(
      (s, dir) => withStreamRun(s, dir) { (staging, ckpt, root) =>
        val ev = chunked(s, dir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // replay every 10th event into the NEXT chunk, value poisoned:
          // visible in the result iff the streaming dedup fails
          val replays = ev.filter(col("event_id") % 10 === 3 &&
              col("chunk") < Chunks - 1)
            .withColumn("value", col("value") + lit(1.0e6d))
            .withColumn("chunk", col("chunk") + 1)
          val staged = ev.unionByName(replays)
          val baseMs = System.currentTimeMillis() - 3600L * 1000
          (0 until Chunks).foreach { c =>
            writeChunk(s, staged.filter(col("chunk") === c).drop("chunk"),
              staging, c, baseMs)
          }
        } finally ev.unpersist()

        // ---- the system under test: stream → dedup → CDC MERGE ----
        val schema = s.read.parquet(staging).schema
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(staging)
          // the watermark delay must exceed the maximum replay lag (one
          // chunk span ≈ 7.5 days of event time here) or replayed keys
          // may be evicted before their duplicate arrives; 8 days keeps
          // the dedup guarantee while still evicting state > one chunk
          // behind the frontier
          .withWatermark("tsw", "8 days")
          .dropDuplicatesWithinWatermark("event_id")
          .drop("tsw")
        val q = StreamAnalytics.cdcApply(stream, root, key = "user_id",
          versionCol = "ver", checkpointDir = Some(ckpt))
        q.awaitTermination()

        val versions = graft.operators.MergeTable.versions(s, root)
        require(versions.length >= 3,
          s"expected a multi-batch stream (≥3 MERGE commits), got " +
            s"${versions.length} — the chunked file source collapsed " +
            "into too few micro-batches")
        graft.operators.MergeTable.snapshot(s, root)
          .groupBy(col("event_type").as("last_event_type"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("event_id")).as("eid_sum"),
            // epoch SECONDS: a nanos sum overflows int64 past ~5 rows
            sum(expr("ts div 1000000000")).as("ts_sum"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
          .orderBy(col("last_event_type"))
      },
      Some("""WITH ranked AS (
             |  SELECT user_id, event_id, event_type, value, epoch_ns(ts) AS tsn,
             |         row_number() OVER (PARTITION BY user_id
             |             ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
             |  FROM events)
             |SELECT event_type AS last_event_type, count(*) AS n_users,
             |  CAST(sum(event_id) AS BIGINT) AS eid_sum,
             |  CAST(sum(tsn // 1000000000) AS BIGINT) AS ts_sum,
             |  min(value) AS min_value, max(value) AS max_value
             |FROM ranked WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "multi-batch AvailableNow stream -> watermarked dedup -> foreachBatch CDC MERGE; final table snapshot vs relational replay"),
  )
}
