package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI mirroring the reference's four subcommands
  * (/root/reference/src/main.rs:13-37) so a reference user can switch:
  *
  * {{{
  *   graft.Main backfill <start_slot> <end_slot> <workers> <out>
  *   graft.Main incremental <src_dir> <sink> <checkpoint> [intervalSec]
  *   graft.Main analytics <fact_path> <out_dir> [anchor e.g. 2024-01-16T00:00:00]
  *   graft.Main health <fact_path>
  * }}}
  */
object Main {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = args.toList match {
    // optional trailing arg = etl_checkpoints path: the run is then
    // recorded in_progress/completed/failed and resumable via
    // Checkpoints.incomplete (SCHEMA.md:283-300)
    case "backfill" :: start :: end :: workers :: out :: rest if rest.length <= 1 =>
      val spark = session()
      rest.headOption match {
        case Some(ckpt) =>
          ingest.Checkpoints.runTracked(spark, ckpt, s"bf_${start}_$end",
            start.toLong, end.toLong, workers.toInt, out)
        case None =>
          ingest.Backfill.run(spark, start.toLong, end.toLong, workers.toInt, out)
      }
      println(s"backfill complete: ${spark.read.parquet(out).count()} events")
      spark.stop()

    case "incremental" :: src :: sink :: ckpt :: rest =>
      val spark = session()
      val trigger = rest.headOption match {
        case Some(sec) => org.apache.spark.sql.streaming.Trigger
          .ProcessingTime(s"$sec seconds") // the reference's poll interval
        case None => org.apache.spark.sql.streaming.Trigger.AvailableNow()
      }
      val q = ingest.Incremental.start(spark, src, sink, ckpt, trigger)
      q.awaitTermination()
      spark.stop()

    // incremental from the native block source: slots are the streaming
    // offsets (no drop-directory needed) — parse + idempotent sink are
    // the same foreachBatch tail as the file path.
    case "incremental-blocks" :: start :: tip :: sink :: ckpt :: Nil =>
      val spark = session()
      val raw = spark.readStream.format("graft.sources.BlockSource")
        .option("startSlot", start.toLong).option("tipSlot", tip.toLong)
        .option("workers", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
        .load()
      val q = ingest.Incremental.startFromRaw(raw, sink, ckpt)
      q.awaitTermination()
      println(s"incremental-blocks complete: ${spark.read.parquet(sink).count()} events")
      spark.stop()

    case "analytics" :: fact :: out :: rest =>
      val spark = session()
      // the anchor is a UTC instant — Timestamp.valueOf would interpret
      // it in the host JVM's zone and shift every period boundary
      val anchor = java.sql.Timestamp.from(
        java.time.LocalDateTime
          .parse(rest.headOption.getOrElse("2024-01-16T00:00:00"))
          .toInstant(java.time.ZoneOffset.UTC))
      val counts = analytics.AnalyticsRunner.runAll(
        spark, spark.read.parquet(fact), anchor, out)
      counts.toSeq.sortBy(_._1).foreach { case (t, n) => println(s"$t: $n rows") }
      spark.stop()

    // optional args: <chainTipSlot> [maxSlotLag] enable the slot-lag SLO
    // the reference declares but never enforces (health.rs:51-54 +
    // config.rs:80-83 ETL_MAX_SLOT_LAG, default 1000): status flips to
    // "behind" when sink lag exceeds the bound.
    case "health" :: fact :: rest if rest.length <= 2 =>
      // RPC reachability + warehouse SELECT-1 (health.rs:7-58) →
      // source readability + sink tip probe. Null-safe: an empty sink is
      // healthy-but-behind, not a crash. Args are validated BEFORE the
      // session spins up: a malformed number goes through the usage/
      // exit-2 path, not a bare NumberFormatException stack trace.
      val slo = parseHealthArgs(rest) match {
        case Left(err) => usageExit(err)
        case Right(v) => v
      }
      val spark = session()
      val row = spark.read.parquet(fact).agg(max(col("slot"))).collect()(0)
      val tip = if (row.isNullAt(0)) -1L else row.getLong(0)
      slo match {
        case Some((chainTip, maxLag)) =>
          val lag = math.max(0L, chainTip - tip)
          val status = if (lag <= maxLag) "ok" else "behind"
          println(s"""{"status":"$status","sink_tip_slot":$tip,"slot_lag":$lag,"max_slot_lag":$maxLag}""")
        case None =>
          println(s"""{"status":"ok","sink_tip_slot":$tip}""")
      }
      spark.stop()

    // the whole registered query surface from the CLI: list names, or
    // run one by name against a testdata-layout dir (show to stdout, or
    // parquet when an output path is given) — what makes every operator
    // in COVERAGE.md reachable without writing a driver program
    case "queries" :: Nil =>
      SparkEntry.orderedQueries.map(_._1).foreach(println)

    case "query" :: name :: sfDir :: rest if rest.length <= 1 =>
      SparkEntry.queries.get(name) match {
        case None =>
          usageExit(s"unknown query: $name (run `queries` for the " +
            s"${SparkEntry.queries.size} registered names)")
        case Some(fn) =>
          val spark = session()
          val df = fn(spark, sfDir)
          rest.headOption match {
            case Some(out) =>
              df.write.mode("overwrite").parquet(out)
              println(s"$name -> $out: ${spark.read.parquet(out).count()} rows")
            case None => df.show(50, truncate = false)
          }
          spark.stop()
      }

    case other =>
      usageExit(s"unknown command: ${other.mkString(" ")}")
  }

  /** health's optional `[chainTipSlot [maxSlotLag]]` args.
    * Left = usage error (malformed number), Right(None) = no SLO check,
    * Right(Some((chainTip, maxLag))) = enforce the slot-lag SLO. */
  private[graft] def parseHealthArgs(rest: List[String]): Either[String, Option[(Long, Long)]] =
    try rest match {
      case Nil => Right(None)
      case chainTip :: more =>
        Right(Some((chainTip.toLong, more.headOption.map(_.toLong).getOrElse(1000L))))
    } catch {
      case _: NumberFormatException =>
        Left(s"health: malformed numeric argument: ${rest.mkString(" ")}")
    }

  private def usageExit(msg: String): Nothing = {
    System.err.println(
      s"""$msg
         |usage: backfill <start> <end> <workers> <out> [ckptPath]
         |       incremental <src_dir> <sink> <ckpt> [intervalSec]
         |       incremental-blocks <startSlot> <tipSlot> <sink> <ckpt>
         |       analytics <fact_path> <out_dir> [anchorTimestamp]
         |       health <fact_path> [chainTipSlot [maxSlotLag]]
         |       queries
         |       query <name> <sf_dir> [out_parquet]""".stripMargin)
    sys.exit(2)
  }
}
