package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's `etl_metadata` KV table (key TEXT PRIMARY KEY, value
  * TEXT, updated_at — /root/reference/src/warehouse.rs:148-159) as a tiny
  * versioned parquet store: batch-mode pipeline state (`last_confirmed_
  * slot` and friends) for jobs that don't run under a streaming
  * checkpoint. Upserts are last-write-wins on the version column via
  * [[Upsert.lastWriteWins]]; the store is append-only underneath, so a
  * crashed writer never corrupts prior state.
  */
object MetadataStore {

  /** Reserved key recording the version floor of the last [[compact]]:
    * history at or above it survives compaction (the live row per key),
    * history below it is gone. Hidden from every read view; [[set]]
    * rejects it. */
  val FloorKey = "_compaction_floor"

  def set(spark: SparkSession, path: String, key: String, value: String): Unit = {
    import spark.implicits._
    require(key != FloorKey, s"'$FloorKey' is reserved for compaction bookkeeping")
    // Strictly monotonic version (StoreOps): two updates inside one
    // millisecond would tie on wall-clock alone, and Upsert's descending
    // STRING tiebreak on value could then snapshot the stale write
    // (e.g. "9" > "10" lexically).
    val version = StoreOps.nextVersion(spark, path, "updated_at")
    Seq((key, value, version))
      .toDF("key", "value", "updated_at")
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Current (latest-version) view of the store. Heals a torn compaction
    * swap first — otherwise a crashed store reads as empty, and a
    * subsequent compact would snapshot that emptiness over the data.
    * Read path, so healing is grace-gated: see [[StoreOps.recoverInterrupted]]
    * on the reader-vs-live-compactor race. */
  def snapshot(spark: SparkSession, path: String): DataFrame =
    snapshotAt(spark, path, Long.MaxValue)

  def get(spark: SparkSession, path: String, key: String): Option[String] =
    snapshot(spark, path).filter(col("key") === key)
      .select("value").collect().headOption.map(_.getString(0))

  /** Version-travel read: the store as it stood at `asOfVersion`
    * (inclusive) — the append-only log IS the history, so time travel
    * is one filter before the last-write-wins collapse; [[snapshot]] is
    * this at `Long.MaxValue` (one shared implementation). History below
    * the [[compact]]ion floor is GONE (the standard table-format
    * retention trade), and reading past it fails loudly — the compacted
    * rows filtered to an old version would silently impersonate the
    * historical state (or an empty store). */
  def snapshotAt(spark: SparkSession, path: String, asOfVersion: Long): DataFrame = {
    StoreOps.recoverInterrupted(spark, path, StoreOps.ReadHealGraceMs)
    val raw = rawLog(spark, path)
    val floor = floorOf(raw)
    require(asOfVersion >= floor,
      s"asOfVersion $asOfVersion precedes the compaction floor $floor of $path: " +
        "history before the last compact() is unrecoverable")
    Upsert.lastWriteWins(
      raw.filter(col("updated_at") <= asOfVersion && col("key") =!= FloorKey),
      "key", "updated_at")
  }

  private def rawLog(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        import spark.implicits._
        Seq.empty[(String, String, Long)].toDF("key", "value", "updated_at")
    }

  /** The recorded compaction floor (0 for a never-compacted store). */
  private def floorOf(raw: DataFrame): Long =
    raw.filter(col("key") === FloorKey)
      .agg(max(col("value").cast("long"))).collect().headOption
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).getOrElse(0L)

  /** Compact the append-only log to one live row per key, bounding read
    * cost after many updates (crash-safe swap via [[StoreOps]]). The
    * surviving max version is recorded under [[FloorKey]] so
    * [[snapshotAt]] can refuse (instead of silently misanswering)
    * version-travel reads into the discarded history. */
  def compact(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    // Heal BEFORE the first read, not inside a later snapshot() call: a
    // torn prior swap reads as an EMPTY log, so the floor math below
    // would compute 0 from it and the compacted store would forget that
    // its early history is gone — then the heal inside snapshot() would
    // resurrect the data but not the floor.
    StoreOps.recoverInterrupted(spark, path)
    // one materialized read serves the floor, the discard ceiling, and
    // the snapshot fold — compact runs precisely when the log is large,
    // so three passes over it are two too many (and the persist also
    // pins one consistent view under the replaceWith swap below)
    val raw0 = rawLog(spark, path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try compactPinned(spark, path, raw0)
    finally raw0.unpersist()
  }

  private def compactPinned(spark: SparkSession, path: String,
      raw0: DataFrame): Unit = {
    import spark.implicits._
    val raw = raw0.filter(col("key") =!= FloorKey)
    // The floor is the exact as-of horizon compaction destroys: a key
    // with a SINGLE version keeps its full history (the one row answers
    // every as-of), so only keys holding ≥ 2 versions lose anything —
    // and for such a key every asOfVersion below its surviving latest
    // is unanswerable (the overwritten rows are gone, so a filtered
    // read would impersonate absence). Hence floor = max(latest) over
    // multi-version keys — deliberately CONSERVATIVE: it also rejects
    // reads below a key's first-ever write, which the compacted log
    // could still answer correctly (key simply absent). Fail-loud over
    // wrong-answer; a routine compact of an append-mostly store still
    // rejects almost nothing it can answer. Monotonic via the prior
    // floor — an emptied-but-previously-compacted store must not forget
    // that its early history is gone.
    val discardedCeil = raw.groupBy(col("key"))
      .agg(max(col("updated_at")).as("latest"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(max(col("latest"))).collect().headOption
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).getOrElse(0L)
    val floor = math.max(floorOf(raw0), discardedCeil)
    val snap = Upsert.lastWriteWins(raw, "key", "updated_at")
    val withMarker =
      if (floor == 0L) snap // nothing ever discarded: no floor to record
      else snap.unionByName(
        Seq((FloorKey, floor.toString, floor)).toDF("key", "value", "updated_at"))
    StoreOps.replaceWith(spark, path, withMarker)
  }

  /** last_confirmed_slot accessors (warehouse.rs:251-285 semantics). */
  def lastSlot(spark: SparkSession, path: String): Option[Long] =
    get(spark, path, "last_confirmed_slot").map(_.toLong)
  def updateLastSlot(spark: SparkSession, path: String, slot: Long): Unit =
    set(spark, path, "last_confirmed_slot", slot.toString)
}
