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

  def set(spark: SparkSession, path: String, key: String, value: String): Unit = {
    import spark.implicits._
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
    * this at `Long.MaxValue` (one shared implementation). History is
    * valid until a [[compact]] rewrites it to the live snapshot (the
    * standard table-format retention trade). */
  def snapshotAt(spark: SparkSession, path: String, asOfVersion: Long): DataFrame = {
    StoreOps.recoverInterrupted(spark, path, StoreOps.ReadHealGraceMs)
    try Upsert.lastWriteWins(
      spark.read.parquet(path).filter(col("updated_at") <= asOfVersion),
      "key", "updated_at")
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        import spark.implicits._
        Seq.empty[(String, String, Long)].toDF("key", "value", "updated_at")
    }
  }

  /** Compact the append-only log to one live row per key, bounding read
    * cost after many updates (crash-safe swap via [[StoreOps]]). */
  def compact(spark: SparkSession, path: String): Unit =
    StoreOps.replaceWith(spark, path, snapshot(spark, path))

  /** last_confirmed_slot accessors (warehouse.rs:251-285 semantics). */
  def lastSlot(spark: SparkSession, path: String): Option[Long] =
    get(spark, path, "last_confirmed_slot").map(_.toLong)
  def updateLastSlot(spark: SparkSession, path: String, slot: Long): Unit =
    set(spark, path, "last_confirmed_slot", slot.toString)
}
