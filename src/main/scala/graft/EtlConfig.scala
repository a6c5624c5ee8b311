package graft

/** Env-var runtime config — the reference's `ETLConfig`
  * (/root/reference/src/config.rs:27-33,63-83): same variable names,
  * same defaults, so a reference deployment's environment drives this
  * engine unchanged. Each knob maps to the Spark-native equivalent of
  * what it tuned in the reference:
  *
  *  - `ETL_BATCH_SIZE` (1000) — the reference flushes its upsert batch
  *    every N events (incremental.rs:68, backfill.rs:100). Here a
  *    micro-batch IS the flush unit, so the knob becomes the
  *    incremental-blocks per-trigger slot admission
  *    (`maxSlotsPerTrigger`): one trigger = one idempotent sink commit.
  *  - `ETL_CHECKPOINT_INTERVAL` (100) — the reference records
  *    `last_processed_slot` every N slots during backfill
  *    (backfill.rs:119). Here it is the tracked-backfill segment size:
  *    [[graft.ingest.Checkpoints.runTracked]] commits a progress row
  *    per N-slot segment, making a crashed backfill resumable
  *    mid-range instead of only at range granularity.
  *  - `ETL_BACKFILL_CHUNK_SIZE` (1000) — the reference fetches the
  *    range in N-slot chunks (backfill.rs:22). Here it is the fetch
  *    partition granularity: ceil(range / chunk) input partitions, so
  *    the cluster scheduler owns concurrency while chunk size bounds
  *    per-task work and retry blast radius — at 100 TB a lost task
  *    refetches one chunk, not a worker's whole share.
  *  - `ETL_INTERVAL_SECONDS` (30) — the incremental poll cadence
  *    (incremental.rs:10-17); becomes the ProcessingTime trigger when
  *    no explicit interval argument is given.
  *  - `ETL_MAX_SLOT_LAG` (1000) — the health SLO bound
  *    (config.rs:80-83); the `health` verb's default lag ceiling.
  *
  * Pure function of an env map (injectable for tests: `sys.env` is
  * process-frozen on the JVM). Malformed numbers fall back to the
  * default, exactly the reference's `.parse().ok().unwrap_or(...)`.
  */
final case class EtlConfig(
    batchSize: Long,
    checkpointInterval: Long,
    backfillChunkSize: Long,
    intervalSeconds: Long,
    maxSlotLag: Long)

object EtlConfig {
  def apply(env: Map[String, String] = sys.env): EtlConfig = EtlConfig(
    batchSize = longVar(env, "ETL_BATCH_SIZE", 1000L),
    checkpointInterval = longVar(env, "ETL_CHECKPOINT_INTERVAL", 100L),
    backfillChunkSize = longVar(env, "ETL_BACKFILL_CHUNK_SIZE", 1000L),
    intervalSeconds = longVar(env, "ETL_INTERVAL_SECONDS", 30L),
    maxSlotLag = longVar(env, "ETL_MAX_SLOT_LAG", 1000L))

  /** Non-positive values are as unusable as unparseable ones for every
    * knob above (a 0-slot chunk is a division by zero, a 0-second poll
    * is a busy loop) — both take the default, loudly is the caller's
    * job. */
  private def longVar(env: Map[String, String], name: String, dflt: Long): Long =
    env.get(name).flatMap(_.toLongOption).filter(_ > 0).getOrElse(dflt)

  /** Presence-gated knob read — for the vars whose mere PRESENCE flips
    * a behavior (segmented backfill checkpointing, the incremental
    * poll-vs-drain posture) rather than tuning an always-on one. The
    * value still parses with [[longVar]]'s tolerance so `set but
    * malformed` keeps the reference's unwrap_or(default) semantics
    * instead of silently disabling the behavior the operator asked
    * for. One parser for each var: callers must not re-parse. */
  def explicitLong(env: Map[String, String], name: String,
      dflt: Long): Option[Long] =
    if (env.contains(name)) Some(longVar(env, name, dflt)) else None
}
