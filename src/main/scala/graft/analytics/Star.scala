package graft.analytics

import graft.{Q, QueryModule, Tables}
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's declared-only star schema
  * (/root/reference/docs/SCHEMA.md:190-262: dim_wallets, dim_programs,
  * dim_tokens) actually built — as derived dimensions over the event
  * stream, the "materialized views or scheduled jobs" the schema
  * rationale defers to.
  *
  * Scale shape: every dim is one grouped aggregation over the fact
  * table (min/max/count — partial-aggregable, one shuffle), and every
  * enrichment join broadcasts the dim against the fact scan (J1). The
  * dims here are small by construction (distinct wallets/programs/
  * tokens ≪ events); at 100 TB the same build runs incrementally per
  * ingest batch and the joins stay broadcast until the dim outgrows the
  * threshold, where AQE flips to shuffle join.
  */
object Star extends QueryModule {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  private val dNs = "epoch_ns(ts)"

  /** dim_wallets (SCHEMA.md:192-218): first/last seen + activity
    * aggregates per wallet, one grouped pass. */
  def dimWallets(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(
        expr("min(ts)").as("first_seen_ns"),
        expr("max(ts)").as("last_seen_ns"),
        count(lit(1)).as("total_transactions"),
        count(when(col("event_type") === "purchase", 1)).as("total_purchases"))

  /** dim_programs (SCHEMA.md:220-241): per-program first/last seen and
    * usage counts; event_type plays program_id (FIXTURES.md mapping). */
  def dimPrograms(events: DataFrame): DataFrame =
    events.groupBy(col("event_type").as("program_id"))
      .agg(
        expr("min(ts) div 1000").as("first_seen_us"),
        expr("max(ts) div 1000").as("last_seen_us"),
        count(lit(1)).as("tx_count"),
        countDistinct(col("user_id")).as("uniq_wallets"))

  /** dim_tokens (SCHEMA.md:243-262): per-mint stats; props.k plays the
    * mint. */
  def dimTokens(events: DataFrame): DataFrame =
    events.filter(propK().isNotNull)
      .groupBy(propK().as("token_k"))
      .agg(
        expr("min(ts) div 1000").as("first_seen_us"),
        expr("max(ts) div 1000").as("last_seen_us"),
        count(lit(1)).as("transfer_count"))

  /** Incremental dim maintenance (the schema rationale's "updated via
    * materialized views or scheduled jobs", SCHEMA.md:204): fold a new
    * batch's dim into the existing dim WITHOUT rescanning history.
    * Every dim_wallets aggregate is a semigroup (min/max/sum), so
    * merge = union + one grouped re-aggregation over (|dim| + |delta|)
    * rows — at 100 TB this is the difference between touching the full
    * fact table per batch and touching only the batch. Associativity is
    * pinned by StarSpec: incremental over any split ≡ one-shot build. */
  def mergeDimWallets(existing: DataFrame, batch: DataFrame): DataFrame =
    existing.unionByName(dimWallets(batch))
      .groupBy(col("user_id"))
      .agg(
        min(col("first_seen_ns")).as("first_seen_ns"),
        max(col("last_seen_ns")).as("last_seen_ns"),
        sum(col("total_transactions")).as("total_transactions"),
        sum(col("total_purchases")).as("total_purchases"))

  /** Append-only delta log for the wallet dim: each ingest batch appends
    * its own one-pass dim build; nothing rewrites history, so a crashed
    * writer never corrupts the dim (the MetadataStore discipline applied
    * to a semigroup aggregate instead of last-write-wins). */
  def appendDimDelta(batch: DataFrame, path: String): Unit = {
    // heal a torn compaction swap BEFORE appending: a fresh append would
    // recreate `path` beside `<path>_prev`, making the interrupted-swap
    // state (dst missing) unrecognizable — the next compaction would
    // then delete prev, the only copy of pre-crash history
    graft.operators.StoreOps.recoverInterrupted(batch.sparkSession, path)
    dimWallets(batch).write.mode(org.apache.spark.sql.SaveMode.Append).parquet(path)
  }

  /** Current dim view: one grouped re-aggregation over the delta log —
    * correct after any number of appends because every column is a
    * semigroup fold (see [[mergeDimWallets]]). */
  def dimSnapshot(spark: SparkSession, path: String): DataFrame = {
    // reads heal a torn compaction swap too (MetadataStore.snapshot
    // discipline) — otherwise the read throws while `<path>_prev` holds
    // the only complete copy. Grace-gated: a reader can also observe
    // the torn state during a LIVE compaction's swap window, and must
    // wait it out rather than heal under the compactor (StoreOps docs).
    graft.operators.StoreOps.recoverInterrupted(spark, path,
      graft.operators.StoreOps.ReadHealGraceMs)
    spark.read.parquet(path)
      .groupBy(col("user_id"))
      .agg(
        min(col("first_seen_ns")).as("first_seen_ns"),
        max(col("last_seen_ns")).as("last_seen_ns"),
        sum(col("total_transactions")).as("total_transactions"),
        sum(col("total_purchases")).as("total_purchases"))
  }

  /** Compact the delta log back to one row per wallet (run periodically
    * so snapshot cost stays O(|dim|), not O(batches·|dim|)) — crash-safe
    * swap via [[graft.operators.StoreOps]], shared with the metadata
    * store. */
  def compactDim(spark: SparkSession, path: String): Unit = {
    // heal a torn prior swap before READING — dimSnapshot would otherwise
    // throw (or see nothing) while <path>_prev holds the only copy
    graft.operators.StoreOps.recoverInterrupted(spark, path)
    graft.operators.StoreOps.replaceWith(spark, path, dimSnapshot(spark, path))
  }

  override val defs: Seq[(String, Q)] = Seq(

    // The dim_programs build as an oracle row: one grouped pass, all
    // aggregates partial-aggregable.
    "star_dim_programs" -> Q(
      (s, dir) =>
        dimPrograms(ev(s, dir)).orderBy(col("program_id")),
      Some(s"""SELECT event_type AS program_id,
              | min($dNs) // 1000 AS first_seen_us,
              | max($dNs) // 1000 AS last_seen_us,
              | count(*) AS tx_count,
              | count(DISTINCT user_id) AS uniq_wallets
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "SCHEMA.md:220-241 dim_programs built from the fact stream"),

    // J1 dim-enrichment over EVENTS (not TPC-H): purchases joined to
    // the derived wallet dim (broadcast — the dim is tiny) and rolled
    // up by acquisition cohort (the wallet's first-seen day). One fact
    // scan, one broadcast join, one grouped shuffle.
    "star_wallet_cohorts" -> Q(
      (s, dir) => {
        val e = ev(s, dir)
        val dim = dimWallets(e)
          .select(col("user_id"),
            date_format(expr("timestamp_micros(first_seen_ns div 1000)"), "yyyy-MM-dd")
              .as("cohort_day"))
        e.filter(col("event_type") === "purchase")
          .join(broadcast(dim), Seq("user_id"))
          .groupBy(col("cohort_day"), tsDay().as("day"))
          .agg(
            count(lit(1)).as("purchases"),
            countDistinct(col("user_id")).as("wallets"),
            round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
              .as("total_value"))
          .orderBy(col("cohort_day"), col("day"))
      },
      Some(s"""WITH dim AS (
              |  SELECT user_id,
              |    strftime(make_timestamp(min($dNs) // 1000), '%Y-%m-%d') AS cohort_day
              |  FROM events GROUP BY 1)
              |SELECT cohort_day,
              | strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
              | count(*) AS purchases,
              | count(DISTINCT user_id) AS wallets,
              | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
              |FROM events JOIN dim USING (user_id)
              |WHERE event_type = 'purchase'
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "J1 star enrichment over events: fact × broadcast wallet dim"),
  )
}
