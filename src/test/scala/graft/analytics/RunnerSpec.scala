package graft.analytics

import graft.SparkSpec
import graft.ingest.{Backfill, Parse}
import java.nio.file.Files

/** End-to-end reference-parity pipeline: backfill → fact table → the ten
  * analytics result tables (the `analytics` subcommand). */
class RunnerSpec extends SparkSpec {

  test("runAll materializes all ten reference result tables") {
    val base = Files.createTempDirectory("graft_runner").toString
    Backfill.run(spark, 1L, 101L, workers = 4, s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    // anchor inside the synthetic block time range (slots → minutes past
    // 2024-01-01)
    val anchor = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val counts = AnalyticsRunner.runAll(spark, fact, anchor, s"$base/analytics")

    assert(counts.size == 14)
    // fact_telemetry (SCHEMA.md:161-188) materializes schema-only when
    // the fact stream carries no telemetry events — the exact state of
    // the reference's declared table (its parser never emits rows)
    assert(counts("fact_telemetry") == 0L)
    assert(spark.read.parquet(s"$base/analytics/fact_telemetry")
      .columns.toSet.contains("latency_ms"))
    // star dims (SCHEMA.md:190-262) materialize alongside the summaries
    assert(counts("dim_wallets") > 0)
    assert(counts("dim_programs") > 0)
    assert(counts("dim_tokens") > 0)
    assert(counts("analytics_transaction_volume") == 1L)
    assert(counts("analytics_active_programs") > 0)
    assert(counts("analytics_top_tokens") > 0)
    assert(counts("analytics_failed_transactions") == 1L)
    assert(counts("analytics_top_errors") > 0)     // every slot has 1 failed tx
    assert(counts("analytics_wallet_activity") == 1L)
    assert(counts("analytics_top_wallets") > 0)
    assert(counts("analytics_program_trends") > 0)

    // failure-rate semantics: synthetic blocks have 1 failed of 2 txs
    val fr = spark.read.parquet(s"$base/analytics/analytics_failed_transactions")
      .collect()(0)
    assert(fr.getDecimal(1).doubleValue() == 50.0)

    // trends are bounded by the top-10 semi-join
    val trends = spark.read.parquet(s"$base/analytics/analytics_program_trends")
    assert(trends.select("program_id").distinct().count() <= 10)
  }

  test("runAll with blocks also materializes the typed fact tables") {
    val base = Files.createTempDirectory("graft_runner_typed").toString
    Backfill.run(spark, 1L, 51L, workers = 4, s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    val blocks = graft.ingest.Parse.parseBlocks(
      Backfill.fetchRange(spark, 1L, 51L, workers = 4))
    val anchor = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val counts = AnalyticsRunner.runAll(spark, fact, anchor,
      s"$base/analytics", blocks = Some(blocks))

    assert(counts.size == 16)
    assert(counts("fact_program_events") > 0)
    assert(counts("fact_token_transfers") > 0)
    // the typed columns survive the warehouse write with their declared
    // types (SCHEMA.md:85-154): ARRAY<STRING> accounts/log_messages,
    // NUMERIC(38,9) token_amount
    import org.apache.spark.sql.types._
    val pe = spark.read.parquet(s"$base/analytics/fact_program_events")
    assert(pe.schema("accounts").dataType.isInstanceOf[ArrayType])
    assert(pe.schema("log_messages").dataType.isInstanceOf[ArrayType])
    assert(pe.schema("data_hex").dataType == StringType)
    val tt = spark.read.parquet(s"$base/analytics/fact_token_transfers")
    assert(tt.schema("token_amount").dataType == DecimalType(38, 9))
    // typed rows link 1:1 into the canonical event stream by event_id
    val linked = tt.join(fact, Seq("event_id")).count()
    assert(linked == counts("fact_token_transfers"))
  }
}
