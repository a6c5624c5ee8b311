package graft.ingest

import graft.{Q, QueryModule}
import org.apache.spark.sql.functions._

/** Ingest-layer operators surfaced as driver queries. These run over the
  * deterministic synthetic block source (the RPC stand-in), not the
  * testdata tables, so they carry no DuckDB oracle — correctness is
  * covered by ParseSpec/IngestSpec golden vectors and the rows-only
  * check.
  */
object IngestQueries extends QueryModule {

  override val defs: Seq[(String, Q)] = Seq(

    // Full backfill-parse fan-out over a fixed slot range: blocks →
    // canonical events grouped per event_type (parsers.rs:10-30 families).
    "ingest_parse_fanout" -> Q(
      (s, _) => {
        val raw = Backfill.fetchRange(s, 1L, 201L, workers = 8)
        Parse.parse(raw)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("tx_signature")).as("n_txs"),
            countDistinct(col("slot")).as("n_slots"))
          .orderBy(col("event_type"))
      },
      None,
      doc = "ref parsers.rs:10-30 block→event fan-out (synthetic RPC source)"),

    // The netting join the reference sketches (parsers.rs:179-182).
    "ingest_net_transfers" -> Q(
      (s, _) => {
        val blocks = Parse.parseBlocks(Backfill.fetchRange(s, 1L, 201L, workers = 8))
        Parse.netTokenTransfers(blocks)
          .groupBy(col("mint"))
          .agg(count(lit(1)).as("n_accounts"),
            sum(col("net_amount")).cast("long").as("total_net"))
          .orderBy(col("mint"))
      },
      None,
      doc = "ref parsers.rs:179-182 pre/post netting (J4)"),
  )
}
