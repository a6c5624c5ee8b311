package graft.ingest

import graft.model.Schemas
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Block JSON → canonical events: the "T" of the reference ETL
  * (/root/reference/src/parsers.rs:10-30,44-100), Spark-first.
  *
  * The reference walks each block imperatively; here the fan-out is three
  * declarative explode branches over the same parsed block DataFrame —
  * tx events, instruction events, token-transfer events — unioned by name
  * (SURVEY.md §2.10: no UDTF needed). Catalyst prunes each branch to the
  * columns it touches, and the whole pipeline is codegen'd; per-record
  * tolerance (parsers.rs:22-26,83-91) comes from PERMISSIVE JSON parsing
  * (malformed blocks/txs yield nulls that the branches filter out).
  */
object Parse {

  import Schemas._

  /** Deterministic event id — exact hex parity with
    * sha256("{slot}:{sig}:{idx}:{type}") (events.rs:76-86). */
  def eventId(slot: Column, sig: Column, idx: Column, evType: Column): Column =
    sha2(concat_ws(":", slot.cast("string"), sig, idx.cast("string"), evType), 256)

  /** First-signer wallet from the dual-shape accountKeys entry: plain
    * base58 string OR `{"pubkey": …}` object (parsers.rs:225-242). The
    * schema captures object entries as their raw JSON text, so pubkey
    * extraction falls back to the plain string. */
  def walletFromKey(k: Column): Column =
    coalesce(get_json_object(k, "$.pubkey"), k)

  /** raw (slot, block_json) rows → parsed block rows. Blocks missing
    * `blockTime` are dropped (whole-block parse error path,
    * parsers.rs:33-41). */
  def parseBlocks(raw: DataFrame): DataFrame =
    raw.select(col("slot"), from_json(col("block_json"), blockSchema).as("b"))
      .filter(col("b").isNotNull && col("b.blockTime").isNotNull)

  /** Parsed blocks → canonical event rows (all three event families,
    * deduplicated on the deterministic id — replay-safe by construction,
    * warehouse.rs:227-229). */
  def toEvents(blocks: DataFrame): DataFrame = {
    val base = blocks.select(
      col("slot"),
      timestamp_seconds(col("b.blockTime")).as("block_time"),
      posexplode(col("b.transactions")).as(Seq("tx_index", "tx")))
      // malformed tx tolerance: must carry a signature (parsers.rs:50-52);
      // try_element_at, not element_at — ANSI mode (Spark 4 default)
      // throws on out-of-bounds access of an empty signatures array.
      .filter(col("tx").isNotNull &&
        try_element_at(col("tx.transaction.signatures"), lit(1)).isNotNull)
      .select(col("slot"), col("block_time"), col("tx"),
        try_element_at(col("tx.transaction.signatures"), lit(1)).as("sig"),
        col("tx.meta.err").isNull.as("success"),
        walletFromKey(try_element_at(col("tx.transaction.message.accountKeys"), lit(1)))
          .as("wallet"))

    // 1 tx event per transaction (parsers.rs:44-79)
    val txEvents = base.select(
      col("slot"), col("block_time"), col("sig"),
      lit(null).cast("string").as("program_id"),
      lit(-1).as("instruction_index"),
      lit(EvTransaction).as("event_type"),
      to_json(struct(
        col("wallet"), col("success"), col("tx.meta.fee").as("fee"),
        col("tx.meta.err").as("err"))).as("raw_payload"))

    // 1 event per instruction, classified by the token-program allow-list
    // (parsers.rs:126-161): pure expression, no UDF (SURVEY.md §2.10).
    val instrEvents = base.select(
      col("slot"), col("block_time"), col("sig"), col("wallet"), col("success"),
      posexplode(col("tx.transaction.message.instructions"))
        .as(Seq("instruction_index", "ins")))
      .filter(col("ins").isNotNull && col("ins.programId").isNotNull)
      .select(
        col("slot"), col("block_time"), col("sig"),
        col("ins.programId").as("program_id"),
        col("instruction_index"),
        when(col("ins.programId").isin(TokenPrograms: _*), EvTokenInstruction)
          .otherwise(EvProgramInstruction).as("event_type"),
        to_json(struct(col("wallet"), col("success"),
          col("ins.accounts").as("accounts"), col("ins.data").as("data")))
          .as("raw_payload"))

    // 1 event per post-token-balance with a mint (parsers.rs:163-203);
    // index offset 10000 mirrors the reference's transfer-id namespace
    // separation from instruction indexes.
    val transferEvents = base.select(
      col("slot"), col("block_time"), col("sig"), col("wallet"),
      posexplode(col("tx.meta.postTokenBalances")).as(Seq("bal_index", "bal")))
      .filter(col("bal").isNotNull && col("bal.mint").isNotNull)
      .select(
        col("slot"), col("block_time"), col("sig"),
        lit(null).cast("string").as("program_id"),
        (col("bal_index") + 10000).as("instruction_index"),
        lit(EvTokenTransfer).as("event_type"),
        to_json(struct(
          col("bal.mint").as("token_mint"),
          col("bal.owner").as("to_wallet"),
          col("bal.uiTokenAmount.amount").as("token_amount"),   // string-precision
          col("bal.uiTokenAmount.decimals").as("decimals"))).as("raw_payload"))

    txEvents.unionByName(instrEvents).unionByName(transferEvents)
      .select(
        eventId(col("slot"), col("sig"), col("instruction_index"), col("event_type"))
          .as("event_id"),
        col("slot"), col("block_time"), col("sig").as("tx_signature"),
        col("program_id"), col("instruction_index"), col("event_type"),
        col("raw_payload"))
      .dropDuplicates("event_id")
  }

  /** End-to-end: raw block rows → canonical events. */
  def parse(raw: DataFrame): DataFrame = toEvents(parseBlocks(raw))

  /** Token-transfer netting the reference sketches but never implements
    * (parsers.rs:179-182): full-outer join of pre/post balances on
    * (signature, accountIndex, mint) with COALESCE-0 delta (SURVEY.md
    * §2.3 J4). String-precision amounts become DecimalType(38,0) raw
    * units — exact. */
  def netTokenTransfers(blocks: DataFrame): DataFrame = {
    def bals(side: String) = blocks.select(
      col("slot"),
      posexplode(col("b.transactions")).as(Seq("tx_index", "tx")))
      .filter(col("tx").isNotNull)
      .select(col("slot"),
        try_element_at(col("tx.transaction.signatures"), lit(1)).as("sig"),
        explode(col(s"tx.meta.${side}TokenBalances")).as("bal"))
      .filter(col("bal.mint").isNotNull)
      .select(col("slot"), col("sig"),
        col("bal.accountIndex").as("account_index"), col("bal.mint").as("mint"),
        col("bal.uiTokenAmount.amount").cast("decimal(38,0)").as(s"${side}_amount"))

    bals("pre").join(bals("post"), Seq("slot", "sig", "account_index", "mint"), "full_outer")
      .select(col("slot"), col("sig"), col("account_index"), col("mint"),
        (coalesce(col("post_amount"), lit(0)) - coalesce(col("pre_amount"), lit(0)))
          .as("net_amount"))
      .filter(col("net_amount") =!= 0)
  }
}
