package graft.ingest

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based parser fuzzing (SURVEY.md §5.2): random block shapes —
  * signed/unsigned txs, string/object accountKeys, failed/ok, with/
  * without token balances — must satisfy the structural invariants
  * regardless of input. */
object ParseProps extends Properties("Parse") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = SparkSession.builder()
    // keep the extension surface identical to SparkSpec: whichever
    // suite builds the JVM's shared session first must carry the lake
    // catalog's analyzer rules (build-time-only injection)
    .withExtensions(new graft.plans.GraftExtensions)
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class GTx(signed: Boolean, objKeys: Boolean, failed: Boolean,
      nInstr: Int, nBals: Int)

  private val genTx: Gen[GTx] = for {
    signed <- Gen.prob(0.8)
    objKeys <- Gen.prob(0.3)
    failed <- Gen.prob(0.3)
    nInstr <- Gen.choose(0, 4)
    nBals <- Gen.choose(0, 3)
  } yield GTx(signed, objKeys, failed, nInstr, nBals)

  private def txJson(slot: Long, i: Int, t: GTx): String = {
    val sigs = if (t.signed) s"""["sig_${slot}_$i"]""" else "[]"
    val keys = if (t.objKeys) s"""[{"pubkey":"w_$i"}]""" else s"""["w_$i"]"""
    val instrs = (0 until t.nInstr)
      .map(j => s"""{"programId":"p_$j","accounts":[],"data":"d"}""").mkString(",")
    val bals = (0 until t.nBals).map(j =>
      s"""{"accountIndex":$j,"mint":"m_$j","owner":"w_$i","uiTokenAmount":{"amount":"$j","decimals":0,"uiAmountString":"$j"}}""")
      .mkString(",")
    val err = if (t.failed) "\"SomeError\"" else "null"
    s"""{"transaction":{"signatures":$sigs,"message":{"accountKeys":$keys,"instructions":[$instrs]}},
       |"meta":{"err":$err,"fee":1,"preTokenBalances":[],"postTokenBalances":[$bals],"logMessages":[]}}"""
      .stripMargin.replace("\n", "")
  }

  private def blockJson(slot: Long, txs: Seq[GTx]): String =
    s"""{"blockTime":${1704067200L + slot},"transactions":[${
      txs.zipWithIndex.map { case (t, i) => txJson(slot, i, t) }.mkString(",")}]}"""

  private val genBlocks: Gen[List[(Long, List[GTx])]] =
    Gen.choose(1, 4).flatMap { n =>
      Gen.sequence[List[(Long, List[GTx])], (Long, List[GTx])](
        (1 to n).map(s => Gen.listOfN(3, genTx).map(ts => (s.toLong, ts))))
    }

  property("fan-out counts, idempotency, id uniqueness") = forAll(genBlocks) { blocks =>
    import spark.implicits._
    val raw = blocks.map { case (s, ts) => (s, blockJson(s, ts)) }.toDF("slot", "block_json")
    val parsed = Parse.parse(raw).cache()
    val n = parsed.count()

    val signedTxs = blocks.flatMap(_._2).filter(_.signed)
    val expected = signedTxs.size +                      // tx events
      signedTxs.map(_.nInstr).sum +                      // instruction events
      signedTxs.map(_.nBals).sum                         // transfer events

    val uniqueIds = parsed.select("event_id").distinct().count()
    val twice = Parse.parse(raw.union(raw)).count()
    val successOk = parsed
      .filter($"event_type" === "transaction")
      .select(org.apache.spark.sql.functions
        .get_json_object($"raw_payload", "$.success").as("s"))
      .as[String].collect()
      .forall(s => s == "true" || s == "false")
    parsed.unpersist()

    (n == expected) :| s"count $n != expected $expected" &&
      (uniqueIds == n) :| "event ids must be unique" &&
      (twice == n) :| "replaying input must not add events" &&
      successOk :| "success must be boolean"
  }
}
