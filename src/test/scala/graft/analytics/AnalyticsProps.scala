package graft.analytics

import graft.ingest.{Backfill, Parse}
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based invariants of the analytics layer (SURVEY.md §5.2
  * item 3) over randomized ingest ranges: period-count monotonicity,
  * failure-rate bounds, trend top-k cardinality — must hold for ANY slot
  * range the backfill produces. */
object AnalyticsProps extends Properties("Analytics") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

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

  private val genRange: Gen[(Long, Long)] = for {
    start <- Gen.choose(1L, 3000L)
    len <- Gen.choose(20L, 200L)
  } yield (start, start + len)

  property("period monotonicity, rate bounds, trend top-k") = forAll(genRange) {
    case (startSlot, endSlot) =>
      val fact = Parse.parse(Backfill.fetchRange(spark, startSlot, endSlot, workers = 4))
      // anchor inside the synthetic time range (slot → minutes past 2024-01-01)
      val anchor = new java.sql.Timestamp(
        (1704067200L + ((startSlot + endSlot) / 2) * 60) * 1000L)

      val vol = AnalyticsRunner.transactionVolume(fact, anchor).collect()(0)
      val (total, today, week, month) =
        (vol.getLong(0), vol.getLong(1), vol.getLong(2), vol.getLong(3))

      val fr = AnalyticsRunner.failedTransactions(fact).collect()(0)
      val rate = fr.getDecimal(1).doubleValue()

      val trends = AnalyticsRunner.programTrends(fact, anchor)
      val nPrograms = trends.select("program_id").distinct().count()

      val wallets = AnalyticsRunner.topWallets(fact).collect()

      (today <= week && week <= month && month <= total) :| s"periods not monotone: $today/$week/$month/$total" &&
        (rate >= 0.0 && rate <= 100.0) :| s"rate out of bounds: $rate" &&
        (nPrograms <= 10) :| s"trends cover $nPrograms programs (> top-10)" &&
        (wallets.length <= 20 &&
          wallets.map(_.getLong(1)).sameElements(wallets.map(_.getLong(1)).sortBy(-_))) :|
          "top wallets not ordered/limited"
  }
}
