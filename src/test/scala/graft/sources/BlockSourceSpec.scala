package graft.sources

import graft.SparkSpec
import graft.ingest.{Backfill, Parse}
import org.apache.spark.sql.functions._

class BlockSourceSpec extends SparkSpec {

  private def blocks(start: Long, end: Long, workers: Int = 4) =
    spark.read.format("graft.sources.BlockSource")
      .option("startSlot", start).option("endSlot", end)
      .option("workers", workers).load()

  test("reads the slot range with workers-way partitioning") {
    val df = blocks(1, 101, workers = 4)
    assert(df.rdd.getNumPartitions == 4)
    // every 97th slot missing by design (only slot 97 in 1..100)
    assert(df.count() == 99L)
    assert(df.columns.toSeq == Seq("slot", "block_json"))
  }

  test("slot predicates push into the source (fetch-range narrowing)") {
    val df = blocks(1, 1000001, workers = 4).filter(col("slot") >= 999990L)
    // if the filter did NOT push down, this would fetch a million blocks;
    // pushed down, it reads ~11 — assert on both the plan and the speed
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("slots=[999990,1000001)"), plan)
    val t0 = System.nanoTime()
    assert(df.count() > 0)
    assert((System.nanoTime() - t0) / 1e9 < 10.0, "pushdown did not narrow the fetch")
  }

  test("DSv2 source feeds the parse pipeline identically to fetchRange") {
    val viaSource = Parse.parse(blocks(1, 51))
    val viaRange = Parse.parse(Backfill.fetchRange(spark, 1, 51, workers = 4))
    assert(viaSource.count() == viaRange.count())
    val a = viaSource.select("event_id").collect().map(_.getString(0)).sorted
    val b = viaRange.select("event_id").collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
  }

  test("RateLimiter enforces the 1/rate cadence between fetches") {
    // deterministic virtual clock: park() is the only thing advancing time
    var now = 0L
    val parked = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rl = new RateLimiter(100.0, // 100 req/s → 10ms interval
      nanoTime = () => now,
      park = n => { parked += n; now += n })
    val waits = (1 to 10).map(_ => rl.acquire())
    assert(waits.head == 0L)                        // first permit is free
    assert(waits.tail.forall(_ == 10000000L))       // then strict 10ms pacing
    assert(parked.sum == 9L * 10000000L)
    // rate ≤ 0 disables pacing entirely
    val off = new RateLimiter(0.0, () => fail("clock must not be read"),
      _ => fail("must not park"))
    assert((1 to 5).map(_ => off.acquire()).forall(_ == 0L))
  }

  test("FetchRetry: transient failures back off exponentially, then succeed") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = FetchRetry.withRetry(maxRetries = 3, baseDelayMs = 10, sleeps += _) {
      calls += 1
      if (calls <= 2) throw new RuntimeException("transient RPC error")
      "block"
    }
    assert(out == "block" && calls == 3)
    assert(sleeps.toSeq == Seq(10L, 20L)) // base·2ⁿ
    // persistent failure: retries exhausted → the error surfaces
    val sleeps2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val e = intercept[RuntimeException] {
      FetchRetry.withRetry(maxRetries = 2, baseDelayMs = 5, sleeps2 += _) {
        throw new RuntimeException("down")
      }
    }
    assert(e.getMessage == "down")
    assert(sleeps2.toSeq == Seq(5L, 10L))
  }

  test("rate-limited read returns identical rows and actually paces") {
    // 1000 req/s over 99 slots on 1 worker → ≥ ~98ms of enforced pacing
    val limited = spark.read.format("graft.sources.BlockSource")
      .option("startSlot", 1).option("endSlot", 101)
      .option("workers", 1).option("ratePerSec", 1000.0).load()
    val t0 = System.nanoTime()
    assert(limited.count() == 99L)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed >= 0.09, s"pacing not enforced: ${elapsed}s for 99 fetches at 1000/s")
  }
}
