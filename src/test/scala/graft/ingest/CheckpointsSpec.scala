package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** etl_checkpoints semantics (SCHEMA.md:283-300): status transitions,
  * crash surfacing, and the resume worklist. */
class CheckpointsSpec extends SparkSpec {

  test("tracked backfill transitions in_progress → completed") {
    val base = Files.createTempDirectory("graft_ckpt").toString
    val ckpt = s"$base/ckpt"; val out = s"$base/events"
    Checkpoints.runTracked(spark, ckpt, "bf_1_101", 1L, 101L, workers = 4, out)
    val snap = Checkpoints.snapshot(spark, ckpt).collect()
    assert(snap.length == 1)
    val row = snap.head
    assert(row.getAs[String]("status") == Checkpoints.Completed)
    assert(row.getAs[Long]("last_processed_slot") == 100L)
    assert(Checkpoints.incomplete(spark, ckpt).count() == 0)
    // the underlying log keeps BOTH rows (append-only audit trail)
    assert(spark.read.parquet(ckpt).count() == 2)
    assert(spark.read.parquet(out).count() > 0)
  }

  test("failing fetch surfaces as failed and stays on the resume worklist") {
    val base = Files.createTempDirectory("graft_ckpt_fail").toString
    val ckpt = s"$base/ckpt"; val out = s"$base/events"
    val boom: Backfill.BlockFetcher =
      s => if (s >= 150) throw new RuntimeException("rpc down") else Backfill.syntheticBlock(s)
    intercept[Exception] {
      Checkpoints.runTracked(spark, ckpt, "bf_100_201", 100L, 201L, workers = 4, out,
        fetcher = boom)
    }
    val bad = Checkpoints.incomplete(spark, ckpt).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("status") == Checkpoints.Failed)
    assert(bad.head.getAs[Long]("start_slot") == 100L)
    // a successful re-run of the same checkpoint id clears the worklist
    Checkpoints.runTracked(spark, ckpt, "bf_100_201", 100L, 201L, workers = 4, out)
    assert(Checkpoints.incomplete(spark, ckpt).count() == 0)
  }
}
