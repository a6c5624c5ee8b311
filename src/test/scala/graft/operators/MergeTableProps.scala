package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based checking: a random sequence of CDC batches (updates,
  * inserts, deletes, flagged non-matches) applied to [[MergeTable]]
  * must equal the same sequence folded through a driver-side Map — at
  * EVERY intermediate version, not just the end (time travel is part of
  * the contract). A maintenance op (checkpoint or compactFiles) is
  * interleaved mid-sequence to prove reads are invariant under both. */
class MergeTableProps extends SparkSpec {
  import spark.implicits._

  private def applyModel(m: Map[Long, String],
      batch: Seq[(Long, String, Boolean)]): Map[Long, String] =
    batch.foldLeft(m) { case (acc, (k, v, del)) =>
      if (del) acc - k else acc + (k -> v)
    }

  test("random CDC sequences: every version's snapshot equals the model fold") {
    val rnd = new scala.util.Random(42L)
    val root = java.nio.file.Files.createTempDirectory("graft-mtp")
      .resolve("t").toString
    var model = Map.empty[Long, String]
    val history = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, String])]

    for (step <- 1 to 8) {
      // key-unique batch over a small hot keyspace → plenty of matches
      val keys = rnd.shuffle((0L until 30L).toList).take(3 + rnd.nextInt(6))
      val batch = keys.map(k => (k, s"v$step-$k", rnd.nextInt(4) == 0))
      val v = MergeTable.merge(spark, root,
        batch.toDF("k", "v", "deleted"), "k", deleteCol = Some("deleted"))
      model = applyModel(model, batch)
      history += ((v, model))

      if (step == 4) MergeTable.checkpoint(spark, root)
      if (step == 6) MergeTable.compactFiles(spark, root, "k", smallerThan = 1000L)
    }

    def read(asOf: Option[Long]): Map[Long, String] =
      MergeTable.snapshot(spark, root, asOf)
        .select(col("k"), col("v")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(read(None) == model)
    // every CDC version replays exactly (compaction/checkpoint versions
    // between them are pure rewrites and are covered transitively by
    // the reads at the versions around them)
    history.foreach { case (v, expect) =>
      assert(read(Some(v)) == expect, s"diverged at version $v")
    }
  }

  test("random op sequence incl. evolution, zorder, vacuum: every version replays the model") {
    val rnd = new scala.util.Random(7L)
    val root = java.nio.file.Files.createTempDirectory("graft-mte")
      .resolve("t").toString
    // model value: (v, score) — score None before the table evolves or
    // for rows never re-merged after it
    var model = Map.empty[Long, (String, Option[Long])]
    val history = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, (String, Option[Long])], Boolean)]
    var evolved = false

    for (step <- 1 to 10) {
      val keys = rnd.shuffle((0L until 25L).toList).take(4 + rnd.nextInt(4))
      if (step == 5) evolved = true
      val v =
        if (!evolved) {
          val batch = keys.map(k => (k, s"v$step-$k", rnd.nextInt(4) == 0))
          val ver = MergeTable.merge(spark, root,
            batch.toDF("k", "v", "deleted"), "k", deleteCol = Some("deleted"))
          model = batch.foldLeft(model) { case (m, (k, s, del)) =>
            if (del) m - k else m + (k -> (s, None)) }
          ver
        } else {
          val batch = keys.map(k =>
            (k, s"v$step-$k", k * 10 + step, rnd.nextInt(4) == 0))
          val ver = MergeTable.merge(spark, root,
            batch.toDF("k", "v", "score", "deleted"), "k",
            deleteCol = Some("deleted"), evolveSchema = step == 5)
          model = batch.foldLeft(model) { case (m, (k, s, sc, del)) =>
            if (del) m - k else m + (k -> (s, Some(sc))) }
          ver
        }
      history += ((v, model, evolved))

      // maintenance ops are pure rewrites: state must be invariant
      if (step == 3) MergeTable.checkpoint(spark, root)
      if (step == 7) MergeTable.optimizeZorder(spark, root, "k", "k", "score")
      if (step == 8) MergeTable.compactFiles(spark, root, "k", smallerThan = 1000L)
    }

    def read(asOf: Option[Long]): Map[Long, (String, Option[Long])] = {
      val df = MergeTable.snapshot(spark, root, asOf)
      if (df.columns.contains("score"))
        df.select(col("k"), col("v"), col("score")).collect()
          .map(r => r.getLong(0) -> (r.getString(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      else
        df.select(col("k"), col("v")).collect()
          .map(r => r.getLong(0) -> (r.getString(1), None: Option[Long])).toMap
    }

    history.foreach { case (v, expect, ev) =>
      assert(read(Some(v)) == expect, s"diverged at version $v")
      // pre-evolution versions read through the era's own narrow schema
      assert(MergeTable.snapshot(spark, root, Some(v))
        .columns.contains("score") == ev, s"schema era wrong at $v")
    }
    assert(read(None) == model)

    // vacuum to a mid-history floor: at/above stays exact, below throws
    val floorV = history(5)._1
    MergeTable.vacuum(spark, root, horizon = floorV, graceMs = 0L)
    history.filter(_._1 >= floorV).foreach { case (v, expect, _) =>
      assert(read(Some(v)) == expect, s"post-vacuum divergence at $v")
    }
    history.filter(_._1 < floorV).foreach { case (v, _, _) =>
      val e = intercept[IllegalArgumentException] { read(Some(v)) }
      assert(e.getMessage.contains("vacuum floor"))
    }
  }

  test("racing writers: exactly one plan per basis publishes, readers never see a torn table") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.{Failure, Success, Try}

    val root = java.nio.file.Files.createTempDirectory("graft-mtr")
      .resolve("t").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    var model = (0L until 10L).map(k => k -> s"seed$k").toMap
    MergeTable.append(spark, root,
      model.toSeq.toDF("k", "v"), "k")

    def readMap(): Map[Long, String] =
      MergeTable.snapshot(spark, root)
        .select(col("k"), col("v")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

    // the only states a reader may EVER observe mid-race: the pre-race
    // table plus any subset of the racing batches (commits are atomic
    // and ordered; a torn/partial batch is the thing being disproved)
    def assertUntorn(seen: Map[Long, String],
        valid: Set[Map[Long, String]]): Unit =
      assert(valid.contains(seen),
        s"reader observed a state matching no committed prefix: $seen")

    for (round <- 1 to 5) {
      // key-disjoint batches: if the race serializes (both succeed),
      // the final state is order-independent; if one loses the commit
      // race, the winner's batch alone lands
      val batchA = Seq((100L + round, s"A$round", false),
        (2L, s"A2-$round", false))
      val batchB = Seq((200L + round, s"B$round", false),
        (7L, s"B7-$round", round % 2 == 0))
      val before = model

      val gate = new java.util.concurrent.CyclicBarrier(2)
      def race(batch: Seq[(Long, String, Boolean)]): Future[Try[Long]] =
        Future {
          gate.await()
          Try(MergeTable.merge(spark, root,
            batch.toDF("k", "v", "deleted"), "k",
            deleteCol = Some("deleted")))
        }
      val fa = race(batchA)
      val fb = race(batchB)

      // a concurrent reader mid-race: every observation must equal the
      // model folded over SOME subset of the racing batches
      val valid = Set(
        before,
        applyModel(before, batchA),
        applyModel(before, batchB),
        applyModel(applyModel(before, batchA), batchB))
      (1 to 3).foreach(_ => assertUntorn(readMap(), valid))

      val (ra, rb) = (Await.result(fa, 120.seconds),
        Await.result(fb, 120.seconds))
      val outcomes = Seq(batchA -> ra, batchB -> rb)

      // exactly one writer per basis publishes; a loser fails LOUDLY
      // with the conflict spelled out (never a silent half-merge)
      assert(outcomes.exists(_._2.isSuccess), s"round $round: both lost")
      outcomes.foreach {
        case (_, Failure(e)) =>
          assert(e.isInstanceOf[java.util.ConcurrentModificationException],
            s"loser must surface CME, got $e")
          assert(e.getMessage.contains("committed by another writer") &&
            e.getMessage.contains("basis"),
            s"loser's error must name the conflict: ${e.getMessage}")
        case _ => ()
      }
      val versions = outcomes.collect { case (_, Success(v)) => v }
      assert(versions.distinct.size == versions.size,
        "two writers claimed the same version")

      // fold ONLY the published batches, in version order (disjoint
      // keys make it order-free, but stay honest)
      outcomes.collect { case (b, Success(v)) => (v, b) }
        .sortBy(_._1)
        .foreach { case (_, b) => model = applyModel(model, b) }
      assert(readMap() == model,
        s"round $round: table diverged from the published-batch fold")

      // no dangling references: every live manifest entry points at a
      // data file that exists (the torn state a racing writer's cleanup
      // could have caused by deleting a winner's committed files)
      MergeTable.liveFiles(spark, root).select(col("file")).collect()
        .foreach { r =>
          val p = new org.apache.hadoop.fs.Path(root, r.getString(0))
          assert(fs.exists(p), s"manifest references missing file $p")
        }
    }
  }
}
