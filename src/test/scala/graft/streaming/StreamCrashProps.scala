package graft.streaming

import graft.SparkSpec
import graft.operators.{MergeTable, Upsert}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Randomized crash-schedule checking for the streaming CDC chain —
  * the generalization of StreamSpec's single crash-point test. Each
  * schedule kills the query at a random point (mid-stage before the
  * MERGE, or post-MERGE before the checkpoint commit) in randomly
  * chosen micro-batches, restarts from the checkpoint, and must
  * converge to the last-write-wins model fold with a strictly
  * monotone version log whose LENGTH is exactly predicted: one commit
  * per logical batch plus one per post-MERGE crash (the re-delivered
  * batch re-merges idempotently — the retry is recorded, never
  * hidden). A clean pass through a batch (no crash) is the
  * post-checkpoint case by construction. */
class StreamCrashProps extends SparkSpec {
  import spark.implicits._

  private val cdcSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("ver", LongType)))

  /** Where a schedule kills batch b: before its MERGE lands (the
    * mid-stage crash — nothing durable yet) or after it lands but
    * before the checkpoint acknowledges (the replay window). */
  private sealed trait Crash
  private case object BeforeMerge extends Crash
  private case object AfterMerge extends Crash

  test("random crash schedules: CDC converges to the model fold; version log monotone and exactly sized") {
    val rnd = new scala.util.Random(20260814L)
    val Schedules = 50

    for (schedule <- 1 to Schedules) {
      val base = Files.createTempDirectory(f"graft-crash-$schedule%02d")
      val src = base.resolve("src").toString
      val tbl = base.resolve("t").toString
      val ckpt = base.resolve("ck").toString
      new java.io.File(src).mkdirs()

      // 3 logical batches over a hot keyspace (0..5) with a globally
      // increasing version: plenty of cross-batch key collisions, and
      // occasionally two versions of one key INSIDE a batch (the
      // within-batch last-write-wins path).
      var ver = 0L
      val batches: Seq[Seq[(Long, String, Long)]] = (0 until 3).map { b =>
        val keys = rnd.shuffle((0L to 5L).toList).take(2 + rnd.nextInt(3))
        val doubled = if (rnd.nextInt(3) == 0) keys.head :: keys else keys
        doubled.map { k => ver += 1; (k, s"b$b-k$k-v$ver", ver) }
      }
      val t0 = System.currentTimeMillis() - 60000L
      batches.zipWithIndex.foreach { case (rows, b) =>
        val f = java.nio.file.Paths.get(s"$src/b$b.json")
        Files.write(f, rows.map { case (k, v, vr) =>
          s"""{"k":$k,"v":"$v","ver":$vr}"""
        }.mkString("\n").getBytes("UTF-8"))
        f.toFile.setLastModified(t0 + b * 5000L)
      }

      // the crash plan: at most 2 crashes per schedule, keyed by the
      // streaming batchId (Spark re-delivers a failed batch under the
      // SAME id, so each planned crash fires exactly once)
      val plan = scala.collection.mutable.Map.empty[Long, Crash]
      rnd.shuffle((0L until 3L).toList).take(rnd.nextInt(3)).foreach { b =>
        plan(b) = if (rnd.nextBoolean()) BeforeMerge else AfterMerge
      }
      val afterCrashes = plan.valuesIterator.count(_ == AfterMerge)
      val pending = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      plan.keys.foreach(b => pending.add(b))

      def run(): Unit = {
        val q = spark.readStream.schema(cdcSchema)
          .option("maxFilesPerTrigger", 1).json(src)
          .writeStream.outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            if (!batch.isEmpty) {
              if (plan.get(id).contains(BeforeMerge) && pending.remove(id))
                throw new RuntimeException(s"simulated crash before merge $id")
              MergeTable.merge(batch.sparkSession, tbl,
                Upsert.lastWriteWins(batch, "k", "ver"), "k")
              if (plan.get(id).contains(AfterMerge) && pending.remove(id))
                throw new RuntimeException(s"simulated crash after merge $id")
            }
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }

      var starts = 0
      var done = false
      while (!done) {
        starts += 1
        assert(starts <= 6, s"schedule $schedule did not converge")
        try { run(); done = true }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException =>
            assert(e.getMessage.contains("simulated crash"),
              s"schedule $schedule died for a non-injected reason: $e")
        }
      }

      // model: global last-write-wins on ver
      val expected = batches.flatten
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._3)._2 }
      val got = MergeTable.snapshot(spark, tbl).select("k", "v")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected, s"schedule $schedule (plan $plan): $got != $expected")

      // version log: commits are DENSE (each claims basis+1, so any gap
      // means a lost or overwritten commit — `versions` returns sorted
      // names, so sortedness itself is not the checkable property), and
      // there is exactly one per logical batch plus one per post-MERGE
      // crash replay
      val vs = MergeTable.versions(spark, tbl)
      assert(vs.nonEmpty && vs == (vs.head to vs.last),
        s"schedule $schedule: version log not dense: $vs")
      assert(vs.size == batches.size + afterCrashes,
        s"schedule $schedule (plan $plan): ${vs.size} commits, " +
          s"expected ${batches.size} + $afterCrashes replays")
      assert(pending.isEmpty, s"schedule $schedule left crashes unfired")

      // STATE-idempotence, checked per version: the file source delivers
      // batches in mtime order under the same ids across restarts, so
      // the commit sequence is b0 [, b0-replay], b1 [, b1-replay], b2
      // [, b2-replay]. Replay the model fold prefix-by-prefix and
      // demand the time-travel snapshot at EVERY version matches — in
      // particular a post-MERGE replay commit must reproduce the
      // pre-crash state exactly (a re-merge that double-applied or
      // rewrote content would diverge here even though the final
      // snapshot looks right).
      val foldAfter: Seq[Map[Long, String]] = batches.indices.map { i =>
        batches.take(i + 1).flatten
          .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._3)._2 }
      }
      val expectedStates = batches.indices.flatMap { b =>
        val st = foldAfter(b)
        if (plan.get(b.toLong).contains(AfterMerge)) Seq(st, st) else Seq(st)
      }
      assert(vs.size == expectedStates.size)
      vs.zip(expectedStates).foreach { case (v, st) =>
        val snap = MergeTable.snapshot(spark, tbl, asOf = Some(v))
          .select("k", "v").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(snap == st,
          s"schedule $schedule (plan $plan) version $v: $snap != $st")
      }

      org.apache.hadoop.fs.FileUtil.fullyDelete(base.toFile)
    }
  }

  test("random crash schedules WITH the compaction cadence: state sequence is exactly the model fold prefixes") {
    // The compactEvery path under the same crash model. Fold commits
    // make the exact version-count prediction of the first property
    // brittle (a fold fires only when ≥2 small files exist), so the
    // load-bearing invariant here is stronger and count-free: walking
    // the version log, the sequence of DISTINCT consecutive states must
    // be exactly the model fold prefixes — a fold or an idempotent
    // replay may repeat its predecessor's state, but no commit may ever
    // produce a state outside the fold sequence (a fold that loses or
    // duplicates rows, or a replay that double-applies, lands a foreign
    // state and fails here even if the FINAL snapshot looks right).
    val rnd = new scala.util.Random(20260815L)
    for (schedule <- 1 to 20) {
      val base = Files.createTempDirectory(f"graft-crashc-$schedule%02d")
      val src = base.resolve("src").toString
      val tbl = base.resolve("t").toString
      val ckpt = base.resolve("ck").toString
      new java.io.File(src).mkdirs()

      var ver = 0L
      val batches: Seq[Seq[(Long, String, Long)]] = (0 until 3).map { b =>
        val keys = rnd.shuffle((0L to 5L).toList).take(2 + rnd.nextInt(3))
        keys.map { k => ver += 1; (k, s"b$b-k$k-v$ver", ver) }
      }
      val t0 = System.currentTimeMillis() - 60000L
      batches.zipWithIndex.foreach { case (rows, b) =>
        val f = java.nio.file.Paths.get(s"$src/b$b.json")
        Files.write(f, rows.map { case (k, v, vr) =>
          s"""{"k":$k,"v":"$v","ver":$vr}"""
        }.mkString("\n").getBytes("UTF-8"))
        f.toFile.setLastModified(t0 + b * 5000L); ()
      }
      val plan = scala.collection.mutable.Map.empty[Long, Crash]
      rnd.shuffle((0L until 3L).toList).take(rnd.nextInt(3)).foreach { b =>
        plan(b) = if (rnd.nextBoolean()) BeforeMerge else AfterMerge
      }
      val pending = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      plan.keys.foreach(b => pending.add(b))

      def run(): Unit = {
        val q = spark.readStream.schema(cdcSchema)
          .option("maxFilesPerTrigger", 1).json(src)
          .writeStream.outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            if (!batch.isEmpty) {
              if (plan.get(id).contains(BeforeMerge) && pending.remove(id))
                throw new RuntimeException(s"simulated crash before merge $id")
              MergeTable.merge(batch.sparkSession, tbl,
                Upsert.lastWriteWins(batch, "k", "ver"), "k")
              if (plan.get(id).contains(AfterMerge) && pending.remove(id))
                throw new RuntimeException(s"simulated crash after merge $id")
              if ((id + 1) % 2 == 0)
                MergeTable.compactFiles(batch.sparkSession, tbl, "k")
            }
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      var starts = 0
      var done = false
      while (!done) {
        starts += 1
        assert(starts <= 6, s"schedule $schedule did not converge")
        try { run(); done = true }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException =>
            assert(e.getMessage.contains("simulated crash"),
              s"schedule $schedule died for a non-injected reason: $e")
        }
      }

      val foldAfter: Seq[Map[Long, String]] = batches.indices.map { i =>
        batches.take(i + 1).flatten
          .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._3)._2 }
      }
      val vs = MergeTable.versions(spark, tbl)
      assert(vs.nonEmpty && vs == (vs.head to vs.last),
        s"schedule $schedule: version log not dense: $vs")
      val states = vs.map { v =>
        MergeTable.snapshot(spark, tbl, asOf = Some(v))
          .select("k", "v").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
      }
      val distinctRun = states.foldLeft(List.empty[Map[Long, String]]) {
        (acc, st) => if (acc.headOption.contains(st)) acc else st :: acc
      }.reverse
      assert(distinctRun == foldAfter,
        s"schedule $schedule (plan $plan): state sequence $distinctRun != model $foldAfter")
      assert(pending.isEmpty, s"schedule $schedule left crashes unfired")

      org.apache.hadoop.fs.FileUtil.fullyDelete(base.toFile)
    }
  }
}
