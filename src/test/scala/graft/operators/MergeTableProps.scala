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
}
