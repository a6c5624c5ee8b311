package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared mechanics for the append-only parquet stores (metadata KV,
  * checkpoint log, dim delta logs): monotonic versioning and log
  * compaction. One implementation so a fix lands everywhere.
  */
object StoreOps {

  /** Next strictly-monotonic version for a store at `path`: wall clock,
    * bumped past the stored max so same-millisecond writes and clock
    * skew still resolve in write order. */
  def nextVersion(spark: SparkSession, path: String, versionCol: String): Long = {
    val prevMax: Long =
      try {
        val r = spark.read.parquet(path).agg(max(col(versionCol))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      } catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    math.max(System.currentTimeMillis(), prevMax + 1)
  }

  /** Replace the directory at `path` with `snapshot`, staged through a
    * sibling dir on the PATH'S OWN filesystem. The previous log is
    * renamed aside before the staged result renames in, and deleted only
    * after — so no crash point loses committed data: a crash mid-swap
    * leaves `<path>_prev` (and possibly `<path>_staged`) intact for
    * recovery. Maintenance op: assumes a single writer (concurrent
    * compactors of one store are out of scope, like VACUUM). */
  def replaceWith(spark: SparkSession, path: String, snapshot: DataFrame): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(path + "_staged")
    val prev = new org.apache.hadoop.fs.Path(path + "_prev")
    snapshot.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(staged.toString)
    fs.delete(prev, true)
    if (!fs.rename(dst, prev))
      throw new java.io.IOException(s"compaction: could not stage $dst aside")
    if (!fs.rename(staged, dst)) {
      fs.rename(prev, dst) // roll back — the old log is still complete
      throw new java.io.IOException(s"compaction: could not publish $staged")
    }
    fs.delete(prev, true)
  }
}
