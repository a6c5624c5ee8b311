package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries exercising [[MergeTable]] end-to-end: build a
  * real on-disk table from `orders`, MERGE a deterministic CDC batch
  * (updates + deletes + inserts-by-absence), and read back — latest
  * snapshot for `lake_merge_upsert`, the PRE-merge version for
  * `lake_time_travel`. The observable state is pure relational algebra
  * (anti-join ∪ surviving updates), so DuckDB replays it with SQL while
  * the Spark side goes through the actual commit protocol — manifest
  * log, file-skipping, copy-on-write rewrite — making the oracle a
  * differential test of the storage layer, not just the expression.
  *
  * Each run builds in a throwaway temp dir and returns a collected
  * ≤5-row rollup as a LocalRelation (the table itself is the artifact
  * under test, not the result set). Floats: the only arithmetic is one
  * IEEE `+ 1.0` and min/max — exact cross-engine; sums stay on int64.
  */
object LakeQueries extends QueryModule {

  private val KeyMod = 97L

  private def base(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  /** Every 97th key: status forced to 'U', price bumped exactly one
    * IEEE step of 1.0; every 194th additionally flagged deleted. */
  private def cdcBatch(df: DataFrame): DataFrame =
    df.filter(col("o_orderkey") % KeyMod === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0d))
      .withColumn("deleted", col("o_orderkey") % (2 * KeyMod) === 0)

  private def summarize(df: DataFrame): DataFrame =
    df.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_orderkey")).as("key_sum"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("status"))

  /** Build the table (append base, merge the CDC batch) in a temp dir,
    * hand the (v1, v2, root) to `read`, materialize its bounded result,
    * clean up. */
  private def withTable(s: SparkSession, dir: String)(
      read: (Long, Long, String) => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lake")
    val root = tmp.resolve("orders_tbl").toString
    try {
      val b = base(s, dir)
      val v1 = MergeTable.append(s, root, b, "o_orderkey")
      val v2 = MergeTable.merge(s, root, cdcBatch(b), "o_orderkey",
        deleteCol = Some("deleted"))
      val res = read(v1, v2, root)
      val rows = new java.util.ArrayList[Row]()
      res.collect().foreach(rows.add)
      s.createDataFrame(rows, res.schema)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp.toString), true)
    }
  }

  private val summaryCols =
    """count(*) AS n_orders, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price""".stripMargin

  override def defs: Seq[(String, Q)] = Seq(
    "lake_merge_upsert" -> Q(
      (s, dir) => withTable(s, dir) { (_, _, root) =>
        summarize(MergeTable.snapshot(s, root))
      },
      Some(s"""WITH upd AS (
             |  SELECT o_orderkey, 'U' AS o_orderstatus,
             |         o_totalprice + 1.0 AS o_totalprice,
             |         (o_orderkey % ${2 * KeyMod} = 0) AS deleted
             |  FROM orders WHERE o_orderkey % $KeyMod = 0),
             |merged AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
             |  WHERE NOT deleted)
             |SELECT o_orderstatus AS status, $summaryCols
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "copy-on-write MERGE (update+delete CDC batch) read back from the committed table"),

    "lake_time_travel" -> Q(
      (s, dir) => withTable(s, dir) { (v1, _, root) =>
        summarize(MergeTable.snapshot(s, root, asOf = Some(v1)))
      },
      Some(s"""SELECT o_orderstatus AS status, $summaryCols
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "snapshot-isolation time travel: pre-merge version read after the merge committed"),
  )
}
