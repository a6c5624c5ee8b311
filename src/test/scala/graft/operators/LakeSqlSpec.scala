package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The lake's SQL-text surface (GraftCatalog + GraftLakeRule): reads,
  * VERSION AS OF time travel, and MERGE INTO must drive the SAME commit
  * protocol as the API — asserted by interleaving SQL and API calls on
  * one table. */
class LakeSqlSpec extends SparkSpec {

  import spark.implicits._

  // ONE warehouse per suite: the CatalogManager caches the catalog
  // instance at first reference, so re-pointing the root conf later
  // would be ignored — exactly how a production session behaves
  private lazy val warehouse: String = graft.plans.GraftCatalog.ensure(
    spark, Files.createTempDirectory("graft_lake_sql").toString)
  private def freshCatalog(): String = warehouse

  test("SELECT and VERSION AS OF read through the catalog") {
    val wh = freshCatalog()
    val root = s"$wh/db/t1"
    val v1 = MergeTable.append(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), "k")
    MergeTable.merge(spark, root, Seq((2L, "b2"), (3L, "c")).toDF("k", "s"), "k")

    val now = spark.sql("SELECT k, s FROM graft.db.t1 ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(now == Seq((1L, "a"), (2L, "b2"), (3L, "c")))

    val old = spark.sql(s"SELECT k, s FROM graft.db.t1 VERSION AS OF $v1 ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(old == Seq((1L, "a"), (2L, "b")))

    // the swapped-in plan is the NATIVE parquet scan (pushdown,
    // codegen) — not a row-at-a-time DSv2 reader
    val plan = spark.sql("SELECT k FROM graft.db.t1 WHERE k = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,2)]"), plan)
  }

  test("MERGE INTO runs the commit protocol (update + insert)") {
    val wh = freshCatalog()
    val root = s"$wh/db/t2"
    MergeTable.append(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "n"), "k")
    Seq((2L, "b2", 21L), (3L, "c", 30L)).toDF("k", "s", "n")
      .createOrReplaceTempView("updates")

    val v = spark.sql(
      """MERGE INTO graft.db.t2 AS t USING updates AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .as[Long].head()
    // the SQL verb committed a real version: API reads see it, and time
    // travel to the pre-merge version still answers
    assert(MergeTable.versions(spark, root).last == v)
    val got = MergeTable.snapshot(spark, root)
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "b2", 21L), (3L, "c", 30L)))
    assert(MergeTable.snapshot(spark, root, Some(v - 1))
      .count() == 2L)
  }

  test("MERGE INTO CDC form: source delete flag maps to deleteCol") {
    val wh = freshCatalog()
    val root = s"$wh/db/t3"
    MergeTable.append(spark, root,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), "k")
    // delete 2, update 3, and a flagged non-match (9) that must be
    // IGNORED per the engine contract
    Seq((2L, "x", true), (3L, "c2", false), (9L, "z", true))
      .toDF("k", "s", "del").createOrReplaceTempView("cdc")

    spark.sql(
      """MERGE INTO graft.db.t3 AS t USING cdc AS s ON t.k = s.k
        |WHEN MATCHED AND s.del THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED AND NOT s.del THEN INSERT *""".stripMargin).collect()

    val got = MergeTable.snapshot(spark, root).select("k", "s")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (3L, "c2")))
  }

  test("CREATE TABLE bootstraps a keyed empty table; unsupported shapes fail loudly") {
    val wh = freshCatalog()
    spark.sql(
      """CREATE TABLE graft.db.t4 (k BIGINT, s STRING)
        |USING graft TBLPROPERTIES ('key' = 'k')""".stripMargin)
    assert(spark.sql("SELECT * FROM graft.db.t4").count() == 0L)
    // the declared schema is committed: a later merge must conform
    MergeTable.merge(spark, s"$wh/db/t4",
      Seq((5L, "e")).toDF("k", "s"), "k")
    assert(spark.sql("SELECT s FROM graft.db.t4 WHERE k = 5").as[String].head() == "e")

    // partial-column assignment has no faithful MergeTable mapping
    Seq((5L, "u")).toDF("k", "s").createOrReplaceTempView("u5")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft.db.t4 AS t USING u5 AS s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.s = s.s""".stripMargin).collect()
    }
    assert(e.getMessage != null)
  }

  test("catalog surfaces: listTables, missing table, version floor, travel-target merge") {
    val wh = freshCatalog()
    MergeTable.append(spark, s"$wh/nsx/ta", Seq((1L, "a")).toDF("k", "s"), "k")
    MergeTable.append(spark, s"$wh/nsx/tb", Seq((2L, "b")).toDF("k", "s"), "k")
    val listed = spark.sql("SHOW TABLES IN graft.nsx").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(listed == Set("ta", "tb"))

    // an unknown table must resolve to the standard not-found error,
    // not an opaque path failure
    val nf = intercept[Exception] {
      spark.sql("SELECT * FROM graft.nsx.nope").collect()
    }
    assert(nf.getMessage.contains("nope"), nf.getMessage)

    // time travel below the table's first version fails loudly through
    // the SQL path (MergeTable's version-floor contract)
    val vf = intercept[Exception] {
      spark.sql("SELECT * FROM graft.nsx.ta VERSION AS OF 999").collect()
    }
    assert(vf.getMessage != null)

    // MERGE INTO a time-travelled snapshot is refused: a pinned version
    // is not a writable head
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("tt_upd")
    val tm = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft.nsx.ta VERSION AS OF 1 AS t USING tt_upd AS s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    }
    assert(tm.getMessage != null)
  }
}
