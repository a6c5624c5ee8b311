package graft.sources

import graft.SparkSpec

/** JDBC-dialect portability: the container ships only Derby, so the
  * non-Derby branch of `TableMissingStates` (Postgres `42P01`) and the
  * portable DELETE+INSERT upsert run against [[MockPg]] — an in-memory
  * engine speaking Postgres SQLStates — through Spark's REAL jdbc
  * read/write paths (schema probe, CREATE TABLE, executor batches),
  * not a unit stub of the classification helper. */
class MockPgWarehouseSpec extends SparkSpec {

  private def freshWh(table: String): JdbcWarehouse = {
    MockPgDriver.ensureRegistered()
    JdbcWarehouse(s"${MockPg.UrlPrefix}mem", table)
  }

  test("readIfAny maps Postgres 42P01 (undefined_table) to None — the " +
      "non-Derby branch of TableMissingStates, end-to-end through spark.read.jdbc") {
    MockPg.reset()
    assert(freshWh("absent").readIfAny(spark).isEmpty)
  }

  test("isTableMissing classifies the three dialect SQLStates, nested or not") {
    import java.sql.SQLException
    for (state <- Seq("42X05", "42P01", "42S02")) {
      assert(JdbcWarehouse.isTableMissing(new SQLException("gone", state)), state)
      // wrapped two levels deep, as Spark's connection plumbing does
      assert(JdbcWarehouse.isTableMissing(
        new RuntimeException(new RuntimeException(new SQLException("gone", state)))))
    }
    // a transient error must NOT classify as missing (it would silently
    // disable the replay guard): lock timeout, permission, null state
    assert(!JdbcWarehouse.isTableMissing(new SQLException("lock timeout", "40001")))
    assert(!JdbcWarehouse.isTableMissing(new SQLException("denied", "42501")))
    assert(!JdbcWarehouse.isTableMissing(new SQLException("no state", null: String)))
    // a non-SQL exception with no cause chain is simply not-missing
    assert(!JdbcWarehouse.isTableMissing(new RuntimeException("a")))
  }

  test("upsert against a Postgres-semantics engine: create-on-first-write, " +
      "last-write-wins replay convergence, transactional DELETE+INSERT") {
    import spark.implicits._
    MockPg.reset()
    val wh = freshWh("kv")
    wh.upsert(Seq(("a", 1L, "v1"), ("b", 1L, "v1"))
      .toDF("k", "version", "payload"), "k", "version")
    val s1 = wh.readIfAny(spark).get.orderBy("k").collect()
    assert(s1.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("a", 1L, "v1"), ("b", 1L, "v1")))
    // conflicting keys take the newer version; a batch carrying both
    // versions of one key resolves in Spark before touching the engine
    wh.upsert(Seq(("a", 2L, "v2"), ("a", 1L, "stale"), ("c", 1L, "v1"))
      .toDF("k", "version", "payload"), "k", "version")
    val s2 = wh.readIfAny(spark).get.orderBy("k").collect()
    assert(s2.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("a", 2L, "v2"), ("b", 1L, "v1"), ("c", 1L, "v1")))
    // byte-identical replay is a no-op on row count (the ON CONFLICT
    // contract the reference's warehouse.rs:227-229 shape promises)
    wh.upsert(Seq(("a", 2L, "v2"), ("b", 1L, "v1"), ("c", 1L, "v1"))
      .toDF("k", "version", "payload"), "k", "version")
    assert(wh.readIfAny(spark).get.count() == 3)
    assert(MockPg.rowCount("kv") == 3)
  }

  test("append + count run through Spark's parallel JDBC writer and the " +
      "SELECT-1 count shape against the mock engine") {
    import spark.implicits._
    MockPg.reset()
    val wh = freshWh("appended")
    wh.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("slot", "event_id"))
    val back = wh.readIfAny(spark).get
    assert(back.count() == 3) // SELECT 1 FROM … shape
    assert(back.orderBy("slot").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b", "c"))
  }
}
