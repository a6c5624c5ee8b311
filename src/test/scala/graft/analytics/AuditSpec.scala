package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The oracle rows for the audits are all-zero orphans on the consistent
  * synthetic star — these specs plant actual violations so the checks are
  * proven to fire, and prove the duplicate-parent-key guard. */
class AuditSpec extends SparkSpec {

  import spark.implicits._

  private def li(rows: (Long, Long, Long)*) =
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey")
  private def ord(rows: (Long, Long)*) = rows.toDF("o_orderkey", "o_custkey")
  private def pk(rows: Long*) = rows.toDF("p_partkey")
  private def sk(rows: Long*) = rows.toDF("s_suppkey")
  private def ck(rows: Long*) = rows.toDF("c_custkey")

  test("planted orphans are counted per FK edge") {
    // lineitem rows: (order, part, supp); order 99 and part 7 are orphans
    val out = Audit.referentialOn(
      li((1L, 10L, 100L), (99L, 10L, 100L), (1L, 7L, 100L)),
      ord((1L, 5L), (2L, 6L)),
      pk(10L), sk(100L), ck(5L, 6L))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("lineitem->orders") == ((3L, 1L)))
    assert(out("lineitem->part") == ((3L, 1L)))
    assert(out("lineitem->supplier") == ((3L, 0L)))
    assert(out("orders->customer") == ((2L, 0L)))
  }

  test("orphaned orders->customer fires; scanned counts are per fact table") {
    val out = Audit.referentialOn(
      li((1L, 10L, 100L)),
      ord((1L, 5L), (2L, 42L)), // custkey 42 has no customer row
      pk(10L), sk(100L), ck(5L))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("orders->customer") == ((2L, 1L)))
    assert(out("lineitem->orders") == ((1L, 0L)))
  }

  test("duplicated parent keys never inflate scanned-row accounting") {
    // order key 1 appears twice on the parent side — a naive left join
    // would double the matching lineitem row and report scanned=3
    val out = Audit.referentialOn(
      li((1L, 10L, 100L), (2L, 10L, 100L)),
      ord((1L, 5L), (1L, 5L), (2L, 5L)),
      pk(10L), sk(100L), ck(5L))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("lineitem->orders") == ((2L, 0L)))
    // scanned for the orders fact counts its real rows (3, dup included)
    assert(out("orders->customer") == ((3L, 0L)))
  }

  test("events profile: one row per column, nulls and distincts exact") {
    val ev = Seq(
      (1L, 10L, Option(100L), Option("a"), Option(1.5), Option("{}")),
      (2L, 20L, Option(100L), Option("a"), None, None),
      (3L, 30L, None, Option("b"), Option(2.5), Option("{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Audit.eventsProfile(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(out("event_id") == ((3L, 0L, 3L)))
    assert(out("user_id") == ((3L, 1L, 1L)))
    assert(out("event_type") == ((3L, 0L, 2L)))
    assert(out("value") == ((3L, 1L, 2L)))
    assert(out("props") == ((3L, 1L, 1L)))
  }

  test("profile plans one scan: a single aggregate over one Expand, no join") {
    val plan = Audit.eventsProfile(graft.Tables.events(spark, Sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // exactly one file scan of the events table
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
  }
}
