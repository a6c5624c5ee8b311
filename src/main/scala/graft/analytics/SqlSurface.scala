package graft.analytics

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL entry point (`spark.sql`) plus the subquery operator family the
  * DataFrame modules don't exercise: scalar subqueries, correlated
  * EXISTS/NOT EXISTS, IN-subqueries, CTEs. Each query here is ONE ANSI
  * SQL text executed verbatim by BOTH engines (Spark over temp views,
  * DuckDB over the same parquet) — zero-drift differential testing of the
  * SQL surface itself.
  */
object SqlSurface extends QueryModule {

  /** Register the testdata tables as temp views once per (session, dir). */
  private def views(s: SparkSession, dir: String): Unit =
    Seq("customer", "orders", "nation", "lineitem").foreach { t =>
      Tables.load(s, dir, t).createOrReplaceTempView(t)
    }

  private def sqlQ(sql: String, doc: String): Q =
    Q((s, dir) => { views(s, dir); s.sql(sql) }, Some(sql), doc)

  override val defs: Seq[(String, Q)] = Seq(

    // Scalar subquery: orders above the global mean price (exact decimal
    // sum / count keeps the threshold deterministic on both engines).
    "sql_above_avg_orders" -> sqlQ(
      """SELECT o_orderstatus, count(*) AS n_above
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      doc = "scalar subquery (SQL surface)"),

    // Correlated EXISTS: customers holding at least one big order.
    "sql_exists_big_order" -> sqlQ(
      """SELECT c.c_nationkey, count(*) AS n_custs
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin,
      doc = "correlated EXISTS subquery"),

    // NOT EXISTS: never-ordered customers per market segment.
    "sql_never_ordered" -> sqlQ(
      """SELECT c_mktsegment, count(*) AS n_inactive
        |FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      doc = "NOT EXISTS anti-semi subquery"),

    // IN-subquery + CTE: nations of the customers with the most orders.
    "sql_cte_top_order_nations" -> sqlQ(
      """WITH busy AS (
        |  SELECT o_custkey, count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey HAVING count(*) >= 15)
        |SELECT n.n_name, count(*) AS n_busy_custs
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey IN (SELECT o_custkey FROM busy)
        |GROUP BY n.n_name ORDER BY n_busy_custs DESC, n.n_name""".stripMargin,
      doc = "CTE + IN-subquery + HAVING"),

    // WITH RECURSIVE (Spark 4 surface): a recursively generated month
    // spine LEFT-joined to orders, so months with zero orders still get
    // a row — the recursion-based densify, same text on both engines.
    "sql_recursive_ladder" -> sqlQ(
      """WITH RECURSIVE months(m) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT m + 1 FROM months WHERE m < 12)
        |SELECT months.m AS month, count(o.o_orderkey) AS n_orders
        |FROM months LEFT JOIN orders o
        |  ON CAST(month(o.o_orderdate) AS INTEGER) = months.m
        |GROUP BY months.m ORDER BY months.m""".stripMargin,
      doc = "WITH RECURSIVE spine + left-join densify (SQL surface)"),

    // LATERAL correlated subquery: each nation's single highest-balance
    // customer — the per-row subquery form of top-1-per-group.
    "sql_lateral_top_customer" -> sqlQ(
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT c.c_name, c.c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 1) t
        |ORDER BY n.n_name""".stripMargin,
      doc = "LATERAL correlated subquery (top-1 per row)"),

    // Explicit GROUPING SETS with grouping_id: status totals, priority
    // totals, and the grand total in one pass.
    "sql_grouping_sets" -> sqlQ(
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping(o_orderstatus) AS g_status,
        |  grouping(o_orderpriority) AS g_prio,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin,
      doc = "explicit GROUPING SETS + grouping() markers"),

    // Bag semantics: INTERSECT ALL / EXCEPT ALL on order-status rows —
    // multiplicities matter, unlike the distinct set ops in rel_set_ops.
    "sql_set_ops_all" -> sqlQ(
      """SELECT 'intersect_all' AS op, count(*) AS n FROM (
        |  SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000
        |  INTERSECT ALL
        |  SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'except_all', count(*) FROM (
        |  SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000
        |  EXCEPT ALL
        |  SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY op""".stripMargin,
      doc = "INTERSECT ALL / EXCEPT ALL bag semantics"),
  )
}
