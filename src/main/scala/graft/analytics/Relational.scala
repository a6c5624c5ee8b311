package graft.analytics

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational breadth beyond the reference's deliberately join-free surface
  * (SURVEY.md §2.3 — joins exist only in latent forms; §2.5 — zero window
  * functions). The documented dim-join pattern (/root/reference/docs/
  * SCHEMA.md:361-371) plus the generalizations SURVEY.md §2.5/§7.2 slice 5
  * call for, exercised on the TPC-H-ish tables.
  *
  * Scale posture: every dim side of a join (region/nation/customer/
  * supplier/part at these SFs) is explicitly `broadcast()`; the one
  * genuinely large-large join (orders ⋈ lineitem) shuffles on its key and
  * is AQE-coalesced. Top-k always plans as TakeOrderedAndProject (never a
  * global sort). Money aggregates go through DecimalType so both engines
  * agree exactly, then surface as double.
  */
object Relational extends QueryModule {

  import Tables._

  /** double money column → exact decimal for order-independent sums. */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def day(c: org.apache.spark.sql.Column) = date_format(c, "yyyy-MM-dd")

  override val defs: Seq[(String, Q)] = Seq(

    // TPC-H Q1 shape: scan → filter → wide aggregate. Exact decimal sums,
    // conditional-free single pass; pushdown of the shipdate filter to
    // parquet is load-bearing at 100 TB.
    "rel_pricing_summary" -> Q(
      (s, dir) =>
        lineitem(s, dir)
          .filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '2000-01-01 00:00:00'"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
             | count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "TPC-H Q1 shape; generalizes ref A1 wide aggregation"),

    // TPC-H Q3 shape: 3-way join (broadcast the filtered customer dim into
    // the orders ⋈ lineitem shuffle join), group, top-10.
    "rel_shipping_priority" -> Q(
      (s, dir) => {
        val c = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = orders(s, dir)
          .filter(col("o_orderdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
        val l = lineitem(s, dir)
          .filter(col("l_shipdate") > expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), day(col("o_orderdate")).as("order_day"),
            col("o_orderpriority"))
          .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), col("revenue"), col("order_day"), col("o_orderpriority"))
      },
      Some("""SELECT o_orderkey,
             | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             | strftime(o_orderdate, '%Y-%m-%d') AS order_day, o_orderpriority
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
             |  AND l_orderkey = o_orderkey
             |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY o_orderkey, order_day, o_orderpriority
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      doc = "TPC-H Q3 shape; docs/SCHEMA.md:361-371 dim-join pattern"),

    // TPC-H Q5 shape: 5-way star join — all dims broadcast, single shuffle
    // join on the fact keys.
    "rel_regional_revenue" -> Q(
      (s, dir) => {
        val r = region(s, dir)
        val n = nation(s, dir)
        val c = customer(s, dir)
        val o = orders(s, dir)
          .filter(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
        val l = lineitem(s, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             | count(*) AS n_items
             |FROM region, nation, customer, orders, lineitem
             |WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
             |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
             |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "TPC-H Q5 shape; broadcast star join"),

    // Semi + anti join (J3's left_anti is the idempotent-reload primitive,
    // warehouse.rs:287-299): customers with vs without open orders.
    "rel_semi_anti_customers" -> Q(
      (s, dir) => {
        val c = customer(s, dir)
        val openOrders = orders(s, dir).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"))
        val withOpen = c.join(openOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("with_open"))
        val without = c.join(openOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("without_open"))
        withOpen.join(without, Seq("c_nationkey"), "full_outer")
          .select(col("c_nationkey"),
            coalesce(col("with_open"), lit(0L)).as("with_open"),
            coalesce(col("without_open"), lit(0L)).as("without_open"))
          .orderBy(col("c_nationkey"))
      },
      Some("""WITH oo AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
             |-- EXISTS, not IN: the anti side must stay null-safe — one NULL
             |-- o_custkey would make NOT IN return NULL for every unmatched
             |-- customer (without_open = 0 engine-wide) while the Spark
             |-- left_anti keeps counting them
             |SELECT c_nationkey,
             | count(*) FILTER (WHERE EXISTS (SELECT 1 FROM oo WHERE oo.o_custkey = c.c_custkey)) AS with_open,
             | count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM oo WHERE oo.o_custkey = c.c_custkey)) AS without_open
             |FROM customer c GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "ref warehouse.rs:287-299 (J3 anti-join) generalized"),

    // Window: rank rows within groups — top-3 orders per customer via
    // row_number with a total-order tie-break.
    "rel_top_orders_per_cust" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |   ROW_NUMBER() OVER (PARTITION BY o_custkey
             |     ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST) AS rn
             |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
      doc = "SURVEY §2.5 ranking window (top-k per group)"),

    // The same top-3-per-customer through the engine's OWN whole
    // operator (plans/TopKPerGroup.scala: custom LogicalPlan → strategy
    // → bounded-heap partial/final SparkPlan pair): no sort of the
    // input, map-side group-limit before the shuffle. Shares the
    // window-form oracle — the differential gate proves the custom
    // operator against DuckDB's ROW_NUMBER.
    "rel_topk_native" -> Q(
      (s, dir) =>
        graft.plans.TopK.perGroup(
            orders(s, dir).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
            3, Seq("o_custkey"),
            Seq(("o_totalprice", false), ("o_orderkey", true)), rankName = "rn")
          .select(col("o_custkey"), col("rn").cast("long").as("rn"),
            col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn")),
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |   ROW_NUMBER() OVER (PARTITION BY o_custkey
             |     ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST) AS rn
             |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
      doc = "top-k per group via the custom bounded-heap operator (no sort)"),

    // Window: lag/lead day-over-day delta on a monthly revenue series.
    "rel_monthly_revenue_delta" -> Q(
      (s, dir) => {
        val monthly = orders(s, dir)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(sum(dec(col("o_totalprice"))).as("rev"))
        // unpartitioned window BY DESIGN (WindowExec warns): the frame is
        // the post-aggregate monthly series — one row per distinct month,
        // bounded by the corpus' calendar span at ANY data scale, so the
        // single-partition sort is over dozens of rows, never the fact table
        val w = Window.orderBy(col("month"))
        monthly
          .withColumn("prev_rev", lag(col("rev"), 1).over(w))
          .select(col("month"), col("rev").cast("double").as("revenue"),
            (col("rev") - coalesce(col("prev_rev"), col("rev"))).cast("double").as("delta"))
          .orderBy(col("month"))
      },
      Some("""WITH m AS (
             |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
             |  FROM orders GROUP BY 1)
             |SELECT month, CAST(rev AS DOUBLE) AS revenue,
             | CAST(rev - coalesce(lag(rev) OVER (ORDER BY month), rev) AS DOUBLE) AS delta
             |FROM m ORDER BY month""".stripMargin),
      doc = "SURVEY §2.5 lag/lead frame analytics"),

    // Window: running cumulative sum (rows-unbounded-preceding frame).
    "rel_cumulative_orders" -> Q(
      (s, dir) => {
        val daily = orders(s, dir)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n"))
        // unpartitioned running frame over the same calendar-bounded
        // monthly series as above — see rel_monthly_revenue_delta
        val w = Window.orderBy(col("month"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.withColumn("cum_orders", sum(col("n")).over(w))
          .select(col("month"), col("n"), col("cum_orders"))
          .orderBy(col("month"))
      },
      Some("""WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
             |          FROM orders GROUP BY 1)
             |SELECT month, n,
             | -- month NULLS FIRST: a dateless order's NULL month must
             | -- enter the running sum where Spark's ASC window puts it
             | CAST(sum(n) OVER (ORDER BY month NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_orders
             |FROM m ORDER BY month NULLS FIRST""".stripMargin),
      doc = "SURVEY §2.5 running-total frame"),

    // Window breadth: dense_rank, ntile quartiles, percent_rank over the
    // per-nation customer balance distribution.
    "rel_balance_quartiles" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        customer(s, dir)
          .withColumn("bal_rank", dense_rank().over(w).cast("long"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .filter(col("bal_rank") <= 3)
          .select(col("c_nationkey"), col("bal_rank"), col("quartile"),
            col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_nationkey"), col("bal_rank"), col("c_custkey"))
      },
      Some("""SELECT c_nationkey, bal_rank, quartile, c_custkey, c_acctbal FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    DENSE_RANK() OVER w AS bal_rank, NTILE(4) OVER w AS quartile
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey NULLS FIRST))
             |WHERE bal_rank <= 3
             |ORDER BY c_nationkey, bal_rank, c_custkey""".stripMargin),
      doc = "dense_rank + ntile window breadth"),

    // Window: percent_rank + cume_dist — the percentile-rank feature
    // normalization a training pipeline applies to heavy-tailed
    // columns. (rank−1)/(n−1) and rank/n are evaluated by the identical
    // formula in both engines on the same total order, so the doubles
    // match bit-for-bit; top-5 per nation keeps the oracle small.
    "rel_percentile_ranks" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        customer(s, dir)
          .withColumn("pr", round(percent_rank().over(w), 6))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .select(col("c_nationkey"), col("rn"), col("c_custkey"),
            col("c_acctbal"), col("pr"), col("cd"))
          .orderBy(col("c_nationkey"), col("rn"))
      },
      Some("""SELECT c_nationkey, rn, c_custkey, c_acctbal, pr, cd FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    round(PERCENT_RANK() OVER w, 6) AS pr,
             |    round(CUME_DIST() OVER w, 6) AS cd,
             |    ROW_NUMBER() OVER w AS rn
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_nationkey
             |               ORDER BY c_acctbal NULLS FIRST, c_custkey NULLS FIRST))
             |WHERE rn <= 5 ORDER BY c_nationkey, rn""".stripMargin),
      doc = "percent_rank + cume_dist window breadth (percentile-rank normalization)"),

    // Pivot: order counts spread across status columns per priority —
    // Spark's groupBy().pivot() with EXPLICIT values (dynamic value
    // discovery would need an extra pass and nondeterministic column
    // order); the oracle is the portable conditional-aggregation form.
    "rel_pivot_status" -> Q(
      (s, dir) =>
        orders(s, dir)
          .groupBy(col("o_orderpriority").as("priority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("F", "O", "P"))
          .orderBy(col("priority")),
      Some("""SELECT o_orderpriority AS priority,
             | count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
             | count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
             | count(*) FILTER (WHERE o_orderstatus = 'P') AS P
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "pivot with explicit values (conditional-aggregation oracle)"),

    // Window: first/last value over an explicit full-partition frame
    // (the SURVEY §2.5 first_seen/last_seen-with-row-context case).
    "rel_first_last_order" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        orders(s, dir)
          .withColumn("first_order", first(col("o_orderkey")).over(w))
          .withColumn("last_order", last(col("o_orderkey")).over(w))
          .select(col("o_custkey"), col("first_order"), col("last_order"))
          .distinct()
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT DISTINCT o_custkey,
             | first_value(o_orderkey) OVER w AS first_order,
             | last_value(o_orderkey) OVER w AS last_order
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey NULLS FIRST""".stripMargin),
      doc = "first/last value with full-partition frame (SURVEY §2.5)"),

    // Array aggregation: per-nation sorted key list via collect_list +
    // array_sort (deterministic), plus element access and size.
    "rel_nation_supplier_arrays" -> Q(
      (s, dir) =>
        supplier(s, dir)
          .groupBy(col("s_nationkey"))
          .agg(array_sort(collect_list(col("s_suppkey"))).as("suppliers"))
          .select(col("s_nationkey"),
            size(col("suppliers")).cast("long").as("n_suppliers"),
            element_at(col("suppliers"), 1).as("first_supplier"),
            element_at(col("suppliers"), -1).as("last_supplier"))
          .orderBy(col("s_nationkey")),
      Some("""SELECT s_nationkey, len(ks) AS n_suppliers,
             | ks[1] AS first_supplier, ks[-1] AS last_supplier
             |FROM (SELECT s_nationkey, list_sort(list(s_suppkey)) AS ks
             |      FROM supplier GROUP BY 1)
             |ORDER BY s_nationkey""".stripMargin),
      doc = "array agg (collect_list/array_sort/element_at) coverage"),

    // Map functions: status→count map per priority via
    // map_from_entries, then typed key lookup.
    "rel_status_map" -> Q(
      (s, dir) =>
        orders(s, dir)
          // NULL can't be a map key (map_from_entries throws
          // NULL_MAP_KEY and a single dirty row would kill the job):
          // fold it to a sentinel status so the group stays counted
          .groupBy(col("o_orderpriority"),
            coalesce(col("o_orderstatus"), lit("<null>")).as("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("o_orderpriority"))
          .agg(map_from_entries(array_sort(
            collect_list(struct(col("o_orderstatus"), col("n"))))).as("m"))
          .select(col("o_orderpriority"),
            coalesce(element_at(col("m"), "O"), lit(0L)).as("open_orders"),
            coalesce(element_at(col("m"), "F"), lit(0L)).as("finished_orders"),
            size(col("m")).cast("long").as("n_statuses"))
          .orderBy(col("o_orderpriority").asc_nulls_first),
      Some("""WITH c AS (SELECT o_orderpriority,
             |            coalesce(o_orderstatus, '<null>') AS o_orderstatus,
             |            count(*) AS n
             |          FROM orders GROUP BY 1, 2)
             |SELECT o_orderpriority,
             | coalesce(max(CASE WHEN o_orderstatus = 'O' THEN n END), 0) AS open_orders,
             | coalesce(max(CASE WHEN o_orderstatus = 'F' THEN n END), 0) AS finished_orders,
             | count(*) AS n_statuses
             |FROM c GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin),
      doc = "map functions (map_from_entries/element_at) coverage"),

    // ROLLUP hierarchy totals (grouping-set coverage beyond the ref).
    "rel_rollup_returns" -> Q(
      (s, dir) =>
        lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      doc = "grouping sets / rollup coverage"),

    // CUBE: all grouping-set combinations over two dims (completes the
    // rollup/cube/grouping-sets family).
    "rel_cube_status_prio" -> Q(
      (s, dir) =>
        orders(s, dir)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"),
            sum(dec(col("o_totalprice"))).cast("double").as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),
      doc = "grouping-sets CUBE coverage"),

    // Set ops: customers active in 1996 ∩ 1997, ∖, counts (SURVEY §2.7).
    "rel_set_ops" -> Q(
      (s, dir) => {
        val o = orders(s, dir)
        def yr(y: String) = o
          .filter(date_format(col("o_orderdate"), "yyyy") === y)
          .select(col("o_custkey")).distinct()
        val both = yr("1996").intersect(yr("1997"))
        val only96 = yr("1996").except(yr("1997"))
        val either = yr("1996").union(yr("1997")).distinct()
        both.agg(count(lit(1)).as("in_both"))
          .crossJoin(only96.agg(count(lit(1)).as("only_1996")))
          .crossJoin(either.agg(count(lit(1)).as("in_either")))
      },
      Some("""WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE strftime(o_orderdate,'%Y')='1996'),
             |     y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE strftime(o_orderdate,'%Y')='1997')
             |SELECT
             | (SELECT count(*) FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)) AS in_both,
             | (SELECT count(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)) AS only_1996,
             | (SELECT count(*) FROM (SELECT * FROM y96 UNION SELECT * FROM y97)) AS in_either""".stripMargin),
      doc = "SURVEY §2.7 set operations"),

    // Exact multi-distinct on the orders fact (A4 generalized).
    "rel_order_distincts" -> Q(
      (s, dir) =>
        orders(s, dir).agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("uniq_custs"),
          countDistinct(col("o_orderstatus")).as("uniq_status"),
          countDistinct(col("o_orderpriority")).as("uniq_prio")),
      Some("""SELECT count(*) AS n_orders, count(DISTINCT o_custkey) AS uniq_custs,
             | count(DISTINCT o_orderstatus) AS uniq_status,
             | count(DISTINCT o_orderpriority) AS uniq_prio
             |FROM orders""".stripMargin),
      doc = "ref analytics.rs:413-438 (multi-distinct) on orders"),

    // Global top-k — plans as TakeOrderedAndProject, not a full sort.
    "rel_top_orders" -> Q(
      (s, dir) =>
        orders(s, dir)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            day(col("o_orderdate")).as("order_day")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
             | strftime(o_orderdate, '%Y-%m-%d') AS order_day
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),
      doc = "SURVEY §2.6 top-k (TakeOrderedAndProject)"),

    // Theta/range join: orders banded into price intervals via an
    // inequality join against a tiny broadcast dimension (the
    // broadcast-nested-loop form every banding/range join takes when one
    // side is small).
    "rel_price_band_join" -> Q(
      (s, dir) => {
        val bands = s.createDataFrame(Seq(
          ("B1_under_100k", 0.0, 100000.0),
          ("B2_100k_200k", 100000.0, 200000.0),
          ("B3_200k_300k", 200000.0, 300000.0),
          ("B4_300k_400k", 300000.0, 400000.0),
          ("B5_400k_plus", 400000.0, 1e18))).toDF("band", "lo", "hi")
        orders(s, dir)
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("double").as("band_total"))
          .orderBy(col("band"))
      },
      Some("""WITH bands(band, lo, hi) AS (VALUES
             |  ('B1_under_100k', 0.0, 100000.0),
             |  ('B2_100k_200k', 100000.0, 200000.0),
             |  ('B3_200k_300k', 200000.0, 300000.0),
             |  ('B4_300k_400k', 300000.0, 400000.0),
             |  ('B5_400k_plus', 400000.0, 1e18))
             |SELECT band, count(*) AS n_orders,
             | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_total
             |FROM orders JOIN bands
             |  ON o_totalprice >= lo AND o_totalprice < hi
             |GROUP BY band ORDER BY band""".stripMargin),
      doc = "theta/range band join (broadcast nested loop)"),

    // TPC-H Q17 shape: correlated aggregate subquery, de-correlated into
    // a per-group aggregate + join (the plan Catalyst produces for the
    // subquery form; written explicitly so the threshold is decimal-exact
    // on both engines).
    "rel_small_quantity_revenue" -> Q(
      (s, dir) => {
        val l = lineitem(s, dir)
        val perPart = l.groupBy(col("l_partkey").as("pk"))
          .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)).cast("double"))
            .as("avg_qty"))
        l.join(perPart, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < col("avg_qty") * 0.5)
          .agg(count(lit(1)).as("n_small"),
            sum(dec(col("l_extendedprice"))).cast("double").as("small_revenue"))
      },
      Some("""WITH pa AS (
             |  SELECT l_partkey AS pk,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
             |  FROM lineitem GROUP BY 1)
             |SELECT count(*) AS n_small,
             | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
             |FROM lineitem JOIN pa ON l_partkey = pk
             |WHERE l_quantity < avg_qty * 0.5""".stripMargin),
      doc = "TPC-H Q17 shape (correlated aggregate subquery, de-correlated)"),

    // Part/supplier join with LIKE + IN predicates (P-family breadth).
    "rel_brand_volume" -> Q(
      (s, dir) => {
        val p = part(s, dir)
          .filter(col("p_type").like("%M%") &&
            col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#10", "Brand#12"))
        lineitem(s, dir)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"),
            sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, count(*) AS n_items,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_type LIKE '%M%'
             |  AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#10','Brand#12')
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "LIKE/IN predicate + broadcast dim join"),

    // The explicit skew-salting path exercised end-to-end: the fact side
    // scatters each hot partkey across 8 salt sub-keys, the dim side
    // replicates ×8, and the join result must be the EXACT multiset of
    // the plain join — which is what the oracle states (plain SQL join),
    // making the differential gate a correctness proof of the salting
    // rewrite itself. AQE skew splitting is the first line of defense;
    // this is the fallback shape for the hot key one partition can't
    // hold (operators/SkewJoin.scala).
    "rel_skew_salted_volume" -> Q(
      (s, dir) => {
        val fact = lineitem(s, dir)
          .select(col("l_partkey").as("partkey"), dec(col("l_quantity")).as("qty"))
        val dim = part(s, dir)
          .select(col("p_partkey").as("partkey"), col("p_brand"))
        graft.operators.SkewJoin.saltedJoin(fact, dim, "partkey", salts = 8)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("qty")).cast("double").as("total_qty"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, count(*) AS n_items,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "salted skew join ≡ plain join (differential proof of the rewrite)"),

    // TPC-H Q21 shape — the hardest classic semi/anti composition: for
    // each supplier, count finished orders where THEIR line shipped late
    // (> 90 days after the order date; this schema has no commit/receipt
    // dates, so order-date lag is the lateness signal) AND the order had
    // at least one other supplier (EXISTS) AND no OTHER supplier was
    // also late (NOT EXISTS) — i.e. the supplier who single-handedly
    // kept a multi-supplier order waiting. Both correlated subqueries
    // become one pass each over a distinct (orderkey, suppkey) frame:
    // the EXISTS a left_semi, the NOT EXISTS a left_anti, each an
    // equi-join on the order key with the supplier inequality riding as
    // the join condition — no cartesian, and at 100 TB both sides
    // shuffle-partition on l_orderkey (the same key back to back, so
    // the exchange is reused across the semi and anti stages). The
    // supplier dim is broadcast; top-20 is TakeOrderedAndProject.
    "rel_waiting_suppliers" -> Q(
      (s, dir) => {
        val pairs = lineitem(s, dir)
          .join(orders(s, dir).filter(col("o_orderstatus") === "F")
              .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
            (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
              .as("late"))
          .groupBy(col("ok"), col("sk"))
          // a supplier is late on the order if ANY of their lines is
          .agg(max(col("late")).as("late"))
        val lateOnly = pairs.filter(col("late"))
        val others = pairs.select(col("ok").as("o_ok"), col("sk").as("o_sk"),
          col("late").as("o_late"))
        val waiting = lateOnly
          .join(others,
            col("ok") === col("o_ok") && col("sk") =!= col("o_sk"), "left_semi")
          .join(others.filter(col("o_late")),
            col("ok") === col("o_ok") && col("sk") =!= col("o_sk"), "left_anti")
        waiting
          .join(broadcast(supplier(s, dir)), col("sk") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""WITH pairs AS (
             |  SELECT l_orderkey AS ok, l_suppkey AS sk,
             |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
             |      THEN 1 ELSE 0 END) = 1 AS late
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F'
             |  GROUP BY 1, 2)
             |SELECT s_name, count(*) AS numwait
             |FROM pairs p JOIN supplier ON p.sk = s_suppkey
             |WHERE p.late
             |  AND EXISTS (SELECT 1 FROM pairs q
             |              WHERE q.ok = p.ok AND q.sk <> p.sk)
             |  AND NOT EXISTS (SELECT 1 FROM pairs q
             |                  WHERE q.ok = p.ok AND q.sk <> p.sk AND q.late)
             |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin),
      doc = "TPC-H Q21 shape: sole-late-supplier semi + anti composition over one distinct (order, supplier) frame"),

    // TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    // join with a predicate in the JOIN CONDITION (urgent orders don't
    // count, but zero-order customers must SURVIVE — the same filter in
    // a WHERE would silently turn the outer join inner and drop them),
    // then a double aggregation: per-customer order counts, then the
    // histogram of those counts. The first aggregation shuffles on
    // c_custkey (the outer join's own key, so the exchange is shared);
    // the second is histogram-sized. count(o_orderkey) — not count(*) —
    // is what makes the null-extended rows count 0.
    "rel_cust_order_dist" -> Q(
      (s, dir) => {
        val nonUrgent = orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey"))
        customer(s, dir)
          .join(nonUrgent, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY 1)
             |GROUP BY 1 ORDER BY 2 DESC, 1 DESC""".stripMargin),
      doc = "TPC-H Q13 shape: outer join with ON-clause filter (zero-order customers survive) + double aggregation"),

    // TPC-H Q15 shape — argmax BY AGGREGATE: quarterly revenue per
    // supplier, then the supplier(s) whose revenue EQUALS the maximum
    // (ties all surface — the view-equality semantics Q15 specifies,
    // not a LIMIT 1 that would drop co-winners). The revenue aggregate
    // is decimal-exact so the equality join cannot shear on float
    // representation; the 1-row max rides in as a broadcast scalar.
    "rel_top_revenue_supplier" -> Q(
      (s, dir) => {
        val rev = lineitem(s, dir)
          .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'")
            && col("l_shipdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
          .groupBy(col("l_suppkey"))
          .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
            .as("rev"))
        val mx = rev.agg(max(col("rev")).as("mx"))
        rev.crossJoin(broadcast(mx))
          .filter(col("rev") === col("mx"))
          .join(broadcast(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("rev").cast("double").as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |        * CAST(1 - l_discount AS DECIMAL(18,2))) AS rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE rev = (SELECT max(rev) FROM rev)
             |ORDER BY s_suppkey""".stripMargin),
      doc = "TPC-H Q15 shape: decimal-exact argmax-by-aggregate (ties surface, broadcast scalar max)"),
  )
}
