package graft.ext

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the affinity graph implied by the event stream:
  * users are nodes, and two users are adjacent when they share a
  * DOMINANT token — each user contributes their top-2 tokens (`props.k`
  * by event count, count-desc/key-asc tie-break), and users co-member
  * in a token group are connected. The dominant-feature co-membership
  * graph is the community structure behind account-cluster mining on
  * chain data; raw co-interaction would be degenerate here (every token
  * touches ~half the users, so the projection is a near-clique at any
  * scale).
  *
  * Scale shape: the projection is the dangerous step — a token group of
  * g members yields g² pairs — so each token keeps at most
  * [[DefaultMaxTokenMembers]] members, chosen DETERMINISTICALLY by
  * md5(user) order (the hash-ordered capping idiom of
  * `prep_cap_per_source`): per-token pair fan-out is bounded at C(40,2)
  * at ANY corpus size, and unlike drop-the-token capping the group
  * keeps a stable representative subgraph as df grows. Everything
  * downstream is equi-joins on edge endpoints: no all-pairs, no
  * driver-side state beyond 1-row aggregates. Triangle counting keys
  * every join on an endpoint; the `u < v < w` canonical ordering counts
  * each triangle exactly once.
  */
object Graph extends QueryModule {

  /** Deterministic per-token member cap (md5-ordered) — bounds the
    * projection's per-token fan-out at C(cap, 2) forever. */
  val DefaultMaxTokenMembers = 40

  /** Each user's `topK` dominant tokens by event count (ties → smaller
    * k), from mint-bearing events. */
  private[ext] def topTokens(events: DataFrame, topK: Int): DataFrame = {
    val cnts = events.filter(Tables.propK().isNotNull)
      .groupBy(col("user_id"), Tables.propK().as("k"))
      .agg(count(lit(1)).as("cnt"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("cnt").desc, col("k").asc)
    cnts.withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= topK)
      .select(col("user_id"), col("k"))
  }

  /** Canonical (u < v) co-membership edges over md5-capped token
    * groups. The cap is TWO-STAGE (the `Similarity.cappedClusterMembers`
    * idiom): a map-side md5-threshold thinning against broadcast
    * per-token sizes cuts a hot token's membership to ~2·cap rows with
    * no shuffle — a plain per-token `row_number` would sort the whole
    * hot membership on one task, the exact skew the cap defends
    * against — then the exact md5-ordered rank restores the strict
    * ≤ cap bound on the trivially small survivor set. Inert for
    * memberships ≤ 2·cap; both stages replay in the oracle. (The sizes
    * broadcast is token-domain-sized — mint addresses, not open text
    * vocabulary — small by construction.) */
  def edges(events: DataFrame, topK: Int = 2,
      maxMembers: Int = DefaultMaxTokenMembers): DataFrame =
    edgePlan(events, topK, maxMembers)._3

  /** The edge construction, with its two REUSED intermediates exposed:
    * `inc` feeds both cap stages (the broadcast `sizes` build and the
    * thinning probe) and `capped` feeds both sides of the projection
    * self-join — left uncached, each executes once per consumer side
    * (for `inc` that is the full events scan + shuffle agg + per-user
    * window, twice: the round-6 graph-family regression). Both are
    * bounded — `inc` at topK rows per user, `capped` at maxMembers rows
    * per token — so [[withEdges]] below loan-caches exactly these two. */
  private def edgePlan(events: DataFrame, topK: Int, maxMembers: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val inc = topTokens(events, topK)
    val sizes = inc.groupBy(col("k")).agg(count(lit(1)).as("_ksz"))
    val ukey = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val thinned = inc.join(broadcast(sizes), Seq("k"))
      .filter(ukey.cast("double") * col("_ksz").cast("double") <
        lit(Similarity.thinningBound(maxMembers)))
      .select(col("user_id"), col("k"))
    val byTok = Window.partitionBy(col("k"))
      .orderBy(md5(col("user_id").cast("string")), col("user_id"))
    val capped = thinned.withColumn("mrn", row_number().over(byTok))
      .filter(col("mrn") <= maxMembers)
      .select(col("user_id"), col("k"))
    val e = capped.as("a").join(capped.as("b"), Seq("k"))
      .filter(col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .distinct()
    (inc, capped, e)
  }

  /** Loan-scoped edge builder: caches the two bounded intermediates of
    * [[edgePlan]], runs `f`, and unpersists them before returning —
    * the module's queries keep the census/histogram loan discipline
    * (no cached RDDs outlive the query). `f` must FULLY materialize
    * whatever it returns (both query defs below return bounded local
    * results); a lazily-returned frame would re-execute the then-
    * uncached plan. */
  private[ext] def withEdges[T](events: DataFrame, topK: Int = 2,
      maxMembers: Int = DefaultMaxTokenMembers)(f: DataFrame => T): T = {
    val (inc, capped, e) = edgePlan(events, topK, maxMembers)
    inc.cache(); capped.cache()
    try f(e) finally { capped.unpersist(); inc.unpersist() }
  }

  /** Degree histogram: how many nodes have each degree. One pass over
    * the edge list — each edge contributes both endpoints via
    * `explode(array(u, v))` — so the (possibly uncached) edge plan
    * evaluates once, not once per endpoint column. */
  def degreeHistogram(edgeDf: DataFrame): DataFrame =
    edgeDf.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))

  /** The (u, v, w) triangle rows, u<v<w canonical: for each wedge with
    * edges (u,v),(v,w), probe (u,w). Both joins are endpoint equi-joins
    * — exposed separately so the plan can be GATED (the eager census
    * below returns a LocalRelation, which hides these joins from any
    * plan assertion on the final frame). */
  private[ext] def triangleRows(e: DataFrame): DataFrame =
    e.as("ab").join(e.as("bc"), col("ab.v") === col("bc.u"))
      .select(col("ab.u").as("u"), col("ab.v").as("v"), col("bc.v").as("w"))
      .as("abw")
      .join(e.as("ac"),
        col("abw.u") === col("ac.u") && col("abw.w") === col("ac.v"),
        "left_semi")

  /** Global triangle census: nodes, edges, wedges, triangles, and the
    * global clustering coefficient 3·triangles / wedges. The edge set
    * is cached for the four aggregates and unpersisted before return
    * (loan scope); each aggregate is a 1-row driver value. */
  def triangleCensus(edgeDf: DataFrame): DataFrame = {
    val e = edgeDf.cache()
    try {
      val nNodes = e.select(explode(array(col("u"), col("v"))).as("n"))
        .distinct().count()
      val nEdges = e.count()
      // wedges: Σ deg·(deg−1)/2 over nodes (integer-exact); one cache
      // scan via explode rather than a two-scan union
      val wedges = e.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .agg(coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)).as("w"))
        .head().getLong(0)
      val tri = triangleRows(e).count()
      val spark = edgeDf.sparkSession
      import spark.implicits._
      Seq((nNodes, nEdges, wedges, tri,
          if (wedges == 0) 0.0 else 3.0 * tri / wedges))
        .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles", "clustering")
        .withColumn("clustering", round(col("clustering"), 4))
    } finally { e.unpersist() }
  }

  private def dEdges(topK: Int, maxMembers: Int) =
    s"""cnts AS (
       |  SELECT user_id, CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
       |         count(*) AS cnt
       |  FROM events WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2),
       |inc AS (
       |  SELECT user_id, k FROM (
       |    SELECT user_id, k, row_number() OVER (
       |      PARTITION BY user_id ORDER BY cnt DESC, k ASC) AS rn
       |    FROM cnts) WHERE rn <= $topK),
       |ksz AS (SELECT k, count(*) AS n FROM inc GROUP BY 1),
       |thin AS (
       |  SELECT i.user_id, i.k FROM inc i JOIN ksz USING (k)
       |  WHERE CAST(('0x' || substr(md5(CAST(i.user_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
       |        * CAST(ksz.n AS DOUBLE) < ${Similarity.thinningBound(maxMembers)}),
       |capped AS (
       |  SELECT user_id, k FROM (
       |    SELECT user_id, k, row_number() OVER (
       |      PARTITION BY k ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS mrn
       |    FROM thin) WHERE mrn <= $maxMembers),
       |edges AS (
       |  SELECT DISTINCT a.user_id AS u, b.user_id AS v
       |  FROM capped a JOIN capped b ON a.k = b.k AND a.user_id < b.user_id)""".stripMargin

  override val defs: Seq[(String, Q)] = Seq(

    // Degree distribution of the capped dominant-token graph. Eager
    // within the loan: a node's degree is ≤ topK·(maxMembers−1) (its
    // ≤ topK groups × (cap−1) co-members each), so the histogram has
    // that many rows at most — a bounded driver-side result, same
    // class as the 1-row census.
    "graph_degree_hist" -> Q(
      (s, dir) => withEdges(Tables.events(s, dir)) { e =>
        val h = degreeHistogram(e)
        s.createDataFrame(java.util.Arrays.asList(h.collect(): _*), h.schema)
      },
      Some(s"""WITH ${dEdges(2, DefaultMaxTokenMembers)},
              |nodes AS (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges),
              |deg AS (SELECT node, count(*) AS degree FROM nodes GROUP BY 1)
              |SELECT degree, count(*) AS n_nodes FROM deg
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "degree histogram of the dominant-token co-membership graph"),

    // Triangle census + global clustering coefficient.
    "graph_triangles" -> Q(
      (s, dir) => withEdges(Tables.events(s, dir))(triangleCensus),
      Some(s"""WITH ${dEdges(2, DefaultMaxTokenMembers)},
              |nodes AS (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges),
              |deg AS (SELECT node, count(*) AS deg FROM nodes GROUP BY 1),
              |tri AS (
              |  SELECT count(*) AS t FROM edges ab
              |  JOIN edges bc ON ab.v = bc.u
              |  WHERE EXISTS (SELECT 1 FROM edges ac
              |                WHERE ac.u = ab.u AND ac.v = bc.v)),
              |wed AS (SELECT CAST(coalesce(sum(deg * (deg - 1) // 2), 0) AS BIGINT) AS w
              |        FROM deg)
              |SELECT
              |  (SELECT count(DISTINCT node) FROM nodes) AS n_nodes,
              |  (SELECT count(*) FROM edges) AS n_edges,
              |  wed.w AS n_wedges,
              |  tri.t AS n_triangles,
              |  round(CASE WHEN wed.w = 0 THEN 0.0e0
              |        ELSE 3.0e0 * tri.t / wed.w END, 4) AS clustering
              |FROM tri, wed""".stripMargin),
      doc = "triangle census of the co-membership graph (endpoint equi-joins only)"),
  )
}
