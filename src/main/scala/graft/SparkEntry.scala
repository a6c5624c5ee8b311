package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by modules (one per SURVEY.md §2 area); each
  * entry pairs the Spark plan with its DuckDB oracle SQL (Registry.Q).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    analytics.EventAnalytics,
    analytics.Relational,
    analytics.SqlSurface,
    analytics.ScaleOps,
    analytics.Star,
    analytics.Audit,
    ext.TextAnalytics,
    ext.QualityFilters,
    ext.Dedup,
    ext.Similarity,
    ext.Multimodal,
    ext.CorpusPipelineModule,
    ext.TrainPrep,
    ext.Graph,
    ingest.IngestQueries,
    operators.LakeQueries,
    streaming.StreamQueries,
  )

  private lazy val all: Seq[(String, Q)] = {
    val defs = modules.flatMap(_.defs)
    // A duplicate name across modules would SILENTLY corrupt the
    // correctness gate: `queries`/`oracleSql` are maps (last
    // registration wins) while `orderedQueries` keeps both, so Verify
    // could pair one module's plan with another's oracle SQL and the
    // differential would compare the wrong two results. Refuse at
    // assembly instead.
    val dups = defs.groupBy(_._1).filter(_._2.sizeIs > 1).keys
    require(dups.isEmpty,
      s"duplicate query names across modules: ${dups.toSeq.sorted.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head._2.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.fn }.toMap

  /** `queries` in module registration order (stable round-over-round,
    * newest additions last) — what Bench iterates, so the emitted
    * per-query chunks keep a diffable order. */
  def orderedQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
    all.map { case (n, q) => n -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, Q(_, Some(sql), _)) => n -> sql }.toMap
}
