package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for [[GramAggregate]]: exact agreement with the explode
  * formulation it replaced (same rounding, same int64 sums), the
  * negative-half rounding edge that separates HALF_UP from Math.round,
  * and cross-partition merge correctness. */
class GramAggregateSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val Fp = 1L << 24

  /** The first-cut explode+hash-agg formulation, kept here as the
    * differential reference for the native buffer aggregate. */
  private def gramByExplode(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
    df.select(explode(expr(
        s"""flatten(transform(sequence(0, ${D - 1}), i ->
           |  transform(sequence(i, ${D - 1}), j ->
           |    named_struct('i', i, 'j', j,
           |      'q', CAST(round(v[i] * v[j] * ${Fp}D) AS BIGINT)))))"""
          .stripMargin)).as("c"))
      .select(col("c.i"), col("c.j"), col("c.q"))
      .groupBy(col("i"), col("j")).agg(sum(col("q")).as("qs"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  private def gramNative(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] = {
    val arr = df.agg(GramAggregate.gram_acc(col("v"), D, Fp).as("g"))
      .head().getSeq[Long](0)
    (for { i <- 0 until D; j <- i until D } yield
      (i, j) -> arr(GramAggregate.cellIndex(i, j, D))).toMap
  }

  test("matches the explode formulation exactly, incl. negative values") {
    // values engineered so some products land exactly on .5 Q24 grid
    // points with both signs: 0.5·(-1.5)·2^24 = -12582912.0 is grid-
    // exact; 1/3-ish values exercise non-exact rounding both ways
    val rows = Seq(
      Seq(0.5, -1.5, 2.0, 0.0),
      Seq(-0.25, 0.75, -1.0, 3.0),
      Seq(1.0 / 3.0, -2.0 / 3.0, 0.1, -0.7),
      Seq(0.0, 0.0, 0.0, 0.0))
    val df = rows.toDF("v").select(expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
    assert(gramNative(df) == gramByExplode(df))
  }

  test("negative-half rounding is away from zero (Spark/DuckDB round semantics)") {
    // v = [a, b] with a·b·2^24 = -2.5 → must round to -3, not Math.round's -2
    val a = 1.0
    val b = -2.5 / (1L << 24).toDouble
    val df = Seq(Seq(a, b)).toDF("v")
      .select(expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
    val arr = df.agg(GramAggregate.gram_acc(col("v"), 2, Fp).as("g"))
      .head().getSeq[Long](0)
    assert(arr(GramAggregate.cellIndex(0, 1, 2)) == -3L)
  }

  test("cross-partition merge: many partitions ≡ one partition") {
    val rows = (1 to 200).map(n =>
      Seq(n * 0.01, -n * 0.007, (n % 7) * 0.3, 1.0 / n))
    val one = gramNative(rows.toDF("v").coalesce(1)
      .select(expr("transform(v, x -> CAST(x AS DOUBLE))").as("v")))
    val many = gramNative(rows.toDF("v").repartition(13)
      .select(expr("transform(v, x -> CAST(x AS DOUBLE))").as("v")))
    assert(one == many)
  }

  test("real embeddings: native ≡ explode at full dims") {
    val e = graft.Tables.embeddings(spark, Sf)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val d = 64
    val native = e.agg(GramAggregate.gram_acc(col("v"), d, Fp).as("g"))
      .head().getSeq[Long](0)
    val explodeRef = e.select(explode(expr(
        s"""flatten(transform(sequence(0, ${d - 1}), i ->
           |  transform(sequence(i, ${d - 1}), j ->
           |    named_struct('i', i, 'j', j,
           |      'q', CAST(round(v[i] * v[j] * ${Fp}D) AS BIGINT)))))"""
          .stripMargin)).as("c"))
      .select(col("c.i"), col("c.j"), col("c.q"))
      .groupBy(col("i"), col("j")).agg(sum(col("q")).as("qs"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for { i <- 0 until d; j <- i until d }
      assert(native(GramAggregate.cellIndex(i, j, d)) == explodeRef((i, j)),
        s"cell ($i,$j)")
  }

  test("ragged vectors follow the explode semantics: in-range cells still contribute") {
    // a 1-element row at dims=2 contributes cell (0,0) only — what the
    // DuckDB oracle computes (OOB list index → NULL → cell skipped).
    // The reference formulation uses `get()` because ANSI `v[i]` THROWS
    // on an out-of-range index (the old explode-based query would have
    // crashed outright on ragged data — the native aggregate follows
    // the oracle's null-tolerant semantics instead)
    val df = Seq(Some(Seq(1.0, 2.0)), None, Some(Seq(3.0)), Some(Seq(0.5, -0.5)))
      .toDF("v")
    val native = df.agg(GramAggregate.gram_acc(col("v"), 2, Fp).as("g"))
      .head().getSeq[Long](0)
    val explodeRef = df
      .select(expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, 1), i ->
           |  transform(sequence(i, 1), j ->
           |    named_struct('i', i, 'j', j,
           |      'q', CAST(round(get(v, i) * get(v, j) * ${Fp}D) AS BIGINT)))))"""
          .stripMargin)).as("c"))
      .groupBy(col("c.i"), col("c.j")).agg(sum(col("c.q")).as("qs"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for { i <- 0 until 2; j <- i until 2 }
      assert(native(GramAggregate.cellIndex(i, j, 2)) == explodeRef((i, j)),
        s"cell ($i,$j)")
    // and the 1-element row really did contribute: (0,0) includes 3·3
    assert(native(GramAggregate.cellIndex(0, 0, 2)) ==
      math.round(1.0 * Fp) + math.round(9.0 * Fp) + math.round(0.25 * Fp))
  }

  test("representability-tie rounding matches SQL round(): 0.5 - 2^-54 rounds DOWN") {
    // x + 0.5 == 1.0 in IEEE arithmetic for x = 0.5 - 2^-54, so a
    // floor(x + 0.5) implementation would answer 1; SQL round() (exact
    // decimal HALF_UP) and DuckDB answer 0
    val x = 0.5 - math.pow(2, -54)
    val b = x / Fp.toDouble // v[0]·v[1]·Fp recovers ~x
    val df = Seq(Seq(1.0, b)).toDF("v")
      .select(expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
    val native = df.agg(GramAggregate.gram_acc(col("v"), 2, Fp).as("g"))
      .head().getSeq[Long](0)(GramAggregate.cellIndex(0, 1, 2))
    val sqlRound = df.select(
      expr(s"CAST(round(v[0] * v[1] * ${Fp}D) AS BIGINT)")).head().getLong(0)
    assert(native == sqlRound, s"native $native vs sql $sqlRound")
    assert(native == 0L)
  }

  test("random vectors: every cell matches SQL round() applied term-by-term") {
    // seeded-random magnitudes across the engine's whole domain
    // (|v| ≤ 8) — a broad differential of the roundAway implementation
    // against Spark's own round(), term-wise via a driver re-derivation
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 50).map(_ => Seq.fill(6)(rnd.nextDouble() * 16 - 8))
    val df = rows.toDF("v")
      .select(expr("transform(v, x -> CAST(x AS DOUBLE))").as("v")).cache()
    try {
      val native = df.agg(GramAggregate.gram_acc(col("v"), 6, Fp).as("g"))
        .head().getSeq[Long](0)
      // reference: per-row per-cell SQL round, summed on the driver
      val ref = new Array[Long](6 * 7 / 2)
      val perRow = df.select(explode(expr(
          s"""flatten(transform(sequence(0, 5), i ->
             |  transform(sequence(i, 5), j ->
             |    named_struct('i', i, 'j', j,
             |      'q', CAST(round(v[i] * v[j] * ${Fp}D) AS BIGINT)))))"""
            .stripMargin)).as("c"))
        .select(col("c.i"), col("c.j"), col("c.q")).collect()
      perRow.foreach { r =>
        ref(GramAggregate.cellIndex(r.getInt(0), r.getInt(1), 6)) += r.getLong(2)
      }
      assert(native == ref.toSeq)
    } finally df.unpersist()
  }

  test("a cell with no contributions evals NULL, not 0 (SUM-over-no-terms)") {
    // dims=2 corpus where dim 1 never appears: cells (0,1) and (1,1)
    // received nothing — the explode/DuckDB SUM is NULL there, and so
    // must the native buffer; cell (0,0) is a real (possibly zero) sum
    val df = Seq(Some(Seq(2.0)), None, Some(Seq(0.0)), Some(Seq(-2.0)))
      .toDF("v")
    val arr = df.agg(GramAggregate.gram_acc(col("v"), 2, Fp).as("g"))
      .head().getSeq[java.lang.Long](0)
    assert(arr(GramAggregate.cellIndex(0, 0, 2)) ==
      math.round(4.0 * Fp) + 0L + math.round(4.0 * Fp))
    assert(arr(GramAggregate.cellIndex(0, 1, 2)) == null)
    assert(arr(GramAggregate.cellIndex(1, 1, 2)) == null)
    // an all-null corpus with rows: the queries emit full shells of
    // NULLs (the oracle's groups exist, their SUMs are NULL) — not 0.0
    val d = java.nio.file.Files.createTempDirectory("graft_gram_allnull").toString
    spark.range(3).select(col("id").as("vec_id"),
        expr("CAST(NULL AS array<float>)").as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val gm = graft.SparkEntry.queries("emb_gram_matrix")(spark, d).collect()
    assert(gm.length == 64 * 65 / 2 && gm.forall(_.isNullAt(2)))
    val pca = graft.SparkEntry.queries("emb_pca_power_step")(spark, d).collect()
    assert(pca.length == 64 && pca.forall(_.isNullAt(1)))
  }

  test("non-double arrays fail at analysis, not silently reinterpret") {
    graft.plans.GraftExtensions.register(spark)
    val fl = Seq(Seq(1.0f, 2.0f)).toDF("v") // array<float>
    fl.createOrReplaceTempView("gram_fl")
    val e = intercept[Exception] {
      spark.sql(s"SELECT gram_acc(v, 2, $Fp) FROM gram_fl").collect()
    }
    assert(e.getMessage.contains("array<double>"), e.getMessage)
  }

  test("SQL builder rejects NULL/non-positive dims and fpScale loudly") {
    graft.plans.GraftExtensions.register(spark)
    Seq(1.0, 2.0).toDF("x").select(array(col("x")).as("v"))
      .createOrReplaceTempView("gram_args")
    def msgOf(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    assert(msgOf(s"SELECT gram_acc(v, CAST(NULL AS INT), $Fp) FROM gram_args")
      .contains("non-null"))
    assert(msgOf("SELECT gram_acc(v, 2, CAST(NULL AS BIGINT)) FROM gram_args")
      .contains("non-null"))
    assert(msgOf("SELECT gram_acc(v, 0, 16777216) FROM gram_args")
      .contains("dims must be positive"))
    assert(msgOf("SELECT gram_acc(v, 2, 0) FROM gram_args")
      .contains("fpScale must be positive"))
  }

  test("empty embeddings: the gram/pca queries emit zero rows like the oracle") {
    val d = java.nio.file.Files.createTempDirectory("graft_gram_empty").toString
    spark.range(0).select(col("id").as("vec_id"),
        expr("CAST(array() AS array<float>)").as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    assert(graft.SparkEntry.queries("emb_gram_matrix")(spark, d).count() == 0)
    assert(graft.SparkEntry.queries("emb_pca_power_step")(spark, d).count() == 0)
  }
}
