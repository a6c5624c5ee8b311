package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only ~sf1 rehearsal data generator (Test scope — not part of the
  * library). Scales the sf0.1 `documents`/`embeddings` tables ~10× with
  * deterministic, dedup-realistic replicas so the dedup + similarity
  * families can be rehearsed an order of magnitude above the driver's
  * bench SF (VERDICT r7, task 7):
  *
  *   - replica 0: the original rows;
  *   - replica ≡ 1 (mod 10): EXACT text duplicates under fresh doc_ids
  *     (exact-dedup groups grow with scale — the groupBy stress case);
  *   - replica ≡ 2,3 (mod 10): NEAR duplicates (two salt tokens appended
  *     → word-3-gram Jaccard ≈ n/(n+2), above the 0.5 verify threshold —
  *     the band/verify fan-out stress case);
  *   - otherwise: DISTINCT documents (word order reversed + salt token:
  *     different 3-gram shingle set, so the df-cap and band bounds face
  *     a genuinely larger vocabulary, not 10 copies of the same one).
  *
  * Embeddings get deterministic per-replica perturbations (fresh points,
  * same clustered geometry), so IVF/LSH/PQ candidate-generation cost
  * scales with real corpus size.
  *
  * Run: sbt 'Test/runMain graft.ext.RehearsalGen /root/testdata/sf0.1 target/sf1 10'
  * then: SPARK_GRAFT_SF_DIR=target/sf1 sbt 'runMain graft.Bench <names>'
  */
object RehearsalGen {

  val IdStrideK = 10000000L

  private def replicateDf(base: DataFrame, replicas: Int,
      variant: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until replicas).map(r => variant(base, r)).reduce(_.unionByName(_))

  /** The documents scaling transform (see the object doc for the mix),
    * callable from specs: base docs → ~replicas× corpus. */
  def scaleDocs(docs: DataFrame, replicas: Int, mode: String): DataFrame =
    replicateDf(docs, replicas, { (d, r) =>
      val text =
        if (r == 0) col("text")
        else if (mode == "distinct")
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(t, lit(s"x$r"))))
        else if (r % 10 == 1) col("text") // exact duplicate
        else if (r % 10 == 2 || r % 10 == 3)
          concat(col("text"), lit(s" salt$r near")) // near duplicate
        else // distinct: reversed word order + salt
          concat(concat_ws(" ", reverse(split(col("text"), " "))), lit(s" salt$r"))
      d.select(
        (col("doc_id") + lit(r * IdStrideK)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    })

  /** The embeddings scaling transform, callable from specs: replica
    * directions decorrelated in `distinct` mode (see the main's doc). */
  def scaleEmbeddings(embs: DataFrame, replicas: Int, mode: String): DataFrame = {
    val embAmp = if (mode == "distinct") 0.5 else 0.01
    replicateDf(embs, replicas, { (e, r) =>
      val vec =
        if (r == 0) col("embedding")
        else if (mode == "distinct")
          transform(col("embedding"),
            (x, i) => (x + lit(embAmp) * sin((i.cast("double") + lit(1.0)) *
              lit((r * 31 + 7).toDouble) + col("vec_id").cast("double")))
              .cast("float"))
        else transform(col("embedding"),
          (x, i) => (x + lit(embAmp * r) * sin(i.cast("double") + col("vec_id").cast("double")))
            .cast("float"))
      e.select(
        (col("vec_id") + lit(r * IdStrideK)).as("vec_id"),
        vec.as("embedding"), col("label"))
    })
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("target/sf1")
    val replicas = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    // "dup" (default): the duplicate-heavy mix below — realistic dedup
    // workload, but output-bound queries (pair sets) grow quadratically
    // in replica multiplicity, so it caps out around ~10×.
    // "distinct": every replica token-salted into a DISTINCT document
    // (vocabulary grows ~replicas×) — the mode for 100×-scale runs,
    // stressing index/candidate bounds without output explosion.
    val mode = args.drop(3).headOption.getOrElse("dup")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val IdStride = IdStrideK

    def replicate(base: DataFrame, variant: (DataFrame, Int) => DataFrame): DataFrame =
      replicateDf(base, replicas, variant)

    // token-level salt in distinct mode: every token rewritten, so the
    // replica shares NO shingle with its source and the corpus
    // vocabulary genuinely grows with scale
    val docsOut = scaleDocs(Tables.documents(spark, src), replicas, mode)

    // distinct mode spreads replicas into genuinely new points. The
    // perturbation DIRECTION must vary with r: a first cut used
    // amp·r·sin(i + vec_id) — growth along one fixed direction per
    // vector — and at large r every replica of every vector converged
    // onto near-parallel rays, collapsing 95% of the corpus into a few
    // LSH buckets and exploding the true near-dup pair set into the
    // hundreds of millions (output-bound disk fill, not an engine
    // bound). Varying the frequency with r decorrelates directions.
    val embsOut = scaleEmbeddings(Tables.embeddings(spark, src), replicas, mode)

    // events: 10× the stream. Half the replicas keep the ORIGINAL
    // user_ids (hot users get 5× the events — the skew direction that
    // stresses per-user windows and the graph projection cap), half get
    // fresh user_ids (graph grows in nodes, not just degree). ts shifts
    // by r seconds so replicas stay inside every anchored window.
    val events = Tables.events(spark, src) // ts normalized to epoch-nanos
    val eventsOut = replicate(events, { (e, r) =>
      e.select(
        (col("event_id") + lit(r * IdStride)).as("event_id"),
        (col("ts") + lit(r * 1000000000L)).as("ts"),
        (if (r % 2 == 0) col("user_id")
         else col("user_id") + lit((r / 2 + 1) * IdStride)).as("user_id"),
        col("event_type"),
        (col("value") * (lit(1.0) + lit(r) / lit(100.0))).as("value"),
        col("props"))
    })

    // TPC-H side (round 14, for FULL-surface rehearsal): the FACT
    // tables (orders, lineitem) replicate with an order-key stride so
    // join keys stay consistent; dimension keys (cust/supp/part) keep
    // their ORIGINAL values — facts grow ~replicas×, dims stay fixed,
    // exactly the shape a growing warehouse has (and the hot-key
    // direction that stresses the fact-side joins). Dates shift by r
    // days modulo a year-ish window so date-bucketed plans see real
    // spread. Dimensions copy through verbatim.
    val ordersOut = replicate(Tables.orders(spark, src), { (o, r) =>
      o.select(
        (col("o_orderkey") + lit(r * IdStride)).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"),
        (col("o_totalprice") * (lit(1.0) + lit(r) / lit(1000.0))).as("o_totalprice"),
        (col("o_orderdate") + expr(s"INTERVAL '$r' DAY")).as("o_orderdate"),
        col("o_orderpriority"))
    })
    val lineitemOut = replicate(Tables.lineitem(spark, src), { (l, r) =>
      l.select(
        (col("l_orderkey") + lit(r * IdStride)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) + lit(r) / lit(1000.0)))
          .as("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"),
        (col("l_shipdate") + expr(s"INTERVAL '$r' DAY")).as("l_shipdate"))
    })

    docsOut.repartition(16).write.mode("overwrite").parquet(s"$out/documents.parquet")
    embsOut.repartition(16).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    eventsOut.repartition(16).write.mode("overwrite").parquet(s"$out/events.parquet")
    ordersOut.repartition(16).write.mode("overwrite").parquet(s"$out/orders.parquet")
    lineitemOut.repartition(16).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"[rehearsal] documents: ${spark.read.parquet(s"$out/documents.parquet").count()}")
    println(s"[rehearsal] embeddings: ${spark.read.parquet(s"$out/embeddings.parquet").count()}")
    println(s"[rehearsal] events: ${spark.read.parquet(s"$out/events.parquet").count()}")
    spark.stop()
  }
}
