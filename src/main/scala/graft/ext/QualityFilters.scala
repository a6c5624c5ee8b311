package graft.ext

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-quality filters for training-data pipelines (north-star; no
  * counterpart in the reference, which never inspects payload text):
  * repetition screening (the Gopher-style "duplicated n-gram fraction"
  * family) and corpus-level boilerplate detection.
  *
  * Scale design: per-document signals are pure expression work or a
  * (doc, gram) keyed aggregation — shuffle-parallel, no pairwise joins.
  * Corpus-level document frequencies are a grouped count whose hot tail
  * (the boilerplate set — bounded by 20 × the average distinct grams
  * per doc, since Σdf ≤ N·avgGrams and each hot gram has df ≥ N/20;
  * corpus-size-INDEPENDENT, so broadcastable at any N for ordinary doc
  * lengths) broadcasts back as a semi-join probe, so the 100 TB side is
  * scanned once and never shuffled by the hot list. Every flag
  * threshold is an integer cross-multiplication — no float ever enters
  * a comparison, so cross-engine parity is exact by construction.
  */
object QualityFilters extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  private val tok = TextAnalytics.tokExpr
  private val dTok = TextAnalytics.dTok
  private val dGram2 = Dedup.dNGrams(2)

  /** Per-doc repetition signals over any (doc_id, text, ...) frame:
    * 2-gram totals/top counts, token dup counts, and the flag. Split out
    * so specs can exercise the rule on planted inputs. */
  private[ext] def repetitionSignals(docsDf: DataFrame): DataFrame = {
    val perGram = Dedup.nGramRowsOf(docsDf, 2, outCol = "gram", distinct = false)
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
    val perDoc = perGram.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"), max(col("c")).as("top_cnt"))
    docsDf
      .select(col("doc_id"),
        expr(s"size($tok)").cast("long").as("n_tok"),
        expr(s"size(array_distinct($tok))").cast("long").as("n_uniq"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("rep_flag",
        col("top_cnt") * 20 > col("n_grams") ||
          (col("n_tok") - col("n_uniq")) * 2 > col("n_tok"))
  }

  /** Per-doc boilerplate signals: distinct 2-gram count and how many of
    * them clear the corpus-wide df floor (df·20 ≥ nDocs, i.e. ≥5% of
    * docs). `nDocsDf` is a 1-row (n_docs) frame so the count stays a
    * lazy subquery (no job at DataFrame-construction time); the hot
    * list broadcasts — bounded by 20 × avg distinct grams per doc,
    * independent of corpus size. */
  private[ext] def boilerplateSignals(docsDf: DataFrame, nDocsDf: DataFrame): DataFrame = {
    val sh = Dedup.nGramRowsOf(docsDf, 2, outCol = "gram")
    val hot = sh.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocsDf))
      .filter(col("df") * 20 >= col("n_docs")).select(col("gram"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val hots = sh.join(broadcast(hot), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hot"))
    docsDf.select(col("doc_id"))
      .join(sizes, Seq("doc_id"), "left")
      .join(hots, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hot"), lit(0L)).as("n_hot"))
      .withColumn("template_doc", col("n_hot") * 10 > col("n_grams") * 8)
  }

  override val defs: Seq[(String, Q)] = Seq(

    // Repetition screen (Gopher-family rules): a doc is flagged when its
    // most frequent word 2-gram exceeds 5% of all its 2-gram slots OR
    // over half its tokens are repeats (1 - distinct/total > 50%).
    // Shape: one non-distinct gram explode → (doc, gram) counts →
    // per-doc max/sum → per-source rollup; the token-repeat leg is pure
    // per-row expression work (size/array_distinct), no shuffle at all.
    // Thresholds compare integers cross-multiplied (top·20 > n_grams),
    // never floats.
    "text_repetition_stats" -> Q(
      (s, dir) => {
        val d = docs(s, dir)
        repetitionSignals(d)
          .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(col("rep_flag"), 1)).as("n_repetitive"),
            sum(coalesce(col("n_grams"), lit(0L))).as("total_grams"),
            sum(coalesce(col("top_cnt"), lit(0L))).as("total_top"))
          .withColumn("top_gram_share",
            round(col("total_top").cast("double") / col("total_grams").cast("double"), 4))
          .orderBy(col("source"))
      },
      Some(s"""WITH pg AS (
              |  SELECT doc_id, gm, count(*) AS c
              |  FROM documents, UNNEST($dGram2) AS u(gm) GROUP BY 1, 2),
              |pd AS (SELECT doc_id, sum(c) AS n_grams, max(c) AS top_cnt
              |       FROM pg GROUP BY 1),
              |base AS (
              |  SELECT doc_id, source, len($dTok) AS n_tok,
              |    len(list_distinct($dTok)) AS n_uniq
              |  FROM documents)
              |SELECT source, count(*) AS n_docs,
              | count(*) FILTER (WHERE top_cnt * 20 > n_grams
              |   OR (n_tok - n_uniq) * 2 > n_tok) AS n_repetitive,
              | CAST(sum(coalesce(n_grams, 0)) AS BIGINT) AS total_grams,
              | CAST(sum(coalesce(top_cnt, 0)) AS BIGINT) AS total_top,
              | round(CAST(sum(coalesce(top_cnt, 0)) AS DOUBLE)
              |   / CAST(sum(coalesce(n_grams, 0)) AS DOUBLE), 4) AS top_gram_share
              |FROM base LEFT JOIN pd USING (doc_id)
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Gopher-style repetition screen (top 2-gram share + dup-token rule)"),

    // Boilerplate detection: 2-grams present in ≥ 5% of ALL documents
    // are "boilerplate" (template headers/footers at web scale); report,
    // per source, what share of each doc's distinct grams is boilerplate
    // and how many docs are >80% boilerplate ("template docs" a cleaner
    // would drop). The df aggregation partial-aggregates map-side; the
    // hot list (≤ 20 × avg distinct grams/doc — see the module scaladoc)
    // broadcasts into a semi-join, so the corpus scans once and only
    // ever shuffles by its own doc_id. The relative (5% of N) floor
    // keeps the rule meaningful at any corpus size.
    "text_boilerplate_share" -> Q(
      (s, dir) => {
        val d = docs(s, dir)
        boilerplateSignals(d, d.agg(count(lit(1)).as("n_docs")))
          .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(col("template_doc"), 1)).as("n_template_docs"),
            sum(col("n_grams")).as("total_grams"),
            sum(col("n_hot")).as("total_hot"))
          .withColumn("hot_share",
            round(col("total_hot").cast("double") / col("total_grams").cast("double"), 4))
          .orderBy(col("source"))
      },
      Some(s"""WITH sh AS (
              |  SELECT DISTINCT doc_id, gm AS gram
              |  FROM documents, UNNEST($dGram2) AS u(gm)),
              |n AS (SELECT count(*) AS n_docs FROM documents),
              |hot AS (SELECT gram FROM sh, n GROUP BY gram, n.n_docs
              |        HAVING count(*) * 20 >= n_docs),
              |sizes AS (SELECT doc_id, count(*) AS n_grams FROM sh GROUP BY 1),
              |hots AS (SELECT doc_id, count(*) AS n_hot FROM sh
              |         WHERE gram IN (SELECT gram FROM hot) GROUP BY 1),
              |base AS (
              |  SELECT d.source, coalesce(s.n_grams, 0) AS n_grams,
              |    coalesce(h.n_hot, 0) AS n_hot
              |  FROM documents d
              |  LEFT JOIN sizes s USING (doc_id) LEFT JOIN hots h USING (doc_id))
              |SELECT source, count(*) AS n_docs,
              | count(*) FILTER (WHERE n_hot * 10 > n_grams * 8) AS n_template_docs,
              | CAST(sum(n_grams) AS BIGINT) AS total_grams,
              | CAST(sum(n_hot) AS BIGINT) AS total_hot,
              | round(CAST(sum(n_hot) AS DOUBLE) / CAST(sum(n_grams) AS DOUBLE), 4)
              |   AS hot_share
              |FROM base GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "corpus boilerplate detection (hot 2-grams ≥5% df, broadcast probe)"),

    // PII scrub audit — the pre-export redaction stage every real
    // corpus pipeline runs. The synthetic corpus is letters-only
    // (checked: zero docs contain [0-9@+] at any SF), so deterministic
    // PII spans are PLANTED from doc_id (email on ≡0 mod 5, IPv4 on
    // mod 7, phone on mod 11), then scrubbed by the REAL operator:
    // generic regex classes counted with regexp_count and redacted to
    // <EMAIL>/<IP>/<PHONE> tags with regexp_replace. The oracle never
    // touches a regex — it recomputes match counts and the redacted
    // character delta ARITHMETICALLY from the plant rule, so a regex
    // that over-matches into the surrounding text, under-matches a
    // planted span, or redacts a wrong-width substring fails the hash.
    // 100 TB shape: pure per-row expression work (codegen'd regex on
    // each doc exactly once) + one hash agg by lang — one scan, one
    // tiny shuffle, nothing driver-side.
    "text_pii_scrub" -> Q(
      (s, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"
        val planted = docs(s, dir).withColumn("dirty", concat(
          col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
              lit(".0."), (col("doc_id") % 100).cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call +1-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))))
        planted
          .withColumn("clean", regexp_replace(regexp_replace(regexp_replace(
            col("dirty"), lit(emailRe), lit("<EMAIL>")),
            lit(ipRe), lit("<IP>")), lit(phoneRe), lit("<PHONE>")))
          .select(col("lang"),
            regexp_count(col("dirty"), lit(emailRe)).cast("long").as("e"),
            regexp_count(col("dirty"), lit(ipRe)).cast("long").as("i"),
            regexp_count(col("dirty"), lit(phoneRe)).cast("long").as("p"),
            (length(col("dirty")) - length(col("clean"))).cast("long").as("delta"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("e")).as("n_emails"),
            sum(col("i")).as("n_ipv4"),
            sum(col("p")).as("n_phones"),
            sum(col("delta")).as("chars_redacted"))
          .orderBy(col("lang"))
      },
      Some("""WITH p AS (
             |  SELECT lang,
             |    CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS e,
             |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS i,
             |    CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS ph,
             |    CASE WHEN doc_id % 5 = 0 THEN
             |      length('user' || CAST(doc_id AS VARCHAR) || '@example.com')
             |        - length('<EMAIL>') ELSE 0 END
             |    + CASE WHEN doc_id % 7 = 0 THEN
             |      length('10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
             |        || CAST(doc_id % 100 AS VARCHAR)) - length('<IP>') ELSE 0 END
             |    + CASE WHEN doc_id % 11 = 0 THEN
             |      length('+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
             |        - length('<PHONE>') ELSE 0 END AS delta
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs, CAST(sum(e) AS BIGINT) AS n_emails,
             |  CAST(sum(i) AS BIGINT) AS n_ipv4, CAST(sum(ph) AS BIGINT) AS n_phones,
             |  CAST(sum(delta) AS BIGINT) AS chars_redacted
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "PII scrub audit: planted spans, real regex redaction, arithmetic oracle"),
  )
}
