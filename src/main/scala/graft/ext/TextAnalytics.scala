package graft.ext

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * (builder prompt north-star; no counterpart in the reference, which
  * never inspects payload text). All run over the `documents` table.
  *
  * Everything here is pure codegen-friendly expression work (regexp +
  * higher-order array functions) — no UDFs — so it whole-stage-codegens
  * and scales linearly with input splits; nothing shuffles except the
  * final small aggregations.
  */
object TextAnalytics extends QueryModule {

  /** Tokenizer shared by every text/dedup/corpus operator: lowercase
    * alnum runs. */
  /** THE canonical token character class — single definition feeding the
    * Spark expression, the DuckDB oracle expression, and the JVM
    * streaming kernel (`Dedup.docBandKeys`), so the three tokenizers
    * cannot drift independently. */
  private[graft] val TokenPattern = "[a-z0-9]+"
  private[graft] val tokExpr = s"regexp_extract_all(lower(text), '$TokenPattern', 0)"
  private[ext] val dTok = s"regexp_extract_all(lower(text), '$TokenPattern')"
  private[ext] val stopPattern = "\\\\b(the|a|an|and|of|to|in|is)\\\\b"
  private[ext] val dStop = "\\b(the|a|an|and|of|to|in|is)\\b"

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  override val defs: Seq[(String, Q)] = Seq(

    // Per-document stats: token count (BPE-ish regex tokenizer), byte/char
    // lengths, stopword count, average token length.
    "text_doc_stats" -> Q(
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            expr(s"size($tokExpr)").cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("n_chars_calc"),
            expr(s"regexp_count(lower(text), '$stopPattern')").cast("long").as("n_stopwords"),
            expr(s"aggregate($tokExpr, 0L, (a, t) -> a + length(t))").as("alpha_len"))
          .withColumn("avg_token_len",
            when(col("n_tokens") > 0,
              col("alpha_len").cast("double") / col("n_tokens").cast("double"))
              .otherwise(0.0))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              | len($dTok) AS n_tokens,
              | length(text) AS n_chars_calc,
              | len(regexp_extract_all(lower(text), '$dStop')) AS n_stopwords,
              | -- NULL text must yield NULL (Spark's aggregate over a NULL
              | -- array), but list_prepend(0, NULL) is [0] here → force it
              | CASE WHEN text IS NULL THEN NULL ELSE
              |   list_reduce(list_prepend(0, list_transform($dTok, t -> length(t))),
              |     (a, t) -> a + t) END AS alpha_len,
              | CASE WHEN len($dTok) > 0
              |   THEN CAST(list_reduce(list_prepend(0, list_transform($dTok, t -> length(t))), (a, t) -> a + t) AS DOUBLE)
              |        / CAST(len($dTok) AS DOUBLE)
              |   ELSE 0.0 END AS avg_token_len
              |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "token counting + doc stats (north-star text analysis)"),

    // Dual tokenizers: whitespace tokens and a BPE-ish regex (space-
    // prefixed word/number/punct pieces — the GPT-2 pattern family minus
    // lookarounds, which RE2 lacks). Both are pure regexp counting.
    "text_token_counts" -> Q(
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            expr("regexp_count(text, '\\\\S+')").cast("long").as("ws_tokens"),
            expr("regexp_count(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^\\\\sa-z0-9]+')")
              .cast("long").as("bpe_tokens"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             | len(regexp_extract_all(text, '\S+')) AS ws_tokens,
             | len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+')) AS bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "token counting: whitespace + BPE-ish regex (north-star)"),

    // Corpus-level token top-k: explode → count → TakeOrderedAndProject.
    // Map-side partial aggregation absorbs the token skew before shuffle.
    "text_token_topk" -> Q(
      (s, dir) =>
        docs(s, dir)
          .select(explode(expr(tokExpr)).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token"))
          .limit(20),
      Some(s"""SELECT t AS token, count(*) AS cnt
              |FROM documents, UNNEST($dTok) AS u(t)
              |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 20""".stripMargin),
      doc = "vocabulary top-k (explode + partial agg)"),

    // TF-IDF feature extraction: per-document top-3 terms by
    // tf · ln(N/df) — the classic relevance weighting a training-data
    // pipeline uses for keyword features / quality signals. One
    // tokenize pass → (doc, term) counts → document frequencies →
    // score + per-doc top-k. Everything is keyed aggregation plus one
    // broadcast-able df join; ln parity holds because both engines call
    // the same libm on identically-derived doubles, and ties rank by
    // term so ordering is total.
    "text_tfidf_topk" -> Q(
      (s, dir) => {
        val d = docs(s, dir)
        val nDocs = d.count() // 1-row driver scalar, like a COUNT subquery
        val tf = d.select(col("doc_id"), explode(expr(tokExpr)).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val scored = tf.join(dfreq, Seq("term"))
          .withColumn("tfidf", col("tf").cast("double") *
            log(lit(nDocs).cast("double") / col("df").cast("double")))
        // top-3 per doc through the engine's bounded-heap operator
        // (plans/TopKPerGroup.scala): no sort of the (doc, term) rows,
        // map-side group limit before the shuffle. (tfidf desc, term)
        // is a total order per doc, so the heap is deterministic.
        graft.plans.TopK
          .perGroup(scored, 3, Seq("doc_id"), Seq(("tfidf", false), ("term", true)))
          .select(col("doc_id"), col("rank").cast("long").as("rank"), col("term"),
            round(col("tfidf"), 4).as("tfidf"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some(s"""WITH tf AS (
              |  SELECT doc_id, t AS term, count(*) AS tf
              |  FROM documents, UNNEST($dTok) AS u(t) GROUP BY 1, 2),
              |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
              |n AS (SELECT count(*) AS n FROM documents),
              |scored AS (
              |  SELECT tf.doc_id, tf.term,
              |    CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS tfidf
              |  FROM tf JOIN dfreq ON tf.term = dfreq.term, n)
              |SELECT doc_id, rank, term, round(tfidf, 4) AS tfidf FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              |    ORDER BY tfidf DESC, term NULLS FIRST) AS rank
              |  FROM scored) WHERE rank <= 3
              |ORDER BY doc_id, rank""".stripMargin),
      doc = "per-doc top-3 TF-IDF terms (tokenize once, df join, windowed top-k)"),

    // Quality scoring rolled up per (lang, source): doc counts, length
    // moments, share of "high-quality" docs (length/stopword heuristics).
    "text_quality_by_lang" -> Q(
      (s, dir) => {
        val nTok = expr(s"size($tokExpr)")
        val nStop = expr(s"regexp_count(lower(text), '$stopPattern')")
        val hq = nTok >= lit(20) && nTok <= lit(500) && nStop > lit(0)
        docs(s, dir)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            count(when(hq, 1)).as("n_high_quality"))
          .withColumn("pct_high_quality",
            col("n_high_quality").cast("double") * 100.0 / col("n_docs").cast("double"))
          .orderBy(col("lang"))
      },
      Some(s"""SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
              | count(*) FILTER (WHERE len($dTok) BETWEEN 20 AND 500
              |   AND len(regexp_extract_all(lower(text), '$dStop')) > 0) AS n_high_quality,
              | CAST(count(*) FILTER (WHERE len($dTok) BETWEEN 20 AND 500
              |   AND len(regexp_extract_all(lower(text), '$dStop')) > 0) AS DOUBLE) * 100.0
              |   / CAST(count(*) AS DOUBLE) AS pct_high_quality
              |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "quality scoring (length/stopword heuristics) per lang"),

    // Language-ID heuristic (n-gram/stopword marker ratio) vs the labeled
    // lang — a confusion matrix. The marker CASE is identical SQL on both
    // engines, so this is exact-checkable despite being a heuristic.
    "text_langid_confusion" -> Q(
      (s, dir) => {
        val nTok = expr(s"size($tokExpr)")
        val nStop = expr(s"regexp_count(lower(text), '$stopPattern')")
        val ratio = when(nTok > 0, nStop.cast("double") / nTok.cast("double")).otherwise(0.0)
        docs(s, dir)
          .withColumn("predicted_lang",
            when(ratio >= 0.05, "en").otherwise("other"))
          .groupBy(col("lang"), col("predicted_lang"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("lang"), col("predicted_lang"))
      },
      Some(s"""SELECT lang,
              | CASE WHEN (CASE WHEN len($dTok) > 0
              |   THEN CAST(len(regexp_extract_all(lower(text), '$dStop')) AS DOUBLE)
              |        / CAST(len($dTok) AS DOUBLE) ELSE 0.0 END) >= 0.05
              |   THEN 'en' ELSE 'other' END AS predicted_lang,
              | count(*) AS cnt
              |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "language-ID heuristic confusion matrix"),

    // Exact length quantiles per lang — the cut points a length-filter
    // stage is tuned from. EXACT type-1 quantiles via integer rank
    // selection (value at row ceil(q·n) of the (n_tok, doc_id)-sorted
    // stratum), not a sketch: ceil(q·n) is computed as (n·q% + 99) div
    // 100 so no float touches the rank math, and parity is exact where
    // approx_percentile could never be. One window + one rollup per
    // stratum; shards by lang like every per-stratum op here. Oracle
    // window orders NULLS FIRST to match Spark's ASC default (DuckDB
    // defaults NULLS LAST; moot here, load-bearing on dirty data).
    "text_length_quantiles" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("n_tok"), col("doc_id"))
        docs(s, dir)
          .select(col("lang"), col("doc_id"),
            expr(s"size($tokExpr)").cast("long").as("n_tok"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1))
            .over(Window.partitionBy(col("lang"))))
          .groupBy(col("lang"))
          .agg(
            max(col("n")).as("n_docs"),
            max(when(col("rk") === expr("(n * 50 + 99) div 100"), col("n_tok"))).as("p50_tokens"),
            max(when(col("rk") === expr("(n * 90 + 99) div 100"), col("n_tok"))).as("p90_tokens"),
            max(when(col("rk") === expr("(n * 99 + 99) div 100"), col("n_tok"))).as("p99_tokens"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH t AS (
              |  SELECT lang, doc_id, len($dTok) AS n_tok FROM documents),
              |r AS (SELECT lang, n_tok,
              |    ROW_NUMBER() OVER (PARTITION BY lang
              |      ORDER BY n_tok NULLS FIRST, doc_id NULLS FIRST) AS rk,
              |    count(*) OVER (PARTITION BY lang) AS n
              |  FROM t)
              |SELECT lang, max(n) AS n_docs,
              | max(CASE WHEN rk = (n * 50 + 99) // 100 THEN n_tok END) AS p50_tokens,
              | max(CASE WHEN rk = (n * 90 + 99) // 100 THEN n_tok END) AS p90_tokens,
              | max(CASE WHEN rk = (n * 99 + 99) // 100 THEN n_tok END) AS p99_tokens
              |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "exact per-lang token-length quantiles via integer rank selection"),

    // Document fingerprint: deterministic polynomial rolling hash over the
    // character stream (ordered fold — identical sequential evaluation on
    // both engines; no float, no order nondeterminism). Runs as the
    // native codegen'd rolling_hash expression — one pass over the
    // string, no regexp/array/HOF-lambda per character; exact
    // equivalence to the HOF formulation is pinned in
    // TextExpressionsSpec.
    "text_fingerprint" -> Q(
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            graft.functions.TextExpressions.rolling_hash(col("text")).as("fingerprint"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             | CASE WHEN text IS NULL THEN NULL ELSE
             | list_reduce(list_prepend(CAST(0 AS BIGINT),
             |     -- the engine's contract skips ALL Unicode line
             |     -- terminators (\n \r NEL LS PS — Java-regex '.'
             |     -- semantics); RE2's '.' skips only \n, so the skip
             |     -- set must be spelled out or a \r-bearing corpus
             |     -- (any CRLF text) hashes differently here
             |     list_transform(regexp_extract_all(text, '[^\n\r\x{0085}\x{2028}\x{2029}]'),
             |       c -> CAST(ascii(c) AS BIGINT))),
             |   (h, c) -> (h * 31 + c) % 1000000007) END AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "rolling-hash document fingerprinting"),

    // Collocation mining: top-20 adjacent word pairs by pointwise mutual
    // information, min support 5. PMI = ln(c_xy·T1² / (T2·c_x·c_y)),
    // computed as the LEFT-ASSOCIATED ln-sum
    // ((((ln c_xy + ln T1) + ln T1) − ln T2) − ln c_x) − ln c_y so the
    // i64 product ceiling (c·T1² overflows past ~1.4e9 tokens — and
    // ANSI mode would throw, not wrap) never exists at any corpus size.
    // Parity: each ln runs on a double widened from an exact integer
    // (the text_tfidf_topk discipline) and the addition order is pinned
    // identically on both engines; ordering uses the ROUNDED score +
    // gram tie-break, so the top-k is deterministic. Scale shape: ONE
    // bigram count shuffles by gram with map-side partials (the total
    // derives from it pre-filter); the unigram table is vocab-bounded
    // so it broadcasts; the totals are 1-row broadcasts.
    "text_pmi_bigrams" -> Q(
      (s, dir) => {
        val d = docs(s, dir)
        val uni = d.select(explode(expr(tokExpr)).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c1"))
        val t1 = uni.agg(sum(col("c1")).as("t1"))
        val big0 = Dedup.nGramRowsOf(d, 2, outCol = "gram", distinct = false)
          .groupBy(col("gram")).agg(count(lit(1)).as("c2"))
        val t2 = big0.agg(sum(col("c2")).as("t2"))
        val big = big0.filter(col("c2") >= 5)
        def lnl(c: org.apache.spark.sql.Column) = log(c.cast("double"))
        val scored = big
          .withColumn("w1", split(col("gram"), " ").getItem(0))
          .withColumn("w2", split(col("gram"), " ").getItem(1))
          .join(broadcast(uni.select(col("w").as("w1"), col("c1").as("cx"))), Seq("w1"))
          .join(broadcast(uni.select(col("w").as("w2"), col("c1").as("cy"))), Seq("w2"))
          .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
          .withColumn("pmi", round(
            lnl(col("c2")) + lnl(col("t1")) + lnl(col("t1"))
              - lnl(col("t2")) - lnl(col("cx")) - lnl(col("cy")), 4))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi").desc, col("gram"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 20)
          .select(col("rank"), col("gram"), col("c2").as("n_pair"), col("pmi"))
          .orderBy(col("rank"))
      },
      Some(s"""WITH uni AS (
              |  SELECT t AS w, count(*) AS c1
              |  FROM documents, UNNEST($dTok) AS u(t) GROUP BY 1),
              |t1 AS (SELECT CAST(sum(c1) AS BIGINT) AS t1 FROM uni),
              |big0 AS (
              |  SELECT gm AS gram, count(*) AS c2
              |  FROM documents, UNNEST(${Dedup.dNGrams(2)}) AS u(gm) GROUP BY 1),
              |t2 AS (SELECT CAST(sum(c2) AS BIGINT) AS t2 FROM big0),
              |big AS (SELECT gram, c2 FROM big0 WHERE c2 >= 5),
              |scored AS (
              |  SELECT gram, c2,
              |    round(ln(CAST(c2 AS DOUBLE)) + ln(CAST(t1.t1 AS DOUBLE))
              |      + ln(CAST(t1.t1 AS DOUBLE)) - ln(CAST(t2.t2 AS DOUBLE))
              |      - ln(CAST(ux.c1 AS DOUBLE)) - ln(CAST(uy.c1 AS DOUBLE)), 4) AS pmi
              |  FROM big
              |  JOIN uni ux ON split_part(gram, ' ', 1) = ux.w
              |  JOIN uni uy ON split_part(gram, ' ', 2) = uy.w
              |  CROSS JOIN t1 CROSS JOIN t2)
              |SELECT rank, gram, n_pair, pmi FROM (
              |  SELECT gram, c2 AS n_pair, pmi,
              |    ROW_NUMBER() OVER (ORDER BY pmi DESC, gram NULLS FIRST) AS rank
              |  FROM scored) WHERE rank <= 20
              |ORDER BY rank""".stripMargin),
      doc = "top-20 adjacent-pair collocations by PMI (integer-exact ratio, ln once)"),

    // BM25 keyword search: score every document against a fixed query
    // ("hash join vector") with Okapi BM25 (k1=1.2, b=0.75, the +1 idf
    // variant that keeps weights positive) and return the top 20. The
    // text-retrieval complement of the vector ANN queries. Scale shape:
    // the tf scan filters to the query's terms BEFORE grouping (per-doc
    // work is O(|query|), not O(vocab)); df and the corpus length stats
    // are tiny broadcasts; the per-doc term-score sum is an array_sort +
    // fold in TERM order (the lm-filter discipline) so float addition
    // order is engine- and cluster-size-independent; top-k is
    // TakeOrderedAndProject on (rounded score, doc_id).
    "text_bm25_search" -> Q(
      (s, dir) =>
        bm25Scores(docs(s, dir), Bm25QueryTerms)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20),
      Some(s"""WITH $dBm25Ctes
              |SELECT doc_id, n_hits, score FROM bm25
              |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),
      doc = "Okapi BM25 keyword search over documents (fixed query, top-20)"),

    // RAKE keyphrase extraction — the unsupervised corpus-labeling pass
    // (tags, index terms, topic seeds): candidate phrases are the
    // maximal runs of non-stopword tokens (gaps-and-islands on token
    // position: island id = pos − rank among the doc's non-stop
    // tokens), each word is scored deg(w)/freq(w) over the PHRASE
    // table (deg = Σ |phrase| across the word's phrase occurrences,
    // freq = the occurrence count — co-occurring in long phrases raises
    // deg), and a phrase scores the sum of its words' scores, folded in
    // position order (the lm-filter float discipline). Scale shape:
    // token windows partition per doc, word stats are vocabulary-sized
    // and broadcast back, the top-20 is a TakeOrderedAndProject —
    // nothing touches the corpus twice except the phrase/stat pair of
    // grouped passes.
    "text_rake_keyphrases" -> Q(
      (s, dir) => rakeKeyphrases(docs(s, dir)),
      // DuckDB positions are 1-based vs posexplode's 0-based: island
      // ids shift by one but they are only grouping keys — runs group
      // identically on both engines
      Some(s"""WITH toks AS (
              |  SELECT doc_id, CAST(x['p'] AS BIGINT) AS p, x['w'] AS w
              |  FROM documents, UNNEST(list_transform(
              |    generate_series(1, len($dTok)),
              |    i -> {'p': i, 'w': ($dTok)[i]})) AS u(x)),
              |ns AS (
              |  SELECT doc_id, p, w,
              |    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS isl
              |  FROM toks WHERE w NOT IN ($dRakeStops)),
              |ph AS (SELECT doc_id, isl, list(w ORDER BY p) AS ws
              |       FROM ns GROUP BY 1, 2),
              |wstats AS (
              |  SELECT w, count(*) AS freq, CAST(sum(l) AS BIGINT) AS deg
              |  FROM (SELECT unnest(ws) AS w, len(ws) AS l FROM ph) GROUP BY 1),
              |inst AS (
              |  SELECT ns.doc_id, ns.isl,
              |    string_agg(ns.w, ' ' ORDER BY ns.p) AS phrase,
              |    round(list_reduce(list_prepend(0.0e0,
              |      list(CAST(st.deg AS DOUBLE) / st.freq ORDER BY ns.p)),
              |      (a, x) -> a + x), 4) AS score
              |  FROM ns JOIN wstats st USING (w)
              |  GROUP BY 1, 2)
              |SELECT phrase, count(*) AS n_occurrences, max(score) AS score
              |FROM inst GROUP BY 1
              |ORDER BY score DESC, phrase LIMIT 20""".stripMargin),
      doc = "RAKE keyphrase extraction: stopword-bounded phrase runs, deg/freq word scores, position-ordered folds, top-20"),

    // Fuzzy title/head matching — edit-distance near-dup detection for
    // the SHORT-string regime (titles, headers, product names) where
    // shingle machinery has nothing to grip: normalized 16-char heads,
    // candidates blocked on the head's 8-char prefix OR suffix (a ≤1
    // edit in one half leaves the other half byte-identical — the
    // classic pigeonhole blocking guarantee for distance ≤ 1, best-
    // effort above), exact levenshtein ≤ 3 on the blocked candidates.
    // Both engines compute unit-cost edit distance on the same ASCII
    // heads, so the metric is integer-exact on the differential.
    "text_fuzzy_match" -> Q(
      (s, dir) => fuzzyMatch(docs(s, dir)),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    substr(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')),
             |      1, 16) AS hd
             |  FROM documents WHERE text IS NOT NULL),
             |k AS (
             |  SELECT doc_id, hd, substr(hd, 1, 8) AS pre, substr(hd, 9, 8) AS suf
             |  FROM h WHERE length(hd) = 16),
             |cand AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.hd AS h1, b.hd AS h2
             |  FROM k a JOIN k b ON a.pre = b.pre AND a.doc_id < b.doc_id
             |  UNION
             |  SELECT a.doc_id, b.doc_id, a.hd, b.hd
             |  FROM k a JOIN k b ON a.suf = b.suf AND a.doc_id < b.doc_id)
             |SELECT d1, d2, CAST(levenshtein(h1, h2) AS BIGINT) AS dist
             |FROM cand WHERE levenshtein(h1, h2) <= 3
             |ORDER BY d1, d2""".stripMargin),
      doc = "edit-distance fuzzy matching for short strings: prefix/suffix pigeonhole blocking (equi-joins), exact levenshtein <= 3 on candidates"),
  )

  /** RAKE stopword list (one definition for the Spark filter and the
    * oracle's IN list). Lazy: `defs` interpolates [[dRakeStops]] at
    * object init. */
  private[ext] lazy val RakeStops =
    Seq("the", "a", "an", "and", "of", "to", "in", "is")
  private lazy val dRakeStops = RakeStops.map(w => s"'$w'").mkString(", ")

  /** Fuzzy-match body behind `text_fuzzy_match` (injectable for specs):
    * 16-char normalized heads, candidates blocked on the head's 8-char
    * prefix OR suffix (an edit in one half leaves the other half intact
    * — one block key alone misses those pairs), exact edit distance ≤ 3
    * on survivors. Heads shorter than 16 chars are excluded — a short
    * doc's empty suffix key would be a hot blocking bucket (exact dedup
    * owns that regime). Blocking keys are equi-join columns, never
    * all-pairs; levenshtein runs only on blocked candidates. */
  private[ext] def fuzzyMatch(d: DataFrame): DataFrame = {
    val h = d.filter(col("text").isNotNull)
      .select(col("doc_id"),
        substring(lower(regexp_replace(col("text"), "[^a-zA-Z0-9]+", " ")),
          1, 16).as("hd"))
      .filter(length(col("hd")) === 16)
    // Both blocking keys (8-char prefix / suffix) ride as ROWS of one
    // tagged frame behind ONE explicit exchange, instead of two
    // separate self-joins whose four sides each re-ran the full-text
    // normalization regexp (the dominant map cost — plans showed 4
    // document scans × regexp before). The (tag, k) equi-join over the
    // shared exchange computes the same byPre ∪ bySuf candidate
    // multiset — tag 'p' rows can only meet tag 'p' rows — and the
    // pre-existing distinct() folds the union exactly as before, so
    // the result set is untouched (guide §2.4 "share one exchange";
    // the r16 dedup family applied the same restructure).
    val keyed = h.select(col("doc_id"), col("hd"),
        explode(array(
          struct(lit("p").as("tag"), substring(col("hd"), 1, 8).as("k")),
          struct(lit("s").as("tag"), substring(col("hd"), 9, 8).as("k")))).as("bk"))
      .select(col("doc_id"), col("hd"), col("bk.tag").as("tag"), col("bk.k").as("k"))
      .repartition(col("tag"), col("k"))
    val a = keyed.select(col("doc_id").as("d1"), col("hd").as("h1"),
      col("tag"), col("k"))
    val b = keyed.select(col("doc_id").as("d2"), col("hd").as("h2"),
      col("tag"), col("k"))
    a.join(b, Seq("tag", "k"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("h1"), col("h2"))
      .distinct()
      .withColumn("dist", levenshtein(col("h1"), col("h2")).cast("long"))
      .filter(col("dist") <= 3)
      .select(col("d1"), col("d2"), col("dist"))
      .orderBy(col("d1"), col("d2"))
  }

  /** RAKE body behind `text_rake_keyphrases` (injectable for specs) —
    * see the query comment for the shape. */
  private[ext] def rakeKeyphrases(d: DataFrame, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = d.select(col("doc_id"), posexplode(expr(tokExpr)).as(Seq("p", "w")))
    val ns = toks.filter(!col("w").isin(RakeStops: _*))
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("doc_id")).orderBy(col("p"))))
      .withColumn("isl", col("p") - col("rn"))
    val ph = ns.groupBy(col("doc_id"), col("isl"))
      .agg(array_sort(collect_list(struct(col("p"), col("w")))).as("pw"))
      .select(expr("transform(pw, x -> x.w)").as("ws"))
    val wstats = ph.select(explode(col("ws")).as("w"), size(col("ws")).as("l"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("l")).as("deg"))
    val inst = ns.join(broadcast(wstats), Seq("w"))
      .withColumn("s", col("deg").cast("double") / col("freq").cast("double"))
      .groupBy(col("doc_id"), col("isl"))
      .agg(array_sort(collect_list(struct(col("p"), col("w"), col("s")))).as("pws"))
      .select(
        expr("array_join(transform(pws, x -> x.w), ' ')").as("phrase"),
        round(expr("aggregate(pws, CAST(0 AS DOUBLE), (a, q) -> a + q.s)"), 4)
          .as("score"))
    inst.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("score")).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(topK)
  }

  /** The fixed lexical query shared by `text_bm25_search` and the
    * hybrid-fusion query (`sim_hybrid_rrf`) — one definition so the two
    * rankers score the same search. Lazy (as is [[dBm25Ctes]]) because
    * `defs` above initializes FIRST and interpolates both; plain vals
    * here would read as null there. */
  private[ext] lazy val Bm25QueryTerms = Seq("hash", "join", "vector")

  /** Per-doc Okapi BM25 scores (k1=1.2, b=0.75, +1 idf) for a fixed term
    * set — the scorer behind `text_bm25_search`, factored out so the
    * hybrid RRF fusion ranks over the SAME lexical scoring. Returns
    * (doc_id, n_hits, score) for every doc hitting ≥1 term; the per-doc
    * term-score sum folds in term order (the lm-filter discipline) so
    * float addition is engine- and cluster-size-independent. */
  private[ext] def bm25Scores(d: DataFrame, qTerms: Seq[String]): DataFrame = {
    // lens feeds the corpus totals AND the scoring join; tf feeds the
    // document frequencies AND the scoring join — unpinned, each
    // consumer re-ran its tokenizer pass over the full text (4 passes
    // per call; guide §1.2). Both pins are doc-/term-sized rows, tiny
    // next to the text; the tokenizer now runs exactly twice (token
    // count + query-term occurrences).
    val lens = d.select(col("doc_id"),
      expr(s"size($tokExpr)").cast("long").as("dl"))
      .localCheckpoint(false)
    val corpus = lens.agg(count(lit(1)).as("n"), sum(col("dl")).as("tdl"))
    val tf = d.select(col("doc_id"), explode(expr(tokExpr)).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val termScores = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf", log(
        (col("n").cast("double") - col("df").cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("s", col("idf") * (col("tf").cast("double") * lit(2.2))
        / (col("tf").cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) *
            (col("dl").cast("double") * col("n").cast("double")
              / col("tdl").cast("double")))))
    termScores.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        array_sort(collect_list(struct(col("term"), col("s")))).as("ts"))
      .select(col("doc_id"), col("n_hits"),
        round(expr("aggregate(ts, CAST(0 AS DOUBLE), (a, q) -> a + q.s)"), 4)
          .as("score"))
  }

  /** DuckDB twin of [[bm25Scores]] on [[Bm25QueryTerms]]: CTE chain
    * ending in `bm25 (doc_id, n_hits, score)`. */
  private[ext] lazy val dBm25Ctes: String = {
    val inList = Bm25QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""lens AS (SELECT doc_id, len($dTok) AS dl FROM documents),
       |corpus AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tdl FROM lens),
       |tf AS (
       |  SELECT doc_id, t AS term, count(*) AS tf
       |  FROM documents, UNNEST($dTok) AS u(t)
       |  WHERE t IN ($inList) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |ts AS (
       |  SELECT tf.doc_id, tf.term,
       |    ln((CAST(corpus.n AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5e0)
       |       / (CAST(dfreq.df AS DOUBLE) + 0.5e0) + 1.0e0)
       |    * (CAST(tf.tf AS DOUBLE) * 2.2e0)
       |    / (CAST(tf.tf AS DOUBLE) + 1.2e0 *
       |       (0.25e0 + 0.75e0 *
       |        (CAST(lens.dl AS DOUBLE) * CAST(corpus.n AS DOUBLE)
       |         / CAST(corpus.tdl AS DOUBLE)))) AS s
       |  FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id), corpus),
       |bm25 AS (
       |  SELECT doc_id, count(*) AS n_hits,
       |    round(list_reduce(list_prepend(0.0e0, list(s ORDER BY term)),
       |      (a, x) -> a + x), 4) AS score
       |  FROM ts GROUP BY doc_id)""".stripMargin
  }
}
