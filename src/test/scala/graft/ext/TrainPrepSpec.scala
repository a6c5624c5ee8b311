package graft.ext

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Invariants of the training-prep operators that the SQL oracle can't
  * state: decon catches a planted leak, sampling is deterministic and
  * rate-shaped, packing partitions the corpus exactly. */
class TrainPrepSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("token budget plan: integer-exact targets, epochs, over-repeat flag") {
    import spark.implicits._
    // A: 10 tokens, B: 30 → tot 40
    val d = Seq(
      (1L, "A", "w w w w w w w w w w"),
      (2L, "B", Seq.fill(30)("x").mkString(" ")))
      .toDF("doc_id", "source", "text")
    // budget 80: A target = 80·10 div 40 = 20 (2 epochs), B = 60 (2) —
    // neither past the 4-epoch cap
    val p80 = TrainPrep.tokenBudgetPlan(d, 80L).collect()
    assert(p80.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getBoolean(4))).toSeq ==
      Seq(("A", 10L, 20L, 2.0, false), ("B", 30L, 60L, 2.0, false)))
    // budget 400: A target 100 = 10 epochs → flagged; B 300 = 10 → flagged
    val p400 = TrainPrep.tokenBudgetPlan(d, 400L).collect()
    assert(p400.forall(_.getBoolean(4)))
    // uneven division floors (integer div, both engines): budget 81 →
    // A = 81·10 div 40 = 20, B = 81·30 div 40 = 60
    val p81 = TrainPrep.tokenBudgetPlan(d, 81L).collect()
    assert(p81.map(_.getLong(2)).toSeq == Seq(20L, 60L))
  }

  test("BPE merge pairs: hand-computed frequency-weighted counts") {
    import spark.implicits._
    // vocab: ab ×2, cab ×1, x ×1 (single char: no pairs)
    // pairs: 'ab' from "ab"(freq 2) + "cab"(freq 1) = 3; 'ca' = 1
    val d = Seq((1L, "ab X ab"), (2L, "cab")).toDF("doc_id", "text")
    val out = TrainPrep.bpeMergePairs(d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("ab", 3L), ("ca", 1L)))
  }

  test("BPE train steps: each round's apply reshapes the next round's counts") {
    import spark.implicits._
    // vocab: aaab ×2, ab ×1. Hand-run:
    //   r1: pairs (a,a)=4, (a,b)=3 → merge (a,a); aaab→[aa,a,b], ab→[a,b];
    //       toks = 2·3 + 1·2 = 8
    //   r2: (a,b) = 2+1 = 3 beats (aa,a)=2 → merge (a,b);
    //       [aa,a,b]→[aa,ab], [a,b]→[ab]; toks = 2·2 + 1·1 = 5
    //   r3: (aa,ab)=2 → merge; toks = 2·1 + 1·1 = 3
    // r2/r3 counts only come out right if r1/r2 REWROTE the words —
    // the apply kernel is load-bearing, not decorative.
    val d = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = TrainPrep.bpeTrainSteps(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 4L, 8L),
      (2L, "a", "b", 3L, 5L),
      (3L, "aa", "ab", 2L, 3L)))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty) // loan released
  }

  test("BPE vocab: final symbol state matches the hand-run merges") {
    import spark.implicits._
    // same fixture as the trajectory test: after 3 rounds aaab→[aaab]?
    // no — hand-run above ends at r3 with aaab→[aaab] merged from
    // [aa,ab] via (aa,ab): words are aaab×2 → [aaab], ab×1 → [ab].
    // vocab: aaab (token_count 2, 1 word), ab (1, 1)
    val d = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = TrainPrep.bpeVocab(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(("aaab", 2L, 1L, 4), ("ab", 1L, 1L, 2)))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty) // loan released
  }

  test("BPE vocab token mass equals the trajectory's final toks_after") {
    // the two queries share one loop — the vocab's total token count
    // (unlimited topK) must equal the last trajectory row's toks_after
    val docs = graft.Tables.documents(spark, Sf)
    val traj = TrainPrep.bpeTrainSteps(docs).collect()
    val lastToks = traj.last.getLong(4)
    val vocabMass = TrainPrep.bpeVocab(docs, topK = 1000000).collect()
      .map(_.getLong(1)).sum
    assert(vocabMass == lastToks, s"$vocabMass vs $lastToks")
  }

  test("BPE train steps: leftmost-greedy overlap resolution and early exhaustion") {
    import spark.implicits._
    // "aaaa": r1 merges (a,a) cnt 3 but applies at EVEN offsets only
    // ([a,a,a,a] → [aa,aa], never three overlapping merges); r2 merges
    // (aa,aa) → [aaaa]; r3 finds no pair left → loop stops at 2 rows.
    val d = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = TrainPrep.bpeTrainSteps(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 3L, 2L),
      (2L, "aa", "aa", 1L, 1L)))
  }

  test("bigram LM scorer reproduces hand-computed interpolated probabilities") {
    import spark.implicits._
    // doc "a b a b": uni a=2 b=2 T=4; bigrams (a,b)×2, (b,a)×1
    //   s(a→b) = ln(0.8·2/2 + 0.2·2/4) = ln(0.9)
    //   s(b→a) = ln(0.8·1/2 + 0.2·2/4) = ln(0.5)
    // fold in position order: ((0 + s1) + s2) + s1, ÷ 3
    val d = Seq((1L, "a b a b", "x")).toDF("doc_id", "text", "source")
    val out = TrainPrep.bigramScores(d).collect()
    assert(out.length == 1)
    val s1 = math.log(0.8 * 2.0 / 2.0 + 0.2 * 2.0 / 4.0)
    val s2 = math.log(0.8 * 1.0 / 2.0 + 0.2 * 2.0 / 4.0)
    val expected = (0.0 + s1 + s2 + s1) / 3.0
    assert(out(0).getAs[Double]("avg_lp") == expected,
      s"${out(0)} vs $expected")
    // a 1-token doc has no transitions and must drop, not score NaN
    val single = Seq((2L, "solo", "x")).toDF("doc_id", "text", "source")
    assert(TrainPrep.bigramScores(single).isEmpty)
  }

  test("chunk windows: boundary arithmetic — no redundant runts, contiguous coverage") {
    import spark.implicits._
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // n=128 → exactly one chunk (start 96 would be fully covered);
    // n=129 → [0,128) + [96,129): lens 128+33, duplication 161/129;
    // n=32  → one short chunk; n=0 (empty text) → doc dropped entirely
    val d = Seq(
      (1L, toks(128), "a"), (2L, toks(129), "b"),
      (3L, toks(32), "c"), (4L, "", "d")).toDF("doc_id", "text", "source")
    val out = TrainPrep.chunkWindows(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("a", 1L, 1L, 128L, 128.0, 1.0),
      ("b", 1L, 2L, 161L, 80.5, 1.2481),
      ("c", 1L, 1L, 32L, 32.0, 1.0)))
  }

  test("BPE encode: per-source token economics match the hand-run encoder") {
    import spark.implicits._
    // corpus: src a = "aaab aaab ab", src b = "ab x".
    // word freqs: aaab×2, ab×2, x×1. 1 round: pairs (a,a)=4 ties
    // (a,b)=4 → pair-asc tie-break merges (a,a); encoder becomes
    // aaab→[aa,a,b] (3 syms), ab→[a,b] (2), x→[x] (1).
    //   src a: words 3, tokens 3+3+2=8, chars 10 → cpt 1.25, tpw 8/3
    //   src b: words 2, tokens 2+1=3,   chars 3  → cpt 1.0,  tpw 1.5
    val d = Seq((1L, "aaab aaab ab", "a"), (2L, "ab x", "b"))
      .toDF("doc_id", "text", "source")
    val out = TrainPrep.bpeEncode(d, rounds = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("a", 1L, 3L, 8L, 1.25, 2.6667),
      ("b", 1L, 2L, 3L, 1.0, 1.5)))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty) // loan released
  }

  test("BPE encode total tokens equals the trajectory's final toks_after") {
    // encode applies the SAME trained merges the trajectory audits, so
    // corpus-wide Σ n_tokens must equal the last round's toks_after —
    // the encoder and the training loop cannot drift
    val docs = graft.Tables.documents(spark, Sf)
    val lastToks = TrainPrep.bpeTrainSteps(docs).collect().last.getLong(4)
    val encoded = TrainPrep.bpeEncode(docs).collect().map(_.getLong(3)).sum
    assert(encoded == lastToks, s"$encoded vs $lastToks")
  }

  test("BPE rounds cap: the driver-iterated loop refuses a full-vocab train") {
    import spark.implicits._
    // MaxBpeRounds contract: 50k merge rounds = 50k job launches of
    // scheduling overhead — the audit loop must fail LOUDLY there and
    // point at the word-frequency export instead
    val d = Seq((1L, "aaab ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TrainPrep.bpeTrainSteps(d, rounds = TrainPrep.MaxBpeRounds + 1)
    }
    assert(e.getMessage.contains("driver-iterated"))
    // at the cap itself the loop runs (it just exhausts early here)
    assert(TrainPrep.bpeTrainSteps(d, rounds = TrainPrep.MaxBpeRounds)
      .collect().nonEmpty)
  }

  test("split-leakage audit: pair matrix conserves the near-dup pair count") {
    val rows = run("prep_split_leakage").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    // every row canonically ordered, leak flag consistent
    rows.foreach { case (a, b, n, leak) =>
      assert(a <= b && n >= 1)
      assert(leak == (a != b), s"leak flag wrong for ($a,$b)")
    }
    // the matrix partitions EXACTLY the verified near-dup pair set —
    // same threshold/cap as dedup_jaccard_pairs by construction
    val totalPairs = run("dedup_jaccard_pairs").count()
    assert(rows.map(_._3).sum == totalPairs)
    // the synthetic corpus plants near-dups across the hash split, so
    // the audit must actually catch a leak
    assert(rows.exists(_._4), "expected at least one cross-split leaky pair")
  }

  test("winsorize bounds ignore nulls: 33% null values, p1/p99 stay defined") {
    import spark.implicits._
    // a third of the rows carry null values — a nulls-first rank would
    // land the p1 selection on a null and null both bounds, reopening
    // the Spark-vs-DuckDB least/greatest null-skip divergence
    val rows = (1 to 100).map { i =>
      ("swap", i.toLong, if (i % 3 == 0) None else Some(i.toDouble))
    }
    val out = TrainPrep.clipOutliers(rows.toDF("event_type", "event_id", "value"))
      .collect()
    assert(out.length == 1)
    val r = out(0)
    // 67 non-null values → p1 rank 1 (min = 1.0), p99 rank 67 (max = 100.0)
    assert(r.getDouble(r.fieldIndex("p1")) == 1.0)
    assert(r.getDouble(r.fieldIndex("p99")) == 100.0)
    // the clip pass still sees every row, nulls included
    assert(r.getLong(r.fieldIndex("n_events")) == 100)
    assert(r.getLong(r.fieldIndex("n_clip_lo")) == 0)
    assert(r.getLong(r.fieldIndex("n_clip_hi")) == 0)
  }

  test("gram5Rows: short docs yield nothing, 5+ tokens yield n-4 grams") {
    import spark.implicits._
    val d = Seq(
      (1L, "one two three four"),              // 4 tokens -> no 5-gram
      (2L, "one two three four five six"),     // 6 tokens -> 2 grams
      (3L, "a a a a a a a a")                  // repeats collapse (distinct)
    ).toDF("doc_id", "text")
    val g = TrainPrep.gram5Rows(d)
    assert(g.filter(col("doc_id") === 1L).count() == 0)
    assert(g.filter(col("doc_id") === 2L).count() == 2)
    assert(g.filter(col("doc_id") === 3L).count() == 1)
  }

  test("decontamination flags a planted benchmark leak") {
    import spark.implicits._
    val leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (10L, leak),                              // benchmark doc (id % 10 = 0)
      (11L, leak),                              // verbatim leak -> contaminated
      (12L, "totally unrelated words with no shared five gram span here"),
      (13L, "prefix alpha beta gamma delta epsilon suffix tail words")
    ).toDF("doc_id", "text")                    // 13: exactly 1 shared gram
    val grams = TrainPrep.gram5Rows(d)
    val bench = grams.filter(col("doc_id") % 10 === 0).select(col("h")).distinct()
    val hits = grams.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(bench), Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(hits(11L) == 6L, s"verbatim copy shares all 6 grams: $hits")
    assert(hits(13L) == 1L, "one overlapping 5-token span")
    assert(!hits.contains(12L), "clean doc must not surface")
  }

  test("stratified sampling is deterministic and roughly rate-shaped") {
    val a = run("prep_sample_stratified").collect().toSeq
    val b = run("prep_sample_stratified").collect().toSeq
    assert(a == b, "hash-keyed sampling must be run-stable")
    a.foreach { r =>
      val (lang, total, sampled) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(sampled >= 0 && sampled <= total)
      val rate = if (lang == "en") 0.5 else 0.25
      // md5 keys are uniform; 500-doc strata stay within wide bounds
      assert(math.abs(sampled.toDouble / total - rate) < 0.2,
        s"$lang: $sampled/$total vs rate $rate")
    }
  }

  test("weighted sampling: deterministic, complete ranks, length-debiased") {
    val a = run("prep_sample_weighted").collect()
    val b = run("prep_sample_weighted").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // no RNG anywhere
    assert(a.length == 100)
    assert(a.map(_.getLong(0)).toSeq == (1L to 100L))
    // the 1/sqrt(n_chars) weight must pull the sampled mean length BELOW
    // the corpus mean — the token-budget debias the weight exists for
    val sampledMean = a.map(_.getLong(3)).sum.toDouble / a.length
    val corpusMean = graft.Tables.documents(spark, Sf)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampledMean < corpusMean,
      s"sampled mean $sampledMean not below corpus mean $corpusMean")
  }

  test("per-source cap: at most K kept, deterministic, totals preserved") {
    val a = run("prep_cap_per_source").collect().toSeq
    assert(a == run("prep_cap_per_source").collect().toSeq, "hash order is run-stable")
    a.foreach { r =>
      val (total, kept) = (r.getLong(1), r.getLong(2))
      assert(kept == math.min(total, 10L), s"cap keeps min(total, 10): $r")
    }
    val totalDocs = graft.Tables.documents(spark, Sf).count()
    assert(a.map(_.getLong(1)).sum == totalDocs, "every doc counted exactly once")
  }

  test("embedding norm screen: one row per label, bounds ordered") {
    val rows = run("emb_norm_stats").collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), "min_norm <= max_norm")
      assert(r.getLong(4) <= r.getLong(1), "n_near_unit bounded by n_vecs")
    }
  }

  test("funnel gates stages in order on a synthetic timeline") {
    import spark.implicits._
    // user 1: view(10) -> click(20) -> purchase(30): full funnel.
    // user 2: click(5) BEFORE view(10): click must not count.
    // user 3: view(10), purchase(20) with no click: purchase must not count.
    val us = 1000L // 1 µs in nanos: keep values on µs boundaries
    val e = Seq(
      (1L, "view", 10 * us), (1L, "click", 20 * us), (1L, "purchase", 30 * us),
      (2L, "click", 5 * us), (2L, "view", 10 * us),
      (3L, "view", 10 * us), (3L, "purchase", 20 * us)
    ).toDF("user_id", "event_type", "ts")
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(expr("ts div 1000")).as("v_tus"))
    val clicks = e.filter(col("event_type") === "click")
      .join(views, Seq("user_id")).filter(expr("ts div 1000") > col("v_tus"))
      .groupBy(col("user_id")).agg(min(expr("ts div 1000")).as("c_tus"))
    val purchases = e.filter(col("event_type") === "purchase")
      .join(clicks, Seq("user_id")).filter(expr("ts div 1000") > col("c_tus"))
      .groupBy(col("user_id")).agg(min(expr("ts div 1000")).as("p_tus"))
    assert(views.count() == 3 && clicks.count() == 1 && purchases.count() == 1)
    assert(clicks.select("user_id").as[Long].head() == 1L)
    // and the real query's stages are monotone on testdata
    val row = run("evt_funnel").head()
    assert(row.getLong(0) >= row.getLong(1) && row.getLong(1) >= row.getLong(2))
  }

  test("packing partitions each stratum exactly: docs and tokens conserved") {
    import spark.implicits._
    val packs = run("prep_pack_sequences")
    val perLang = packs.groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("docs"), sum(col("pack_tokens")).as("toks"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val truth = graft.Tables.documents(spark, Sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))").cast("long")).as("toks"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(perLang == truth, "every doc lands in exactly one pack; tokens conserved")
    // pack ids start at 0 and docs are assigned in doc_id order
    packs.select("lang", "pack_id", "first_doc", "last_doc")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        assert(sorted.head._2 == 0L, "first pack of each stratum is 0")
        sorted.sliding(2).foreach {
          case Array((_, _, _, lastA), (_, _, firstB, _)) =>
            assert(lastA < firstB, "pack doc ranges must not overlap")
          case _ => ()
        }
      }
  }

  test("LM scorer reproduces hand-computed unigram probabilities") {
    import spark.implicits._
    // corpus: "a a a" + "a b" -> counts a=4, b=1, T=5
    val d = Seq((1L, "a a a", "s"), (2L, "a b", "s")).toDF("doc_id", "text", "source")
    val got = TrainPrep.lmScores(d)
      .select("doc_id", "avg_lp").as[(Long, Double)].collect().toMap
    val lnA = math.log(4.0 / 5.0); val lnB = math.log(1.0 / 5.0)
    assert(math.abs(got(1L) - lnA) < 1e-12, s"doc1: ${got(1L)} vs $lnA")
    assert(math.abs(got(2L) - (lnA + lnB) / 2) < 1e-12, s"doc2: ${got(2L)}")
  }

  test("LM filter: flags bounded by doc counts, deterministic, scores negative") {
    val a = run("prep_lm_filter").collect().toSeq
    assert(a == run("prep_lm_filter").collect().toSeq)
    a.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1), r.toString)
      assert(r.getDouble(3) < 0, "log-probs are negative")
    }
  }

  test("k-means step: partition of the store, bounded cohesion and sims") {
    val rows = run("emb_kmeans_step").collect()
    assert(rows.length == 8, "one row per seed cluster")
    val total = graft.Tables.embeddings(spark, Sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "every vector assigned exactly once")
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getLong(1).toDouble + 1e-9, "cohesion <= n (cos <= 1)")
      val cs = r.getDouble(3)
      assert(cs >= -1.0 - 1e-9 && cs <= 1.0 + 1e-9, s"centroid sim in [-1,1]: $r")
    }
  }

  test("z-order audit: Morton quads bound BOTH dims, linear only the leading") {
    val rows = run("prep_zorder_layout").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(7), r.getLong(8)))
    val (zf, lf) = rows.partition(_._1 == "zorder")
    assert(zf.nonEmpty && lf.nonEmpty)
    // aligned 256-wide z-prefixes are 16×16 quads: both spans bounded
    zf.foreach { case (_, _, us, ds) => assert(us <= 16 && ds <= 16, s"$us×$ds") }
    // linear stripes bound u at 8 but leave the day dimension unbounded:
    // a day probe reads every file
    lf.foreach { case (_, _, us, _) => assert(us <= 8) }
    val fullDaySpan = lf.map(_._4).max
    assert(lf.forall(_._4 == fullDaySpan), "every linear file spans all days")
    assert(zf.map(_._4).max < fullDaySpan, "z quads prune on day")
    // both layouts cover every cell exactly once
    assert(zf.map(_._2).sum == lf.map(_._2).sum)
  }

  test("winsorization: hand-computed clip bounds and sums on 1..100") {
    val out = run("prep_clip_outliers").collect()
    // contract on real data: clip counts bounded by the tail definition,
    // clipped sum never exceeds raw by more than the lo-tail lift
    out.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo <= n / 100 && hi <= n / 100 + 1, s"tails too fat: $r")
      assert(r.getDouble(4) <= r.getDouble(5), "p1 <= p99")
    }
  }

  test("winsorization on a planted 1..100 column") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_clip").toString
    (1 to 100).map(i => (i.toLong, i.toLong * 1000000L, 1L, "t", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/events.parquet")
    val out = graft.SparkEntry.queries("prep_clip_outliers")(spark, base).collect()
    assert(out.length == 1)
    val r = out(0)
    // type-1 ranks: p1 = value@rk1 = 1, p99 = value@rk99 = 99
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 99.0)
    assert(r.getLong(2) == 0L)       // nothing below 1
    assert(r.getLong(3) == 1L)       // only 100 above 99
    assert(r.getDouble(6) == 5050.0) // Σ 1..100
    assert(r.getDouble(7) == 5049.0) // 100 clipped to 99
  }

  test("Morton interleave: hand-computed z for known (u, d) cells") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // users 1,0,3 active on days 0,1,1 → cells (u=1,d=0),(u=0,d=1),(u=3,d=1)
    val ev = Seq((1L, 0L * dayNs), (0L, 1L * dayNs), (3L, 1L * dayNs))
      .toDF("user_id", "ts")
    val out = TrainPrep.zorderLayout(ev).filter(col("layout") === "zorder").collect()
    // z(1,0)=2, z(0,1)=1, z(3,1)=11 — all in z-prefix file 0, spans 4×2
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 0L && r.getLong(2) == 3L)
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) == ((0L, 3L, 0L, 1L)))
  }
}
