package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The 10×/100× rehearsal as a repeatable `sbt test` gate.
  *
  * The round-8 rehearsals (PLANS.md) measured the dedup/similarity
  * families at 10×–100× the bench SF and found two real quadratic paths
  * (semdedup per-cluster fan-out; fixed LSH bucket geometry). This spec
  * pins the INVARIANTS that made those rehearsals pass, on corpora
  * scaled in-memory by the same generator ([[RehearsalGen]]), so a
  * future edit that reintroduces a super-linear path fails a test
  * instead of a next 100× rehearsal or a production run.
  *
  * Gates are on deterministic WORK BOUNDS (candidate counts, cap
  * invariants, fan-out sums), never wall-clock: single-sample times on
  * this host swing up to ~3× (PLANS.md "container-epoch variance"), so
  * a time-ratio assertion would flake. The measured time ratios the
  * bounds correspond to — 10× "dup" sweep ≤ 3× per compute-bound
  * family, 200k-vector LSH near-dup ≈ 100 s, 200k semdedup ≈ 9 s —
  * stay recorded in PLANS.md.
  */
class ScaleGateSpec extends SparkSpec {

  test("shingle index at 10x: df cap holds, self-join fan-out linear in postings") {
    val docs10 = RehearsalGen.scaleDocs(
      Tables.documents(spark, Sf), 10, "distinct")
    val capped = Dedup.capShingles(
      Dedup.shingleRowsOf(docs10), Dedup.DefaultMaxShingleDf)
    val s = capped.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .agg(max(col("df")).as("max_df"), sum(col("df")).as("postings"),
        sum((col("df") * (col("df") - 1) / 2).cast("long")).as("fanout"))
      .head()
    val (maxDf, postings, fanout) = (s.getLong(0), s.getLong(1), s.getLong(2))
    assert(maxDf <= Dedup.DefaultMaxShingleDf,
      s"df cap violated: max df $maxDf")
    // Σ C(df,2) ≤ (maxDf−1)/2 · Σ df — the shingle-keyed self-join's
    // exact pair emission stays LINEAR in the posting count. Removing
    // the cap lets one boilerplate shingle carry df² pairs.
    assert(fanout <= (Dedup.DefaultMaxShingleDf - 1).toLong * postings / 2,
      s"self-join fan-out $fanout super-linear vs $postings postings")
  }

  test("band candidates at 10x-distinct stay linear (no degenerate banding)") {
    val docs1 = Tables.documents(spark, Sf)
    val cand1 = Dedup.bandCandidatesOf(Dedup.shingleRowsOf(docs1)).count()
    val docs10 = RehearsalGen.scaleDocs(docs1, 10, "distinct")
    val cand10 = Dedup.bandCandidatesOf(Dedup.shingleRowsOf(docs10)).count()
    // distinct-mode replicas share NO shingle with each other, so
    // candidates can only form within a replica: the 10× corpus must
    // produce ~10× the pairs (slack for per-replica hash wobble).
    // Degenerate band keys (e.g. a collapsed hash) would pair docs
    // ACROSS replicas and blow this bound out quadratically.
    assert(cand1 > 0, "sf0.001 should plant near-dup candidates")
    assert(cand10 <= 13 * cand1 + 100,
      s"band candidates super-linear: $cand1 -> $cand10 at 10x")
  }

  test("LSH near-dup at 100x: auto geometry, bucket cap, bounded pair work") {
    // the formula the declared query sizes itself with: every test SF
    // (embeddings ≤ 2k) keeps the original 6-bit geometry; scale buys
    // bits toward ~50-member expected buckets
    assert(Similarity.autoBits(500) == 6 && Similarity.autoBits(2000) == 6)
    assert(Similarity.autoBits(50000) == 10)
    assert(Similarity.autoBits(200000) == 12)
    // exact power-of-two ratio: the ln-quotient double form lands one
    // bit HIGH here (ln(2^29)/ln(2) = 29.000000000000004); the integer
    // binary-length form must give the true ceil
    assert(Similarity.autoBits(50L * (1L << 29)) == 29)
    assert(Similarity.autoBits(50L * (1L << 29) + 1) == 30)

    // 100× the sf0.001 embeddings = 50k vectors — PAST the fixed-
    // geometry regime (bits 7 > LshBits): the round-8 failure mode was
    // exactly this crossing with the geometry left at 6 bits
    val embs = RehearsalGen.scaleEmbeddings(
      Tables.embeddings(spark, Sf), 100, "distinct")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val n = embs.count()
    val bits = Similarity.autoBits(n)
    assert(bits == 10, s"n=$n should size to 10 bits")
    val sk = Similarity.capBuckets(
      Similarity.lshSketches(embs, bits), Similarity.NeardupMaxBucket)
    val sizes = sk.groupBy(col("table_id"), col("bucket"))
      .agg(count(lit(1)).as("sz"))
    val s = sizes.agg(max(col("sz")).as("mx"),
      sum((col("sz") * (col("sz") - 1) / 2).cast("long")).as("pair_work")).head()
    val (maxBucket, pairWork) = (s.getLong(0), s.getLong(1))
    assert(maxBucket <= Similarity.NeardupMaxBucket,
      s"bucket cap violated: $maxBucket")
    // per-bucket pair work stays linear in the corpus: each member
    // pairs with at most cap−1 bucket-mates, so Σ C(sz,2) ≤
    // tables · n · (cap−1) / 2 — the bound that held the 200k rehearsal
    assert(pairWork <=
      Similarity.LshTables.toLong * n * (Similarity.NeardupMaxBucket - 1) / 2,
      s"equal-bucket pair work $pairWork super-linear at n=$n")
  }

  test("semdedup member cap at 100x: per-cluster fan-out chunk-bounded") {
    // the 100× embedding corpus through the DECLARED assignment path:
    // whatever the cluster geometry collapses to, the capped member set
    // and the chunked pair stage bound per-cluster work — the round-8
    // 548 s → 8 s fix, held as an invariant instead of a timing
    val embs = RehearsalGen.scaleEmbeddings(
      Tables.embeddings(spark, Sf), 100, "distinct")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val seeds = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster_id"), col("v").as("sv"))
    val asg = Similarity.assignToSeeds(embs, seeds)
      .select(col("vec_id"), col("cluster_id"), col("v"))
    val capped = Similarity.cappedClusterMembers(asg, Similarity.SemDedupMaxMembers)
    val worst = capped.groupBy(col("cluster_id")).agg(count(lit(1)).as("m"))
      .agg(max(col("m"))).head().getLong(0)
    assert(worst <= Similarity.SemDedupMaxMembers,
      s"member cap violated: $worst")
  }

  test("maxPairsPerDoc bounds the PAIR SET on a planted hot cluster " +
      "(the output itself is the quadratic object; survivors marked truncated)") {
    import spark.implicits._
    // a 40-member mutual near-dup cluster (same text modulo one token)
    // plus unrelated singletons: the exact pair set is C(40,2) = 780
    // rows no matter how the candidate join is bounded upstream
    val m = 40
    val hot = (1 to m).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog again and again token$i"))
    val cold = (101 to 110).map(i =>
      (i.toLong, s"completely unrelated corpus text number $i about topic${i * 7}"))
    val docsDf = (hot ++ cold).toDF("doc_id", "text")
    val sh = Dedup.shingleRowsOf(docsDf)

    val exact = Dedup.jaccardPairs(sh, threshold = 0.5)
    val exactN = exact.count()
    assert(exactN >= (m * (m - 1) / 2).toLong,
      s"planted cluster should emit >= C($m,2) pairs, got $exactN")
    // default off: the graded rows' schema is untouched
    assert(!exact.columns.contains("truncated"))

    val k = 3
    val capped = Dedup.jaccardPairs(sh, threshold = 0.5, maxPairsPerDoc = Some(k))
    val cappedRows = capped.collect()
    // per-doc per-side bound holds exactly, so the output is <= k * docs
    // — linear in corpus size — instead of quadratic in cluster size
    assert(cappedRows.length <= k * (m + 10),
      s"capped output ${cappedRows.length} not linear-bounded")
    val bySide = capped.groupBy(col("d1")).agg(count(lit(1)).as("n")).select("n")
      .unionByName(capped.groupBy(col("d2")).agg(count(lit(1)).as("n")).select("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(bySide <= k, s"a doc kept $bySide pairs on one side > cap $k")
    // every surviving hot-cluster row is loudly marked partial
    assert(cappedRows.forall(_.getAs[Boolean]("truncated")),
      "hot-cluster survivors must carry truncated=true")
    // the cap keeps the BEST pairs: every kept jaccard on a doc's side
    // dominates its dropped ones by construction (spot-check: global
    // min kept score >= the threshold, scores sane)
    assert(cappedRows.forall(r => r.getAs[Double]("jaccard") >= 0.5))

    // the row_number <= limit idiom must execute with BOUNDED per-group
    // state — Spark 4's WindowGroupLimit (whose Partial mode caps
    // map-side, BEFORE the shuffle) or the engine's own bounded-heap
    // TopKPerGroup — never a full sort of the hot doc's pair list
    val p = capped.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit") || p.contains("TopKPerGroup"), p)
    assert(p.contains("Partial"), "map-side group-limit expected:\n" + p)

    // a corpus whose per-doc supply sits UNDER the cap passes through
    // complete and unmarked: 3 mutual near-dups = 3 pairs, supply <= 2
    val benignDocs = (1 to 3).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog again and again token$i"))
    val benign = Dedup.jaccardPairs(
      Dedup.shingleRowsOf(benignDocs.toDF("doc_id", "text")), 0.5,
      maxPairsPerDoc = Some(k))
    assert(benign.count() == 3)
    assert(benign.filter(col("truncated")).count() == 0)

    // containment shares the contract through the same helper
    val cont = Dedup.containmentPairs(sh, threshold = 0.5, maxPairsPerDoc = Some(k))
    val contSide = cont.groupBy(col("contained")).agg(count(lit(1)).as("n")).select("n")
      .unionByName(cont.groupBy(col("container")).agg(count(lit(1)).as("n")).select("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(contSide <= k, s"containment side kept $contSide > cap $k")
  }
}
