package graft.ext

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Planted-input invariants of the corpus-quality rules that the SQL
  * oracle can't state: the repetition signals compute exactly the
  * hand-countable values, the boilerplate df floor splits hot from rare
  * grams, and the template flag fires only above the 80% line. */
class QualityFiltersSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("repetition signals match hand-counted grams on planted docs") {
    import spark.implicits._
    val diverse = (1 to 25).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, Seq.fill(10)("buy now").mkString(" ")), // 20 tok, 2 uniq
      (2L, diverse),                               // 25 distinct tokens
      (3L, "tiny")                                 // 1 token -> no 2-gram
    ).toDF("doc_id", "text")
    val m = QualityFilters.repetitionSignals(d)
      .select("doc_id", "n_tok", "n_uniq", "n_grams", "top_cnt", "rep_flag")
      .collect().map(r => r.getLong(0) -> r).toMap

    // doc 1: 19 2-gram slots; "buy now" x10 tops; both rules fire
    assert(m(1L).getLong(1) == 20 && m(1L).getLong(2) == 2)
    assert(m(1L).getLong(3) == 19 && m(1L).getLong(4) == 10)
    assert(m(1L).getBoolean(5))
    // doc 2: 24 slots, every gram once -> 1*20 <= 24, no dup tokens
    assert(m(2L).getLong(3) == 24 && m(2L).getLong(4) == 1)
    assert(!m(2L).getBoolean(5))
    // doc 3: no grams at all -> null signals; the flag is three-valued
    // NULL (rule not applicable), which count(when(flag,1)) skips
    assert(m(3L).isNullAt(3) && m(3L).isNullAt(5))
  }

  test("boilerplate df floor: shared grams are hot, unique ones are not") {
    import spark.implicits._
    // nDocs=40 -> hot iff df*20 >= 40, i.e. a gram in >= 2 docs
    val d = Seq(
      (1L, "click here"),                          // 1 gram, shared -> 100% hot
      (2L, "click here and much more unique text following after that"),
      (3L, "entirely different words nothing shared with anyone else")
    ).toDF("doc_id", "text")
    val nDocsDf = spark.range(1).select(lit(40L).as("n_docs"))
    val m = QualityFilters.boilerplateSignals(d, nDocsDf)
      .select("doc_id", "n_grams", "n_hot", "template_doc")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 1 && m(1L).getLong(2) == 1)
    assert(m(1L).getBoolean(3), "single-hot-gram doc is 100% boilerplate")
    assert(m(2L).getLong(2) == 1 && !m(2L).getBoolean(3),
      "one hot gram out of many stays under the 80% line")
    assert(m(3L).getLong(2) == 0 && !m(3L).getBoolean(3))
  }

  test("quality queries are deterministic across runs") {
    for (q <- Seq("text_repetition_stats", "text_boilerplate_share")) {
      val a = run(q).collect().toSeq
      assert(a == run(q).collect().toSeq, s"$q must be run-stable")
      assert(a.nonEmpty)
    }
  }

  test("hash split partitions the corpus exactly (nothing lost or doubled)") {
    val rows = run("prep_split_shuffle").collect()
    val total = rows.map(_.getLong(2)).sum
    val nDocs = graft.Tables.documents(spark, Sf).count()
    assert(total == nDocs, s"split counts must sum to the corpus: $total vs $nDocs")
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length == rows.length)
    val bySplit = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    // md5 keys are uniform; 500 docs keep 80/10/10 within wide bounds
    assert(math.abs(bySplit("train").toDouble / nDocs - 0.8) < 0.1, bySplit.toMap)
  }

  test("int8 quantization error is bounded by one code step (1/64)") {
    run("emb_quantize_int8").collect().foreach { r =>
      val (maxE, meanE) = (r.getDouble(2), r.getDouble(3))
      // the raw error is strictly under 1/64; round(.,6) may land on it
      assert(maxE >= 0 && maxE <= 1.0 / 64.0, s"floor-code error within one Q1.6 step: $r")
      assert(meanE >= 0 && meanE <= maxE + 1e-9)
      assert(r.getLong(4) >= 1)
    }
  }

  test("kNN classify votes 5 neighbors per held-out query") {
    val rows = run("sim_knn_classify").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 25 == 0, "query side is the vec_id % 25 slice")
      val votes = r.getLong(3)
      assert(votes >= 1 && votes <= 5, s"majority vote among 5 neighbors: $r")
    }
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "argmax tie-break yields exactly one prediction per query")
  }
}
