package graft.ext

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Invariants of the training-prep operators that the SQL oracle can't
  * state: decon catches a planted leak, sampling is deterministic and
  * rate-shaped, packing partitions the corpus exactly. */
class TrainPrepSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

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
}
