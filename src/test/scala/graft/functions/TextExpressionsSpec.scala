package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** rolling_hash must be bit-equivalent to the HOF formulation it
  * replaces (aggregate over regexp_extract_all(text, '.')) — including
  * the Java-regex dot's skip set — or the text_fingerprint oracle would
  * silently drift. */
class TextExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def hofHash(texts: Seq[String]): Seq[Long] =
    texts.toDF("text").select(
      expr("aggregate(regexp_extract_all(text, '.', 0), 0L, " +
        "(h, c) -> pmod(h * 31 + ascii(c), 1000000007L))")).as[Long].collect().toSeq

  private def nativeHash(texts: Seq[String]): Seq[Long] =
    texts.toDF("text").select(
      TextExpressions.rolling_hash(col("text"))).as[Long].collect().toSeq

  test("golden + edge vectors match the HOF formulation") {
    val cases = Seq("", "a", "abc", "hello world", "line1\nline2",
      "crlf\r\n", "tab\tand space", "nelsep   end",
      "numbers 0123456789", "répétition café")  // 2-byte UTF-8
    assert(nativeHash(cases) == hofHash(cases))
    // deterministic golden value so the contract survives refactors
    assert(nativeHash(Seq("abc")).head ==
      (((('a'.toLong * 31 + 'b') % 1000000007L) * 31 + 'c') % 1000000007L))
  }

  test("randomized equivalence over printable strings with terminators") {
    val rnd = new scala.util.Random(42) // fixed seed: deterministic CI
    val alphabet = (' ' to '~') ++ Seq('\n', '\r', '\t') ++ ('à' to 'ö')
    val texts = (1 to 200).map { _ =>
      val n = rnd.nextInt(80)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    assert(nativeHash(texts) == hofHash(texts))
  }

  test("interpreted eval agrees with codegen path") {
    // force the interpreted path via direct expression eval
    val v = TextExpressions.rollingHashImpl(
      org.apache.spark.unsafe.types.UTF8String.fromString("graft\nengine"))
    assert(v == nativeHash(Seq("graft\nengine")).head)
  }

  test("simhash16 expression equals the explode/groupBy pipeline on real docs") {
    import org.apache.spark.sql.functions._
    val viaExpr = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), TextExpressions.simhash16(col("text")).as("simhash"))
      .filter(col("simhash").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPipeline = graft.SparkEntry.queries("dedup_simhash")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaPipeline)
  }

  test("simhash16: null for token-less input, stable for permuted tokens") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Seq("", "!!! ???", "alpha beta gamma", "gamma alpha beta")
      .toDF("text")
      .select(TextExpressions.simhash16(col("text")).as("s"))
      .collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    // simhash is bag-of-tokens: order must not matter
    assert(out(2).getLong(0) == out(3).getLong(0))
  }
}
