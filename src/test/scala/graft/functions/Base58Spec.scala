package graft.functions

import graft.SparkSpec
import graft.functions.Base58Expressions.{base58_decode, base58_encode}
import org.apache.spark.sql.functions._

/** F17: golden vectors (the public base58 test set + a Solana program
  * id), round-trip property, and null-on-invalid semantics. */
class Base58Spec extends SparkSpec {

  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("public golden vectors encode correctly") {
    val vectors = Seq(
      "" -> "",
      "61" -> "2g",
      "626262" -> "a3gV",
      "636363" -> "aPEr",
      "73696d706c792061206c6f6e6720737472696e67" -> "2cFupjhnEsSn59qHXstmK2ffpLv2",
      "00eb15231dfceb60925886b67d065299925915aeb172c06647" -> "1NS17iag9jJgTHD1VXjvLCEnZuQ3rJDE9L",
      "516b6fcd0f" -> "ABnLTmg",
      "000000287fb4cd" -> "111233QC4")
    val got = vectors.map(_._1).map(hex).toDF("b")
      .select(base58_encode(col("b"))).as[String].collect().toSeq
    assert(got == vectors.map(_._2))
  }

  test("Solana token program id round-trips through 32 raw bytes") {
    val addr = "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"
    val decoded = Seq(addr).toDF("s")
      .select(base58_decode(col("s"))).as[Array[Byte]].head()
    assert(decoded.length == 32, s"Solana pubkeys are 32 bytes, got ${decoded.length}")
    val back = Seq(decoded).toDF("b")
      .select(base58_encode(col("b"))).as[String].head()
    assert(back == addr)
  }

  test("decode round-trips random byte strings incl. leading zeros") {
    val rnd = new scala.util.Random(7)
    val inputs = (1 to 100).map { _ =>
      val n = rnd.nextInt(40)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (n > 2 && rnd.nextBoolean()) { b(0) = 0; b(1) = 0 } // leading zeros
      b
    }
    val out = inputs.toDF("b")
      .select(base58_decode(base58_encode(col("b")))).as[Array[Byte]].collect()
    inputs.zip(out).foreach { case (in, got) =>
      assert(java.util.Arrays.equals(in, got))
    }
  }

  test("invalid characters decode to NULL, not an exception") {
    // 0, O, I, l are outside the alphabet
    val got = Seq("0invalid", "O0O", "hello world", "ok2g").toDF("s")
      .select(base58_decode(col("s")).isNull).as[Boolean].collect().toSeq
    assert(got == Seq(true, true, true, false))
  }

  test("registered as SQL functions") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT base58_encode(base58_decode('ABnLTmg')) AS s").as[String].head()
    assert(r == "ABnLTmg")
  }
}
