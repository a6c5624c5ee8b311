package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The driver-boundary type contract (see [[BoundaryContract]]):
  * Verify refuses to dump an oracle-paired output whose schema would
  * red at the driver's pandas hash for type reasons alone — and this
  * spec asserts the SAME contract over the whole declared surface at
  * ASSEMBLY time, so a violating query fails `sbt test` even in a
  * session that never runs Verify. */
class BoundaryContractSpec extends SparkSpec {

  test("planted violators are red: array, map, struct, decimal") {
    val arr = StructType(Seq(StructField("xs", ArrayType(StringType))))
    val map = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    val str = StructType(Seq(
      StructField("s", StructType(Seq(StructField("a", LongType))))))
    val dec = StructType(Seq(StructField("total", DecimalType(38, 9))))
    for (schema <- Seq(arr, map, str, dec)) {
      val e = intercept[IllegalArgumentException] {
        BoundaryContract.assertScalar("planted", schema)
      }
      assert(e.getMessage.contains("planted"))
      assert(e.getMessage.contains("DOUBLE/BIGINT"))
    }
    // the violation names the offending column, not just the query
    assert(BoundaryContract.violations(dec) == Seq("total: decimal(38,9)"))
  }

  test("scalar boundary columns are green") {
    val ok = StructType(Seq(
      StructField("name", StringType),
      StructField("n", LongType),
      StructField("i", IntegerType),
      StructField("rate", DoubleType),
      StructField("flag", BooleanType),
      StructField("ts", TimestampType),
      StructField("d", DateType),
      StructField("raw", BinaryType)))
    BoundaryContract.assertScalar("ok", ok)
    assert(BoundaryContract.violations(ok).isEmpty)
  }

  test("every oracle-paired query name has a queries entry (gate reaches all)") {
    val q = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(q)
    assert(missing.isEmpty, s"oracleSql without queries impl: $missing")
  }

  /** Oracle-paired queries whose BUILT plan (on the sf0.001 fixture)
    * violates the scalar boundary — or fails to build at all, which is
    * a harder red at the driver's gate and must fail here too. */
  private def violatorsOf(
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      oraclePaired: Set[String]): Seq[String] =
    queries.flatMap { case (name, fn) =>
      if (!oraclePaired.contains(name)) None
      else scala.util.Try(
          BoundaryContract.assertScalar(name, fn(spark, Sf).schema)) match {
        case scala.util.Failure(e) =>
          Some(s"$name: ${String.valueOf(e.getMessage).take(160)}")
        case _ => None
      }
    }

  test("assembly-time gate: the WHOLE declared surface honors the " +
      "scalar boundary on sf0.001 (a violator reds sbt test, not just Verify)") {
    val bad = violatorsOf(SparkEntry.orderedQueries, SparkEntry.oracleSql.keySet)
    assert(bad.isEmpty, s"${bad.size} boundary violations:\n${bad.mkString("\n")}")
  }

  test("the assembly-time gate actually fires: a planted decimal query reds it") {
    import spark.implicits._
    val planted: (SparkSession, String) => DataFrame =
      (s, _) => Seq(BigDecimal("1.5")).toDF("total")
    val bad = violatorsOf(Seq("planted_decimal" -> planted), Set("planted_decimal"))
    assert(bad.size == 1 && bad.head.startsWith("planted_decimal:"), bad)
    // and a throwing query reads as a violation, never a silent skip
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => sys.error("fixture missing")
    assert(violatorsOf(Seq("planted_boom" -> boom), Set("planted_boom"))
      .exists(_.startsWith("planted_boom:")))
  }
}
