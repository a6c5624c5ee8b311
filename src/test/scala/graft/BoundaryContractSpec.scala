package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver-boundary type contract (see [[BoundaryContract]]):
  * Verify refuses to dump an oracle-paired output whose schema would
  * red at the driver's pandas hash for type reasons alone. */
class BoundaryContractSpec extends AnyFunSuite {

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
}
