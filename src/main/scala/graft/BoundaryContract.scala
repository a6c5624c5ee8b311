package graft

import org.apache.spark.sql.types._

/** The driver-boundary type contract, enforced at Verify-dump time.
  *
  * The driver's comparator reads each query's parquet with pandas,
  * sorts columns by name, and HASHES cell values — so the oracle
  * boundary admits scalar columns only:
  *
  *  - Array/Map/Struct cells arrive as `numpy.ndarray`/dict and crash
  *    or defeat the hash (round-14 red `ingest_fact_program_events`);
  *  - Spark DECIMAL lands in pandas as `object` (`decimal.Decimal`)
  *    while DuckDB's lands as float64 — equal values, different bytes,
  *    hash red (round-14 red `ingest_fact_token_transfers`).
  *
  * Complex values stay first-class INSIDE queries; at the boundary,
  * serialize arrays (`array_join`) and cast decimals/sums to
  * DOUBLE/BIGINT on BOTH engines. `tools/check_oracle.py` enforces the
  * same contract on the DuckDB side.
  */
object BoundaryContract {

  /** The boundary-admissible scalar types (explicit whitelist — a new
    * exotic type defaults to REFUSED until proven to hash). */
  private val Scalar: Set[DataType] = Set(
    StringType, BooleanType, BinaryType,
    ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType,
    DateType, TimestampType, TimestampNTZType)

  /** Columns of `schema` that violate the scalar-only boundary. */
  def violations(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !Scalar.contains(f.dataType) =>
        s"${f.name}: ${f.dataType.simpleString}"
    }

  /** Fails loudly when an oracle-paired query output would red at the
    * driver's comparator for type reasons alone. */
  def assertScalar(name: String, schema: StructType): Unit = {
    val v = violations(schema)
    require(v.isEmpty,
      s"oracle-paired query '$name' puts non-scalar/decimal columns on " +
        s"the driver boundary: ${v.mkString(", ")} — serialize arrays " +
        "(array_join) and cast decimals to DOUBLE/BIGINT on both sides")
  }
}
