package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a `TypedImperativeAggregate`
  * (SURVEY.md §7.3 / §2.10: the custom-aggregate tier for distincts whose
  * key set no longer fits a hash table — the buffer is a fixed 2^p-byte
  * register array regardless of cardinality, and merges are register-wise
  * max, so partial aggregation and AQE-coalesced shuffles work
  * unchanged).
  *
  * Standard HLL (public algorithm): register j = bit-rank of the hashed
  * value within bucket j; estimate = αm·m²/Σ2^(−M[j]) with
  * linear-counting correction at the low range. p=12 → 4096 B buffer,
  * ~1.6 % standard error. Spark's built-in `approx_count_distinct` is the
  * production choice; this exists to exercise and document the
  * TypedImperativeAggregate extension point with a self-contained
  * implementation.
  *
  * ORACLE-REPRODUCIBLE BY DESIGN: the hash is the repo's shared 60-bit
  * md5 prefix (`('0x'||substr(md5(x),1,15))::BIGINT` in DuckDB) over the
  * value's canonical decimal/text rendering, and the register sum is
  * EXACT INTEGER arithmetic (Σ 2^(wBits+1−r), every term an integer), so
  * the whole sketch — registers, estimator, linear counting — replays
  * bit-for-bit as SQL and the estimate is independent of partitioning,
  * merge order, and register visit order. A float Σ2^−r would need
  * p + wBits + 1 mantissa bits and silently round.
  */
case class HllAggregate(
    child: Expression,
    precision: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  // p ≥ 19 is a >512 KB buffer for no accuracy anyone needs; p ≤ 3 (and
  // anything negative/huge) breaks the register math — 1 << 31 is a
  // NEGATIVE buffer size and a 49..60 precision wraps the rank shifts
  // through Java's 6-bit shift masking into silently-wrong estimates
  require(precision >= 4 && precision <= 18,
    s"hll_distinct precision must be in [4, 18], got $precision")

  private val m = 1 << precision
  private val wBits = 60 - precision

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HllAggregate.hash60(v)
      val j = (h >>> wBits).toInt                     // high p bits → bucket
      val w = h & ((1L << wBits) - 1)                 // low wBits bits
      // rank = wBits+1 − bitlen(w); w == 0 → bitlen 0 → rank wBits+1
      val rank = wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > (buf(j) & 0xff)) buf(j) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllAggregate.mergeRegisters(a, b)

  override def eval(buf: Array[Byte]): Any =
    HllAggregate.estimate(buf, m, wBits)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** The SKETCH form of [[HllAggregate]]: identical registers, but eval
  * returns the raw register array as `binary` instead of the estimate —
  * the artifact a 100 TB warehouse actually stores. Re-aggregatable
  * rollups (daily reach → weekly → all-time) keep one m-byte sketch per
  * grain cell and NEVER rescan the fact table; [[HllUnionAggregate]] is
  * the merge that rolls them up. */
case class HllSketchAggregate(
    child: Expression,
    precision: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(precision >= 4 && precision <= 18,
    s"hll_sketch precision must be in [4, 18], got $precision")
  private val m = 1 << precision
  private val wBits = 60 - precision

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_sketch"
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HllAggregate.hash60(v)
      val j = (h >>> wBits).toInt
      val w = h & ((1L << wBits) - 1)
      val rank = wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > (buf(j) & 0xff)) buf(j) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllAggregate.mergeRegisters(a, b)

  // eval must COPY: the buffer is mutable aggregation state the
  // framework may keep reusing after the row is emitted
  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int): HllSketchAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Union-merge of stored [[HllSketchAggregate]] sketches (`binary`
  * register arrays) back into one estimate — register-wise max, the
  * associative/commutative op that makes HLL rollups exact re-
  * aggregations: union-of-daily-sketches ≡ one sketch over the union of
  * the days' rows, which is precisely what the differential oracle
  * states. A sketch of the wrong length (precision mismatch with this
  * aggregate's) fails LOUDLY — merging misaligned registers would
  * silently estimate garbage. */
case class HllUnionAggregate(
    child: Expression,
    precision: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(precision >= 4 && precision <= 18,
    s"hll_union_est precision must be in [4, 18], got $precision")
  private val m = 1 << precision
  private val wBits = 60 - precision

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_union_est"
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    child.eval(input) match {
      case null => buf
      case sk: Array[Byte] =>
        require(sk.length == m,
          s"hll_union_est(p=$precision) got a ${sk.length}-register sketch; " +
            s"expected $m — sketches and the union must use one precision")
        HllAggregate.mergeRegisters(buf, sk)
      case other => throw new IllegalArgumentException(
        s"hll_union_est expects binary hll_sketch values, got ${other.getClass}")
    }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllAggregate.mergeRegisters(a, b)

  override def eval(buf: Array[Byte]): Any =
    HllAggregate.estimate(buf, m, wBits)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int): HllUnionAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnionAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object HllAggregate {
  /** `hll_distinct(col)` as an aggregate Column. */
  def hll_distinct(c: Column, precision: Int = 12): Column =
    Bridge.column(HllAggregate(Bridge.expression(c), precision).toAggregateExpression())

  /** `hll_sketch(col)`: the binary register array for storage/rollup. */
  def hll_sketch(c: Column, precision: Int = 12): Column =
    Bridge.column(HllSketchAggregate(Bridge.expression(c), precision).toAggregateExpression())

  /** `hll_union_est(sketchCol)`: merge stored sketches → estimate. */
  def hll_union_est(c: Column, precision: Int = 12): Column =
    Bridge.column(HllUnionAggregate(Bridge.expression(c), precision).toAggregateExpression())

  /** 60-bit md5-prefix hash of the value's canonical rendering (decimal
    * for integers, raw bytes for strings) — the oracle-shared formula
    * ([[Md5Hash.prefix60]]). Lives here, next to [[mergeRegisters]] and
    * [[estimate]], so `hll_distinct`, `hll_sketch`, and the oracle SQL
    * can never drift on the hash. */
  private[functions] def hash60(v: Any): Long = Md5Hash.prefix60(v match {
    case s: UTF8String => s.getBytes
    case other => other.toString.getBytes("UTF-8")
  })

  /** Register-wise max into `a` (the shared HLL merge). */
  private[functions] def mergeRegisters(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  /** The shared HLL estimator over a register array: exact integer
    * register sum (every term 2^(wBits+1−r) is an integer — a float sum
    * would need p+wBits+1 mantissa bits), linear counting at the low
    * range. One implementation so the scalar aggregate, the sketch
    * rollup, and the oracle SQL can never disagree on the formula. */
  private[functions] def estimate(buf: Array[Byte], m: Int, wBits: Int): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var s = 0L; var zeros = 0; var i = 0
    while (i < m) {
      val r = buf(i) & 0xff
      s += 1L << (wBits + 1 - r)
      if (r == 0) zeros += 1
      i += 1
    }
    val scale = (1L << (wBits + 1)).toDouble
    val e = alpha * m * m * scale / s.toDouble
    val est =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else e
    math.round(est)
  }
}
