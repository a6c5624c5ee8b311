package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Q24 Gram-matrix accumulation as a `TypedImperativeAggregate` — the
  * d(d+1)/2 upper-triangle int64 cell sums of Σ_rows round(vᵢ·vⱼ·2²⁴) in
  * ONE buffer per task (SURVEY.md §7.3 tier (b): a native aggregate beats
  * the explode formulation).
  *
  * Why it exists: the first-cut `emb_gram_matrix`/`emb_pca_power_step`
  * exploded d(d+1)/2 structs PER ROW into a hash aggregate — at d = 64
  * that is 2,080 allocated rows per input row (4.2 M at sf0.1, row-count
  * × 2,080 anywhere), all to feed a fixed-size 2,080-group aggregation.
  * This operator folds each row in a tight two-index loop over a single
  * long[2080] buffer: zero explode rows, map-side partials are ONE
  * 16 KB buffer per task, merges are element-wise adds, and the shuffle
  * carries d²-scale bytes per task regardless of corpus size.
  *
  * EXACTNESS CONTRACT (the [[graft.ext.Similarity]] Q24 argument): each
  * cell term is one IEEE double multiply `v(i)*v(j)*2²⁴` rounded
  * HALF-AWAY-FROM-ZERO to int64 — bit-identical to both Spark's SQL
  * `round()` (BigDecimal HALF_UP over the double's EXACT decimal
  * expansion) and DuckDB's `round()` (half-away-from-zero on the binary
  * value), which is what the unchanged oracle SQL replays — and cell
  * sums are int64 adds, order-free under any partitioning/merge order.
  * The rounding is implemented as exact floor/ceil + fractional-part
  * compare, NOT `floor(x + 0.5)`: the add itself rounds at the
  * representability boundary (x = 0.5 − 2⁻⁵⁴ has x + 0.5 == 1.0), which
  * would round UP a value strictly below one-half and break the
  * cross-engine hash; `x − floor(x)` is exact for |x| < 2⁵², which
  * bounds our Q24 domain (|q| ≤ 2³⁰). GramAggregateSpec pins equality
  * with the explode formulation on real embeddings plus the
  * negative-half and representability-tie edges.
  *
  * Ragged rows follow the EXPLODE FORMULATION's semantics (and
  * DuckDB's, where an out-of-range list index yields NULL): a vector
  * shorter than `dims` contributes the cells both of whose indexes are
  * in range; elements beyond `dims` are ignored; null elements
  * contribute nothing to their cells; a null vector contributes
  * nothing.
  *
  * A cell that received NO contributions at all (every vector null,
  * empty, or too short/null at that dim) evals to NULL, not 0 — SQL's
  * `SUM` over an empty term set is NULL, and the explode formulation /
  * DuckDB oracle both answer NULL there. The buffer carries a parallel
  * per-cell contribution count to tell "summed to zero" apart from
  * "never touched".
  */
case class GramAggregate(
    child: Expression,
    dims: Int,
    fpScale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // ONE home for the argument contract (the SQL builder and the Scala
  // gram_acc entry point both construct this class): past d = 2048 the
  // 16·d(d+1)/2-byte buffer exceeds 33 MB per task (and d ≥ 65536
  // overflows `cells` into a NEGATIVE array size deep inside a task);
  // a non-positive fpScale would silently zero every Q-sum
  require(dims >= 1 && dims <= 2048,
    s"gram_acc dims must be in [1, 2048] (buffer is 16*d*(d+1)/2 bytes), got $dims")
  require(fpScale > 0, s"gram_acc fpScale must be positive, got $fpScale")

  private val cells = dims * (dims + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // strict array<double> (nullability-agnostic): an array<float>/<int>
  // argument must fail analysis — UnsafeArrayData.getDouble would
  // reinterpret the raw bytes and silently produce garbage sums
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_acc requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "gram_acc"

  // layout: [0, cells) = Q-sums; [cells, 2·cells) = contribution counts
  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * cells)

  /** round-half-away-from-zero of a double into long — the shared
    * semantics of Spark SQL round() and DuckDB round(). Exact
    * floor/ceil + fractional compare (see class doc: `floor(x + 0.5)`
    * mis-rounds at the representability boundary). */
  @inline private def roundAway(x: Double): Long =
    if (x >= 0) {
      val f = math.floor(x)
      if (x - f >= 0.5d) f.toLong + 1L else f.toLong
    } else {
      val c = math.ceil(x)
      if (c - x >= 0.5d) c.toLong - 1L else c.toLong
    }

  // per-thread scratch (values + null mask) so the hot per-row loop
  // allocates nothing; one Expression instance serves one task thread,
  // but ThreadLocal keeps it safe if ever shared (the HllAggregate md5
  // pattern)
  @transient private lazy val scratch =
    new ThreadLocal[(Array[Double], Array[Boolean])] {
      override def initialValue() = (new Array[Double](dims), new Array[Boolean](dims))
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(arr.numElements(), dims)
      val (d, nul) = scratch.get()
      var i = 0
      while (i < n) {
        nul(i) = arr.isNullAt(i)
        d(i) = if (nul(i)) 0d else arr.getDouble(i)
        i += 1
      }
      i = 0
      while (i < n) {
        if (!nul(i)) {
          // packed row-major triangle index of (i, i): i*dims − i(i−1)/2
          var k = i * dims - i * (i - 1) / 2
          var j = i
          while (j < n) {
            if (!nul(j)) {
              buf(k) += roundAway(d(i) * d(j) * fpScale.toDouble)
              buf(cells + k) += 1L
            }
            k += 1; j += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 2 * cells) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](cells)
    var i = 0
    while (i < cells) {
      out(i) = if (buf(cells + i) == 0L) null else java.lang.Long.valueOf(buf(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 * cells * 8)
    var i = 0
    while (i < 2 * cells) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](2 * cells)
    var i = 0
    while (i < 2 * cells) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object GramAggregate {
  /** `gram_acc(vec, dims, fpScale)` as an aggregate Column over an
    * array<double> column; returns the d(d+1)/2 upper-triangle Q-sums in
    * row-major (i ≤ j) order. */
  def gram_acc(c: Column, dims: Int, fpScale: Long): Column =
    Bridge.column(
      GramAggregate(Bridge.expression(c), dims, fpScale).toAggregateExpression())

  /** Linear index of cell (i, j), i ≤ j, in the packed upper triangle. */
  def cellIndex(i: Int, j: Int, dims: Int): Int =
    i * dims - i * (i - 1) / 2 + (j - i)
}
