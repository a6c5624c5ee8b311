package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
  * `round()` (BigDecimal HALF_UP on doubles, away-from-zero for
  * negatives) and DuckDB's `round()`, which is what the unchanged oracle
  * SQL replays — and cell sums are int64 adds, order-free under any
  * partitioning/merge order. GramAggregateSpec pins equality with the
  * explode formulation on real embeddings plus the negative-half
  * rounding edge.
  *
  * Rows whose vector is null or not exactly `dims` long are skipped
  * (same semantics as the explode form, which indexes 0..dims-1).
  */
case class GramAggregate(
    child: Expression,
    dims: Int,
    fpScale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val cells = dims * (dims + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_acc"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  /** round-half-away-from-zero of a double into long — the shared
    * semantics of Spark SQL round() and DuckDB round(). */
  @inline private def roundAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5d).toLong else math.ceil(x - 0.5d).toLong

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() == dims) {
        val d = new Array[Double](dims)
        var i = 0
        while (i < dims) { d(i) = arr.getDouble(i); i += 1 }
        var k = 0
        i = 0
        while (i < dims) {
          var j = i
          while (j < dims) {
            buf(k) += roundAway(d(i) * d(j) * fpScale.toDouble)
            k += 1; j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(cells * 8)
    var i = 0
    while (i < cells) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](cells)
    var i = 0
    while (i < cells) { buf(i) = bb.getLong(); i += 1 }
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
