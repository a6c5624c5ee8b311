package graft.functions

import graft.SparkSpec
import graft.functions.VectorExpressions._
import org.apache.spark.sql.functions._

/** Native vector expressions: value parity with the HOF formulation
  * (same fold order), codegen vs interpreted agreement, null handling,
  * type checking. */
class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.5, -0.5, 0.0), Array(0.5, -0.5, 0.0)),
    (3L, Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))).toDF("id", "a", "b")

  test("vector_dot matches the sequential HOF fold exactly") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(vector_dot(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
  }

  test("vector_cosine: identical=1, orthogonal=0, matches composed formula") {
    val rows = df.select(col("id"), vector_cosine(col("a"), col("b"))).as[(Long, Double)]
      .collect().toMap
    assert(math.abs(rows(2L) - 1.0) < 1e-15)
    assert(rows(3L) == 0.0)
    val composed = df.filter(col("id") === 1)
      .select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, v) => s + v) /
          (sqrt(aggregate(zip_with(col("a"), col("a"), (x, y) => x * y), lit(0.0), (s, v) => s + v)) *
           sqrt(aggregate(zip_with(col("b"), col("b"), (x, y) => x * y), lit(0.0), (s, v) => s + v))))
      .as[Double].head()
    assert(rows(1L) == composed)
  }

  test("interpreted eval agrees with codegen") {
    // force the interpreted path through the expression's nullSafeEval
    val e = VectorExpressions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0, 2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(4.0, 5.0, 6.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    val viaPlan = df.filter(col("id") === 1)
      .select(vector_cosine(col("a"), col("b"))).as[Double].head()
    assert(interpreted == viaPlan)
  }

  test("nulls propagate, mismatched types rejected") {
    val withNull = Seq((Array(1.0), Option.empty[Array[Double]]))
      .toDF("a", "b")
    val r = withNull.select(vector_dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
    intercept[Exception] {
      df.select(vector_dot(col("id"), col("a"))).collect()
    }
  }

  test("NULL elements and ragged lengths yield NULL, matching the HOF twin") {
    // zip_with pads the shorter side with NULL and the fold propagates
    // it — the native expressions must agree (getDouble on a null slot
    // would instead read 0.0 and produce a silently-finite wrong answer)
    val dirty = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (3L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)))
      .toDF("id", "a", "b")
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val rows = dirty
      .select(col("id"), vector_dot(col("a"), col("b")).as("nat"),
        hofDot.as("hof"), vector_cosine(col("a"), col("b")).as("cos"))
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(rows(1L) == ((true, true, true)))   // null element
    assert(rows(2L) == ((true, true, true)))   // ragged lengths
    assert(rows(3L) == ((false, false, false))) // clean row unaffected
  }

  test("aggregate argument contracts fail loudly at construction") {
    intercept[IllegalArgumentException] {
      HllAggregate(org.apache.spark.sql.catalyst.expressions.Literal(1L), precision = 31)
    }
    intercept[IllegalArgumentException] {
      HllAggregate(org.apache.spark.sql.catalyst.expressions.Literal(1L), precision = 3)
    }
    intercept[IllegalArgumentException] {
      GramAggregate(org.apache.spark.sql.catalyst.expressions.Literal(1L),
        dims = 65536, fpScale = 1L << 24) // cells would overflow Int
    }
    intercept[IllegalArgumentException] {
      GramAggregate(org.apache.spark.sql.catalyst.expressions.Literal(1L),
        dims = 8, fpScale = 0L)
    }
  }
}
