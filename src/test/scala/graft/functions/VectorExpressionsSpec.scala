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
}
