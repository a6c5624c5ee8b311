package graft.plans

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("engine functions callable from SQL text after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vector_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |       vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 11.0)
  }

  test("hll_distinct works as a SQL aggregate") {
    GraftExtensions.register(spark)
    spark.range(0, 10000).createOrReplaceTempView("ids")
    val est = spark.sql("SELECT hll_distinct(id % 500) FROM ids").collect()(0).getLong(0)
    assert(math.abs(est - 500L) <= 15L, s"got $est") // ~1% linear-counting error
  }
}
