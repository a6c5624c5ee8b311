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

  test("gram_acc works as a SQL aggregate with foldable dims/scale") {
    GraftExtensions.register(spark)
    // two rows of [1, 2]: cells (0,0)=2·2^24, (0,1)=2·2·2^24, (1,1)=2·4·2^24
    val arr = spark.sql(
      """SELECT gram_acc(v, 2, 16777216L) AS g FROM (
        |  SELECT array(1.0d, 2.0d) AS v UNION ALL SELECT array(1.0d, 2.0d))"""
        .stripMargin).collect()(0).getSeq[Long](0)
    assert(arr == Seq(2L << 24, 4L << 24, 8L << 24), arr)
  }
}
