package graft.ext

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B of Tables.widen on the token top-k shape. */
object ProfileWiden {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, dir).count() // warm

    def topk(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ab] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    for (round <- 1 to 3) {
      time(s"r$round plain")(topk(Tables.documents(spark, dir)).write.format("noop").mode("overwrite").save())
      time(s"r$round widened")(topk(Tables.widen(Tables.documents(spark, dir))).write.format("noop").mode("overwrite").save())
      time(s"r$round rdd-probe only") {
        Tables.documents(spark, dir).rdd.getNumPartitions: Unit
      }
      time(s"r$round repartition no probe")(topk(Tables.documents(spark, dir).repartition(32)).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
