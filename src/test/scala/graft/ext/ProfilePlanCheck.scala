package graft.ext

import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed sim_neardup_lsh plan to confirm the
  * masked-key self-join reuses the sketch exchange (Test scope).
  * Run: sbt 'Test/runMain graft.ext.ProfilePlanCheck /root/testdata/sf0.01'
  */
object ProfilePlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("sim_neardup_lsh")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println(s"[plancheck] ReusedExchange count: ${"ReusedExchange".r.findAllIn(p).length}")
    println(s"[plancheck] parquet scans: ${"Scan parquet".r.findAllIn(p).length}")
    spark.stop()
  }
}
