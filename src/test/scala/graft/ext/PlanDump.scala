package graft.ext
import org.apache.spark.sql.SparkSession
/** Dev-only: dump executed plans for PLANS.md capture. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }
    spark.stop()
  }
}
