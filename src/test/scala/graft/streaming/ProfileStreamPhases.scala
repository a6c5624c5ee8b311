package graft.streaming

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: run one declared streaming query and print every Spark
  * job's wall time + call site, so the harness phases (staging writes,
  * micro-batches, result write) can be attributed. Gaps between jobs
  * are driver-side work (planning, commit protocol, checkpoint I/O).
  * Run: sbt 'Test/runMain graft.streaming.ProfileStreamPhases /root/testdata/sf0.1 stream_cdc_snapshot'
  */
object ProfileStreamPhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("stream_cdc_snapshot")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class J(id: Int, t0: Long, var t1: Long = 0L, site: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties.getProperty("callSite.short")).getOrElse("?")
        jobs.put(e.jobId, J(e.jobId, e.time, site = site)); order.add(e.jobId); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
      }
    })

    val runT0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - runT0) / 1e9
    Thread.sleep(500) // let listener drain
    println(f"[phases] $name total $wall%.2f s rows=$n")
    var prevEnd = 0L
    val it = order.iterator()
    var jobSum = 0L
    while (it.hasNext) {
      val j = jobs.get(it.next())
      val gap = if (prevEnd == 0) 0L else math.max(0L, j.t0 - prevEnd)
      val dur = j.t1 - j.t0
      jobSum += dur
      println(f"[phases] job ${j.id}%3d ${dur / 1000.0}%6.2fs gap ${gap / 1000.0}%6.2fs  ${j.site}")
      prevEnd = math.max(prevEnd, j.t1)
    }
    println(f"[phases] sum-of-jobs ${jobSum / 1000.0}%.2f s (rest = driver gaps)")
    spark.stop()
  }
}
