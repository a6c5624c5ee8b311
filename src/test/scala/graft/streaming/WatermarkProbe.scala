package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the stream_windowed_volume late-drop path: rebuilds
  * the exact staging at a given SF and prints, per micro-batch, the event
  * time stats, the watermark the batch ran with, and the state operator's
  * numRowsDroppedByWatermark. Run:
  * sbt 'Test/runMain graft.streaming.WatermarkProbe /root/testdata/sf0.001'
  */
object WatermarkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val drop = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
        println(s"[wmprobe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"eventTime=${p.eventTime} droppedByWatermark=$drop")
      }
    })
    val df = graft.SparkEntry.queries("stream_windowed_volume")(spark, dir)
    val n = df.count()
    println(s"[wmprobe] result rows=$n")
    spark.stop()
  }
}
