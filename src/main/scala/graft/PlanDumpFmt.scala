package graft

/** Dev tool: write each named query's `.explain("formatted")` output
  * (the pre-execution plan with PushedFilters/ReadSchema per scan) plus
  * the AQE-final executed plan to `<outDir>/<name>.txt` — the committed
  * plan evidence for optimization rounds (plans/r16/...).
  *
  * Usage: runMain graft.PlanDumpFmt <sfDir> <outDir> [queryName,...]
  */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpFmt <sfDir> <outDir> [names]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val names =
      if (args.length > 2) args(2).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = LocalSession.build("graft-plandump-fmt", logLevel = "ERROR")
    names.foreach { n =>
      val sb = new StringBuilder
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        sb ++= s"===== $n : explain(formatted) =====\n"
        sb ++= df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // materialize df's OWN QueryExecution so AQE finalizes join
        // strategies, then append the final plan (same rationale as
        // PlanDump: a noop-sink write would execute a separate
        // QueryExecution and leave this one pre-AQE)
        df.collect()
        sb ++= s"\n===== $n : AQE-final executed plan =====\n"
        sb ++= df.queryExecution.executedPlan.toString
      } catch { case e: Throwable =>
        sb ++= s"\nFAILED: ${e.getClass.getName}: ${e.getMessage}\n"
      }
      java.nio.file.Files.writeString(outDir.resolve(s"$n.txt"), sb.toString)
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      System.err.println(s"[plandump] wrote $n")
    }
    spark.stop()
  }
}
