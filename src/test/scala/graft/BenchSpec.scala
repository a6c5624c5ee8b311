package graft

/** Bench integrity: a query that throws must surface as a sentinel, not
  * as a fast success — BENCH_r*.json is the only perf signal the build
  * loop has, and a regression-into-crash reading as a speedup corrupts
  * it silently. */
class BenchSpec extends SparkSpec {

  test("a throwing query records the -1.0 sentinel, a working one its time") {
    val fatal = new java.util.concurrent.atomic.AtomicBoolean
    val bad = Bench.execOne(spark, Sf, "boom",
      (_, _) => throw new RuntimeException("deliberate"), fatal)
    assert(bad == -1.0)
    assert(!fatal.get, "a NonFatal failure must not taint the round")
    val good = Bench.execOne(spark, Sf, "ok",
      (s, _) => s.range(3).toDF("n"), fatal)
    assert(good >= 0.0)
    assert(!fatal.get)
  }

  test("a fatal error taints the round but still records the sentinel") {
    val fatal = new java.util.concurrent.atomic.AtomicBoolean
    val bad = Bench.execOne(spark, Sf, "oom",
      (_, _) => throw new OutOfMemoryError("deliberate"), fatal)
    assert(bad == -1.0)
    assert(fatal.get, "OutOfMemoryError must set the fatal taint")
    val (longLine, trailer) = Bench.emitLines(Map("oom" -> bad), "/sf", fatal.get)
    assert(longLine.contains("\"fatal\":true"))
    assert(trailer.contains("\"fatal\":true"))
  }

  test("emitted lines: failures listed, excluded from total, trailer counts") {
    val (longLine, trailer) = Bench.emitLines(
      Map("q_ok" -> 1.5, "q_boom" -> -1.0, "q_also_ok" -> 0.5), "/sf")
    assert(longLine.contains("\"q_boom\":-1.0"))
    assert(longLine.contains("\"errors\":[\"q_boom\"]"))
    assert(longLine.contains("\"value\":2.0"))
    assert(trailer.contains("\"n_queries\":3") && trailer.contains("\"n_errors\":1"))
    assert(trailer.contains("\"value\":2.0"))
    // trailer is self-contained (short, truncation-proof): no query map
    assert(!trailer.contains("\"queries\":{"))
  }

  test("no failures: empty errors array, zero n_errors, untainted") {
    val (longLine, trailer) = Bench.emitLines(Map("a" -> 1.0), "/sf")
    assert(longLine.contains("\"errors\":[]"))
    assert(trailer.contains("\"n_errors\":0"))
    assert(longLine.contains("\"fatal\":false") && trailer.contains("\"fatal\":false"))
  }
}
