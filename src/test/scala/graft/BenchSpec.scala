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
    val lines = Bench.emitLines(Seq("oom" -> bad), "/sf", fatal.get)
    assert(lines.last.contains("\"fatal\":true"))
  }

  test("emitted lines: failures listed, excluded from total, trailer counts") {
    val lines = Bench.emitLines(
      Seq("q_ok" -> 1.5, "q_boom" -> -1.0, "q_also_ok" -> 0.5), "/sf")
    val (chunks, trailer) = (lines.init, lines.last)
    assert(chunks.exists(_.contains("\"q_boom\":-1.0")))
    assert(trailer.contains("\"errors\":[\"q_boom\"]"))
    assert(trailer.contains("\"n_queries\":3") && trailer.contains("\"n_errors\":1"))
    assert(trailer.contains("\"value\":2.0"))
    // trailer is self-contained (short, truncation-proof): no query map
    assert(!trailer.contains("\"queries\":{"))
  }

  test("no failures: empty errors array, zero n_errors, untainted") {
    val lines = Bench.emitLines(Seq("a" -> 1.0), "/sf")
    assert(lines.last.contains("\"errors\":[]"))
    assert(lines.last.contains("\"n_errors\":0"))
    assert(lines.last.contains("\"fatal\":false"))
  }

  test("per-query timings chunk at ChunkSize; every line stays tail-safe") {
    // 117-query scale: every name must appear in exactly one chunk line,
    // every line short enough that the driver's tail window keeps all
    val results = (1 to 117).map(i => f"q_$i%03d" -> (i / 100.0))
    val lines = Bench.emitLines(results, "/sf")
    val chunks = lines.init
    assert(chunks.size == (117 + Bench.ChunkSize - 1) / Bench.ChunkSize)
    results.foreach { case (name, _) =>
      assert(chunks.count(_.contains("\"" + name + "\":")) == 1, name)
    }
    // registration order preserved: first chunk holds the first queries,
    // last chunk the newest-added ones
    assert(chunks.head.contains("\"q_001\":") && chunks.last.contains("\"q_117\":"))
    lines.foreach(l => assert(l.length < 1200, s"line too long (${l.length})"))
    // each chunk line is itself valid JSON with chunk bookkeeping
    assert(chunks.forall(c => c.contains("\"metric\":\"queries_chunk\"")
      && c.contains("\"n_chunks\":" + chunks.size)))
  }

  test("per-chunk canaries ride into the chunk lines and bench_last " +
      "(retriage pre-normalizes raw flags by the epoch each chunk ran in)") {
    val results = (1 to 45).map(i => f"q_$i%03d" -> 1.0)
    val canaries = Seq(0.09, 0.21, 0.12) // three chunks, three epochs
    val lines = Bench.emitLines(results, "/sf", fatal = false, canaries)
    val chunks = lines.init
    assert(chunks.size == 3)
    chunks.zip(canaries).foreach { case (line, c) =>
      assert(line.contains(s""""canary_sec":$c"""), line)
    }
    // every chunk line must stay parseable JSON with the canary in it
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    chunks.zip(canaries).foreach { case (line, c) =>
      assert(om.readTree(line).get("canary_sec").asDouble() == c)
    }
    // a sweep without chunk samples (subset runs, old artifacts) emits
    // the exact pre-round-16 line shape — no empty field
    assert(!Bench.emitLines(results, "/sf").head.contains("canary_sec"))

    // bench_last carries the array; parseTimings/parseCanary still read
    // the same fields they always did (the array sits BEFORE "queries",
    // where parseTimings' name:number scan never reaches)
    val txt =
      s"""{"metric":"bench_last","total_sec":45.0,"n_queries":45,"fatal":false,"canary_sec":0.09,"chunk_canaries":[0.09,0.21,0.12],"sf":"/sf",
         |"queries":${results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")}}""".stripMargin
    assert(Bench.parseCanary(txt).contains(0.09))
    val (sf, times) = Bench.parseTimings(txt).get
    assert(sf == "/sf" && times.size == 45 && times("q_001") == 1.0)
  }

  test("regression tripwire: 2x-and-1s rule, sentinels and new queries exempt") {
    val base = Map("a" -> 2.0, "b" -> 0.3, "c" -> 5.0, "gone" -> 1.0)
    val now = Seq(
      "a" -> 5.0,   // 2.5x and +3s → regression
      "b" -> 0.9,   // 3x but only +0.6s → jitter, exempt
      "c" -> -1.0,  // failure sentinel → its own channel, exempt
      "new_q" -> 9.0) // no baseline → exempt
    assert(Bench.regressions(now, base) == Seq(("a", 5.0, 2.0)))
  }

  test("epoch canary calibrates the tripwire; clamped; missing sides neutral") {
    val base = Map("a" -> 2.0)
    // slow epoch: the canary ran 1.96x slower, but the applied ratio is
    // DAMPENED to sqrt(1.96) = 1.4 (pure-CPU canary swings harder than
    // the I/O-mixed queries — the full ratio would mask regressions):
    // 4.9s vs baseline 2.0 is ONLY 1.75x of the scaled baseline (2.8)
    // → not a regression
    val slow = Bench.epochRatio(Some(0.98), Some(0.5))
    assert(math.abs(slow - 1.4) < 1e-9)
    assert(Bench.regressions(Seq("a" -> 4.9), base, slow).isEmpty)
    assert(Bench.regressions(Seq("a" -> 6.0), base, slow) ==
      Seq(("a", 6.0, 2.8))) // a real 2x past the scaled baseline still trips
    // fast epoch: the wire TIGHTENS — 3.9s vs a slow-epoch baseline of
    // 2.0 hides inside the unscaled 2x wire, but not the scaled one
    // (canary 0.49x → applied sqrt = 0.7)
    val fast = Bench.epochRatio(Some(0.245), Some(0.5))
    assert(math.abs(fast - 0.7) < 1e-9)
    assert(Bench.regressions(Seq("a" -> 3.9), base).isEmpty)
    assert(Bench.regressions(Seq("a" -> 3.9), base, fast) ==
      Seq(("a", 3.9, 1.4)))
    // a broken canary sample cannot stretch the wire unboundedly, and
    // the ceiling (1.8, hit at a 3.24x canary) bounds slow-epoch
    // suppression near the observed ~1.2-1.6x query-level swing
    assert(Bench.epochRatio(Some(50.0), Some(0.5)) == 1.8)
    assert(Bench.epochRatio(Some(0.01), Some(0.5)) == 0.5)
    // the round-9 observed worst canary swing (2.9x) maps inside the
    // clamp to its dampened value
    assert(math.abs(Bench.epochRatio(Some(0.29), Some(0.1)) - math.sqrt(2.9)) < 1e-9)
    // missing either side → neutral 1.0
    assert(Bench.epochRatio(None, Some(0.5)) == 1.0)
    assert(Bench.epochRatio(Some(0.5), None) == 1.0)
    // parseCanary reads writeBenchLast's field
    assert(Bench.parseCanary("""{"metric":"bench_last","canary_sec":0.812,"sf":"/x"}""")
      .contains(0.812))
    assert(Bench.parseCanary("{}").isEmpty)
  }

  test("tripwire suspects re-measure best-of-N; clean queries run once") {
    val base = Map("noisy" -> 1.0, "slow" -> 1.0, "fine" -> 1.0)
    val first = Seq("noisy" -> 2.7, "slow" -> 3.0, "fine" -> 1.1)
    var reruns = Map.empty[String, Int].withDefaultValue(0)
    val (outSeq, replaced) = Bench.remeasureSuspects(first, Some(base), { name =>
      reruns += name -> (reruns(name) + 1)
      if (name == "noisy") 0.9 else 3.1 // noise settles, regression persists
    })
    val out = outSeq.toMap
    // noisy settles on its FIRST re-run and buys back the rest of its
    // budget; slow trips every sample and exhausts it; fine never re-runs
    assert(reruns == Map("noisy" -> 1, "slow" -> Bench.RemeasureRuns))
    assert(out("fine") == 1.1)
    assert(out("noisy") == 0.9) // best sample recorded → no longer trips
    assert(out("slow") == 3.0)  // real regression survives re-measure
    // only noisy's EMITTED time came from a re-run — slow kept its
    // first (in-chunk) sample, so its chunk canary still prices it
    assert(replaced == Set("noisy"))
    assert(Bench.regressions(out.toSeq.sortBy(_._1), base).map(_._1) == Seq("slow"))
    // no baseline → nothing re-runs
    var n = 0
    assert(Bench.remeasureSuspects(first, None, { _ => n += 1; 0.0 })
      == ((first, Set.empty[String])))
    assert(n == 0)
    // a failing re-run (sentinel) never replaces a real sample
    val failed = Bench.remeasureSuspects(Seq("slow" -> 3.0), Some(base), _ => -1.0)
    assert(failed == ((Seq("slow" -> 3.0), Set.empty[String])))
  }

  test("parseTimings reads writeBenchLast's artifact format") {
    val text =
      s"""{"metric":"bench_last","total_sec":1.25,"n_queries":2,"fatal":false,"sf":"/sf0.1",
         |"queries":{"q_one":1.25,"q_two":-1.0}}""".stripMargin
    val Some((sf, times)) = Bench.parseTimings(text)
    assert(sf == "/sf0.1")
    assert(times == Map("q_one" -> 1.25, "q_two" -> -1.0))
    assert(Bench.parseTimings("{}").isEmpty)
  }

  test("parse helpers read exponent-form doubles (Scala renders <1e-3 as 8.7E-4)") {
    // truncating the exponent would read 8.7E-4 as 8.7 s — a ~10,000×
    // inflated baseline the 2× tripwire could never fire against
    val text =
      s"""{"metric":"bench_last","canary_sec":8.7E-4,"sf":"/sf0.1",
         |"queries":{"q_tiny":8.7E-4,"q_norm":1.5}}""".stripMargin
    assert(Bench.parseCanary(text).contains(8.7e-4))
    val Some((_, times)) = Bench.parseTimings(text)
    assert(times == Map("q_tiny" -> 8.7e-4, "q_norm" -> 1.5))
  }

  test("committed bench artifacts: tripwire audit (warn-only, driver rewrites last)") {
    // deterministic given the committed files; warn-only because the
    // driver regenerates bench_last.json between commits — Bench.main
    // prints the same REGRESSION lines at run time. Epoch-scaled with
    // BOTH files' recorded canaries, exactly as the runtime wire is:
    // an unscaled audit would miss fast-epoch regressions the runtime
    // flags and false-alarm on slow-epoch sweeps it deliberately
    // suppressed.
    val last = java.nio.file.Paths.get("bench_last.json")
    val base = java.nio.file.Paths.get("bench_baseline.json")
    if (java.nio.file.Files.exists(last) && java.nio.file.Files.exists(base)) {
      val lastText = java.nio.file.Files.readString(last)
      val baseText = java.nio.file.Files.readString(base)
      val ratio = Bench.epochRatio(
        Bench.parseCanary(lastText), Bench.parseCanary(baseText))
      (Bench.parseTimings(lastText), Bench.parseTimings(baseText)) match {
        case (Some((sfL, lastT)), Some((sfB, baseT))) if sfL == sfB =>
          Bench.regressions(lastT.toSeq.sortBy(_._1), baseT, ratio).foreach {
            case (name, t, b) =>
              alert(f"BENCH REGRESSION $name: $t%.2f s vs epoch-scaled baseline $b%.2f s (${t / b}%.1fx)")
          }
        case (_, baseParsed) =>
          // a committed baseline the runtime can't read is the round-11
          // failure mode: the tripwire/epoch/remeasure machinery all
          // silently no-op. That must be a red suite, not a shrug.
          assert(baseParsed.exists(_._2.nonEmpty),
            "committed bench_baseline.json exists but parses to zero timings — " +
              "the 2x tripwire is silently disabled (round-11 defect)")
      }
    }
  }

  test("committed baseline must parse: >0 timings, a canary, and the bench SF") {
    // guards the FORMAT of the committed file itself: a pretty-printed
    // rewrite (round 11) defeated the colon-tight regexes and disabled
    // the tripwire for a whole driver sweep while every test stayed
    // green. This test reads the file the runtime reads.
    val base = java.nio.file.Paths.get("bench_baseline.json")
    if (java.nio.file.Files.exists(base)) {
      val text = java.nio.file.Files.readString(base)
      val parsed = Bench.parseTimings(text)
      assert(parsed.nonEmpty, "baseline has no parseable queries map")
      val (sf, times) = parsed.get
      assert(times.size > 100,
        s"baseline parsed only ${times.size} timings — format drift?")
      assert(Bench.parseCanary(text).exists(_ > 0),
        "baseline canary_sec missing/unparseable — epoch calibration dead")
      assert(sf.nonEmpty, "baseline sf tag missing — cross-SF guard dead")
    }
  }

  test("parse helpers tolerate pretty-printed JSON (space after colon)") {
    // the exact shape that disabled the round-11 tripwire
    val text =
      s"""{"metric": "bench_last", "canary_sec": 0.088, "sf": "/sf0.1",
         |"queries": {"q_a": 0.825389301, "q_b": 1.5}}""".stripMargin
    assert(Bench.parseCanary(text).contains(0.088))
    val Some((sf, times)) = Bench.parseTimings(text)
    assert(sf == "/sf0.1")
    assert(times == Map("q_a" -> 0.825389301, "q_b" -> 1.5))
  }

  test("mass failure: trailer stays tail-safe, true count kept, sentinels in chunks") {
    // a fatal cascade failing every query must not blow the trailer —
    // the one line the tail parser depends on — past the tail window
    val results = (1 to 117).map(i => f"q_$i%03d" -> -1.0)
    val lines = Bench.emitLines(results, "/sf", fatal = true)
    val trailer = lines.last
    assert(trailer.length < 1200, s"trailer too long (${trailer.length})")
    assert(trailer.contains("\"n_errors\":117"))
    assert(trailer.contains("\"...\"")) // truncation marker
    assert(trailer.contains("\"value\":0.0"))
    // every failure still visible as a sentinel in its chunk line
    results.foreach { case (name, _) =>
      assert(lines.init.exists(_.contains("\"" + name + "\":-1.0")), name)
    }
  }
}
