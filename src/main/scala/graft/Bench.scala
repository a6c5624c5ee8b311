package graft
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

object Bench {

  /** Time one query end-to-end via a noop-sink write, which forces FULL
    * materialization of every column — .count() would let Catalyst prune
    * projections and eliminate sorts, understating exactly the queries
    * with heavy per-row expression work (sha256, rolling hashes).
    * A throwing query records the sentinel -1.0, NOT its elapsed time:
    * folding a failure's partial runtime into the totals would make a
    * regression-into-crash read as a speedup in BENCH_r*.json. */
  private[graft] def execOne(spark: SparkSession, sfDir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      fatal: AtomicBoolean = new AtomicBoolean): Double = {
    val t0 = System.nanoTime()
    // Throwable, not NonFatal: one query OOMing must still yield a bench
    // line for the other ~60 — best-effort continue + sentinel beats
    // aborting the round's only perf signal with nothing emitted. But a
    // fatal error (OOM, linkage) can leave the surviving JVM degraded
    // (evicted caches, dying executors pool), so every timing recorded
    // after one is suspect: record the taint so the emitted JSON can
    // carry it (`fatal` flag) and the perf harness can discount the run.
    val dt =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        if (!scala.util.control.NonFatal(e)) fatal.set(true)
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        -1.0 }
    // per-query caches must not leak across entries — but the cleanup
    // itself must honor the same best-effort-continue contract: on an
    // OOM-degraded JVM a throwing clearCache would otherwise abort the
    // WHOLE sweep after the sentinel machinery already absorbed the
    // query's own failure
    try spark.catalog.clearCache()
    catch { case e: Throwable =>
      if (!scala.util.control.NonFatal(e)) fatal.set(true)
      System.err.println(s"[bench] clearCache after $name failed: ${e.getClass.getName}")
    }
    dt
  }

  /** Per-query chunk size for the emitted JSON lines. The driver
    * captures the output TAIL: round 5 proved that one long line with
    * all ~117 timings gets its HEAD truncated, hiding ~65 per-query
    * numbers from the round-over-round regression audit. ~20 entries
    * keep every line well under 1 KB. */
  private[graft] val ChunkSize = 20

  /** The emitted JSON lines, ALL short enough to survive tail capture:
    * per-query timings in chunks of [[ChunkSize]] (registration order,
    * newest-added queries last — failures as -1.0), then one
    * self-contained trailer with the totals (failures excluded from the
    * total) LAST so a parser taking the final line still gets a valid
    * summary.
    *
    * @param chunkCanaries per-chunk CPU canary samples (one [[canary]]
    *   run right after each chunk's measured pass) — this host's epoch
    *   swings 1.4–3.4× WITHIN a session, so one sweep-level canary
    *   cannot price a query measured an epoch away; the chunk canary
    *   rides into the chunk's own JSON line so a raw ≥2× flag is born
    *   pre-normalized (tools/retriage.py applies it automatically). */
  private[graft] def emitLines(results: Seq[(String, Double)], sfDir: String,
      fatal: Boolean = false,
      chunkCanaries: Seq[Double] = Nil,
      remeasured: Set[String] = Set.empty): Seq[String] = {
    val failed = results.collect { case (name, t) if t < 0 => name }.sorted
    val total = results.collect { case (_, t) if t >= 0 => t }.sum
    val nChunks = (results.size + ChunkSize - 1) / ChunkSize
    val chunks = results.grouped(ChunkSize).zipWithIndex.map { case (chunk, i) =>
      val qs = chunk.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val cc = chunkCanaries.lift(i).fold("")(c => s""""canary_sec":$c,""")
      s"""{"metric":"queries_chunk","chunk":${i + 1},"n_chunks":$nChunks,$cc"queries":$qs,"sf":"$sfDir"}"""
    }.toSeq
    // the trailer must stay tail-safe even in a mass-failure run, so
    // the errors list is capped; the full failure set is recoverable
    // from the chunk lines (every failed query carries the -1.0
    // sentinel there) and n_errors always has the true count
    val errHead = failed.take(20).map("\"" + _ + "\"")
    val errs = (if (failed.size > 20) errHead :+ "\"...\"" else errHead)
      .mkString("[", ",", "]")
    // remeasured rides in the TRAILER so the tail-captured shape keeps
    // it; capped for tail-safety like errors — a clipped name simply
    // falls back to the isolated-rerun path, never a wrong clear
    val remHead = remeasured.toSeq.sorted.take(20).map("\"" + _ + "\"")
    val rem = (if (remeasured.size > 20) remHead :+ "\"...\"" else remHead)
      .mkString("[", ",", "]")
    chunks :+
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${failed.size},"errors":$errs,"remeasured":$rem,"fatal":$fatal,"sf":"$sfDir"}"""
  }

  /** The committed full-run artifact: every per-query timing, the
    * totals, and the taint flag, in one file — the stdout chunks exist
    * for the driver's tail capture, but round 6 showed only ~1/3 of the
    * timings survive that capture, so the round-over-round regression
    * audit reads THIS file from the repo instead. Only full runs write
    * it (a dev subset run would masquerade as a collapsed query
    * surface). */
  private[graft] def writeBenchLast(results: Seq[(String, Double)],
      sfDir: String, fatal: Boolean, canarySec: Double = -1.0,
      chunkCanaries: Seq[Double] = Nil,
      remeasured: Set[String] = Set.empty): Unit = {
    val total = results.collect { case (_, t) if t >= 0 => t }.sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // chunk_canaries stays BEFORE "queries": parseTimings scans
    // name:number pairs after the "queries" key, and a bare-number
    // array there would not match, but keep the artifact unambiguous.
    // Query i belongs to chunk i / chunk_size in registration order —
    // chunk_size is RECORDED (not inferred downstream: ceil(n/chunks)
    // diverges from the true size whenever the last chunk is short).
    // remeasured = queries whose emitted time came from a sweep-end
    // re-run, so their chunk's canary does not price them.
    val cc =
      if (chunkCanaries.isEmpty) ""
      else chunkCanaries.mkString(
        s""""chunk_size":$ChunkSize,"chunk_canaries":[""", ",", "],") +
        remeasured.toSeq.sorted.map("\"" + _ + "\"")
          .mkString(""""remeasured":[""", ",", "],")
    val json =
      s"""{"metric":"bench_last","total_sec":$total,"n_queries":${results.size},"fatal":$fatal,"canary_sec":$canarySec,$cc"sf":"$sfDir",
         |"queries":$qs}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_last.json"), json + "\n")
  }

  /** The per-query timing map of a bench_last/bench_baseline file,
    * with its SF tag — None when the text has no queries map. */
  private[graft] def parseTimings(text: String): Option[(String, Map[String, Double])] = {
    val qIdx = text.indexOf("\"queries\"")
    if (qIdx < 0) return None
    val sf = """"sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(text).map(_.group(1))
    // exponent part matters: Scala renders doubles below 1e-3 as
    // "8.7E-4", and truncating it would read 8.7 — a ~10,000× inflated
    // baseline the 2× tripwire could never fire against. Whitespace
    // around the colon matters too: round 11 recommitted the baseline
    // pretty-printed ("name": 1.2) and the colon-tight regex silently
    // parsed ZERO entries, disabling the tripwire, epoch calibration,
    // and remeasure loop for the whole driver sweep.
    val entry = """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9.]+(?:[eE][-+]?[0-9]+)?)""".r
    val times = entry.findAllMatchIn(text.drop(qIdx))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    sf.map(_ -> times)
  }

  /** Deterministic CPU canary: a fixed, I/O-free, codegen'd aggregate
    * over a fixed partition count, timed best-of-3. Its runtime tracks
    * the MACHINE's current speed (the firecracker host swings between
    * fast and slow epochs by ~1.2× with zero local load — PLANS.md
    * "container-epoch variance"), so the ratio of the sweep's canary to
    * the baseline's canary calibrates the tripwire: a slow-epoch run
    * doesn't false-alarm, and a fast-epoch run can't hide a real ~1.2×
    * regression under a slow-epoch baseline. Fixed 8 partitions — NOT
    * the session's cpu count — so the measurement is comparable across
    * configurations. */
  private[graft] def canary(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 120000000L, 1L, 8)
        .agg(sum(expr("((id * 2654435761) % 1000003) ^ (id % 997)")))
        .head()
      (System.nanoTime() - t0) / 1e9
    }
    once(); (1 to 3).map(_ => once()).min // first run pays codegen/JIT
  }

  /** The baseline file's canary seconds, if recorded. */
  private[graft] def parseCanary(text: String): Option[Double] =
    """"canary_sec"\s*:\s*(-?[0-9.]+(?:[eE][-+]?[0-9]+)?)""".r.findFirstMatchIn(text)
      .map(_.group(1).toDouble)

  /** Epoch calibration factor: the SQUARE ROOT of this sweep's canary
    * over the baseline's, clamped to [0.5, 1.8]. The dampening bridges
    * the two observed swing magnitudes on this host: the pure-CPU
    * canary swings up to ~2.9× between epochs (round-9 same-session
    * best-of-3 canaries of 0.088 s and 0.257 s an hour apart) while the
    * I/O-mixed queries swing only ~1.2–1.6×, so applying the FULL
    * canary ratio on a slow epoch would suppress real regressions of up
    * to ~2× behind machine noise. sqrt maps the canary's 2.9× to ~1.7×
    * — the query-level band — and the asymmetric clamp (ceiling 1.8,
    * reached at a 3.24× canary) bounds slow-epoch suppression near the
    * observed query swing while still letting a fast-epoch run TIGHTEN
    * the wire (floor 0.5). 1.0 when either side is missing. */
  private[graft] def epochRatio(nowCanary: Option[Double],
      baseCanary: Option[Double]): Double = (nowCanary, baseCanary) match {
    case (Some(n), Some(b)) if n > 0 && b > 0 =>
      math.min(1.8, math.max(0.5, math.sqrt(n / b)))
    case _ => 1.0
  }

  /** The 2× tripwire predicate: queries whose new time exceeds twice
    * the EPOCH-SCALED baseline AND by more than one absolute second
    * (toy-SF sub-second entries jitter past any ratio). `ratio` is the
    * [[epochRatio]] calibration — the baseline each query is held to is
    * `b · ratio`, i.e. what the baseline machine would run today.
    * Failures (sentinel −1.0) and baseline-absent queries are not
    * regressions — they have their own channels. */
  private[graft] def regressions(results: Seq[(String, Double)],
      base: Map[String, Double],
      ratio: Double = 1.0): Seq[(String, Double, Double)] =
    results.flatMap { case (name, t) =>
      base.get(name).collect {
        case b if b > 0 && t > 2 * b * ratio && t - b * ratio > 1.0 =>
          (name, t, b * ratio)
      }
    }

  /** The committed same-SF baseline timings from the already-read file
    * text (main reads bench_baseline.json ONCE and derives both the
    * canary and the timings from the same content — two reads could
    * observe different file states under a mid-run rewrite). */
  private[graft] def baselineTimes(sfDir: String,
      text: Option[String]): Option[Map[String, Double]] =
    text.flatMap(parseTimings) match {
      case Some((sf, times)) if sf == sfDir => Some(times)
      case _ => None // cross-SF ratios are meaningless
    }

  /** How many extra samples a tripwire suspect gets before it's flagged. */
  private[graft] val RemeasureRuns = 2

  /** Variance hardening: ONE sample tripping the 2× wire is as often
    * JIT/run-order noise as a real regression — round 7's driver run
    * flagged three queries at 2.4–2.9× that two same-commit
    * re-executions in the driver's own posture put AT OR BELOW baseline
    * (PLANS.md "Bench variance", round 8). So a suspect re-runs while
    * its BEST sample still trips the wire, up to [[RemeasureRuns]] more
    * times — best-sample is the steady-state latency the bench already
    * targets via its warmup pass — and only a query whose best still
    * exceeds the wire reaches [[warnRegressions]]. The loop stops as
    * soon as one re-run clears the wire (a settled noise spike buys
    * back its remaining retries), non-suspects keep their first sample,
    * and a regression-free run costs nothing extra. */
  /** Also returns the names whose EMITTED time came from a re-run:
    * those samples were taken at sweep END, not inside their chunk, so
    * the chunk canary does not price them — the artifact carries the
    * set and retriage excludes them from per-chunk pre-normalization
    * (they keep the isolated-rerun path, which prices its own epoch). */
  private[graft] def remeasureSuspects(results: Seq[(String, Double)],
      base: Option[Map[String, Double]],
      rerun: String => Double, ratio: Double = 1.0)
      : (Seq[(String, Double)], Set[String]) =
    base match {
      case None => (results, Set.empty)
      case Some(b) =>
        val replaced = scala.collection.mutable.Set.empty[String]
        val out = results.map { case (name, t) =>
          var best = t
          var budget = RemeasureRuns
          while (budget > 0 && regressions(Seq(name -> best), b, ratio).nonEmpty) {
            val r = rerun(name)
            if (r >= 0.0 && r < best) { best = r; replaced += name }
            budget -= 1
          }
          name -> best
        }
        (out, replaced.toSet)
    }

  /** Loud 2× tripwire against the committed baseline (if present):
    * prints one stderr line per regressed query so a round-6-style
    * regression cannot land silently. BenchSpec replays the same check
    * on the committed files. */
  private[graft] def warnRegressions(results: Seq[(String, Double)],
      base: Option[Map[String, Double]], ratio: Double = 1.0): Unit =
    base.foreach { baseTimes =>
      regressions(results, baseTimes, ratio).foreach { case (name, t, b) =>
        System.err.println(f"[bench] REGRESSION $name: $t%.2f s vs epoch-scaled baseline $b%.2f s (${t / b}%.1fx)")
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional arg (dev only): comma-separated query-name subset, for
    // cheap micro-benching of a few queries without the full sweep
    val only: Option[Set[String]] = args.headOption.map(_.split(",").toSet)
    val spark = LocalSession.build("graft-bench")
    // Warmup pass: run every query once unmeasured so the measured pass
    // reports steady-state latency — per-query one-time costs (codegen
    // compilation, JIT, file-listing, page cache) are fixed session
    // overhead, not per-query throughput, and at toy SFs they would
    // otherwise dominate and add ±30% run-to-run noise.
    val fatal = new AtomicBoolean // set by any fatal error, warmup included
    val queries = SparkEntry.orderedQueries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // `stream_*` queries are END-TO-END Structured Streaming runs: each
    // execution re-stages its chunk files, re-creates its checkpoint,
    // and replays every micro-batch from scratch, so a warmup pass
    // doesn't surface any steady state — it just doubles a multi-batch
    // pipeline's full cost. The batch queries' warmup already pays the
    // session-wide one-time costs (codegen, JIT, page cache) they share.
    queries.foreach { case (n, f) =>
      if (!n.startsWith("stream_")) execOne(spark, sfDir, n, f, fatal) }
    // epoch calibration BEFORE the measured pass: one canary sample per
    // sweep, on the warm JVM, prices the machine's current speed
    val canarySec = canary(spark)
    val baseText = {
      val p = java.nio.file.Paths.get("bench_baseline.json")
      if (java.nio.file.Files.exists(p)) Some(java.nio.file.Files.readString(p))
      else None
    }
    val ratio = epochRatio(Some(canarySec), baseText.flatMap(parseCanary))
    System.err.println(f"[bench] canary $canarySec%.3f s, epoch ratio $ratio%.2fx vs baseline")
    // measured pass, chunked: one canary sample right AFTER each chunk
    // prices the epoch the chunk's queries actually ran in (the host
    // swings 1.4–3.4x within a session — a sweep-level canary cannot
    // price a query measured half an hour away). ~1 s per chunk on a
    // warm JVM; the samples ride into the chunk JSON lines and
    // bench_last.json for retriage's automatic per-chunk normalization.
    val chunkCanaries = scala.collection.mutable.ArrayBuffer.empty[Double]
    val firstPass = queries.grouped(ChunkSize).toSeq.flatMap { chunk =>
      val rs = chunk.map { case (name, fn) =>
        name -> execOne(spark, sfDir, name, fn, fatal) }
      chunkCanaries += canary(spark)
      rs
    }
    chunkCanaries.zipWithIndex.foreach { case (c, i) =>
      System.err.println(f"[bench] chunk ${i + 1} canary $c%.3f s") }
    val qmap = queries.toMap
    val baseTimes = baselineTimes(sfDir, baseText)
    val (results, remeasured) = remeasureSuspects(firstPass, baseTimes, { name =>
      val t = execOne(spark, sfDir, name, qmap(name), fatal)
      System.err.println(f"[bench] re-measured tripwire suspect $name: $t%.2f s")
      t
    }, ratio)
    emitLines(results, sfDir, fatal.get, chunkCanaries.toSeq, remeasured)
      .foreach(println)
    if (only.isEmpty)
      writeBenchLast(results, sfDir, fatal.get, canarySec, chunkCanaries.toSeq,
        remeasured)
    warnRegressions(results, baseTimes, ratio)
    spark.stop()
  }
}
