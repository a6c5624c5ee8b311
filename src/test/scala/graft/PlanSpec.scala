package graft

import org.apache.spark.sql.functions.col

/** Physical-plan quality gates (the 100 TB posture, SURVEY.md §4):
  * filters and projections must reach the parquet scan, small dims must
  * broadcast, global top-k must plan as TakeOrderedAndProject — asserted
  * on the actual executed plans so regressions fail loudly. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, Sf)
    df.collect() // materialize so AQE finalizes join strategies
    df.queryExecution.executedPlan.toString
  }

  test("point lookup pushes the key predicate into the parquet scan") {
    val p = planOf("evt_point_lookup")
    assert(p.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id,4242)]"), p)
  }

  test("pricing summary pushes the date filter and prunes columns") {
    val p = planOf("rel_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // pruned scan: the 11-column table reads only the 5 touched columns
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_orderkey") && read.contains("l_quantity"), read)
  }

  test("regional revenue broadcasts every dimension side") {
    val p = planOf("rel_regional_revenue")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, plan:\n$p")
  }

  test("global top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf("rel_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("program trends semi-join stays broadcast (no shuffled fact)") {
    val p = planOf("evt_program_trends")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("large-large join shuffles on the key instead of broadcasting") {
    // lineitem ⋈ orders is the one genuinely big-big join: both sides
    // must exchange on the join key (SMJ or shuffled-hash), never a
    // nested loop
    val p = planOf("rel_shipping_priority")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      // AQE may legitimately demote tiny test inputs to broadcast; the
      // guard is against nested-loop plans
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("date-partitioned backfill output prunes partitions on date filters") {
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString + "/events"
    graft.ingest.Backfill.run(spark, 1L, 2001L, workers = 4, out)
    val all = spark.read.parquet(out)
    val dates = all.select("block_date").distinct().count()
    assert(dates > 1, "need multiple date partitions for a pruning test")
    val filtered = all.filter(col("block_date") === "2024-01-01")
    filtered.collect()
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(block_date"), p)
    // the scan must not read all partitions: partition count pruned to 1
    val pruned = filtered.select("block_date").distinct().count()
    assert(pruned == 1)
  }

  test("jaccard df-cap filters via broadcast anti-join, no cartesian") {
    val p = planOf("dedup_jaccard_pairs")
    // the hot-shingle exclusion must be a broadcast LeftAnti (the hot
    // set is tiny by construction), and candidate generation must stay
    // an equi-join — a nested-loop anywhere means the scale story broke
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("corpus near-dup stage joins on band keys, never all-pairs") {
    // inspect the staged pipeline itself (the query's summary frame is a
    // collected 3-row local relation with no joins to audit)
    ext.CorpusPipeline.withCleanedDocs(spark, Sf) { staged =>
      staged.collect()
      val p = staged.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    }
  }

  test("ANN LSH candidates arrive via the bucket equi-join, never all-pairs") {
    val p = planOf("sim_ann_lsh")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("LSH near-dup self-join is a keyed equi-join that reuses the sketch exchange") {
    // both sides are the full corpus: the plan must be a keyed equi-join
    // (AQE may pick broadcast at toy SF) and never an all-pairs loop
    val p = planOf("sim_neardup_lsh")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the masked-key sides are the identical relation, so the sketch
    // computation (the dominant map cost) must be shared, not run twice
    assert(p.contains("ReusedExchange"), p)
  }

  test("star cohort enrichment broadcasts the derived dim") {
    val p = planOf("star_wallet_cohorts")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("decontamination probes via a broadcast hash join, never all-pairs") {
    // the benchmark gram index is the tiny side by nature; the 100 TB
    // corpus side must stream through a broadcast probe
    val p = planOf("prep_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("stratified sampler is map-side: one exchange for the 5-row rollup") {
    // the inclusion key is computed per row in the scan stage; the ONLY
    // shuffle is the final per-lang aggregation
    val p = planOf("prep_sample_stratified")
    // AQE prints the pre-adaptive plan after "== Initial Plan ==" too —
    // count exchanges in the final executed section only
    val fp = p.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hash".r.findAllIn(fp).length +
      "Exchange range".r.findAllIn(fp).length
    assert(exchanges <= 2, s"sampler should shuffle only the tiny rollup:\n$p")
    assert(fp.contains("partial_count"), p) // map-side combine before it
  }

  test("funnel stages join and aggregate on user_id only") {
    val p = planOf("evt_funnel")
    assert(!p.contains("CartesianProduct"), p) // 1-row assembly is BNLJ, fine
    // stage gating must be keyed joins, not nested loops over events
    assert(p.contains("HashAggregate"), p)
  }

  test("boilerplate hot-list probes via broadcast, corpus shuffles only by doc") {
    // the hot-gram list is bounded by 20 x avg distinct grams per doc
    // (corpus-size-independent); the corpus side must meet it as a
    // broadcast probe so the 100 TB scan is never re-shuffled by it
    val p = planOf("text_boilerplate_share")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("split/shard assignment is map-side: one exchange for the 24-row rollup") {
    val p = planOf("prep_split_shuffle")
    val fp = p.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hash".r.findAllIn(fp).length +
      "Exchange range".r.findAllIn(fp).length
    assert(exchanges <= 2, s"split keys are per-row md5 work, only the rollup shuffles:\n$p")
    assert(fp.contains("partial_count"), p)
  }

  test("kNN classify broadcasts the held-out slice against one corpus scan") {
    // the <> self-pair guard makes this a nested-loop by necessity; the
    // broadcast keeps it one pass over the store (query side is tiny)
    val p = planOf("sim_knn_classify")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("substring dedup pairs via the window-hash equi-join, never all-pairs") {
    val p = planOf("dedup_substring")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("PMI broadcasts the vocab-bounded unigram table, shuffles only by gram") {
    val p = planOf("text_pmi_bigrams")
    // two unigram-count probes + two 1-row totals, all broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("LM filter broadcasts the vocab model; corpus scans once") {
    val p = planOf("prep_lm_filter")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("k-means step broadcasts the k seeds against one store pass") {
    val p = planOf("emb_kmeans_step")
    // assignment is seed-broadcast (8 rows x full store: BNLJ by design);
    // the argmax is a PARTIAL/FINAL max_by aggregate — the k scored rows
    // per vec collapse map-side before the exchange, so the shuffle
    // carries n rows, unlike the row_number window which shuffled k·n
    // into per-vec partitions. (Struct buffers make it a SortAggregate,
    // not Hash — the pinned claims are the partial split and no Window.)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_max_by"), p)
    assert(!p.contains("Window"), p)
  }

  test("PQ training: broadcast codebook, partial argmin, hash-agg Q24 update") {
    val p = planOf("emb_pq_train_step")
    // seed codebook broadcasts; the K candidates per (vec, subspace)
    // collapse map-side; the centroid update is the O(1)-state Q24
    // int64 HashAggregate, never a member-buffering ObjectHashAggregate
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_max_by"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("collect_list"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("Gram matrix: one native buffer aggregate, no explode, no window") {
    // emb_gram_matrix/emb_pca_power_step return driver-expanded
    // LocalRelations (bounded d² state), so the gate targets the
    // aggregation plan they share: the native GramAggregate must plan
    // as a partial→final ObjectHashAggregate over the scan — zero
    // Generate (the n·d² explode it replaced), no row-buffering
    // aggregate, no window
    val df = graft.Tables.embeddings(spark, Sf)
      .select(org.apache.spark.sql.functions.transform(
        col("embedding"), x => x.cast("double")).as("v"))
      .agg(graft.functions.GramAggregate.gram_acc(col("v"), 64, 1L << 24).as("g"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_gram_acc"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("collect_list"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("PQ ADC search: broadcast codebook/LUT equi-joins, partial argmin, no window") {
    val p = planOf("sim_ann_pq")
    // codebook + LUT are broadcast; codes join them on (m, code) keys;
    // the argmin is the map-side partial max_by collapse; ranking runs
    // on the heap operator, never a per-query window sort
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_max_by"), p)
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window"), p)
  }

  test("weighted sampling plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf("prep_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("split-leakage audit: keyed equi-joins only, never all-pairs") {
    val p = planOf("prep_split_leakage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("IVF upsert broadcasts the k centroids against one batch pass") {
    val p = planOf("sim_ivf_upsert")
    // batch × k-row centroid table: broadcast nested loop by design
    // (the kmeans assignment shape); the corpus side is scanned for the
    // centroid build and occupancy only — no cartesian anywhere
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("collect_list"), p)
  }

  test("centroid builds hold O(1) aggregation state: no member-buffering collect_list") {
    // the r5 form buffered whole clusters per (cell, dim) group via
    // collect_list + ordered fold — the flagged 100 TB hazard; the
    // decimal-sum form must keep every aggregate a plain partial/final
    // sum (and kmeans' cohesion likewise, not a (vec_id, cos) buffer)
    for (q <- Seq("sim_ann_ivf", "emb_kmeans_step")) {
      val p = planOf(q)
      assert(!p.contains("collect_list"), s"$q buffers members:\n$p")
      assert(p.contains("partial_sum") || p.contains("partial_finalmerge_sum")
        || p.contains("sum("), s"$q: expected sum-based centroid aggregate:\n$p")
    }
  }

  test("bloom filter broadcasts to the probe side; corpus builds it in one scan") {
    val p = planOf("evt_bloom_probe")
    assert(p.contains("BroadcastHashJoin"), p) // word-keyed probe join
    assert(!p.contains("CartesianProduct"), p)
  }

  test("CMS top-k plans as TakeOrderedAndProject before the rank window") {
    val p = planOf("evt_cms_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p) // tiny sketch broadcast
    assert(!p.contains("CartesianProduct"), p)
  }

  test("drift monitor is pure keyed aggregation work") {
    val p = planOf("evt_drift_l1")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), p) // map-side combine on the scan
  }

  test("anomaly detection: grouped count + keyed window + spine-sized join only") {
    // the day-densify spine (per-type min..max days) is tiny by
    // construction; it must meet the daily counts as a keyed join,
    // never a nested loop over events
    val p = planOf("evt_anomaly_daily")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count") && p.contains("Window"), p)
  }

  test("whole-stage codegen covers the aggregation pipelines") {
    // codegen stages render as "*(n) " prefixes in the executed plan
    val p = planOf("evt_volume_summary")
    assert(p.contains("*(1) HashAggregate") || p.contains("*(2) HashAggregate"), p)
    // and the aggregation is partial/final split (map-side combine)
    assert(p.contains("partial_count"), p)
  }

  test("sliding WAU: bounded explode fan-out, no range self-join") {
    val p = planOf("evt_wau_sliding")
    assert(p.contains("Generate explode"), p) // the ≤7× window fan-out
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("FK audit: dim key-sets broadcast; no fact-side nested loop") {
    val p = planOf("audit_referential")
    // part/supplier/customer key sets broadcast against the fact scans;
    // the only nested-loop join is the 1-row × 1-row scalar assembly
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("z-order audit needs no global sort: aligned prefix buckets, no Window") {
    val p = planOf("prep_zorder_layout")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p) // the dmin probe is 1-row broadcast
    assert(p.contains("partial_count"), p)
  }

  test("interval join runs as a bucketed hash equi-join, not a range nested loop") {
    val p = planOf("evt_interval_join")
    assert(p.contains("Generate explode"), p) // the 2× bucket probe fan-out
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graph degree histogram is endpoint equi-join work, never all-pairs") {
    // the triangle census's internal joins are gated in GraphSpec on the
    // exposed triangleRows plan (its final frame is an eager LocalRelation)
    val p = planOf("graph_degree_hist")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("stream-static enrichment plans as a broadcast hash join of the dim") {
    // batch-mode twin of the stream_static_enrich composition: each
    // micro-batch plans the SAME join, so the batch plan is the gate —
    // a dim that stopped broadcasting would shuffle the fact side on
    // every trigger
    val ev = Tables.events(spark, Sf).filter(col("ts").isNotNull)
    val dim = ev.groupBy(col("user_id"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val joined = graft.streaming.StreamAnalytics.enrichWithDim(
      ev, dim, "user_id")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"), p)
  }

  test("SCD2 windows partition by program — never a global single-partition sort") {
    val p = planOf("star_scd2_programs")
    // every windowspecdefinition in the plan opens with the program_id
    // partition column — a partitionless (single-partition) window would
    // open with the ORDER column instead
    val specs = "windowspecdefinition\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p)
    assert(specs.forall(_.startsWith("program_id")), specs.mkString(","))
  }

  test("Q21 shape: semi + anti as hash joins on the order key, top-k bounded") {
    val p = planOf("rel_waiting_suppliers")
    // both correlated subqueries must become hash semi/anti joins (the
    // supplier inequality rides as the join condition) — a nested-loop
    // for either would be all-pairs over the order's lines at scale
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p) // top-20, not a global sort
  }

  test("hybrid RRF: each ranker's top-20 is a bounded TakeOrdered, fusion is outer") {
    val p = planOf("sim_hybrid_rrf")
    // two independent top-k branches (lexical + dense) — both must plan
    // as TakeOrderedAndProject; a global sort on either ranker's scored
    // set would be the 100 TB regression
    assert("TakeOrderedAndProject".r.findAllIn(p).length >= 2, p)
    assert(p.contains("FullOuter"), p)
  }

  test("classifier score: the model joins broadcast, never shuffled or looped") {
    val p = planOf("prep_classifier_score")
    // the 4096-bucket model is vocab-bounded — applying it must be a
    // map-side broadcast hash join against the corpus tf table; a
    // shuffle of the corpus on the bucket key (or any nested loop)
    // would be the 100 TB regression
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
