package graft.analytics

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** The 100 TB-scale variants of the exact operators (SURVEY.md §2.4 A4:
  * "at 100 TB: approx_count_distinct (HLL)"): sketch-based distincts and
  * quantiles. The built-in sketches carry no DuckDB oracle (their
  * internals are engine-specific); ScaleOpsSpec bounds them against the
  * exact answers instead. The engine's OWN HLL is oracle-checked — its
  * md5-derived hash and integer-exact estimator replay in SQL.
  */
object ScaleOps extends QueryModule {

  override val defs: Seq[(String, Q)] = Seq(

    // HLL++ distincts + approximate quantiles in one pass — the form the
    // exact multi-distinct queries take when the key set no longer fits
    // a hash table per group. Declared as a BOUND DIFFERENTIAL so the
    // engine-specific sketches still get a hard oracle row: the exact
    // answers ride alongside (hash-compared — DuckDB recomputes them)
    // and each sketch collapses to a boolean "within its error
    // contract" that the oracle asserts TRUE. Bounds: 3σ of the default
    // rsd=0.05 for HLL (±2 absolute floor — sparse mode is exact at
    // tiny cardinality, so the floor only absorbs integer rounding);
    // percentile_approx(accuracy=10000) guarantees rank error ≤ 1e-4·n,
    // checked against the exact interpolated percentiles at q ∓ 0.002
    // (a 20× rank margin, still a ±0.2%-rank assertion). One aggregate
    // pass over the scan, exactly as before — the exact twins are
    // O(distinct) hash-agg / single-group percentile state, the audit
    // cost a sketch-vs-exact differential pays at any scale.
    "evt_approx_stats" -> Q(
      (s, dir) =>
        Tables.events(s, dir).agg(
          count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("exact_users"),
          count_distinct(col("event_type")).as("exact_types"),
          approx_count_distinct(col("user_id")).as("au"),
          approx_count_distinct(col("event_type")).as("aty"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("ap50"),
          percentile_approx(col("value"), lit(0.99), lit(10000)).as("ap99"),
          expr("percentile(value, 0.498d)").as("p50lo"),
          expr("percentile(value, 0.502d)").as("p50hi"),
          expr("percentile(value, 0.988d)").as("p99lo"),
          expr("percentile(value, 0.992d)").as("p99hi"))
        .select(col("n_events"), col("exact_users"), col("exact_types"),
          (abs(col("au") - col("exact_users")) <=
            greatest(ceil(col("exact_users") * 0.15), lit(2L))).as("users_ok"),
          (abs(col("aty") - col("exact_types")) <=
            greatest(ceil(col("exact_types") * 0.15), lit(2L))).as("types_ok"),
          // empty table: the percentile aggregates are all NULL and the
          // band comparison yields NULL, while the oracle's constant
          // says TRUE — vacuously in-contract, so coalesce the
          // degenerate case to TRUE instead of tripping the differ.
          // (The ±0.002 interpolated band itself assumes n large enough
          // that the band spans ≥1 rank — every fixture SF is ≥10k
          // events; at n below ~500 the exact interpolation can sit
          // between adjacent ranks and a correct sketch could read
          // outside it.)
          coalesce(col("ap50") >= col("p50lo") && col("ap50") <= col("p50hi"),
            lit(true)).as("p50_ok"),
          coalesce(col("ap99") >= col("p99lo") && col("ap99") <= col("p99hi"),
            lit(true)).as("p99_ok")),
      Some("""SELECT count(*) AS n_events,
             |  count(DISTINCT user_id) AS exact_users,
             |  count(DISTINCT event_type) AS exact_types,
             |  TRUE AS users_ok, TRUE AS types_ok,
             |  TRUE AS p50_ok, TRUE AS p99_ok
             |FROM events""".stripMargin),
      doc = "HLL++ multi-distinct + approx quantiles, bound-checked against exact twins (scale path of A4)"),

    // Exact-quantile twin of evt_approx_stats' percentile_approx half:
    // type-1 p50/p99 of `value` per event_type by integer rank selection
    // (row ceil(q·n) of the (value, event_id)-sorted group). Gives the
    // sketch query an oracle-checked exact counterpart (the same pairing
    // discipline as evt_hll_program_reach for HLL): the approx result is
    // bounded against THIS in ScaleOpsSpec, and THIS is hash-compared
    // against DuckDB. Selection picks an existing double (no
    // interpolation), so parity is exact; round only on output. The
    // oracle window orders NULLS FIRST to match Spark's ASC default
    // (DuckDB defaults NULLS LAST) — moot on this fixture, load-bearing
    // the day dirty data brings a null value.
    "evt_value_quantiles" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        Tables.events(s, dir)
          .select(col("event_type"), col("event_id"), col("value"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1))
            .over(Window.partitionBy(col("event_type"))))
          .groupBy(col("event_type"))
          .agg(
            max(col("n")).as("n_events"),
            round(max(when(col("rk") === expr("(n * 50 + 99) div 100"), col("value"))), 4)
              .as("p50_value"),
            round(max(when(col("rk") === expr("(n * 99 + 99) div 100"), col("value"))), 4)
              .as("p99_value"))
          .orderBy(col("event_type"))
      },
      Some("""WITH r AS (
             |  SELECT event_type, value,
             |    ROW_NUMBER() OVER (PARTITION BY event_type
             |      ORDER BY value NULLS FIRST, event_id) AS rk,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events)
             |SELECT event_type, max(n) AS n_events,
             | round(max(CASE WHEN rk = (n * 50 + 99) // 100 THEN value END), 4) AS p50_value,
             | round(max(CASE WHEN rk = (n * 99 + 99) // 100 THEN value END), 4) AS p99_value
             |FROM r GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin),
      doc = "exact per-type value quantiles (oracle-checked twin of the sketch)"),

    // Sketch-based per-group distincts (the A3 shape at scale), in the
    // same bound-differential form as evt_approx_stats: exact per-group
    // distincts ride along (oracle-recomputed), the sketch collapses to
    // a 3σ-of-rsd=0.01 boolean the oracle asserts TRUE. The exact twin
    // shares the one grouped aggregate — no extra scan.
    "evt_approx_program_reach" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            count_distinct(col("user_id")).as("exact_wallets"),
            approx_count_distinct(col("user_id"), rsd = 0.01).as("aw"))
          .select(col("event_type"), col("cnt"), col("exact_wallets"),
            (abs(col("aw") - col("exact_wallets")) <=
              greatest(ceil(col("exact_wallets") * 0.03), lit(2L))).as("wallets_ok"))
          .orderBy(col("cnt").desc, col("event_type")),
      Some("""SELECT event_type, count(*) AS cnt,
             |  count(DISTINCT user_id) AS exact_wallets,
             |  TRUE AS wallets_ok
             |FROM events GROUP BY 1
             |ORDER BY cnt DESC, event_type NULLS FIRST""".stripMargin),
      doc = "per-group HLL distinct bound-checked against the exact twin (scale path of A3)"),

    // Same shape through the engine's OWN TypedImperativeAggregate HLL
    // sketch (graft.functions.HllAggregate) — constant-size mergeable
    // buffers per group. The oracle RE-IMPLEMENTS the sketch in SQL
    // (60-bit md5 hash → 4096 registers → integer-exact estimator with
    // linear-counting correction): a full differential test of the
    // custom aggregate, possible because the estimate is deterministic
    // by construction (max-merge registers + integer register sum).
    "evt_hll_program_reach" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            graft.functions.HllAggregate.hll_distinct(col("user_id")).as("hll_wallets"))
          .orderBy(col("cnt").desc, col("event_type")),
      // p=12: m=4096 buckets on the top 12 of 60 hash bits, 48-bit rank
      // window, scale 2^49; e-notation literals force DOUBLE (a bare
      // 1.079 is DECIMAL in DuckDB and would divide differently).
      Some("""WITH h AS (
             |  SELECT event_type,
             |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
             |  FROM events),
             |regs AS (
             |  SELECT event_type, h >> 48 AS j,
             |    max(49 - CASE WHEN (h & 281474976710655) = 0 THEN 0
             |          ELSE length(bin(h & 281474976710655)) END) AS r
             |  FROM h GROUP BY 1, 2),
             |counts AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
             |allregs AS (
             |  SELECT b.event_type, b.j, coalesce(regs.r, 0) AS r
             |  FROM (SELECT c.event_type, g.j
             |        FROM counts c, UNNEST(generate_series(0, 4095)) AS g(j)) b
             |  -- IS NOT DISTINCT FROM: a NULL event_type is a real group
             |  -- in the engine's groupBy; an equality join would drop it
             |  LEFT JOIN regs ON regs.event_type IS NOT DISTINCT FROM b.event_type
             |    AND regs.j = b.j),
             |est AS (
             |  SELECT event_type,
             |    CAST(sum(CAST(1 AS BIGINT) << (49 - r)) AS DOUBLE) AS s,
             |    count(*) FILTER (WHERE r = 0) AS zeros
             |  FROM allregs GROUP BY 1)
             |SELECT c.event_type, c.cnt,
             |  CAST(CASE WHEN (0.7213e0 / (1e0 + 1.079e0 / 4096)) * 4096 * 4096 * 562949953421312e0 / s <= 2.5e0 * 4096
             |             AND zeros > 0
             |    THEN round(4096 * ln(4096e0 / zeros))
             |    ELSE round((0.7213e0 / (1e0 + 1.079e0 / 4096)) * 4096 * 4096 * 562949953421312e0 / s) END AS BIGINT)
             |    AS hll_wallets
             |FROM counts c JOIN est ON c.event_type IS NOT DISTINCT FROM est.event_type
             |ORDER BY cnt DESC, c.event_type NULLS FIRST""".stripMargin),
      doc = "custom TypedImperativeAggregate HLL sketch, oracle-rederived in SQL (SURVEY §7.3)"),

    // Sketch RE-AGGREGATION — the reason a 100 TB warehouse stores
    // sketches instead of estimates: one m-byte hll_sketch per
    // (event_type, day) grain cell, rolled up to all-time reach by
    // hll_union_est (register-wise max) WITHOUT rescanning the fact
    // table. Register max is associative and commutative, so
    // union-of-daily-sketches ≡ one sketch over all rows — which is
    // exactly what the oracle states (the same global-register SQL as
    // evt_hll_program_reach): any bug in sketch serialization, binary
    // round-tripping, or the merge changes the estimate and turns the
    // row red. n_days pins the grain (a lost day cell is invisible to
    // the union — max absorbs it — but not to the count).
    "evt_hll_sketch_rollup" -> Q(
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day_idx"), col("user_id"))
          .groupBy(col("event_type"), col("day_idx"))
          .agg(graft.functions.HllAggregate.hll_sketch(col("user_id")).as("sk"))
        daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            graft.functions.HllAggregate.hll_union_est(col("sk")).as("hll_wallets"))
          .orderBy(col("event_type"))
      },
      // n_days counts DISTINCT (type, day) cells via a distinct
      // subquery, not count(DISTINCT day): a null-ts day is a real
      // grain cell in the engine's groupBy and count(DISTINCT) would
      // drop it
      Some("""WITH h AS (
             |  SELECT event_type,
             |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
             |  FROM events),
             |regs AS (
             |  SELECT event_type, h >> 48 AS j,
             |    max(49 - CASE WHEN (h & 281474976710655) = 0 THEN 0
             |          ELSE length(bin(h & 281474976710655)) END) AS r
             |  FROM h GROUP BY 1, 2),
             |days AS (SELECT DISTINCT event_type,
             |           epoch_ns(ts) // 86400000000000 AS d FROM events),
             |ndays AS (SELECT event_type, count(*) AS n_days FROM days GROUP BY 1),
             |allregs AS (
             |  SELECT b.event_type, b.j, coalesce(regs.r, 0) AS r
             |  FROM (SELECT nd.event_type, g.j
             |        FROM ndays nd, UNNEST(generate_series(0, 4095)) AS g(j)) b
             |  LEFT JOIN regs ON regs.event_type IS NOT DISTINCT FROM b.event_type
             |    AND regs.j = b.j),
             |est AS (
             |  SELECT event_type,
             |    CAST(sum(CAST(1 AS BIGINT) << (49 - r)) AS DOUBLE) AS s,
             |    count(*) FILTER (WHERE r = 0) AS zeros
             |  FROM allregs GROUP BY 1)
             |SELECT nd.event_type, nd.n_days,
             |  CAST(CASE WHEN (0.7213e0 / (1e0 + 1.079e0 / 4096)) * 4096 * 4096 * 562949953421312e0 / s <= 2.5e0 * 4096
             |             AND zeros > 0
             |    THEN round(4096 * ln(4096e0 / zeros))
             |    ELSE round((0.7213e0 / (1e0 + 1.079e0 / 4096)) * 4096 * 4096 * 562949953421312e0 / s) END AS BIGINT)
             |    AS hll_wallets
             |FROM ndays nd JOIN est ON nd.event_type IS NOT DISTINCT FROM est.event_type
             |ORDER BY nd.event_type NULLS FIRST""".stripMargin),
      doc = "HLL sketch re-aggregation: per-day binary sketches union-merged to all-time reach; oracle = the global-register formula, so merge/serialization bugs go red"),

    // Bloom-filter membership probe — the at-scale primitive for "has
    // this key been seen?" without shuffling the corpus. Keys are
    // (user_id, props.k) pairs; the first half (ts < anchor) builds the
    // filter, the second half probes it (~28% true members on this
    // fixture, so both outcomes are exercised). The filter SIZES ITSELF
    // to the corpus: m_words = next power of two above n/4 (integer
    // bit-length arithmetic — no float, engine-identical), giving ~8
    // bits/key and a small, visible false-positive rate at ANY corpus
    // size. 32-bit words keep every shift below bit 63 (DuckDB rejects
    // 1<<63); masks combine via bit_or, an order-free integer
    // aggregate; k=3 md5-derived hashes replay bit-for-bit in SQL, so
    // unlike the engine-internal bloom of a shuffle join THIS sketch is
    // oracle-exact. No false negative is possible (members set their
    // own bits — asserted in ScaleOpsSpec). At 100 TB the filter is a
    // tiny word-indexed table built in one corpus scan and broadcast;
    // the probe side never shuffles.
    "evt_bloom_probe" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(Tables.propK().isNotNull)
          .select(col("user_id"), Tables.propK().as("k"), col("ts"))
        val key = concat(col("user_id").cast("string"), lit("_"),
          col("k").cast("string")).as("key")
        val corpus = ev.filter(col("ts") < Tables.AnchorNs).select(key).distinct()
        val batch = ev.filter(col("ts") >= Tables.AnchorNs).select(key).distinct()
        val sized = corpus.agg(count(lit(1)).as("n"))
          .select(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(greatest(n div 4, CAST(4 AS BIGINT)))) AS INT))")
            .as("mw"))
        def slots(df: org.apache.spark.sql.DataFrame) = df
          .select(col("key"), explode(array(lit(0), lit(1), lit(2))).as("j"))
          .crossJoin(broadcast(sized))
          .withColumn("slot", conv(substring(md5(
            concat(lit("bl"), col("j").cast("string"), lit(":"), col("key"))),
            1, 15), 16, 10).cast("long") % (col("mw") * 32L))
          .withColumn("word", expr("slot div 32"))
          .withColumn("mask",
            expr("shiftleft(CAST(1 AS BIGINT), CAST(slot % 32 AS INT))"))
        val bloom = slots(corpus).groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
        val probe = slots(batch)
          .join(broadcast(bloom), Seq("word"), "left")
          .groupBy(col("key"))
          .agg(min(when(col("bits").bitwiseAND(col("mask")) =!= 0L, 1L)
            .otherwise(0L)).as("hit"))
        probe.join(corpus.withColumn("m", lit(1L)), Seq("key"), "left")
          .select(col("hit"), coalesce(col("m"), lit(0L)).as("member"))
          .agg(
            count(lit(1)).as("n_batch"),
            sum(col("hit")).as("n_bloom_hits"),
            sum(col("member")).as("n_members"),
            count(when(col("hit") === 1L && col("member") === 0L, 1)).as("n_false_pos"))
      },
      Some(s"""WITH e AS (
              |  SELECT CAST(user_id AS VARCHAR) || '_' ||
              |    CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) AS VARCHAR) AS key,
              |    epoch_ns(ts) AS tns
              |  FROM events WHERE json_extract_string(props, '$$.k') IS NOT NULL),
              |corpus AS (SELECT DISTINCT key FROM e WHERE tns < ${Tables.AnchorNs}),
              |batch AS (SELECT DISTINCT key FROM e WHERE tns >= ${Tables.AnchorNs}),
              |sized AS (
              |  SELECT CAST(1 AS BIGINT) << CAST(length(bin(greatest(n // 4, CAST(4 AS BIGINT)))) AS INTEGER) AS mw
              |  FROM (SELECT count(*) AS n FROM corpus)),
              |cs AS (
              |  SELECT key,
              |    ('0x' || substr(md5('bl' || j || ':' || key), 1, 15))::BIGINT % (mw * 32) AS slot
              |  FROM corpus, UNNEST([0, 1, 2]) AS u(j), sized),
              |bloom AS (
              |  SELECT slot // 32 AS word,
              |    bit_or(CAST(1 AS BIGINT) << CAST(slot % 32 AS INTEGER)) AS bits
              |  FROM cs GROUP BY 1),
              |bs AS (
              |  SELECT key,
              |    ('0x' || substr(md5('bl' || j || ':' || key), 1, 15))::BIGINT % (mw * 32) AS slot
              |  FROM batch, UNNEST([0, 1, 2]) AS u(j), sized),
              |probe AS (
              |  SELECT bs.key,
              |    min(CASE WHEN (bl.bits & (CAST(1 AS BIGINT) << CAST(bs.slot % 32 AS INTEGER))) <> 0
              |        THEN 1 ELSE 0 END) AS hit
              |  FROM bs LEFT JOIN bloom bl ON bs.slot // 32 = bl.word
              |  GROUP BY 1),
              |m AS (
              |  SELECT p.key, p.hit,
              |    CASE WHEN c.key IS NULL THEN 0 ELSE 1 END AS member
              |  FROM probe p LEFT JOIN corpus c USING (key))
              |SELECT count(*) AS n_batch,
              | CAST(sum(hit) AS BIGINT) AS n_bloom_hits,
              | CAST(sum(member) AS BIGINT) AS n_members,
              | count(*) FILTER (WHERE hit = 1 AND member = 0) AS n_false_pos
              |FROM m""".stripMargin),
      doc = "oracle-exact self-sizing Bloom filter (k=3 md5 hashes) build + probe"),

    // Count-min sketch — the bounded-memory frequency estimator: 4 rows
    // × 256 md5-hashed columns counting (user_id, props.k) occurrences;
    // estimate = min over rows of the addressed cells. Integer-exact
    // and md5-replayable, so the oracle rebuilds the identical sketch;
    // the one-sided error (estimate ≥ exact, asserted in ScaleOpsSpec
    // and visible in the overestimate column — thousands of keys share
    // 256 columns here, so collisions actually bite) is the CMS
    // contract. Top-k runs as TakeOrderedAndProject FIRST; the rank
    // window sees only the 10 survivors. At 100 TB the sketch is a
    // fixed 1024-cell aggregation with map-side partials; estimates
    // join the tiny sketch broadcast.
    "evt_cms_topk" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(Tables.propK().isNotNull)
          .select(concat(col("user_id").cast("string"), lit("_"),
            Tables.propK().cast("string")).as("key"))
        def cellOf(r: org.apache.spark.sql.Column) =
          conv(substring(md5(concat(lit("cm"), r.cast("string"), lit(":"),
            col("key"))), 1, 15), 16, 10).cast("long") % 256L
        val rows = ev.select(col("key"),
          explode(array(lit(0), lit(1), lit(2), lit(3))).as("r"))
          .withColumn("c", cellOf(col("r")))
        val cms = rows.groupBy(col("r"), col("c")).agg(count(lit(1)).as("cell_cnt"))
        val exact = ev.groupBy(col("key")).agg(count(lit(1)).as("exact_cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("exact_cnt").desc, col("key"))
        val top = exact.orderBy(col("exact_cnt").desc, col("key")).limit(10)
          .withColumn("rank", row_number().over(w).cast("long"))
        top
          .select(col("rank"), col("key"), col("exact_cnt"),
            explode(array(lit(0), lit(1), lit(2), lit(3))).as("r"))
          .withColumn("c", cellOf(col("r")))
          .join(broadcast(cms), Seq("r", "c"))
          .groupBy(col("rank"), col("key"), col("exact_cnt"))
          .agg(min(col("cell_cnt")).as("cms_est"))
          .withColumn("overestimate", col("cms_est") - col("exact_cnt"))
          .select(col("rank"), col("key"), col("exact_cnt"), col("cms_est"),
            col("overestimate"))
          .orderBy(col("rank"))
      },
      Some("""WITH e AS (
             |  SELECT CAST(user_id AS VARCHAR) || '_' ||
             |    CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS VARCHAR) AS key
             |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
             |rows_ AS (
             |  SELECT key, j AS r,
             |    ('0x' || substr(md5('cm' || j || ':' || key), 1, 15))::BIGINT % 256 AS c
             |  FROM e, UNNEST([0, 1, 2, 3]) AS u(j)),
             |cms AS (SELECT r, c, count(*) AS cell_cnt FROM rows_ GROUP BY 1, 2),
             |exact AS (SELECT key, count(*) AS exact_cnt FROM e GROUP BY 1),
             |top AS (
             |  SELECT * FROM (
             |    SELECT key, exact_cnt,
             |      ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, key NULLS FIRST) AS rank
             |    FROM exact) WHERE rank <= 10),
             |tc AS (
             |  SELECT t.rank, t.key, t.exact_cnt, u.j AS r,
             |    ('0x' || substr(md5('cm' || u.j || ':' || t.key), 1, 15))::BIGINT % 256 AS c
             |  FROM top t, UNNEST([0, 1, 2, 3]) AS u(j)),
             |est AS (
             |  SELECT rank, key, exact_cnt, min(cell_cnt) AS cms_est
             |  FROM tc JOIN cms USING (r, c)
             |  GROUP BY 1, 2, 3)
             |SELECT rank, key, exact_cnt, cms_est,
             | CAST(cms_est - exact_cnt AS BIGINT) AS overestimate
             |FROM est ORDER BY rank""".stripMargin),
      doc = "oracle-exact count-min sketch (4x256) frequency estimates for the top-10 keys"),

    // Distribution-drift monitor: L1 distance between each event_type's
    // props.k distribution before and after the anchor — the check a
    // training pipeline runs per ingest batch to catch upstream shifts.
    // A type with events on only ONE side (a brand-new or vanished type
    // — the sharpest upstream shift) reports the L1 maximum 2.0 rather
    // than 0/0 NaN.
    // Exactness trick: Σ|c1/T1 − c2/T2| = Σ|c1·T2 − c2·T1| / (T1·T2),
    // so the whole statistic is 64-bit-integer arithmetic until ONE
    // final division (identical doubles on both engines; i64 holds to
    // ~3e9 events per type-half — far past this fixture, noted for web
    // scale). One scan: both halves count in a single conditional
    // aggregation, then a per-type rollup — two keyed shuffles total,
    // both with map-side partials.
    "evt_drift_l1" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(Tables.propK().isNotNull)
          .select(col("event_type"), Tables.propK().as("k"),
            (col("ts") >= Tables.AnchorNs).as("late"))
        val c = ev.groupBy(col("event_type"), col("k"))
          .agg(count(when(!col("late"), 1)).as("c1"),
            count(when(col("late"), 1)).as("c2"))
        val t = c.groupBy(col("event_type"))
          .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
        c.join(t, Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(
            max(col("t1")).as("t1_events"),
            max(col("t2")).as("t2_events"),
            sum(abs(col("c1") * col("t2") - col("c2") * col("t1"))).as("d"))
          .select(col("event_type"), col("t1_events"), col("t2_events"),
            when(col("t1_events") === 0L || col("t2_events") === 0L, lit(2.0))
              .otherwise(round(col("d").cast("double")
                / (col("t1_events") * col("t2_events")).cast("double"), 4))
              .as("l1_drift"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH e AS (
              |  SELECT event_type,
              |    CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
              |    epoch_ns(ts) >= ${Tables.AnchorNs} AS late
              |  FROM events WHERE json_extract_string(props, '$$.k') IS NOT NULL),
              |c AS (
              |  SELECT event_type, k,
              |    count(*) FILTER (WHERE NOT late) AS c1,
              |    count(*) FILTER (WHERE late) AS c2
              |  FROM e GROUP BY 1, 2),
              |t AS (
              |  SELECT event_type, CAST(sum(c1) AS BIGINT) AS t1,
              |    CAST(sum(c2) AS BIGINT) AS t2
              |  FROM c GROUP BY 1)
              |SELECT c.event_type,
              | max(t.t1) AS t1_events, max(t.t2) AS t2_events,
              | CASE WHEN max(t.t1) = 0 OR max(t.t2) = 0 THEN 2.0e0
              |   ELSE round(CAST(sum(abs(c1 * t2 - c2 * t1)) AS DOUBLE)
              |     / CAST(max(t.t1) * max(t.t2) AS DOUBLE), 4) END AS l1_drift
              |FROM c JOIN t USING (event_type)
              |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin),
      doc = "integer-exact L1 distribution drift per event_type across the anchor"),

    // Daily-count anomaly detection: z-score of each (event_type, day)
    // count against its trailing 7-day window — the volume-monitoring
    // alarm a pipeline runs on every ingest partition. Exactness: with
    // window sums s1 = Σx and s2 = Σx², z = (7x − s1)/sqrt(7·s2 − s1²)
    // — two exact integers into one IEEE sqrt (correctly rounded on
    // both engines) and one division, so the doubles match bit-for-bit;
    // the |z| > 3 flag compares those raw doubles. Warm-up rows (fewer
    // than 7 prior days) emit NULL rather than a z against a short
    // window. Scale shape: one grouped count, then a per-type window
    // ordered by day — partition-parallel across types/key ranges, no
    // join at all.
    "evt_anomaly_daily" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("ts div 86400000000000").as("day_idx"))
          .agg(count(lit(1)).as("cnt"))
        // densify: a day with ZERO events (the canonical outage) must
        // still get a row, or it can never be flagged and gaps silently
        // stretch the "7-day" window across calendar weeks. The spine is
        // per-type min..max — a tiny broadcast join, never corpus-sized.
        val spine = daily.groupBy(col("event_type"))
          .agg(min(col("day_idx")).as("d0"), max(col("day_idx")).as("d1"))
          .select(col("event_type"),
            explode(expr("sequence(d0, d1)")).as("day_idx"))
        val dense = spine.join(daily, Seq("event_type", "day_idx"), "left")
          .select(col("event_type"), col("day_idx"),
            coalesce(col("cnt"), lit(0L)).as("cnt"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
          .rowsBetween(-7, -1)
        val scored = dense
          .withColumn("n_prior", count(col("cnt")).over(w))
          .withColumn("s1", sum(col("cnt")).over(w))
          .withColumn("s2", sum(col("cnt") * col("cnt")).over(w))
          // zero-variance guard: 7 identical prior days make the z
          // denominator 0 — an INTEGER predicate (7·s2 = s1²) decides
          // that case on both engines instead of shipping 0/0 NaN
          .withColumn("varz", col("s2") * 7L === col("s1") * col("s1"))
          .withColumn("zr", when(col("n_prior") === 7L && !col("varz"),
            (col("cnt") * 7L - col("s1")).cast("double")
              / sqrt((col("s2") * 7L - col("s1") * col("s1")).cast("double"))))
        // flag on the RAW double (what the oracle compares), round only
        // for output — a z of 3.00004 must flag identically on both
        // sides. Zero-variance windows: z is NULL; any deviation from
        // the constant baseline (7x ≠ s1, integer compare) flags.
        scored.select(col("event_type"), col("day_idx"), col("cnt"),
            round(col("zr"), 4).as("z"),
            when(col("n_prior") =!= 7L, lit(null).cast("long"))
              .otherwise(when(col("varz"),
                when(col("cnt") * 7L =!= col("s1"), 1L).otherwise(0L))
                .otherwise(when(abs(col("zr")) > 3.0, 1L).otherwise(0L)))
              .as("anomaly"))
          .orderBy(col("event_type"), col("day_idx"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
             |    count(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |spine AS (
             |  SELECT event_type, d AS day_idx
             |  FROM (SELECT event_type, min(day_idx) AS d0, max(day_idx) AS d1
             |        FROM daily GROUP BY 1) b, UNNEST(generate_series(b.d0, b.d1)) AS u(d)),
             |dense AS (
             |  SELECT s.event_type, s.day_idx, coalesce(d.cnt, 0) AS cnt
             |  FROM spine s LEFT JOIN daily d USING (event_type, day_idx)),
             |scored AS (
             |  SELECT event_type, day_idx, cnt,
             |    count(cnt) OVER w AS n_prior,
             |    CAST(sum(cnt) OVER w AS BIGINT) AS s1,
             |    CAST(sum(cnt * cnt) OVER w AS BIGINT) AS s2
             |  FROM dense
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
             |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, day_idx, cnt,
             | CASE WHEN n_prior = 7 AND s2 * 7 <> s1 * s1 THEN
             |   round(CAST(cnt * 7 - s1 AS DOUBLE)
             |     / sqrt(CAST(s2 * 7 - s1 * s1 AS DOUBLE)), 4) END AS z,
             | CASE WHEN n_prior <> 7 THEN NULL
             |   WHEN s2 * 7 = s1 * s1 THEN
             |     CAST(CASE WHEN cnt * 7 <> s1 THEN 1 ELSE 0 END AS BIGINT)
             |   ELSE
             |     CAST(CASE WHEN abs(CAST(cnt * 7 - s1 AS DOUBLE)
             |       / sqrt(CAST(s2 * 7 - s1 * s1 AS DOUBLE))) > 3.0e0
             |       THEN 1 ELSE 0 END AS BIGINT) END AS anomaly
             |FROM scored ORDER BY 1 NULLS FIRST, 2""".stripMargin),
      doc = "trailing-window z-score anomaly flags on dense daily counts (integer-exact)"),

    // Equi-width value histogram per event type: one grouped pass,
    // fixed 50-unit buckets (floor of one IEEE division — bit-identical
    // bucketing on both engines), integer bucket bounds derived from
    // the bucket id. The binned complement of evt_value_quantiles:
    // histograms are the monitoring artifact that survives at 100 TB
    // because the group count is bounded by range/width, not rows.
    "evt_value_histogram" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"),
            floor(col("value") / lit(50.0)).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .withColumn("lo", col("bucket") * 50)
          .withColumn("hi", (col("bucket") + 1) * 50)
          .select(col("event_type"), col("bucket"), col("lo"), col("hi"), col("n"))
          .orderBy(col("event_type"), col("bucket")),
      Some("""SELECT event_type,
             |  CAST(floor(value / 50.0e0) AS BIGINT) AS bucket,
             |  CAST(floor(value / 50.0e0) AS BIGINT) * 50 AS lo,
             |  (CAST(floor(value / 50.0e0) AS BIGINT) + 1) * 50 AS hi,
             |  count(*) AS n
             |FROM events GROUP BY 1, 2
             |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin),
      doc = "equi-width per-type value histogram (bounded group count)"),

    // Histogram-sketch RE-AGGREGATION — the quantile twin of
    // evt_hll_sketch_rollup: the warehouse stores one tiny (bucket, n)
    // histogram per day (the daily monitoring artifact), and later
    // rollups merge SKETCHES ONLY — the weekly quantile read-out below
    // touches the daily bin rows, never rescans the fact table. Merge
    // is bin-wise count addition (associative, order-free, partial-agg
    // friendly), and the approx quantile is the smallest bucket whose
    // cumulative count crosses the rank — INTEGER arithmetic end to end
    // (2·cum ≥ N for p50, 10·cum ≥ 9·N for p90), so parity is exact.
    // Error is bounded by the bin width (50), the classic fixed-bin
    // trade: at 100 TB the daily artifact is O(bins) per grain cell
    // regardless of event count. Timeless/valueless rows are
    // quarantined explicitly (a histogram can neither place nor bin
    // them) — both engines share the filter.
    "evt_histogram_rollup" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("value").isNotNull)
          .groupBy(expr("ts div 86400000000000").as("day"),
            floor(col("value") / lit(50.0)).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
        val weekly = daily
          .groupBy(expr("day div 7").as("week"), col("bucket"))
          .agg(sum(col("n")).as("n"))
        val cumW = Window.partitionBy(col("week")).orderBy(col("bucket"))
        weekly
          .withColumn("cum", sum(col("n")).over(cumW))
          .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("week"))))
          .groupBy(col("week"))
          .agg(max(col("tot")).as("n_events"),
            count(lit(1)).as("n_bins"),
            (min(when(col("cum") * 2 >= col("tot"), col("bucket"))) * 50)
              .as("p50_lo"),
            (min(when(col("cum") * 10 >= col("tot") * 9, col("bucket"))) * 50)
              .as("p90_lo"),
            (max(col("bucket")) * 50).as("max_lo"))
          .orderBy(col("week"))
      },
      Some(s"""WITH daily AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day,
             |    CAST(floor(value / 50.0e0) AS BIGINT) AS bucket,
             |    count(*) AS n
             |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |weekly AS (
             |  SELECT day // 7 AS week, bucket, CAST(sum(n) AS BIGINT) AS n
             |  FROM daily GROUP BY 1, 2),
             |c AS (
             |  SELECT *,
             |    sum(n) OVER (PARTITION BY week ORDER BY bucket
             |      ROWS UNBOUNDED PRECEDING) AS cum,
             |    sum(n) OVER (PARTITION BY week) AS tot
             |  FROM weekly)
             |SELECT week, CAST(max(tot) AS BIGINT) AS n_events,
             |  count(*) AS n_bins,
             |  min(CASE WHEN cum * 2 >= tot THEN bucket END) * 50 AS p50_lo,
             |  min(CASE WHEN cum * 10 >= tot * 9 THEN bucket END) * 50 AS p90_lo,
             |  max(bucket) * 50 AS max_lo
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "histogram-sketch rollup: daily (bucket, n) artifacts merged bins-only into weekly integer-exact approx p50/p90 — the fact table is never rescanned"),
  )
}
