package graft.analytics

import graft.{Q, QueryModule, Tables}
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's six analytics families (10 result tables,
  * /root/reference/src/analytics.rs:7-32) re-expressed as single-pass Spark
  * plans over the `events` stand-in table (FIXTURES.md §2 column mapping).
  *
  * Deliberate strictly-better deviations (SURVEY.md §7.5):
  *  - the per-program trend loop (analytics.rs:674-709) becomes one
  *    semi-join + grouped plan;
  *  - the three separate distinct-count queries (analytics.rs:413-438)
  *    become one multi-distinct aggregate;
  *  - today/week/month scalar queries (analytics.rs:251-316) become one
  *    conditional aggregation — one scan instead of four.
  *
  * Every relative-time predicate is re-anchored to the fixed literal
  * anchor in [[graft.Tables]] (epoch-nanos) so the DuckDB oracle is
  * deterministic; comparisons happen on the raw int64 nanos column on
  * both engines (no timestamp-precision skew possible).
  */
object EventAnalytics extends QueryModule {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  // DuckDB-side fragments mirroring Tables' column helpers.
  //
  // Integer-division parity, including PRE-EPOCH (negative) timestamps —
  // verified empirically against a negative TIMESTAMP(NANOS) parquet
  // fixture: DuckDB's BIGINT `//` truncates toward zero exactly like
  // Spark's `div` (-7 // 2 = -3 on both; (-1000) // 7 = -142, not the
  // floored -143), and DuckDB's parquet nanos→micros read conversion
  // also truncates toward zero (-1234567 ns reads as -1234 µs), matching
  // `ts div 1000` on the raw int64. Every `div`/`//` pair below (µs
  // projections, day buckets, week buckets) therefore agrees on both
  // engines for ANY sign of ts — do NOT "fix" these to floor-division,
  // which would diverge from DuckDB on negative operands.
  private val dNs = "epoch_ns(ts)"
  private val dDay = "strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')"

  override val defs: Seq[(String, Q)] = Seq(

    // A1: transaction volume — total/today/week/month in ONE pass
    // (vs 4 sequential scalar queries, analytics.rs:251-316).
    "evt_volume_summary" -> Q(
      (s, dir) =>
        ev(s, dir)
          .filter(col("event_type") === "purchase")
          .agg(
            count(lit(1)).as("total_events"),
            count(when(col("ts") >= AnchorNs && col("ts") < AnchorNextDayNs, 1)).as("today_events"),
            count(when(col("ts") >= WeekAgoNs, 1)).as("week_events"),
            count(when(col("ts") >= MonthAgoNs, 1)).as("month_events")),
      Some(s"""SELECT count(*) AS total_events,
              | count(*) FILTER (WHERE $dNs >= $AnchorNs AND $dNs < $AnchorNextDayNs) AS today_events,
              | count(*) FILTER (WHERE $dNs >= $WeekAgoNs) AS week_events,
              | count(*) FILTER (WHERE $dNs >= $MonthAgoNs) AS month_events
              |FROM events WHERE event_type = 'purchase'""".stripMargin),
      doc = "ref analytics.rs:243-326 (transaction volume, conditional agg)"),

    // A2: hourly volume over the fixed 24h window before the anchor
    // (analytics.rs:329-337: GROUP BY DATE, EXTRACT(HOUR)).
    "evt_hourly_volume" -> Q(
      (s, dir) =>
        ev(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("ts") >= DayBeforeAnchorNs && col("ts") < AnchorNs)
          .groupBy(tsDay().as("day"), tsHour().as("hour"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("day"), col("hour")),
      Some(s"""SELECT $dDay AS day,
              | CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour, count(*) AS cnt
              |FROM events
              |WHERE event_type = 'purchase' AND $dNs >= $DayBeforeAnchorNs AND $dNs < $AnchorNs
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "ref analytics.rs:329-357 (hourly volume)"),

    // A3: active programs — count, exact distinct wallets, last_seen
    // (analytics.rs:363-374); event_type plays program_id.
    "evt_active_programs" -> Q(
      (s, dir) =>
        ev(s, dir)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("tx_count"),
            countDistinct(col("user_id")).as("uniq_wallets"),
            expr("max(ts) div 1000").as("last_seen_us"))
          .orderBy(col("tx_count").desc, col("event_type"))
          .limit(50),
      Some(s"""SELECT event_type, count(*) AS tx_count,
              | count(DISTINCT user_id) AS uniq_wallets,
              | max($dNs) // 1000 AS last_seen_us
              |FROM events GROUP BY 1
              |-- NULLS FIRST pins the limit boundary: Spark's ASC tie-break
              |-- sorts a NULL group first, DuckDB's default sorts it last
              |ORDER BY tx_count DESC, event_type NULLS FIRST LIMIT 50""".stripMargin),
      doc = "ref analytics.rs:360-404 (active programs, COUNT DISTINCT + MAX)"),

    // A4: exact multi-distinct in ONE aggregate
    // (vs 3 separate queries, analytics.rs:413-438).
    "evt_distinct_counts" -> Q(
      (s, dir) =>
        ev(s, dir)
          .filter(col("event_type") === "purchase")
          .agg(
            count(lit(1)).as("transfer_count"),
            countDistinct(propK()).as("uniq_mints"),
            countDistinct(col("user_id")).as("uniq_wallets")),
      Some("""SELECT count(*) AS transfer_count,
             | count(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER)) AS uniq_mints,
             | count(DISTINCT user_id) AS uniq_wallets
             |FROM events WHERE event_type = 'purchase'""".stripMargin),
      doc = "ref analytics.rs:407-456 (token transfer multi-distinct)"),

    // A5: top tokens — per-mint count + distinct receivers, top-k with
    // total-order tie-break (analytics.rs:459-473).
    "evt_top_tokens" -> Q(
      (s, dir) =>
        ev(s, dir)
          .filter(col("event_type") === "purchase" && propK().isNotNull)
          .groupBy(propK().as("mint_k"))
          .agg(
            count(lit(1)).as("transfer_count"),
            countDistinct(col("user_id")).as("uniq_receivers"))
          .orderBy(col("transfer_count").desc, col("mint_k"))
          .limit(20),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS mint_k,
             | count(*) AS transfer_count, count(DISTINCT user_id) AS uniq_receivers
             |FROM events
             |WHERE event_type = 'purchase' AND json_extract_string(props, '$.k') IS NOT NULL
             |GROUP BY 1 ORDER BY transfer_count DESC, mint_k LIMIT 20""".stripMargin),
      doc = "ref analytics.rs:459-495 (top tokens)"),

    // A10: failure rate — ratio of conditional aggregates, one pass
    // (analytics.rs:499-519 computes it in Rust with a div-by-zero guard).
    "evt_failed_summary" -> Q(
      (s, dir) =>
        ev(s, dir)
          .agg(
            count(lit(1)).as("total_tx"),
            count(when(col("event_type") === "error", 1)).as("failed_tx"))
          .select(
            col("total_tx"), col("failed_tx"),
            when(col("total_tx") > 0,
              col("failed_tx").cast("double") * 100.0 / col("total_tx").cast("double"))
              .otherwise(0.0).as("failure_rate")),
      Some("""SELECT total_tx, failed_tx,
             | CASE WHEN total_tx > 0
             |   THEN CAST(failed_tx AS DOUBLE) * 100.0 / CAST(total_tx AS DOUBLE)
             |   ELSE 0.0 END AS failure_rate
             |FROM (SELECT count(*) AS total_tx,
             |        count(*) FILTER (WHERE event_type = 'error') AS failed_tx
             |      FROM events)""".stripMargin),
      doc = "ref analytics.rs:499-533 (failed transactions ratio)"),

    // A6: top error types — the JSONB err->>'type' grouping
    // (analytics.rs:536-549), with COALESCE default (P9).
    "evt_top_errors" -> Q(
      (s, dir) =>
        ev(s, dir)
          .filter(col("event_type") === "error")
          // promote-at-parse (SURVEY §1.3): one typed from_json
          // projection of the needed key AFTER the selective filter;
          // the aggregate then groups on an int column, never re-parsing
          // JSON per comparison in the hot path. Extract as STRING then
          // cast — from_json with 'k INT' would null out a
          // string-encoded number ({"k":"5"}) where both the old
          // get_json_object form and the DuckDB oracle yield 5.
          .select(coalesce(
            from_json(col("props"), "k STRING", Map.empty[String, String])
              .getField("k").cast("int"),
            lit(-1)).as("error_k"))
          .groupBy(col("error_k"))
          .agg(count(lit(1)).as("error_count"))
          .orderBy(col("error_count").desc, col("error_k"))
          .limit(10),
      Some("""SELECT coalesce(CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS error_k,
             | count(*) AS error_count
             |FROM events WHERE event_type = 'error'
             |GROUP BY 1 ORDER BY error_count DESC, error_k LIMIT 10""".stripMargin),
      doc = "ref analytics.rs:536-569 (top errors)"),

    // A8: wallet activity — three filtered exact-distincts in one pass
    // (vs 3 queries, analytics.rs:573-600).
    "evt_wallet_activity" -> Q(
      (s, dir) =>
        ev(s, dir)
          .agg(
            countDistinct(col("user_id")).as("active_total"),
            countDistinct(when(col("ts") >= AnchorNs && col("ts") < AnchorNextDayNs,
              col("user_id"))).as("active_today"),
            countDistinct(when(col("ts") >= WeekAgoNs, col("user_id"))).as("active_week")),
      Some(s"""SELECT count(DISTINCT user_id) AS active_total,
              | count(DISTINCT user_id) FILTER (WHERE $dNs >= $AnchorNs AND $dNs < $AnchorNextDayNs) AS active_today,
              | count(DISTINCT user_id) FILTER (WHERE $dNs >= $WeekAgoNs) AS active_week
              |FROM events""".stripMargin),
      doc = "ref analytics.rs:573-615 (wallet activity)"),

    // A7: top wallets — count + MIN/MAX first/last seen
    // (analytics.rs:619-633).
    "evt_top_wallets" -> Q(
      (s, dir) =>
        ev(s, dir)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("tx_count"),
            expr("min(ts) div 1000").as("first_seen_us"),
            expr("max(ts) div 1000").as("last_seen_us"))
          .orderBy(col("tx_count").desc, col("user_id"))
          .limit(20),
      Some(s"""SELECT user_id, count(*) AS tx_count,
              | min($dNs) // 1000 AS first_seen_us, max($dNs) // 1000 AS last_seen_us
              |FROM events GROUP BY 1
              |-- NULLS FIRST: same limit-boundary pin as evt_active_programs
              |ORDER BY tx_count DESC, user_id NULLS FIRST LIMIT 20""".stripMargin),
      doc = "ref analytics.rs:619-654 (top wallets MIN/MAX)"),

    // A9 + J2: per-program daily trends — the reference's top-10-then-
    // loop-per-program (analytics.rs:657-712) as ONE broadcast semi-join
    // + grouped plan. At 100 TB the loop would be k full scans; this is
    // one scan + one tiny broadcast.
    "evt_program_trends" -> Q(
      (s, dir) => {
        val e = ev(s, dir)
        val top = e.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("event_type")).limit(3)
          .select(col("event_type"))
        e.filter(col("ts") >= MonthAgoNs)
          .join(broadcast(top), Seq("event_type"), "left_semi")
          .groupBy(col("event_type"), tsDay().as("day"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("event_type"), col("day"))
      },
      Some(s"""WITH top3 AS (
              |  SELECT event_type FROM events GROUP BY 1
              |  -- NULLS FIRST pins which group takes the 3rd slot when a
              |  -- NULL event_type ties on count (Spark ASC sorts it first)
              |  ORDER BY count(*) DESC, event_type NULLS FIRST LIMIT 3)
              |SELECT e.event_type, $dDay AS day, count(*) AS cnt
              |FROM events e JOIN top3 USING (event_type)
              |WHERE $dNs >= $MonthAgoNs
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "ref analytics.rs:657-712 (program trends; loop → semi-join)"),

    // J4: pre/post netting the reference only sketches
    // (parsers.rs:179-182) — full-outer join of two aggregates with
    // COALESCE-0 diff semantics.
    "evt_user_net_activity" -> Q(
      (s, dir) => {
        val e = ev(s, dir)
        val p = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(count(lit(1)).as("purchases"))
        val r = e.filter(col("event_type") === "error")
          .groupBy(col("user_id")).agg(count(lit(1)).as("errors"))
        p.join(r, Seq("user_id"), "full_outer")
          .select(
            col("user_id"),
            coalesce(col("purchases"), lit(0L)).as("purchases"),
            coalesce(col("errors"), lit(0L)).as("errors"),
            (coalesce(col("purchases"), lit(0L)) - coalesce(col("errors"), lit(0L))).as("net"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             | coalesce(p.purchases, 0) AS purchases, coalesce(r.errors, 0) AS errors,
             | coalesce(p.purchases, 0) - coalesce(r.errors, 0) AS net
             |FROM (SELECT user_id, count(*) AS purchases FROM events
             |      WHERE event_type = 'purchase' GROUP BY 1) p
             |FULL JOIN (SELECT user_id, count(*) AS errors FROM events
             |           WHERE event_type = 'error' GROUP BY 1) r USING (user_id)
             |ORDER BY user_id NULLS FIRST""".stripMargin),
      doc = "ref parsers.rs:179-182 (pre/post balance netting, full-outer)"),

    // §1.3 VariantType path: the reference's JSONB column as Spark 4
    // variant — parse once, typed extraction after (the schema-on-read
    // contract of raw_payload without per-query string re-parsing).
    "evt_variant_props" -> Q(
      (s, dir) =>
        ev(s, dir)
          .select(expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
            col("value"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("cnt"))
          // null placement pinned explicitly: Spark sorts NULL first on
          // ASC, DuckDB last — a NULL-k group tying on cnt at the limit
          // boundary would otherwise keep different rows per engine.
          .orderBy(col("cnt").desc, col("k").asc_nulls_last)
          .limit(15),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             | count(*) AS cnt
             |FROM events GROUP BY 1 ORDER BY cnt DESC, k NULLS LAST LIMIT 15""".stripMargin),
      doc = "Spark 4 VariantType for the JSONB payload (SURVEY §1.3)"),

    // S3: single-record point lookup by key — the predicate reaches the
    // parquet scan as a pushed filter (rpc.rs:139-160's get_transaction
    // as a pushed-down scan instead of an RPC roundtrip).
    "evt_point_lookup" -> Q(
      (s, dir) =>
        ev(s, dir)
          .filter(col("event_id") === 4242L)
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts div 1000").as("ts_us"), col("value")),
      Some(s"""SELECT event_id, user_id, event_type, $dNs // 1000 AS ts_us, value
              |FROM events WHERE event_id = 4242""".stripMargin),
      doc = "ref rpc.rs:139-160 (S3 point lookup, pushed-down predicate)"),

    // S4: address-history scan with keyset pagination — predicate + sort
    // + limit, the Spark form of limit/before/until paging
    // (rpc.rs:162-187).
    "evt_address_history" -> Q(
      (s, dir) =>
        ev(s, dir)
          .filter(col("user_id") === 7L && col("ts") < AnchorNs)
          .orderBy(col("ts").desc, col("event_id"))
          .limit(25)
          .select(col("event_id"), expr("ts div 1000").as("ts_us"),
            col("event_type"), col("value")),
      Some(s"""SELECT event_id, $dNs // 1000 AS ts_us, event_type, value
              |FROM events WHERE user_id = 7 AND $dNs < $AnchorNs
              |ORDER BY $dNs DESC, event_id LIMIT 25""".stripMargin),
      doc = "ref rpc.rs:162-187 (S4 keyset pagination → filter+sort+limit)"),

    // As-of join (the temporal-join operator the prompt's custom-operator
    // ladder cites): each error event matched to the same user's most
    // recent purchase at-or-before it. Composed from built-ins per
    // preference (a) — tagged union + running `last(..., ignoreNulls)`
    // window, one shuffle on user_id — and cross-validated against
    // DuckDB's NATIVE ASOF JOIN, so two independent as-of
    // implementations must agree.
    "evt_asof_join" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = ev(s, dir).filter(col("event_type").isin("purchase", "error"))
        // secondary sort pins purchases BEFORE errors at equal ts
        // ('purchase' > 'error', hence desc), so an equal-ts purchase is
        // deterministically inside the error row's frame — matching the
        // DuckDB ASOF oracle's inclusive e.ts >= p.ts bound regardless
        // of shuffle order.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_type").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("last_purchase_ns",
            last(when(col("event_type") === "purchase", col("ts")), ignoreNulls = true)
              .over(w))
          .filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("ts_us"),
            // JOIN semantics on the NULL key: the window PARTITION BY
            // groups NULL users into one real partition (so a NULL-user
            // error would "see" a NULL-user purchase), but an as-of
            // JOIN never matches NULL = NULL — mask it
            when(col("user_id").isNotNull, expr("last_purchase_ns div 1000"))
              .as("last_purchase_us"))
          .orderBy(col("event_id"))
      },
      Some(s"""SELECT e.event_id, e.user_id, epoch_ns(e.ts) // 1000 AS ts_us,
              | epoch_ns(p.ts) // 1000 AS last_purchase_us
              |FROM (SELECT * FROM events WHERE event_type = 'error') e
              |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              |  ON e.user_id = p.user_id AND e.ts >= p.ts
              |ORDER BY e.event_id""".stripMargin),
      doc = "as-of join composed from window built-ins vs native ASOF oracle"),

    // Sessionization (gaps-and-islands): per-user sessions split on
    // idle gaps > 6h — the standard grouping for conversation/session
    // training examples and funnel analytics. One windowed lag + one
    // running sum + one grouped rollup. All arithmetic runs on integer
    // epoch-MICROS on both engines: the parquet ts carries real
    // sub-microsecond bits that DuckDB truncates at read time, so a
    // nanosecond-precision gap compare could split a session the oracle
    // doesn't (FIXTURES.md convention: bucket on `ts div 1000`).
    // ORDER BY (tus, event_id) makes the window order total (equal-ts
    // ties contribute gap 0 either way, but the frame order must still
    // be pinned).
    "evt_sessionize" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val gapUs = 6L * 3600L * 1000000L
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        val flagged = ev(s, dir)
          .withColumn("tus", expr("ts div 1000"))
          .withColumn("prev_tus", lag(col("tus"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_tus").isNull || col("tus") - col("prev_tus") > gapUs, 1L)
              .otherwise(0L))
        flagged
          .withColumn("session_idx",
            sum(col("new_sess")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(
            min(col("tus")).as("session_start_us"),
            max(col("tus")).as("session_end_us"),
            count(lit(1)).as("n_events"))
          .orderBy(col("user_id"), col("session_idx"))
      },
      Some(s"""WITH e AS (SELECT user_id, event_id, $dNs // 1000 AS tus FROM events),
              |flagged AS (
              |  SELECT user_id, event_id, tus,
              |    CASE WHEN lag(tus) OVER w IS NULL
              |              OR tus - lag(tus) OVER w > ${6L * 3600L * 1000000L}
              |         THEN 1 ELSE 0 END AS new_sess
              |  -- tus NULLS FIRST: a timeless row must occupy the same
              |  -- frame position as in Spark's ASC-nulls-first window
              |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus NULLS FIRST, event_id)),
              |sess AS (
              |  SELECT user_id, tus,
              |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus NULLS FIRST, event_id
              |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
              |  FROM flagged)
              |SELECT user_id, session_idx,
              | min(tus) AS session_start_us,
              | max(tus) AS session_end_us,
              | CAST(count(*) AS BIGINT) AS n_events
              |FROM sess GROUP BY user_id, session_idx
              |ORDER BY user_id NULLS FIRST, session_idx""".stripMargin),
      doc = "gaps-and-islands sessionization (6h idle gap; micros-exact both engines)"),

    // Event-type TRANSITION MATRIX — the first-order Markov statistics
    // a sequence model (next-event prediction, funnel simulation, bot
    // detection) trains on: per user, consecutive typed events within
    // the SAME 6h session gap as evt_sessionize form a (from → to)
    // transition; the matrix reports counts and the per-from row
    // distribution. One window pass over the user timeline (the
    // sessionize exchange shape), then a ≤|types|² aggregation — the
    // per-from probabilities divide exact integer counts, so the only
    // float is the final rounded ratio. Transitions into a TYPELESS
    // event (null event_type) are excluded on both engines by the same
    // IS NOT NULL predicate.
    "evt_transition_matrix" -> Q(
      (s, dir) => transitionMatrix(ev(s, dir)),
      Some(s"""WITH e AS (
              |  SELECT user_id, event_id, $dNs // 1000 AS tus, event_type
              |  FROM events),
              |t AS (
              |  SELECT event_type AS from_type,
              |    lead(event_type) OVER w AS to_type,
              |    lead(tus) OVER w - tus AS gap
              |  FROM e WINDOW w AS (
              |    PARTITION BY user_id ORDER BY tus NULLS FIRST, event_id)),
              |c AS (
              |  SELECT from_type, to_type, count(*) AS n FROM t
              |  WHERE to_type IS NOT NULL AND gap <= ${6L * 3600L * 1000000L}
              |  GROUP BY 1, 2)
              |SELECT from_type, to_type, n,
              |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
              |FROM c ORDER BY from_type NULLS FIRST, to_type""".stripMargin),
      doc = "first-order Markov transition matrix over user timelines (6h session bound, exact counts, per-from row distribution)"),

    // Seasonal-naive FORECAST BACKTEST — the capacity-planning loop a
    // monitoring deployment runs on this stream: hold out the LAST
    // observed day, forecast each (type, hour-of-day) as the training
    // days' mean hourly count, and score MAE/bias against the held-out
    // day over the full 24-hour spine (zero hours count — a model
    // scored only on busy hours flatters itself). Float discipline:
    // mean = s_h/n would make the error sum order-sensitive, so the
    // errors are kept INTEGER by cross-multiplying — |a_h·n − s_h| —
    // summed exactly, with ONE double division at the end (the
    // clip-outliers idiom). The hour spine is a 24-row broadcast per
    // type; everything else is keyed aggregation on the scan.
    "evt_seasonal_backtest" -> Q(
      (s, dir) => seasonalBacktest(s, ev(s, dir)),
      Some(s"""WITH e AS (
              |  SELECT event_type, $dNs // 86400000000000 AS day_idx,
              |    ($dNs // 3600000000000) % 24 AS hour
              |  FROM events WHERE $dNs IS NOT NULL),
              |last AS (SELECT max(day_idx) AS last_day FROM e),
              |nt AS (SELECT count(DISTINCT day_idx) AS n_train
              |       FROM e, last WHERE day_idx < last_day),
              |profile AS (
              |  SELECT event_type, hour, count(*) AS s_h
              |  FROM e, last WHERE day_idx < last_day GROUP BY 1, 2),
              |actual AS (
              |  SELECT event_type, hour, count(*) AS a_h
              |  FROM e, last WHERE day_idx = last_day GROUP BY 1, 2),
              |spine AS (
              |  SELECT t.event_type, g.h AS hour
              |  FROM (SELECT DISTINCT event_type FROM e) t,
              |       UNNEST(generate_series(0, 23)) AS g(h)),
              |cells AS (
              |  SELECT s.event_type, nt.n_train,
              |    coalesce(a.a_h, 0) AS a, coalesce(p.s_h, 0) AS sh
              |  FROM spine s
              |  LEFT JOIN profile p ON p.event_type IS NOT DISTINCT FROM s.event_type
              |    AND p.hour = s.hour
              |  LEFT JOIN actual a ON a.event_type IS NOT DISTINCT FROM s.event_type
              |    AND a.hour = s.hour, nt)
              |SELECT event_type, max(n_train) AS n_train_days,
              |  CAST(sum(a) AS BIGINT) AS actual_events,
              |  round(CAST(sum(abs(a * n_train - sh)) AS DOUBLE)
              |    / (24.0e0 * max(n_train)), 4) AS mae,
              |  round(CAST(sum(a * n_train - sh) AS DOUBLE)
              |    / (24.0e0 * max(n_train)), 4) AS bias
              |FROM cells GROUP BY 1
              |HAVING max(n_train) > 0
              |ORDER BY event_type NULLS FIRST""".stripMargin),
      doc = "seasonal-naive hourly forecast backtested on the held-out last day: integer-exact cross-multiplied MAE/bias over the full 24h spine"),

    // A/B TEST read-out — the two-proportion z-test every experiment
    // dashboard runs: deterministic cohort assignment (user_id parity —
    // the md5-free form of the stratified-sampling discipline; any
    // hash-derived bucket works the same), per-user conversion =
    // "ever purchased", pooled-variance z on the cohort rates. The
    // pipeline is integer (distinct users, converted users per cohort)
    // until ONE final expression computes rates and z with the same
    // operation tree on both engines (IEEE sqrt of identical doubles is
    // identical); significance compares the ROUNDED z against 1.96 so
    // both engines make the same call at the boundary.
    "evt_ab_test" -> Q(
      (s, dir) => {
        // conversion = "heavy purchaser" (≥ 14 purchase events): on
        // this fixture every user purchases at least once, so the
        // naive ever-purchased metric saturates both cohorts at rate
        // 1.0 and the pooled variance collapses to 0 — precisely the
        // degenerate case the z guard below also closes structurally
        val users = ev(s, dir)
          .filter(col("user_id").isNotNull)
          // pmod, not %: a negative user_id would hit grp = -1 under
          // signed remainder and silently fall out of BOTH cohorts —
          // pmod keeps every non-null user in the experiment population
          .groupBy(pmod(col("user_id"), lit(2)).as("grp"), col("user_id"))
          .agg(when(count(when(col("event_type") === "purchase", 1)) >= 14, 1L)
            .otherwise(0L).as("conv"))
        val pooled = (col("conv_a") + col("conv_b")).cast("double") /
          (col("users_a") + col("users_b")).cast("double")
        val z = (col("conv_a").cast("double") / col("users_a").cast("double")
          - col("conv_b").cast("double") / col("users_b").cast("double")) /
          sqrt(pooled * (lit(1.0) - pooled)
            * (lit(1.0) / col("users_a").cast("double")
              + lit(1.0) / col("users_b").cast("double")))
        users.agg(
            count(when(col("grp") === 0, 1)).as("users_a"),
            sum(when(col("grp") === 0, col("conv"))).as("conv_a"),
            count(when(col("grp") === 1, 1)).as("users_b"),
            sum(when(col("grp") === 1, col("conv"))).as("conv_b"))
          .select(col("users_a"), col("conv_a"), col("users_b"), col("conv_b"),
            round(col("conv_a").cast("double") / col("users_a").cast("double"), 4)
              .as("rate_a"),
            round(col("conv_b").cast("double") / col("users_b").cast("double"), 4)
              .as("rate_b"),
            // all-converted / none-converted pools have zero variance:
            // the z statistic is UNDEFINED there (0/0), so it is null
            // by the same CASE on both engines, never an ANSI error
            round(when(pooled > 0.0 && pooled < 1.0, z), 4).as("z_score"))
          .withColumn("significant", abs(col("z_score")) > lit(1.96))
      },
      Some("""WITH u AS (
             |  SELECT ((user_id % 2) + 2) % 2 AS grp, user_id,
             |    CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END) >= 14
             |      THEN 1 ELSE 0 END AS conv
             |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
             |c AS (
             |  SELECT
             |    count(CASE WHEN grp = 0 THEN 1 END) AS users_a,
             |    CAST(sum(CASE WHEN grp = 0 THEN conv END) AS BIGINT) AS conv_a,
             |    count(CASE WHEN grp = 1 THEN 1 END) AS users_b,
             |    CAST(sum(CASE WHEN grp = 1 THEN conv END) AS BIGINT) AS conv_b
             |  FROM u),
             |z AS (
             |  SELECT *,
             |    CAST(conv_a + conv_b AS DOUBLE) / CAST(users_a + users_b AS DOUBLE) AS pooled
             |  FROM c)
             |SELECT users_a, conv_a, users_b, conv_b,
             |  round(CAST(conv_a AS DOUBLE) / CAST(users_a AS DOUBLE), 4) AS rate_a,
             |  round(CAST(conv_b AS DOUBLE) / CAST(users_b AS DOUBLE), 4) AS rate_b,
             |  round(CASE WHEN pooled > 0.0e0 AND pooled < 1.0e0 THEN
             |    (CAST(conv_a AS DOUBLE) / CAST(users_a AS DOUBLE)
             |      - CAST(conv_b AS DOUBLE) / CAST(users_b AS DOUBLE))
             |    / sqrt(pooled * (1.0e0 - pooled)
             |      * (1.0e0 / CAST(users_a AS DOUBLE) + 1.0e0 / CAST(users_b AS DOUBLE)))
             |    END, 4) AS z_score,
             |  abs(round(CASE WHEN pooled > 0.0e0 AND pooled < 1.0e0 THEN
             |    (CAST(conv_a AS DOUBLE) / CAST(users_a AS DOUBLE)
             |      - CAST(conv_b AS DOUBLE) / CAST(users_b AS DOUBLE))
             |    / sqrt(pooled * (1.0e0 - pooled)
             |      * (1.0e0 / CAST(users_a AS DOUBLE) + 1.0e0 / CAST(users_b AS DOUBLE)))
             |    END, 4)) > 1.96e0 AS significant
             |FROM z""".stripMargin),
      doc = "two-proportion z-test over parity cohorts: integer counts, one shared float expression tree, significance on the rounded z"),

    // Retention cohorts: users bucketed by first-activity week, counted
    // distinct per (cohort_week, weeks-since-cohort) — the standard
    // product-analytics retention matrix, and the cohort shape used to
    // split training corpora by user vintage. Day buckets divide the
    // int64 nanos by a multiple of 1000, so DuckDB's microsecond
    // truncation of the parquet ts can never move a row across a day
    // boundary — integer-exact parity without the micros dance.
    "evt_retention" -> Q(
      (s, dir) => {
        val days = ev(s, dir)
          .select(col("user_id"), expr("ts div 86400000000000").as("day"))
          .distinct()
        val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        days.join(cohorts, Seq("user_id"))
          .groupBy(expr("cohort_day div 7").as("cohort_week"),
            expr("(day - cohort_day) div 7").as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some(s"""WITH days AS (
              |  SELECT DISTINCT user_id, $dNs // 86400000000000 AS day FROM events),
              |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1)
              |SELECT cohort_day // 7 AS cohort_week,
              | (day - cohort_day) // 7 AS week_offset,
              | CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
              |FROM days d JOIN cohorts c ON d.user_id = c.user_id
              |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin),
      doc = "weekly retention cohort matrix (first-activity cohort × offset)"),

    // Ordered funnel: users who viewed, then clicked AFTER their first
    // view, then purchased AFTER that first qualifying click — the
    // classic product funnel, and a stage-gating shape (A before B
    // before C) window functions alone don't express. Three user-keyed
    // aggregations/joins: every shuffle is on user_id, so the stages
    // co-partition and AQE can reuse the layout; the final assembly is
    // 1-row × 1-row cross joins. Row-to-row time comparisons run on
    // epoch-MICROS on both engines (the parquet ts carries sub-µs bits
    // DuckDB truncates at read — FIXTURES.md convention).
    "evt_funnel" -> Q(
      (s, dir) => {
        val e = ev(s, dir).select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("tus"))
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("tus")).as("v_tus"))
        val clicks = e.filter(col("event_type") === "click")
          .join(views, Seq("user_id")).filter(col("tus") > col("v_tus"))
          .groupBy(col("user_id")).agg(min(col("tus")).as("c_tus"))
        val purchases = e.filter(col("event_type") === "purchase")
          .join(clicks, Seq("user_id")).filter(col("tus") > col("c_tus"))
          .groupBy(col("user_id")).agg(min(col("tus")).as("p_tus"))
        views.agg(count(lit(1)).as("n_viewed"))
          .crossJoin(clicks.agg(count(lit(1)).as("n_clicked_after_view")))
          .crossJoin(purchases.agg(count(lit(1)).as("n_purchased_after_click")))
      },
      Some(s"""WITH e AS (SELECT user_id, event_type, $dNs // 1000 AS tus FROM events),
              |v AS (SELECT user_id, min(tus) AS v_tus FROM e
              |      WHERE event_type = 'view' GROUP BY 1),
              |c AS (SELECT e.user_id, min(e.tus) AS c_tus FROM e JOIN v USING (user_id)
              |      WHERE e.event_type = 'click' AND e.tus > v.v_tus GROUP BY 1),
              |p AS (SELECT e.user_id, min(e.tus) AS p_tus FROM e JOIN c USING (user_id)
              |      WHERE e.event_type = 'purchase' AND e.tus > c.c_tus GROUP BY 1)
              |SELECT (SELECT count(*) FROM v) AS n_viewed,
              | (SELECT count(*) FROM c) AS n_clicked_after_view,
              | (SELECT count(*) FROM p) AS n_purchased_after_click""".stripMargin),
      doc = "ordered view→click→purchase funnel (stage-gated user counts)"),

    // Week-over-week churn around the fixed anchor: of the users active
    // in the prior week, who returned this week (retained), who didn't
    // (churned), and who is new — the complement of evt_retention's
    // cohort matrix, and the user-set algebra (semi/anti on distinct
    // sets) behind any engagement dashboard. Raw-nanos anchor compares
    // like every other windowed evt query; all joins user-keyed.
    "evt_churn" -> Q(
      (s, dir) => {
        val e = ev(s, dir)
        val twoWeeksAgoNs = Tables.WeekAgoNs - 7L * 86400L * 1000000000L
        val prev = e.filter(col("ts") >= twoWeeksAgoNs && col("ts") < Tables.WeekAgoNs)
          .select(col("user_id")).distinct()
        val cur = e.filter(col("ts") >= Tables.WeekAgoNs && col("ts") < Tables.AnchorNs)
          .select(col("user_id")).distinct()
        prev.join(cur, Seq("user_id"), "left_semi").agg(count(lit(1)).as("n_retained"))
          .crossJoin(prev.join(cur, Seq("user_id"), "left_anti")
            .agg(count(lit(1)).as("n_churned")))
          .crossJoin(cur.join(prev, Seq("user_id"), "left_anti")
            .agg(count(lit(1)).as("n_new")))
      },
      Some(s"""WITH prev AS (SELECT DISTINCT user_id FROM events
              |  WHERE $dNs >= ${Tables.WeekAgoNs - 7L * 86400L * 1000000000L}
              |    AND $dNs < ${Tables.WeekAgoNs}),
              |cur AS (SELECT DISTINCT user_id FROM events
              |  WHERE $dNs >= ${Tables.WeekAgoNs} AND $dNs < ${Tables.AnchorNs})
              |-- EXISTS/NOT EXISTS, never IN/NOT IN: one NULL user_id in
              |-- either week would make NOT IN collapse the churn/new count
              |-- to 0 while the Spark left_anti keeps counting
              |SELECT
              | (SELECT count(*) FROM prev p WHERE EXISTS (SELECT 1 FROM cur c WHERE c.user_id = p.user_id)) AS n_retained,
              | (SELECT count(*) FROM prev p WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.user_id = p.user_id)) AS n_churned,
              | (SELECT count(*) FROM cur c WHERE NOT EXISTS (SELECT 1 FROM prev p WHERE p.user_id = c.user_id)) AS n_new""".stripMargin),
      doc = "week-over-week churn/retained/new user-set algebra"),

    // F1 + §2.10 fan-out shape: canonical-event projection with the
    // deterministic sha256 event id (events.rs:76-86) — exact hex parity.
    "evt_canonical_events" -> Q(
      (s, dir) => {
        val sig = md5(col("event_id").cast("string"))
        ev(s, dir)
          .select(
            sha2(concat_ws(":",
              col("event_id").cast("string"), sig,
              propK().cast("string"), col("event_type")), 256).as("event_hash"),
            col("event_id").as("slot"),
            expr("ts div 1000").as("block_time_us"),
            sig.as("tx_signature"),
            col("event_type").as("program_id"),
            propK().as("instruction_index"))
          .orderBy(col("slot"))
      },
      Some(s"""SELECT
              | sha256(concat_ws(':', CAST(event_id AS VARCHAR), md5(CAST(event_id AS VARCHAR)),
              |   CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) AS VARCHAR), event_type)) AS event_hash,
              | event_id AS slot, $dNs // 1000 AS block_time_us,
              | md5(CAST(event_id AS VARCHAR)) AS tx_signature,
              | event_type AS program_id,
              | CAST(json_extract_string(props, '$$.k') AS INTEGER) AS instruction_index
              |FROM events ORDER BY slot""".stripMargin),
      doc = "ref events.rs:76-86 (deterministic sha256 event_id)"),

    // Sliding-window WAU/DAU: exact distinct users over a trailing
    // 7-day window, per day. Exact distinct-over-sliding-window has no
    // window-function form; the scale shape is (1) collapse events to
    // the user×day grain FIRST (the only pass over the fact table),
    // (2) explode each activity day to the ≤7 window days it supports —
    // a bounded 7× fan-out of the SMALL grain, never a range self-join —
    // (3) one distinct aggregation per window day, semi-joined to the
    // observed-day spine so trailing phantom days don't appear.
    "evt_wau_sliding" -> Q(
      (s, dir) => slidingWau(ev(s, dir)),
      Some(s"""WITH ud AS (
              |  SELECT DISTINCT user_id, $dNs // 86400000000000 AS dayn FROM events),
              |spine AS (SELECT DISTINCT dayn AS d FROM ud),
              |cover AS (
              |  SELECT u.user_id, u.dayn, s.d
              |  FROM ud u JOIN spine s ON s.d BETWEEN u.dayn AND u.dayn + 6)
              |SELECT strftime(make_timestamp(d * 86400000000), '%Y-%m-%d') AS day,
              |  CAST(count(DISTINCT user_id) AS BIGINT) AS wau,
              |  CAST(count(DISTINCT user_id) FILTER (WHERE dayn = d) AS BIGINT) AS dau
              |FROM cover GROUP BY d ORDER BY day""".stripMargin),
      doc = "trailing-7-day sliding WAU + DAU per day (exact distincts)"),

    // Interval (time-window) join: per purchase, the same user's clicks
    // in the preceding hour. The naive form is a range join — a nested
    // loop at scale — so the probe side explodes to its 2 candidate
    // hour buckets and the join runs as a HASH equi-join on
    // (user, bucket) with the exact interval re-checked on the pair;
    // fan-out is a constant 2×, and a 1h window can only span 2 buckets.
    // Purchases with no clicks survive via the left join (n=0, null
    // last-click). Comparisons on raw int64 nanos; outputs on µs.
    "evt_interval_join" -> Q(
      (s, dir) => intervalJoin(ev(s, dir)),
      Some(s"""WITH p AS (
              |  SELECT event_id AS purchase_id, user_id, $dNs AS pts
              |  FROM events WHERE event_type = 'purchase'),
              |c AS (
              |  SELECT user_id, $dNs AS cts FROM events WHERE event_type = 'click'),
              |m AS (
              |  SELECT p.purchase_id, count(*) AS n_clicks_1h,
              |         max(c.cts) // 1000 AS last_click_us
              |  FROM p JOIN c ON p.user_id = c.user_id
              |   AND c.cts >= p.pts - 3600000000000 AND c.cts < p.pts
              |  GROUP BY 1)
              |SELECT p.purchase_id, p.user_id, p.pts // 1000 AS p_us,
              |  COALESCE(m.n_clicks_1h, 0) AS n_clicks_1h, m.last_click_us
              |FROM p LEFT JOIN m ON p.purchase_id = m.purchase_id
              |ORDER BY p.purchase_id NULLS FIRST""".stripMargin),
      doc = "1h interval join (clicks before each purchase) as a bucketed equi-join"),

    // RANGE window frame: per purchase, the same user's trailing-1h
    // purchase value sum INCLUDING the row itself — a true event-time
    // RANGE frame (peers by value distance on the µs timeline), the one
    // frame family rows-based windows can't express. Frame bounds are
    // integer µs, sums go through decimal, so both engines agree
    // bit-for-bit. Per-user partitions keep the window keyed (never a
    // global single-partition sort).
    "evt_rolling_1h_value" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val HourUs = 3600L * 1000000L
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
          .rangeBetween(-HourUs, 0L)
        ev(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("tus"),
            col("value"))
          .withColumn("rolling_1h", round(
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double"), 2))
          .withColumn("n_1h", count(lit(1)).over(w))
          .select(col("event_id"), col("user_id"), col("tus"),
            col("rolling_1h"), col("n_1h"))
          .orderBy(col("event_id"))
      },
      Some(s"""SELECT event_id, user_id, tus,
              |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
              |    AS rolling_1h,
              |  count(*) OVER w AS n_1h
              |FROM (
              |  SELECT event_id, user_id, $dNs // 1000 AS tus, value
              |  FROM events WHERE event_type = 'purchase')
              |WINDOW w AS (PARTITION BY user_id ORDER BY tus
              |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
      doc = "event-time RANGE frame: trailing-1h per-user purchase value sum"),

    /** F17 base58 on the hard signal (the survey's one allowed-skip row,
      * implemented anyway as native codegen expressions —
      * [[graft.functions.Base58Expressions]]). DuckDB has no base58, so
      * the oracle pins the CONTRACT instead of re-deriving: published
      * IETF draft-msporny-base58 test-vector encodings as literals (an
      * independent implementation's outputs — an alphabet or
      * leading-zero bug turns the row red), decode∘encode = identity
      * over 16-byte digests of EVERY event (ok pinned TRUE, n pinned to
      * the corpus count — same oracle-contract pattern as the ANN
      * recall floors), and the null-safe decode of out-of-alphabet
      * input. The roundtrip column is computed Spark-side per event row
      * (codegen'd expressions, no shuffle, one scan). */
    "fn_base58_contract" -> Q(
      (s, dir) => {
        import graft.functions.Base58Expressions.{base58_decode, base58_encode}
        import s.implicits._
        def hexOf(t: String) = t.getBytes("UTF-8").map("%02x".format(_)).mkString
        val fixed = Seq(
          ("enc_hello_world", "48656c6c6f20576f726c6421"),
          ("enc_pangram", hexOf("The quick brown fox jumps over the lazy dog.")),
          ("enc_leading_zeros", "0000287fb4cd"),
          ("enc_single_zero", "00"))
          .toDF("case_id", "hex_in")
          .select(col("case_id"),
            base58_encode(unhex(col("hex_in"))).as("b58"),
            lower(hex(base58_decode(base58_encode(unhex(col("hex_in")))))).as("hex_out"),
            (base58_decode(base58_encode(unhex(col("hex_in")))) === unhex(col("hex_in"))).as("ok"),
            lit(1L).as("n"))
        val invalid = Seq(("decode_invalid_null", "0OIl")).toDF("case_id", "b58")
          .select(col("case_id"), col("b58"),
            lower(hex(base58_decode(col("b58")))).as("hex_out"), // NULL
            base58_decode(col("b58")).isNull.as("ok"),
            lit(1L).as("n"))
        val bytes = unhex(md5(col("event_id").cast("string")))
        // coalesce(rt, false): the invalid-decode row makes NULL a legal
        // base58_decode output, so a bug that misclassifies SOME valid
        // encodings as invalid yields rt=NULL rows — bool_and skips
        // NULLs and would stay TRUE. Folding NULL to false keeps the
        // roundtrip contract hard against exactly that failure class.
        val corpus = Tables.events(s, dir)
          .select((base58_decode(base58_encode(bytes)) === bytes).as("rt"))
          .agg(count(lit(1)).as("n"), expr("bool_and(coalesce(rt, false))").as("ok"))
          .select(lit("events_md5_roundtrip").as("case_id"),
            lit(null).cast("string").as("b58"),
            lit(null).cast("string").as("hex_out"), col("ok"), col("n"))
        fixed.unionByName(invalid).unionByName(corpus).orderBy(col("case_id"))
      },
      Some(s"""SELECT * FROM (VALUES
              |  ('decode_invalid_null', '0OIl', CAST(NULL AS VARCHAR), TRUE, CAST(1 AS BIGINT)),
              |  ('enc_hello_world', '2NEpo7TZRRrLZSi2U', '48656c6c6f20576f726c6421', TRUE, CAST(1 AS BIGINT)),
              |  ('enc_leading_zeros', '11233QC4', '0000287fb4cd', TRUE, CAST(1 AS BIGINT)),
              |  ('enc_pangram', 'USm3fpXnKG5EUBx2ndxBDMPVciP5hGey2Jh4NDv6gmeo1LkMeiKrLJUUBk6Z',
              |   '54686520717569636b2062726f776e20666f78206a756d7073206f76657220746865206c617a7920646f672e',
              |   TRUE, CAST(1 AS BIGINT)),
              |  ('enc_single_zero', '1', '00', TRUE, CAST(1 AS BIGINT))
              |) AS t(case_id, b58, hex_out, ok, n)
              |UNION ALL
              |SELECT 'events_md5_roundtrip', NULL, NULL, TRUE, count(*) FROM events
              |ORDER BY case_id""".stripMargin),
      doc = "F17 base58 native expressions: published-vector encodings pinned literally, decode.encode identity over all event digests, null-safe invalid decode"),
  )

  /** Interval-join body (injectable for specs): per purchase, clicks by
    * the same user in the preceding hour — see the `evt_interval_join`
    * entry for the scale rationale. */
  def intervalJoin(events: DataFrame): DataFrame = {
    val HourNs = 3600L * 1000000000L
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"),
        expr(s"ts div $HourNs").as("bucket"))
    // each purchase probes its own hour bucket and the one before — the
    // 2× explode of the probe side replaces a range nested-loop join
    val probes = purchases.select(col("purchase_id"), col("user_id"), col("pts"),
      explode(expr(s"array(pts div $HourNs, pts div $HourNs - 1)")).as("bucket"))
    val matched = probes.join(clicks, Seq("user_id", "bucket"))
      .filter(col("cts") >= col("pts") - lit(HourNs) && col("cts") < col("pts"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks_1h"),
        expr("max(cts) div 1000").as("last_click_us"))
    purchases.join(matched, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"),
        expr("pts div 1000").as("p_us"),
        coalesce(col("n_clicks_1h"), lit(0L)).as("n_clicks_1h"),
        col("last_click_us"))
      .orderBy(col("purchase_id"))
  }

  /** Seasonal-backtest body behind `evt_seasonal_backtest` (injectable
    * for specs) — see the query comment for the integer-exact error
    * arithmetic and the null-safe spine joins. */
  private[graft] def seasonalBacktest(s: SparkSession, events: DataFrame): DataFrame = {
    val e = events
      .select(col("event_type"),
        expr("ts div 86400000000000").as("day_idx"),
        expr("(ts div 3600000000000) % 24").as("hour"))
      .filter(col("day_idx").isNotNull)
    val lastDay = e.agg(max(col("day_idx")).as("last_day"))
    val train = e.crossJoin(broadcast(lastDay))
      .filter(col("day_idx") < col("last_day"))
    val nTrain = train.agg(countDistinct(col("day_idx")).as("n_train"))
    val profile = train.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("s_h"))
    val actual = e.crossJoin(broadcast(lastDay))
      .filter(col("day_idx") === col("last_day"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("a_h"))
    val spine = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(
        s.range(0, 24).select(col("id").as("hour"))))
    // <=> on the type key: a NULL event_type is a real spine row
    // (dirty data) and must MATCH its profile/actual rows — a plain
    // equi-join would null-extend it while the oracle's IS NOT
    // DISTINCT FROM joins it
    val pj = profile.select(col("event_type").as("p_type"),
      col("hour").as("p_hour"), col("s_h"))
    val aj = actual.select(col("event_type").as("a_type"),
      col("hour").as("a_hour"), col("a_h"))
    spine
      .join(pj, col("event_type") <=> col("p_type")
        && col("hour") === col("p_hour"), "left_outer")
      .join(aj, col("event_type") <=> col("a_type")
        && col("hour") === col("a_hour"), "left_outer")
      .crossJoin(broadcast(nTrain))
      .select(col("event_type"),
        col("n_train"),
        coalesce(col("a_h"), lit(0L)).as("a"),
        coalesce(col("s_h"), lit(0L)).as("sh"))
      .groupBy(col("event_type"))
      .agg(max(col("n_train")).as("n_train_days"),
        sum(col("a")).as("actual_events"),
        sum(abs(col("a") * col("n_train") - col("sh"))).as("abs_num"),
        sum(col("a") * col("n_train") - col("sh")).as("bias_num"))
      // n_train_days = 0 (a single-day corpus: nothing to train on)
      // would divide 0/0 → NaN with engine-specific encodings; there is
      // no backtest without a training window, so the row set is empty
      // by definition — the oracle states the same n_train > 0 guard
      .filter(col("n_train_days") > 0)
      .select(col("event_type"), col("n_train_days"), col("actual_events"),
        round(col("abs_num").cast("double")
          / (lit(24.0) * col("n_train_days").cast("double")), 4).as("mae"),
        round(col("bias_num").cast("double")
          / (lit(24.0) * col("n_train_days").cast("double")), 4).as("bias"))
      .orderBy(col("event_type"))
  }

  /** Transition-matrix body behind `evt_transition_matrix` (injectable
    * for specs): consecutive typed events per user within the 6h
    * session gap → (from, to, n, p). */
  private[graft] def transitionMatrix(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 6L * 3600L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("tus"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_tus", lead(col("tus"), 1).over(w))
      .filter(col("next_type").isNotNull &&
        col("next_tus") - col("tus") <= gapUs)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    trans
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy(col("from_type")))
          .cast("double"), 4))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Sliding WAU body (injectable for specs): see the `evt_wau_sliding`
    * entry for the scale rationale. */
  def slidingWau(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), expr("ts div 86400000000000").as("dayn"))
      .distinct()
    val spine = ud.select(col("dayn").as("d")).distinct()
    ud.select(col("user_id"), col("dayn"),
        explode(expr("sequence(dayn, dayn + 6)")).as("d"))
      .join(broadcast(spine), Seq("d"), "left_semi")
      .groupBy(col("d"))
      .agg(
        countDistinct(col("user_id")).as("wau"),
        countDistinct(when(col("dayn") === col("d"), col("user_id"))).as("dau"))
      .select(
        date_format(expr("timestamp_micros(d * 86400000000)"), "yyyy-MM-dd").as("day"),
        col("wau"), col("dau"))
      .orderBy(col("day"))
  }
}
