package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Event-stream analytics over the `events` table — the batch image of the
  * windowed/streaming layer SURVEY.md §2.9/§7 schedules on the 5-minute
  * detector-count cadence. Window starts are epoch-second BIGINTs so the
  * DuckDB oracle agrees byte-for-byte (no tz/format ambiguity).
  */
object EventsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 5-minute event-time windows per type (A1-A4 analytics shape;
    // streaming variant = groupBy(window($"ts","5 minutes")) + watermark).
    "e01_window_5min" -> ((s, d) => {
      events(s, d) // ts = epoch-nanos long (see Tables.events)
        .groupBy(
          expr("(ts div 1000000000 div 300) * 300").as("w_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
    }),

    // Sessionization: gaps-and-islands with a 30-minute inactivity timeout
    // (the stateful flatMapGroupsWithState shape, expressed relationally).
    "e02_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d) // ts = epoch-nanos long (see Tables.events)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev").isNull ||
            expr("ts div 1000000000") - expr("prev div 1000000000") > 1800, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).cast("bigint").as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    // Built-in session_window (30-min inactivity gap): the declarative
    // form of e02's gaps-and-islands; streaming-ready with a watermark.
    "e04_session_window" -> ((s, d) => {
      events(s, d)
        .withColumn("tsec", expr("timestamp_seconds(ts div 1000000000)"))
        .groupBy(session_window(col("tsec"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .select(unix_timestamp(col("session_window.start"))
          .as("session_start"), col("user_id"), col("n_events"),
          col("sum_value"))
    }),

    // Streaming-dedup batch image: keep the FIRST event per
    // (user_id, event_type) — the dropDuplicates-with-watermark shape
    // (at-least-once delivery dedup), expressed as a deterministic
    // arg-min so the oracle agrees exactly.
    "e05_dedup_first" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d) // ts = epoch-nanos long (see Tables.events)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("first_event"),
          expr("ts div 1000000000").as("first_tsec"))
    }),

    // As-of join (ext/AsOf): each click attached to the user's most
    // recent view at-or-before it — merge-pattern (one key shuffle +
    // per-key sort), checked against DuckDB's native ASOF JOIN.
    "e06_asof_join" -> ((s, d) => {
      val ev = events(s, d) // ts = epoch-nanos long (see Tables.events)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.ext.AsOf.asofJoin(clicks, views, "user_id", "ts",
        Seq("event_id", "ts"))
        .filter(col("asof_event_id").isNotNull) // inner semantics
        .select(col("user_id"), col("event_id").as("l_event_id"),
          col("asof_event_id").as("r_event_id"),
          // truncate EACH side to micros before subtracting (the data's
          // nanos are not µs-aligned; flooring the ns difference instead
          // drifts ±1 µs against per-timestamp truncation)
          expr("(ts div 1000) - (asof_ts div 1000)").as("delta_us"))
    }),

    // The SALTED as-of path (hot-key sharding on coarse time buckets)
    // must produce byte-identical results to e06's unsalted MERGE — the
    // scale knob is gated against the same DuckDB native ASOF oracle,
    // with a width small enough that carries cross many gap buckets.
    "e08_asof_salted" -> ((s, d) => {
      val ev = events(s, d) // ts = epoch-nanos long (see Tables.events)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.ext.AsOf.asofJoin(clicks, views, "user_id", "ts",
        Seq("event_id", "ts"),
        saltBucketWidth = Some(3600L * 1000 * 1000 * 1000)) // 1 h shards
        .filter(col("asof_event_id").isNotNull) // inner semantics
        .select(col("user_id"), col("event_id").as("l_event_id"),
          col("asof_event_id").as("r_event_id"),
          expr("(ts div 1000) - (asof_ts div 1000)").as("delta_us"))
    }),

    // Keyless interval join (ext/RangeJoin): every non-error event
    // falling inside the 10-minute window after each error, counted per
    // window — bucket-equi-join + residual range filter, never a
    // cartesian product.
    "e07_incident_windows" -> ((s, d) => {
      val ev = events(s, d) // ts = epoch-nanos long
      val tenMinNs = 600L * 1000 * 1000 * 1000
      val windows = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("lo"),
          (col("ts") + tenMinNs).as("hi"))
      val pts = ev.filter(col("event_type") =!= "error")
        .select(col("event_id"), col("ts"))
      graft.ext.RangeJoin.intervalJoin(pts, "ts", windows, "lo", "hi",
        bucketWidth = tenMinNs)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_events"))
    }),

    // Session windows (batch image of the streaming operator): events
    // within 6 h of the previous event extend the session, a gap ≥ 6 h
    // starts a new one. Spark's native session_window aggregation —
    // the same expression works under readStream with a watermark; the
    // oracle replays the gaps-and-islands definition. Nanos truncate
    // to micros (session_window takes TimestampType).
    "e09_session_windows" -> ((s, d) => {
      val ev = events(s, d) // ts = epoch-nanos long
      ev.select(col("user_id"),
          timestamp_micros(expr("ts div 1000")).as("t"))
        .groupBy(col("user_id"), session_window(col("t"), "6 hours").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          unix_micros(col("w.end")).as("session_end_us"),
          col("n_events"))
    }),

    // Time-series resample + forward fill (ext/GapFill): e01's 5-minute
    // buckets densified onto the complete global grid per event_type —
    // dropped periods surface as n_events=0 with the last observed
    // sum_value carried forward (null before a series' first bucket).
    // The regularization step before any windowed feature math on a
    // gappy cadence (the reference's nominal-300 s stream, SURVEY §1.1).
    "e10_gap_fill" -> ((s, d) => {
      val buckets = events(s, d) // ts = epoch-nanos long (see Tables.events)
        .groupBy(
          expr("(ts div 1000000000 div 300) * 300").as("w_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
      graft.ext.GapFill.resampleFill(buckets, "event_type", "w_start",
        "n_events", "sum_value", 300L)
    }),

    // Rolling z-score anomaly detection per user: each event scored
    // against the PREVIOUS 20 events' mean/variance (rows frame — the
    // monitoring shape every ops pipeline runs). Determinism recipe:
    // the rolling moments accumulate as EXACT decimals (sum, sum of
    // squares — frame-order-independent), variance/mean derive from
    // them in IDENTICAL double arithmetic on both engines, and the
    // z-score rounds to 6 dp — so the anomaly set hash-gates despite
    // floating point. Window partitions are per-user (bounded), never
    // a global sort.
    "e11_anomaly_zscore" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-20, -1)
      events(s, d)
        .withColumn("n", count(col("value")).over(w))
        .withColumn("s1", sum(col("value").cast("decimal(18,2)")).over(w))
        .withColumn("s2",
          sum((col("value").cast("decimal(18,2)") *
            col("value").cast("decimal(18,2)")).cast("decimal(28,4)"))
            .over(w))
        .filter(col("n") >= 10 && col("value").isNotNull)
        .withColumn("mean",
          col("s1").cast("double") / col("n").cast("double"))
        .withColumn("variance",
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double")
              / col("n").cast("double")) /
            (col("n").cast("double") - 1.0))
        .filter(col("variance") > 0.0)
        .withColumn("z", round(
          (col("value") - col("mean")) / sqrt(col("variance")), 6))
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("user_id"), col("value"), col("z"))
    }),

    // Cohort retention matrix — the product-analytics staple: users
    // cohort by their FIRST-seen day, and each (cohort day, day
    // offset) cell counts the distinct users active that many days
    // later. Two exact aggregations (first-seen per user, then
    // distinct users per cell) — both keyed, both map-side-partial;
    // nothing floating-point, so the matrix hash-gates as-is.
    "e12_cohort_retention" -> ((s, d) => {
      val ev = events(s, d) // ts = epoch-nanos long (see Tables.events)
        .select(col("user_id"),
          expr("ts div 1000000000 div 86400").as("day"))
      val cohorts = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      ev.join(cohorts, "user_id")
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // Ordered funnel (view → click-after-view → purchase-after-click):
    // each stage's entry time is the user's FIRST qualifying event
    // strictly after the previous stage's — three keyed min-aggregates
    // chained through per-user stage tables, never a per-user sort.
    // No broadcast hints: the stage tables are O(distinct users) and
    // at 100 TB would blow the driver/broadcast limit — every join and
    // aggregate here keys on user_id, so the planner's shuffle joins
    // reuse one user_id exchange and the aggregations stay map-side
    // partial either way. Emits the per-stage distinct-user counts.
    "e13_funnel" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("v_ts"))
        .filter(col("v_ts").isNotNull)
      val c = ev.join(v, "user_id")
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "click" &&
          col("ts") > col("v_ts"), col("ts"))).as("c_ts"))
        .filter(col("c_ts").isNotNull)
      val p = ev.join(c, "user_id")
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "purchase" &&
          col("ts") > col("c_ts"), col("ts"))).as("p_ts"))
        .filter(col("p_ts").isNotNull)
      v.agg(count(lit(1)).as("n"))
        .select(lit("1_view").as("step"), col("n"))
        .unionByName(c.agg(count(lit(1)).as("n"))
          .select(lit("2_click_after_view").as("step"), col("n")))
        .unionByName(p.agg(count(lit(1)).as("n"))
          .select(lit("3_purchase_after_click").as("step"), col("n")))
    }),

    // Conversion-latency distribution: for users whose first purchase
    // follows their first view, the view→purchase latency percentiles
    // — the time-to-convert curve product teams watch. Two keyed
    // min-aggregates (the e13 funnel shape) then one global percentile
    // over integer microsecond latencies. Each side truncates to micros
    // BEFORE the diff (pure long arithmetic, so the 2^53 double hazard
    // never applies) — the same per-side convention as e06's delta_us:
    // DuckDB's epoch_us truncates each timestamp, so a diff-first floor
    // would drift ±1µs on non-µs-aligned nanos.
    "e14_conversion_latency" -> ((s, d) => {
      val ev = events(s, d) // ts = epoch-nanos long (see Tables.events)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("v_ts"))
        .filter(col("v_ts").isNotNull)
      val lat = ev.join(v, "user_id")
        .groupBy(col("user_id"), col("v_ts"))
        .agg(min(when(col("event_type") === "purchase" &&
          col("ts") > col("v_ts"), col("ts"))).as("p_ts"))
        .filter(col("p_ts").isNotNull)
        .select(expr("(p_ts div 1000) - (v_ts div 1000)").as("lat_us"))
      lat.agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lat_us, 0.5)"), 4).as("p50_us"),
        round(expr("percentile(lat_us, 0.9)"), 4).as("p90_us"))
    }),

    // SLIDING windows (10-min length advancing every 5): window() emits
    // one row per covered window, so each event lands in exactly two —
    // the overlapping-window shape e01's tumbling windows can't express.
    // Exact distinct users per (window, type); the streaming variant
    // swaps countDistinct for the a-family HLL sketch under a watermark.
    "e15_sliding_distinct" -> ((s, d) => {
      events(s, d) // ts = epoch-nanos long (see Tables.events)
        .withColumn("tsec", expr("timestamp_seconds(ts div 1000000000)"))
        .groupBy(window(col("tsec"), "10 minutes", "5 minutes"),
          col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("n_users"))
    }),

    // Path-transition matrix (the product-analytics Markov view): for
    // each user's event sequence, count adjacent (from → to) type
    // pairs. One lead() over the per-user time order, one keyed count
    // — type-pair cardinality is tiny, so the final aggregate is
    // map-side partial all the way down.
    "e16_path_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d) // ts = epoch-nanos long (see Tables.events)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // Semi-structured JSON extraction from the props payload.
    "e03_json_extract" -> ((s, d) => {
      events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
          sum(when(col("k") > 50, 1).otherwise(0)).cast("bigint")
            .as("n_high"),
          max(col("k")).as("max_k"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "e01_window_5min" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS w_start,
         event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "e02_sessionize" ->
      """WITH x AS (
           SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS prev
           FROM events)
         SELECT user_id,
           CAST(SUM(CASE WHEN prev IS NULL
             OR CAST(floor(epoch(ts)) AS BIGINT)
              - CAST(floor(epoch(prev)) AS BIGINT) > 1800
             THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
         FROM x GROUP BY user_id""",
    "e04_session_window" ->
      """WITH x AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             event_id, value
           FROM events
         ), y AS (
           SELECT *, CASE WHEN lag(tsec) OVER w IS NULL
               OR tsec - lag(tsec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
           FROM x WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
         ), z AS (
           SELECT *, SUM(new_s) OVER (PARTITION BY user_id
             ORDER BY tsec, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM y
         )
         SELECT MIN(tsec) AS session_start, user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM z GROUP BY user_id, sid""",
    "e05_dedup_first" ->
      """WITH r AS (
           SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
               ORDER BY ts ASC, event_id ASC) AS rn
           FROM events)
         SELECT user_id, event_type, event_id AS first_event,
           CAST(floor(epoch(ts)) AS BIGINT) AS first_tsec
         FROM r WHERE rn = 1""",
    "e06_asof_join" ->
      """SELECT l.user_id, l.event_id AS l_event_id,
         r.event_id AS r_event_id,
         date_diff('microsecond', r.ts, l.ts) AS delta_us
         FROM (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click') l
         ASOF JOIN (SELECT user_id, ts, event_id FROM events
                    WHERE event_type = 'view') r
           ON l.user_id = r.user_id AND l.ts >= r.ts""",
    "e08_asof_salted" ->
      """SELECT l.user_id, l.event_id AS l_event_id,
         r.event_id AS r_event_id,
         date_diff('microsecond', r.ts, l.ts) AS delta_us
         FROM (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click') l
         ASOF JOIN (SELECT user_id, ts, event_id FROM events
                    WHERE event_type = 'view') r
           ON l.user_id = r.user_id AND l.ts >= r.ts""",
    "e07_incident_windows" ->
      """WITH w AS (
           SELECT event_id AS err_id, ts AS lo,
             ts + INTERVAL 600 SECOND AS hi
           FROM events WHERE event_type = 'error'
         ), p AS (
           SELECT event_id, ts FROM events WHERE event_type != 'error'
         )
         SELECT err_id, COUNT(*) AS n_events
         FROM p JOIN w ON p.ts >= w.lo AND p.ts <= w.hi
         GROUP BY err_id""",
    "e09_session_windows" ->
      """WITH e AS (
           SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
         ), b AS (
           SELECT user_id, us,
             CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                  OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                     >= 21600000000
             THEN 1 ELSE 0 END AS brk
           FROM e
         ), g AS (
           SELECT user_id, us,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY us
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM b
         )
         SELECT user_id, MIN(us) AS session_start_us,
           MAX(us) + 21600000000 AS session_end_us,
           COUNT(*) AS n_events
         FROM g GROUP BY user_id, sid""",
    "e10_gap_fill" ->
      """WITH b AS (
           SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300
               AS w_start,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1, 2
         ), bounds AS (
           SELECT MIN(w_start) AS lo, MAX(w_start) AS hi FROM b
         ), g AS (
           SELECT t.event_type,
             unnest(generate_series(bounds.lo, bounds.hi, 300)) AS w_start
           FROM (SELECT DISTINCT event_type FROM b) t, bounds
         )
         SELECT g.event_type, g.w_start,
           CAST(COALESCE(b.n_events, 0) AS BIGINT) AS n_events,
           last_value(b.sum_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.w_start
             ROWS UNBOUNDED PRECEDING) AS filled_sum_value
         FROM g LEFT JOIN b
           ON b.event_type = g.event_type AND b.w_start = g.w_start""",
    "e12_cohort_retention" ->
      """WITH ev AS (
           SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
           FROM events
         ), cohorts AS (
           SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1
         )
         SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM ev e JOIN cohorts c USING (user_id)
         GROUP BY 1, 2""",
    "e13_funnel" ->
      """WITH v AS (
           SELECT user_id, MIN(ts) AS v_ts FROM events
           WHERE event_type = 'view' GROUP BY 1
         ), c AS (
           SELECT e.user_id, MIN(e.ts) AS c_ts
           FROM events e JOIN v USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > v.v_ts
           GROUP BY 1
         ), p AS (
           SELECT e.user_id, MIN(e.ts) AS p_ts
           FROM events e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
           GROUP BY 1
         )
         SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n FROM v
         UNION ALL
         SELECT '2_click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
         UNION ALL
         SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p""",
    "e14_conversion_latency" ->
      """WITH v AS (
           SELECT user_id, MIN(ts) AS v_ts FROM events
           WHERE event_type = 'view' GROUP BY 1
         ), p AS (
           SELECT e.user_id, v.v_ts, MIN(e.ts) AS p_ts
           FROM events e JOIN v USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
           GROUP BY 1, 2
         ), lat AS (
           SELECT epoch_us(p_ts) - epoch_us(v_ts) AS lat_us FROM p
         )
         SELECT COUNT(*) AS n_converted,
           round(quantile_cont(lat_us, 0.5), 4) AS p50_us,
           round(quantile_cont(lat_us, 0.9), 4) AS p90_us
         FROM lat""",
    "e16_path_transitions" ->
      """WITH x AS (
           SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
           FROM events
         )
         SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n
         FROM x WHERE next_type IS NOT NULL GROUP BY 1, 2""",
    "e15_sliding_distinct" ->
      """WITH e AS (
           SELECT user_id, event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS b
           FROM events
         ), x AS (
           SELECT user_id, event_type, b AS w_start FROM e
           UNION ALL
           SELECT user_id, event_type, b - 300 FROM e
         )
         SELECT w_start, event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM x GROUP BY 1, 2""",
    "e11_anomaly_zscore" ->
      """WITH st AS (
           SELECT event_id, user_id, value,
             COUNT(value) OVER w AS n,
             SUM(CAST(value AS DECIMAL(18,2))) OVER w AS s1,
             SUM(CAST(CAST(value AS DECIMAL(18,2))
                 * CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,4)))
               OVER w AS s2
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
         ), m AS (
           SELECT event_id, user_id, value,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             (CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
               AS variance
           FROM st WHERE n >= 10 AND value IS NOT NULL
         )
         SELECT event_id, user_id, value,
           round((value - mean) / sqrt(variance), 6) AS z
         FROM m WHERE variance > 0.0
           AND abs(round((value - mean) / sqrt(variance), 6)) > 3.0""",
    "e03_json_extract" ->
      """SELECT event_type,
         CAST(SUM(k) AS BIGINT) AS sum_k,
         CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
         MAX(k) AS max_k
         FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
               FROM events) t
         GROUP BY event_type"""
  )
}
