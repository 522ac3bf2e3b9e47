package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.14 Event-sequence analytics — the user-intent queries a search/clickstream
  * engine runs over the event log: staged funnels, cohort retention, and
  * event-path transitions. All three are pure groupBy/window compositions that
  * shuffle ONLY on user_id (the natural partition key of an event log), so the
  * same plans hold at 100 TB: each stage is one hash shuffle on the same key —
  * Catalyst reuses the exchange — and no operator ever materializes an
  * unbounded per-user state on the driver. ds_typed_paths additionally covers
  * the typed Dataset API surface (case-class encoder, groupByKey/mapGroups).
  */
object Events {

  /** Staged conversion funnel view → click → purchase, strictly-ordered
    * timestamps per user (each stage's event must be AFTER the previous
    * stage's earliest qualifying event). Three per-user min-aggregations
    * chained by joins on user_id — never a window over the whole log, never
    * a per-user collect: the funnel state per user is one timestamp per
    * stage, so the op scales linearly with the event count and the join key
    * stays user_id throughout (one exchange, reused).
    */
  val evtFunnelConversion = Op(
    "evt_funnel_conversion",
    (s, d) => {
      val ev = T.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id").filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id").filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      def stage(df: DataFrame, name: String, idx: Int): DataFrame =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), lit(idx).as("stage_idx"), col("n_users"))
      stage(t1, "view", 1)
        .unionByName(stage(t2, "view>click", 2))
        .unionByName(stage(t3, "view>click>purchase", 3))
        .orderBy(col("stage_idx"))
    },
    Some("""
      WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             JOIN t1 ON e.user_id = t1.user_id
             WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
      t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             JOIN t2 ON e.user_id = t2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
      SELECT 'view' AS stage, 1 AS stage_idx, COUNT(*) AS n_users FROM t1
      UNION ALL
      SELECT 'view>click', 2, COUNT(*) FROM t2
      UNION ALL
      SELECT 'view>click>purchase', 3, COUNT(*) FROM t3
      ORDER BY stage_idx
    """)
  )

  /** Weekly cohort retention: cohort = Monday-truncated week of each user's
    * first event; a user is "active at offset k" if they have any event in
    * cohort_week + k weeks. The distinct (user, week) projection runs FIRST,
    * so the heavy event log collapses to at most users × weeks rows before
    * any join — at 100 TB that pre-aggregation is the difference between
    * shuffling the log and shuffling the (tiny) activity matrix. Offsets are
    * exact (both sides are week-truncated, so day-diff is a multiple of 7).
    */
  val evtRetentionCohorts = Op(
    "evt_retention_cohorts",
    (s, d) => {
      val ev = T.events(s, d).select(col("user_id"), col("ts"))
      val first = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val act = ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      act.join(first, "user_id")
        .select(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""
      WITH first AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
                     FROM events GROUP BY user_id),
      act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS INT) AS week_offset,
             COUNT(*) AS n_active
      FROM act a JOIN first f ON a.user_id = f.user_id
      GROUP BY 1, 2 ORDER BY 1, 2
    """)
  )

  /** First-order event-path transition matrix: count (event_type →
    * next_event_type) pairs per user session stream, ordered by (ts,
    * event_id) — the unique event_id tiebreak makes `lead` deterministic
    * under equal timestamps. The window partitions by user_id, so state per
    * task is one user's events — no global sort, no driver state; the final
    * 5×5 matrix aggregation is a map-side-combined groupBy.
    */
  val evtPathTransitions = Op(
    "evt_path_transitions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_type
        FROM events)
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n_trans
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2 ORDER BY 1, 2
    """)
  )

  /** Typed Dataset surface: the first-3-event path per user via case-class
    * encoder + groupByKey/mapGroups, then the top-20 most common paths.
    * mapGroups streams ONE user's events through a 3-slot insertion fold
    * keyed by the deterministic (ts_us, event_id) order — O(3) state per
    * group, never a full per-user buffer (an it.toSeq.sortBy would
    * materialize a hot key's whole history in executor memory for a
    * first-3 answer). This is the imperative escape hatch for logic a
    * Column can't express; everything downstream returns to DataFrame ops.
    * The limit-20 boundary is a strict total order (n_users desc, path asc;
    * path is the grouping key, hence unique).
    */
  val dsTypedPaths = Op(
    "ds_typed_paths",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        .as[(Long, Long, Long, String)]
      val ordK = implicitly[Ordering[(Long, Long)]]
      val paths = ev.groupByKey(_._1)
        .mapGroups { (uid, it) =>
          // bounded insertion fold: keep the 3 smallest (ts_us, event_id)
          // seen so far; each new row either displaces the current worst
          // or is dropped on the spot — O(3) memory however hot the key
          val best = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
          it.foreach { e =>
            val c = (e._2, e._3, e._4)
            if (best.size < 3) {
              best += c
              best.sortInPlaceBy(x => (x._1, x._2))(ordK)
            } else if (ordK.lt((c._1, c._2), (best(2)._1, best(2)._2))) {
              best(2) = c
              best.sortInPlaceBy(x => (x._1, x._2))(ordK)
            }
          }
          (uid, best.map(_._3).mkString(">"))
        }
        .toDF("user_id", "path")
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    },
    Some("""
      WITH up AS (
        SELECT user_id,
               array_to_string((array_agg(event_type ORDER BY ts, event_id))[1:3],
                               '>') AS path
        FROM events GROUP BY user_id)
      SELECT path, COUNT(*) AS n_users FROM up
      GROUP BY path ORDER BY n_users DESC, path LIMIT 20
    """)
  )

  /** Per-user session stats via SECONDARY SORT — the scale-superior physical
    * plan for per-key ordered scans: repartition by user_id, sort within
    * partitions by (user_id, sec, event_id), then ONE streaming pass per
    * partition with O(1) state (current user's running counters — never a
    * per-group materialization like groupByKey.mapGroups, never a window's
    * sort+frame machinery). Emits one row per user: session count (30-min
    * gap rule), event count, and the largest session's event count. Same
    * session semantics as stream_sessionize_30m, so the oracle is that op's
    * CTE chain re-aggregated per user.
    */
  val evtSessionsSecondarySort = Op(
    "evt_sessions_secondary_sort",
    (s, d) => {
      import s.implicits._
      val sorted = T.events(s, d)
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"), col("event_id"))
        .repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("sec"), col("event_id"))
        .as[(Long, Long, Long)]
      sorted.mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var cur = Long.MinValue; var prevSec = 0L
        var nSess = 0L; var nEv = 0L; var curLen = 0L; var maxLen = 0L
        def flush(): Unit = if (cur != Long.MinValue) {
          out += ((cur, nSess, nEv, math.max(maxLen, curLen)))
        }
        it.foreach { case (u, sec, _) =>
          if (u != cur) {
            flush()
            cur = u; nSess = 1L; nEv = 1L; curLen = 1L; maxLen = 0L
          } else if (sec - prevSec > 1800L) {
            nSess += 1L; nEv += 1L; maxLen = math.max(maxLen, curLen); curLen = 1L
          } else {
            nEv += 1L; curLen += 1L
          }
          prevSec = sec
        }
        flush()
        out.iterator
      }.toDF("user_id", "n_sessions", "n_events", "max_session_events")
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ord AS (
        SELECT user_id, event_id, ts,
               CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS sec,
               LAG(CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT)) OVER w AS prev_sec
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      flagged AS (
        SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS gap
        FROM ord),
      sess AS (
        SELECT *, SUM(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged),
      per AS (SELECT user_id, session_id, COUNT(*) AS n FROM sess GROUP BY 1, 2)
      SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events,
             MAX(n) AS max_session_events
      FROM per GROUP BY user_id ORDER BY user_id
    """)
  )

  /** Hourly traffic anomaly detection: per event_type, flag hours whose
    * count deviates ≥1.5× (or ≤0.5×) from the mean of the 6 trailing
    * OBSERVED hourly buckets (rows-frame, so sparse series stay
    * well-defined). Deliberately avoids stddev — Spark and DuckDB compute
    * variance with different floating accumulation, which breaks
    * hash-parity; the integer ratio n*6/trail_sum is the identical IEEE
    * division in both engines. The series aggregation is one groupBy over
    * the log; the window runs over the tiny (type × hour) series — at
    * 100 TB the expensive part stays a map-side-combined count.
    */
  val evtHourlyAnomaly = Op(
    "evt_hourly_anomaly",
    (s, d) => {
      val hourly = T.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(-6, -1)
      hourly
        .withColumn("trail_sum", sum(col("n")).over(w))
        .withColumn("trail_cnt", count(col("n")).over(w))
        .filter(col("trail_cnt") === 6)
        .withColumn("ratio", round(col("n") * lit(6.0) / col("trail_sum"), 6))
        .filter(col("ratio") >= 1.5 || col("ratio") <= 0.5)
        .select(col("h").as("hour"), col("event_type"), col("n"), col("ratio"))
        .orderBy(col("hour"), col("event_type"))
    },
    Some("""
      WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      tr AS (
        SELECT *, SUM(n) OVER w AS trail_sum, COUNT(n) OVER w AS trail_cnt
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
      SELECT h AS hour, event_type, n, ROUND(n * 6.0 / trail_sum, 6) AS ratio
      FROM tr
      WHERE trail_cnt = 6
        AND (ROUND(n * 6.0 / trail_sum, 6) >= 1.5 OR ROUND(n * 6.0 / trail_sum, 6) <= 0.5)
      ORDER BY hour, event_type
    """)
  )

  /** RFM user segmentation — recency / frequency / monetary, the classic
    * intent-scoring rollup of a purchase log: hours since last purchase
    * (against the log's own horizon, so the op is reproducible), purchase
    * count, and decimal-exact spend, then a rule-based segment label. One
    * groupBy on user_id plus a broadcast 1-row horizon join — no window,
    * no skew risk, linear at any log size. Rule thresholds (not ntile
    * cutoffs) keep each user's label independent of every other user —
    * at 100 TB that means no global rank; the distributed-quantile path,
    * if percentile cutoffs are wanted, is win_rank_distributed.
    */
  val evtRfmSegments = Op(
    "evt_rfm_segments",
    (s, d) => {
      val p = T.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val horizon = p.agg(max(unix_micros(col("ts"))).as("h_us"))
      val rfm = p.groupBy(col("user_id"))
        .agg(
          max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("frequency"),
          Det.sumDec(col("value")).as("monetary"))
        .crossJoin(broadcast(horizon))
        .withColumn("recency_hr", expr("(h_us - last_us) div 3600000000"))
      rfm.withColumn("segment",
          when(col("frequency") >= 30 && col("recency_hr") <= 72, "champion")
            .when(col("frequency") >= 15, "loyal")
            .when(col("recency_hr") >= 240, "at_risk")
            .otherwise("regular"))
        .select(col("user_id"), col("recency_hr"), col("frequency"),
          col("monetary"), col("segment"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH p AS (
        SELECT user_id, epoch_us(ts) AS us, value
        FROM events WHERE event_type = 'purchase'),
      h AS (SELECT MAX(us) AS h_us FROM p),
      rfm AS (
        SELECT user_id,
               CAST((h.h_us - MAX(p.us)) // 3600000000 AS BIGINT) AS recency_hr,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary
        FROM p, h GROUP BY user_id, h.h_us)
      SELECT user_id, recency_hr, frequency, monetary,
             CASE WHEN frequency >= 30 AND recency_hr <= 72 THEN 'champion'
                  WHEN frequency >= 15 THEN 'loyal'
                  WHEN recency_hr >= 240 THEN 'at_risk'
                  ELSE 'regular' END AS segment
      FROM rfm ORDER BY user_id
    """)
  )

  /** A/B experiment readout — deterministic variant assignment (the same
    * engine-stable multiplicative hash as the sampling ops, so a user's
    * variant is recomputable anywhere and stable for the experiment's
    * life), per-variant conversion to purchase, lift, and the two-
    * proportion z-statistic in closed form. One groupBy on user_id + one
    * 1-row aggregate — nothing scales with event volume except the first
    * per-user pass. All ratio arithmetic is written in the identical
    * order in both engines; round6 absorbs last-ulp libm noise in sqrt.
    *
    * DOCUMENTED ID BOUND for the `user_id * 2654435761 mod 2^32` cohort
    * hash (shared by evt_diff_in_diff, evt_welch_ttest, evt_ab_power_mde,
    * ml_cem_matching, ml_qini_uplift): the multiply stays inside signed
    * 64-bit only for user_id < 2^63/2654435761 ≈ 3.47e9. Above that,
    * Spark wraps silently while DuckDB's BIGINT multiply errors — the
    * engines diverge. Fixture ids (and any realistic sequential user id
    * space; 3.47e9 users is half the planet) are far below the bound; a
    * deployment with larger ids must pre-reduce with the residue-multiply
    * idiom (see sources/RangeLedger.unitsOf) in BOTH engines so the
    * product never leaves signed 64-bit.
    */
  val evtAbTestLift = Op(
    "evt_ab_test_lift",
    (s, d) => {
      val bucket = pmod(col("user_id") * lit(2654435761L), lit(4294967296L))
      // "converted" must not be near-universal (a month of events gives
      // nearly every user a purchase → p=1 → zero z denominator); the
      // purchases-exceed-signups comparison splits users near 50/50 at
      // every sf
      val users = T.events(s, d)
        .groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
              sum(when(col("event_type") === "signup", 1L).otherwise(0L)))
          .cast("long").as("converted"))
        .withColumn("variant", when(bucket < lit(2147483648L), "A").otherwise("B"))
      users.agg(
          sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === "A", col("converted")).otherwise(0L)).as("conv_a"),
          sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === "B", col("converted")).otherwise(0L)).as("conv_b"))
        .withColumn("rate_a", round(col("conv_a") / col("n_a"), 6))
        .withColumn("rate_b", round(col("conv_b") / col("n_b"), 6))
        .withColumn("lift", round((col("conv_b") / col("n_b")) / (col("conv_a") / col("n_a")) - 1.0, 6))
        .withColumn("z_stat", round(
          ((col("conv_a") / col("n_a")) - (col("conv_b") / col("n_b"))) /
          nullif(sqrt(((col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b"))) *
               (lit(1.0) - (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b"))) *
               (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), lit(0.0)), 6))
    },
    Some("""
      WITH users AS (
        SELECT user_id,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >
                         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS converted,
               CASE WHEN (MIN(user_id) * 2654435761) % 4294967296 < 2147483648
                    THEN 'A' ELSE 'B' END AS variant
        FROM events GROUP BY user_id),
      agg AS (
        SELECT CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        FROM users)
      SELECT n_a, conv_a, n_b, conv_b,
             ROUND(conv_a / n_a, 6) AS rate_a,
             ROUND(conv_b / n_b, 6) AS rate_b,
             ROUND((conv_b / n_b) / (conv_a / n_a) - 1.0, 6) AS lift,
             ROUND(((conv_a / n_a) - (conv_b / n_b)) /
                   NULLIF(sqrt(((conv_a + conv_b) / (n_a + n_b)) *
                        (1.0 - (conv_a + conv_b) / (n_a + n_b)) *
                        (1.0 / n_a + 1.0 / n_b)), 0.0), 6) AS z_stat
      FROM agg
    """)
  )

  /** U-shaped multi-touch attribution (r3c) — the marketing-analytics
    * workhorse: each purchase's value is credited across the user's clicks
    * in the preceding 7 days (40% first touch / 40% last / 20% split over
    * the middles; 1 touch takes all, 2 split evenly). Every weight and
    * every credit is INTEGER: weights in ppm with the integer-division
    * remainder pinned to the last middle touch, purchase value scaled to
    * exact 1e-4 units through DECIMAL(18,4), credit = value_units * ppm
    * div 1e6 — bit-stable under any shuffle order, fully hash-oracled
    * (float attribution never is). Scale shape: the clicks⋈purchases join
    * keys on user_id (the event log's natural partition key — per-user
    * fanout is bounded by the 7-day window), the per-purchase
    * first/last/count ranking is one window over that same partitioning,
    * and the final rollup is 3 rows.
    */
  val evtAttributionU = Op(
    "evt_attribution_u",
    (s, d) => {
      val ev = T.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"), col("value").cast("decimal(18,4)").as("p_val"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      val touches = purchases.join(clicks, Seq("user_id"))
        .filter(col("c_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS") &&
          col("c_ts") < col("p_ts"))
      val w = Window.partitionBy(col("p_id"))
      val wOrd = w.orderBy(col("c_ts"), col("c_id"))
      val ranked = touches
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("cnt", count(lit(1)).over(w))
      val weighted = ranked.withColumn("w_ppm",
        when(col("cnt") === 1, lit(1000000L))
          .when(col("cnt") === 2, lit(500000L))
          .when(col("rn") === 1, lit(400000L))
          .when(col("rn") === col("cnt"), lit(400000L))
          // middle: equal integer split, remainder pinned to the LAST
          // middle (`div`, not `/` — Column./ on longs is double division)
          .otherwise(expr(
            "200000L div (cnt - 2) + IF(rn = cnt - 1, 200000L % (cnt - 2), 0L)")))
      weighted
        .withColumn("bucket",
          when(col("cnt") === 1, "only")
            .when(col("rn") === 1, "first")
            .when(col("rn") === col("cnt"), "last")
            .otherwise("middle"))
        // p_val DECIMAL(18,4) * 10000 = exact integer 1e-4 value units
        .withColumn("credit_units",
          expr("CAST(p_val * 10000 AS BIGINT) * w_ppm div 1000000"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_touches"),
          sum(col("w_ppm")).as("ppm_mass"),
          sum(col("credit_units")).as("credit_units"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH purchases AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(value AS DECIMAL(18,4)) AS p_val
        FROM events WHERE event_type = 'purchase'),
      clicks AS (
        SELECT user_id, ts AS c_ts, event_id AS c_id
        FROM events WHERE event_type = 'click'),
      touches AS (
        SELECT p.p_id, p.p_val, c.c_ts, c.c_id
        FROM purchases p JOIN clicks c USING (user_id)
        WHERE c.c_ts >= p.p_ts - INTERVAL 7 DAY AND c.c_ts < p.p_ts),
      ranked AS (
        SELECT p_id, p_val,
               ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ts, c_id) AS rn,
               COUNT(*) OVER (PARTITION BY p_id) AS cnt
        FROM touches),
      weighted AS (
        SELECT p_id, p_val, rn, cnt,
               CASE WHEN cnt = 1 THEN 1000000
                    WHEN cnt = 2 THEN 500000
                    WHEN rn = 1 THEN 400000
                    WHEN rn = cnt THEN 400000
                    ELSE 200000 // (cnt - 2)
                         + CASE WHEN rn = cnt - 1 THEN 200000 % (cnt - 2) ELSE 0 END
               END AS w_ppm,
               CASE WHEN cnt = 1 THEN 'only'
                    WHEN rn = 1 THEN 'first'
                    WHEN rn = cnt THEN 'last'
                    ELSE 'middle' END AS bucket
        FROM ranked)
      SELECT bucket, COUNT(*) AS n_touches,
             CAST(SUM(w_ppm) AS BIGINT) AS ppm_mass,
             CAST(SUM(CAST(p_val * 10000 AS BIGINT) * w_ppm // 1000000) AS BIGINT) AS credit_units
      FROM weighted
      GROUP BY bucket ORDER BY bucket
    """)
  )

  /** Rolling active users — DAU / trailing-7-day WAU / trailing-30-day MAU
    * per day (r5), the headline engagement metrics of every product
    * analytics stack, computed EXACTLY with no range join and no
    * re-scan-per-window: the raw log first collapses to distinct
    * (day, user) pairs (the only big shuffle — map-side combine on a
    * bounded key), then each pair EXPLODES to the trailing days it serves
    * (7 rows for WAU, 30 for MAU — fanout of the collapsed pairs, never
    * the log) and a distinct-count per target day finishes the job. This
    * is the window-decomposition trick for non-decomposable DISTINCT:
    * shuffle volume is |pairs|·37, independent of raw event volume — at
    * 100 TB of events the pairs table is the ~GB-scale thing that moves.
    * Early days report genuine partial trailing windows (standard
    * semantics); the spine is restricted to observed days so the explode
    * never manufactures days past the log's end. The approximate twin at
    * extreme |pairs| is the stored-sketch path (win_sliding_distinct_hll);
    * this op is the exact tier. All-integer → fully hash-oracled.
    */
  val evtActiveUsersRolling = Op(
    "evt_active_users_rolling",
    (s, d) => {
      val pairs = T.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
        .localCheckpoint(true) // feeds dau + two explodes: one scan, not three
      val days = pairs.select(col("day")).distinct()
      val dau = pairs.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      def trailing(span: Int, name: String) = pairs
        .select(explode(sequence(col("day"), date_add(col("day"), span - 1)))
          .as("day"), col("user_id"))
        .join(days, "day") // drop targets past the observed range
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as(name))
      dau
        .join(trailing(7, "wau"), "day")
        .join(trailing(30, "mau"), "day")
        .orderBy(col("day"))
    },
    Some("""
      WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      days AS (SELECT DISTINCT day FROM pairs),
      dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM pairs GROUP BY day),
      wau AS (SELECT d.day, COUNT(DISTINCT p.user_id) AS wau
              FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
              GROUP BY d.day),
      mau AS (SELECT d.day, COUNT(DISTINCT p.user_id) AS mau
              FROM days d JOIN pairs p ON p.day BETWEEN d.day - 29 AND d.day
              GROUP BY d.day)
      SELECT day, dau, wau, mau
      FROM dau JOIN wau USING (day) JOIN mau USING (day)
      ORDER BY day
    """)
  )

  /** Time-to-conversion distribution (r5) — the "how long does converting
    * take?" companion to `evt_funnel_conversion`'s "how many convert?":
    * per user, the lag from first view to the first purchase after it,
    * rolled into an hour-bucket histogram with cumulative counts and
    * integer-ppm cumulative share (the CDF a growth team reads "p50 of
    * converters convert within N hours" off of). Lag math is µs-exact on
    * both engines (unix_micros ↔ epoch_us, floor-divided to hours); the
    * cumsum window runs over the HISTOGRAM (|distinct lag hours| rows),
    * never raw events — the same scale shape as `agg_weighted_median`.
    */
  private val evtTimeToConvert = Op(
    "evt_time_to_convert",
    (s, d) => {
      val ev = T.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tp"), min(col("t1")).as("t1"))
      val h = p
        .select(expr("(unix_micros(tp) - unix_micros(t1)) div 3600000000L").as("lag_hours"))
        .groupBy(col("lag_hours")).agg(count(lit(1)).as("n_users"))
      val cum = Window.orderBy(col("lag_hours"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("cum_users", sum(col("n_users")).over(cum))
        .withColumn("cum_ppm",
          expr("cum_users * 1000000 div sum(n_users) over ()"))
        .select(col("lag_hours"), col("n_users"), col("cum_users"), col("cum_ppm"))
        .orderBy(col("lag_hours"))
    },
    Some("""
      WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      p AS (SELECT e.user_id, MIN(e.ts) AS tp
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > v.t1 GROUP BY 1),
      lag AS (SELECT (epoch_us(tp) - epoch_us(t1)) // 3600000000 AS lag_hours
              FROM p JOIN v ON p.user_id = v.user_id),
      h AS (SELECT lag_hours, COUNT(*) AS n_users FROM lag GROUP BY 1),
      c AS (SELECT lag_hours, n_users,
                   CAST(SUM(n_users) OVER (ORDER BY lag_hours
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users,
                   CAST(SUM(n_users) OVER () AS BIGINT) AS total
            FROM h)
      SELECT lag_hours, n_users, cum_users,
             cum_users * 1000000 // total AS cum_ppm
      FROM c ORDER BY lag_hours
    """)
  )

  /** Cohort LTV curve (r5) — cumulative revenue per signup cohort by weeks
    * since signup: where `evt_retention_cohorts` counts who comes back,
    * this sums what they SPEND — the lifetime-value read that decides
    * acquisition budgets. Money routes through DECIMAL(18,4) (App. A: never
    * sum doubles), the cumulative sum is a decimal window over the tiny
    * (cohort, week) aggregate — order-independent because decimal addition
    * is exact — and only the final presentation casts to double. Cohort
    * weeks via date_trunc('week') and calendar-day diffs, identical on both
    * engines (Monday-start weeks, exact integer day arithmetic).
    */
  private val evtCohortLtv = Op(
    "evt_cohort_ltv",
    (s, d) => {
      val ev = T.events(s, d)
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val wk = ev.filter(col("event_type") === "purchase")
        .join(s0, "user_id").filter(col("ts") >= col("t0"))
        .select(
          to_date(date_trunc("week", to_date(col("t0")))).as("cohort_week"),
          expr("cast(datediff(to_date(ts), to_date(t0)) div 7 as bigint)")
            .as("weeks_since"),
          col("value").cast("decimal(18,4)").as("v"))
      val agg = wk.groupBy(col("cohort_week"), col("weeks_since"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("v")).as("rev"))
      val cum = Window.partitionBy(col("cohort_week")).orderBy(col("weeks_since"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      agg
        .withColumn("cum_rev",
          sum(col("rev")).over(cum).cast("decimal(18,4)").cast("double"))
        .select(col("cohort_week"), col("weeks_since"), col("n_purchases"),
          col("rev").cast("double").as("rev"), col("cum_rev"))
        .orderBy(col("cohort_week"), col("weeks_since"))
    },
    Some("""
      WITH s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
                  WHERE event_type = 'signup' GROUP BY 1),
      wk AS (SELECT date_trunc('week', CAST(s0.t0 AS DATE)) AS cohort_week,
                    date_diff('day', CAST(s0.t0 AS DATE), CAST(e.ts AS DATE)) // 7
                      AS weeks_since,
                    CAST(e.value AS DECIMAL(18,4)) AS v
             FROM events e JOIN s0 ON s0.user_id = e.user_id
             WHERE e.event_type = 'purchase' AND e.ts >= s0.t0),
      agg AS (SELECT cohort_week, weeks_since, COUNT(*) AS n_purchases,
                     SUM(v) AS rev FROM wk GROUP BY 1, 2)
      SELECT cohort_week, weeks_since, n_purchases,
             CAST(rev AS DOUBLE) AS rev,
             CAST(CAST(SUM(rev) OVER (PARTITION BY cohort_week
                  ORDER BY weeks_since ROWS UNBOUNDED PRECEDING)
                AS DECIMAL(18,4)) AS DOUBLE) AS cum_rev
      FROM agg ORDER BY cohort_week, weeks_since
    """)
  )

  /** Sequence-pattern matching over per-user-day event streams (r7) — the
    * MATCH_RECOGNIZE capability Spark SQL lacks, composed from primitives
    * it has: each (user, day) stream collapses to a type-initial string in
    * strict (ts, event_id) order (sort_array of (key, initial) structs —
    * collect_list alone has NO order guarantee under merging shuffles, the
    * classic nondeterminism trap), then ADJACENCY patterns are plain
    * regexes over that string: 'vcp' = view→click→purchase with nothing
    * between (evt_funnel_conversion's ordered-funnel can't see
    * intervening events — this is the strict form), 'ce' = click
    * immediately followed by error (the rage-click signal). regexp_count
    * counts non-overlapping matches in both engines. The per-group string
    * is bounded by the group's own event count, state is one group per
    * task, and the rollup is one map-side-combined aggregate — scan-speed
    * at any scale. Sequence stats ride along (n_groups, events/group) so
    * the pattern rates have denominators.
    */
  val evtSequencePattern = Op(
    "evt_sequence_pattern",
    (s, d) => {
      val seq = T.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ini"))
        .groupBy(col("user_id"), col("day"))
        .agg(sort_array(collect_list(struct(col("ts_us"), col("event_id"), col("ini"))))
          .as("evs"))
        .select(col("user_id"), col("day"),
          concat_ws("", expr("transform(evs, e -> e.ini)")).as("seq"))
      seq.agg(
          count(lit(1)).as("n_groups"),
          sum(length(col("seq"))).as("n_events"),
          sum(expr("regexp_count(seq, 'vcp')")).as("n_vcp"),
          sum(when(expr("regexp_count(seq, 'vcp')") > 0, 1L).otherwise(0L))
            .as("groups_with_vcp"),
          sum(expr("regexp_count(seq, 'ce')")).as("n_rage"),
          sum(expr("regexp_count(seq, 'v{3,}')")).as("n_browse_runs"))
    },
    Some("""
      WITH seq AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               string_agg(substr(event_type, 1, 1), ''
                 ORDER BY epoch_us(ts), event_id) AS seq
        FROM events GROUP BY 1, 2)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(len(seq)) AS BIGINT) AS n_events,
             CAST(SUM(len(regexp_extract_all(seq, 'vcp'))) AS BIGINT) AS n_vcp,
             CAST(SUM(CASE WHEN len(regexp_extract_all(seq, 'vcp')) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS groups_with_vcp,
             CAST(SUM(len(regexp_extract_all(seq, 'ce'))) AS BIGINT) AS n_rage,
             CAST(SUM(len(regexp_extract_all(seq, 'v{3,}'))) AS BIGINT) AS n_browse_runs
      FROM seq
    """)
  )

  /** Weekly growth accounting (the new/retained/resurrected/churned user
    * ledger of every growth team, e.g. the "growth accounting" formulation
    * popularized by Social Capital) — evt_retention_cohorts answers "how
    * does each cohort decay", this answers the complementary "where did
    * this week's active users COME from, and who left": per week,
    * new = first-ever activity, retained = also active the immediately
    * preceding week, resurrected = returning after a gap ≥ 2 weeks,
    * churned = active in week w but not w+1, booked in week w+1 (only once
    * observable, i.e. w+1 ≤ the corpus's last week). Identity the ledger
    * must satisfy: active(w) = new + retained + resurrected and
    * active(w) − retained(w+1) = churned(w+1). Plan: the event log
    * collapses to the distinct (user, week) activity matrix FIRST (the
    * retention-cohort discipline — shuffle the tiny matrix, not the log),
    * then one user_id window supplies lag/lead, conditional aggregation
    * books the states, and the churn side joins back full-outer on week.
    * The max-week bound is a 1-row broadcast scalar, never a driver value.
    */
  val evtLifecycleStates = Op(
    "evt_lifecycle_states",
    (s, d) => {
      val act = T.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
      val st = act
        .withColumn("prev", lag(col("wk"), 1).over(w))
        .withColumn("nxt", lead(col("wk"), 1).over(w))
      val states = st.groupBy(col("wk")).agg(
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev") === col("wk") - expr("INTERVAL 7 DAYS"), 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("prev").isNotNull &&
            col("prev") < col("wk") - expr("INTERVAL 7 DAYS"), 1L)
          .otherwise(0L)).as("n_resurrected"),
        count(lit(1)).as("n_active"))
      val maxwk = act.agg(max(col("wk")).as("maxwk"))
      val churn = st
        .filter(col("nxt").isNull || col("nxt") > col("wk") + expr("INTERVAL 7 DAYS"))
        .select((col("wk") + expr("INTERVAL 7 DAYS")).as("wk"))
        .crossJoin(broadcast(maxwk))
        .filter(col("wk") <= col("maxwk"))
        .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
      states.join(churn, Seq("wk"), "full_outer")
        .select(col("wk"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
          coalesce(col("n_active"), lit(0L)).as("n_active"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .orderBy(col("wk"))
    },
    Some("""
      WITH act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
      st AS (SELECT user_id, wk,
                    LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
                    LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
             FROM act),
      states AS (
        SELECT wk,
               SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS n_new,
               SUM(CASE WHEN prev = wk - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS n_retained,
               SUM(CASE WHEN prev IS NOT NULL AND prev < wk - INTERVAL 7 DAY
                        THEN 1 ELSE 0 END) AS n_resurrected,
               COUNT(*) AS n_active
        FROM st GROUP BY wk),
      churn AS (
        SELECT wk + INTERVAL 7 DAY AS wk, COUNT(*) AS n_churned
        FROM st CROSS JOIN (SELECT MAX(wk) AS maxwk FROM act)
        WHERE (nxt IS NULL OR nxt > wk + INTERVAL 7 DAY)
          AND wk + INTERVAL 7 DAY <= maxwk
        GROUP BY 1)
      SELECT COALESCE(s.wk, c.wk) AS wk,
             CAST(COALESCE(s.n_new, 0) AS BIGINT) AS n_new,
             CAST(COALESCE(s.n_retained, 0) AS BIGINT) AS n_retained,
             CAST(COALESCE(s.n_resurrected, 0) AS BIGINT) AS n_resurrected,
             CAST(COALESCE(s.n_active, 0) AS BIGINT) AS n_active,
             CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
      FROM states s FULL OUTER JOIN churn c ON s.wk = c.wk
      ORDER BY wk
    """)
  )

  /** Bot/automation detection via inter-event gap statistics — the
    * timing-regularity screen every clickstream pipeline runs before
    * training on engagement data (humans arrive in bursts separated by
    * hours; scripts tick at machine cadence, so the fraction of SHORT
    * gaps separates them better than any volume threshold). Per user:
    * consecutive-event gaps on the integer µs timeline (lag over
    * (ts, event_id) — the unique id makes equal-timestamp order
    * deterministic), then one map-side-combined rollup: gap count,
    * min/avg gap (floor div), and rapid_ppm = fraction of gaps under an
    * hour in integer ppm; is_bot flags sustained fast cadence
    * (≥ 20% rapid over ≥ 10 gaps). NULLIF guards the single-event user
    * (DuckDB's integer `// 0` is an error, not NULL). One shuffle on
    * user_id shared by window and rollup; emits the top-20 most
    * machine-like users. All integer → hash-exact.
    */
  val evtBotGapStats = Op(
    "evt_bot_gap_stats",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("gap").isNotNull, 1L).otherwise(0L)).as("n_gaps"),
          min(col("gap")).as("min_gap_us"),
          expr("sum(gap) div nullif(sum(case when gap is not null then 1 else 0 end), 0)")
            .as("avg_gap_us"),
          expr("(1000000 * sum(case when gap < 3600000000 then 1 else 0 end)) " +
            "div nullif(sum(case when gap is not null then 1 else 0 end), 0)")
            .as("rapid_ppm"))
        .filter(col("n_gaps") > 0)
        .withColumn("is_bot", col("rapid_ppm") >= 200000 && col("n_gaps") >= 10)
        .orderBy(col("rapid_ppm").desc, col("user_id"))
        .limit(20)
    },
    Some("""
      WITH g AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events),
      a AS (
        SELECT user_id, COUNT(*) AS n_events,
               SUM(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END) AS n_gaps,
               MIN(gap) AS min_gap_us,
               SUM(gap) // NULLIF(SUM(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END), 0) AS avg_gap_us,
               (1000000 * SUM(CASE WHEN gap < 3600000000 THEN 1 ELSE 0 END))
                 // NULLIF(SUM(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END), 0) AS rapid_ppm
        FROM g GROUP BY user_id)
      SELECT user_id, n_events, CAST(n_gaps AS BIGINT) AS n_gaps,
             CAST(min_gap_us AS BIGINT) AS min_gap_us,
             CAST(avg_gap_us AS BIGINT) AS avg_gap_us,
             CAST(rapid_ppm AS BIGINT) AS rapid_ppm,
             (rapid_ppm >= 200000 AND n_gaps >= 10) AS is_bot
      FROM a WHERE n_gaps > 0
      ORDER BY rapid_ppm DESC, user_id LIMIT 20
    """)
  )

  /** Day-of-week seasonality profile + seasonally-adjusted anomalies — the
    * piece the repo's other volume gates deliberately ignore: a flat
    * threshold (evt_hourly_anomaly, qc_anomaly_mad) flags every weekend
    * dip as an incident; deseasonalizing first means "low for ANY day" and
    * "low for a Sunday" are different questions. Weekday comes from
    * day-number mod 7 anchored at 2024-01-01 (a Monday) — Spark's
    * dayofweek counts 1=Sunday while DuckDB's counts 0=Sunday, exactly the
    * engine divergence a derived integer sidesteps. Per (type, weekday):
    * the lower-median daily count via a rank window over the ~4-sample
    * group (interpolation would reintroduce floats), residual = count −
    * its weekday median, flag when |residual| > max(3, median/4). Rollup
    * to the 35-row profile. Everything rides the daily table; one
    * (type, dow) shuffle.
    */
  val evtDowSeasonality = Op(
    "evt_dow_seasonality",
    (s, d) => {
      val daily = T.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dow",
          expr("datediff(day, DATE '2024-01-01') % 7").cast("long"))
      val wRank = Window.partitionBy(col("event_type"), col("dow"))
        .orderBy(col("cnt"), col("day"))
      val med = daily
        .withColumn("rn", row_number().over(wRank).cast("long"))
        .withColumn("n_days", count(lit(1)).over(
          Window.partitionBy(col("event_type"), col("dow"))))
        .filter(col("rn") === expr("(n_days + 1) div 2"))
        .select(col("event_type"), col("dow"), col("cnt").as("med_cnt"))
      daily.join(med, Seq("event_type", "dow"))
        .withColumn("resid", abs(col("cnt") - col("med_cnt")))
        .groupBy(col("event_type"), col("dow"))
        .agg(
          count(lit(1)).as("n_days"),
          first(col("med_cnt")).as("med_cnt"),
          max(col("resid")).as("max_abs_residual"),
          sum(when(col("resid") > greatest(lit(3L), expr("med_cnt div 4")), 1L)
            .otherwise(0L)).as("n_flagged"))
        .orderBy(col("event_type"), col("dow"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS BIGINT) AS dow
        FROM events GROUP BY 1, 2),
      med AS (
        SELECT event_type, dow, cnt AS med_cnt FROM (
          SELECT event_type, dow, cnt,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type, dow
                        ORDER BY cnt, day) AS BIGINT) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY event_type, dow) AS BIGINT) AS n_days
          FROM daily)
        WHERE rn = (n_days + 1) // 2)
      SELECT d.event_type, d.dow, COUNT(*) AS n_days,
             CAST(MIN(m.med_cnt) AS BIGINT) AS med_cnt,
             CAST(MAX(ABS(d.cnt - m.med_cnt)) AS BIGINT) AS max_abs_residual,
             CAST(SUM(CASE WHEN ABS(d.cnt - m.med_cnt) >
                    GREATEST(3, m.med_cnt // 4) THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
      FROM daily d JOIN med m ON d.event_type = m.event_type AND d.dow = m.dow
      GROUP BY d.event_type, d.dow
      ORDER BY d.event_type, d.dow
    """)
  )

  /** Top whole-session paths — the Sankey/user-flow aggregation:
    * evt_path_transitions gives the first-order (A→B) matrix, which by
    * construction cannot distinguish v→c→p from v→c→e→p; ranking ENTIRE
    * per-(user, day) journeys answers "what are users actually doing all
    * session", the view growth teams read before picking which funnel to
    * instrument. Reuses evt_sequence_pattern's deterministic collapse
    * (sort_array of (ts, event_id, initial) structs — bare collect_list
    * has no order guarantee), then one map-side-combined path count and a
    * TakeOrdered top-15 with (count DESC, path ASC) tie-break. Path
    * cardinality is bounded by distinct journey shapes, far below group
    * count — the count table is small however large the log.
    */
  val evtTopPaths = Op(
    "evt_top_paths",
    (s, d) => {
      T.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ini"))
        .groupBy(col("user_id"), col("day"))
        .agg(sort_array(collect_list(struct(col("ts_us"), col("event_id"), col("ini"))))
          .as("evs"))
        .select(concat_ws("", expr("transform(evs, e -> e.ini)")).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .withColumn("path_len", length(col("path")).cast("long"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(15)
    },
    Some("""
      WITH seq AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               string_agg(substr(event_type, 1, 1), ''
                 ORDER BY epoch_us(ts), event_id) AS path
        FROM events GROUP BY 1, 2)
      SELECT path, COUNT(*) AS n_sessions,
             CAST(len(path) AS BIGINT) AS path_len
      FROM seq GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 15
    """)
  )

  /** Per-source transition entropy (r7) — how PREDICTABLE each event type's
    * successor is: `evt_path_transitions` gives the first-order matrix, this
    * collapses each row of it to H = −Σ p·ln p over the next-type
    * distribution (near 0 ⇒ one dominant successor worth prefetching /
    * hard-coding in the intent model; near ln(|types|) ⇒ uniform, no
    * signal). Shares the matrix's plan — one user_id shuffle for the lead
    * window, map-side-combined (from, to) counts — then entropy rides the
    * ≤|types|² aggregate (agg-before-window), so the heavy stage is exactly
    * the transition count at any scale. The decimal(18,12)-summed ln terms +
    * round-6 presentation are the `txt_unigram_logprob` discipline
    * (shuffle-order-free sums, engine-identical ln); the dominant-successor
    * share is integer ppm.
    */
  val evtTransitionEntropy = Op(
    "evt_transition_entropy",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val m = T.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("c"))
      m.withColumn("n", sum(col("c")).over(Window.partitionBy(col("from_type"))))
        .withColumn("term",
          (-(col("c") / col("n")) * log(col("c") / col("n"))).cast("decimal(18,12)"))
        .groupBy(col("from_type"))
        .agg(
          sum(col("c")).as("n_out"),
          count(lit(1)).as("n_successors"),
          round(sum(col("term")).cast("double"), 6).as("h_nats"),
          expr("max(c) * 1000000 div max(n)").as("top_share_ppm"))
        .orderBy(col("from_type"))
    },
    Some("""
      WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_type
        FROM events),
      m AS (
        SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS c
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      r AS (
        SELECT from_type, to_type, c,
               CAST(SUM(c) OVER (PARTITION BY from_type) AS DOUBLE) AS n
        FROM m)
      SELECT from_type,
             CAST(SUM(c) AS BIGINT) AS n_out,
             COUNT(*) AS n_successors,
             ROUND(CAST(SUM(CAST(-(c / n) * LN(c / n) AS DECIMAL(18,12))) AS DOUBLE), 6) AS h_nats,
             MAX(c) * 1000000 // CAST(MAX(n) AS BIGINT) AS top_share_ppm
      FROM r GROUP BY from_type ORDER BY from_type
    """)
  )

  /** Seasonal-naive forecast backtest (r7) — the accuracy floor every
    * volume forecast must beat before it ships (Hyndman's forecasting
    * folklore: if your model can't beat "same weekday last week", deploy
    * the naive): forecast(d) = actual(d−7) per event_type, scored over
    * every day with a 7-back observation. Emits per-type MAPE and signed
    * bias in integer ppm plus the worst day — the go/no-go readout for
    * capacity planning and anomaly thresholds alike. The lag rides the
    * per-type ~30-row daily aggregate (agg-before-window, one shuffle on
    * the daily key), APE terms are exact integer ratios per day, and the
    * rollup is map-side combined: raw volume never reaches a window at
    * any scale. Worst day by max(struct(ape, −epoch_day)) — the LPA/
    * drawdown argmax idiom, earliest day wins ties, no second window.
    */
  val evtForecastBacktest = Op(
    "evt_forecast_backtest",
    (s, d) => {
      val daily = T.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("actual"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("fc", lag(col("actual"), 7).over(w))
        .filter(col("fc").isNotNull)
        .withColumn("ape_ppm", expr("abs(actual - fc) * 1000000 div actual"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_days"),
          expr("sum(ape_ppm) div count(1)").as("mape_ppm"),
          expr("(sum(actual) - sum(fc)) * 1000000 div sum(actual)").as("bias_ppm"),
          expr("max(struct(ape_ppm, -unix_date(day))).ape_ppm").as("worst_ape_ppm"),
          expr("date_from_unix_date(CAST(-max(struct(ape_ppm, -unix_date(day)))" +
            ".col2 AS INT))").as("worst_day"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS actual
        FROM events GROUP BY 1, 2),
      b AS (
        SELECT event_type, day, actual,
               LAG(actual, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc
        FROM daily),
      scored AS (
        SELECT event_type, day, actual, fc,
               abs(actual - fc) * 1000000 // actual AS ape_ppm
        FROM b WHERE fc IS NOT NULL)
      SELECT event_type,
             COUNT(*) AS n_days,
             CAST(SUM(ape_ppm) // COUNT(*) AS BIGINT) AS mape_ppm,
             CAST((SUM(actual) - SUM(fc)) * 1000000 // SUM(actual) AS BIGINT) AS bias_ppm,
             MAX(ape_ppm) AS worst_ape_ppm,
             first(day ORDER BY ape_ppm DESC, day) AS worst_day
      FROM scored GROUP BY event_type ORDER BY event_type
    """)
  )

  /** Time-bounded conversion funnel (r7) — the form product analytics
    * actually reports: `evt_funnel_conversion` counts who EVER converts,
    * this counts who converts IN TIME (click within 6 h of first view,
    * purchase within 24 h of that click) — the unbounded funnel
    * overstates intent capture by crediting a purchase three weeks later
    * to the original view. Same scale-sound chain (per-user min-aggs
    * joined on user_id — one exchange key throughout, never a global
    * window over raw events), with the deadline as a µs-exact half-open
    * interval on the integer timeline; per-stage conversion ppm via a lag
    * window over the 3-row stage rollup.
    */
  val evtFunnelWindowed = Op(
    "evt_funnel_windowed",
    (s, d) => {
      val ev = T.events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id")
        .filter(col("us") > col("t1") && col("us") <= col("t1") + lit(21600000000L))
        .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id")
        .filter(col("us") > col("t2") && col("us") <= col("t2") + lit(86400000000L))
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      def stage(df: org.apache.spark.sql.DataFrame, name: String, idx: Int) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), lit(idx).as("stage_idx"), col("n_users"))
      stage(t1, "view", 1)
        .unionByName(stage(t2, "click<=6h", 2))
        .unionByName(stage(t3, "purchase<=24h", 3))
        // the unpartitioned lag spans exactly the 3 stage rows
        .withColumn("conv_ppm", expr("CAST(n_users * 1000000 div " +
          "lag(n_users, 1) OVER (ORDER BY stage_idx) AS BIGINT)"))
        .orderBy(col("stage_idx"))
    },
    Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      t1 AS (SELECT user_id, MIN(us) AS t1 FROM ev
             WHERE event_type = 'view' GROUP BY user_id),
      t2 AS (SELECT e.user_id, MIN(us) AS t2 FROM ev e JOIN t1 USING (user_id)
             WHERE event_type = 'click' AND us > t1 AND us <= t1 + 21600000000
             GROUP BY e.user_id),
      t3 AS (SELECT e.user_id, MIN(us) AS t3 FROM ev e JOIN t2 USING (user_id)
             WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + 86400000000
             GROUP BY e.user_id),
      stages AS (
        SELECT 'view' AS stage, 1 AS stage_idx, COUNT(*) AS n_users FROM t1
        UNION ALL
        SELECT 'click<=6h', 2, COUNT(*) FROM t2
        UNION ALL
        SELECT 'purchase<=24h', 3, COUNT(*) FROM t3)
      SELECT stage, stage_idx, n_users,
             CAST(n_users * 1000000 //
               LAG(n_users, 1) OVER (ORDER BY stage_idx) AS BIGINT) AS conv_ppm
      FROM stages ORDER BY stage_idx
    """)
  )

  /** Audience-overlap matrix (r7) — which behaviors share users: the
    * upper-triangle Jaccard of user sets for every event-type pair
    * (searchers who purchase, clickers who error), the segmentation input
    * every cross-sell / cannibalization analysis starts from. The log
    * collapses ONCE to distinct (type, user) pairs (checkpointed — the
    * pair table feeds the self-join AND the per-type sizes), the
    * intersection is a user-keyed self-join of that matrix — shuffle
    * \|pairs\|, never the log — and overlap lands in integer ppm. Output
    * is the ≤\|types\|² matrix with both set sizes, exact at any scale
    * because the type vocabulary bounds everything after the collapse.
    */
  val evtOverlapMatrix = Op(
    "evt_overlap_matrix",
    (s, d) => {
      val pairs = T.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .localCheckpoint(true)
      val sizes = pairs.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val inter = pairs.as("a").join(pairs.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(sizes.select(col("event_type").as("type_a"), col("n").as("n_a")), Seq("type_a"))
        .join(sizes.select(col("event_type").as("type_b"), col("n").as("n_b")), Seq("type_b"))
        .withColumn("jaccard_ppm", expr("n_both * 1000000 div (n_a + n_b - n_both)"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_both"), col("jaccard_ppm"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some("""
      WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
      sizes AS (SELECT event_type, COUNT(*) AS n FROM pairs GROUP BY 1),
      inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
        FROM pairs a JOIN pairs b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
             n_both * 1000000 // (sa.n + sb.n - n_both) AS jaccard_ppm
      FROM inter
      JOIN sizes sa ON sa.event_type = inter.type_a
      JOIN sizes sb ON sb.event_type = inter.type_b
      ORDER BY type_a, type_b
    """)
  )

  /** Multi-window burn-rate alert (r7; the Google SRE workbook's
    * error-budget alerting policy): a single error-rate threshold either
    * pages too slowly (long window) or flaps on noise (short window) —
    * the fix is to require BOTH a fast window and a slow window to burn
    * above threshold simultaneously. Error share per hour in integer ppm,
    * the 6h trailing share from the same hourly table (sums of counts, a
    * rows-frame window — never a rescan), alert when 1h ≥ 2× the corpus
    * base rate AND 6h ≥ 1.5× — both thresholds integer-ppm arithmetic on
    * a broadcast 1-row base rate. Everything after the hourly rollup is
    * |hours| rows; the raw log is touched once, map-side combined.
    */
  val evtErrorRateSlo = Op(
    "evt_error_rate_slo",
    (s, d) => {
      val hourly = T.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
        .localCheckpoint(true)
      val base = hourly.agg(
        expr("sum(n_err) * 1000000 div sum(n)").as("base_ppm"))
      val w6 = Window.orderBy(col("hour")).rowsBetween(-5, 0)
      hourly
        .withColumn("rate_1h_ppm", expr("n_err * 1000000 div n"))
        .withColumn("n_6h", sum(col("n")).over(w6))
        .withColumn("err_6h", sum(col("n_err")).over(w6))
        .withColumn("rate_6h_ppm", expr("err_6h * 1000000 div n_6h"))
        .crossJoin(broadcast(base))
        .withColumn("page",
          col("rate_1h_ppm") * 10 >= col("base_ppm") * 13 &&
            col("rate_6h_ppm") * 10 >= col("base_ppm") * 11)
        .filter(col("page"))
        .select(col("hour"), col("n"), col("rate_1h_ppm"),
          col("rate_6h_ppm"), col("base_ppm"))
        .orderBy(col("hour"))
    },
    Some("""
      WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_err
        FROM events GROUP BY 1),
      base AS (
        SELECT CAST(SUM(n_err) * 1000000 // SUM(n) AS BIGINT) AS base_ppm
        FROM hourly),
      win AS (
        SELECT hour, n,
               n_err * 1000000 // n AS rate_1h_ppm,
               CAST(SUM(n_err) OVER tw * 1000000 // SUM(n) OVER tw AS BIGINT)
                 AS rate_6h_ppm
        FROM hourly
        WINDOW tw AS (ORDER BY hour ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
      SELECT hour, n, rate_1h_ppm, rate_6h_ppm, base_ppm
      FROM win, base
      WHERE rate_1h_ppm * 10 >= base_ppm * 13 AND rate_6h_ppm * 10 >= base_ppm * 11
      ORDER BY hour
    """)
  )

  /** Time-decayed engagement score (r7) — recency weighting, the signal
    * every intent/engagement ranker actually uses (an event last month
    * says less than one yesterday, and a plain count can't tell them
    * apart): value mass decayed with a 7-day half-life toward the corpus
    * horizon. The decay is EXACT integer math — weight_ppm = 1e6 >>
    * (age_days div 7), value in 1e-4 units, score = Σ units·w div 1e6 —
    * because a float 2^(−age/7) would be the one non-hash-matchable term
    * in an otherwise exact pipeline (the day-granular step decay is the
    * documented quantization). One broadcast 1-row horizon, one user_id
    * groupBy, map-side combined; top-20 most-engaged users with the full
    * tie-break, plus each user's undecayed mass so the recency effect is
    * visible in the output.
    */
  val evtDecayEngagement = Op(
    "evt_decay_engagement",
    (s, d) => {
      val ev = T.events(s, d)
        .select(col("user_id"), col("ts"),
          expr("CAST(floor(value * 10000) AS BIGINT)").as("units"))
      val horizon = ev.agg(max(expr("CAST(ts AS DATE)")).as("h"))
      ev.crossJoin(broadcast(horizon))
        .withColumn("age_d", datediff(col("h"), col("ts").cast("date")))
        // exponent capped at 20: beyond ~20 half-lives the ppm weight is 0
        // anyway, and an uncapped shift wraps at 63 (negative weight) then
        // 64 (division by zero) on a multi-year corpus
        .withColumn("w_ppm",
          expr("1000000 div shiftleft(1L, CAST(least(age_d div 7, 20) AS INT))"))
        .groupBy(col("user_id"))
        .agg(
          sum(expr("units * w_ppm div 1000000")).as("decayed_units"),
          sum(col("units")).as("raw_units"),
          count(lit(1)).as("n_events"))
        .orderBy(col("decayed_units").desc, col("user_id"))
        .limit(20)
    },
    Some("""
      WITH ev AS (
        SELECT user_id, ts, CAST(FLOOR(value * 10000) AS BIGINT) AS units
        FROM events),
      h AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM ev),
      w AS (
        SELECT user_id, units,
               1000000 // (CAST(1 AS BIGINT) << CAST(LEAST(date_diff('day', CAST(ts AS DATE), h) // 7, 20) AS INT))
                 AS w_ppm
        FROM ev, h)
      SELECT user_id,
             CAST(SUM(units * w_ppm // 1000000) AS BIGINT) AS decayed_units,
             CAST(SUM(units) AS BIGINT) AS raw_units,
             COUNT(*) AS n_events
      FROM w GROUP BY user_id
      ORDER BY decayed_units DESC, user_id LIMIT 20
    """)
  )

  /** Activity concentration via an exact grouped-data Gini coefficient
    * (r8) — "do 1% of users generate 90% of events?", the inequality
    * audit every consumer pipeline runs before trusting per-user
    * averages. Per-user event counts collapse to a count-of-counts
    * HISTOGRAM h(c, m) (≤ |distinct counts| rows — bounded by max
    * activity, never |users|), and the Gini rank sum uses the closed
    * form for tied groups: users in a bucket occupy ranks
    * (cum_lo, cum_hi], and 2·Σranks = m·(cum_lo + cum_hi + 1), so
    * 2·Σ rank·c = Σ_buckets c·m·(cum_lo+cum_hi+1) — pure integer
    * arithmetic, shuffle-order-independent, identical in both engines.
    * gini_ppm = (2Σrank·c − (N+1)·S)·1e6 div (N·S). The window runs over
    * the tiny histogram (agg-before-window); at 100 TB the only wide
    * shuffle is the per-user count. Long math: c·m·(2N+1) ≤ S·(2N+1) —
    * holds to ~2e9 users × 1e3 events.
    */
  val evtGiniConcentration = Op(
    "evt_gini_concentration",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = T.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val h = counts.groupBy(col("c")).agg(count(lit(1)).as("m"))
      val asc = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("cum_hi", sum(col("m")).over(asc).cast("long"))
        .agg(
          sum(col("m")).cast("long").as("n_users"),
          sum(col("c") * col("m")).cast("long").as("total_events"),
          max(col("c")).cast("long").as("max_user_events"),
          sum(col("c") * col("m") * (lit(2) * col("cum_hi") - col("m") + lit(1)))
            .cast("long").as("two_rc"))
        .select(col("n_users"), col("total_events"), col("max_user_events"),
          expr("(two_rc - (n_users + 1) * total_events) * 1000000 " +
            "div (n_users * total_events)").as("gini_ppm"))
    },
    Some("""
      WITH counts AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
      h AS (SELECT c, COUNT(*) AS m FROM counts GROUP BY c),
      w AS (SELECT c, m,
                   CAST(SUM(m) OVER (ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_hi
            FROM h),
      agg AS (
        SELECT CAST(SUM(m) AS BIGINT) AS n_users,
               CAST(SUM(c * m) AS BIGINT) AS total_events,
               CAST(MAX(c) AS BIGINT) AS max_user_events,
               CAST(SUM(c * m * (2 * cum_hi - m + 1)) AS BIGINT) AS two_rc
        FROM w)
      SELECT n_users, total_events, max_user_events,
             (two_rc - (n_users + 1) * total_events) * 1000000
               // (n_users * total_events) AS gini_ppm
      FROM agg
    """)
  )

  /** Difference-in-differences (r8) — the observational-causal twin of
    * `evt_ab_test_lift`: a hash-bucketed "treatment" cohort, the fixture
    * timeline split at its midpoint into pre/post, and the DiD estimate
    * (treat_post − treat_pre) − (ctrl_post − ctrl_pre) on mean per-user
    * purchase value. Money rides in floor(value·1e4) integer units (the
    * evt_decay_engagement idiom — IEEE multiply then truncate is
    * bit-identical in both engines) and means are integer floor divisions,
    * so the whole 2×2 panel is exact. The midpoint is a 1-row broadcast
    * scalar from a min/max agg, never a driver value; the panel collapses
    * via conditional aggregation to one row — at 100 TB: one scan to the
    * user-cell agg, one 4-row shuffle after it.
    */
  val evtDiffInDiff = Op(
    "evt_diff_in_diff",
    (s, d) => {
      val p = T.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          expr("CAST(floor(value * 10000) AS BIGINT)").as("units"))
      // integer floor-div midpoint: `/` would go through double, where
      // Spark's cast truncates but DuckDB's rounds — div agrees exactly
      val mid = p.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid_us"))
      val cells = p.crossJoin(broadcast(mid))
        .withColumn("treat",
          when(pmod(col("user_id") * lit(2654435761L), lit(4294967296L)) <
            lit(2147483648L), 1).otherwise(0))
        .withColumn("post", when(col("us") >= col("mid_us"), 1).otherwise(0))
        .groupBy(col("treat"), col("post"), col("user_id"))
        .agg(sum(col("units")).as("user_units"))
        .groupBy(col("treat"), col("post"))
        .agg(count(lit(1)).as("n_users"), sum(col("user_units")).as("units"))
        .withColumn("mean_units", expr("units div n_users"))
      cells.agg(
          sum(when(col("treat") === 1 && col("post") === 1, col("mean_units"))
            .otherwise(0L)).as("treat_post"),
          sum(when(col("treat") === 1 && col("post") === 0, col("mean_units"))
            .otherwise(0L)).as("treat_pre"),
          sum(when(col("treat") === 0 && col("post") === 1, col("mean_units"))
            .otherwise(0L)).as("ctrl_post"),
          sum(when(col("treat") === 0 && col("post") === 0, col("mean_units"))
            .otherwise(0L)).as("ctrl_pre"))
        .select(col("treat_pre"), col("treat_post"), col("ctrl_pre"),
          col("ctrl_post"),
          ((col("treat_post") - col("treat_pre")) -
            (col("ctrl_post") - col("ctrl_pre"))).as("did_units"))
    },
    Some("""
      WITH p AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(FLOOR(value * 10000) AS BIGINT) AS units
        FROM events WHERE event_type = 'purchase'),
      mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM p),
      cells AS (
        SELECT treat, post, COUNT(*) AS n_users,
               CAST(SUM(user_units) AS BIGINT) AS units
        FROM (
          SELECT CASE WHEN (user_id * 2654435761) % 4294967296 < 2147483648
                      THEN 1 ELSE 0 END AS treat,
                 CASE WHEN us >= (SELECT mid_us FROM mid) THEN 1 ELSE 0 END AS post,
                 user_id, SUM(units) AS user_units
          FROM p GROUP BY 1, 2, user_id)
        GROUP BY treat, post),
      m AS (SELECT treat, post, units // n_users AS mean_units FROM cells)
      SELECT
        CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN mean_units ELSE 0 END) AS BIGINT) AS treat_pre,
        CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN mean_units ELSE 0 END) AS BIGINT) AS treat_post,
        CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN mean_units ELSE 0 END) AS BIGINT) AS ctrl_pre,
        CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN mean_units ELSE 0 END) AS BIGINT) AS ctrl_post,
        CAST((SUM(CASE WHEN treat = 1 AND post = 1 THEN mean_units ELSE 0 END)
         - SUM(CASE WHEN treat = 1 AND post = 0 THEN mean_units ELSE 0 END))
        - (SUM(CASE WHEN treat = 0 AND post = 1 THEN mean_units ELSE 0 END)
           - SUM(CASE WHEN treat = 0 AND post = 0 THEN mean_units ELSE 0 END)) AS BIGINT) AS did_units
      FROM m
    """)
  )

  /** DAU/MAU stickiness (r8) — the engagement ratio product dashboards
    * live on: of the users active in a month, what fraction shows up on
    * an average day. One distinct (month, day, user) relation feeds BOTH
    * aggregations (daily actives and monthly actives are different
    * distincts over the same triples — checkpointed once, the fanout
    * discipline), then stickiness_ppm = Σdau·1e6 div (n_days·mau) in
    * exact integer ppm. At 100 TB the wide shuffle is the triple
    * distinct; everything after runs on calendar-bounded rows.
    */
  val evtStickinessRatio = Op(
    "evt_stickiness_ratio",
    (s, d) => {
      val base = T.events(s, d)
        .select(date_format(col("ts"), "yyyy-MM").as("month"),
          to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
        .localCheckpoint(true)
      val dau = base.groupBy(col("month"), col("day"))
        .agg(count(lit(1)).as("dau"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      val mau = base.select(col("month"), col("user_id")).distinct()
        .groupBy(col("month")).agg(count(lit(1)).as("mau"))
      dau.join(mau, "month")
        .select(col("month"), col("n_days"), col("mau"), col("sum_dau"),
          expr("sum_dau * 1000000 div (n_days * mau)").as("stickiness_ppm"))
        .orderBy(col("month"))
    },
    Some("""
      WITH base AS (
        SELECT DISTINCT strftime(ts, '%Y-%m') AS month,
               CAST(ts AS DATE) AS day, user_id
        FROM events),
      dau AS (
        SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(dau) AS BIGINT) AS sum_dau
        FROM (SELECT month, day, COUNT(*) AS dau FROM base GROUP BY month, day)
        GROUP BY month),
      mau AS (
        SELECT month, CAST(COUNT(*) AS BIGINT) AS mau
        FROM (SELECT DISTINCT month, user_id FROM base)
        GROUP BY month)
      SELECT month, n_days, mau, sum_dau,
             sum_dau * 1000000 // (n_days * mau) AS stickiness_ppm
      FROM dau JOIN mau USING (month)
      ORDER BY month
    """)
  )

  /** Kaplan–Meier survival in log space (r8; Kaplan & Meier 1958) — the
    * churn curve with CORRECT censoring: users still active on the
    * corpus's last day haven't churned, they're right-censored, and
    * averaging their lifetimes in would bias retention down (the mistake
    * the KM estimator exists to fix). Lifetimes collapse to a duration
    * histogram; at-risk counts come from one descending cumulative window
    * over it; and instead of the floating product Π(1−d/n) — which no
    * engine pair reproduces bit-for-bit — the op emits LOG-survival: each
    * hazard term ln((n−d)/n) cast to DECIMAL(18,12) (the
    * txt_unigram_logprob discipline) and cumulatively summed in duration
    * order, so every row is an exact decimal sum rounded once at the
    * edge. NULLIF guards the everyone-churns bucket (ln 0). All windows
    * ride the ≤ |distinct durations| histogram; the only wide shuffle is
    * the per-user min/max.
    */
  val evtSurvivalKm = Op(
    "evt_survival_km",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val days = T.events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
      val horizon = days.agg(max(col("day")).as("h_day"))
      val life = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
        .crossJoin(broadcast(horizon))
        .select(datediff(col("last_day"), col("first_day")).cast("long").as("dur"),
          when(col("last_day") < col("h_day"), 1L).otherwise(0L).as("churned"))
      val h = life.groupBy(col("dur"))
        .agg(count(lit(1)).as("m"), sum(col("churned")).as("d"))
      val before = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val all = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("n_at_risk",
          (sum(col("m")).over(all) - coalesce(sum(col("m")).over(before), lit(0L)))
            .cast("long"))
        .withColumn("ln_term",
          log(expr("cast(nullif(n_at_risk - d, 0) as double)") / col("n_at_risk"))
            .cast("decimal(18,12)"))
        .select(col("dur"), col("m"), col("d"), col("n_at_risk"),
          round(sum(col("ln_term")).over(cum).cast("double"), 6).as("log_surv"))
        .orderBy(col("dur"))
    },
    Some("""
      WITH days AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      hz AS (SELECT MAX(day) AS h_day FROM days),
      life AS (
        SELECT date_diff('day', MIN(day), MAX(day)) AS dur,
               CASE WHEN MAX(day) < (SELECT h_day FROM hz) THEN 1 ELSE 0 END AS churned
        FROM days GROUP BY user_id),
      h AS (SELECT dur, COUNT(*) AS m, CAST(SUM(churned) AS BIGINT) AS d
            FROM life GROUP BY dur),
      w AS (
        SELECT dur, m, d,
               CAST(SUM(m) OVER () -
                    COALESCE(SUM(m) OVER (ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n_at_risk
        FROM h),
      t AS (
        SELECT dur, m, d, n_at_risk,
               CAST(LN(CAST(NULLIF(n_at_risk - d, 0) AS DOUBLE) / n_at_risk)
                 AS DECIMAL(18,12)) AS ln_term
        FROM w)
      SELECT dur, m, d, n_at_risk,
             ROUND(CAST(SUM(ln_term) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
               AS log_surv
      FROM t ORDER BY dur
    """)
  )

  /** Peak concurrency by sweep line (r8) — "how many sessions were open at
    * once", the capacity number a serving tier is provisioned against:
    * 30-minute-gap sessionization (the stream_sessionize_30m rule in
    * batch), then each session contributes a +1 at its start and a −1 at
    * its end, and the per-day maximum of the running sum is the peak. Tie
    * discipline makes it deterministic: at an equal microsecond, starts
    * sort before ends (touching sessions count as concurrent), and the
    * MAX of a running sum is invariant to permuting rows with equal
    * (time, delta) — monotone within each tied block — so no further
    * tiebreak is needed for the per-day AGGREGATE even though per-row
    * running values are not unique. A session crossing midnight is
    * CLIPPED at day boundaries (r8 advice): it is exploded to one row per
    * covered day and posts +1 at max(start, day_start) and −1 at
    * min(end, day_end), so carried-over sessions count toward every day
    * they are open in — the true provisioning number. n_sessions_started
    * still counts only TRUE starts (start inside the day), so it is
    * unchanged by the explode. The explode fan-out is bounded by session
    * span in days (30-minute-gap sessions rarely cross even one
    * midnight). Day-partitioned windows throughout; the wide shuffles are
    * the per-user sessionize and the per-day sweep.
    */
  val evtPeakConcurrency = Op(
    "evt_peak_concurrency",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = T.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val wu = Window.partitionBy(col("user_id")).orderBy(col("us"))
      val sess = ev
        .withColumn("new_s",
          when(col("us") - lag(col("us"), 1).over(wu) > 1800000000L ||
            lag(col("us"), 1).over(wu).isNull, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          Window.partitionBy(col("user_id")).orderBy(col("us"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
      val sessDays = sess
        .withColumn("day", explode(sequence(
          to_date(timestamp_micros(col("s_us"))),
          to_date(timestamp_micros(col("e_us"))))))
        .withColumn("d0", unix_micros(col("day").cast("timestamp")))
        .withColumn("d1", unix_micros(date_add(col("day"), 1).cast("timestamp")))
      // +1/-1 sweep points via ONE explode over sessDays (r18, guide §2.4):
      // the old unionByName of two projections evaluated the whole
      // sessionize-windows + per-day explode subtree TWICE (the union legs
      // sit ABOVE the reusable user_id exchange, so stage reuse cannot
      // dedupe the window/agg work). Same rows by construction.
      val points = sessDays
        .select(col("day"), explode(array(
          struct(greatest(col("s_us"), col("d0")).as("us"),
            lit(1L).as("delta"), (col("s_us") >= col("d0")).as("true_start")),
          struct((least(col("e_us"), col("d1") - 1L)).as("us"),
            lit(-1L).as("delta"), lit(false).as("true_start")))).as("p"))
        .select(col("day"), col("p.us").as("us"), col("p.delta").as("delta"),
          col("p.true_start").as("true_start"))
      val wd = Window.partitionBy(col("day"))
        .orderBy(col("us"), col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      points
        .withColumn("running", sum(col("delta")).over(wd))
        .groupBy(col("day"))
        .agg(max(col("running")).as("peak_concurrent"),
          sum(when(col("delta") === 1L && col("true_start"), 1L)
            .otherwise(0L)).as("n_sessions_started"))
        .orderBy(col("day"))
    },
    Some("""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      flags AS (
        SELECT user_id, us,
               CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                      > 1800000000
                    OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM ev),
      sid AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flags),
      sess AS (
        SELECT user_id, sid, MIN(us) AS s_us, MAX(us) AS e_us
        FROM sid GROUP BY user_id, sid),
      sessdays AS (
        SELECT s_us, e_us,
               CAST(UNNEST(generate_series(
                 CAST(make_timestamp(s_us) AS DATE),
                 CAST(make_timestamp(e_us) AS DATE),
                 INTERVAL 1 DAY)) AS DATE) AS day
        FROM sess),
      clip AS (
        SELECT day,
               epoch_us(CAST(day AS TIMESTAMP)) AS d0,
               epoch_us(CAST(day + 1 AS TIMESTAMP)) AS d1,
               s_us, e_us
        FROM sessdays),
      points AS (
        SELECT day, GREATEST(s_us, d0) AS us, CAST(1 AS BIGINT) AS delta,
               (s_us >= d0) AS true_start FROM clip
        UNION ALL
        SELECT day, LEAST(e_us, d1 - 1), -1, FALSE FROM clip),
      run AS (
        SELECT day, us, delta, true_start,
               SUM(delta) OVER (PARTITION BY day
                 ORDER BY us, delta DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        FROM points)
      SELECT day,
             CAST(MAX(running) AS BIGINT) AS peak_concurrent,
             CAST(SUM(CASE WHEN delta = 1 AND true_start THEN 1 ELSE 0 END)
               AS BIGINT) AS n_sessions_started
      FROM run GROUP BY day ORDER BY day
    """)
  )

  /** Association rules over per-user behavior baskets (r8; Agrawal &
    * Srikant 1994's support/confidence/lift, at the pair level a
    * clickstream actually needs) — "users who sign up also purchase":
    * baskets are per-user distinct event-type sets, candidate pairs come
    * from a self-join of the once-checkpointed (user, type) relation
    * (fan-out bounded by basket size ≤ |types|, never a type×type
    * product), and support / both-direction confidence / lift are exact
    * integer ppm against broadcast singleton counts. lift stays in range
    * as (conf·N) div n_b (≤ 1e6·N — no N² term, safe to ~9e12 users).
    */
  val evtAssocRules = Op(
    "evt_assoc_rules",
    (s, d) => {
      val ut = T.events(s, d).select(col("user_id"), col("event_type"))
        .distinct()
      val singles = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val totals = ut.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      val pairs = ut.as("x").join(ut.as("y"), Seq("user_id"))
        .filter(col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(singles.select(col("event_type").as("a"), col("n").as("n_a")), "a")
        .join(singles.select(col("event_type").as("b"), col("n").as("n_b")), "b")
        .crossJoin(broadcast(totals))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          expr("n_ab * 1000000 div n_users").as("support_ppm"),
          expr("n_ab * 1000000 div n_a").as("conf_a_to_b_ppm"),
          expr("n_ab * 1000000 div n_b").as("conf_b_to_a_ppm"),
          expr("(n_ab * 1000000 div n_a) * n_users div n_b").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("a"), col("b"))
    },
    Some("""
      WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      singles AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type),
      totals AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
      pairs AS (
        SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS n_ab
        FROM ut x JOIN ut y ON x.user_id = y.user_id
          AND x.event_type < y.event_type
        GROUP BY 1, 2)
      SELECT a, b, n_ab, sa.n AS n_a, sb.n AS n_b,
             n_ab * 1000000 // n_users AS support_ppm,
             n_ab * 1000000 // sa.n AS conf_a_to_b_ppm,
             n_ab * 1000000 // sb.n AS conf_b_to_a_ppm,
             (n_ab * 1000000 // sa.n) * n_users // sb.n AS lift_ppm
      FROM pairs
      JOIN singles sa ON sa.event_type = pairs.a
      JOIN singles sb ON sb.event_type = pairs.b
      CROSS JOIN totals
      ORDER BY lift_ppm DESC, a, b
    """)
  )

  /** Bounce rate by day (r8) — the single-event-session share, the first
    * engagement KPI any web-analytics stack reports: sessions from the
    * 30-minute-gap rule (evt_peak_concurrency's kernel), a session is a
    * bounce when it holds exactly one event, rolled up by the session's
    * start day in exact integer ppm. One user_id shuffle to sessionize,
    * one day rollup.
    */
  val evtBounceRate = Op(
    "evt_bounce_rate",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = T.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val wu = Window.partitionBy(col("user_id")).orderBy(col("us"))
      ev.withColumn("new_s",
          when(col("us") - lag(col("us"), 1).over(wu) > 1800000000L ||
            lag(col("us"), 1).over(wu).isNull, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          Window.partitionBy(col("user_id")).orderBy(col("us"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("s_us"), count(lit(1)).as("n_events"))
        .groupBy(to_date(timestamp_micros(col("s_us"))).as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounce"))
        .withColumn("bounce_ppm", expr("n_bounce * 1000000 div n_sessions"))
        .orderBy(col("day"))
    },
    Some("""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      flags AS (
        SELECT user_id, us,
               CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                      > 1800000000
                    OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM ev),
      sid AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flags),
      sess AS (
        SELECT user_id, sid, MIN(us) AS s_us, COUNT(*) AS n_events
        FROM sid GROUP BY user_id, sid)
      SELECT CAST(make_timestamp(s_us) AS DATE) AS day,
             COUNT(*) AS n_sessions,
             CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
             CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               * 1000000 // COUNT(*) AS bounce_ppm
      FROM sess GROUP BY 1 ORDER BY day
    """)
  )

  /** Welch's unequal-variance t-test (r8; Welch 1947) — the MEANS
    * comparison completing the A/B toolkit (evt_ab_test_lift z-tests
    * proportions; revenue experiments compare continuous spend, where
    * pooling variances is the classic mistake Welch fixes): per-variant
    * moments from exact decimal sums of 1e-4-unit values (n, Σx, Σx²
    * shuffle-order-free), then t = (m̄₁−m̄₂)/√(s₁²/n₁+s₂²/n₂) and the
    * Welch–Satterthwaite df with IEEE division/sqrt as the only floating
    * steps, rounded once at the edge (the ml_feature_standardize
    * discipline). One scan, a 2-row aggregate, a 1-row result.
    */
  val evtWelchTtest = Op(
    "evt_welch_ttest",
    (s, d) => {
      val vals = T.events(s, d).filter(col("event_type") === "purchase")
        .select(
          when(pmod(col("user_id") * lit(2654435761L), lit(4294967296L)) <
            lit(2147483648L), "A").otherwise("B").as("variant"),
          expr("CAST(floor(value * 10000) AS BIGINT)").as("u"))
      val m = vals.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"),
          sum(col("u").cast("decimal(38,0)")).as("sx"),
          sum((col("u") * col("u")).cast("decimal(38,0)")).as("sxx"))
      m.agg(
          sum(when(col("variant") === "A", col("n")).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === "A", col("sx")).otherwise(lit(0))).as("sx_a"),
          sum(when(col("variant") === "A", col("sxx")).otherwise(lit(0))).as("sxx_a"),
          sum(when(col("variant") === "B", col("n")).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === "B", col("sx")).otherwise(lit(0))).as("sx_b"),
          sum(when(col("variant") === "B", col("sxx")).otherwise(lit(0))).as("sxx_b"))
        .withColumn("ma", expr("cast(sx_a as double) / n_a"))
        .withColumn("mb", expr("cast(sx_b as double) / n_b"))
        .withColumn("va", expr(
          "((cast(sxx_a as double) - cast(sx_a as double) * cast(sx_a as double) / n_a) / (n_a - 1)) / n_a"))
        .withColumn("vb", expr(
          "((cast(sxx_b as double) - cast(sx_b as double) * cast(sx_b as double) / n_b) / (n_b - 1)) / n_b"))
        // squares via multiplication, never pow() — pow is not correctly
        // rounded and the engines' libm results can differ in the last ulp
        .select(col("n_a"), col("n_b"),
          expr("round((ma - mb) / sqrt(va + vb), 6)").as("t_stat"),
          expr("round((va + vb) * (va + vb) / " +
            "(va * va / (n_a - 1) + vb * vb / (n_b - 1)), 2)").as("welch_df"))
    },
    Some("""
      WITH vals AS (
        SELECT CASE WHEN (user_id * 2654435761) % 4294967296 < 2147483648
                    THEN 'A' ELSE 'B' END AS variant,
               CAST(FLOOR(value * 10000) AS BIGINT) AS u
        FROM events WHERE event_type = 'purchase'),
      m AS (
        SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(u AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(u AS HUGEINT) * u) AS HUGEINT) AS sxx
        FROM vals GROUP BY variant),
      p AS (
        SELECT
          CAST(SUM(CASE WHEN variant = 'A' THEN n ELSE 0 END) AS BIGINT) AS n_a,
          CAST(SUM(CASE WHEN variant = 'A' THEN sx ELSE 0 END) AS HUGEINT) AS sx_a,
          CAST(SUM(CASE WHEN variant = 'A' THEN sxx ELSE 0 END) AS HUGEINT) AS sxx_a,
          CAST(SUM(CASE WHEN variant = 'B' THEN n ELSE 0 END) AS BIGINT) AS n_b,
          CAST(SUM(CASE WHEN variant = 'B' THEN sx ELSE 0 END) AS HUGEINT) AS sx_b,
          CAST(SUM(CASE WHEN variant = 'B' THEN sxx ELSE 0 END) AS HUGEINT) AS sxx_b
        FROM m),
      v AS (
        SELECT n_a, n_b,
               CAST(sx_a AS DOUBLE) / n_a AS ma,
               CAST(sx_b AS DOUBLE) / n_b AS mb,
               ((CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE) / n_a) / (n_a - 1)) / n_a AS va,
               ((CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE) / n_b) / (n_b - 1)) / n_b AS vb
        FROM p)
      SELECT n_a, n_b,
             ROUND((ma - mb) / SQRT(va + vb), 6) AS t_stat,
             ROUND((va + vb) * (va + vb) /
                   (va * va / (n_a - 1) + vb * vb / (n_b - 1)), 2) AS welch_df
      FROM v
    """)
  )

  /** A/B power analysis (r8) — the question asked BEFORE an experiment
    * ships: with the traffic we have, what's the minimum detectable
    * effect? MDE = (z_{α/2}+z_β)·√(2σ²/n) at α=.05, power=.80 (the
    * standard 1.96/0.8416 pair, fixed literals), with σ² from exact
    * decimal moments of per-user purchase units and n = the smaller arm
    * (conservative). Completes the experimentation tier: z-test (lift),
    * Welch (means), DiD/CEM (observational), Qini (targeting), and now
    * the sizing arithmetic that gates all of them. The only floating
    * steps are the final divisions and one sqrt (the standardize
    * discipline); emits MDE in 1e-4 units and as ppm of the pooled mean.
    */
  val evtAbPowerMde = Op(
    "evt_ab_power_mde",
    (s, d) => {
      val users = T.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(expr("CAST(floor(value * 10000) AS BIGINT)")).as("u"))
        .select(
          when(pmod(col("user_id") * lit(2654435761L), lit(4294967296L)) <
            lit(2147483648L), 1L).otherwise(0L).as("treat"), col("u"))
      users.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("treat") === 1L, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("treat") === 0L, 1L).otherwise(0L)).as("n_b"),
          sum(col("u").cast("decimal(38,0)")).as("sx"),
          sum((col("u") * col("u")).cast("decimal(38,0)")).as("sxx"))
        .withColumn("mean_u", expr("cast(sx as double) / n_users"))
        .withColumn("var_u", expr(
          "(cast(sxx as double) - cast(sx as double) * cast(sx as double) / n_users) / (n_users - 1)"))
        .withColumn("n_arm", least(col("n_a"), col("n_b")))
        .select(col("n_a"), col("n_b"),
          expr("round(mean_u, 2)").as("mean_units"),
          expr("round((1.96 + 0.8416) * sqrt(2.0 * var_u / n_arm), 2)").as("mde_units"),
          // floor-then-cast: a bare double→bigint cast truncates in Spark
          // but ROUNDS in DuckDB
          expr("cast(floor((1.96 + 0.8416) * sqrt(2.0 * var_u / n_arm) * 1000000 / mean_u) as bigint)")
            .as("mde_rel_ppm"))
    },
    Some("""
      WITH users AS (
        SELECT user_id,
               CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT) AS u,
               CASE WHEN (user_id * 2654435761) % 4294967296 < 2147483648
                    THEN 1 ELSE 0 END AS treat
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(treat) AS BIGINT) AS n_a,
               CAST(SUM(1 - treat) AS BIGINT) AS n_b,
               CAST(SUM(CAST(u AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(u AS HUGEINT) * u) AS HUGEINT) AS sxx
        FROM users),
      v AS (
        SELECT n_a, n_b,
               CAST(sx AS DOUBLE) / n_users AS mean_u,
               (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_users)
                 / (n_users - 1) AS var_u,
               LEAST(n_a, n_b) AS n_arm
        FROM m)
      SELECT n_a, n_b,
             ROUND(mean_u, 2) AS mean_units,
             ROUND((1.96 + 0.8416) * SQRT(2.0 * var_u / n_arm), 2) AS mde_units,
             CAST(FLOOR((1.96 + 0.8416) * SQRT(2.0 * var_u / n_arm) * 1000000 / mean_u) AS BIGINT)
               AS mde_rel_ppm
      FROM v
    """)
  )

  /** Sample-ratio-mismatch guardrail (r14) — the first check every A/B
    * platform runs before reading a lift number (Fabijan et al. 2019,
    * "Diagnosing Sample Ratio Mismatch"): are the realized variant counts
    * consistent with the designed split? Users are bucketed 4 ways by the
    * shared Knuth-multiplicative cohort hash (designed 25% each); the
    * Pearson χ² against the uniform expectation (df = 3, α = .05 critical
    * value 7.814728) is computed from EXACT integer counts, so the only
    * FP is the final division — same expression in both engines, rounded
    * to 6. Scale shape: one user-keyed aggregate (the event log's natural
    * partition key, map-side combined) then a 4-row global roll-up —
    * nothing downstream of the first agg is data-sized. The id-range
    * bound on the hash is documented at evt_ab_test_lift.
    */
  val evtSrmCheck = Op(
    "evt_srm_check",
    (s, d) => {
      val bucket = pmod(col("user_id") * lit(2654435761L), lit(4294967296L))
      val users = T.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"))
        .withColumn("variant", (bucket / lit(1073741824L)).cast("long"))
      val counts = users.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_v0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_v1"),
        sum(when(col("variant") === 2, 1L).otherwise(0L)).as("n_v2"),
        sum(when(col("variant") === 3, 1L).otherwise(0L)).as("n_v3"))
      val e = col("n_users") / lit(4.0)
      def term(c: org.apache.spark.sql.Column) = (c - e) * (c - e) / e
      counts
        .withColumn("chisq", round(
          term(col("n_v0")) + term(col("n_v1")) + term(col("n_v2")) + term(col("n_v3")), 6))
        .withColumn("srm_detected", col("chisq") > 7.814728)
    },
    Some("""
      WITH users AS (
        SELECT user_id, COUNT(*) AS n_ev,
               CAST((user_id * 2654435761) % 4294967296 // 1073741824 AS BIGINT) AS variant
        FROM events GROUP BY user_id),
      counts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_v0,
               CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
               CAST(SUM(CASE WHEN variant = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_v2,
               CAST(SUM(CASE WHEN variant = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_v3
        FROM users)
      SELECT n_users, n_v0, n_v1, n_v2, n_v3,
             ROUND((n_v0 - n_users / 4.0) * (n_v0 - n_users / 4.0) / (n_users / 4.0)
                 + (n_v1 - n_users / 4.0) * (n_v1 - n_users / 4.0) / (n_users / 4.0)
                 + (n_v2 - n_users / 4.0) * (n_v2 - n_users / 4.0) / (n_users / 4.0)
                 + (n_v3 - n_users / 4.0) * (n_v3 - n_users / 4.0) / (n_users / 4.0), 6) AS chisq,
             ROUND((n_v0 - n_users / 4.0) * (n_v0 - n_users / 4.0) / (n_users / 4.0)
                 + (n_v1 - n_users / 4.0) * (n_v1 - n_users / 4.0) / (n_users / 4.0)
                 + (n_v2 - n_users / 4.0) * (n_v2 - n_users / 4.0) / (n_users / 4.0)
                 + (n_v3 - n_users / 4.0) * (n_v3 - n_users / 4.0) / (n_users / 4.0), 6)
               > 7.814728 AS srm_detected
      FROM counts
    """)
  )

  /** CUPED variance reduction (r14; Deng, Xu, Kohavi & Walker 2013,
    * "Improving the Sensitivity of Online Controlled Experiments") — the
    * standard pre-experiment-covariate adjustment: Y_adj = Y − θ(X − X̄)
    * with θ = cov(X,Y)/var(X), where X is the user's PRE-period spend and
    * Y the experiment-period spend. Split at TIMESTAMP '2024-01-16', the
    * midpoint of the fixtures' 30-day horizon (generator contract,
    * TESTDATA.md; the dow-seasonality anchor documents the same idiom).
    * Determinism: X and Y are per-user EXACT integer spend units
    * (value → DECIMAL(18,4) → ×100 → BIGINT), every moment (Σx, Σy, Σxy,
    * Σx², Σy²) is an exact BIGINT sum (magnitudes ≤ ~1e16 « 2^63 at
    * sf100), and θ / variance-reduction / lifts are the SAME double
    * expression over those identical integers in both engines, rounded
    * to 6. Per-variant CUPED-adjusted means use the linearity shortcut
    * mean(Y_adj | v) = Ȳ_v − θ(X̄_v − X̄) — no second data pass. Scale
    * shape: ONE user-keyed aggregate (map-side combined) then a
    * constant-width global roll-up; the plan is two exchanges total
    * regardless of corpus size.
    */
  val evtCupedLift = Op(
    "evt_cuped_lift",
    (s, d) => {
      val bucket = pmod(col("user_id") * lit(2654435761L), lit(4294967296L))
      val cut = lit("2024-01-16").cast("timestamp")
      val users = T.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          (sum(when(col("ts") < cut, Det.dec(col("value"))).otherwise(Det.dec(lit(0.0)))) * 100)
            .cast("long").as("x"),
          (sum(when(col("ts") >= cut, Det.dec(col("value"))).otherwise(Det.dec(lit(0.0)))) * 100)
            .cast("long").as("y"))
        .withColumn("t", when(bucket < lit(2147483648L), 0L).otherwise(1L))
      val m = users.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(when(col("t") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("t") === 1, col("x")).otherwise(0L)).as("sx_t"),
        sum(when(col("t") === 1, col("y")).otherwise(0L)).as("sy_t"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("t") === 0, col("x")).otherwise(0L)).as("sx_c"),
        sum(when(col("t") === 0, col("y")).otherwise(0L)).as("sy_c"),
        sum(col("y") * col("y")).as("syy"))
      val n = col("n").cast("double")
      val mx = col("sx") / n; val my = col("sy") / n
      val varX = col("sxx") / n - mx * mx
      val covXY = col("sxy") / n - mx * my
      val varY = col("syy") / n - my * my
      val theta = covXY / varX
      val myT = col("sy_t") / col("n_t"); val myC = col("sy_c") / col("n_c")
      val mxT = col("sx_t") / col("n_t"); val mxC = col("sx_c") / col("n_c")
      val adjT = myT - theta * (mxT - mx)
      val adjC = myC - theta * (mxC - mx)
      m.select(
        col("n"), col("n_t"), col("n_c"),
        round(theta, 6).as("theta"),
        round(lit(1.0) - (varY - covXY * covXY / varX) / varY, 6).as("var_reduction"),
        round(myT / myC - 1.0, 6).as("lift_raw"),
        round(adjT / adjC - 1.0, 6).as("lift_cuped"))
    },
    Some("""
      WITH users AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                 THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0.0 AS DECIMAL(18,4)) END) * 100 AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                 THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0.0 AS DECIMAL(18,4)) END) * 100 AS BIGINT) AS y,
               CASE WHEN (user_id * 2654435761) % 4294967296 < 2147483648
                    THEN 0 ELSE 1 END AS t
        FROM events GROUP BY user_id),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               CAST(SUM(CASE WHEN t = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
               CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_t,
               CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
               CAST(SUM(CASE WHEN t = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_c,
               CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_c,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM users)
      SELECT n, n_t, n_c,
             ROUND(((sxy / CAST(n AS DOUBLE)) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                 / ((sxx / CAST(n AS DOUBLE)) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))), 6) AS theta,
             ROUND(1.0 - (((syy / CAST(n AS DOUBLE)) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                 - ((sxy / CAST(n AS DOUBLE)) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   * ((sxy / CAST(n AS DOUBLE)) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   / ((sxx / CAST(n AS DOUBLE)) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))
                 / ((syy / CAST(n AS DOUBLE)) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))), 6) AS var_reduction,
             ROUND((sy_t / CAST(n_t AS DOUBLE)) / (sy_c / CAST(n_c AS DOUBLE)) - 1.0, 6) AS lift_raw,
             ROUND(((sy_t / CAST(n_t AS DOUBLE))
                 - (((sxy / CAST(n AS DOUBLE)) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   / ((sxx / CAST(n AS DOUBLE)) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))
                   * ((sx_t / CAST(n_t AS DOUBLE)) - (sx / CAST(n AS DOUBLE))))
                 / ((sy_c / CAST(n_c AS DOUBLE))
                 - (((sxy / CAST(n AS DOUBLE)) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   / ((sxx / CAST(n AS DOUBLE)) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))
                   * ((sx_c / CAST(n_c AS DOUBLE)) - (sx / CAST(n AS DOUBLE)))) - 1.0, 6) AS lift_cuped
      FROM m
    """)
  )

  /** Classical seasonal decomposition by moving average (r14; the
    * decompose() of Kendall & Stuart / Hyndman FPP ch. 6, additive form) —
    * trend = centered 7-day moving average of daily revenue, seasonal =
    * per-day-of-week mean of the detrended series over FULL windows only.
    * The missing leg beside evt_dow_seasonality (raw dow medians) and
    * evt_forecast_backtest (naive forecasts): this one removes trend
    * before reading seasonality, the textbook order. Determinism: daily
    * revenue in exact cents; the MA is kept as its 7-day SUM (no division),
    * detrended(d) = 7·rev(d) − trendsum(d) exactly; the per-dow index is
    * ONE integer division at the edge (sum(detrended) div (7·n), the ppm
    * idiom); dow via the datediff-mod-7 anchor (2024-01-01, a Monday —
    * evt_dow_seasonality's documented idiom). Scale shape: the corpus
    * reduces to a horizon-sized daily series in one map-side-combined
    * agg; every window after runs on ≤|days| rows. The full-window rule
    * (cnt=7) drops the 3 edge days each side, as decompose() does.
    */
  val evtSeasonalMaDecompose = Op(
    "evt_seasonal_ma_decompose",
    (s, d) => {
      val daily = T.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg((sum(Det.dec(col("value"))) * 100).cast("long").as("rev"))
      val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
      daily
        .withColumn("trend7", sum(col("rev")).over(w))
        .withColumn("cnt7", count(lit(1)).over(w))
        .filter(col("cnt7") === 7)
        .withColumn("detr7", col("rev") * 7 - col("trend7"))
        .withColumn("dow", expr("datediff(day, DATE '2024-01-01') % 7").cast("long"))
        .groupBy(col("dow"))
        .agg(
          count(lit(1)).as("n_days"),
          sum(col("detr7")).as("detr7_sum"))
        .withColumn("seasonal_cents", expr("detr7_sum div (7 * n_days)"))
        .orderBy(col("dow"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 100 AS BIGINT) AS rev
        FROM events GROUP BY day),
      ma AS (
        SELECT day, rev,
               SUM(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend7,
               COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
        FROM daily),
      detr AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01', day) % 7 AS BIGINT) AS dow,
               rev * 7 - trend7 AS detr7
        FROM ma WHERE cnt7 = 7)
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(detr7) AS BIGINT) AS detr7_sum,
             CAST(SUM(detr7) AS BIGINT) // (7 * CAST(COUNT(*) AS BIGINT)) AS seasonal_cents
      FROM detr GROUP BY dow ORDER BY dow
    """)
  )

  /** Group-sequential A/B monitoring with O'Brien–Fleming boundaries (r14;
    * O'Brien & Fleming 1979; Pocock 1977 for the contrast) — the interim-
    * analysis discipline that lets an experiment be peeked at K=5 looks
    * (every 6 days of the 30-day horizon) without inflating false
    * positives: the two-proportion z at look k is compared to the OBF
    * boundary c·√(K/k) (c = 2.04, the classical K=5 / α=.05 two-sided
    * table value) — strict early, nominal-ish late. Determinism: per-look
    * cohorts and conversions are EXACT integer counts (the evt_ab_test_lift
    * converted definition, re-evaluated as-of each cutoff), z and the
    * boundary are the same double expressions in both engines, rounded to
    * 6. Scale shape: one events scan exploded ×≤5 looks (map-side combined
    * into user×look), one user-keyed agg, then a 5-row rollup — the
    * monitoring table is look-count-sized no matter the log volume.
    */
  val evtGroupSequentialObf = Op(
    "evt_group_sequential_obf",
    (s, d) => {
      val bucket = pmod(col("user_id") * lit(2654435761L), lit(4294967296L))
      val userLook = T.events(s, d)
        .withColumn("k", explode(expr("sequence(1, 5)")))
        .filter(col("ts") < expr("timestamp(date_add(DATE '2024-01-01', k * 6))"))
        .groupBy(col("user_id"), col("k"))
        .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
              sum(when(col("event_type") === "signup", 1L).otherwise(0L)))
          .cast("long").as("converted"))
        .withColumn("variant", when(bucket < lit(2147483648L), "A").otherwise("B"))
      val looks = userLook.groupBy(col("k"))
        .agg(
          sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === "A", col("converted")).otherwise(0L)).as("conv_a"),
          sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === "B", col("converted")).otherwise(0L)).as("conv_b"))
      val p = (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b"))
      val z = ((col("conv_a") / col("n_a")) - (col("conv_b") / col("n_b"))) /
        nullif(sqrt(p * (lit(1.0) - p) * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))),
          lit(0.0))
      looks
        .withColumn("z", round(z, 6))
        .withColumn("boundary", round(lit(2.04) * sqrt(lit(5.0) / col("k")), 6))
        .withColumn("crossed", abs(round(z, 6)) > round(lit(2.04) * sqrt(lit(5.0) / col("k")), 6))
        .select(col("k").cast("long").as("k"), col("n_a"), col("conv_a"),
          col("n_b"), col("conv_b"), col("z"), col("boundary"), col("crossed"))
        .orderBy(col("k"))
    },
    Some("""
      WITH userlook AS (
        SELECT user_id, k,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >
                         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS converted,
               CASE WHEN (MIN(user_id) * 2654435761) % 4294967296 < 2147483648
                    THEN 'A' ELSE 'B' END AS variant
        FROM events CROSS JOIN (SELECT unnest(range(1, 6)) AS k)
        WHERE ts < CAST(DATE '2024-01-01' + CAST(6 * k AS INTEGER) AS TIMESTAMP)
        GROUP BY user_id, k),
      looks AS (
        SELECT k,
               CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        FROM userlook GROUP BY k)
      SELECT CAST(k AS BIGINT) AS k, n_a, conv_a, n_b, conv_b,
             ROUND(((conv_a / n_a) - (conv_b / n_b)) /
                   NULLIF(sqrt(((conv_a + conv_b) / (n_a + n_b)) *
                        (1.0 - (conv_a + conv_b) / (n_a + n_b)) *
                        (1.0 / n_a + 1.0 / n_b)), 0.0), 6) AS z,
             ROUND(2.04 * sqrt(5.0 / k), 6) AS boundary,
             ABS(ROUND(((conv_a / n_a) - (conv_b / n_b)) /
                   NULLIF(sqrt(((conv_a + conv_b) / (n_a + n_b)) *
                        (1.0 - (conv_a + conv_b) / (n_a + n_b)) *
                        (1.0 / n_a + 1.0 / n_b)), 0.0), 6))
               > ROUND(2.04 * sqrt(5.0 / k), 6) AS crossed
      FROM looks ORDER BY k
    """)
  )

  val ops: Vector[Op] = Vector(
    evtSrmCheck, evtCupedLift, evtSeasonalMaDecompose, evtGroupSequentialObf,
    evtGiniConcentration, evtDiffInDiff, evtStickinessRatio,
    evtSurvivalKm, evtPeakConcurrency, evtAssocRules, evtBounceRate,
    evtWelchTtest, evtAbPowerMde,
    evtForecastBacktest, evtFunnelWindowed, evtOverlapMatrix, evtErrorRateSlo,
    evtDecayEngagement,
    evtFunnelConversion, evtRetentionCohorts, evtPathTransitions, dsTypedPaths,
    evtSessionsSecondarySort, evtHourlyAnomaly, evtRfmSegments, evtAbTestLift,
    evtAttributionU, evtActiveUsersRolling, evtTimeToConvert, evtCohortLtv,
    evtSequencePattern, evtLifecycleStates, evtBotGapStats, evtDowSeasonality,
    evtTopPaths, evtTransitionEntropy)
}
