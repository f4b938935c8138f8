"""Events: batch analytics + structured-streaming entries (part 1).

Entry builders moved VERBATIM from the round-6 ``workloads/events.py``
(round-7 split, VERDICT r6 task 7); build order inside this module is
unchanged.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import sampling as SM
from ..operators import text as TX
from ..streaming import events as EV
from ..workload_shared import SUM_D, _docs



def register(add) -> None:
    # ================= extensions: events / streaming =====================

    from ..session import events_schema as _events_schema
    from ..session import load_events as _events

    add("events_hourly_rollup",
        lambda spark, sf: EV.hourly_rollup(_events(spark, sf)),
        f"""SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n_events,
               {SUM_D('value')} AS sum_value
        FROM events
        GROUP BY 1, 2""")

    add("events_ohlc_hourly",
        lambda spark, sf: EV.ohlc_hourly(_events(spark, sf)),
        """WITH r AS (
          SELECT date_trunc('hour', ts) AS hour, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts),
                   event_type ORDER BY ts, event_id) AS rn_a,
                 ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts),
                   event_type ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events)
        SELECT hour, event_type,
               ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
               ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
               ROUND(MIN(value), 4) AS low,
               ROUND(MAX(value), 4) AS high,
               COUNT(*) AS n_events
        FROM r GROUP BY 1, 2""")

    # daily event-type mix drift: TV distance vs the whole-period distribution
    def type_drift(spark, sf):
        from ..operators.diff import categorical_tv_distance
        ev = _events(spark, sf).select(
            F.col("ts").cast("date").alias("day"), "event_type")
        return categorical_tv_distance(ev, "day", "event_type")

    add("events_type_drift_daily", type_drift,
        """WITH per AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(COUNT(*) AS HUGEINT) AS c
          FROM events GROUP BY 1, 2),
        cat AS (SELECT event_type, SUM(c) AS ct FROM per GROUP BY 1),
        grp AS (SELECT day, SUM(c) AS ts FROM per GROUP BY 1),
        tot AS (SELECT SUM(ct) AS t FROM cat),
        j AS (SELECT p.day, p.c, ca.ct, g.ts, tot.t
              FROM per p JOIN cat ca USING (event_type)
              JOIN grp g USING (day), tot),
        agg AS (SELECT day, SUM(abs(c*t - ct*ts)) AS abs_part,
                       SUM(ct) AS cov, any_value(ts) AS ts,
                       any_value(t) AS t
                FROM j GROUP BY day)
        SELECT day, CAST(ts AS BIGINT) AS n_rows,
               CAST((500 * (abs_part + ts*(t - cov))) // (ts * t)
                    AS BIGINT) AS tv_milli
        FROM agg""")

    # gap-filled time series: complete hour spine per type so rolling
    # windows downstream never silently shrink over absent hours
    add("events_hourly_gapfilled",
        lambda spark, sf: EV.hourly_rollup_gapfilled(_events(spark, sf)),
        f"""WITH r AS (
          SELECT date_trunc('hour', ts) AS hour, event_type,
                 COUNT(*) AS n_events, {SUM_D('value')} AS sum_value
          FROM events GROUP BY 1, 2),
        b AS (SELECT event_type, MIN(hour) AS lo, MAX(hour) AS hi
              FROM r GROUP BY 1),
        spine AS (SELECT event_type,
                         unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                           AS hour
                  FROM b)
        SELECT s.event_type, s.hour,
               CAST(COALESCE(r.n_events, 0) AS BIGINT) AS n_events,
               COALESCE(r.sum_value, 0.0) AS sum_value
        FROM spine s LEFT JOIN r USING (event_type, hour)""")

    # ops diagnostics: silence gaps per type, key-skew report
    add("events_silence_report",
        lambda spark, sf: EV.silence_report(_events(spark, sf),
                                            min_gap_hours=2),
        """WITH h AS (
          SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour
          FROM events),
        g AS (
          SELECT event_type,
                 lag(hour) OVER (PARTITION BY event_type
                                 ORDER BY hour) AS silent_from,
                 hour AS resumed_at,
                 CAST(date_diff('hour', lag(hour) OVER (
                        PARTITION BY event_type ORDER BY hour), hour)
                      AS INTEGER) AS gap_hours
          FROM h)
        SELECT event_type, silent_from, resumed_at, gap_hours
        FROM g WHERE gap_hours > 2""")

    add("events_key_skew_report",
        lambda spark, sf: EV.key_skew_report(_events(spark, sf),
                                             "event_type", top_n=5),
        """WITH pk AS (SELECT event_type AS key, COUNT(*) AS n
                       FROM events GROUP BY 1),
        t AS (SELECT COUNT(*) AS n_total FROM events)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key)
                    AS INTEGER) AS rank,
               key, CAST(n AS BIGINT) AS n,
               CAST(t.n_total AS BIGINT) AS n_total,
               CAST((n * 1000) // t.n_total AS BIGINT) AS share_milli
        FROM pk, t
        ORDER BY n DESC, key LIMIT 5""")

    # query-time file skipping over the clustered rewrite: the entry
    # rewrites events range-clustered on (event_type, ts), ASSERTS the
    # predicate reaches the scan AND that footer min/max stats exclude
    # a majority of row groups (rowgroup_skip_stats — the same stats
    # the reader prunes with), then returns the rollup for the oracle.
    # This is the lake analog of the reference's btree indexes on its
    # members snapshot (001_initial_schema.sql:81-88).
    def _clustered_scan(spark, sf):
        from ..sources.maintenance import clustered_scan_demo
        return clustered_scan_demo(spark, sf, event_type="click")

    add("events_clustered_scan_pruning", _clustered_scan,
        f"""SELECT date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_events, {SUM_D('value')} AS sum_value
        FROM events WHERE event_type = 'click'
        GROUP BY 1""")

    # first-order Markov transitions of event types (milli-probability
    # integers; output bounded by type-vocabulary squared)
    add("events_type_transitions",
        lambda spark, sf: EV.type_transition_matrix(_events(spark, sf)),
        """WITH steps AS (
          SELECT event_type AS type_from,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS type_to
          FROM events),
        c AS (SELECT type_from, type_to, COUNT(*) AS n
              FROM steps WHERE type_to IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT type_from, SUM(n) AS n_from FROM c GROUP BY 1)
        SELECT c.type_from, c.type_to, CAST(c.n AS BIGINT) AS n,
               CAST(t.n_from AS BIGINT) AS n_from,
               CAST((c.n * 1000) // t.n_from AS BIGINT) AS p_milli
        FROM c JOIN t USING (type_from)""")

    # RFM segmentation (dimension-sized windows only; total-order ntile
    # with user_id tiebreak for cross-engine bit-equality)
    add("events_rfm_segments",
        lambda spark, sf: EV.rfm_segments(_events(spark, sf)),
        f"""WITH pu AS (
          SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
                 {SUM_D('value')} AS monetary
          FROM events GROUP BY user_id),
        ref AS (SELECT MAX(ts) AS ref_ts FROM events),
        sc AS (
          SELECT user_id,
                 CAST(date_diff('day', CAST(last_ts AS DATE),
                                CAST(ref_ts AS DATE)) AS INTEGER)
                   AS recency_days,
                 frequency, monetary
          FROM pu, ref)
        SELECT user_id, recency_days,
               CAST(frequency AS BIGINT) AS frequency,
               ROUND(monetary, 4) AS monetary,
               CAST(ntile(5) OVER (ORDER BY recency_days, user_id)
                    AS INTEGER) AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
                    AS INTEGER) AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id)
                    AS INTEGER) AS m_score,
               concat_ws('-',
                 ntile(5) OVER (ORDER BY recency_days, user_id),
                 ntile(5) OVER (ORDER BY frequency DESC, user_id),
                 ntile(5) OVER (ORDER BY monetary DESC, user_id))
                 AS segment
        FROM sc""")

    # unordered event-type pair lift over the user population (exact
    # integer milli-units)
    add("events_type_cooccurrence_lift",
        lambda spark, sf: EV.type_cooccurrence_lift(_events(spark, sf)),
        """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
        pt AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both,
               CAST(MIN(pa.n) AS BIGINT) AS n_a,
               CAST(MIN(pb.n) AS BIGINT) AS n_b,
               CAST((COUNT(*) * MIN(n.n_users) * 1000)
                    // (MIN(pa.n) * MIN(pb.n)) AS BIGINT) AS lift_milli
        FROM ut a
        JOIN ut b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
        JOIN pt pa ON pa.event_type = a.event_type
        JOIN pt pb ON pb.event_type = b.event_type, n
        GROUP BY 1, 2""")

    # SCD-2-shaped per-user state history (run-length collapse of the
    # event stream into validity ranges)
    add("events_user_state_history",
        lambda spark, sf: EV.user_state_history(_events(spark, sf)),
        """WITH o AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN lag(event_type) OVER w IS NULL
                           OR lag(event_type) OVER w <> event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        r AS (
          SELECT *, SUM(chg) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS run_id
          FROM o)
        SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
               MIN(event_type) AS state,
               MIN(ts) AS valid_from, MAX(ts) AS valid_to,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM r GROUP BY user_id, run_id""")

    def stream_hourly(spark, sf):
        return EV.replay_hourly_rollup(spark, sf, _events_schema(spark, sf))

    # Structured Streaming end-to-end (readStream → watermark → window →
    # availableNow replay): bounded replay of the events table equals the
    # batch rollup, so the SAME SQL oracle applies to the streaming path.
    add("events_stream_hourly", stream_hourly,
        f"""SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n_events,
               {SUM_D('value')} AS sum_value
        FROM events
        GROUP BY 1, 2""")

    # streaming OHLC replay equals the batch bars -> same oracle as
    # events_ohlc_hourly
    add("events_stream_ohlc", lambda spark, sf: EV.replay_ohlc_hourly(
            spark, sf, _events_schema(spark, sf)),
        """WITH r AS (
          SELECT date_trunc('hour', ts) AS hour, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts),
                   event_type ORDER BY ts, event_id) AS rn_a,
                 ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts),
                   event_type ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events)
        SELECT hour, event_type,
               ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
               ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
               ROUND(MIN(value), 4) AS low,
               ROUND(MAX(value), 4) AS high,
               COUNT(*) AS n_events
        FROM r GROUP BY 1, 2""")

    add("events_sessionize",
        lambda spark, sf: EV.sessionize(_events(spark, sf)),
        """WITH secs AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec
          FROM events),
        flagged AS (
          SELECT user_id,
                 CASE WHEN sec - lag(sec) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)
                      IS NULL THEN 1
                      WHEN sec - lag(sec) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM secs)
        SELECT user_id,
               CAST(SUM(new_session) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM flagged
        GROUP BY user_id""")

    def stream_sessions(spark, sf):
        sess = EV.replay_sessionize(spark, sf, _events_schema(spark, sf),
                                    second_resolution=True)
        return (sess.groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n_sessions")))

    # stateful streaming sessionization (session_window merging state);
    # merging is boundary-INCLUSIVE, so the 30-min gap over second-truncated
    # timestamps equals the batch strict-> convention -> oracle-checkable
    add("events_stream_sessionize", stream_sessions,
        """WITH secs AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec
          FROM events),
        flagged AS (
          SELECT user_id,
                 CASE WHEN sec - lag(sec) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)
                      IS NULL THEN 1
                      WHEN sec - lag(sec) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM secs)
        SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
        FROM flagged
        GROUP BY user_id""")

    def stream_user_totals(spark, sf):
        from ..streaming.stateful import replay_user_totals
        return replay_user_totals(spark, sf, _events_schema(spark, sf))

    # custom stateful operator (applyInPandasWithState): per-user running
    # totals in explicit GroupState; integer-milli accumulation makes the
    # bounded replay exactly equal a batch SQL aggregate
    add("events_stream_user_totals", stream_user_totals,
        """SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 1000) AS BIGINT))
                    AS BIGINT) AS sum_value_milli
        FROM events
        GROUP BY user_id""")

    # trailing-window burst detector in exact integer arithmetic
    # (cross-multiplied z-score — no float stddev/sqrt to diverge on)
    add("events_hourly_anomalies",
        lambda spark, sf: EV.hourly_anomalies(_events(spark, sf),
                                              window_hours=24,
                                              threshold_sq=9),
        """WITH h AS (
          SELECT date_trunc('hour', ts) AS hour, event_type,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2),
        win AS (
          SELECT event_type, hour, n_events,
                 SUM(n_events) OVER w AS win_sum,
                 SUM(n_events * n_events) OVER w AS win_sq,
                 COUNT(*) OVER w AS win_n
          FROM h
          WINDOW w AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        SELECT event_type, hour, n_events,
               CAST(win_sum AS BIGINT) AS win_sum,
               CAST(win_n AS INTEGER) AS win_n
        FROM win
        WHERE win_n >= 24
          AND (win_n * n_events - win_sum) * (win_n * n_events - win_sum)
              > 9 * (win_n * win_sq - win_sum * win_sum)
          AND win_n * n_events > win_sum""")

    # percentiles on the milli-quantized integer domain: both engines run
    # the same linear interpolation over the same exact bigints
    add("events_value_percentiles",
        lambda spark, sf: _events(spark, sf)
        .withColumn("milli", F.floor(F.col("value") * 1000).cast("bigint"))
        .groupBy("event_type")
        .agg(F.percentile("milli", 0.5).alias("p50_milli"),
             F.percentile("milli", 0.9).alias("p90_milli"),
             F.min("milli").alias("min_milli"),
             F.max("milli").alias("max_milli")),
        """SELECT event_type,
               quantile_cont(milli, 0.5) AS p50_milli,
               quantile_cont(milli, 0.9) AS p90_milli,
               MIN(milli) AS min_milli,
               MAX(milli) AS max_milli
        FROM (SELECT event_type,
                     CAST(FLOOR(value * 1000) AS BIGINT) AS milli
              FROM events)
        GROUP BY event_type""")

    # join-free funnel: running last-click timestamp carried by a window,
    # conversion is a row-local comparison (k+m rows per user, never k*m)
    add("events_funnel_conversion",
        lambda spark, sf: EV.funnel_conversion(_events(spark, sf),
                                               "click", "purchase", 60),
        """WITH flagged AS (
          SELECT user_id, ts, event_type,
                 last_value(CASE WHEN event_type = 'click' THEN ts END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_click
          FROM events)
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_first,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_then,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                         AND last_click IS NOT NULL
                         AND epoch(ts) - epoch(last_click) <= 3600
                         AND ts >= last_click THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_converted,
               MIN(CASE WHEN event_type = 'purchase'
                         AND last_click IS NOT NULL
                         AND epoch(ts) - epoch(last_click) <= 3600
                         AND ts >= last_click THEN ts END)
                   AS first_conversion_ts
        FROM flagged
        GROUP BY user_id
        HAVING SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0""")

    # weekly retention triangle over the (user, week) distinct grain
    add("events_retention_cohorts",
        lambda spark, sf: EV.retention_cohorts(_events(spark, sf)),
        """WITH uw AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
          FROM events),
        first AS (
          SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1)
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week, week) / 7 AS INTEGER)
                   AS weeks_later,
               COUNT(DISTINCT uw.user_id) AS n_users
        FROM uw JOIN first ON uw.user_id = first.user_id
        GROUP BY 1, 2""")

    def stream_anomalies(spark, sf):
        rolled = EV.replay_hourly_rollup(spark, sf,
                                         _events_schema(spark, sf))
        return EV.anomalies_from_rollup(
            rolled.select("hour", "event_type", "n_events"),
            threshold_sq=9)

    # the same detector over the REPLAYED streaming rollup — stream and
    # batch rollups are provably equal, so one oracle covers both
    add("events_stream_anomalies", stream_anomalies,
        """WITH h AS (
          SELECT date_trunc('hour', ts) AS hour, event_type,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2),
        win AS (
          SELECT event_type, hour, n_events,
                 SUM(n_events) OVER w AS win_sum,
                 SUM(n_events * n_events) OVER w AS win_sq,
                 COUNT(*) OVER w AS win_n
          FROM h
          WINDOW w AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        SELECT event_type, hour, n_events,
               CAST(win_sum AS BIGINT) AS win_sum,
               CAST(win_n AS INTEGER) AS win_n
        FROM win
        WHERE win_n >= 24
          AND (win_n * n_events - win_sum) * (win_n * n_events - win_sum)
              > 9 * (win_n * win_sq - win_sum * win_sum)
          AND win_n * n_events > win_sum""")

    def stream_dedup(spark, sf):
        return EV.replay_dedup_counts(spark, sf, _events_schema(spark, sf))

    # streaming exactly-once ingestion: the self-unioned (redelivered)
    # stream deduped on event_id must count exactly the batch distinct
    add("events_stream_dedup", stream_dedup,
        """SELECT event_type, COUNT(DISTINCT event_id) AS n_events
        FROM events
        GROUP BY event_type""")

    # streaming ingestion-quality drift monitor: watermarked daily
    # type-mix rollup streamed (one legal streaming agg), then batch TV
    # scoring vs a STATIC baseline period (first 10 days) with an alert
    # flag — exact cross-multiplied integers, no floats anywhere
    def stream_type_drift(spark, sf):
        ev = _events(spark, sf)
        baseline = (ev.filter(F.col("ts").cast("date")
                              < F.lit("2024-01-11").cast("date"))
                    .groupBy("event_type")
                    .agg(F.count(F.lit(1)).alias("n")))
        out = EV.replay_type_drift(spark, sf,
                                   _events_schema(spark, sf), baseline,
                                   alert_milli=25)
        return out.select("day", "n_events", "tv_milli",
                          F.col("alert").cast("int").alias("alert"))

    add("events_stream_type_drift", stream_type_drift,
        """WITH c AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        b AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS b
          FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-11'
          GROUP BY 1),
        bt AS (SELECT CAST(SUM(b) AS BIGINT) AS b_total FROM b),
        days AS (SELECT day, CAST(SUM(c) AS BIGINT) AS c_total
                 FROM c GROUP BY 1),
        types AS (SELECT DISTINCT event_type FROM c
                  UNION SELECT event_type FROM b),
        grid AS (SELECT * FROM days CROSS JOIN types CROSS JOIN bt),
        j AS (
          SELECT g.day, g.c_total, g.b_total,
                 COALESCE(c.c, 0) AS c, COALESCE(b.b, 0) AS b
          FROM grid g
          LEFT JOIN c ON c.day = g.day AND c.event_type = g.event_type
          LEFT JOIN b ON b.event_type = g.event_type)
        SELECT day, CAST(any_value(c_total) AS BIGINT) AS n_events,
               CAST((500 * CAST(SUM(abs(c * b_total - b * c_total))
                                AS HUGEINT))
                    // (any_value(c_total) * any_value(b_total))
                    AS BIGINT) AS tv_milli,
               CAST(CASE WHEN (500 * CAST(SUM(abs(c * b_total
                                 - b * c_total)) AS HUGEINT))
                    // (any_value(c_total) * any_value(b_total)) >= 25
                    THEN 1 ELSE 0 END AS INTEGER) AS alert
        FROM j GROUP BY day""")

    # exactly-once streaming MERGE: availableNow stream upserted into a
    # versioned table (one CoW version per epoch, batchId idempotence),
    # then the converged per-user latest state read back — the oracle
    # is the plain arg-max SQL, so the driver certifies the whole
    # stream→merge→commit→read chain.  Scratch keyed by source size;
    # re-runs with an existing checkpoint see no new data and no-op.
    def stream_upsert_latest(spark, sf):
        import os

        from ..sources import versioned as V
        sig = str(os.path.getsize(f"{sf}/events.parquet"))
        root = os.path.join("/tmp", "olap_xtrctr_upsert_demo",
                            os.path.basename(os.path.normpath(sf)))
        marker = os.path.join(root, "_DEMO_SRC")
        if not (os.path.exists(marker)
                and open(marker).read().strip() == sig):
            import shutil
            shutil.rmtree(root, ignore_errors=True)
            os.makedirs(root, exist_ok=True)
            with open(marker, "w") as fh:
                fh.write(sig)
        sdf = (EV.event_stream(spark, sf, _events_schema(spark, sf),
                               glob="events.parquet")
               .withColumn("_ord", F.struct("ts", "event_id")))
        q = V.stream_upsert_versioned(
            sdf, os.path.join(root, "tbl"), ["user_id"], "_ord",
            os.path.join(root, "ckpt"))
        q.awaitTermination()
        return (V.read_version(spark, os.path.join(root, "tbl"))
                .select("user_id", "event_id", "event_type",
                        F.round("value", 4).alias("value")))

    add("events_stream_upsert_latest", stream_upsert_latest,
        """WITH r AS (
          SELECT user_id, event_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, event_id, event_type,
               ROUND(value, 4) AS value
        FROM r WHERE rn = 1""")

    def stream_dedup_bounded(spark, sf):
        return EV.replay_dedup_counts_bounded(spark, sf,
                                              _events_schema(spark, sf))

    # bounded-state exactly-once dedup (dropDuplicatesWithinWatermark):
    # keys evict once the watermark passes their event time + delay, so
    # state is O(watermark window), not O(stream) — the form that
    # survives an unbounded deployment; instant self-union redelivery
    # is inside any delay, so the replay equals the batch distinct
    add("events_stream_dedup_bounded", stream_dedup_bounded,
        """SELECT event_type, COUNT(DISTINCT event_id) AS n_events
        FROM events
        GROUP BY event_type""")

    def skew_distinct(spark, sf):
        from ..operators.skew import count_distinct_skew_safe
        return count_distinct_skew_safe(_events(spark, sf), ["event_type"],
                                        "user_id", out_name="n_users")

    # skew-safe exact COUNT(DISTINCT): dedup-then-count so a hot key's
    # distinct set never lands on a single reducer
    add("events_type_user_distinct", skew_distinct,
        """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type""")

    add("events_top_hours_per_type",
        lambda spark, sf: EV.top_hours_per_type(_events(spark, sf), k=3),
        """WITH h AS (
          SELECT date_trunc('hour', ts) AS hour, event_type,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2)
        SELECT event_type,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY n_events DESC, hour) AS INTEGER) AS rank,
               hour, n_events
        FROM h
        QUALIFY rank <= 3""")

    add("events_user_activity",
        lambda spark, sf: EV.user_activity(_events(spark, sf)),
        f"""SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS n_events,
               COUNT(DISTINCT event_type) AS n_types,
               {SUM_D('value')} AS sum_value
        FROM events
        GROUP BY 1, 2""")

    # stream-stream interval join: purchases ⋈ preceding-hour clicks per
    # user, both sides watermarked, event time bounded in both
    # directions (state = O(window·rate)); bounded append-mode replay
    # equals the batch interval join, so a plain SQL join is the oracle.
    def stream_ssjoin(spark, sf):
        return EV.replay_interval_join(spark, sf, _events_schema(spark, sf))

    add("events_stream_click_purchase_join", stream_ssjoin,
        """SELECT p.event_id, p.user_id,
               CAST(p.ts AS TIMESTAMP) AS purchase_ts,
               p.value AS purchase_value,
               CAST(c.ts AS TIMESTAMP) AS click_ts,
               c.value AS click_value
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""")

    # stream-stream LEFT OUTER interval join, null-filtered: clicks with
    # no purchase in the following hour.  Unlike the inner join, the
    # null-padded rows are released only on state EVICTION, so clicks
    # whose match window hasn't fallen behind the final watermark
    # (min of both sides' max event time - delay) stay in state and are
    # never emitted in a bounded replay — the oracle encodes exactly
    # that clause (verified set-equal at sf0.001 and sf0.01).
    def stream_unconverted(spark, sf):
        return EV.replay_unconverted_clicks(spark, sf,
                                            _events_schema(spark, sf))

    add("events_stream_unconverted_clicks", stream_unconverted,
        """WITH w AS (SELECT LEAST(
              (SELECT MAX(ts) FROM events WHERE event_type='click'),
              (SELECT MAX(ts) FROM events WHERE event_type='purchase')
            ) - INTERVAL 2 HOUR AS wm)
        SELECT c.event_id AS click_id, c.user_id,
               CAST(c.ts AS TIMESTAMP) AS click_ts,
               c.value AS click_value
        FROM events c, w
        WHERE c.event_type = 'click'
          AND c.ts + INTERVAL 1 HOUR < w.wm
          AND NOT EXISTS (
            SELECT 1 FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)""")

    # HLL distinct users per event type, built by MERGING per-hour
    # partial sketches (the persisted-state rollup path, not a direct
    # pass) — rows-only: DataSketches estimates are deterministic for
    # Spark but no SQL oracle reproduces them; tests/test_operators.py
    # pins the estimate within 2% of exact.
    def hll_users(spark, sf):
        from ..operators import sketches as SK
        ev = _events(spark, sf).withColumn(
            "hour", F.date_trunc("hour", F.col("ts")))
        partials = SK.hll_partial(ev, ["event_type", "hour"], "user_id")
        return SK.hll_rollup(partials, ["event_type"]).orderBy("event_type")

    add("events_hll_users_by_type", hll_users, None)
