"""Round-10 wave-2 additions: the distributed global-prefix family
(``operators/prefix.py``) — exact running totals without the
single-partition window trap, cumulative milestone detection, and the
interval sweep line (peak concurrency) built on the same two-phase
bucket-carry machinery.  Semantics and the 100-TB argument live with
the operators; this module binds them to the events table and the
bit-exact DuckDB oracles.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import prefix as P
from ..session import load_table


def _events(spark, sf):
    return load_table(spark, sf, "events")


# one milestone per 5,000 value units (frozen DECIMAL(18,4) ten-
# thousandths): ~50 crossings at sf0.001, ~500 at sf0.01 — compact
# output regardless of input size, which is the point of the entry.
_STEP = 50_000_000


def register(add) -> None:
    def milestones(spark, sf):
        df = _events(spark, sf).select(
            "event_id", "ts",
            (F.col("value").cast("decimal(18,4)") * 10000)
            .cast("long").alias("v_tenk"),
            F.expr("unix_timestamp(ts) div 3600").alias("hb"))
        return P.running_milestones(
            df, "hb", ["ts", "event_id"], "v_tenk",
            step=_STEP, id_cols=["event_id"])

    # the oracle states the SPEC (one global running sum); the engine
    # path is the two-phase bucket-carry form — same bits, parallel.
    add("events_revenue_milestones", milestones,
        f"""WITH v AS (
          SELECT event_id, ts,
                 CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                   AS v_tenk
          FROM events),
        r AS (
          SELECT event_id, v_tenk,
                 SUM(v_tenk) OVER (ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
          FROM v)
        SELECT event_id,
               CAST(running // {_STEP} AS BIGINT) AS milestone,
               CAST(running // {_STEP}
                    - (running - v_tenk) // {_STEP} AS BIGINT)
                 AS n_crossed,
               CAST(running AS BIGINT) AS running
        FROM r
        WHERE running // {_STEP} > (running - v_tenk) // {_STEP}""")

    def concurrency(spark, sf):
        iv = P.session_intervals(_events(spark, sf))
        return P.peak_concurrency_hourly(iv)

    # session bounds share events_sessionize's gap convention (strict
    # > 1800 s on floor-epoch seconds, event_id tiebreak); endpoints
    # become +-1 deltas pre-aggregated per distinct second, so the
    # running concurrency curve is tie-free by construction.
    add("events_peak_concurrency", concurrency,
        """WITH secs AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec
          FROM events),
        flagged AS (
          SELECT user_id, ts, event_id, sec,
                 CASE WHEN sec - lag(sec) OVER w IS NULL THEN 1
                      WHEN sec - lag(sec) OVER w > 1800 THEN 1
                      ELSE 0 END AS new_s
          FROM secs
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sid AS (
          SELECT user_id, sec,
                 SUM(new_s) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
          FROM flagged),
        iv AS (
          SELECT user_id, session_seq,
                 MIN(sec) AS start_sec, MAX(sec) + 1 AS end_sec
          FROM sid GROUP BY 1, 2),
        deltas AS (
          SELECT start_sec AS sec, 1 AS delta FROM iv
          UNION ALL
          SELECT end_sec AS sec, -1 AS delta FROM iv),
        net AS (SELECT sec, SUM(delta) AS net FROM deltas GROUP BY sec),
        curve AS (
          SELECT sec, net, sec // 3600 AS hour,
                 SUM(net) OVER (ORDER BY sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS concurrent
          FROM net)
        SELECT CAST(to_timestamp(hour * 3600) AS TIMESTAMP) AS hour,
               CAST(GREATEST(MAX(concurrent),
                             arg_min(concurrent - net, sec)) AS BIGINT)
                 AS peak_concurrent,
               CAST(arg_max(concurrent, sec) AS BIGINT)
                 AS end_concurrent
        FROM curve GROUP BY hour""")
