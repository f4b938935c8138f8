"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for state machines the built-in windowed/session
aggregations can't express (the reference has no streaming surface at
all, SURVEY §2.11; this is the declared beyond-parity extension).

Scale posture: state lives in the executor-side state store partitioned
by the grouping key, exactly like session_window's; a key's state is an
O(1) tuple, so state size is bounded by key cardinality, not event
volume.  Python is unavoidable here by design (the operator exists to
run arbitrary per-key logic) but it sees Arrow batches, not rows.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = ("user_id bigint, n_events bigint, "
                         "sum_value_milli bigint")
_STATE_SCHEMA = "n bigint, tot_milli bigint"


def _update_running_totals(key, pdfs, state: GroupState):
    """Per-user running totals.  Each value is floor-quantized to
    integer millis BEFORE summing (numpy floor == Spark FLOOR, no
    tie-break rule to disagree on), so the running sum is
    order-independent and exactly equal to the batch aggregate — a
    float accumulator would drift differently per partitioning."""
    import numpy as np
    import pandas as pd

    (user_id,) = key
    n, tot_milli = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        vals = pdf["value"].to_numpy(dtype=np.float64)
        tot_milli += int(np.floor(vals * 1000.0).astype(np.int64).sum())
    state.update((n, tot_milli))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "sum_value_milli": [tot_milli]})


def streaming_user_totals(spark: SparkSession, source_dir: str, schema,
                          glob: str | None = None) -> DataFrame:
    """readStream → groupBy(user_id) → applyInPandasWithState running
    totals.  Output mode 'update': each micro-batch emits one row per
    user whose state changed."""
    from .events import event_stream
    stream = event_stream(spark, source_dir, schema, glob)
    return (stream.groupBy("user_id")
            .applyInPandasWithState(
                _update_running_totals,
                outputStructType=RUNNING_TOTALS_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def replay_user_totals(spark: SparkSession, source_dir: str, schema,
                       glob: str = "events.parquet") -> DataFrame:
    """Bounded availableNow replay; the LAST update per user equals the
    batch aggregate (update-mode memory sink keeps every emission, so
    dedupe to the final state per key)."""
    from .events import drain_stream_to_table
    sdf = streaming_user_totals(spark, source_dir, schema, glob=glob)
    tbl = drain_stream_to_table(spark, sdf, "events_stream_user_totals",
                                output_mode="update")
    # keep the most-advanced emission per user (n_events is monotone)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (tbl.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def batch_user_totals(events: DataFrame) -> DataFrame:
    """The batch equivalent the replay must reproduce exactly."""
    milli = F.floor(F.col("value").cast("double") * 1000).cast("bigint")
    return (events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(milli).alias("sum_value_milli")))


# ---- timeout-driven session tracker ---------------------------------------
#
# The state machine session_window CANNOT express: emit one row per
# CLOSED session, where a session closes EITHER because a later event of
# the same user exceeded the gap (in-batch close) OR because event time
# moved past last_event + gap with no further activity (EventTimeTimeout
# close — the state store calls us back with hasTimedOut, no event
# needed).  A user's final session stays open until the watermark passes
# its deadline: correct streaming semantics, asserted in the tests.

SESSIONS_SCHEMA = ("user_id bigint, session_start timestamp, "
                   "session_end timestamp, n_events bigint")
_SESS_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def _make_session_tracker(gap_seconds: int):
    # state in MICROseconds (the testdata's native ts precision — milli
    # truncation would desync session bounds from the batch oracle);
    # only the timeout deadline converts to the API's milliseconds
    gap_us = int(gap_seconds) * 1_000_000

    def _track(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            # watermark passed last_event + gap: flush the open session
            if state.exists:
                s, last, n = state.get
                closed.append((user_id, s, last, n))
            state.remove()
        else:
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values(["ts", "event_id"])
            ts_us = (rows["ts"].astype("datetime64[ns]").astype("int64")
                     // 1_000)
            s, last, n = state.get if state.exists else (None, None, 0)
            for t in ts_us:
                t = int(t)
                if s is None:
                    s, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((user_id, s, last, n))
                    s, last, n = t, t, 1
                else:
                    # covers LATE events too (applyInPandasWithState does
                    # not drop them): an arrival behind the open session's
                    # bounds folds in via min/max instead of regressing
                    # `last` — session_end must never move backward
                    s, last, n = min(s, t), max(last, t), n + 1
            state.update((s, last, n))
            # the deadline must not be behind the current watermark (a
            # late-dominated batch could put last+gap there, and
            # setTimeoutTimestamp raises on it, killing the query) —
            # clamp forward so the flush fires on the next advance
            deadline_ms = (last + gap_us) // 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
        out = pd.DataFrame(closed, columns=["user_id", "session_start",
                                            "session_end", "n_events"])
        if not out.empty:
            out["session_start"] = pd.to_datetime(out["session_start"],
                                                  unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"],
                                                unit="us")
        yield out

    return _track


def streaming_session_tracker(spark: SparkSession, source_dir: str, schema,
                              gap_seconds: int = 1800,
                              watermark: str = "1 second",
                              glob: str | None = None) -> DataFrame:
    """readStream → watermark → groupBy(user_id) →
    applyInPandasWithState with EventTimeTimeout.  Append mode: only
    CLOSED sessions are emitted, each exactly once."""
    from .events import event_stream
    stream = event_stream(spark, source_dir, schema, glob)
    return (stream
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_session_tracker(gap_seconds),
                outputStructType=SESSIONS_SCHEMA,
                stateStructType=_SESS_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def batch_closed_sessions(events: DataFrame,
                          gap_seconds: int = 1800) -> DataFrame:
    """Batch equivalent: EVERY session of every user as
    (user_id, session_start, session_end, n_events) — the streaming
    tracker must emit exactly the subset whose close condition has been
    reached (all but each user's final session, until the watermark
    passes its deadline).

    Known, intended divergence: a CROSS-BATCH late event arriving more
    than gap_seconds before an open session's start folds into that
    session in the streaming tracker (min/max — session bounds never
    regress, and the already-scheduled close deadline stays valid),
    while this batch oracle, seeing all events at once, splits it into
    its own earlier session.  Unreachable in a bounded single-batch
    replay; on a live stream the tracker's fold is the standard choice
    (emitting a session that PRECEDES one already closed would break
    downstream consumers assuming per-user monotone session_start)."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1)
                 .otherwise(0))
    sid = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (flagged.withColumn("_sid", sid)
            .groupBy("user_id", "_sid")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"))
            .drop("_sid"))
