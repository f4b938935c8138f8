"""Watermark semantics: a late event beyond the watermark is dropped from
an append-mode windowed aggregation.  Two availableNow runs share one
checkpoint, so the watermark persists across the restart — the second
run sees the straggler arrive behind it."""
import glob
import os
import shutil
from datetime import datetime

from pyspark.sql import functions as F

SCHEMA = "ts timestamp, user string"


def _write_single_file(df, workdir, dstdir, name):
    tmp = os.path.join(workdir, f"w_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(dstdir, f"{name}.parquet"))


def _run_once(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour"))
           .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()


def test_watermark_drops_late_event(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    t = lambda h, m: datetime(2024, 1, 1, h, m)

    # run 1: on-time events; max event time 02:00 -> watermark 01:50
    df1 = spark.createDataFrame([(t(0, 5), "a"), (t(2, 0), "a")], SCHEMA)
    _write_single_file(df1, str(tmp_path), str(src), "b1")
    _run_once(spark, src, out, ckpt)

    # run 2: an event at 00:30 — behind the persisted 01:50 watermark
    df2 = spark.createDataFrame([(t(0, 30), "a")], SCHEMA)
    _write_single_file(df2, str(tmp_path), str(src), "b2")
    _run_once(spark, src, out, ckpt)

    counts = {r["window"]["start"]: r["n"]
              for r in spark.read.parquet(str(out)).collect()}
    # hour-0 window finalized with ONLY the on-time event; the 00:30
    # straggler was dropped, and no duplicate emission occurred
    assert counts == {t(0, 0): 1}


def test_stateful_user_totals_replay_equals_batch(spark, sf_dir):
    """applyInPandasWithState running totals: the bounded replay's final
    per-user state must exactly equal the batch aggregate (integer-milli
    accumulation — no float drift across partitionings)."""
    from olap_xtrctr_spark.session import events_schema, load_events
    from olap_xtrctr_spark.streaming.stateful import (batch_user_totals,
                                                      replay_user_totals)
    streamed = {(r["user_id"], r["n_events"], r["sum_value_milli"])
                for r in replay_user_totals(
                    spark, sf_dir, events_schema(spark, sf_dir)).collect()}
    batch = {(r["user_id"], r["n_events"], r["sum_value_milli"])
             for r in batch_user_totals(
                 load_events(spark, sf_dir)).collect()}
    assert streamed == batch and len(batch) > 0


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: a second availableNow run against
    the SAME checkpoint must process only files that arrived since the
    first run — and the final counts must equal the batch aggregate of
    everything.  This is the property that makes continuous ingestion
    resumable on a real cluster."""
    import datetime as dt

    src = tmp_path / "stream_src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    t0 = dt.datetime(2025, 3, 1, 0, 0)
    batch1 = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=i), 1, "click", 1.0, "{}")
         for i in range(10)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    batch1.coalesce(1).write.mode("append").parquet(str(src))

    def drain(name):
        stream = (spark.readStream.schema(batch1.schema).parquet(str(src))
                  .groupBy("event_type")
                  .agg(F.count("*").alias("n")))
        q = (stream.writeStream.format("memory").queryName(name)
             .outputMode("complete")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        progress = [p for p in q.recentProgress if p]
        rows_in = sum(p["numInputRows"] for p in progress)
        return rows_in, {r["event_type"]: r["n"]
                         for r in spark.table(name).collect()}

    in1, counts1 = drain("ckpt_run1")
    assert in1 == 10 and counts1 == {"click": 10}

    batch2 = spark.createDataFrame(
        [(100 + i, t0 + dt.timedelta(hours=1, minutes=i), 2, "view",
          1.0, "{}") for i in range(5)], batch1.schema)
    batch2.coalesce(1).write.mode("append").parquet(str(src))

    in2, counts2 = drain("ckpt_run2")
    assert in2 == 5                            # ONLY the new file read
    assert counts2 == {"click": 10, "view": 5} # state restored + extended


EV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
             "event_type string, value double, props string")


def test_session_tracker_replay_closes_exactly_reachable(spark, sf_dir):
    """availableNow replay: emitted sessions = every session closed by a
    later same-user event PLUS each user's final session IF the final
    watermark (max event time - delay) passed its gap deadline —
    availableNow runs a last no-data batch exactly so those timeouts
    fire.  Finals still inside the gap remain open (not emitted)."""
    from olap_xtrctr_spark.session import events_schema, load_events
    from olap_xtrctr_spark.streaming.events import drain_stream_to_table
    from olap_xtrctr_spark.streaming.stateful import (
        batch_closed_sessions, streaming_session_tracker)
    from pyspark.sql import Window

    sdf = streaming_session_tracker(
        spark, sf_dir, events_schema(spark, sf_dir), gap_seconds=1800,
        glob="events.parquet")
    got = drain_stream_to_table(spark, sdf, "sess_tracker_single",
                                output_mode="append")
    got_set = {(r["user_id"], str(r["session_start"]),
                str(r["session_end"]), r["n_events"])
               for r in got.collect()}
    ev = load_events(spark, sf_dir)
    wm = ev.agg(F.max("ts")).collect()[0][0]  # minus 1s delay below
    allb = batch_closed_sessions(ev, 1800)
    w = Window.partitionBy("user_id").orderBy(F.desc("session_start"))
    ranked = allb.withColumn("_rn", F.row_number().over(w))
    reachable = ranked.filter(
        (F.col("_rn") > 1)
        | (F.unix_micros("session_end") + 1800 * 1_000_000
           < F.unix_micros(F.lit(wm)) - 1_000_000))
    want_set = {(r["user_id"], str(r["session_start"]),
                 str(r["session_end"]), r["n_events"])
                for r in reachable.collect()}
    assert got_set == want_set
    assert got_set    # non-trivial: the corpus has multi-session users


def test_session_tracker_event_time_timeout_flush(spark, tmp_path):
    """Three single-file batches: user 10's lone session never closes
    in-batch — only the EventTimeTimeout callback (watermark moved past
    last_event + gap on later batches) can emit it."""
    import time
    from olap_xtrctr_spark.streaming.stateful import _make_session_tracker
    from pyspark.sql.streaming.state import GroupStateTimeout
    from datetime import datetime

    src = tmp_path / "sess_src"
    src.mkdir()
    t = lambda h, m: datetime(2024, 6, 1, h, m)
    batches = [
        [(1, t(0, 0), 10, "click", 1.0, "{}"),
         (2, t(0, 10), 10, "view", 1.0, "{}")],       # user 10 only
        [(3, t(5, 0), 20, "click", 1.0, "{}")],       # advances watermark
        [(4, t(9, 0), 30, "click", 1.0, "{}")],       # fires 10's timeout
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, EV_SCHEMA)
        _write_single_file(df, str(tmp_path), str(src), f"s{i}")
        os.utime(os.path.join(str(src), f"s{i}.parquet"),
                 (1000000 + i, 1000000 + i))   # deterministic file order

    stream = (spark.readStream.schema(EV_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    sdf = (stream.withWatermark("ts", "1 second")
           .groupBy("user_id")
           .applyInPandasWithState(
               _make_session_tracker(1800),
               outputStructType=("user_id bigint, session_start timestamp, "
                                 "session_end timestamp, n_events bigint"),
               stateStructType="start_us bigint, last_us bigint, n bigint",
               outputMode="append",
               timeoutConf=GroupStateTimeout.EventTimeTimeout))
    q = (sdf.writeStream.format("memory").queryName("sess_tracker_timeout")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {r["user_id"]: r
            for r in spark.table("sess_tracker_timeout").collect()}
    # user 10 flushed by timeout with exact bounds; 20 fired later (its
    # own timeout passes when batch 3's watermark lands); 30 still open
    assert 10 in rows
    assert str(rows[10]["session_start"]) == "2024-06-01 00:00:00"
    assert str(rows[10]["session_end"]) == "2024-06-01 00:10:00"
    assert rows[10]["n_events"] == 2
    assert 30 not in rows


def test_session_tracker_survives_late_event(spark, tmp_path):
    """A late event (behind the open session's bounds, behind the
    watermark) must neither kill the query (setTimeoutTimestamp would
    raise on a deadline below the watermark without the clamp) nor
    regress session_end."""
    from olap_xtrctr_spark.streaming.stateful import _make_session_tracker
    from pyspark.sql.streaming.state import GroupStateTimeout
    from datetime import datetime

    src = tmp_path / "late_src"
    src.mkdir()
    t = lambda h, m: datetime(2024, 6, 1, h, m)
    batches = [
        # batch 1: user 10 active at 00:00-00:10; user 20 at 06:00
        # pushes the watermark far past user 10's session
        [(1, t(0, 0), 10, "click", 1.0, "{}"),
         (2, t(0, 10), 10, "view", 1.0, "{}"),
         (3, t(6, 0), 20, "click", 1.0, "{}")],
        # batch 2: a LATE event for user 10 at 00:05 — inside the open
        # session's bounds, hours behind the 05:59:59 watermark
        [(4, t(0, 5), 10, "view", 1.0, "{}"),
         (5, t(9, 0), 30, "click", 1.0, "{}")],
        # batch 3: advances the watermark so user 10's timeout fires
        [(6, t(12, 0), 40, "click", 1.0, "{}")],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, EV_SCHEMA)
        _write_single_file(df, str(tmp_path), str(src), f"l{i}")
        os.utime(os.path.join(str(src), f"l{i}.parquet"),
                 (2000000 + i, 2000000 + i))

    stream = (spark.readStream.schema(EV_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    sdf = (stream.withWatermark("ts", "1 second")
           .groupBy("user_id")
           .applyInPandasWithState(
               _make_session_tracker(1800),
               outputStructType=("user_id bigint, session_start timestamp, "
                                 "session_end timestamp, n_events bigint"),
               stateStructType="start_us bigint, last_us bigint, n bigint",
               outputMode="append",
               timeoutConf=GroupStateTimeout.EventTimeTimeout))
    q = (sdf.writeStream.format("memory").queryName("sess_late")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()        # would raise if the tracker crashed
    rows = {r["user_id"]: r for r in spark.table("sess_late").collect()}
    assert 10 in rows
    # the late 00:05 event folded in: n=3, bounds unchanged
    assert rows[10]["n_events"] == 3
    assert str(rows[10]["session_start"]) == "2024-06-01 00:00:00"
    assert str(rows[10]["session_end"]) == "2024-06-01 00:10:00"


def test_type_drift_vs_baseline_missing_types_and_alert(spark):
    """Types absent from a day (or from the baseline) count fully
    toward the distance via the missing-mass completion; the alert
    flag trips at the threshold."""
    from olap_xtrctr_spark.streaming.events import type_drift_vs_baseline

    counts = spark.createDataFrame(
        [("d1", "a", 5), ("d1", "b", 5),        # same mix as baseline
         ("d2", "c", 10)],                      # disjoint types
        "day string, event_type string, n long")
    baseline = spark.createDataFrame(
        [("a", 50), ("b", 50)], "event_type string, n long")
    rows = {r["day"]: r for r in
            type_drift_vs_baseline(counts, baseline,
                                   alert_milli=500).collect()}
    assert rows["d1"]["tv_milli"] == 0 and not rows["d1"]["alert"]
    # d2: total variation 1.0 -> 1000 milli (disjoint distributions)
    assert rows["d2"]["tv_milli"] == 1000 and rows["d2"]["alert"]
    assert rows["d2"]["n_events"] == 10


def test_hll_stream_fold_restart_recovery(spark, sf_dir, tmp_path):
    """The streaming HLL fold's restart path: a fresh process (state
    reset) folding batch 1 must reload batch 0's register store and
    produce the same registers as an uninterrupted two-batch fold."""
    from pyspark.sql import functions as F

    from olap_xtrctr_spark.operators import sketches as SK
    from olap_xtrctr_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    mid = ev.agg(F.expr("percentile(event_id, 0.5)")).first()[0]
    b0 = ev.filter(F.col("event_id") <= mid)
    b1 = ev.filter(F.col("event_id") > mid)

    def merge(a, b):
        return (a.unionByName(b).groupBy("event_type", "reg")
                .agg(F.max("max_rank").alias("max_rank")))

    # uninterrupted fold
    r0 = SK.hll_md5_registers(b0, ["event_type"], "user_id")
    want = sorted(map(tuple, merge(
        r0, SK.hll_md5_registers(b1, ["event_type"], "user_id"))
        .collect()))

    # crash after batch 0: store persisted, in-memory state lost
    store0 = str(tmp_path / "store_b0")
    r0.write.mode("overwrite").parquet(store0)
    recovered = spark.read.parquet(store0)          # the restart read
    got = sorted(map(tuple, merge(
        recovered, SK.hll_md5_registers(b1, ["event_type"], "user_id"))
        .collect()))
    assert got == want
    # and the estimates off the recovered fold match the one-shot sketch
    one_shot = sorted(map(tuple, SK.hll_md5_distinct(
        ev, ["event_type"], "user_id").collect()))
    via_fold = sorted(map(tuple, SK.hll_md5_estimate(
        merge(recovered,
              SK.hll_md5_registers(b1, ["event_type"], "user_id")),
        ["event_type"]).collect()))
    assert via_fold == one_shot
