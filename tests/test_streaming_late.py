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
