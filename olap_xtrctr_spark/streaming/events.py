"""Event analytics: batch window aggregations + the Structured Streaming
equivalents (the reference has zero streaming surface — SURVEY §2.11 —
so this is the declared beyond-parity extension).

The batch forms are plain groupBys (oracle-checkable); the streaming
forms wrap the same logic in readStream + watermark so late data is
handled at scale.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type (batch form)."""
    return (events.groupBy(
                F.date_trunc("hour", "ts").alias("hour"),
                "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                  .cast("double").alias("sum_value")))


def ohlc_hourly(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Hourly OHLC bars per event type: open/close are the first/last
    value by deterministic event order (ts, then event_id for
    same-timestamp ties), low/high the extremes — the standard
    time-series downsampling shape for any metered value stream.

    ONE aggregation via min_by/max_by with a struct ordering key — no
    rank window, so partial aggregation runs map-side and nothing
    funnels a whole (hour, type) group through a sort.  (An ANSI oracle
    without struct-ordered arg_min reproduces it with a row_number
    construction; same deterministic result, heavier plan.)"""
    ordk = "struct(ts, event_id)"
    return (events.groupBy(F.date_trunc("hour", "ts").alias("hour"),
                           "event_type")
            .agg(F.round(F.expr(f"min_by({value_col}, {ordk})"), 4)
                  .alias("open"),
                 F.round(F.expr(f"max_by({value_col}, {ordk})"), 4)
                  .alias("close"),
                 F.round(F.min(value_col), 4).alias("low"),
                 F.round(F.max(value_col), 4).alias("high"),
                 F.count(F.lit(1)).alias("n_events")))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user via lag + cumulative sum —
    one shuffle on user_id, deterministic (ties broken by event_id).

    Late-event semantics vs the streaming tracker: this batch form sees
    all events at once, so a late event more than one gap before an
    open session becomes its own earlier session; the stateful tracker
    (``stateful.streaming_session_tracker``, note at
    ``stateful.py:129``) instead folds it into the open session via
    min/max so session bounds never regress — see
    ``stateful.batch_closed_sessions`` for why both are intended."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp, not cast("long"): same seconds semantics on TIMESTAMP
    # but it also resolves on timestamp_ntz input (no NTZ→BIGINT cast exists)
    secs = F.unix_timestamp(F.col("ts"))
    gap = secs - F.lag(secs).over(w)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    with_sid = with_flag.withColumn(
        "session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (with_sid.groupBy("user_id")
            .agg(F.max("session_id").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


def top_hours_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Busiest k hours per event type: windowed rank over the hourly
    rollup (row_number, ties broken by hour for determinism).  The rank
    window partitions by event_type, so it shuffles only the already-
    aggregated hourly table, never raw events."""
    hourly = hourly_rollup(events)
    w = Window.partitionBy("event_type").orderBy(F.desc("n_events"),
                                                 F.asc("hour"))
    return (hourly.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("event_type", "rank", "hour", "n_events"))


def user_activity(events: DataFrame) -> DataFrame:
    """Per-user daily activity profile."""
    return (events.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count_distinct("event_type").alias("n_types"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                  .cast("double").alias("sum_value")))


# ---- Structured Streaming forms ------------------------------------------

def event_stream(spark: SparkSession, source_dir: str, schema,
                 glob: str | None = None) -> DataFrame:
    """The shared readStream source every streaming operator builds on:
    nanos-conf pinned, optional pathGlobFilter, and the events timestamp
    normalized to TIMESTAMP whatever the parquet writer encoded — ONE
    place to fix reader behavior (the round-3 NTZ lesson) instead of a
    copy per operator."""
    from ..session import ensure_nanos_conf, normalize_event_ts
    ensure_nanos_conf(spark)
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return normalize_event_ts(reader.parquet(source_dir))


def streaming_hourly_rollup(spark: SparkSession, source_dir: str,
                            schema, watermark: str = "2 hours",
                            glob: str | None = None) -> DataFrame:
    """readStream → watermark → tumbling window → same rollup as batch.
    Append-mode capable: the watermark bounds state for late data.
    ``glob`` restricts which files of the directory are streamed (the
    file source requires a directory basePath)."""
    stream = event_stream(spark, source_dir, schema, glob)
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                  .cast("double").alias("sum_value"))
            .select(F.col("window.start").alias("hour"), "event_type",
                    "n_events", "sum_value"))


def streaming_ohlc_hourly(spark: SparkSession, source_dir: str,
                          schema, watermark: str = "2 hours",
                          glob: str | None = None) -> DataFrame:
    """Streaming form of ``ohlc_hourly``: readStream → watermark →
    tumbling window → min_by/max_by bars.  The ordered-first/last
    aggregates are watermark-compatible state (one (ordering key,
    value) pair per open window per function — O(1) per group, not a
    buffered event list), so the live path costs the same state as a
    plain count."""
    stream = event_stream(spark, source_dir, schema, glob)
    ordk = "struct(ts, event_id)"
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.round(F.expr(f"min_by(value, {ordk})"), 4)
                  .alias("open"),
                 F.round(F.expr(f"max_by(value, {ordk})"), 4)
                  .alias("close"),
                 F.round(F.min("value"), 4).alias("low"),
                 F.round(F.max("value"), 4).alias("high"),
                 F.count(F.lit(1)).alias("n_events"))
            .select(F.col("window.start").alias("hour"), "event_type",
                    "open", "close", "low", "high", "n_events"))


def replay_ohlc_hourly(spark: SparkSession, source_dir: str,
                       schema, glob: str = "events.parquet") -> DataFrame:
    """Bounded availableNow replay of the streaming OHLC bars; equals
    the batch ``ohlc_hourly``, so the same SQL oracle applies."""
    sdf = streaming_ohlc_hourly(spark, source_dir, schema, glob=glob)
    return drain_stream_to_table(spark, sdf, "events_stream_ohlc")


def run_stream_to_memory(spark: SparkSession, streaming_df: DataFrame,
                         query_name: str = "events_rollup",
                         output_mode: str = "complete"):
    """Drive a streaming DF into an in-memory sink.

    ``complete`` is the right mode for a bounded availableNow replay of a
    windowed aggregation: append mode would hold every window whose end
    is past the watermark as open state and emit NOTHING for a
    single-batch replay (the watermark only advances between batches).

    The stateful-shuffle width for the replay is
    ``max(2, defaultParallelism // 8)`` — each state-store partition
    carries a fixed open/commit cost per micro-batch, so a bounded
    replay pays pure overhead for width it can't fill (an external
    session's default of 200 would be worse still; measured on sf0.1:
    32-wide 1.84 s, 8-wide 1.13 s for the same rollup; the r13 probe
    put the 3-replay trio at 2.84 s for width 8 vs 2.27 s for width 4,
    width 2 flat-to-worse — scripts/stream_replay_probe.py).  State
    partitioning is fixed at the first micro-batch, and ``start()``
    plans asynchronously, so the caller restores the conf AFTER
    ``awaitTermination`` (see ``drain_stream_to_table``).  A real
    continuous deployment sizes this to key cardinality × throughput
    instead and keeps it stable across restarts.
    """
    width = max(2, spark.sparkContext.defaultParallelism // 8)
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    writer = (streaming_df.writeStream
              .format("memory")
              .queryName(query_name)
              .outputMode(output_mode)
              .trigger(availableNow=True))
    ckpt = _replay_checkpoint_dir(query_name)
    if ckpt:
        writer = writer.option("checkpointLocation", ckpt)
    q = writer.start()
    q._sgr_ckpt = ckpt          # drain_stream_to_table deletes it
    return q


def _replay_checkpoint_dir(query_name: str):
    """Fresh per-run checkpoint dir for a BOUNDED memory-sink replay.

    Without an explicit location Spark creates (and force-deletes) a
    temp checkpoint under java.io.tmpdir — on disk.  The replay's
    checkpoint is pure scratch (the memory sink is itself volatile and
    every replay starts from a fresh dir, never resuming), so tmpfs is
    strictly better: the per-micro-batch state-store commit fsyncs were
    ~20% of replay wall (r13 probe: width-4 trio 2.27 s on /tmp vs
    2.12 s on /dev/shm).  SPARK_GRAFT_STREAM_CKPT_DIR overrides; if
    neither it nor /dev/shm exists, fall back to Spark's own temp
    checkpoint behavior (return None).  A DURABLE deployment passes its
    own checkpointLocation through the continuous-query entry points —
    this helper is only for the bounded replay-to-memory path."""
    import os as _os
    import uuid as _uuid
    base = _os.environ.get("SPARK_GRAFT_STREAM_CKPT_DIR")
    if base is None and _os.path.isdir("/dev/shm"):
        base = "/dev/shm"
    if not base:
        return None
    return f"{base}/sgr-replay-{query_name}-{_uuid.uuid4().hex}"


def drain_stream_to_table(spark: SparkSession, streaming_df: DataFrame,
                          query_name: str,
                          output_mode: str = "complete") -> DataFrame:
    """Run a bounded availableNow replay to completion and return the
    memory-sink table, restoring the caller's shuffle-partitions conf
    and deleting the scratch checkpoint once the drain is done."""
    # effective value (falls back to the session default when unset), so
    # the restore puts back exactly what queries saw before the replay
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    q = None
    try:
        q = run_stream_to_memory(spark, streaming_df, query_name,
                                 output_mode=output_mode)
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        ckpt = getattr(q, "_sgr_ckpt", None)
        if ckpt:
            import shutil
            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(query_name)


def streaming_sessionize(spark: SparkSession, source_dir: str, schema,
                         gap: str = "30 minutes",
                         watermark: str = "2 hours",
                         glob: str | None = None,
                         second_resolution: bool = False) -> DataFrame:
    """Gap-based sessions on a STREAM via the built-in ``session_window``
    (merging-window state store — the scale path for continuous
    sessionization; the batch lag+cumsum form can't stream).  One row per
    closed (user, session).

    Boundary convention: ``session_window`` merging is
    boundary-INCLUSIVE (an event exactly ``gap`` after the previous one
    still merges), and the batch ``sessionize`` splits only when the gap
    EXCEEDS the threshold over floor-seconds — so the same gap plus
    ``second_resolution=True`` reproduces the batch convention exactly."""
    stream = event_stream(spark, source_dir, schema, glob)
    if second_resolution:
        stream = stream.withColumn("ts", F.date_trunc("second", "ts"))
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("session_window.start").alias("start"),
                    F.col("session_window.end").alias("end"), "n_events"))


def replay_sessionize(spark: SparkSession, source_dir: str, schema,
                      gap: str = "30 minutes",
                      glob: str = "events.parquet",
                      second_resolution: bool = False) -> DataFrame:
    """Bounded availableNow replay of the streaming sessionizer."""
    sdf = streaming_sessionize(spark, source_dir, schema, gap=gap, glob=glob,
                               second_resolution=second_resolution)
    return drain_stream_to_table(spark, sdf, "events_stream_sessions")


def replay_hourly_rollup(spark: SparkSession, source_dir: str,
                         schema, glob: str = "events.parquet") -> DataFrame:
    """End-to-end bounded streaming run: readStream over the events files,
    watermarked tumbling-window rollup, availableNow replay into a memory
    sink; returns the final table (equals the batch ``hourly_rollup``)."""
    sdf = streaming_hourly_rollup(spark, source_dir, schema, glob=glob)
    return drain_stream_to_table(spark, sdf, "events_stream_hourly")


def streaming_interval_join(spark: SparkSession, source_dir: str, schema,
                            window_seconds: int = 3600,
                            watermark: str = "2 hours",
                            glob: str | None = None) -> DataFrame:
    """Stream-stream INTERVAL JOIN: every purchase matches every click
    by the same user in the preceding ``window_seconds`` (inclusive).

    This is the hardest streaming shape Spark supports: both inputs are
    unbounded, so BOTH carry watermarks and the join predicate bounds
    event time in both directions — that pair of constraints is what
    lets the state store evict buffered clicks older than
    watermark + window instead of holding the full history (state is
    O(window · rate), not O(stream)).  Inner joins emit as soon as the
    match arrives; only state *eviction* waits for the watermark."""
    def src():
        return event_stream(spark, source_dir, schema, glob)

    clicks = (src().filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("click_ts"),
                      F.col("value").alias("click_value"))
              .withWatermark("click_ts", watermark))
    purchases = (src().filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("user_id"),
                         F.col("event_id").alias("event_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("value").alias("purchase_value"))
                 .withWatermark("purchase_ts", watermark))
    cond = ((F.col("c_user") == F.col("user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts")
               <= F.col("click_ts")
               + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")))
    return (purchases.join(clicks, cond, "inner")
            .select("event_id", "user_id", "purchase_ts",
                    "purchase_value", "click_ts", "click_value"))


def replay_interval_join(spark: SparkSession, source_dir: str, schema,
                         window_seconds: int = 3600,
                         glob: str = "events.parquet") -> DataFrame:
    """Bounded availableNow replay of the stream-stream interval join
    (append mode — the only mode stream-stream joins support)."""
    sdf = streaming_interval_join(spark, source_dir, schema,
                                  window_seconds=window_seconds, glob=glob)
    return drain_stream_to_table(spark, sdf, "events_stream_ssjoin",
                                 output_mode="append")


def streaming_unconverted_clicks(spark: SparkSession, source_dir: str,
                                 schema, window_seconds: int = 3600,
                                 watermark: str = "2 hours",
                                 glob: str | None = None) -> DataFrame:
    """Stream-stream LEFT OUTER interval join, null-filtered: clicks
    that saw NO purchase by the same user within ``window_seconds`` —
    the abandonment feed a marketing pipeline alerts on.

    Outer joins add the semantics inner joins don't have: a
    null-padded row can only be emitted once the watermark proves no
    match can still arrive, so the unmatched rows surface with
    watermark latency (inner matches emit immediately).  State is
    evicted — and the null row released — when the click's whole match
    window falls behind the watermark; clicks newer than that at
    stream end stay in state and are NOT emitted, which is the
    documented difference from the batch anti-join (the oracle mirrors
    it with an explicit final-watermark clause)."""
    def src():
        return event_stream(spark, source_dir, schema, glob)

    clicks = (src().filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"),
                      F.col("value").alias("click_value"))
              .withWatermark("click_ts", watermark))
    purchases = (src().filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("user_id"),
                         F.col("ts").alias("purchase_ts"))
                 .withWatermark("purchase_ts", watermark))
    cond = ((F.col("c_user") == F.col("user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts")
               <= F.col("click_ts")
               + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")))
    return (clicks.join(purchases, cond, "left_outer")
            .filter(F.col("purchase_ts").isNull())
            .select(F.col("click_id"), F.col("c_user").alias("user_id"),
                    "click_ts", "click_value"))


def replay_unconverted_clicks(spark: SparkSession, source_dir: str,
                              schema, window_seconds: int = 3600,
                              glob: str = "events.parquet") -> DataFrame:
    """Bounded availableNow replay of the left-outer interval join
    (append mode).  The final no-data micro-batch advances the
    watermark to max(click_ts) - delay and flushes the evictable
    unmatched state."""
    sdf = streaming_unconverted_clicks(spark, source_dir, schema,
                                       window_seconds=window_seconds,
                                       glob=glob)
    return drain_stream_to_table(spark, sdf, "events_stream_unconverted",
                                 output_mode="append")


VALUE_TIERS = (
    ("micro", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("mid", 50.0, 150.0),
    ("large", 150.0, 300.0),
    ("huge", 300.0, 1000.0),
)


def streaming_enriched_tiers(spark: SparkSession, source_dir: str, schema,
                             glob: str | None = None) -> DataFrame:
    """STREAM-STATIC join: an unbounded event stream enriched against a
    bounded dimension (the value-tier table), then aggregated per tier.

    This is the remaining streaming join shape after the stream-stream
    interval join: the static side needs no watermark and no state —
    each micro-batch joins against the broadcast dimension as ordinary
    batch work, which is exactly how a 100 TB/day stream enriches
    against reference data (the dimension ships with the task, the
    stream never shuffles for the join)."""
    tiers = spark.createDataFrame(list(VALUE_TIERS),
                                  "tier string, lo double, hi double")
    stream = event_stream(spark, source_dir, schema, glob)
    joined = stream.join(
        F.broadcast(tiers),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        "inner")
    return (joined.groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                  .cast("double").alias("sum_value")))


def replay_enriched_tiers(spark: SparkSession, source_dir: str, schema,
                          glob: str = "events.parquet") -> DataFrame:
    sdf = streaming_enriched_tiers(spark, source_dir, schema, glob=glob)
    return drain_stream_to_table(spark, sdf, "events_stream_tiers")


def streaming_dedup_counts(spark: SparkSession, source_dir: str, schema,
                           glob: str | None = None) -> DataFrame:
    """Exactly-once ingestion over an at-least-once source: the stream is
    unioned with itself (simulating redelivery), deduplicated on the
    event key, then counted per type.  dropDuplicates state is
    partitioned by the key, the same scale shape as any streaming agg;
    production callers add a watermark so old keys age out of state
    (bounded replay here has no late data to bound).
    """
    stream = event_stream(spark, source_dir, schema, glob)
    doubled = stream.union(stream)            # simulated redelivery
    return (doubled.dropDuplicates(["event_id"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events")))


def replay_dedup_counts(spark: SparkSession, source_dir: str, schema,
                        glob: str = "events.parquet") -> DataFrame:
    sdf = streaming_dedup_counts(spark, source_dir, schema, glob=glob)
    return drain_stream_to_table(spark, sdf, "events_stream_dedup")


def streaming_dedup_counts_bounded(spark: SparkSession, source_dir: str,
                                   schema, watermark: str = "2 hours",
                                   glob: str | None = None) -> DataFrame:
    """The BOUNDED-STATE form of streaming exactly-once dedup:
    ``dropDuplicatesWithinWatermark`` holds a key only until the
    watermark passes its event time + delay, then evicts it — state is
    O(keys per watermark window), not O(all keys ever seen), which is
    the difference between a dedup stage that runs forever at 100 TB/day
    and one whose state store fills the cluster.  The contract weakens
    accordingly: only duplicates arriving within the watermark delay of
    each other are collapsed — exactly the at-least-once redelivery
    window a real bus (Kafka, Kinesis) produces.  The self-union replay
    redelivers every event instantly, well inside any delay, so the
    bounded replay still equals the batch distinct count."""
    stream = event_stream(spark, source_dir, schema, glob)
    doubled = stream.union(stream)            # simulated redelivery
    return (doubled
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events")))


def replay_dedup_counts_bounded(spark: SparkSession, source_dir: str,
                                schema,
                                glob: str = "events.parquet") -> DataFrame:
    sdf = streaming_dedup_counts_bounded(spark, source_dir, schema,
                                         glob=glob)
    return drain_stream_to_table(spark, sdf, "events_stream_dedup_bounded")


def replay_rollup_to_parquet(spark: SparkSession, source_dir: str, schema,
                             out_dir: str,
                             glob: str = "events.parquet") -> DataFrame:
    """Streaming → PARQUET sink via ``foreachBatch``, idempotently: each
    micro-batch overwrites its own ``batch_id=<n>`` subdirectory, so a
    retried batch (at-least-once delivery from the engine) lands in the
    same place instead of duplicating rows — the standard exactly-once
    recipe for non-transactional file sinks.  Within foreachBatch the
    data is a plain batch DataFrame, so the write is ordinary
    partitioned parquet work.

    Bounded availableNow replay of the hourly rollup in COMPLETE mode —
    load-bearing: each batch rewrites the full rollup state, so reading
    back only the HIGHEST batch_id directory yields the final rollup.
    Returns the rows read back from the sink directory."""
    import os

    if os.path.isdir(out_dir) and any(p.startswith("batch_id=")
                                      for p in os.listdir(out_dir)):
        # a previous run's higher batch_id directory would win the
        # max(batch_id) read-back below and return stale rollup data
        raise ValueError(
            f"out_dir {out_dir!r} already holds batch_id=* directories "
            f"from a previous replay; use a fresh directory (the "
            f"idempotent-overwrite contract covers retries WITHIN one "
            f"run, not reuse across runs)")

    sdf = streaming_hourly_rollup(spark, source_dir, schema, glob=glob)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(f"{out_dir}/batch_id={batch_id}"))

    q = (sdf.writeStream
         .foreachBatch(write_batch)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    batch_ids = [int(p.split("=")[1]) for p in
                 (os.listdir(out_dir) if os.path.isdir(out_dir) else [])
                 if p.startswith("batch_id=")]
    if not batch_ids:
        raise ValueError(
            f"stream produced no batches (does any file under "
            f"{source_dir!r} match glob {glob!r}?)")
    return spark.read.parquet(f"{out_dir}/batch_id={max(batch_ids)}")


def hourly_anomalies(events: DataFrame, window_hours: int = 24,
                     threshold_sq: int = 49,
                     bursts_only: bool = True) -> DataFrame:
    """Hours whose event count deviates from the trailing-window mean by
    more than sqrt(threshold_sq) trailing standard deviations, per
    event type.

    The test is evaluated in EXACT integer arithmetic — cross-multiplied
    so no engine-specific float sqrt/stddev is involved:
        (n*x - sum)^2 * n  >  threshold_sq * (n*sumsq - sum^2) * n ...
    reduced:  (n*x - sum)^2  >  threshold_sq * (n*sumsq - sum^2)
    where (sum, sumsq, n) are over the PRECEDING window_hours hours
    (the current hour excluded — an anomaly must not mask itself).

    Scale shape: the window runs over the hourly ROLLUP (already
    collapsed by map-side combine), partitioned by event_type — it
    never touches raw events.
    """
    hourly = (events.groupBy(F.date_trunc("hour", "ts").alias("hour"),
                             "event_type")
              .agg(F.count(F.lit(1)).alias("n_events")))
    return anomalies_from_rollup(hourly, window_hours, threshold_sq,
                                 bursts_only)


def anomalies_from_rollup(hourly: DataFrame, window_hours: int = 24,
                          threshold_sq: int = 49,
                          bursts_only: bool = True) -> DataFrame:
    """The detector core over an (hour, event_type, n_events) rollup —
    shared by the batch path above and the streaming-replay composition
    (the replayed streaming rollup IS the batch rollup, so one detector
    serves both)."""
    w = (Window.partitionBy("event_type").orderBy("hour")
         .rowsBetween(-window_hours, -1))
    x = F.col("n_events")
    with_win = (hourly
                .withColumn("_s", F.sum(x).over(w))
                .withColumn("_sq", F.sum(x * x).over(w))
                .withColumn("_n", F.count(x).over(w)))
    n, s, sq = F.col("_n"), F.col("_s"), F.col("_sq")
    dev_sq = (n * x - s) * (n * x - s)
    var_n2 = n * sq - s * s          # n^2 * variance
    out = (with_win
           .filter(n >= window_hours)                # full window only
           .filter(dev_sq > threshold_sq * var_n2))
    if bursts_only:
        out = out.filter(n * x > s)                  # spikes, not dips
    return (out
            .select("event_type", "hour", "n_events",
                    s.alias("win_sum"), n.cast("int").alias("win_n")))


def funnel_conversion(events: DataFrame, first_type: str = "click",
                      then_type: str = "purchase",
                      within_minutes: int = 60) -> DataFrame:
    """Sequential-pattern conversion: per user, did a ``then_type`` event
    follow a ``first_type`` event within the window?

    Join-free: one window pass per user ordered by time carries the
    most-recent ``first_type`` timestamp forward (last_value over the
    preceding frame), so conversion is a row-local comparison — the
    classic funnel without the self-join blowup (a user with k clicks
    and m purchases costs k+m rows, never k*m).

    Output per user: n_first, n_then, n_converted (then-events preceded
    by a first-event within the window), first_conversion_ts.
    """
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    last_first = F.last(
        F.when(F.col("event_type") == first_type, F.col("ts")),
        ignorenulls=True).over(w)
    flagged = events.withColumn("_last_first", last_first)
    is_conv = ((F.col("event_type") == then_type)
               & F.col("_last_first").isNotNull()
               & (F.unix_timestamp(F.col("ts"))
                  - F.unix_timestamp(F.col("_last_first"))
                  <= within_minutes * 60)
               & (F.col("ts") >= F.col("_last_first")))
    return (flagged.groupBy("user_id")
            .agg(F.sum(F.when(F.col("event_type") == first_type, 1)
                       .otherwise(0)).alias("n_first"),
                 F.sum(F.when(F.col("event_type") == then_type, 1)
                       .otherwise(0)).alias("n_then"),
                 F.sum(F.when(is_conv, 1).otherwise(0)).alias("n_converted"),
                 F.min(F.when(is_conv, F.col("ts")))
                 .alias("first_conversion_ts"))
            .filter(F.col("n_first") > 0))


def event_type_sequences(events: DataFrame, n: int = 3,
                         k: int = 15) -> DataFrame:
    """Most common length-``n`` consecutive event-type sequences across
    user timelines (path analysis / sequential-pattern mining lite):
    'what do users do right before purchasing?' without a self-join.

    Shape at scale: ONE shuffle on user_id for the lead() window (the
    same exchange sessionize pays — at 100 TB both can share it), then
    a count whose key domain is |event_types|^n (bounded, map-side
    combined) and a TakeOrderedAndProject top-k.  Windows crossing the
    end of a user's timeline are dropped (lead returns NULL there).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cols = [F.col("event_type")] + \
           [F.lead("event_type", i).over(w) for i in range(1, n)]
    seqs = (events.select(*[c.alias(f"_t{i}") for i, c in enumerate(cols)])
            .filter(F.col(f"_t{n - 1}").isNotNull())
            .select(F.concat_ws(" > ", *[f"_t{i}" for i in range(n)])
                     .alias("seq")))
    counts = seqs.groupBy("seq").agg(F.count(F.lit(1)).alias("n_occurrences"))
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("seq")).limit(k)
    wr = Window.orderBy(F.desc("n_occurrences"), F.asc("seq"))  # k rows only
    return (top.withColumn("rank", F.row_number().over(wr))
            .select("rank", "seq", "n_occurrences"))


def merge_rollup(*rollups: DataFrame) -> DataFrame:
    """Merge partial hourly rollups into one — the mergeable-aggregate
    discipline behind every incremental materialized view: yesterday's
    stored rollup plus today's delta re-aggregates on the SAME keys
    instead of rescanning raw events (count and decimal-exact sum are
    both associative; avg/percentile callers must store sum+count, not
    the ratio).  Merging N partials costs one shuffle over rollup-grain
    rows — at 100 TB/day that is hours×types rows, not events.

    sum_value passes back through DECIMAL(18,4) during the merge, so
    partial-then-merge equals the single-pass rollup bit-for-bit (a
    double re-sum would re-order float error); a production pipeline
    STORES the decimal and casts to double only at the edge."""
    out = rollups[0]
    for r in rollups[1:]:
        out = out.unionByName(r)
    return (out.groupBy("hour", "event_type")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum(F.col("sum_value").cast("decimal(18,4)"))
                  .cast("double").alias("sum_value")))


def user_activity_deciles(events: DataFrame, buckets: int = 10) -> DataFrame:
    """Users bucketed into activity deciles — WITHOUT ranking users.

    A naive NTILE over all users is a single-partition window (the
    top_tokens lesson).  Instead the decile is VALUE-based: group users
    by their event count, run the cumulative user count over the
    DISTINCT count values (a window over |distinct counts| rows — tiny,
    bounded by the activity range, never |users|), and assign every
    user of a value the decile of that value's cumulative rank.  Ties
    therefore share a decile (deterministic, engine-independent) and
    the join back to values is a broadcast.

    decile d = ceil(cum_users_at_or_above * buckets / total_users),
    over counts ordered DESCENDING (decile 1 = most active).
    Output per decile: n_users, min/max event count, total events.
    """
    ua = (events.groupBy("user_id")
          .agg(F.count(F.lit(1)).alias("n_events")))
    vc = ua.groupBy("n_events").agg(F.count(F.lit(1)).alias("n_users_v"))
    w = Window.orderBy(F.desc("n_events"))  # |distinct counts| rows only
    # total user count stays IN-PLAN (broadcast scalar crossjoin, the
    # mix_corpus pattern) — no eager .count() job on the driver
    tot = ua.agg(F.count(F.lit(1)).alias("_total"))
    vd = (vc.crossJoin(F.broadcast(tot))
          .withColumn("_cum", F.sum("n_users_v").over(
              w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("decile",
                      F.least(F.ceil(F.col("_cum") * buckets
                                     / F.col("_total")),
                              F.lit(buckets)).cast("int")))
    return (vd.groupBy("decile")
            .agg(F.sum("n_users_v").alias("n_users"),
                 F.min("n_events").alias("min_events"),
                 F.max("n_events").alias("max_events"),
                 F.sum(F.col("n_events") * F.col("n_users_v"))
                  .alias("total_events")))


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention triangle: users grouped by first-activity week
    (cohort), counted by how many weeks later they were active.

    Two aggregations over the (user, week) grain — the corpus collapses
    to at most |users|×|weeks| rows after the first map-side-combined
    distinct, so the triangle costs nothing at any scale.
    """
    uw = (events.select("user_id",
                        F.date_trunc("week", "ts").alias("week"))
          .distinct())
    first = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (uw.join(first, on="user_id")
            .withColumn("weeks_later",
                        F.datediff(F.col("week"), F.col("cohort_week"))
                        .cast("int") / 7)
            .withColumn("weeks_later", F.col("weeks_later").cast("int"))
            .groupBy("cohort_week", "weeks_later")
            .agg(F.count_distinct("user_id").alias("n_users")))


def hourly_rollup_gapfilled(events: DataFrame,
                            fill: str = "zero") -> DataFrame:
    """Gap-filled hourly rollup: a complete hour spine per event_type
    (min..max observed hour) left-joined against the rollup, so
    downstream time-series consumers (anomaly windows, charting,
    forecasting) see EVERY hour — silent gaps in a rolling-window
    calculation silently shrink the window.

    fill='zero'  → absent hours get n_events=0, sum_value=0.0 (counts
                   semantics: nothing happened);
    fill='ffill' → absent hours carry the last observed values forward
                   (gauge semantics), n_events still reported 0 for the
                   filled rows via n_observed.

    Scale shape: the spine is bounded by types × hours (metadata-sized
    next to the event stream), the rollup is already aggregated before
    the join, and the forward-fill window partitions by event_type —
    no global window, no second pass over raw events."""
    from pyspark.sql import Window

    r = hourly_rollup(events)
    spine = (r.groupBy("event_type")
              .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
              .select("event_type",
                      F.explode(F.sequence(
                          "lo", "hi",
                          F.expr("INTERVAL 1 HOUR"))).alias("hour")))
    out = spine.join(r, ["event_type", "hour"], "left")
    if fill == "zero":
        return (out.select("event_type", "hour",
                           F.coalesce("n_events", F.lit(0))
                            .alias("n_events"),
                           F.coalesce("sum_value", F.lit(0.0))
                            .alias("sum_value")))
    if fill == "ffill":
        w = (Window.partitionBy("event_type").orderBy("hour")
             .rowsBetween(Window.unboundedPreceding, 0))
        return (out.select(
            "event_type", "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_observed"),
            F.last("n_events", ignorenulls=True).over(w).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w)
             .alias("sum_value")))
    raise ValueError(f"unknown fill mode {fill!r} (zero|ffill)")


def user_state_history(events: DataFrame,
                       state_col: str = "event_type") -> DataFrame:
    """SCD-2-shaped state history per user: collapse the event stream
    into one row per RUN of consecutive equal ``state_col`` values,
    with the run's validity range and event count — the
    slowly-changing-dimension build (valid_from / valid_to per state
    run) applied to an event stream.  The final open run carries
    valid_to = the user's last event time.

    lag → change flag → running sum = run id, then one groupBy — the
    same deterministic lag+cumsum shape as ``sessionize``, one shuffle
    on user_id, ties broken by event_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col)), 1).otherwise(0)
    run = (events
           .withColumn("_chg", changed)
           .withColumn("_run", F.sum("_chg").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (run.groupBy("user_id", "_run")
            .agg(F.min(state_col).alias("state"),   # all equal within a run
                 F.min("ts").alias("valid_from"),
                 F.max("ts").alias("valid_to"),
                 F.count(F.lit(1)).alias("n_events"))
            .withColumnRenamed("_run", "run_id"))


def rfm_segments(events: DataFrame, n_bins: int = 5) -> DataFrame:
    """RFM segmentation: per-user recency (days since the corpus' last
    event), frequency (event count), monetary (value sum), each scored
    into ``n_bins`` NTILE buckets — the classic OLAP customer-value
    rollup.  Ordering carries a user_id tiebreak so the binning is a
    total order and reproduces bit-for-bit on any engine.

    Scale shape (r11, VERDICT r10 #2): users scale WITH events (100 TB
    of events ⇒ 10⁸+ users), so the per-user table gets no global
    window.  Each dimension's exact 1-based rank comes from the keyed
    two-phase prefix COUNT (``operators.prefix.running_total`` with an
    order-aligned value-range bucket — the distributed-ranking
    primitive events_value_exact_ranks uses), and the NTILE bucket is
    then pure arithmetic on (rank, n_users): with q = N div n and
    rem = N % n, SQL NTILE gives the first ``rem`` buckets q+1 rows —
    bucket(r) = ceil(r/(q+1)) for r ≤ rem·(q+1), else
    rem + ceil((r−rem·(q+1))/q).  All-integer, identical to the
    oracle's ``ntile(n) OVER (ORDER BY ..., user_id)``.  The only
    serial steps are the |buckets|-row carry windows; the user count
    joins in as a broadcast scalar.

    NULL / magnitude contract (ADVICE r11): a user whose every
    ``value`` is NULL has NULL monetary; SQL's ``ORDER BY monetary
    DESC`` puts NULLs LAST, so ``_negm`` coalesces to a +inf sentinel
    (a bare ascending negation would sort them FIRST — Spark asc =
    nulls first).  The monetary ordering key round-trips through
    DECIMAL(18,4)·10⁴ → long, i.e. it quantizes at 10⁻⁴: two users
    whose monetary sums differ by less than 0.0001 tie on the key
    (user_id breaks the tie) even where raw double ordering would
    distinguish them, and |monetary| must stay under DECIMAL(18,4)'s
    ~10¹⁴ bound — both inherited from the engine-wide exact-decimal
    aggregation convention, not new here."""
    from pyspark import StorageLevel

    from ..operators import prefix as P

    # The plan is diamond-shaped: the per-user rollup feeds the main
    # chain PLUS the three bucket-total branches, the reference
    # timestamp, and the user count — and column pruning specializes
    # each branch's partial aggregate, so ReuseExchange cannot dedup
    # them.  Persisting the rollup (dimension-sized: one slim row per
    # user) pins the EVENT-scale aggregation to exactly one pass;
    # tracked for bulk release by long-lived hosts (ADVICE r11).
    from ..session import track_persist
    per_user = track_persist(
        events.groupBy("user_id")
              .agg(F.max("ts").alias("last_ts"),
                   F.count(F.lit(1)).alias("frequency"),
                   F.sum(F.col("value").cast("decimal(18,4)"))
                    .cast("double").alias("monetary")),
        StorageLevel.MEMORY_AND_DISK)
    # corpus reference time == max per-user last_ts: derived from the
    # persisted rollup, not a second scan of raw events
    ref = per_user.agg(F.max("last_ts").alias("_ref_ts"))
    scored = (per_user.crossJoin(F.broadcast(ref))
              .withColumn("recency_days",
                          F.datediff("_ref_ts", "last_ts"))
              .drop("_ref_ts")
              .withColumn("_one", F.lit(1))
              # order keys as integers, ascending == the NTILE order:
              # recency asc; frequency/monetary DESC via negation
              # (monetary is decimal(18,4)-exact, so ×10000 is integral)
              .withColumn("_negf", -F.col("frequency"))
              # NULL monetary (user with only NULL values) sorts LAST
              # like SQL's DESC NULLS LAST — the sentinel is above any
              # real key (|monetary| < 10¹⁴ ⇒ |_negm| < 2⁶⁰ < 2⁶²)
              .withColumn("_negm",
                          F.coalesce(
                              -(F.col("monetary").cast("decimal(18,4)")
                                * 10000).cast("long"),
                              F.lit(2 ** 62)))
              # order-aligned range buckets (carry windows span
              # |value range / bucket width| rows, never |users|)
              .withColumn("_rfmb_r", F.col("recency_days"))
              .withColumn("_rfmb_f", F.expr("_negf div 100"))
              .withColumn("_rfmb_m", F.expr("_negm div 1000000")))
    ranked = scored
    for b, order in (("_rfmb_r", ["recency_days", "user_id"]),
                     ("_rfmb_f", ["_negf", "user_id"]),
                     ("_rfmb_m", ["_negm", "user_id"])):
        ranked = P.running_total(ranked, b, order, "_one",
                                 out_col=f"_rnk{b[-2:]}")
    tot = per_user.agg(F.count(F.lit(1)).alias("_n_total"))

    def ntile_of(rank_col: str):
        # SQL NTILE from exact rank, all-integer (ceil(a/b) as
        # (a + b - 1) div b); greatest(q, 1) guards N < n_bins (q = 0,
        # where every rank lands in the first branch anyway)
        n = int(n_bins)
        q = f"(_n_total div {n})"
        rem = f"(_n_total % {n})"
        big = f"({rem} * ({q} + 1))"
        return F.expr(
            f"CAST(CASE WHEN {rank_col} <= {big} "
            f"THEN ({rank_col} + {q}) div ({q} + 1) "
            f"ELSE {rem} + ({rank_col} - {big} + greatest({q}, 1) - 1) "
            f"div greatest({q}, 1) END AS INT)")

    return (ranked.crossJoin(F.broadcast(tot))
            .withColumn("r_score", ntile_of("_rnk_r"))
            .withColumn("f_score", ntile_of("_rnk_f"))
            .withColumn("m_score", ntile_of("_rnk_m"))
            .withColumn("segment",
                        F.concat_ws("-", "r_score", "f_score", "m_score"))
            .select("user_id", "recency_days", "frequency",
                    F.round("monetary", 4).alias("monetary"),
                    "r_score", "f_score", "m_score", "segment"))


def type_cooccurrence_lift(events: DataFrame) -> DataFrame:
    """Event-type co-occurrence lift: for each unordered type pair, how
    much more often users do BOTH than independence predicts —
    ``lift = P(a,b) / (P(a) P(b))`` over the user population, reported
    in exact integer milli-units so external oracles match
    bit-for-bit.

    Scale shape: the stream collapses to DISTINCT (user, type) first
    (bounded by users × type-vocabulary), the pair join is per-user
    (each user contributes |types|² pairs with a small type
    vocabulary), and the population size joins as a broadcast scalar.
    No event-scale self-join anywhere."""
    ut = events.select("user_id", "event_type").distinct()
    n_users = ut.select(F.count_distinct("user_id").alias("n_users"))
    per_type = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    pair_counts = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                          & (F.col("a.event_type") < F.col("b.event_type")))
                   .groupBy(F.col("a.event_type").alias("type_a"),
                            F.col("b.event_type").alias("type_b"))
                   .agg(F.count(F.lit(1)).alias("n_both")))
    return (pair_counts
            .join(F.broadcast(per_type
                              .withColumnRenamed("event_type", "type_a")
                              .withColumnRenamed("n", "n_a")), "type_a")
            .join(F.broadcast(per_type
                              .withColumnRenamed("event_type", "type_b")
                              .withColumnRenamed("n", "n_b")), "type_b")
            .crossJoin(F.broadcast(n_users))
            .withColumn("lift_milli",
                        F.expr("CAST((n_both * n_users * 1000) "
                               "DIV (n_a * n_b) AS BIGINT)"))
            .select("type_a", "type_b", "n_both", "n_a", "n_b",
                    "lift_milli"))


def type_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transitions of event types per user sequence:
    P(next = b | current = a) in exact integer milli-units, plus the
    raw transition counts — the sequence-model sanity check (and the
    input a next-event recommender baselines against).

    lag window per user (one shuffle, event-scale but narrow columns),
    then a types² aggregation — output bounded by the type vocabulary
    squared."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (events
             .withColumn("next_type", F.lead("event_type").over(w))
             .filter(F.col("next_type").isNotNull())
             .select(F.col("event_type").alias("type_from"),
                     F.col("next_type").alias("type_to")))
    counts = steps.groupBy("type_from", "type_to").agg(
        F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("type_from").agg(F.sum("n").alias("n_from"))
    return (counts.join(F.broadcast(totals), "type_from")
            .withColumn("p_milli",
                        F.expr("CAST((n * 1000) DIV n_from AS BIGINT)"))
            .select("type_from", "type_to", "n", "n_from", "p_milli"))


def first_touch_attribution(events: DataFrame, touch: str = "click",
                            convert: str = "purchase") -> DataFrame:
    """First-touch attribution: each conversion is credited to the
    EARLIEST touch event since the user's previous conversion (the
    complement of the as-of join's last-touch model).  Epoch = running
    count of PRIOR conversions per user, so every touch shares the
    epoch of the conversion that closes it; one window pass + one
    epoch-level aggregation + a join of two conversion-scale tables —
    never an event-scale self-join."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior_conv = F.coalesce(
        F.sum((F.col("event_type") == convert).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
    epoched = events.withColumn("_epoch", prior_conv)
    firsts = (epoched.filter(F.col("event_type") == touch)
              .groupBy("user_id", "_epoch")
              .agg(F.min("ts").alias("first_touch_ts")))
    convs = (epoched.filter(F.col("event_type") == convert)
             .select("event_id", "user_id", "ts", "_epoch",
                     F.col("value").alias("conversion_value")))
    return (convs.join(firsts, ["user_id", "_epoch"], "left")
            .select("event_id", "user_id", "ts", "conversion_value",
                    "first_touch_ts"))


def linear_attribution(events: DataFrame, touch: str = "click",
                       convert: str = "purchase") -> DataFrame:
    """Linear (equal-credit) attribution: every touch since the user's
    previous conversion shares the closing conversion's credit
    equally — the third of the standard trio next to last-touch
    (as-of join) and first-touch.  One row per (conversion, touch)
    with weight_milli = 1000 DIV n_touches (floor semantics: 3 touches
    get 333 each; callers needing the remainder assign it to a
    designated touch).  Same epoch construction as first-touch; the
    credit join matches conversion-scale to touch-scale tables on
    (user, epoch)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior_conv = F.coalesce(
        F.sum((F.col("event_type") == convert).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
    epoched = events.withColumn("_epoch", prior_conv)
    touches = (epoched.filter(F.col("event_type") == touch)
               .select("user_id", "_epoch",
                       F.col("event_id").alias("touch_event_id"),
                       F.col("ts").alias("touch_ts")))
    n_touches = touches.groupBy("user_id", "_epoch").agg(
        F.count(F.lit(1)).alias("n_touches"))
    convs = (epoched.filter(F.col("event_type") == convert)
             .select(F.col("event_id").alias("conversion_event_id"),
                     "user_id", "_epoch",
                     F.col("value").alias("conversion_value")))
    return (convs.join(n_touches, ["user_id", "_epoch"])
            .join(touches, ["user_id", "_epoch"])
            .withColumn("weight_milli",
                        F.expr("CAST(1000 DIV n_touches AS BIGINT)"))
            .select("conversion_event_id", "user_id", "touch_event_id",
                    "touch_ts", "n_touches", "weight_milli",
                    "conversion_value"))


def silence_report(events: DataFrame,
                   min_gap_hours: int = 6) -> DataFrame:
    """Ops diagnostic: intervals where an event type went SILENT —
    consecutive active hours more than ``min_gap_hours`` apart.  A
    pipeline that stops emitting shows up here before any dashboard
    notices the flat line.  Works off the hourly rollup (already
    aggregated), so the lag window shuffles type×hour rows, never raw
    events."""
    hours = hourly_rollup(events).select("event_type", "hour")
    w = Window.partitionBy("event_type").orderBy("hour")
    prev = F.lag("hour").over(w)
    gap_h = (F.unix_timestamp("hour") - F.unix_timestamp(prev)) / 3600
    return (hours
            .withColumn("silent_from", prev)
            .withColumn("gap_hours", gap_h.cast("int"))
            .filter(F.col("gap_hours") > min_gap_hours)
            .select("event_type", "silent_from",
                    F.col("hour").alias("resumed_at"), "gap_hours"))


def key_skew_report(events: DataFrame, key_col: str = "user_id",
                    top_n: int = 5) -> DataFrame:
    """Pre-join skew diagnostic for a key column: the top-N heaviest
    keys with their share of rows in exact integer milli-units — the
    number that decides between a plain shuffle join, AQE skew
    handling, or the salting helpers in operators/skew.py.  One
    map-side-combinable count per key, then a top-N over the key table
    (TakeOrderedAndProject) with the total joined as a broadcast
    scalar."""
    per_key = events.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    total = events.agg(F.count(F.lit(1)).alias("n_total"))
    # orderBy+limit FIRST (TakeOrderedAndProject over the key table —
    # no global sort, no global window); the rank window then runs on
    # top_n rows only
    top = per_key.orderBy(F.desc("n"), F.asc(key_col)).limit(top_n)
    w = Window.orderBy(F.desc("n"), F.asc(key_col))
    return (top.crossJoin(F.broadcast(total))
            .withColumn("rank", F.row_number().over(w))
            .withColumn("share_milli",
                        F.expr("CAST((n * 1000) DIV n_total AS BIGINT)"))
            .select("rank", F.col(key_col).alias("key"), "n", "n_total",
                    "share_milli"))


# ---- streaming drift monitor (stream rollup + static baseline) ------------

def streaming_daily_type_counts(spark: SparkSession, source_dir: str,
                                schema, watermark: str = "2 hours",
                                glob: str | None = None) -> DataFrame:
    """The STREAMING half of the drift monitor: watermarked daily
    tumbling-window counts per event type — one legal streaming
    aggregation, append-capable, state bounded by open windows x type
    vocabulary.  Drift scoring is a BATCH view over this rollup
    (``type_drift_vs_baseline``): chaining a second aggregation inside
    the stream is not append-mode-expressible, and the monitor read
    path wants the rollup table anyway."""
    stream = event_stream(spark, source_dir, schema, glob)
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").cast("date").alias("day"),
                    "event_type", "n"))


def type_drift_vs_baseline(day_counts: DataFrame, baseline: DataFrame,
                           alert_milli: int = 100) -> DataFrame:
    """Per-day total-variation distance of the event-type mix against a
    STATIC baseline distribution, exact integer milli-units, plus the
    alert flag — the ingestion-quality monitor read over the streamed
    rollup.  ``baseline`` is (event_type, n) from a reference period;
    types absent on either side count fully toward the distance (the
    complete grid is days x baseline-union-observed types, built from
    two BOUNDED dimension tables, never from raw events).

    tv_milli = 500 * Σ_t |c_t·B − b_t·C_day| // (C_day·B) over the
    UNION of types, computed in one pass with the missing-mass
    identity (types in the baseline but absent from the day
    contribute (B − Σ_{t∈day} b_t)·C_day — the same completion trick
    as ``text.source_tv_distance``), so the day-counts table is read
    ONCE: no day×type grid, no self-join — which also matters
    mechanically, because the day counts arrive as a streaming memory
    sink and Spark's attribute dedup cannot resolve that relation on
    both sides of a join.  Cross-multiplied integers throughout —
    no floating point, so any engine agrees bit-for-bit."""
    base = baseline.select(F.col("event_type").alias("_t"),
                           F.col("n").cast("bigint").alias("b"))
    b_tot = base.agg(F.sum("b").cast("bigint").alias("b_total"))
    wday = Window.partitionBy("day")
    j = (day_counts
         .select("day", F.col("event_type").alias("_t"),
                 F.col("n").cast("bigint").alias("c"))
         .withColumn("c_total", F.sum("c").over(wday))
         .join(F.broadcast(base), "_t", "left")
         .crossJoin(F.broadcast(b_tot))
         .select("day", "c_total", "b_total", "c",
                 F.coalesce("b", F.lit(0)).alias("b")))
    return (j.groupBy("day")
            .agg(F.first("c_total").alias("n_events"),
                 F.sum(F.abs(F.col("c") * F.col("b_total")
                             - F.col("b") * F.col("c_total")))
                  .alias("_num_observed"),
                 F.sum("b").alias("_b_covered"),
                 F.first("b_total").alias("_bt"),
                 F.first(F.col("c_total") * F.col("b_total"))
                  .alias("_den"))
            .select("day", F.col("n_events").cast("bigint").alias("n_events"),
                    (F.col("_num_observed")
                     + (F.col("_bt") - F.col("_b_covered"))
                     * F.col("n_events")).alias("_num"),
                    "_den")
            .select("day", "n_events",
                    F.expr("CAST((500 * _num) DIV _den AS BIGINT)")
                     .alias("tv_milli"))
            .withColumn("alert",
                        (F.col("tv_milli") >= alert_milli)))


def replay_type_drift(spark: SparkSession, source_dir: str, schema,
                      baseline: DataFrame, alert_milli: int = 100,
                      glob: str = "events.parquet") -> DataFrame:
    """Bounded availableNow replay of the daily rollup, then the batch
    drift scoring over the drained table — equals computing the same
    thing from the batch events table, so one SQL oracle covers it."""
    counts = streaming_daily_type_counts(spark, source_dir, schema,
                                         glob=glob)
    drained = drain_stream_to_table(spark, counts, "drift_daily_counts")
    return type_drift_vs_baseline(drained, baseline, alert_milli)


def hourly_moving_avg(events: DataFrame, window_rows: int = 7) -> DataFrame:
    """Trailing moving average over the hourly rollup, per event type —
    the standard dashboard smoothing for metered streams (pairs with
    hourly_anomalies' robust z-scores; this is the presentation-grade
    trend line).  ``window_rows`` trailing hours (ragged at the series
    head: early rows average over however many hours exist, the usual
    plotting convention).

    Exactness discipline: the window carries the exact integer /
    DECIMAL(18,4) SUMs and divides ONCE at the end by the window row
    count — a single IEEE division on identical operands, so any SQL
    engine reproduces the doubles bit-for-bit (a naive AVG() would
    expose each engine's summation order).

    Scale shape: input is the already-aggregated hourly table (hours x
    types rows, tiny vs raw events); one type-keyed window, no second
    scan of the corpus."""
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1: {window_rows}")
    base = hourly_rollup(events)
    w = (Window.partitionBy("event_type").orderBy("hour")
         .rowsBetween(-(window_rows - 1), Window.currentRow))
    n_w = F.count(F.lit(1)).over(w).cast("double")
    return base.select(
        "hour", "event_type", "n_events",
        (F.sum("n_events").over(w).cast("double") / n_w)
        .alias("ma_events"),
        (F.sum(F.col("sum_value").cast("decimal(18,4)")).over(w)
         .cast("double") / n_w).alias("ma_value"))
