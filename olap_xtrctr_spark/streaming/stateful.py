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
    from ..session import ensure_nanos_conf, normalize_event_ts
    ensure_nanos_conf(spark)
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    stream = normalize_event_ts(reader.parquet(source_dir))
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
