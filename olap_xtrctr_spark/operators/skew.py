"""Skew-mitigation aggregation patterns for 100-TB fact tables.

Spark's hash aggregate already does map-side partial aggregation, which
absorbs most key skew for algebraic aggregates (SUM/COUNT/MIN/MAX).  The
two places partial aggregation does NOT save you, and the patterns here
do:

* ``count_distinct_skew_safe`` — exact COUNT(DISTINCT x) shuffles every
  (key, x) pair to the key's single reducer.  A hot key therefore lands
  its entire distinct set on one task.  Two-phase form: dedup on
  (key, x) FIRST (the shuffle spreads by x too, so the hot key fans out
  across reducers), then count per key — each shuffle is skew-free.
* ``salted_sum`` — explicit salt → partial agg per (key, salt) →
  final agg per key.  Only needed when the aggregation buffer itself is
  the bottleneck (e.g. collect-style aggs); provided as the documented
  escape hatch, with AQE skew-join splitting covering the join side.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_distinct_skew_safe(df: DataFrame, keys: list[str],
                             col: str, out_name: str = "n_distinct",
                             ) -> DataFrame:
    """Exact per-key distinct count via dedup-then-count: both shuffles
    partition on (keys + col) and keys respectively, neither collects a
    hot key's whole distinct set in one task."""
    return (df.select(*keys, col)
              .dropDuplicates(keys + [col])
              .groupBy(*keys)
              .agg(F.count(F.lit(1)).alias(out_name)))


def salted_sum(df: DataFrame, keys: list[str], value_col: str,
               salt_buckets: int = 16, out_name: str = "sum_value",
               ) -> DataFrame:
    """SUM per key in two stages: (key, salt) partials then key totals.
    The salt is a deterministic hash of the whole row's value column so
    re-runs produce identical partials (no rand()); DECIMAL arithmetic
    keeps the two-stage total bit-identical to the one-stage one."""
    salt = F.pmod(F.xxhash64(F.col(value_col).cast("string")),
                  F.lit(salt_buckets)).alias("_salt")
    partial = (df.select(*keys, F.col(value_col), salt)
                 .groupBy(*keys, "_salt")
                 .agg(F.sum(F.col(value_col).cast("decimal(18,4)"))
                       .alias("_partial")))
    return (partial.groupBy(*keys)
                   .agg(F.sum("_partial").cast("double").alias(out_name)))
