"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 4 as ``hll_sketch_agg`` / ``hll_union_agg``).

Why sketches at 100 TB: an exact COUNT(DISTINCT user) over a year of
events re-shuffles the raw key space every time the question is asked.
A partial HLL sketch per (coarse grain, e.g. hour) is a few KB of
mergeable state: rolling it up to day/month/all-time is a union of
sketches — no second pass over raw data, no key shuffle, bounded error
(~1% at lg_k=12).  This is the same partial-state discipline the
streaming rollups use, applied to cardinality.

All three operators are plain DataFrame aggregations — map-side
combined, one shuffle on the group keys.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 lg_k: int = 12) -> DataFrame:
    """Estimated distinct ``value_col`` per group, single pass."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(
                F.hll_sketch_agg(value_col, F.lit(lg_k)))
                .alias("n_distinct_est")))


def hll_partial(df: DataFrame, group_cols: list[str], value_col: str,
                lg_k: int = 12) -> DataFrame:
    """Mergeable binary sketch per group — the state to persist at the
    finest rollup grain (hour/shard); a few KB per group."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")))


def hll_rollup(partials: DataFrame, group_cols: list[str],
               sketch_col: str = "hll") -> DataFrame:
    """Union fine-grain partial sketches up to a coarser grain and
    estimate — answers 'distinct over any window' from persisted
    state without touching raw data."""
    return (partials.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(F.hll_union_agg(sketch_col))
                 .alias("n_distinct_est")))
