"""Data-contract checks for large-scale ingest (great-expectations-style,
engine-native).

One call = ONE pass over the data: every rule compiles to a conditional
sum inside a single aggregate projection (map-side combined; only the
per-partition partials — one row each — ever move), then the single
summary row is unpivoted to (rule, n_rows, n_violations).  No joins, no
per-rule scans: checking 50 rules on 100 TB costs the same scan as
checking one.

Rules are boolean Columns where TRUE means the row PASSES; NULL counts
as a violation (a null n_chars fails a range check rather than slipping
through three-valued logic).  Uniqueness is not a row predicate — use
``dedup.exact_dup_groups`` / ``keep_first`` for key-level contracts.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def non_empty(col: str) -> Column:
    return F.col(col).isNotNull() & (F.length(col) > 0)


def in_range(col: str, lo, hi) -> Column:
    """Closed range [lo, hi]."""
    return (F.col(col) >= lo) & (F.col(col) <= hi)


def isin(col: str, values: list) -> Column:
    return F.col(col).isin(values)


def matches(col: str, pattern: str) -> Column:
    return F.col(col).rlike(pattern)


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate every rule in one aggregate pass; returns one row per
    rule: (rule, n_rows, n_violations)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for name, passes in rules.items():
        aggs.append(F.sum(F.when(passes.eqNullSafe(True), 0).otherwise(1))
                    .cast("bigint").alias(name))
    one = df.agg(*aggs)
    pairs = ", ".join(f"'{k}', `{k}`" for k in rules)
    return one.select(
        F.expr(f"stack({len(rules)}, {pairs}) AS (rule, n_violations)"),
        F.col("_n_rows").cast("bigint").alias("n_rows"),
    ).select("rule", "n_rows", "n_violations")


def violations(df: DataFrame, rules: dict[str, Column],
               limit: int = 1000) -> DataFrame:
    """The offending rows themselves (capped — this is a debugging
    surface, not an export path), tagged with the rules they fail."""
    fails = F.array_compact(F.array(*[
        F.when(~passes.eqNullSafe(True), F.lit(name))
        for name, passes in rules.items()]))
    return (df.withColumn("failed_rules", fails)
            .filter(F.size("failed_rules") > 0)
            .limit(limit))
