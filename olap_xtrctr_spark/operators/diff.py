"""Snapshot diff: dataset-version auditing between two corpus versions.

A training-data pipeline republishes its corpus every refresh; before a
new snapshot replaces the old one, the operator answering "what
actually changed?" is the difference between a safe promotion and a
silent 30%-of-rows regression.  ``snapshot_diff`` classifies every key
as added / removed / changed / unchanged by comparing value
FINGERPRINTS (one md5 over the null-marked compare columns), so the
full-outer join that computes the diff carries one slim (key, hash)
projection per side — never the row payloads.

Scale shape: one key shuffle per side into the full-outer join (AQE
broadcasts genuinely small sides); the fingerprint is a JVM expression
computed BEFORE the exchange, so text/blob columns are projection-
pruned and never cross the wire.  Both sides bucketed on the key makes
the steady-state diff exchange-free (`sources/bucketing.py`).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# unit separator / NUL as field separator and null marker: cheap,
# unambiguous for the fingerprint (a raw concat would collide
# ("ab","c") with ("a","bc"); a skipped NULL would collide with "")
_SEP, _NUL = "\x1f", "\x00"


def _row_fingerprint(cols: list[str]):
    return F.md5(F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NUL))
                for c in cols]))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Row-level diff: (key_cols..., status) for every key present in
    either snapshot, status in {added, removed, changed, unchanged}
    (added = only in ``new``).  ``compare_cols`` defaults to every
    shared non-key column; columns only one side has are ignored —
    schema evolution is a different check (`operators/expectations`).

    Keys need NOT be unique: each side collapses to ONE fingerprint
    per key (md5 over the sorted multiset of row fingerprints), so a
    key with duplicate rows compares as a multiset instead of fanning
    out through the full-outer join and silently inflating
    ``snapshot_diff_summary`` counts (the promotion gate).  For unique
    keys this is bit-identical to comparing the row fingerprints
    directly."""
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c not in key_cols and c in new.columns]
    missing = [c for c in key_cols + compare_cols
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns {missing} not present in both "
                         f"snapshots")

    def keyed_fp(df: DataFrame, alias: str) -> DataFrame:
        return (df.select(*key_cols,
                          _row_fingerprint(compare_cols).alias("_rfp"))
                  .groupBy(*key_cols)
                  .agg(F.md5(F.concat_ws(
                      ",", F.sort_array(F.collect_list("_rfp"))))
                        .alias(alias)))

    o = keyed_fp(old, "_fp_old")
    n = keyed_fp(new, "_fp_new")
    j = o.join(n, key_cols, "full_outer")
    status = (F.when(F.col("_fp_old").isNull(), "added")
               .when(F.col("_fp_new").isNull(), "removed")
               .when(F.col("_fp_old") != F.col("_fp_new"), "changed")
               .otherwise("unchanged"))
    return j.select(*key_cols, status.alias("status"))


def snapshot_diff_summary(old: DataFrame, new: DataFrame,
                          key_cols: list[str],
                          compare_cols: list[str] | None = None
                          ) -> DataFrame:
    """The four-row promotion-gate summary: exact row counts per diff
    status.  A release check asserts on these (e.g. changed+removed
    below a threshold) before swapping snapshot directories."""
    return (snapshot_diff(old, new, key_cols, compare_cols)
            .groupBy("status").agg(F.count(F.lit(1)).alias("n_rows")))


def categorical_tv_distance(df: DataFrame, group_col: str,
                            cat_col: str) -> DataFrame:
    """Distribution drift per group over an arbitrary categorical
    column: the total-variation distance between each group's category
    distribution and the global one — ``text.source_tv_distance``
    generalized past tokenized text (there the categories are tokens;
    here they are whatever ``cat_col`` holds: event types, labels,
    languages).  Grouped by day it is the drift monitor that catches a
    mix shift (a producer going quiet, a new event type ramping)
    before downstream models notice.

    Exact cross-multiplied DECIMAL(19,0) arithmetic, including the
    missing-mass term for categories a group never emits; output
    (group_col, n_rows, tv_milli), tv in exact milli-units of [0, 1].

    Scale shape: one (group, category) count, one category-keyed join
    against the global counts, per-group totals and the grand total
    broadcast — state bounded by |groups|·|categories|, never rows.
    """
    per = df.groupBy(group_col, cat_col).agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("c"))
    cat = per.groupBy(cat_col).agg(F.sum("c").alias("ct"))
    grp = per.groupBy(group_col).agg(F.sum("c").alias("ts"))
    tot = grp.agg(F.sum("ts").alias("t"))
    j = (per.join(cat, cat_col)
            .join(F.broadcast(grp), group_col)
            .crossJoin(F.broadcast(tot)))
    agg = j.groupBy(group_col).agg(
        F.sum(F.abs(F.col("c") * F.col("t")
                    - F.col("ct") * F.col("ts"))).alias("abs_part"),
        F.sum("ct").alias("cov"),
        F.first("ts").alias("ts"), F.first("t").alias("t"))
    return agg.select(
        group_col,
        F.col("ts").cast("bigint").alias("n_rows"),
        F.expr("CAST((500 * (abs_part + ts * (t - cov))) DIV (ts * t) "
               "AS BIGINT)").alias("tv_milli"))
