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
    schema evolution is a different check (`operators/expectations`)."""
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c not in key_cols and c in new.columns]
    missing = [c for c in key_cols + compare_cols
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns {missing} not present in both "
                         f"snapshots")
    o = old.select(*key_cols,
                   _row_fingerprint(compare_cols).alias("_fp_old"))
    n = new.select(*key_cols,
                   _row_fingerprint(compare_cols).alias("_fp_new"))
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
