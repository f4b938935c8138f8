"""Table-maintenance operators: the data-layout work a 100 TB lake
needs between queries.

Small files are the classic silent killer of scan throughput: a day of
streaming micro-batches leaves thousands of KB-sized parquet files, and
every downstream scan pays an open/footer-parse per file plus a task
per split.  Compaction rewrites a directory to files near a target
size; the target trades scan parallelism (more files) against per-file
overhead (fewer), with 128 MB the common lake default.
"""
from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def parquet_dir_stats(path: str) -> dict:
    """File count / byte totals for a parquet directory (driver-side
    metadata listing — bounded by file COUNT, never data volume; a
    real lake swaps os.walk for the Hadoop FileSystem listing API)."""
    n_files = 0
    total_bytes = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                total_bytes += os.path.getsize(os.path.join(root, f))
    return {"n_files": n_files, "total_bytes": total_bytes}


def _rewrite(spark: SparkSession, src_dir: str, dst_dir: str,
             transform, target_mb: int) -> dict:
    """Shared measure → size → rewrite → report scaffold for the
    maintenance rewrites.  Refuses dst == src: Spark's overwrite deletes
    the destination at job start while the lazy read still points at
    those files — an in-place call would truncate the source BEFORE
    failing.  The write-new/verify/rename discipline is enforced, not
    just documented."""
    src, dst = os.path.realpath(src_dir), os.path.realpath(dst_dir)
    # also reject nesting either way: a dst inside src pollutes the
    # source directory (parquet_dir_stats would double-count and later
    # src reads see duplicated rows); a src inside dst gets deleted by
    # the overwrite's directory cleanup
    if src == dst or os.path.commonpath([src, dst]) in (src, dst):
        raise ValueError("dst_dir must be disjoint from src_dir (not "
                         "equal or nested): in-place or nested overwrite "
                         "corrupts the source; write to a separate "
                         "directory, verify, then rename")
    before = parquet_dir_stats(src_dir)
    if before["n_files"] == 0:
        raise ValueError(f"no parquet files under {src_dir}")
    n_out = max(1, math.ceil(before["total_bytes"]
                             / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    transform(df, n_out).write.mode("overwrite").parquet(dst_dir)
    after = parquet_dir_stats(dst_dir)
    return {"files_before": before["n_files"],
            "files_after": after["n_files"],
            "bytes_before": before["total_bytes"],
            "bytes_after": after["total_bytes"],
            "target_files": n_out}


def cluster_parquet(spark: SparkSession, src_dir: str, dst_dir: str,
                    cluster_cols: list[str],
                    target_mb: int = 128) -> dict:
    """Rewrite ``src_dir`` CLUSTERED on ``cluster_cols``:
    ``repartitionByRange`` assigns disjoint key ranges to output files
    and ``sortWithinPartitions`` orders rows inside each, so every
    file's parquet row-group min/max stats cover a narrow key range.
    Downstream scans filtering on those columns then skip whole files/
    row groups from footer metadata alone — the poor man's Z-order,
    and the single biggest scan win on a time- or key-filtered lake
    (predicate pushdown can only prune what the layout separates).

    Range boundaries come from Spark's reservoir sampling of the keys,
    so skewed keys still yield balanced files.  File count derives from
    measured input bytes like ``compact_parquet``.  Returns the same
    before/after stats."""
    return _rewrite(
        spark, src_dir, dst_dir,
        lambda df, n: (df.repartitionByRange(n, *cluster_cols)
                         .sortWithinPartitions(*cluster_cols)),
        target_mb)


def compact_parquet(spark: SparkSession, src_dir: str, dst_dir: str,
                    target_mb: int = 128) -> dict:
    """Rewrite ``src_dir`` into ``dst_dir`` with files sized near
    ``target_mb``.  The output file count comes from the MEASURED input
    bytes (ceil(total / target)), not a guessed partition number, so
    the same call is right for a 10 MB test directory and a 10 TB
    partition.  The rewrite itself is one narrow repartition job —
    round-robin, no keys — and the source is left untouched (callers
    swap directories atomically after validation, the
    write-new/verify/rename discipline every lake compactor uses).

    Returns before/after stats for that validation step.
    """
    return _rewrite(spark, src_dir, dst_dir,
                    lambda df, n: df.repartition(n), target_mb)
