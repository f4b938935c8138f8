"""Versioned parquet snapshots: numbered immutable table versions with
manifest commit markers — the lakehouse-lite "time travel" a corpus
pipeline needs to answer "what exactly did the run three weeks ago
train on?" and to diff/promote dataset versions safely
(``operators/diff.snapshot_diff`` composes over two reads).

Layout:

    table_dir/
      v00001/              parquet data files (written FIRST)
      v00001.manifest.json commit marker (written LAST)
      v00002/ ...

A data directory without its manifest is an UNCOMMITTED crash remnant:
readers ignore it, and the next writer of that version number
overwrites it — the same marker discipline as ``shards.py``.  Versions
are immutable once committed; an update is a new version.  Optimistic
concurrency: ``write_version(expected_parent=n)`` refuses to commit if
someone else committed version n+1 first — the cheap
compare-and-swap that prevents two pipelines from silently forking a
table (files are still written before the check, but never
manifested, so readers are safe either way).

Scale shape: the data write is one Spark job (caller controls
partitioning); manifests are a driver-side file each, listing cost is
bounded by version COUNT.  On a real lake the manifest write becomes a
conditional put — the layout maps 1:1.
"""
from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_VDIR = re.compile(r"^v(\d{5})$")
_VMANIFEST = re.compile(r"^v(\d{5})\.manifest\.json$")
_GC_MARKER = "_gc.json"


class VersionConflict(RuntimeError):
    pass


class VersionGCedError(FileNotFoundError):
    """Time-travel read of a version whose data was removed by a
    retention sweep — loud and precise instead of a raw parquet
    PATH_NOT_FOUND (or, worse, a silently empty frame)."""


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"v{version:05d}.manifest.json")


def _data_dir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"v{version:05d}")


def list_versions(table_dir: str) -> list[dict]:
    """Committed versions, ascending — driven by the MANIFESTS (the
    commit markers), so history stays fully auditable after a
    retention sweep removed old data directories.  Uncommitted data
    dirs (no manifest) are not listed."""
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in sorted(os.listdir(table_dir)):
        m = _VMANIFEST.match(name)
        if not m:
            continue
        with open(os.path.join(table_dir, name)) as fh:
            out.append(json.load(fh))
    return sorted(out, key=lambda d: d["version"])


def latest_version(table_dir: str) -> int | None:
    vs = list_versions(table_dir)
    return vs[-1]["version"] if vs else None


def write_version(df: DataFrame, table_dir: str,
                  expected_parent: int | None = None,
                  extra: dict | None = None) -> dict:
    """Commit ``df`` as the next version.  Returns the manifest dict.

    ``expected_parent``: refuse (VersionConflict) if the latest
    committed version is not exactly this — opt-in optimistic
    concurrency for read-modify-write flows (diff v_n, write v_n+1).
    ``extra``: caller metadata merged into the manifest (e.g. the
    streaming upsert's batch_id idempotence key)."""
    os.makedirs(table_dir, exist_ok=True)
    parent = latest_version(table_dir)
    if expected_parent is not None and parent != expected_parent:
        raise VersionConflict(
            f"expected parent version {expected_parent}, table is at "
            f"{parent}: concurrent writer won — re-read and retry")
    version = (parent or 0) + 1
    data = _data_dir(table_dir, version)
    df.write.mode("overwrite").parquet(data)      # data FIRST
    n_rows = df.sparkSession.read.parquet(data).count()
    import time
    manifest = {"version": version, "parent": parent,
                "n_rows": n_rows, "columns": df.columns,
                "committed_at": time.time(),
                **(extra or {})}
    tmp = _manifest_path(table_dir, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    # Re-CAS immediately before the commit point (same discipline as
    # upsert_batch_bucketed): the slow data write above leaves a wide
    # window in which a concurrent writer may have committed v(n+1);
    # committing our manifest anyway would silently clobber theirs.
    if expected_parent is not None \
            and latest_version(table_dir) != expected_parent:
        os.remove(tmp)
        raise VersionConflict(
            f"expected parent version {expected_parent}, table moved to "
            f"{latest_version(table_dir)} during the data write: "
            f"concurrent writer won — re-read and retry")
    os.replace(tmp, _manifest_path(table_dir, version))  # marker LAST
    return manifest


def read_version(spark: SparkSession, table_dir: str,
                 version: int | None = None,
                 verify_count: bool = False) -> DataFrame:
    """Read a committed version (default: latest).  ``verify_count``
    re-counts the data against the manifest — the reconcile check for
    promotion gates (costs one count job)."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed versions in {table_dir}")
    mp = _manifest_path(table_dir, version)
    if not os.path.exists(mp):
        raise FileNotFoundError(
            f"version {version} is not committed in {table_dir} "
            f"(data without a manifest is a crash remnant)")
    data = _data_dir(table_dir, version)
    if not os.path.isdir(data):
        # manifest exists but data does not: a retention sweep removed
        # it (gc_unreachable keeps manifests for auditability).  Name
        # the sweep precisely when the marker records it.
        gp = os.path.join(table_dir, _GC_MARKER)
        if os.path.exists(gp):
            with open(gp) as fh:
                keep_from = json.load(fh).get("keep_from")
            if keep_from is not None and version < keep_from:
                raise VersionGCedError(
                    f"version {version} of {table_dir} was removed by "
                    f"a retention sweep (keep_from={keep_from}); "
                    f"time travel works for versions >= {keep_from}")
        raise VersionGCedError(
            f"version {version} of {table_dir} is committed but its "
            f"data directory is gone (GC'd or externally deleted)")
    df = spark.read.parquet(data)
    if verify_count:
        with open(mp) as fh:
            manifest = json.load(fh)
        n = df.count()
        if n != manifest["n_rows"]:
            raise ValueError(
                f"version {version} row count {n} != manifest "
                f"{manifest['n_rows']}: data corrupted after commit")
    return df


def version_diff_summary(spark: SparkSession, table_dir: str,
                         v_old: int, v_new: int,
                         key_cols: list[str]) -> DataFrame:
    """added/removed/changed/unchanged counts between two committed
    versions — ``snapshot_diff_summary`` over two reads; the promotion
    gate for replacing v_old with v_new."""
    from ..operators.diff import snapshot_diff_summary
    return snapshot_diff_summary(
        read_version(spark, table_dir, v_old),
        read_version(spark, table_dir, v_new), key_cols)


def version_schema_changes(table_dir: str) -> list[dict]:
    """Column-level schema evolution across the committed chain,
    driver-side from manifests alone (no data reads): one dict per
    consecutive version pair with added/removed column names.  The
    promotion gate's cheap first check — a surprise column drop should
    stop a rollout before anyone pays for the row-level diff."""
    vs = list_versions(table_dir)
    out = []
    for prev, cur in zip(vs, vs[1:]):
        a, b = set(prev["columns"]), set(cur["columns"])
        out.append({"from_version": prev["version"],
                    "to_version": cur["version"],
                    "added": sorted(b - a),
                    "removed": sorted(a - b)})
    return out


def upsert_batch(spark: SparkSession, batch_df: DataFrame,
                 table_dir: str, key_cols: list[str],
                 order_col: str, batch_id: int,
                 delete_col: str | None = None) -> dict | None:
    """Apply ONE micro-batch as a copy-on-write upsert committed as a
    new version, idempotently: a ``batch_id`` already present in the
    committed chain is a redelivery (foreachBatch re-runs after a
    failed epoch) and is skipped — returns None.  Within the batch,
    duplicate keys keep the max-``order_col`` row (deterministic,
    ties broken by the key) so replayed partial inputs converge.

    Survivor rows (current version anti-joined on the batch's keys)
    union the deduped batch = the next version; the manifest carries
    ``batch_id`` as the idempotence key and the write demands the
    observed parent (optimistic concurrency), so two racing appliers
    cannot both commit.

    ``delete_col``: CDC mode — a boolean column on the batch; a key
    whose LATEST batch row has it true is removed from the table
    instead of upserted (the column itself never lands in the data).
    Late non-delete rows behind the tombstone lose by the same
    max-``order_col`` rule that makes replays converge.

    The max-``order_col`` rule holds ACROSS batches, not just within
    one: a batch row (upsert or tombstone) only applies if its
    ``order_col`` is >= the table's current row for that key (ties go
    to the batch, so a replayed delete converges).  Without this, a
    later micro-batch carrying an older row — a file source can split
    one input file's rows across epochs — would regress the table."""
    committed = {m.get("batch_id") for m in list_versions(table_dir)}
    if batch_id in committed:
        return None
    parent = latest_version(table_dir)
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col), *[F.col(c) for c in key_cols])
    deduped = (batch_df.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn"))
    if delete_col is not None:
        deduped = (deduped.withColumn(
            "_del", F.coalesce(F.col(delete_col), F.lit(False)))
            .drop(delete_col))
    else:
        deduped = deduped.withColumn("_del", F.lit(False))
    if parent is None:
        merged = deduped.filter(~F.col("_del")).drop("_del")
    else:
        cur = read_version(spark, table_dir, parent)
        # Cross-batch ordering: keep the batch row only if it beats the
        # table's current row on order_col (slim key+order projection of
        # the table; the batch side stays broadcast-sized, so both joins
        # below broadcast it — no full-table shuffle at scale).
        cur_ord = cur.select(*key_cols,
                             F.col(order_col).alias("_cur_ord"))
        applied = (deduped.join(cur_ord, key_cols, "left")
                   .filter(F.col("_cur_ord").isNull()
                           | (F.col(order_col) >= F.col("_cur_ord")))
                   .drop("_cur_ord"))
        keys = applied.select(*key_cols)      # deletes clear keys too
        merged = cur.join(keys, key_cols, "left_anti") \
                    .unionByName(applied.filter(~F.col("_del"))
                                 .drop("_del"))
    return write_version(merged, table_dir, expected_parent=parent,
                         extra={"batch_id": batch_id})


def stream_upsert_versioned(sdf: DataFrame, table_dir: str,
                            key_cols: list[str], order_col: str,
                            checkpoint_dir: str):
    """Structured-Streaming MERGE into the versioned table: each
    micro-batch commits one new version through ``upsert_batch`` —
    exactly-once BY CONSTRUCTION even on a non-transactional file
    sink, because the epoch's idempotence key (batchId) rides the
    version manifest and redeliveries no-op.  availableNow-capable;
    the checkpoint carries the stream's own progress, the manifest
    chain carries the sink's."""
    spark = sdf.sparkSession

    def apply(batch_df, batch_id):
        upsert_batch(spark, batch_df, table_dir, key_cols, order_col,
                     int(batch_id))

    return (sdf.writeStream
            .foreachBatch(apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def rollback(spark: SparkSession, table_dir: str,
             to_version: int) -> dict:
    """Roll the table back WITHOUT rewriting history: commit a NEW
    version whose data is the old version's — readers at any point see
    a committed chain, past versions stay addressable, and the audit
    trail records the rollback (``rolled_back_from``/``to`` in the
    manifest).  The destructive alternative (deleting newer versions)
    would break concurrent readers mid-query."""
    cur = latest_version(table_dir)
    df = read_version(spark, table_dir, to_version)
    return write_version(df, table_dir, expected_parent=cur,
                         extra={"rolled_back_from": cur,
                                "rolled_back_to": to_version})


# ---- bucketed incremental merge (partition-pruned copy-on-write) ----------

def _bucket_expr(key_cols: list[str], n_buckets: int):
    from pyspark.sql import functions as F
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")


def upsert_batch_bucketed(spark: SparkSession, batch_df: DataFrame,
                          table_dir: str, key_cols: list[str],
                          order_col: str, batch_id: int,
                          n_buckets: int = 16) -> dict | None:
    """``upsert_batch`` with PARTITION-PRUNED copy-on-write: table data
    is hash-bucketed on the key, each version's manifest maps every
    bucket to the DATA PATH holding its current contents (possibly in
    an ancestor version's directory), and an epoch rewrites ONLY the
    buckets its batch touches — per-epoch cost is
    O(touched buckets' data), not O(table), which is what makes the
    merge viable when the keyed table itself is fact-sized.

    MEASURED trade-off (SCALE.md round-6 bucketed-merge probe): the
    pruning factor is ~min(1, epoch_distinct_keys / n_buckets) —
    hash bucketing destroys locality by design, so an epoch whose key
    set is large relative to n_buckets touches every bucket and the
    simple ``upsert_batch`` is strictly better.  Use THIS form when
    small epochs hit a large table (measured 3.5x less data rewritten
    per epoch at 10 keys vs 32 buckets) and size n_buckets well above
    the per-epoch distinct-key count; the win is rewrite VOLUME (the
    object-store bill), not local wall-clock at toy sizes.

    Same contracts as the simple form: batchId idempotence, in-batch
    max-``order_col`` convergence, expected-parent compare-and-swap.
    ``n_buckets`` is fixed at table creation (recorded in the first
    manifest; later calls must match or raise).  Ancestor versions
    stay REFERENCED by newer manifests — deleting an old version
    directory requires a reachability sweep first (the Delta-vacuum
    discipline), which ``gc_unreachable`` implements."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    committed = list_versions(table_dir)
    if batch_id in {m.get("batch_id") for m in committed}:
        return None
    parent_m = committed[-1] if committed else None
    if parent_m is not None and "bucket_data" in parent_m:
        if parent_m["n_buckets"] != n_buckets:
            raise ValueError(
                f"table was created with n_buckets="
                f"{parent_m['n_buckets']}, got {n_buckets}")
    parent = parent_m["version"] if parent_m else None
    version = (parent or 0) + 1

    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col), *[F.col(c) for c in key_cols])
    deduped = (batch_df.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn")
               .withColumn("_bucket", _bucket_expr(key_cols, n_buckets)))
    touched = sorted(r["_bucket"]
                     for r in deduped.select("_bucket").distinct()
                     .collect())                 # bounded by n_buckets
    bucket_data = dict(parent_m.get("bucket_data", {})) if parent_m else {}
    bucket_rows = dict(parent_m.get("bucket_rows", {})) if parent_m else {}

    # survivors come ONLY from the touched buckets' current files
    parent_paths = [os.path.join(table_dir, bucket_data[str(b)])
                    for b in touched if str(b) in bucket_data]
    if parent_paths:
        cur = _read_bucket_paths(spark, parent_paths) \
            .withColumn("_bucket", _bucket_expr(key_cols, n_buckets))
        keys = deduped.select(*key_cols)
        merged = cur.join(keys, key_cols, "left_anti") \
                    .unionByName(deduped)
    else:
        merged = deduped
    vdir_rel = f"v{version:05d}"
    vdir = os.path.join(table_dir, vdir_rel)
    merged.write.mode("overwrite").partitionBy("_bucket").parquet(vdir)

    written = (spark.read.option("basePath", vdir).parquet(vdir)
               .groupBy("_bucket").count().collect())
    for r in written:
        b = str(r["_bucket"])
        bucket_data[b] = f"{vdir_rel}/_bucket={r['_bucket']}"
        bucket_rows[b] = r["count"]
    import time
    manifest = {"version": version, "parent": parent,
                "n_rows": int(sum(bucket_rows.values())),
                "columns": [c for c in batch_df.columns],
                "committed_at": time.time(),
                "batch_id": batch_id, "n_buckets": n_buckets,
                "bucket_data": bucket_data, "bucket_rows": bucket_rows}
    # CAS: someone may have committed while we wrote; data without a
    # manifest is invisible, so losing the race is clean
    if latest_version(table_dir) != parent:
        raise VersionConflict(
            f"version {latest_version(table_dir)} committed while "
            f"writing epoch {batch_id}: retry against the new parent")
    os.makedirs(table_dir, exist_ok=True)
    tmp = _manifest_path(table_dir, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(table_dir, version))
    return manifest


def _read_bucket_paths(spark: SparkSession, paths: list[str]) -> DataFrame:
    """ONE parquet relation over bucket directories that live under
    DIFFERENT version roots.  ``recursiveFileLookup`` disables partition
    discovery (which would otherwise refuse the mixed ``v*/_bucket=*``
    roots), so the n paths become a single multi-path scan node instead
    of an n-way union of separate reads — one plan, one scan, one pass
    of fixed per-read costs (the round-6 probe measured the 32-way
    union's fixed costs eating the bytes win on small tables).  The
    ``_bucket`` partition column is NOT inferred in either shape;
    callers that need it recompute it from the keys."""
    return (spark.read.option("recursiveFileLookup", "true")
            .parquet(*paths))


def read_version_bucketed(spark: SparkSession, table_dir: str,
                          version: int | None = None) -> DataFrame:
    """Assemble a bucketed version from its manifest's bucket → path
    map (paths may live in ancestor version directories — that is the
    point: untouched buckets are never copied)."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed versions in {table_dir}")
    mp = _manifest_path(table_dir, version)
    if not os.path.exists(mp):
        raise FileNotFoundError(f"version {version} is not committed")
    with open(mp) as fh:
        manifest = json.load(fh)
    if "bucket_data" not in manifest:
        return read_version(spark, table_dir, version)
    paths = [os.path.join(table_dir, p)
             for p in manifest["bucket_data"].values()]
    return _read_bucket_paths(spark, paths)


def gc_unreachable(table_dir: str, keep_from: int) -> list[str]:
    """Delete version DATA directories not referenced by any manifest
    >= ``keep_from`` (manifests themselves are kept — history stays
    auditable, time travel older than keep_from stops working).  The
    reachability sweep the bucketed layout requires before any delete:
    an old version's directory may still hold the CURRENT copy of an
    untouched bucket."""
    vs = [m for m in list_versions(table_dir)
          if m["version"] >= keep_from]
    reachable = set()
    for m in vs:
        if "bucket_data" in m:
            for rel in m["bucket_data"].values():
                reachable.add(rel.split("/", 1)[0])
        else:
            reachable.add(f"v{m['version']:05d}")
    removed = []
    import shutil
    for name in sorted(os.listdir(table_dir)):
        if _VDIR.match(name) and name not in reachable:
            shutil.rmtree(os.path.join(table_dir, name))
            removed.append(name)
    # record the sweep high-water mark so time-travel reads of GC'd
    # versions can name the retention sweep precisely (the marker only
    # advances — a later sweep with a smaller keep_from keeps the max)
    gp = os.path.join(table_dir, _GC_MARKER)
    prev = 0
    if os.path.exists(gp):
        with open(gp) as fh:
            prev = json.load(fh).get("keep_from", 0)
    with open(gp, "w") as fh:
        json.dump({"keep_from": max(keep_from, prev)}, fh)
    return removed


def retention_sweep(table_dir: str, keep_last: int | None = None,
                    keep_newer_than: float | None = None) -> dict:
    """Retention-policy GC over a versioned table (VERDICT r7 task 7):
    compute the smallest version to keep from a policy, then run the
    reachability sweep (:func:`gc_unreachable`).

    * ``keep_last=N`` keeps the N most recent committed versions;
    * ``keep_newer_than=T`` (epoch seconds) keeps every version whose
      manifest ``committed_at`` >= T — manifests WITHOUT the stamp
      (pre-round-8 tables) are conservatively kept;
    * both given → a version survives if EITHER policy keeps it (the
      union, never less than keep_last).

    The latest committed version is always kept.  Manifests are never
    deleted — ``list_versions`` keeps showing full history, and reads
    of swept versions raise :class:`VersionGCedError` naming the
    sweep's high-water mark."""
    if keep_last is None and keep_newer_than is None:
        raise ValueError("retention_sweep needs keep_last and/or "
                         "keep_newer_than")
    if keep_last is not None and keep_last < 1:
        raise ValueError(f"keep_last must be >= 1: {keep_last}")
    vs = list_versions(table_dir)
    if not vs:
        return {"keep_from": None, "removed": []}
    latest = vs[-1]["version"]
    candidates = []
    if keep_last is not None:
        candidates.append(max(1, latest - keep_last + 1))
    if keep_newer_than is not None:
        kept = [m["version"] for m in vs
                if m.get("committed_at") is None
                or m["committed_at"] >= keep_newer_than]
        candidates.append(min(kept) if kept else latest)
    keep_from = min(min(candidates), latest)
    removed = gc_unreachable(table_dir, keep_from)
    return {"keep_from": keep_from, "removed": removed}
