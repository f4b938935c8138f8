"""Training-corpus shard export: size-targeted parquet shards plus a
verifiable manifest.

The last step of every training-data pipeline is handing a corpus to a
trainer as evenly-sized shards with an integrity record: shard list,
per-shard rows/bytes, and a corpus-level content hash that any copy of
the data can recompute.  The manifest is written LAST, so its presence
is the commit marker — a crashed export leaves data files but no
manifest, and a reader that requires the manifest never consumes a
half-written corpus (the _SUCCESS-marker discipline, with content
verification added on top).

Scale shape: the shard count derives from Catalyst's size estimate of
the input plan (file-statistics-based for parquet sources), the write
is one round-robin repartition job, and the manifest pass reads only
the written files' FOOTERS plus one aggregation over (file, row-hash)
— bounded metadata plus a map-side-combinable count/xor, never a
driver-side row loop.
"""
from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .maintenance import parquet_dir_stats

MANIFEST_NAME = "_MANIFEST.json"


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan (parquet file statistics
    propagated through the operators) — the same number AQE plans
    with.  Falls back to 0 (→ one shard) if the JVM API moves, and
    treats plainly-absurd estimates (>= 1 PiB — plans without file
    statistics report the defaultSizeInBytes sentinel, near
    Long.MaxValue) as unknown too: a sentinel fed into the shard-count
    ceil would ask repartition for billions of partitions."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes())
        return est if est < (1 << 50) else 0
    except Exception:
        return 0


def _content_summary(df: DataFrame, cols: list[str]):
    """(row_count, xor-of-row-hashes) — an order-insensitive corpus
    checksum both sides of a copy can recompute.  XOR cancels PAIRS of
    identical rows, which the row count catches; together they pin the
    multiset for any realistic corruption (truncation, re-encode,
    value drift)."""
    h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    row = df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(h)").alias("x")).first()
    return int(row["n"]), int(row["x"] or 0)


def write_training_shards(df: DataFrame, out_dir: str,
                          target_mb: int = 256,
                          fmt: str = "parquet") -> dict:
    """Export ``df`` as round-robin shards sized near ``target_mb``
    (count from Catalyst's size estimate — one code path from a test
    corpus to a multi-TB one) and write the manifest: shard files with
    per-shard rows and bytes, corpus totals, and the (count, xor-hash)
    content summary.  Returns the manifest dict.

    ``fmt``: ``parquet`` (default) or ``jsonl`` — JSON-lines is the
    interchange format most trainer data loaders consume directly; the
    manifest then also carries the schema (JSONL files cannot), and the
    content summary is computed from a READ-BACK of the written files,
    so verify reproduces it from disk alone."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet or jsonl, got {fmt!r}")
    if os.path.exists(os.path.join(out_dir, MANIFEST_NAME)):
        raise ValueError(
            f"{out_dir!r} already holds a committed shard export; "
            f"write to a fresh directory (shards are immutable once "
            f"their manifest exists)")
    est = _estimated_bytes(df)
    n_shards = max(1, math.ceil(est / (target_mb * 1024 * 1024)))
    writer = df.repartition(n_shards).write.mode("overwrite")
    spark = df.sparkSession
    if fmt == "parquet":
        writer.parquet(out_dir)
        back = spark.read.parquet(out_dir)
    else:
        writer.json(out_dir)
        back = spark.read.schema(df.schema).json(out_dir)
    cols = back.columns
    per_file = (back.groupBy(F.input_file_name().alias("path"))
                .agg(F.count(F.lit(1)).alias("rows"))
                .collect())                      # bounded by shard COUNT

    def _local(uri: str) -> str:
        # input_file_name() yields a percent-encoded file URI — decode
        # it or paths with spaces break the getsize below
        from urllib.parse import unquote, urlparse
        p = urlparse(uri)
        return unquote(p.path) if p.scheme else unquote(uri)

    n_rows, x_hash = _content_summary(back, cols)
    shards = sorted(
        ({"file": os.path.basename(_local(r["path"])),
          "rows": r["rows"],
          "bytes": os.path.getsize(_local(r["path"]))}
         for r in per_file), key=lambda s: s["file"])
    manifest = {
        "format": fmt,
        "columns": cols,
        "n_shards": len(shards),
        "total_rows": n_rows,
        "total_bytes": sum(sh["bytes"] for sh in shards),
        "content_xor64": x_hash,
        "shards": shards,
    }
    if fmt == "jsonl":
        manifest["schema_json"] = df.schema.json()
    # manifest LAST = commit marker
    with open(os.path.join(out_dir, MANIFEST_NAME), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def verify_training_shards(spark: SparkSession, out_dir: str) -> dict:
    """Recompute the manifest's integrity fields from the files on disk
    and compare.  Returns {"ok": bool, "problems": [...]} — the check a
    consumer runs after copying a corpus between stores."""
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return {"ok": False,
                "problems": ["no manifest — export uncommitted or not "
                             "a shard directory"]}
    with open(path, encoding="utf-8") as f:
        manifest = json.load(f)
    problems: list[str] = []
    for s in manifest["shards"]:
        fp = os.path.join(out_dir, s["file"])
        if not os.path.exists(fp):
            problems.append(f"missing shard {s['file']}")
        elif os.path.getsize(fp) != s["bytes"]:
            problems.append(f"size drift in {s['file']}")
    if not problems:
        if manifest.get("format", "parquet") == "jsonl":
            from pyspark.sql import types as T
            schema = T.StructType.fromJson(
                json.loads(manifest["schema_json"]))
            back = (spark.read.schema(schema)
                    .option("pathGlobFilter", "part-*")
                    .json(out_dir))
        else:
            back = spark.read.parquet(out_dir)
        n_rows, x_hash = _content_summary(back, manifest["columns"])
        if n_rows != manifest["total_rows"]:
            problems.append(
                f"row count {n_rows} != manifest {manifest['total_rows']}")
        if x_hash != manifest["content_xor64"]:
            problems.append("content hash mismatch")
    return {"ok": not problems, "problems": problems}
