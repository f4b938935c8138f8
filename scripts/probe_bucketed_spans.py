"""A/B probe (VERDICT r7 task 4): monolithic vs BUCKETED gram
seen-store for online exact-substring span dedup at ~sf1.

Replicates sf0.1 documents FACTOR x with shifted ids (replicas keep
their text — worst-case ~90% duplicate window mass), splits the result
into BATCHES id-ordered ingestion steps, and folds both store variants
over them, recording per-batch wall time and store growth.  Parity is
checked per batch on the aggregate span mass (sum of n_dup_tokens /
n_dup_spans / n_tokens — the full per-doc equality is pytest's job at
small scale; here the point is COST shape).

Usage: python scripts/probe_bucketed_spans.py [factor] [batches] [scratch]
           [unique]

With ``unique`` as the 4th arg, every replica's text is salted with its
replica index, so each batch contributes fresh grams — the
store-GROWTH regime (dup-mass regime is the default: replicas share
text, the store saturates at batch 0 and later batches are pure-probe).
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators import segments as SEG

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 5
SCRATCH = sys.argv[3] if len(sys.argv) > 3 else "/tmp/span_store_probe"
SRC = "/root/testdata/sf0.1/documents.parquet"
KEY_SPAN = 100_000_000
N_BUCKETS = 64


def agg_mass(df):
    r = df.agg(F.sum("n_tokens"), F.sum("n_dup_spans"),
               F.sum("n_dup_tokens"), F.count("*")).first()
    return tuple(int(x or 0) for x in r)


def dir_bytes(d):
    total = 0
    for root, _, files in os.walk(d):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    spark = get_spark("span-store-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(SCRATCH):
        shutil.rmtree(SCRATCH)
    os.makedirs(SCRATCH)

    unique = len(sys.argv) > 4 and sys.argv[4] == "unique"
    base = spark.read.parquet(SRC)
    docs = base
    for i in range(1, FACTOR):
        c = base.withColumn("doc_id", F.col("doc_id") + i * KEY_SPAN)
        if unique:
            c = c.withColumn(
                "text", F.regexp_replace("text", r"\s+", f" r{i}x "))
        docs = docs.unionByName(c)
    docs = docs.localCheckpoint(eager=True)
    n = docs.count()
    lo, hi = (r := docs.agg(F.min("doc_id"), F.max("doc_id")).first())[0], r[1]
    step = (hi - lo) // BATCHES + 1
    bounds = [(lo + i * step, lo + (i + 1) * step - 1)
              for i in range(BATCHES)]
    print(f"# corpus: {n} docs x{FACTOR}, {BATCHES} id-ordered batches",
          file=sys.stderr)

    store_dir = os.path.join(SCRATCH, "gram_store")
    seen = None
    for bi, (blo, bhi) in enumerate(bounds):
        b = docs.filter((F.col("doc_id") >= blo)
                        & (F.col("doc_id") <= bhi))
        t0 = time.perf_counter()
        rep_m, seen = SEG.duplicate_spans_incremental(b, seen, k=8)
        seen = seen.localCheckpoint(eager=True)
        mass_m = agg_mass(rep_m)
        t_mono = time.perf_counter() - t0

        t0 = time.perf_counter()
        rep_b = SEG.duplicate_spans_incremental_bucketed(
            spark, b, store_dir, k=8, n_buckets=N_BUCKETS)
        mass_b = agg_mass(rep_b)
        t_buck = time.perf_counter() - t0

        ok = "OK" if mass_m == mass_b else f"MISMATCH {mass_m}!={mass_b}"
        print(f"batch {bi}: mono={t_mono:.2f}s bucketed={t_buck:.2f}s "
              f"store={dir_bytes(store_dir) / 1e6:.1f}MB "
              f"grams={seen.count()} parity={ok}")
    spark.stop()


if __name__ == "__main__":
    main()
