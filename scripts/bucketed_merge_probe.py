"""Head-to-head probe: simple copy-on-write upsert vs bucketed
partition-pruned upsert (VERDICT r6 task 3 re-measurement after the
single-plan multi-path read landed in ``_read_bucket_paths``).

Builds a 2M-key / ~137MB-class table, then applies 5 epochs in two key
regimes and reports s/epoch and bytes rewritten per epoch:

* uniform: 20k distinct keys/epoch  -> hashes into every bucket, the
  regime where bucketing can only lose (measures the overhead).
* sparse: 10 distinct keys/epoch    -> ~10/32 buckets touched, the
  regime bucketing exists for (measures the bytes win).

Usage: python scripts/bucketed_merge_probe.py [base_dir]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.sources import versioned as V

BASE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bucketed_merge_probe"
N_ROWS = 2_000_000
N_EPOCHS = 5
N_BUCKETS = 32


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def base_table(spark):
    return (spark.range(N_ROWS)
            .select(F.col("id").alias("k"), F.lit(0).alias("seq"),
                    F.sha2(F.col("id").cast("string"), 256).alias("payload")))


def epoch_batch(spark, epoch: int, n_keys: int):
    return (spark.range(n_keys)
            .select((F.col("id") * (N_ROWS // max(n_keys, 1)))
                    .alias("k"),
                    F.lit(epoch).alias("seq"),
                    F.sha2(F.concat(F.col("id").cast("string"),
                                    F.lit(f"e{epoch}")), 256)
                     .alias("payload")))


def run(spark, label: str, n_keys: int, bucketed: bool):
    t = os.path.join(BASE, f"{label}_{'bucketed' if bucketed else 'cow'}")
    shutil.rmtree(t, ignore_errors=True)
    if bucketed:
        V.upsert_batch_bucketed(spark, base_table(spark), t, ["k"],
                                "seq", 0, n_buckets=N_BUCKETS)
    else:
        V.upsert_batch(spark, base_table(spark), t, ["k"], "seq", 0)
    size0 = dir_bytes(t)
    t0 = time.time()
    for e in range(1, N_EPOCHS + 1):
        if bucketed:
            V.upsert_batch_bucketed(spark, epoch_batch(spark, e, n_keys),
                                    t, ["k"], "seq", e,
                                    n_buckets=N_BUCKETS)
        else:
            V.upsert_batch(spark, epoch_batch(spark, e, n_keys),
                           t, ["k"], "seq", e)
    dt = time.time() - t0
    rewritten = (dir_bytes(t) - size0) / N_EPOCHS
    reader = V.read_version_bucketed if bucketed else V.read_version
    n = reader(spark, t).count()
    print(f"{label:8s} {'bucketed' if bucketed else 'cow':8s} "
          f"{dt / N_EPOCHS:6.2f} s/epoch  "
          f"{rewritten / 1e6:7.1f} MB rewritten/epoch  "
          f"(final rows {n:,})")
    return dt / N_EPOCHS, rewritten


def main():
    spark = get_spark("bucketed_merge_probe")
    os.makedirs(BASE, exist_ok=True)
    results = {}
    for label, n_keys in (("uniform", 20_000), ("sparse", 10)):
        for bucketed in (False, True):
            results[(label, bucketed)] = run(spark, label, n_keys,
                                             bucketed)
    cow_u, buck_u = results[("uniform", False)], results[("uniform", True)]
    cow_s, buck_s = results[("sparse", False)], results[("sparse", True)]
    print(f"\nuniform regime: bucketed {buck_u[0] / cow_u[0]:.1f}x "
          f"cow wall-clock (target <=2x after single-plan reads)")
    print(f"sparse regime:  bucketed rewrites "
          f"{cow_s[1] / max(buck_s[1], 1):.1f}x less data than cow")


if __name__ == "__main__":
    main()
