"""ANN recall at ~sf1: the round-5 verdict's one honest scale gap was
that LSH/PQ recall was argued at test scale only (the embeddings table
rode ASIS through the replicator because exact replicas make ANN
degenerate).  This probe builds a 10x corpus of PERTURBED replicas —
each base vector gets factor-1 near-duplicate copies with small
deterministic per-dimension noise (xxhash64-derived, reproducible) —
so every replica family is a KNOWN ground-truth near-dup cluster, and
measures recall + wall-clock of the approximate operators at 20k
vectors without needing the (refused-by-guard) exact GEMM.

Usage: python scripts/ann_scale_probe.py [factor] [scratch_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators import similarity as S

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SCRATCH = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_scale_probe"
SRC = "/root/testdata/sf0.1/embeddings.parquet"
EPS = 0.03


def build(spark):
    base = spark.read.parquet(SRC)
    n_base = base.count()
    shift = base.agg(F.max("vec_id")).first()[0] + 1
    def perturbed(k: int):
        return F.transform(
            "embedding",
            lambda x, i: x + F.lit(EPS) * (
                (F.xxhash64(F.col("vec_id"), F.lit(k), i) % 2001 - 1000)
                / F.lit(1000.0)).cast("float"))

    parts = [base]
    for k in range(1, FACTOR):
        parts.append(base.select(
            (F.col("vec_id") + k * shift).alias("vec_id"),
            perturbed(k).alias("embedding"), "label"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    dst = os.path.join(SCRATCH, "embeddings.parquet")
    out.write.mode("overwrite").parquet(dst)
    return dst, n_base, shift


def main() -> None:
    spark = get_spark("ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dst, n_base, shift = build(spark)
    emb = spark.read.parquet(dst).cache()
    n = emb.count()
    print(f"# corpus: {n} vectors ({n_base} families x {FACTOR})")

    # --- all-pairs LSH near-dup: family pairs are the ground truth ---
    t0 = time.time()
    pairs = S.lsh_near_dup_pairs(emb, threshold=0.9, n_tables=24,
                                 bits_per_table=12).cache()
    n_found = pairs.count()
    t_lsh = time.time() - t0
    fam = (F.col("id_a") % shift == F.col("id_b") % shift)
    n_family = pairs.filter(fam).count()
    expected = n_base * FACTOR * (FACTOR - 1) // 2
    print(f"lsh_near_dup_pairs: {t_lsh:.1f}s found={n_found} "
          f"same-family={n_family} expected={expected} "
          f"recall={n_family/expected:.3f} "
          f"stray={n_found - n_family}")

    # --- top-k indexes: a replica's top-k should stay in its family ---
    qids = [k * shift + b for b in range(0, 200, 40) for k in range(4)]
    for name, fn in [
        ("pq_topk", lambda: S.pq_cosine_topk(emb, qids, k=3)),
        ("ivfpq_topk", lambda: S.ivfpq_cosine_topk(
            emb, qids, k=3, n_clusters=8, n_probe=5)),
        ("lsh_topk", lambda: S.lsh_cosine_topk(emb, qids, k=3)),
    ]:
        t0 = time.time()
        rows = fn().collect()
        dt = time.time() - t0
        top = {}
        for r in rows:
            top.setdefault(r["query_id"], []).append(r["neighbor_id"])
        hit = sum(1 for q in qids
                  if any(nb % shift == q % shift for nb in top.get(q, [])))
        print(f"{name}: {dt:.1f}s family-recall@3={hit}/{len(qids)}")


if __name__ == "__main__":
    main()
