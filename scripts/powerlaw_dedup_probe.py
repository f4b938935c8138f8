"""Dedup operators under a POWER-LAW duplication profile (VERDICT r6
task 6).

The 10x replicator used by the standing scale probes copies every base
document the same number of times, so duplicate families are uniform —
but real crawl corpora have a few HOT families with thousands of
members (boilerplate pages, mirrored articles) and a long unique tail.
This probe builds that shape deterministically and measures the two
operators whose cost models react to family size in opposite ways:

* ``minhash_lsh_pairs``: pair output is quadratic INSIDE families —
  the top family alone contributes ~|F|^2/2 pairs, the regime the slim
  (id,band,bucket) projection exists for.
* ``ngram_novelty``: NO pair generation — cost must stay linear in
  corpus size regardless of duplication depth.  Measured against a
  uniform-replication corpus of the same total size.
* ``ngram_jaccard_pairs(max_doc_freq=1000)``: hot-family shingles
  exceed the posting-list cap, so the no-silent-caps backstop must
  FIRE and log its drop count (it never fires on uniform data).

Family profile: family k (0-indexed rank) gets ``int(3000/(k+1)^1.1)``
members (min 2) until ~45k replica budget is spent; remaining base
docs stay unique.  Replicas perturb every 20th token (xxhash64-derived,
deterministic) => 3-gram jaccard ~0.75 vs the family root, above the
0.5 LSH threshold.

Usage: python scripts/powerlaw_dedup_probe.py [scratch_dir]
"""
from __future__ import annotations

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators import dedup as D

SRC = "/root/testdata/sf0.1/documents.parquet"
SCRATCH = sys.argv[1] if len(sys.argv) > 1 else "/tmp/powerlaw_dedup_probe"
REPLICA_BUDGET = 45_000


def family_sizes(n_base: int) -> list[int]:
    """Rank-k family sizes, capped at the number of base docs that can
    serve as family roots (one family per base doc)."""
    sizes, total, k = [], 0, 0
    while total < REPLICA_BUDGET and k < n_base:
        s = max(2, int(3000 / (k + 1) ** 1.1))
        sizes.append(s)
        total += s - 1          # the root is an existing base doc
        k += 1
    return sizes


def perturbed_text():
    """Replace every 20th token (phase = copy index ``c``) with a
    deterministic junk token — 3-gram jaccard vs the root ~0.75."""
    toks = F.split(F.col("text"), " ")
    return F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                F.pmod(i, F.lit(20)) == F.pmod(F.col("c"), F.lit(20)),
                F.concat(F.lit("tok"),
                         F.pmod(F.xxhash64(F.col("doc_id"), F.col("c"),
                                           i),
                                F.lit(99991)).cast("string"))
            ).otherwise(t)),
        " ")


def build(spark, shape: str) -> str:
    """shape='powerlaw': rank-k family sizes; shape='uniform': every
    base doc gets the same replica count (same total size).  One plan:
    replica multiplicity via explode(sequence(...)), no per-copy
    unions."""
    base = spark.read.parquet(SRC).select("doc_id", "text")
    n_base = base.count()
    sizes = family_sizes(n_base)
    total_replicas = sum(s - 1 for s in sizes)
    if shape == "powerlaw":
        fam = spark.createDataFrame(
            [(k, s) for k, s in enumerate(sizes)],
            "doc_id long, fam_size long")
        seeds = base.join(fam, "doc_id")
    else:
        # uniform depth, EXACT same total: every doc gets the floor
        # count, the first `extra` docs one more
        per_doc = total_replicas // n_base
        extra = total_replicas - per_doc * n_base
        seeds = base.withColumn(
            "fam_size",
            F.when(F.col("doc_id") < extra, F.lit(per_doc + 2))
             .otherwise(F.lit(per_doc + 1)))
    replicas = (seeds
                .select("doc_id", "text",
                        F.explode(F.sequence(
                            F.lit(1), F.col("fam_size") - 1)).alias("c"))
                .select((F.col("doc_id") + F.col("c") * n_base)
                        .cast("long").alias("doc_id"),
                        perturbed_text().alias("text")))
    # replicas needs doc_id,text select order match for union
    out = base.unionByName(replicas)
    dst = os.path.join(SCRATCH, f"docs_{shape}.parquet")
    out.repartition(32).write.mode("overwrite").parquet(dst)
    return dst


class CaptureWarnings(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.messages: list[str] = []

    def emit(self, record):
        self.messages.append(record.getMessage())


def main() -> None:
    spark = get_spark("powerlaw-dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cap = CaptureWarnings()
    logging.getLogger("olap_xtrctr_spark.operators.dedup").addHandler(cap)

    n_base = spark.read.parquet(SRC).count()
    sizes = family_sizes(n_base)
    print(f"# {len(sizes)} families, top sizes {sizes[:5]}, "
          f"total replicas {sum(s - 1 for s in sizes)}")

    paths = {shape: build(spark, shape) for shape in ("powerlaw",
                                                      "uniform")}
    for shape, dst in paths.items():
        n = spark.read.parquet(dst).count()
        print(f"# {shape} corpus: {n} docs")

    # 1. minhash LSH on the power-law corpus
    docs_pl = spark.read.parquet(dst := paths["powerlaw"])
    t0 = time.time()
    n_pairs = D.minhash_lsh_pairs(docs_pl, threshold=0.5).count()
    t_lsh = time.time() - t0
    exp_top = sizes[0] * (sizes[0] - 1) // 2
    print(f"minhash_lsh_pairs[powerlaw]: {t_lsh:.1f}s pairs={n_pairs:,} "
          f"(top family alone implies ~{exp_top:,})")

    # 2. ngram_novelty: linear-in-depth claim, power-law vs uniform
    for shape in ("uniform", "powerlaw"):
        docs = spark.read.parquet(paths[shape])
        t0 = time.time()
        out = D.ngram_novelty(docs).agg(
            F.count("*"), F.avg("novelty_milli")).collect()[0]
        dt = time.time() - t0
        print(f"ngram_novelty[{shape}]: {dt:.1f}s docs={out[0]:,} "
              f"avg_novelty_milli={out[1]:.0f}")

    # 3. posting-list backstop must FIRE on hot families
    t0 = time.time()
    n_j = D.ngram_jaccard_pairs(docs_pl, threshold=0.8,
                                max_doc_freq=1000).count()
    t_j = time.time() - t0
    fired = [m for m in cap.messages if "max_doc_freq" in m]
    print(f"ngram_jaccard_pairs[powerlaw,max_doc_freq=1000]: {t_j:.1f}s "
          f"pairs={n_j:,}")
    time.sleep(2)   # observation logger threads resolve post-action
    fired = [m for m in cap.messages if "max_doc_freq" in m]
    print(f"backstop warnings fired: {len(fired)}")
    for m in fired:
        print(f"  | {m}")


if __name__ == "__main__":
    main()
