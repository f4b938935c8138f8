"""Round-13 minhash_lsh_pairs variant probe (guide §1: measure first).

Current plan replicates the signature subtree (scan -> repartition ->
shingle generate -> 32-way min agg, 2 exchanges) FOUR times (banded a,
banded b, sa, sb), and spends 1.1s of its 2.0s bench time in Python
plan construction + analysis (timings_before.json).  Variants:

  A  current committed implementation
  B  array-packed signature (one ARRAY<BIGINT> column instead of 32
     BIGINT columns through the scoring joins; band buckets extract
     elements so xxhash64 inputs are value-identical)
  C  B + track_persist of the signature table (compute the shingle/agg
     subtree ONCE per query instead of 4x)
  D  A + track_persist (persist alone, no packing)

For each: 3 passes of build (fn) + count, releasing tracked caches
between passes so no pass rides a previous pass's cache.  Then output
identity: B and C exceptAll A both ways must be empty at this SF.

Usage: python scripts/minhash_variants_probe.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators import dedup as D
from olap_xtrctr_spark.operators.dedup import minhash_signatures
from olap_xtrctr_spark.session import (load_table, release_tracked_caches,
                                       track_persist)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _pairs_from(sig, id_col, num_hashes, bands, threshold, packed):
    rows_per_band = num_hashes // bands
    if packed:
        sig = sig.select(
            id_col,
            F.array(*[f"h{i}" for i in range(num_hashes)]).alias("_sig"))
        band_cols = [
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.col("_sig")[b * rows_per_band + i]
                                  for i in range(rows_per_band)])
                     .alias("bucket"))
            for b in range(bands)]
    else:
        band_cols = [
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.col(f"h{i}")
                                  for i in range(b * rows_per_band,
                                                 (b + 1) * rows_per_band)])
                     .alias("bucket"))
            for b in range(bands)]
    banded = sig.select(
        id_col, F.explode(F.array(*band_cols)).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    cand = (banded.alias("a")
            .join(banded.alias("b"),
                  (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.bucket") == F.col("b.bucket"))
                  & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    if packed:
        sa = sig.select(F.col(id_col).alias("id_a"),
                        F.col("_sig").alias("_sa"))
        sb = sig.select(F.col(id_col).alias("id_b"),
                        F.col("_sig").alias("_sb"))
        scored = cand.join(sa, "id_a").join(sb, "id_b")
        sim = (F.size(F.filter(F.zip_with("_sa", "_sb",
                                          lambda x, y: x == y),
                               lambda v: v))
               / num_hashes)
    else:
        sa = sig.select(F.col(id_col).alias("id_a"),
                        *[F.col(f"h{i}").alias(f"a{i}")
                          for i in range(num_hashes)])
        sb = sig.select(F.col(id_col).alias("id_b"),
                        *[F.col(f"h{i}").alias(f"b{i}")
                          for i in range(num_hashes)])
        scored = cand.join(sa, "id_a").join(sb, "id_b")
        sim = sum([(F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
                   for i in range(num_hashes)]) / num_hashes
    return (scored.filter(sim >= threshold)
                  .withColumn("est_jaccard", F.round(sim, 4))
                  .select("id_a", "id_b", "est_jaccard"))


def variant(name, docs, persist, packed,
            id_col="doc_id", n=3, num_hashes=32, bands=8, threshold=0.3):
    sig = minhash_signatures(docs, "text", id_col, n, num_hashes)
    if persist:
        sig = track_persist(sig)
    return _pairs_from(sig, id_col, num_hashes, bands, threshold, packed)


def main():
    spark = get_spark("minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = lambda: load_table(spark, SF, "documents")
    mk = {
        "A_current": lambda: D.minhash_lsh_pairs(docs(), threshold=0.3),
        "B_packed": lambda: variant("B", docs(), persist=False, packed=True),
        "C_packed_persist": lambda: variant("C", docs(), persist=True,
                                            packed=True),
        "D_current_persist": lambda: variant("D", docs(), persist=True,
                                             packed=False),
    }
    # warm-up at sf0.001 like the bench
    for name, fn in mk.items():
        pass
    warm = load_table(spark, "/root/testdata/sf0.001", "documents")
    D.minhash_lsh_pairs(warm, threshold=0.3).count()
    release_tracked_caches()

    for name, fn in mk.items():
        builds, counts = [], []
        for p in range(3):
            spark.sparkContext.setJobDescription(f"{name} p{p}")
            t0 = time.perf_counter()
            df = fn()
            t1 = time.perf_counter()
            nrows = df.count()
            t2 = time.perf_counter()
            release_tracked_caches()
            builds.append(t1 - t0)
            counts.append(t2 - t1)
        med = lambda xs: sorted(xs)[1]
        print(f"{name}: build_med={med(builds):.3f} "
              f"count_med={med(counts):.3f} rows={nrows} "
              f"builds={[round(x,3) for x in builds]} "
              f"counts={[round(x,3) for x in counts]}", flush=True)

    # identity: B and C vs A, both directions
    a = mk["A_current"]().collect()
    release_tracked_caches()
    aset = sorted(map(tuple, a))
    for name in ("B_packed", "C_packed_persist"):
        b = mk[name]().collect()
        release_tracked_caches()
        bset = sorted(map(tuple, b))
        print(f"{name} identical to A: {aset == bset} "
              f"({len(aset)} vs {len(bset)} rows)")


if __name__ == "__main__":
    main()
