"""r14 simhash-kernel A/B (guide §1: measure first, same-window
alternating passes).

OLD = pre-r14 signature: token explode + per-bit conditional-SUM
groupBy (one full token-stream exchange + bits interpreted vote
expressions per token).  NEW = _simhash_kernel (JVM rowwise token
hashes -> Arrow int64 bit-vote kernel, zero exchanges).

Both are driven through the REAL pair operators (simhash_near_pairs /
simhash_near_pairs_md5) by monkeypatching the signature builder, with
tracked pins released between passes.  Alternating passes so host
drift hits both arms equally.

Usage: python scripts/simhash_kernel_probe.py [sf_dir] [passes]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators import dedup as D
from olap_xtrctr_spark.session import load_table, release_tracked_caches

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def old_signature(docs, text_col, id_col, hash_family, bits):
    toks = docs.select(
        id_col, F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                  r"\s+")).alias("tok"))
    if hash_family == "xx":
        toks = toks.select(id_col, F.xxhash64("tok").alias("_h"))
        votes = [
            F.sum(F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1,
                         1).otherwise(-1)).alias(f"v{i}")
            for i in range(bits)]
    else:
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10) \
            .cast("bigint")
        toks = toks.select(id_col, h.alias("_h"))
        votes = [
            F.sum(F.when(F.expr(f"(_h DIV {2 ** i}) % 2") == 1, 1)
                   .otherwise(-1)).alias(f"v{i}")
            for i in range(bits)]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = sum([
        F.when(F.col(f"v{i}") > 0,
               F.lit(1).cast("long") * (2 ** i if i < 63 else -(2 ** 63)))
         .otherwise(0)
        for i in range(bits)])
    return agg.select(id_col, sig.alias("simhash"))


def main() -> None:
    spark = get_spark("simhash-kernel-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")

    new_kernel = D._simhash_kernel

    def old_kernel(docs, text_col, id_col, hash_sql, bits):
        fam = "xx" if hash_sql == D._XXHASH64_TOKEN_SQL else "md5"
        return old_signature(docs, text_col, id_col, fam, bits)

    results: dict[str, list[float]] = {}
    for p in range(PASSES):
        for arm, impl in (("old", old_kernel), ("new", new_kernel)):
            D._simhash_kernel = impl
            for name, fn in (
                ("docs_simhash_pairs",
                 lambda: D.simhash_near_pairs(docs, max_hamming=6)),
                ("docs_simhash_pairs_exact",
                 lambda: D.simhash_near_pairs_md5(docs, max_hamming=5)),
            ):
                spark.sparkContext.setJobDescription(
                    f"simhash probe {arm} {name} pass{p}")
                t0 = time.perf_counter()
                n = fn().count()
                dt = time.perf_counter() - t0
                release_tracked_caches()
                results.setdefault(f"{name}:{arm}", []).append(dt)
                print(f"# pass{p} {arm:3s} {name}: {dt:.3f}s rows={n}",
                      file=sys.stderr)
    D._simhash_kernel = new_kernel
    for k in sorted(results):
        ts = sorted(results[k])
        print(f"{k}: med={ts[len(ts)//2]:.3f} min={ts[0]:.3f} all="
              f"{[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
