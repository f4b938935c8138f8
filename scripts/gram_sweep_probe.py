"""r14 gram-kernel sweep A/B (guide §1): OLD = r11 zip_with expression
chains for shingle_docs(distinct=True) and stride1_grams; NEW = the
Arrow gram kernels.  Alternating passes through the real workload
entries, pins released between passes.

Usage: python scripts/gram_sweep_probe.py [sf_dir] [passes] [filter]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators import dedup as D
from olap_xtrctr_spark.operators import segments_spans as SS
from olap_xtrctr_spark.session import release_tracked_caches
from olap_xtrctr_spark.workload import WORKLOAD

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None

ENTRIES = [
    "docs_duplicate_spans",
    "docs_duplicate_span_strip",
    "docs_contamination_spans",
    "docs_winnow_span_dedup",
    "docs_ngram_novelty",
    "docs_contamination_check",
    "docs_containment_pairs_prefix",
    "docs_source_chain_components",
]


def old_shingle_docs(docs, text_col="text", id_col="doc_id", n=3,
                     distinct=True):
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(F.col(id_col), toks.alias("_t"))
    expr = D.gram_zip_expr("_t", n, short="whole", distinct=distinct)
    return d.select(id_col, F.explode(F.expr(expr)).alias("shingle"))


def old_stride1_grams(docs, k, text_col, id_col):
    if k < 2:
        raise ValueError("k >= 2")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(F.col(id_col), toks.alias("_t"))
    expr = D.gram_zip_expr("_t", k, short="empty")
    return d.select(id_col,
                    F.posexplode(F.expr(expr)).alias("_p", "_sh"))


def main() -> None:
    spark = get_spark("gram-sweep-probe")
    spark.sparkContext.setLogLevel("ERROR")
    new_sh, new_s1 = D.shingle_docs, SS.stride1_grams
    entries = ENTRIES if ONLY is None else [
        e for e in ENTRIES if any(s in e for s in ONLY)]
    results: dict[str, list[float]] = {}
    for p in range(PASSES):
        for arm in ("old", "new"):
            D.shingle_docs = old_shingle_docs if arm == "old" else new_sh
            SS.stride1_grams = old_stride1_grams if arm == "old" else new_s1
            for name in entries:
                spark.sparkContext.setJobDescription(
                    f"gram sweep {arm} {name} pass{p}")
                t0 = time.perf_counter()
                n = WORKLOAD[name].fn(spark, SF).count()
                dt = time.perf_counter() - t0
                release_tracked_caches()
                results.setdefault(f"{name}:{arm}", []).append(dt)
                print(f"# pass{p} {arm:3s} {name}: {dt:.3f}s rows={n}",
                      file=sys.stderr)
    D.shingle_docs, SS.stride1_grams = new_sh, new_s1
    for k in sorted(results):
        ts = sorted(results[k])
        print(f"{k}: med={ts[len(ts)//2]:.3f} min={ts[0]:.3f} all="
              f"{[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
