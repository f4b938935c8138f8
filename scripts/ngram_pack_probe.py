"""A/B probe: _ngram_pair_counts struct-carry (current) vs packed-long
variant (id*2^21+sz as one BIGINT through posting lists and pairs) vs
the pre-r13 join shape, at a given SF.  Verifies bit-identical output
(exceptAll both ways) then times N passes of each.

Usage: python scripts/ngram_pack_probe.py [sf_dir] [passes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators.dedup import gram_zip_expr, _ngram_pair_counts
from olap_xtrctr_spark.session import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N = 3

SZ_BITS = 21  # sz < 2^21; id < 2^42


def packed_counts(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = gram_zip_expr("_t", N, short="whole", distinct=True)
    d = (docs.select(F.col(id_col), toks.alias("_t"))
             .select(id_col, F.expr(grams).alias("_g")))
    ex = d.select(
        (F.col(id_col) * (1 << SZ_BITS) + F.size("_g")).alias("_p"),
        F.explode("_g").alias("shingle"))
    posting = ex.groupBy("shingle").agg(
        F.sort_array(F.collect_list("_p")).alias("ids"))
    posting = posting.filter(F.size("ids") > 1)
    pairs = posting.select(F.explode(F.expr(
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "b -> struct(a AS pa, b AS pb))))")).alias("p")
    ).select("p.pa", "p.pb")
    agg = pairs.groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("inter"))
    mask = (1 << SZ_BITS) - 1
    return agg.select(
        F.shiftright("pa", SZ_BITS).alias("id_a"),
        F.shiftright("pb", SZ_BITS).alias("id_b"),
        "inter",
        F.col("pa").bitwiseAND(F.lit(mask)).alias("sz_a"),
        F.col("pb").bitwiseAND(F.lit(mask)).alias("sz_b"))


def jaccard_from(inter: DataFrame, threshold: float = 0.3) -> DataFrame:
    ratio = (F.col("inter")
             / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
    return (inter.filter(ratio >= threshold)
            .withColumn("jaccard", F.round(ratio, 4))
            .select("id_a", "id_b", "jaccard"))


def main() -> None:
    spark = get_spark("ngram-pack-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    docs = load_table(spark, SF, "documents")

    cur = jaccard_from(_ngram_pair_counts(docs, "text", "doc_id", N,
                                          None, "probe"))
    pkd = jaccard_from(packed_counts(docs))
    a = cur.exceptAll(pkd).count()
    b = pkd.exceptAll(cur).count()
    print(f"equivalence: cur\\packed={a} packed\\cur={b}")
    assert a == 0 and b == 0, "NOT bit-identical"

    for name, df_fn in [("current-struct", lambda: jaccard_from(
                            _ngram_pair_counts(docs, "text", "doc_id", N,
                                               None, "probe"))),
                        ("packed-long", lambda: jaccard_from(
                            packed_counts(docs)))]:
        ts = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            df_fn().count()
            ts.append(time.perf_counter() - t0)
        print(f"{name:16s} passes={[round(t,3) for t in ts]} "
              f"median={sorted(ts)[len(ts)//2]:.3f}")


if __name__ == "__main__":
    main()
