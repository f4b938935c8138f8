"""r14 md5-LSH first-collision candidate-emission probe — MEASURED
AND REJECTED (recorded so later rounds don't redo it).

Idea: emit each colliding pair only from the FIRST table where it
collides (rowwise prefix check on the carried bucket arrays) so the
pair multiset is unique by construction and the dropDuplicates
exchange disappears.  Identity verified (exceptAll clean both ways at
sf0.1).  Result: WINS at sf0.1 (3.9-4.3 -> 2.8-2.9 s, -27%) but LOSES
at ~sf1 (100.5 -> 112.6 s, +12%): the interpreted zip_with prefix
check runs on every JOINED candidate row (~200M at 20k vectors) and
costs more than the 16-byte-row dedup exchange it removes.  The
dropDuplicates shape stays.  NOTE: this probe carries its own copy of
the first-collision variant as `new_pairs` since the operator keeps
the shipped shape.

Usage: python scripts/lsh_firsthit_probe.py <sf_dir> [passes]
"""
import sys
import time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators import similarity as S
from olap_xtrctr_spark.session import load_table

SF = sys.argv[1]; PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 2
spark = get_spark("lsh-firsthit-probe"); spark.sparkContext.setLogLevel("ERROR")
emb = load_table(spark, SF, "embeddings")

def shipped_pairs(emb, threshold=0.45, n_tables=16, bits_per_table=4,
              id_col="vec_id", vec_col="embedding", quant_scale=1000):
    buckets = S._md5_lsh_buckets(emb, n_tables, bits_per_table, id_col, vec_col, quant_scale)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (a.join(b, (F.col("a.t") == F.col("b.t"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cosine", F.round(S._cosine(F.col("_va"), F.col("_vb")), 4))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def _bucket_arrays(emb, n_tables=16, bits_per_table=4,
                   id_col="vec_id", vec_col="embedding",
                   quant_scale=1000):
    """Verbatim copy of the measured variant's kernel-array form
    (the shipped operator explodes instead of returning the array)."""
    import hashlib

    import numpy as np

    dim = emb.select(F.size(vec_col).alias("d")).first()["d"]
    P = np.empty((n_tables * bits_per_table, dim), dtype=np.int64)
    for t in range(n_tables):
        for b in range(bits_per_table):
            for i in range(dim):
                nib = int(hashlib.md5(
                    f"lshplane:{t}:{b}:{i}".encode()).hexdigest()[0], 16)
                P[t * bits_per_table + b, i] = 1 if nib >= 8 else -1
    pow2 = 1 << np.arange(bits_per_table, dtype=np.int64)
    scale = float(quant_scale)

    def _buckets(vecs):
        import pandas as pd
        if vecs.empty:
            return pd.Series([], dtype=object)
        vals = list(vecs)
        live = [j for j, v in enumerate(vals) if v is not None]
        out = [None] * len(vals)
        if live:
            V = np.stack([np.asarray(vals[j], dtype=np.float64)
                          for j in live])
            Q = np.floor(V * scale + 0.5).astype(np.int64)
            D = Q @ P.T
            bits = (D >= 0).reshape(len(Q), n_tables, bits_per_table)
            buckets = (bits * pow2).sum(axis=2)
            for r, j in enumerate(live):
                out[j] = buckets[r]
        return pd.Series(out, dtype=object)

    udf = F.pandas_udf(_buckets, "array<long>")
    return emb.select(F.col(id_col), udf(F.col(vec_col)).alias("_bks"))


def firsthit_pairs(emb, threshold=0.45, n_tables=16, bits_per_table=4,
                   id_col="vec_id", vec_col="embedding",
                   quant_scale=1000):
    """The REJECTED first-collision variant, verbatim as measured."""
    sig = _bucket_arrays(emb, n_tables, bits_per_table, id_col, vec_col,
                         quant_scale)
    ex = sig.select(F.col(id_col), "_bks",
                    F.posexplode("_bks").alias("t", "bucket"))
    ea = ex.select(F.col(id_col).alias("id_a"),
                   F.col("_bks").alias("_ba"), "t", "bucket")
    eb = ex.select(F.col(id_col).alias("id_b"),
                   F.col("_bks").alias("_bb"), "t", "bucket")
    cand = (ea.join(eb, ["t", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(F.expr(
                "size(filter(zip_with(slice(_ba, 1, t), "
                "slice(_bb, 1, t), (x, y) -> x = y), v -> v)) = 0"))
            .select("id_a", "id_b"))
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cosine",
                        F.round(S._cosine(F.col("_va"), F.col("_vb")), 4))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


# identity first (cheap at small SF; at sf1 row counts suffice)
new_df = firsthit_pairs(emb)
old_df = shipped_pairs(emb)
if "sf0" in SF:
    assert new_df.exceptAll(old_df).count() == 0
    assert old_df.exceptAll(new_df).count() == 0
    print("# identity: exceptAll clean both ways")
res = {}
for p in range(PASSES):
    for arm, fn in (("old", shipped_pairs), ("new", firsthit_pairs)):
        spark.sparkContext.setJobDescription(f"lsh firsthit {arm} p{p}")
        t0 = time.perf_counter(); n = fn(emb).count(); dt = time.perf_counter() - t0
        res.setdefault(arm, []).append(round(dt, 2))
        print(f"# p{p} {arm}: {dt:.2f}s rows={n}", file=sys.stderr)
for k, v in res.items(): print(k, sorted(v))
