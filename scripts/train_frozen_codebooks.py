"""One-off generator for olap_xtrctr_spark/operators/frozen_codebooks.py.

Trains the coarse KMeans centers and the PQ / residual-PQ subspace
codebooks IN SPARK over the sf0.01 embeddings, then freezes them as
integer constants (the engine-wide fixed-point convention: component =
floor(x * 10000)) checked into source — the same freeze-on-train
discipline as the fixedlog ladders and the md5-LSH twins (VERDICT r11
task 2).  With the codebooks frozen as integers, cell assignment
(argmin of an exact int64 L2), ADC lookup sums (exact int64 adds —
associative, so shuffle order cannot perturb them) and the q·centroid
offsets are bit-reproducible by ANY engine, which is what turns the
PQ/IVFPQ/SemDeDup family from rows-only into full-oracle entries.

Run:  python scripts/train_frozen_codebooks.py [sf_dir]
Writes the module in place; re-running with unchanged inputs is
byte-stable (fixed seeds, deterministic argmin tie-breaks).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.session import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "olap_xtrctr_spark", "operators", "frozen_codebooks.py")

SCALE = 10_000
DIM = 64
COARSE_K = 8        # shared by SemDeDup cells and the IVFPQ coarse stage
PQ_M = 8            # subspaces
PQ_K = 16           # centroids per subspace
SUB_D = DIM // PQ_M
SEED = 42

_INT_VEC = (f"transform(embedding, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0) AS BIGINT))")


def _kmeans_centers(df, feat_col: str, k: int, seed: int):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    feats = df.withColumn("_f", array_to_vector(
        F.col(feat_col).cast("array<double>")))
    model = KMeans(k=k, seed=seed, maxIter=20, featuresCol="_f").fit(feats)
    return [[int(round(float(x))) for x in c] for c in model.clusterCenters()]


def main() -> None:
    spark = get_spark("train-frozen-codebooks")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", F.expr(_INT_VEC).alias("vint"))

    # 1) coarse centers over the full int vectors
    coarse = _kmeans_centers(emb, "vint", COARSE_K, SEED)

    # 2) exact int argmin assignment by the FROZEN coarse centers (the
    #    serving-time rule), then integer residuals per cell
    cen_rows = [(i, c) for i, c in enumerate(coarse)]
    cen_df = spark.createDataFrame(cen_rows, "cell int, cen array<bigint>")
    d2 = F.aggregate(
        F.zip_with("vint", "cen", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    assigned = (emb.crossJoin(F.broadcast(cen_df))
                .withColumn("_d2", d2)
                .withColumn("_rn", F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("vec_id").orderBy("_d2", "cell")))
                .filter(F.col("_rn") == 1)
                .withColumn("rint", F.zip_with(
                    "vint", "cen", lambda a, b: a - b))
                .select("vec_id", "vint", "rint"))
    assigned = assigned.localCheckpoint()

    # 3) per-subspace codebooks: raw (PQ) and residual (IVFPQ)
    pq_books, res_books = [], []
    for s in range(PQ_M):
        sub = F.slice(F.col("vint"), s * SUB_D + 1, SUB_D)
        pq_books.append(_kmeans_centers(
            assigned.select(sub.alias("sv")), "sv", PQ_K, SEED + 100 + s))
        rsub = F.slice(F.col("rint"), s * SUB_D + 1, SUB_D)
        res_books.append(_kmeans_centers(
            assigned.select(rsub.alias("sv")), "sv", PQ_K, SEED + 200 + s))

    # 4) frozen quality-classifier weights: LogisticRegression over the
    #    four ORACLE-EXACT integer text features (n_tokens, n_chars,
    #    stop_hits, punct) against the weak quality labels — the
    #    value-exact sibling of the hashed-BoW classifier (feature
    #    hashing is murmur3, which no SQL oracle reproduces; these
    #    counts every oracle already mirrors).  Weights fold the
    #    feature scaling and freeze at 1e6 fixed point, so the serving
    #    logit is an exact int64 dot product.
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from olap_xtrctr_spark.operators.classifier import weak_quality_labels
    from olap_xtrctr_spark.operators.text import (LANG_STOPWORDS,
                                                  PUNCT_CLASS)

    docs = load_table(spark, SF, "documents")
    t = F.col("text")
    stop_pat = r"\b(" + "|".join(LANG_STOPWORDS["en"]) + r")\b"
    FEATS = [F.size(F.split(F.trim(t), r"\s+")).alias("n_tokens"),
             F.greatest(F.length(t), F.lit(1)).alias("n_chars"),
             F.regexp_count(F.lower(t), F.lit(stop_pat))
             .alias("stop_hits"),
             F.regexp_count(t, F.lit(PUNCT_CLASS)).alias("punct")]
    FEAT_SCALE = [100.0, 1000.0, 10.0, 10.0]   # keep LR well-conditioned
    labeled = weak_quality_labels(docs).select("doc_id", "label")
    train = (docs.select("doc_id", *FEATS).join(labeled, "doc_id")
             .withColumn("_f", array_to_vector(F.array(
                 F.col("n_tokens") / FEAT_SCALE[0],
                 F.col("n_chars") / FEAT_SCALE[1],
                 F.col("stop_hits") / FEAT_SCALE[2],
                 F.col("punct") / FEAT_SCALE[3]))))
    lr = LogisticRegression(featuresCol="_f", labelCol="label",
                            maxIter=100, regParam=1e-3).fit(train)
    qw = [int(round(float(w) / s * 1_000_000))
          for w, s in zip(lr.coefficients, FEAT_SCALE)]
    qb = int(round(float(lr.intercept) * 1_000_000))

    def fmt_nested(obj, indent=0):
        pad = "    " * indent
        if isinstance(obj, list) and obj and isinstance(obj[0], list):
            inner = ",\n".join(fmt_nested(x, indent + 1) for x in obj)
            return f"{pad}[\n{inner},\n{pad}]"
        return pad + repr(obj)

    with open(OUT, "w", encoding="utf-8") as f:
        f.write(f'''"""FROZEN integer codebooks (generated by
scripts/train_frozen_codebooks.py over {SF} — do not hand-edit; re-run
the generator to retrain).

Why frozen: a LEARNED quantizer is not SQL-expressible, but a learned-
then-frozen one is just constants — cell assignment is an exact int64
argmin, ADC partial dots are exact int64 sums, and both reproduce
bit-for-bit on any engine.  The quantization grid's QUALITY comes from
the training run; its CORRECTNESS contract is pure integer arithmetic
(the fixedlog-ladder discipline applied to vector quantization).
Component convention: floor(x * {SCALE}) per embedding component.
"""

SCALE = {SCALE}
DIM = {DIM}
COARSE_K = {COARSE_K}
PQ_M = {PQ_M}
PQ_K = {PQ_K}
SUB_D = {SUB_D}

# {COARSE_K} x {DIM}: shared by SemDeDup cell blocking and the IVFPQ
# coarse stage
COARSE_CENTERS_I = \\
{fmt_nested(coarse)}

# [subspace][code][component]: {PQ_M} x {PQ_K} x {SUB_D}, raw vectors
PQ_CODEBOOKS_I = \\
{fmt_nested(pq_books)}

# [subspace][code][component]: residuals v_int - coarse_center
RESIDUAL_CODEBOOKS_I = \\
{fmt_nested(res_books)}

# Frozen quality-classifier (logistic regression over the four
# oracle-exact integer text features; scaling folded into the weights
# at 1e6 fixed point).  keep ⇔ w·[n_tokens, n_chars, stop_hits,
# punct] + bias > 0, an exact int64 comparison.
QUALITY_LR_WEIGHTS_I = {qw!r}
QUALITY_LR_BIAS_I = {qb!r}
''')
    print(f"wrote {OUT}")
    print("coarse cells:", len(coarse), "pq books:", len(pq_books),
          "res books:", len(res_books))


if __name__ == "__main__":
    main()
