"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k: query set broadcast against
  the corpus, dot products via JVM higher-order functions (zip_with +
  aggregate in double precision — no Python in the hot path).
* ``lsh_cosine_topk`` — random-hyperplane LSH scale path: sign-bit
  signatures bucket the corpus so each query only scores its bucket
  (multi-probe over Hamming-adjacent buckets for recall).

At 100 TB the corpus side stays partitioned; only the query set (small
by construction) is broadcast.
"""
from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def embedding_norms(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    return emb.select(id_col, F.round(_norm(F.col(vec_col)), 4).alias("l2_norm"))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).
    Rank ties break by neighbor id for determinism."""
    queries = (emb.filter(F.col(id_col).isin(query_ids))
                  .select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("qvec"),
                          _norm(F.col(vec_col)).alias("qnorm")))
    corpus = emb.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("nvec"),
                        _norm(F.col(vec_col)).alias("nnorm"))
    scored = (
        corpus.join(F.broadcast(queries),
                    F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cos", _dot(F.col("qvec"), F.col("nvec"))
                          / (F.col("qnorm") * F.col("nnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "rank", "neighbor_id",
                          F.round("cos", 4).alias("cosine")))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as an int: bit p set iff vec · plane_p > 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda v, w: v.cast("double") * w),
            F.lit(0.0), lambda acc, v: acc + v)
        sig = sig + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(0)
    return sig


def ivf_cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 3,
                    n_clusters: int = 8, n_probe: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans partitions the corpus
    into ``n_clusters`` cells; each query scores only the ``n_probe``
    cells nearest its vector.

    Scale shape: the corpus is clustered and bucketed distributively
    (pyspark.ml KMeans); only the QUERY vectors (small by construction)
    and the centroids (n_clusters × dim) ever reach the driver.  The
    candidate join broadcasts the (query, bucket) probe list, so the
    corpus never shuffles."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>"))
        .alias("features"))
    model = KMeans(k=n_clusters, seed=seed, maxIter=10,
                   featuresCol="features").fit(feats)
    assigned = model.transform(feats).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        F.col("prediction").alias("bucket"))

    centers = model.clusterCenters()
    qrows = (emb.filter(F.col(id_col).isin(query_ids))
                .select(id_col, vec_col).collect())
    probes = []
    for r in qrows:
        v = np.asarray(r[vec_col], dtype=float)
        dists = [float(np.linalg.norm(v - c)) for c in centers]
        for b in np.argsort(dists)[:n_probe]:
            probes.append((r[id_col], int(b)))
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(probes, ["query_id", "bucket"])
    queries = (emb.filter(F.col(id_col).isin(query_ids))
                  .select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("qvec")))

    cand = (assigned
            .join(F.broadcast(probe_df), "bucket")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .join(F.broadcast(queries), "query_id"))
    scored = cand.withColumn("cos", _cosine(F.col("qvec"), F.col("nvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "rank", "neighbor_id",
                          F.round("cos", 4).alias("cosine")))


def lsh_cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 3,
                    n_planes: int = 12, dim: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets + multi-probe.
    Each query scores only corpus vectors whose signature is within
    ``probe_hamming`` bits — the crossjoin never materializes."""
    planes = _hyperplanes(dim, n_planes)
    sig = emb.select(
        F.col(id_col), F.col(vec_col),
        _signature(F.col(vec_col), planes).alias("sig"))
    queries = (sig.filter(F.col(id_col).isin(query_ids))
                  .select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("qvec"),
                          F.col("sig").alias("qsig")))
    corpus = sig.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("nvec"),
                        F.col("sig").alias("nsig"))
    cand = corpus.join(
        F.broadcast(queries),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.bit_count(F.col("qsig").bitwiseXOR(F.col("nsig")))
           <= probe_hamming))
    scored = cand.withColumn("cos", _cosine(F.col("qvec"), F.col("nvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "rank", "neighbor_id",
                          F.round("cos", 4).alias("cosine")))
