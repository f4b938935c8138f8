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
                          F.col(vec_col).alias("qvec")))
    corpus = emb.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("nvec"))
    scored = (
        corpus.join(F.broadcast(queries),
                    F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cos", _cosine(F.col("qvec"), F.col("nvec")))
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
