"""End-to-end training-corpus preparation: the canonical composition of
the pipeline operators (quality gate → exact dedup → deterministic
split) as one declarative plan.

Everything stays one Spark lineage — no intermediate materialization,
so Catalyst sees the whole pipeline and prunes/pushes across stage
boundaries (the quality-score computation and the fingerprint are both
narrow projections over the same scan; the only shuffle is the dedup
groupBy and the split is free).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_split
from .text import fingerprint, quality_score


def _gate_and_dedup(docs: DataFrame, min_quality: float,
                    id_col: str) -> DataFrame:
    """Shared first stages of the prep pipelines: quality gate, then
    keep-first exact dedup evaluated AFTER the gate (the survivor is
    the lowest-id doc among those that passed, so a low-quality earlier
    copy cannot shadow a high-quality later one).  One definition so
    prepare_corpus and prepare_chunks can never desynchronize from each
    other or their twin SQL oracles."""
    q = quality_score(docs).filter(
        F.col("quality_score") >= min_quality).select(id_col)
    passed = docs.join(q, on=id_col, how="left_semi")
    fp = passed.join(fingerprint(passed).select(id_col, "fingerprint"),
                     on=id_col)
    w = Window.partitionBy("fingerprint")
    return (fp.withColumn("_min_id", F.min(id_col).over(w))
            .filter(F.col(id_col) == F.col("_min_id"))
            .drop("_min_id", "fingerprint"))


def prepare_corpus(docs: DataFrame, min_quality: float = 0.5,
                   weights: dict[str, float] | None = None,
                   id_col: str = "doc_id") -> DataFrame:
    """quality-filter → keep-first exact dedup → train/val split.

    Returns (id_col, split) for the surviving corpus.  Keep-first is
    evaluated AFTER the quality gate (the survivor is the lowest-id doc
    among the docs that passed, so a low-quality earlier copy cannot
    shadow a high-quality later one).
    """
    weights = weights or {"train": 0.9, "val": 0.1}
    kept = _gate_and_dedup(docs, min_quality, id_col)
    return hash_split(kept, weights, id_col=id_col).select(id_col, "split")


def prepare_chunks(docs: DataFrame, min_quality: float = 0.5,
                   chunk_tokens: int = 64, stride: int = 48,
                   id_col: str = "doc_id",
                   shard_col: str = "source") -> DataFrame:
    """The chunk-level continuation of ``prepare_corpus``: quality gate →
    keep-first exact dedup → overlapping context-window chunks, still as
    ONE Catalyst lineage (the chunker's posexplode sits directly on the
    dedup output — no materialization between stages, so column pruning
    reaches the original scan and the only shuffle is the dedup window).

    Chunks keep ``shard_col`` so a downstream ``pack_sequences``-style
    packer can bin them per shard without a global window.  Returns
    (id_col, shard_col, chunk_idx, chunk_start, n_chunk_tokens,
    chunk_text) for the surviving corpus.
    """
    from .text import chunk_overlap
    kept = _gate_and_dedup(docs, min_quality, id_col)
    return chunk_overlap(kept, chunk_tokens=chunk_tokens, stride=stride,
                         id_col=id_col, keep_cols=(shard_col,))
