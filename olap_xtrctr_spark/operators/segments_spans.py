"""Shared internals for the exact stride-1 duplicated-span operators
(one-shot and online variants live in ``segments.py``; the helpers sit
here so both keep one definition of gram extraction and span merging).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stride1_grams(docs: DataFrame, k: int, text_col: str,
                  id_col: str) -> DataFrame:
    """(id, _p, _sh): every complete lowercased k-token window at
    stride 1.  Round 11: built as a LINEAR zip_with chain over shifted
    array slices (the shingle_docs rework) — one rowwise projection,
    ZERO shuffles; the old lead-window form paid a doc-keyed
    full-corpus exchange before the consumer's own.  posexplode keeps
    the 0-based window position; docs shorter than k emit nothing
    (complete windows only), as before.

    r14 gram-kernel sweep result (recorded so later rounds don't redo
    it): an Arrow-kernel form of this function (positional sibling of
    dedup._gram_rows_kernel) was built, twin-verified bit-identical,
    and A/B'd on the real entries — and LOST or tied everywhere except
    docs_contamination_spans (5 alternating passes, sf0.1:
    duplicate_spans 0.50 -> 0.54 s med, duplicate_span_strip
    0.76 -> 0.93 s, winnow_span_dedup flat, contamination_spans
    0.54 -> 0.46 s).  Same finding as the shingle_docs sweep: the
    Python boundary only pays for itself when the kernel replaces the
    chain 1:1 into a single aggregating consumer (the r13 pair core);
    the span family's downstream windows dominate and the boundary is
    pure overhead.  The zip_with chain stays."""
    if k < 2:
        raise ValueError("duplicate_span_removal needs k >= 2 "
                         "(k=1 would mark every repeated token)")
    from .dedup import gram_zip_expr

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(F.col(id_col), toks.alias("_t"))
    expr = gram_zip_expr("_t", k, short="empty")
    return d.select(id_col,
                    F.posexplode(F.expr(expr)).alias("_p", "_sh"))


def merged_spans(marked: DataFrame, k: int, id_col: str) -> DataFrame:
    """Interval-merge MARKED window starts (id, _p) into maximal spans:
    (id, _sid, _ss, _se).  The merge window runs over marked positions
    only — duplicate-mass-sized, not corpus-sized."""
    marked = marked.select(id_col, F.col("_p").alias("_s"),
                           (F.col("_p") + F.lit(k - 1)).alias("_e"))
    wrun = Window.partitionBy(id_col).orderBy("_s")
    prev_end = F.max("_e").over(
        wrun.rowsBetween(Window.unboundedPreceding, -1))
    return (marked
            .withColumn("_brk", (prev_end.isNull()
                                 | (F.col("_s") > prev_end + 1))
                        .cast("long"))
            .withColumn("_sid", F.sum("_brk").over(
                wrun.rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow)))
            .groupBy(id_col, "_sid")
            .agg(F.min("_s").alias("_ss"), F.max("_e").alias("_se")))


def merged_span_report(docs: DataFrame, marked: DataFrame, k: int,
                       text_col: str, id_col: str) -> DataFrame:
    """Per-document span report: (id, n_tokens, n_dup_spans,
    n_dup_tokens, dup_spans)."""
    spans = merged_spans(marked, k, id_col)
    per_doc = (spans.groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
                    F.sum(F.col("_se") - F.col("_ss") + 1).cast("bigint")
                     .alias("n_dup_tokens"),
                    F.array_join(F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("_ss", "_se"))),
                        lambda x: F.concat_ws(
                            "-", x["_ss"].cast("string"),
                            x["_se"].cast("string"))), ",")
                    .alias("dup_spans")))
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = docs.select(id_col, F.size(toks).cast("bigint")
                       .alias("n_tokens"))
    return (base.join(per_doc, id_col, "left")
            .select(id_col, "n_tokens",
                    F.coalesce("n_dup_spans", F.lit(0)).cast("bigint")
                     .alias("n_dup_spans"),
                    F.coalesce("n_dup_tokens", F.lit(0)).cast("bigint")
                     .alias("n_dup_tokens"),
                    F.coalesce("dup_spans", F.lit("")).alias("dup_spans")))
