"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are JVM-side builtins (regexp_count, split,
md5) — no Python UDFs — so they stay inside whole-stage codegen and
scale linearly with partitions.
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .fixedlog import fxln
from .hostmath import ln_micro, lookup_df, micro

PUNCT_CLASS = "[.,;:!?]"

# language-ID stopword sets (tiny n-gram-free heuristic; deterministic and
# SQL-expressible so the DuckDB oracle can reproduce it exactly)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
}


def _word_hits(col, words: list[str]):
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, punctuation count/ratio, char count."""
    t = F.col(text_col)
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    n_punct = F.regexp_count(t, F.lit(PUNCT_CLASS))
    n_chars = F.length(t)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_punct.cast("int").alias("n_punct"),
        n_chars.alias("len_chars"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  extra: dict | None = None) -> DataFrame:
    """Composite quality heuristic: length band + stopword density -
    punctuation noise.  Deterministic arithmetic over builtins only.

    ``extra``: {name: Column} evaluated in the SAME projection, so a
    consumer needing both the score and other text-derived columns
    (corpus card, budget fill) pays one scan of the wide text column
    instead of a self-join of two scans."""
    t = F.col(text_col)
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    n_chars = F.greatest(F.length(t), F.lit(1))
    stop_hits = _word_hits(t, LANG_STOPWORDS["en"])
    punct = F.regexp_count(t, F.lit(PUNCT_CLASS))
    mean_tok_len = n_chars / F.greatest(n_tokens, F.lit(1))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 5000), F.lit(0.4)).otherwise(0.0)
        + F.least(stop_hits / F.greatest(n_tokens, F.lit(1)) * 2.0, F.lit(0.4))
        - F.least(punct / n_chars * 5.0, F.lit(0.2))
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0), F.lit(0.2))
           .otherwise(0.0)
    )
    cols = ["doc_id", n_tokens.alias("n_tokens"),
            F.round(score, 4).alias("quality_score")]
    if extra:
        cols += [c.alias(name) for name, c in extra.items()]
    return docs.select(*cols)


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language guess over {en,es,fr,de}, 'und' when no hits.
    Ties break by fixed language order (en,es,fr,de)."""
    t = F.col(text_col)
    hits = {lang: _word_hits(t, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    guess = (
        F.when(best == 0, F.lit("und"))
         .when(hits["en"] == best, F.lit("en"))
         .when(hits["es"] == best, F.lit("es"))
         .when(hits["fr"] == best, F.lit("fr"))
         .otherwise(F.lit("de"))
    )
    return docs.select(
        "doc_id", "lang",
        *[hits[lg].cast("int").alias(f"hits_{lg}") for lg in LANG_STOPWORDS],
        guess.alias("lang_guess"),
    )


# Character-trigram profiles per language (Cavnar & Trenkle 1994
# style, hand-distilled to the highest-frequency DISTINCTIVE trigrams
# of each language — the same closed {en,es,fr,de} universe as the
# stopword voter).  Spaces mark word boundaries, the signal the
# original paper leans on.
LANG_TRIGRAMS = {
    "en": [" th", "the", "he ", "ing", "nd ", " of", "of ", " an",
           "and", "ion"],
    "es": [" de", "de ", " la", "la ", "os ", " qu", "que", "ue ",
           "ión", " el"],
    "fr": [" le", "le ", " de", "es ", "ent", " et", "et ", "ion",
           " la", "que"],
    "de": ["en ", "er ", " de", "der", "ie ", "ein", "ich", "sch",
           "und", "ch "],
}


def lang_id_ngram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-n-gram language ID (the Cavnar-Trenkle family, the
    brief's literal "n-gram heuristic"): count occurrences of each
    language's distinctive trigram set in the lowercased text and vote
    — robust where the stopword voter (``lang_id``) is blind, e.g.
    agglutinated or punctuation-stripped text where word-boundary
    stopwords never match as whole words.  'und' when nothing hits;
    ties break by fixed language order.  Pure JVM regexp_count over
    literal patterns — no Python, no UDF."""
    t = F.lower(F.col(text_col))
    hits = {}
    for lg, grams in LANG_TRIGRAMS.items():
        pat = "|".join(re.escape(g) for g in grams)
        hits[lg] = F.regexp_count(t, F.lit(pat))
    best = F.greatest(*hits.values())
    guess = (
        F.when(best == 0, F.lit("und"))
         .when(hits["en"] == best, F.lit("en"))
         .when(hits["es"] == best, F.lit("es"))
         .when(hits["fr"] == best, F.lit("fr"))
         .otherwise(F.lit("de"))
    )
    return docs.select(
        "doc_id", "lang",
        *[hits[lg].cast("int").alias(f"tri_{lg}") for lg in LANG_TRIGRAMS],
        guess.alias("lang_guess"),
    )


def top_tokens(docs: DataFrame, k: int = 20,
               text_col: str = "text") -> DataFrame:
    """Corpus-wide top-k tokens: explode → count (map-side combined) →
    ``ORDER BY … LIMIT k``, which Catalyst compiles to
    TakeOrderedAndProject — each partition keeps its own top-k and only
    k·P rows ever merge, so no task sorts the full vocabulary (a global
    rank window would funnel the whole corpus vocab through one reducer
    at 100 TB).  Ranks are assigned afterwards over just the k survivors."""
    from pyspark.sql import Window
    toks = docs.select(F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"))
    counts = (toks.filter(F.col("token") != "")
                  .groupBy("token")
                  .agg(F.count(F.lit(1)).alias("n")))
    topk = counts.orderBy(F.desc("n"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))  # k rows only
    return (topk.withColumn("rank", F.row_number().over(w))
                .select("rank", "token", "n"))


def quality_threshold_sweep(docs: DataFrame,
                            text_col: str = "text") -> DataFrame:
    """The cutoff-picking curve: for every DISTINCT quality score
    (milli-units), how many documents and whitespace tokens survive a
    ``quality >= threshold`` filter — the table a pipeline owner reads
    before committing to a quality cutoff, instead of guessing one and
    re-running the corpus.  Shares are exact integer milli-units.

    Scale shape: one map-side-combinable aggregation to (score,
    n_docs, n_tokens) — rows bounded by score cardinality (milli ints,
    <= a few thousand) — then running totals over that TINY table.
    The corpus is touched once; the window never sees corpus rows."""
    scored = quality_score(docs, text_col).select(
        "n_tokens",
        F.round(F.col("quality_score") * 1000).cast("bigint")
         .alias("threshold_milli"))
    per = (scored.groupBy("threshold_milli")
           .agg(F.count(F.lit(1)).alias("_d"),
                F.sum("n_tokens").cast("bigint").alias("_t")))
    w = (Window.orderBy(F.desc("threshold_milli"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (per
            .withColumn("kept_docs", F.sum("_d").over(w).cast("bigint"))
            .withColumn("kept_tokens", F.sum("_t").over(w).cast("bigint"))
            .withColumn("total_docs", F.sum("_d").over(wt).cast("bigint"))
            .withColumn("total_tokens", F.sum("_t").over(wt).cast("bigint"))
            .select("threshold_milli", "kept_docs", "kept_tokens",
                    F.expr("CAST((kept_docs * 1000) DIV total_docs "
                           "AS BIGINT)").alias("kept_docs_milli"),
                    F.expr("CAST((kept_tokens * 1000) DIV total_tokens "
                           "AS BIGINT)").alias("kept_tokens_milli")))


def build_vocab(docs: DataFrame, max_size: int = 1000,
                min_count: int = 2,
                text_col: str = "text") -> DataFrame:
    """Frequency vocabulary for tokenizer prep: whitespace-lowercase
    tokens with corpus count >= ``min_count``, the ``max_size`` most
    frequent, ids assigned by (count desc, token asc) so the mapping
    is total-order deterministic across engines and partitionings —
    token_id 0 is the most frequent token.

    Scale shape: one map-side-combinable count aggregation, then
    ORDER BY + LIMIT compiles to TakeOrderedAndProject (per-partition
    top-k, k·P-row merge — the same never-sort-the-vocab shape as
    ``top_tokens``); the id window runs over max_size survivors only."""
    from pyspark.sql import Window
    toks = docs.select(F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"))
    counts = (toks.filter(F.col("token") != "")
              .groupBy("token")
              .agg(F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") >= min_count))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(max_size)
    w = Window.orderBy(F.desc("n"), F.asc("token"))   # max_size rows only
    return (top.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("bigint"))
        .select("token_id", "token", "n"))


# GPT-2-style pre-tokenizer, constrained to syntax BOTH Java regex (Spark)
# and RE2 (the DuckDB oracle) accept: \p{L}/\p{N} classes yes, but NO
# lookahead — the canonical pattern's trailing `\s+(?!\S)` branch is
# dropped, which only changes how runs of trailing whitespace group (one
# token either way for the counting use-case).
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def token_count_bpe(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace AND BPE-ish token counts per document — the cheap
    JVM-side proxy for 'how many model tokens is this corpus' that a
    pretrain budget estimate needs before any real tokenizer runs.
    regexp_count stays inside codegen: narrow, shuffle-free."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(t), r"\s+")).cast("bigint")
         .alias("n_tokens_ws"),
        F.regexp_count(t, F.lit(BPE_SPLIT_PATTERN)).cast("bigint")
         .alias("n_tokens_bpe"),
    )


def fingerprint_expr(text_col: str = "text"):
    """Column expression for the document fingerprint: md5 over the
    lowercased alphanumeric skeleton (whitespace/punct-insensitive
    near-exact dedup key).  Exposed separately so consumers can compute
    it IN PLACE instead of joining the projection back on id."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    return F.md5(F.encode(norm, "UTF-8"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint projection (see fingerprint_expr)."""
    return docs.select(
        "doc_id",
        fingerprint_expr(text_col).alias("fingerprint"),
    )


def vocab_coverage(docs: DataFrame, vocab_size: int = 1000,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Tokenizer-prep coverage check: build the top-``vocab_size`` corpus
    vocabulary (deterministic ties by token) and report per document the
    exact token and out-of-vocabulary counts — the number a vocab-size
    decision needs ('what OOV rate does a 32k vocab leave on this
    corpus?').

    The vocab comes from the same map-side-combined count + ORDER BY /
    LIMIT shape as ``top_tokens`` (TakeOrderedAndProject — no global
    vocabulary sort) and is broadcast back against the exploded tokens:
    bounded by ``vocab_size``, a few MB, never the corpus.  All-integer
    output, oracle-exact."""
    toks = docs.select(
        id_col, F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                  r"\s+")).alias("token"))
    nonempty = toks.filter(F.col("token") != "")
    vocab = (nonempty.groupBy("token")
             .agg(F.count(F.lit(1)).alias("n"))
             .orderBy(F.desc("n"), F.asc("token"))
             .limit(vocab_size)
             .select("token", F.lit(1).alias("_in_vocab")))
    return (nonempty.join(F.broadcast(vocab), "token", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.when(F.col("_in_vocab").isNull(), 1)
                        .otherwise(0)).alias("n_oov")))


# ---- PII redaction ---------------------------------------------------------

# Conservative, auditable patterns (the point at corpus scale is a cheap
# JVM-side first pass that removes the bulk of obvious identifiers before
# any expensive model-based scrubbing):
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace email/phone/IPv4 literals with ``[TYPE]`` tokens and count
    the hits per type.  Chained regexp_replace/regexp_count — all JVM
    builtins inside whole-stage codegen, a narrow single-pass transform
    (the shape a 100 TB scrub needs: no shuffle, no Python)."""
    t = F.col(text_col)
    out = docs
    red = t
    for name, pat in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(t, F.lit(pat)))
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    return out.withColumn("text_redacted", red)


# ---- sequence packing ------------------------------------------------------

def pack_sequences(docs: DataFrame, window_tokens: int = 2048,
                   text_col: str = "text",
                   order_col: str = "doc_id",
                   shard_col: str | None = None) -> DataFrame:
    """Assign each document a training-sequence bin by SEQUENTIAL packing:
    documents in deterministic ``order_col`` order are concatenated and
    cut every ``window_tokens`` whitespace tokens (the standard pretrain
    packing discipline — greedy bin-packing is NP-ish and order-dependent;
    sequential packing is what large pipelines actually run).

    bin = floor(cumulative_tokens_before_doc / window_tokens).

    ``shard_col=None`` runs ONE GLOBAL running sum — a single-reducer
    window, fine for bounded corpora but the scale constraint at 100 TB.
    Pass ``shard_col`` (a source/bucket key) to partition the window: each
    shard packs independently in parallel and the cumsum never leaves its
    partition — the form a real pretrain pipeline runs.  Bin ids are then
    per-shard; globally unique ids are (shard, pack_bin).
    """
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    if shard_col is not None:
        w = Window.partitionBy(shard_col).orderBy(order_col)
    else:
        w = Window.orderBy(order_col)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(n_tok).over(w) - n_tok        # tokens BEFORE this doc
    keys = [order_col] if shard_col is None else [order_col, shard_col]
    return docs.select(
        *keys, n_tok.alias("n_tokens"),
        (cum / window_tokens).cast("bigint").alias("pack_bin"))


def compression_ratio(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """zlib compressed-size / raw-size per document — the classic cheap
    detector for boilerplate (ratio → 0) and random/garbled text
    (ratio → 1+), used alongside the Gopher repetition rules.

    zlib isn't expressible in SQL builtins, so this is the documented
    slow path done right: an Arrow-batched pandas_udf (one Python call
    per ~10k-row batch, not per row), narrow, shuffle-free.  Determinism
    holds for a fixed zlib version (level 6 default)."""
    from pyspark.sql.functions import pandas_udf

    def _ratio_batch(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw)) / len(raw), 4)
        return texts.map(one)

    # inline annotations would be stringified by this module's
    # `from __future__ import annotations` and pyspark can't resolve
    # 'pd.Series' from a local import — set real class objects instead
    import pandas as pd
    _ratio_batch.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _ratio = pandas_udf(_ratio_batch, "double")

    return docs.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        _ratio(F.col(text_col)).alias("compression_ratio"))


# ---- intra-document repetition (Gopher-style quality rules) ---------------

def _gram_expr(k: int) -> str:
    """SQL expr building the word-k-gram array from the `_toks` column —
    all inside codegen: no explode, no shuffle, one pass per row.  The
    size guard matters twice: sequence(1, 0) yields a DESCENDING [1, 0]
    (not empty), and ANSI mode makes the out-of-bounds subscript throw."""
    parts = ", ".join(f"_toks[i-1+{j}]" for j in range(k))
    return (f"if(size(_toks) < {k}, array(), "
            f"transform(sequence(1, size(_toks)-{k - 1}), "
            f"i -> concat_ws(' ', {parts})))")


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    'Scaling Language Models', Table A1): duplicate-token and duplicate
    2-/3-gram mass.  Emitted as EXACT integer counts (total vs distinct)
    so any oracle agrees bit-for-bit; callers derive fractions.  Pure
    per-row array arithmetic — narrow, shuffle-free, codegen-friendly:
    the shape a 100 TB quality scrub needs."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.withColumn("_toks", toks)
    out = d.select(
        id_col,
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(F.col("_toks"))).cast("bigint")
         .alias("n_distinct_tokens"),
        *[c for k in (2, 3) for c in (
            F.greatest(F.size("_toks") - (k - 1), F.lit(0)).cast("bigint")
             .alias(f"n_{k}grams"),
            F.size(F.array_distinct(F.expr(_gram_expr(k)))).cast("bigint")
             .alias(f"n_distinct_{k}grams"))],
    )
    return out


def repetition_filter(docs: DataFrame,
                      max_dup_token_frac: float = 0.7,
                      max_dup_2gram_frac: float = 0.5,
                      min_tokens: int = 10,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Keep documents whose repeated-token / repeated-2-gram mass stays
    under the Gopher-style thresholds.  Same per-row arithmetic as
    repetition_stats, fused into one filter — predicate-only, so Catalyst
    keeps it next to the scan and nothing widens."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.withColumn("_toks", toks)
    n = F.size("_toks").cast("double")
    n2 = F.greatest(F.size("_toks") - 1, F.lit(0)).cast("double")
    dup_tok = F.when(n > 0, 1.0 - F.size(F.array_distinct(F.col("_toks"))) / n
                     ).otherwise(0.0)
    dup_2g = F.when(n2 > 0, 1.0 - F.size(
        F.array_distinct(F.expr(_gram_expr(2)))) / n2).otherwise(0.0)
    return (d.filter((F.size("_toks") >= min_tokens)
                     & (dup_tok <= max_dup_token_frac)
                     & (dup_2g <= max_dup_2gram_frac))
            .drop("_toks"))


def chunk_overlap(docs: DataFrame, chunk_tokens: int = 64,
                  stride: int = 48, text_col: str = "text",
                  id_col: str = "doc_id",
                  keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Split each document into fixed-size token chunks with overlap —
    the standard context-window prep for training/embedding pipelines
    (chunk i covers tokens [i*stride, i*stride + chunk_tokens)).

    All JVM-side: tokenize once per row, build the start offsets with a
    stepped ``sequence``, ``posexplode`` — a narrow rowwise expansion
    with no shuffle, so a 100 TB chunking pass is pure map work that
    scales with partitions.  The final (possibly short) chunk is kept:
    every token lands in at least one chunk.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = docs.withColumn("_toks", toks)
    starts = F.expr(
        f"sequence(0, greatest(size(_toks) - 1, 0), {int(stride)})")
    d = d.select(id_col, *keep_cols, "_toks",
                 F.posexplode(starts).alias("chunk_idx", "chunk_start"))
    chunk = F.expr(f"slice(_toks, chunk_start + 1, {int(chunk_tokens)})")
    return (d.withColumn("_chunk", chunk)
            .select(id_col, *keep_cols,
                    F.col("chunk_idx").cast("int").alias("chunk_idx"),
                    F.col("chunk_start").cast("bigint").alias("chunk_start"),
                    F.size("_chunk").cast("bigint").alias("n_chunk_tokens"),
                    F.concat_ws(" ", "_chunk").alias("chunk_text")))


def boilerplate_ngrams(docs: DataFrame, n: int = 8, min_docs: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Verbatim token ``n``-gram spans shared by at least ``min_docs``
    DISTINCT documents — the RefinedWeb/C4-style boilerplate detector
    (repeated headers, licence blurbs, navigation chrome) run intra-
    corpus rather than against an external set (that cross-set form is
    ``contamination_check``).

    Shape at scale: per-row n-gram generation inside codegen (no
    cross-row work), one explode, then a count-distinct-docs aggregate
    that map-side combines on the n-gram key.  Spans below ``min_docs``
    dominate the long tail and die in the partial aggregate — the
    surviving output is bounded by true boilerplate mass, not corpus
    size."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = (docs.withColumn("_toks", toks)
             .select(id_col, F.explode(F.expr(_gram_expr(n))).alias("ngram")))
    return (grams.groupBy("ngram")
            .agg(F.count_distinct(id_col).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_docs") >= min_docs))


def boilerplate_filter(docs: DataFrame, n: int = 8, min_docs: int = 3,
                       max_frac: float = 0.5, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """The actionable form of ``boilerplate_ngrams``: DROP documents
    whose token n-grams are mostly corpus boilerplate (shared by >=
    ``min_docs`` docs) — a template page is boilerplate even when no
    single doc duplicates it whole.  Documents too short to have any
    n-gram are kept (no evidence against them).

    Two aggregates over one exploded gram table (the boiler set and the
    per-doc tallies share the explode), a broadcast-friendly semi-join
    on the gram key, then a doc-level filter — no all-pairs anything."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = (docs.withColumn("_toks", toks)
             .select(id_col, F.explode(F.expr(_gram_expr(n))).alias("ngram")))
    boiler = (grams.groupBy("ngram")
              .agg(F.count_distinct(id_col).alias("_nd"))
              .filter(F.col("_nd") >= min_docs)
              .select("ngram", F.lit(1).alias("_b")))
    per_doc = (grams.join(boiler, on="ngram", how="left")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("_n_grams"),
                    F.sum(F.when(F.col("_b").isNotNull(), 1).otherwise(0))
                     .alias("_n_boiler")))
    return (docs.join(per_doc, on=id_col, how="left")
            .filter(F.col("_n_grams").isNull()
                    | (F.col("_n_boiler") <= max_frac * F.col("_n_grams")))
            .drop("_n_grams", "_n_boiler"))


def strip_markup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Boilerplate cleaning pass: drop HTML/XML tags, unescape the five
    XML entities, collapse runs of whitespace.  Chained JVM regex —
    narrow, shuffle-free, codegen-friendly (same family as redact_pii).
    """
    t = F.col(text_col)
    no_tags = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        no_tags = F.replace(no_tags, F.lit(ent), F.lit(ch))
    clean = F.trim(F.regexp_replace(no_tags, r"\s+", " "))
    return docs.withColumn("text_clean", clean)


def token_familiarity(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Unigram-LM proxy in exact integers: for each doc, the sum of the
    CORPUS frequency of its tokens (and its token count) — high mass =
    common language, low = rare/garbled text.  Callers derive the
    average familiarity ratio; the engine emits only exact counts so any
    oracle agrees bit-for-bit.

    Two aggregations: global token counts (map-side combined, bounded by
    vocabulary), broadcast-or-shuffle joined back to the exploded
    tokens.  No floats anywhere.
    """
    toks = docs.select(
        id_col, F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                  r"\s+")).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tok_freq"))
    return (toks.join(vocab, on="token")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("tok_freq").alias("familiarity_sum")))


def lexical_diversity(docs: DataFrame, group_col: str = "source",
                      text_col: str = "text") -> DataFrame:
    """Per-group lexical diversity: distinct token types vs total tokens
    (type-token ratio), the corpus-health number that separates a
    boilerplate-heavy dump from genuine prose before mixing weights are
    chosen.  Ratio reported as exact integer milli-units
    ((types*1000) DIV tokens) so an external oracle matches bit-for-bit.

    Scale shape: explode → two-level aggregation (group, token) → group,
    both map-side combinable; no per-group token set is ever collected
    into one place, so a group with a billion tokens costs the same
    shuffle shape as one with a thousand.
    """
    toks = (docs.select(F.col(group_col).alias(group_col),
                        F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                          r"\s+")).alias("token"))
            .filter(F.col("token") != ""))
    per = toks.groupBy(group_col, "token").agg(F.count(F.lit(1)).alias("n"))
    return (per.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_types"),
                 F.sum("n").alias("n_tokens"))
            .withColumn("ttr_milli",
                        F.expr("CAST((n_types * 1000) DIV n_tokens "
                               "AS BIGINT)")))


# ---- corpus composition: distribution shift & distinctive terms ------------

def _source_token_joint(docs: DataFrame, group_col: str, text_col: str):
    """Shared intermediate for the corpus-composition diagnostics: the
    per-(group, token) count joined with the corpus-wide token count,
    per-group total, and grand total — every number a distribution
    comparison needs, all as DECIMAL(19,0) so the cross-multiplied
    products below stay exact far past BIGINT range (c·T at web scale is
    ~1e25; the capped product type DECIMAL(38,0) holds it).

    Plan shape: explode → (group, token) count → token-keyed join with
    the corpus counts (the one real shuffle, keyed on the token
    vocabulary, not rows) → broadcast of the per-group totals (dozens of
    rows) and the grand-total scalar."""
    toks = (docs.select(F.col(group_col).alias("source"),
                        F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                          r"\s+")).alias("token"))
            .filter(F.col("token") != ""))
    per = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("c"))
    corpus = per.groupBy("token").agg(F.sum("c").alias("ct"))
    src = per.groupBy("source").agg(F.sum("c").alias("ts"))
    tot = src.agg(F.sum("ts").alias("t"))
    return (per.join(corpus, "token")
               .join(F.broadcast(src), "source")
               .crossJoin(F.broadcast(tot)))


def source_tv_distance(docs: DataFrame, group_col: str = "source",
                       text_col: str = "text") -> DataFrame:
    """Distribution shift per group: the total-variation distance between
    each group's unigram distribution and the whole corpus's,
    TV = 1/2 · Σ_t |p_group(t) − p_corpus(t)| — THE number a mixing
    decision needs before reweighting sources (a dump whose token
    distribution sits far from the blend target shifts the trained
    model; Xie et al. 2023 DoReMi motivates exactly this measurement).

    Everything is exact cross-multiplied integer arithmetic — no floats,
    no logs — so any ANSI oracle agrees bit-for-bit:
    |c·T − C_t·T_s| summed over the group's tokens, plus T_s·(T − Σ C_t)
    for the mass of tokens the group never uses; reported as
    ``tv_milli = (500·num) DIV (T_s·T)`` (exact milli-units of TV, which
    lives in [0, 1]).  KL would need logarithms and a float tolerance;
    TV bounds it (Pinsker) and stays integer-exact.

    Output: (source, n_tokens, tv_milli), one row per group.
    """
    j = _source_token_joint(docs, group_col, text_col)
    agg = j.groupBy("source").agg(
        F.sum(F.abs(F.col("c") * F.col("t")
                    - F.col("ct") * F.col("ts"))).alias("abs_part"),
        F.sum("ct").alias("cov"),
        F.first("ts").alias("ts"), F.first("t").alias("t"))
    return agg.select(
        "source",
        F.col("ts").cast("bigint").alias("n_tokens"),
        F.expr("CAST((500 * (abs_part + ts * (t - cov))) DIV (ts * t) "
               "AS BIGINT)").alias("tv_milli"))


def distinctive_terms(docs: DataFrame, group_col: str = "source",
                      text_col: str = "text", top_n: int = 5,
                      min_count: int = 5) -> DataFrame:
    """Top distinctive terms per group by exact-integer lift: how many
    times more frequent a token is inside the group than in the corpus,
    ``lift_ppm = (c·T·1e6) DIV (C_t·T_s)`` (1,000,000 = corpus-average).
    The TF-IDF idea with the log taken out so the score is
    cross-engine-exact; ranking by a monotone transform preserves the
    order anyway.  ``min_count`` suppresses one-off typos that would
    otherwise dominate any lift ranking.

    Ties rank deterministically (lift DESC, token ASC — row_number, not
    rank) so pagination and oracles agree.  The per-group window state
    is bounded by the group's vocabulary, not its rows.

    Output: (source, token, n, lift_ppm, rn), top_n rows per group.
    """
    j = _source_token_joint(docs, group_col, text_col)
    w = Window.partitionBy("source").orderBy(F.desc("lift_ppm"),
                                             F.asc("token"))
    return (j.filter(F.col("c") >= min_count)
             .withColumn("lift_ppm",
                         F.expr("CAST((c * t * 1000000) DIV (ct * ts) "
                                "AS BIGINT)"))
             .withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= top_n)
             .select("source", "token", F.col("c").cast("bigint").alias("n"),
                     "lift_ppm", "rn"))


def normalize_unicode(docs: DataFrame, text_col: str = "text",
                      form: str = "NFC",
                      out_col: str = "text_norm") -> DataFrame:
    """Unicode normalization of the text column — the step that MUST
    run before any hash-based dedup on real web text: 'e'+COMBINING
    ACUTE and the precomposed 'é' hash differently, so un-normalized
    corpora silently miss duplicates that differ only in encoding
    form.  NFC/NFD/NFKC/NFKD per ``unicodedata``; NFKC additionally
    folds compatibility characters (ligatures, full-width forms) and is
    the common choice for training corpora.

    Spark has no builtin for this, so it is the documented slow path
    done right: an Arrow-batched pandas_udf (one Python call per batch,
    not per row), narrow and shuffle-free — the same justification
    envelope as ``compression_ratio``.  Idempotent: already-normalized
    ASCII passes through byte-identical, so the oracle contract holds
    on any corpus.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    def _norm_batch(texts):
        import unicodedata

        return texts.map(
            lambda t: None if t is None
            else unicodedata.normalize(form, t))

    import pandas as pd
    _norm_batch.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _norm = pandas_udf(_norm_batch, "string")
    return docs.withColumn(out_col, _norm(F.col(text_col)))


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BM25 ranked retrieval (Robertson/Lucene idf variant) — the
    lexical scorer ``hybrid_search``'s substring filter is not: term
    frequency saturation (k1) and length normalization (b) over an
    exact document-frequency idf.

    Cross-engine exactness, same discipline as the DSIR family: idf is
    frozen to integer micro-units ONCE PER TERM (the only ln),
    computed on the DRIVER with the fixed-op ln (``fixedlog.py`` — the
    per-term df table is |terms| rows, trivially collectable); each
    (doc, term) contribution — idf_micro × the tf/length fraction,
    which uses only IEEE-exact +,×,/ on literals — rounds to integer
    milli-units BEFORE the per-doc sum, so the final score is an
    order-independent integer an oracle reproduces bit-for-bit on any
    host, independent of the JVM's libm.

    Scale shape: one explode over matching tokens only (the isin
    filter lands before the shuffle), per-doc length from a
    map-side-combinable count, the per-term idf table and corpus
    totals broadcast; top-k is TakeOrderedAndProject."""
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = docs.select(
        id_col, F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                  r"\s+")).alias("token"))
    # r13 (guide §5): dl feeds the eager corpus-totals aggregate AND
    # the final join; hits feeds the driver's per-term df collect AND
    # the tf aggregate — unpinned, the full-corpus token explode re-ran
    # 4x per call.  dl is one slim row per doc; hits is the queried
    # terms' posting rows (what any retrieval engine materializes).
    # Both are order-independent counts/filters — identity-safe pins,
    # released per entry / request / bench pass.
    from ..session import track_persist
    dl = track_persist(
        toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl")))
    tot = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("dl").alias("total_len"))
    hits = track_persist(
        toks.filter(F.col("token").isin([t.lower() for t in terms])))
    dfreq = (hits.select(id_col, "token").distinct()
             .groupBy("token").agg(F.count(F.lit(1)).alias("df")))
    # |terms| rows + one scalar: freeze idf on the driver with the
    # fixed-op ln (fixedlog.py — libm-free), mirroring the oracle
    # ladder's ((n_docs - df + 0.5)/(df + 0.5) + 1.0) arg op-for-op
    # so the doubles agree bit-for-bit before ROUND on ANY engine.
    spark = docs.sparkSession
    n_docs_v = int(tot.first()["n_docs"] or 0)
    idf_pairs = [(r["token"],
                  micro(fxln(
                      (n_docs_v - r["df"] + 0.5) / (r["df"] + 0.5)
                      + 1.0)))
                 for r in dfreq.collect()]
    idf = lookup_df(spark, idf_pairs, "token", "idf_micro", "string")
    tf = hits.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    scored = (tf.join(dl, id_col)
              .join(F.broadcast(idf), "token")
              .crossJoin(F.broadcast(tot))
              .withColumn("contrib_milli", F.round(
                  F.col("idf_micro")
                  * (F.col("tf") * (k1 + 1.0)
                     / (F.col("tf") + k1 * (1.0 - b + b * (
                         F.col("dl") * F.col("n_docs")
                         / F.col("total_len")))))
                  / 1000.0).cast("bigint"))
              .groupBy(id_col)
              .agg(F.sum("contrib_milli").alias("score_milli"),
                   F.count(F.lit(1)).alias("n_terms_hit")))
    top = scored.orderBy(F.desc("score_milli"), F.asc(id_col)).limit(k)
    win = Window.orderBy(F.desc("score_milli"), F.asc(id_col))
    return (top.withColumn("rank", F.row_number().over(win))
               .select("rank", id_col, "n_terms_hit", "score_milli"))


def ngram_lm_score(docs: DataFrame, reference_cond=None,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """CCNet-style n-gram LM scoring (Wenzek et al. 2020 filter corpora
    by the perplexity of a small LM trained on a clean reference): an
    add-one-smoothed BIGRAM model is trained distributedly on the
    ``reference_cond`` slice (default: the whole corpus — self-scoring,
    which still separates fluent text from boilerplate/noise) and every
    document is scored with its mean negative log-likelihood per
    bigram.

    Exactness discipline (the DSIR move, ``sampling.py``): the only
    float op — ln — happens once per DISTINCT count value (count-of-
    counts, bounded driver metadata) plus one backoff constant, frozen
    to integer MICRO-units ON THE DRIVER with the host libm
    (``fixedlog.py`` via ``hostmath.py`` — LIBM-FREE: the JVM's
    ``Math.log``, CPython's libm and each DuckDB build's libm all
    disagree in the last ulp for some args, which flips ``ROUND`` near
    .5 boundaries; the round-7 and round-8 drivers each caught one
    layer of that, so no frozen value touches any libm now).  A document's score is then exact integer arithmetic (sum
    of micro-NLLs DIV bigram count), so DuckDB reproduces it
    bit-for-bit on any host.

    Scale shape: one map-side-combinable count over reference bigrams
    and unigrams; the model is a (bigram -> nll_micro) table joined
    back to the corpus bigram stream — a shuffle join on the bigram
    key (the model table is corpus-vocabulary-sized, NOT broadcastable
    at 100 TB; Spark picks SMJ/SHJ as sizes dictate), plus one rollup
    per doc.  Unseen bigrams take the per-context backoff
    ln(C(w1)+V) cost via the unigram table — also a join, no driver
    state anywhere."""
    t = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(id_col, F.col(text_col)).withColumn("_t", t)
    n = F.size("_t")
    bigrams = F.zip_with(
        F.slice("_t", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("_t", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    doc_big = d.select(id_col, F.explode(bigrams).alias("bg"))
    w1 = F.split(F.col("bg"), " ")[0]

    ref = docs.filter(reference_cond) if reference_cond is not None \
        else docs
    rt = ref.select(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
                    .alias("_t"))
    rn = F.size("_t")
    ref_big = rt.select(F.explode(F.zip_with(
        F.slice("_t", 1, F.greatest(rn - 1, F.lit(0))),
        F.slice("_t", 2, F.greatest(rn - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))).alias("bg"))
    ref_uni = rt.select(F.explode("_t").alias("w"))

    # r13 (guide §5, signature-pin discipline): both count tables feed
    # the driver's distinct-count LUT collects AND the final scoring
    # joins — unpinned, the reference-corpus explode re-ran 3x (uni) /
    # 2x (big) per call.  Vocabulary-sized order-independent counts:
    # identity-safe pins, released per entry / request / bench pass.
    # V (distinct unigrams) is exactly c1's row count, so it rides the
    # pinned table instead of re-aggregating the explode.
    from ..session import track_persist
    c1 = track_persist(
        ref_uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1")))
    c12 = track_persist(
        ref_big.groupBy("bg").agg(F.count(F.lit(1)).alias("c12")))
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    # nll(w2|w1) = ln(C(w1)+V) - ln(C12+1); unseen contexts fall back
    # to C(w1)=0.  Freeze each term to micro-units SEPARATELY so the
    # unseen-bigram path (c12=0 -> ln(1)=0) needs only the context
    # term, computable from the unigram table alone.
    #
    # The ln arguments are DISTINCT COUNT VALUES (count-of-counts): a
    # Zipfian corpus has thousands of distinct counts at any scale, so
    # collecting them is bounded metadata (the model tables themselves
    # — vocabulary-sized — never leave the cluster).  Computing the
    # frozen micro-values on the driver with the fixed-op ln
    # (fixedlog.py fixed-op ln) is what makes the freeze
    # engine-portable on ANY host/build; the cost
    # is one extra pass over the (already aggregated) count tables.
    spark = docs.sparkSession
    v = int(vocab.first()["v"] or 0)
    if v == 0:
        raise ValueError(
            "ngram_lm_score: reference slice has no tokens to train on")
    c1_vals = [r["c1"] for r in c1.select("c1").distinct().collect()]
    c12_vals = [r["c12"] for r in c12.select("c12").distinct().collect()]
    ctx_lut = lookup_df(spark, ((c, ln_micro(c + v)) for c in c1_vals),
                        "c1", "ctx_micro")
    hit_lut = lookup_df(spark, ((c, ln_micro(c + 1)) for c in c12_vals),
                        "c12", "hit_micro")
    ctx = c1.join(F.broadcast(ctx_lut), "c1").select("w", "ctx_micro")
    seen = (c12.join(F.broadcast(hit_lut), "c12")
            .select("bg", "hit_micro"))
    oov_ctx_micro = ln_micro(float(v))

    scored = (doc_big
              .withColumn("w1", w1)
              .join(seen, "bg", "left")
              .join(ctx.withColumnRenamed("w", "w1"), "w1", "left")
              .select(
                  id_col,
                  (F.coalesce(F.col("ctx_micro"),
                              F.lit(oov_ctx_micro))
                   - F.coalesce(F.col("hit_micro"), F.lit(0)))
                  .alias("nll_micro")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("nll_micro").alias("nll_sum_micro"))
            .withColumn("mean_nll_micro",
                        F.expr("nll_sum_micro DIV n_bigrams")))


def ccnet_perplexity_buckets(docs: DataFrame, reference_cond=None,
                             n_buckets: int = 3,
                             lang_col: str = "lang",
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.3
    — the step after LM scoring): each language's documents are ranked
    by reference-LM mean NLL and cut into ``n_buckets`` equal-count
    perplexity buckets; "head" (most reference-like) feeds high-quality
    training mixes, "tail" is the usual drop set.

    Exactness: scores are :func:`ngram_lm_score`'s frozen integers
    (fixed-op-ln lookups, ``fixedlog.py``); bucketing is pure integer
    rank arithmetic — ``bucket = ((rank-1) * n) DIV count`` with ties
    broken on ``id_col`` — so any engine reproduces the split
    bit-for-bit.  Documents with <2 tokens have no bigrams and are
    absent, same as the scorer.

    Scale shape: scoring is the LM scorer's shape; the split adds ONE
    window keyed on the language (never a global sort) plus the
    per-language count as a window aggregate over the same partition —
    a single exchange on ``lang_col``."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2: {n_buckets}")
    scores = ngram_lm_score(docs, reference_cond, text_col, id_col)
    scored = docs.select(id_col, lang_col).join(scores, id_col)
    w = Window.partitionBy(lang_col).orderBy("mean_nll_micro", id_col)
    wl = Window.partitionBy(lang_col)
    idx = F.expr(f"CAST(((_rn - 1) * {int(n_buckets)}) DIV _n AS INT)")
    if n_buckets == 3:
        label = (F.when(F.col("bucket_idx") == 0, "head")
                 .when(F.col("bucket_idx") == 1, "middle")
                 .otherwise("tail"))
    else:
        label = F.concat(F.lit("b"), F.col("bucket_idx").cast("string"))
    return (scored
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count(F.lit(1)).over(wl))
            .withColumn("bucket_idx", idx)
            .withColumn("bucket", label)
            .select(id_col, lang_col, "mean_nll_micro", "bucket_idx",
                    "bucket"))


def token_pmi_top(docs: DataFrame, text_col: str = "text",
                  k: int = 50, min_count: int = 5) -> DataFrame:
    """Collocation extraction: the top-k adjacent-token pairs by
    pointwise mutual information (Church & Hanks 1990) — the standard
    distributional statistic for finding multi-word expressions in a
    corpus ("new york"-style units a tokenizer or vocab builder should
    treat as one).  ``min_count`` guards the classic PMI low-count
    pathology.

    Exactness discipline (the ngram_lm_score pattern): PMI decomposes
    into ln's of INTEGER counts only —
        pmi = ln(c_xy) + 2*ln(N_tok) - ln(N_big) - ln(c_x) - ln(c_y)
    — so each term is frozen to integer micro-units on the driver with
    the fixed-op ln (fixedlog.py) over the DISTINCT count values
    (count-of-counts, bounded metadata) and a document's pair score is
    pure integer arithmetic both engines reproduce bit-for-bit.

    Scale shape: one corpus pass each for unigram and bigram counts
    (map-side combinable); the PMI join runs on the aggregated
    vocabulary-sized tables (pair table joins the unigram table twice
    on the word key — Spark picks SMJ/SHJ as sizes dictate; the micro
    lookups broadcast); top-k is a TakeOrderedAndProject tail."""
    from .hostmath import ln_micro, lookup_df
    t = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(t.alias("_t"))
    n = F.size("_t")
    bigrams = F.zip_with(
        F.slice("_t", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("_t", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    uni = d.select(F.explode("_t").alias("w")).filter(F.col("w") != "")
    bg = d.select(F.explode(bigrams).alias("bg"))

    # r13 (guide §5, the signature-pin discipline): both count tables
    # feed the eager totals aggregate, the driver's distinct-count LUT
    # collect AND the final join chain — unpinned, the corpus token
    # explode re-ran ~4x (unigrams) / ~3x (bigrams) per call.  Both are
    # the aggregated VOCABULARY-sized tables (slim, bounded by distinct
    # grams, not corpus rows) and pure order-independent counts, so the
    # pin is identity-safe; released per entry / request / bench pass.
    from ..session import track_persist
    c_uni = track_persist(uni.groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    c_bg = track_persist(
        bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_xy")))
    totals = c_uni.agg(F.sum("c").alias("nt")).crossJoin(
        c_bg.agg(F.sum("c_xy").alias("nb"))).first()
    n_tok, n_big = int(totals["nt"] or 0), int(totals["nb"] or 0)
    if n_big == 0:
        raise ValueError("token_pmi_top: corpus has no bigrams")
    pairs = c_bg.filter(F.col("c_xy") >= min_count)

    spark = docs.sparkSession
    cx_vals = [r["c"] for r in c_uni.select("c").distinct().collect()]
    cxy_vals = [r["c_xy"] for r in
                pairs.select("c_xy").distinct().collect()]
    uni_lut = lookup_df(spark, ((c, ln_micro(c)) for c in cx_vals),
                        "c", "l_c")
    pair_lut = lookup_df(spark, ((c, ln_micro(c)) for c in cxy_vals),
                         "c_xy", "l_xy")
    const = 2 * ln_micro(n_tok) - ln_micro(n_big)

    w_split = F.split(F.col("bg"), " ")
    out = (pairs
           .withColumn("w1", w_split[0]).withColumn("w2", w_split[1])
           .join(F.broadcast(pair_lut), "c_xy")
           .join(c_uni.select(F.col("w").alias("w1"),
                              F.col("c").alias("cx")), "w1")
           .join(c_uni.select(F.col("w").alias("w2"),
                              F.col("c").alias("cy")), "w2")
           .join(F.broadcast(uni_lut.select(F.col("c").alias("cx"),
                                            F.col("l_c").alias("l_x"))),
                 "cx")
           .join(F.broadcast(uni_lut.select(F.col("c").alias("cy"),
                                            F.col("l_c").alias("l_y"))),
                 "cy")
           .select("w1", "w2", F.col("c_xy").cast("bigint").alias("c_xy"),
                   (F.col("l_xy") + F.lit(const)
                    - F.col("l_x") - F.col("l_y")).cast("bigint")
                   .alias("pmi_micro")))
    return (out.orderBy(F.desc("pmi_micro"), "w1", "w2").limit(k))


def char_entropy(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document character entropy in integer micro-nats — the
    classic gibberish/compressibility quality signal (low entropy =
    repeated characters/boilerplate, suspiciously high = random
    noise; the same family Gopher's repetition rules target from the
    n-gram side).

    Exactness discipline (fixedlog.py, the round-9 libm-free freeze):
        H = ln(N) - (Σ c·ln(c)) / N       over per-doc char counts c
    decomposes into ln's of INTEGER counts only.  Each distinct count
    value (count-of-counts over the corpus — bounded driver metadata)
    freezes ONCE to micro-units via the fixed-op ladder, and the
    per-doc score is then pure integer arithmetic:
        entropy_micro = (micro(ln N)·N − Σ c·micro(ln c)) DIV N
    which any engine reproduces bit-for-bit (the oracle runs the
    identical ladder over the same distinct counts).

    Scale shape: one explode over characters with a map-side-combined
    (doc, char) count, a per-doc rollup, and two broadcast lookup
    joins (distinct-count tables) — a single corpus pass; no driver
    state beyond the count-of-counts."""
    from .hostmath import ln_micro, lookup_df

    # r13 (guide §5): the (doc, char) count table feeds the two
    # distinct-count LUT collects AND both final-plan branches (sums,
    # totals) — unpinned, the corpus CHARACTER explode re-ran 4x per
    # call.  per is the aggregated per-doc-char table (≲ alphabet-size
    # rows per doc, far below the exploded stream); order-independent
    # counts: identity-safe pin, released per entry / request / pass.
    from ..session import track_persist
    ch = F.explode(F.split(F.col(text_col), "")).alias("ch")
    per = track_persist(
        docs.select(id_col, ch)
        .filter(F.col("ch") != "")
        .groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).alias("c")))
    totals = per.groupBy(id_col).agg(F.sum("c").alias("n"))

    spark = docs.sparkSession
    c_vals = [r["c"] for r in per.select("c").distinct().collect()]
    n_vals = [r["n"] for r in totals.select("n").distinct().collect()]
    lut_c = lookup_df(spark, ((c, ln_micro(float(c))) for c in c_vals),
                      "c", "lc_micro")
    lut_n = lookup_df(spark, ((n, ln_micro(float(n))) for n in n_vals),
                      "n", "ln_micro")
    sums = (per.join(F.broadcast(lut_c), "c")
            .groupBy(id_col)
            .agg(F.sum(F.col("c") * F.col("lc_micro")).alias("_clc")))
    return (totals.join(F.broadcast(lut_n), "n").join(sums, id_col)
            .select(id_col, F.col("n").cast("bigint").alias("n_chars"),
                    F.expr("(ln_micro * n - _clc) DIV n")
                    .cast("bigint").alias("entropy_micro")))
