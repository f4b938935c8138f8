"""Deterministic sampling / splitting for training-data pipelines.

Everything here is HASH-derived, not rand()-derived: a sample defined as
a pure function of the row key is reproducible across runs, engines and
partitionings, survives retries/speculative execution (a re-executed
task picks the same rows), and needs no driver-side state.  rand(seed)
has none of those properties on a real cluster (row order per partition
is not stable across re-plans), which is why every decision below is
``md5(id || salt)`` — the same expression a DuckDB/ANSI oracle can
recompute exactly.

Scale posture: all operators are single-pass narrow transforms (filter /
projection) except ``uniform_sample_k`` (a distributed top-k: per-
partition heap + driver merge of k rows, never a full sort) and
``incremental_dedup`` (one shuffle on the fingerprint key, the minimum
possible for cross-batch exact dedup).
"""
from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .fixedlog import fxexp, fxln
from .hostmath import lookup_df, micro

# 60 bits of md5 → uniform integer in [0, 2^60); modulo 10_000 gives a
# per-key permille-of-ten bucket with negligible bias (2^60 % 10^4 ≈ 0).
_BUCKETS = 10_000


def _hash_bucket(id_col, salt: str):
    """Deterministic uniform bucket in [0, 10000) from md5(id:salt).

    15 hex chars = 60 bits, safely inside a signed 64-bit int on every
    engine (the full 64-bit digest prefix would overflow DuckDB's BIGINT
    cast at the sign bit).
    """
    h = F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % _BUCKETS


def hash_bucket_sql(id_expr: str, salt: str) -> str:
    """The DuckDB-side mirror of _hash_bucket (oracle building block)."""
    return (f"TRY_CAST(concat('0x', substr(md5(concat(CAST({id_expr} AS "
            f"VARCHAR), ':{salt}')), 1, 15)) AS BIGINT) % {_BUCKETS}")


def hash_split(docs: DataFrame, weights: dict[str, float],
               id_col: str = "doc_id",
               salt: str = "split-v1") -> DataFrame:
    """Train/val/test split as a pure function of the row key.

    ``weights`` maps split name -> fraction (must sum to <= 1; remainder
    rows land in the last split).  Returns the input plus a ``split``
    column.  No shuffle: the decision is a projection.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    bucket = _hash_bucket(F.col(id_col), salt)
    expr = None
    lo = 0
    names = list(weights)
    for name in names[:-1]:
        lo += int(round(weights[name] * _BUCKETS))
        cond = bucket < lo
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "strat-v1") -> DataFrame:
    """Per-stratum deterministic Bernoulli sample (quality-weighted data
    mixing: keep X% of each language / source / quality band).

    Same contract as DataFrame.sampleBy but reproducible across engines
    and partitionings; one filter, no shuffle.
    """
    bucket = _hash_bucket(F.col(id_col), salt)
    thresh = None
    for value, rate in rates.items():
        t = F.lit(int(round(rate * _BUCKETS)))
        thresh = F.when(F.col(strata_col) == value, t) if thresh is None \
            else thresh.when(F.col(strata_col) == value, t)
    thresh = thresh.otherwise(F.lit(int(round(default_rate * _BUCKETS)))) \
        if thresh is not None else F.lit(int(round(default_rate * _BUCKETS)))
    return docs.filter(bucket < thresh)


def sample_k_per_group(docs: DataFrame, k: int,
                       group_col: str = "lang",
                       id_col: str = "doc_id",
                       salt: str = "grpk-v1") -> DataFrame:
    """Exact-size-k deterministic sample PER GROUP (k docs per language/
    source for eval sets, human review, per-domain probes): rank rows
    inside each group by a uniform hash of the key and keep the k
    smallest — a random permutation per group, reproducible across
    engines, partitionings and retries.  One shuffle on the group key;
    groups smaller than k are returned whole."""
    from pyspark.sql import Window
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(h.asc())
    return (docs.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk"))


def uniform_sample_k(docs: DataFrame, k: int,
                     id_col: str = "doc_id",
                     salt: str = "topk-v1") -> DataFrame:
    """Exact-size-k uniform sample: the k smallest hash values.

    The distributed analogue of reservoir sampling without driver state:
    ordering by a uniform hash of the key is a random permutation, and
    Spark executes ORDER BY+LIMIT as a per-partition top-k merge
    (TakeOrderedAndProject), never a global sort of the corpus.
    """
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    return (docs.withColumn("_h", h)
            .orderBy("_h")
            .limit(k)
            .drop("_h"))


def shuffle_corpus(docs: DataFrame, n_shards: int,
                   id_col: str = "doc_id",
                   salt: str = "shuffle-v1") -> DataFrame:
    """Deterministic global training order WITHOUT a global sort: the
    60-bit md5(id:salt) key fixes one pseudo-random permutation of the
    corpus; ``shard = key % n_shards`` and ``shard_pos`` = rank within
    the shard by (key, id).  A trainer reading shards 0..n-1, each
    ordered by shard_pos, consumes that permutation — reproducible
    across partitionings, retries, and engines (the property rand()
    loses the moment a plan re-executes), and re-saltable per epoch.

    Scale shape: the rank window partitions BY SHARD, so no task ever
    sees more than corpus/n_shards rows — pick n_shards so a shard fits
    a task, exactly how training shards are sized anyway
    (``sources/shards.py``).  A single global row_number would funnel
    the whole corpus through one reducer; this never does."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    key = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return (docs.withColumn("_key", key)
            .withColumn("shard", (F.col("_key") % n_shards).cast("int"))
            .withColumn("shard_pos", F.row_number().over(w).cast("bigint"))
            .drop("_key"))


def token_budget_fill(scored: DataFrame, budget_tokens: int,
                      score_col: str = "score_milli",
                      token_col: str = "n_tokens",
                      id_col: str = "doc_id") -> DataFrame:
    """Fill a token budget with the best-scoring documents: order by
    (score desc, id asc) and keep every document whose RUNNING token
    total stays within ``budget_tokens`` (the first document that
    would cross the boundary — and everything after it — is out; the
    running total is monotone, so the kept set is a prefix).  This is
    the data-selection endgame: "give me the best 10B tokens", not a
    rate or a count.  ``score_col`` must be integer (milli-units per
    repo discipline) so the boundary is engine-exact.

    Returns the selected rows plus ``cum_tokens`` (the global running
    total through this document).

    Scale shape: a naive SUM() OVER (ORDER BY ...) funnels the corpus
    through ONE reducer.  Instead: (1) per-score token totals (map-side
    combinable, rows = score cardinality — bounded, these are
    milli-unit ints), (2) a running total over that TINY table finds
    the boundary score, (3) every doc strictly above it is selected
    with no window at all, and (4) only the boundary score's documents
    pay a rank window (partitioned by that single score value).  The
    full-corpus sort never happens."""
    sc, tk = F.col(score_col), F.col(token_col)
    per_score = (scored.groupBy(score_col)
                 .agg(F.sum(tk).cast("bigint").alias("_stok")))
    wsc = (Window.orderBy(F.desc(score_col))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cums = (per_score
            .withColumn("_cum_through", F.sum("_stok").over(wsc))
            .withColumn("_cum_before",
                        F.col("_cum_through") - F.col("_stok")))
    joined = scored.join(F.broadcast(cums), score_col)
    # scores whose whole block fits: no per-row window needed
    full = (joined.filter(F.col("_cum_through") <= budget_tokens)
            .withColumn("_doc_cum",
                        F.col("_cum_before") + F.sum(tk).over(
                            Window.partitionBy(score_col)
                                  .orderBy(id_col)
                                  .rowsBetween(Window.unboundedPreceding,
                                               Window.currentRow))))
    # the single boundary score: rank within it, stop at the budget
    boundary = (joined.filter((F.col("_cum_before") <= budget_tokens)
                              & (F.col("_cum_through") > budget_tokens))
                .withColumn("_doc_cum",
                            F.col("_cum_before") + F.sum(tk).over(
                                Window.partitionBy(score_col)
                                      .orderBy(id_col)
                                      .rowsBetween(
                                          Window.unboundedPreceding,
                                          Window.currentRow)))
                .filter(F.col("_doc_cum") <= budget_tokens))
    return (full.unionByName(boundary)
            .select(*scored.columns,
                    F.col("_doc_cum").cast("bigint").alias("cum_tokens")))


def grouped_token_cap(scored: DataFrame, cap_tokens: int,
                      group_col: str = "source",
                      score_col: str = "score_milli",
                      token_col: str = "n_tokens",
                      id_col: str = "doc_id") -> DataFrame:
    """Domain balancing: cap EVERY group (source / domain / language) at
    ``cap_tokens`` tokens, keeping each group's best-scoring documents —
    the standard defense against one crawl domain swamping the mix.
    Selection rule per group mirrors ``token_budget_fill``: order by
    (score desc, id asc), keep the prefix whose running token total
    stays within the cap.  Returns the kept rows plus ``cum_tokens``
    (the running total within the document's group).

    Scale shape: the same two-phase trick as ``token_budget_fill`` with
    every window additionally keyed by the group, so no single-reducer
    global sort AND no full per-group sort: (1) per-(group, score)
    token totals — map-side combinable, bounded by |groups| x |distinct
    milli scores|; (2) a running total over that small table finds each
    group's boundary score; (3) whole-block scores join back with no
    per-row window; (4) only boundary-score rows pay a rank window,
    partitioned by (group, score).  A hot domain with billions of rows
    costs one agg + one join, not a sort of the domain."""
    tk = F.col(token_col)
    per_score = (scored.groupBy(group_col, score_col)
                 .agg(F.sum(tk).cast("bigint").alias("_stok")))
    wsc = (Window.partitionBy(group_col).orderBy(F.desc(score_col))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cums = (per_score
            .withColumn("_cum_through", F.sum("_stok").over(wsc))
            .withColumn("_cum_before",
                        F.col("_cum_through") - F.col("_stok")))
    joined = scored.join(F.broadcast(cums), [group_col, score_col])
    wdoc = (Window.partitionBy(group_col, score_col).orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    full = (joined.filter(F.col("_cum_through") <= cap_tokens)
            .withColumn("_doc_cum",
                        F.col("_cum_before") + F.sum(tk).over(wdoc)))
    boundary = (joined.filter((F.col("_cum_before") <= cap_tokens)
                              & (F.col("_cum_through") > cap_tokens))
                .withColumn("_doc_cum",
                            F.col("_cum_before") + F.sum(tk).over(wdoc))
                .filter(F.col("_doc_cum") <= cap_tokens))
    return (full.unionByName(boundary)
            .select(*scored.columns,
                    F.col("_doc_cum").cast("bigint").alias("cum_tokens")))


def temperature_mix_rates(docs: DataFrame, temperature: float = 0.7,
                          text_col: str = "text",
                          source_col: str = "source") -> DataFrame:
    """Per-source sampling rates under TEMPERATURE re-weighting — the
    standard multilingual/multi-source pretrain rule (weight ∝
    n_tokens^T, T<1 up-weights small sources; T=1 is proportional,
    T=0 uniform; e.g. mT5, Xue et al. 2021).

    Output per source: n_docs, n_tokens, the frozen weight
    weight_micro = ROUND(n_tokens^T * 1e6) and the normalized rate
    mix_rate_ppm = weight_micro*1e6 DIV Σ weight_micro — all integer
    arithmetic after the freeze, so the result is order-independent
    and bit-identical on any engine.  n_tokens^T itself is computed as
    fxexp(T * fxln(n_tokens)) (fixedlog.py, libm-free): the round-8
    driver proved that libm-backed transcendentals (here ``pow``)
    diverge across DuckDB builds, so the float never touches a libm
    and the float SUM (whose order differs per engine) is gone.

    One aggregation (map-side combined over the bounded source
    domain); the per-source weights freeze on the driver (sources are
    bounded metadata — dozens at 100 TB) and broadcast back."""
    ntok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    # r13 (guide §5): the per-source rollup feeds the driver freeze
    # collect AND the returned plan — unpinned, the corpus tokenize+
    # aggregate scan ran twice per call.  |sources| rows (bounded
    # metadata), order-independent counts: identity-safe pin, released
    # per entry / request / bench pass.
    from ..session import track_persist
    per_src = track_persist(
        docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(ntok).alias("n_tokens")))
    rows = per_src.select(source_col, "n_tokens").collect()
    w_micro = {r[source_col]: micro(fxexp(temperature
                                          * fxln(float(r["n_tokens"]))))
               for r in rows}
    wsum = sum(w_micro.values())
    lut = lookup_df(docs.sparkSession,
                    ((s, w) for s, w in w_micro.items()),
                    source_col, "weight_micro", "string")
    rate = lookup_df(docs.sparkSession,
                     ((s, (w * 1_000_000) // wsum)
                      for s, w in w_micro.items()),
                     source_col, "mix_rate_ppm", "string")
    return (per_src.join(F.broadcast(lut), source_col)
            .join(F.broadcast(rate), source_col)
            .select(source_col, "n_docs", "n_tokens", "weight_micro",
                    "mix_rate_ppm"))


def incremental_dedup(new_batch: DataFrame, seen: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Cross-batch exact dedup: rows of ``new_batch`` whose normalized
    text fingerprint does not occur in ``seen`` (the already-ingested
    corpus) and is unique within the new batch (deterministic keep-first
    by id).

    This is the streaming-ingest discipline at rest: one anti-join
    shuffle on the fingerprint, so each new batch costs O(|batch| +
    |seen|) I/O but only one shuffle of the (hash, id) projection — the
    full seen-corpus text is never moved.
    """
    from .text import fingerprint, fingerprint_expr

    # r13 (guide §2.4): the fingerprint is a rowwise expression, so
    # compute it as a COLUMN on the batch instead of joining the
    # fingerprint projection back on id — the old shape scanned the
    # new batch twice and paid a join to reattach a value each row
    # could have computed in place.
    new_fp = new_batch.withColumn("fingerprint",
                                  fingerprint_expr(text_col))
    seen_fp = fingerprint(seen, text_col).select("fingerprint")
    w_first = F.min(F.col(id_col)).over(Window.partitionBy("fingerprint"))
    return (new_fp.join(seen_fp, on="fingerprint", how="left_anti")
            .withColumn("_keep", w_first == F.col(id_col))
            .filter(F.col("_keep"))
            .drop("_keep", "fingerprint"))


def length_histogram(docs: DataFrame, bucket_chars: int = 200,
                     len_col: str = "n_chars") -> DataFrame:
    """Corpus length profile: doc count and char mass per fixed-width
    length bucket.  Map-side combinable single aggregation — the shape
    survives any corpus size (output rows = max_len / bucket_chars).
    """
    b = (F.col(len_col) / bucket_chars).cast("bigint")
    return (docs.groupBy((b * bucket_chars).alias("bucket_lo"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(len_col).alias("total_chars")))


def dsir_importance_weights(docs: DataFrame, target_cond,
                            n_buckets: int = 1024,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023):
    score every raw document by how target-like its hashed n-gram
    feature distribution is, so a mixing step can resample the raw
    pool toward a quality domain.  ``target_cond`` is a Column
    predicate naming the in-domain slice (e.g. one source).

    Features are unigrams + bigrams hashed into ``n_buckets`` via the
    engine-portable 60-bit md5 bucket (same construction as
    ``hash_split``); the per-bucket log-likelihood ratio
    ln(p_target(f)) - ln(p_raw(f)) (add-one smoothed) is frozen to
    integer MICRO-units once per bucket, so each document's weight —
    Σ count(d,f) · llr_micro(f) — is exact integer arithmetic that any
    oracle reproduces bit-for-bit (the one float op, ln, happens
    n_buckets times per corpus, not per document, and is computed on
    the DRIVER with the fixed-op ln — ``fixedlog.py`` — over the
    collected n_buckets-row corpus table, so the frozen values are
    independent of the JVM's ``Math.log`` ulp quirks).

    Scale shape: two map-side-combinable aggregations over the
    exploded features (per-doc-bucket counts, per-bucket corpus
    counts); the LLR table is n_buckets rows — broadcast back; no
    driver-side state.  At 100 TB this is one pass over the tokens
    plus a broadcast join, the cheapest useful signal in the
    data-selection family."""
    t = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(id_col, F.col(text_col),
                    target_cond.alias("_is_target")).withColumn("_t", t)
    n = F.size("_t")
    bigrams = F.zip_with(
        F.slice("_t", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("_t", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    feats = d.select(
        id_col, "_is_target",
        F.explode(F.concat("_t", bigrams)).alias("feat"))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit("f:"), F.col("feat"))), 1, 15), 16, 10)
        .cast("bigint") % n_buckets)
    feats = feats.select(id_col, "_is_target", bucket.alias("bucket"))

    # r13 (guide §5 + §2.3): the per-bucket corpus totals are derived
    # FROM the per-doc-bucket counts instead of re-aggregating the
    # token-scale feature explode — _is_target is constant per doc, so
    # carrying it as a grouping key changes no count, and
    # cr = Σc / ct = Σc|target per bucket are the same integers the
    # direct aggregation produced.  doc_counts (≤ docs × n_buckets slim
    # rows) is pinned because it feeds BOTH the eager LLR collect and
    # the returned plan — unpinned, the explode ran twice per call.
    from ..session import track_persist
    doc_counts = track_persist(
        feats.groupBy(id_col, "_is_target", "bucket").agg(
            F.count(F.lit(1)).alias("c")))
    corpus = doc_counts.groupBy("bucket").agg(
        F.sum("c").alias("cr"),
        F.sum(F.when(F.col("_is_target"), F.col("c"))
              .otherwise(0)).alias("ct"))
    # n_buckets rows + two scalars: collect, freeze the llr on the
    # driver with the fixed-op ln (fixedlog.py — libm-free, so the
    # frozen value is identical on ANY engine/host), op-for-op the
    # oracle's ((l1 - l2) - l3) + l4 combination before the round.
    rows = corpus.collect()
    tr = sum(r["cr"] for r in rows)
    tt = sum(r["ct"] for r in rows)
    llr_pairs = [(r["bucket"],
                  micro(fxln(r["ct"] + 1) - fxln(tt + n_buckets)
                        - fxln(r["cr"] + 1)
                        + fxln(tr + n_buckets)))
                 for r in rows]
    llr = lookup_df(docs.sparkSession, llr_pairs, "bucket", "llr_micro")
    return (doc_counts.join(F.broadcast(llr), "bucket")
            .groupBy(id_col)
            .agg(F.sum("c").alias("n_feats"),
                 F.sum(F.col("c") * F.col("llr_micro"))
                  .alias("weight_micro")))


def dsir_select_top_k(docs: DataFrame, target_cond, k: int = 50,
                      n_buckets: int = 1024, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """The selection half of DSIR: rank the raw pool by importance
    weight and keep the top ``k`` (deterministic ties by id — the
    hard-threshold variant of the paper's Gumbel resampling, which is
    what a reproducible pipeline actually ships).

    TakeOrderedAndProject shape: the global sort never materializes —
    each partition keeps its local top-k and the driver merges k
    rows, so selection cost is O(corpus) scan + O(k) merge at any
    corpus size."""
    w = dsir_importance_weights(docs, target_cond, n_buckets=n_buckets,
                                text_col=text_col, id_col=id_col)
    top = (w.orderBy(F.desc("weight_micro"), F.asc(id_col)).limit(k))
    win = Window.orderBy(F.desc("weight_micro"), F.asc(id_col))
    return (top.withColumn("rank", F.row_number().over(win))
               .select("rank", id_col, "n_feats", "weight_micro"))


def dsir_gumbel_sample(docs: DataFrame, target_cond, k: int = 50,
                       temperature: float = 1.0, n_buckets: int = 1024,
                       salt: str = "dsir-gumbel-v1",
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """The paper's stochastic DSIR resampling via the Gumbel-top-k
    trick: sampling k docs without replacement with probability
    ∝ exp(weight/temperature) is exactly taking the top k of
    weight/temperature + Gumbel noise.  The noise is DETERMINISTIC
    across engines and retries — u ~ U(0,1) comes from the same md5
    bucket construction as ``hash_split`` (bucket + ½ over the bucket
    count, so u is never 0 or 1), g = -ln(-ln(u)) — which is what
    makes a resampled corpus reproducible and oracle-checkable at all.
    Everything lands in integer micro-units before the comparison, so
    ties and ordering agree bit-for-bit.

    Same TakeOrderedAndProject shape as ``dsir_select_top_k`` — the
    noise arrives via a 10 000-row broadcast lookup (frozen on the
    driver with the fixed-op ln, ``fixedlog.py``), adding nothing to the
    shuffle."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive: {temperature}")
    w = dsir_importance_weights(docs, target_cond, n_buckets=n_buckets,
                                text_col=text_col, id_col=id_col)
    # The noise domain is the closed 10 000-value hash-bucket range, so
    # freeze -ln(-ln(u)) per bucket on the driver with the fixed-op ln
    # (fixedlog.py — libm-free, engine-independent) and broadcast-join
    # on the bucket key.  0.0-x mirrors the oracle ladder's negation.
    g_pairs = [(bkt,
                micro(0.0 - fxln(0.0 - fxln((bkt + 0.5)
                                            / float(_BUCKETS)))))
               for bkt in range(_BUCKETS)]
    g_lut = lookup_df(docs.sparkSession, g_pairs, "_gb", "g_micro")
    keyed = (w.withColumn("_gb", _hash_bucket(F.col(id_col), salt))
             .join(F.broadcast(g_lut), "_gb")
             .withColumn("key_micro",
                         F.round(F.col("weight_micro") / temperature)
                          .cast("bigint") + F.col("g_micro"))
             .drop("_gb", "g_micro"))
    top = keyed.orderBy(F.desc("key_micro"), F.asc(id_col)).limit(k)
    win = Window.orderBy(F.desc("key_micro"), F.asc(id_col))
    return (top.withColumn("rank", F.row_number().over(win))
               .select("rank", id_col, "weight_micro", "key_micro"))


def kanon_release(df: DataFrame, parent_col: str, child_col: str,
                  k: int = 5, value_col: str | None = None) -> DataFrame:
    """k-anonymity cell suppression for a released aggregate table —
    the privacy discipline public-health/statistical releases apply
    before publishing small-area counts (and the reference's domain is
    exactly such a ministry reporting stack):

    * PRIMARY suppression: any (parent, child) cell with fewer than
      ``k`` contributing rows is suppressed (measures nulled, flag on);
    * COMPLEMENTARY suppression: if EXACTLY ONE cell in a parent group
      was primary-suppressed, the smallest remaining cell (ties by
      child key) is suppressed too — otherwise the parent total minus
      the visible cells reconstructs the hidden value (the subtraction
      attack).  Two or more suppressed cells cannot be isolated.

    Output: (parent, child, n, [sum_value], suppressed) with measures
    NULL on suppressed cells — the cell stays visible so a reader can
    see that data exists but is withheld.

    Scale shape: one groupBy to cells (map-side combinable), then two
    windows over the CELL table keyed by the parent — cell-count-sized
    work, nothing corpus-sized."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col).cast("decimal(18,4)")
                            .cast("double"), 4).alias("sum_value"))
    cells = df.groupBy(parent_col, child_col).agg(*aggs)
    primary = F.col("n") < k
    wpar = Window.partitionBy(parent_col)
    n_primary = F.sum(primary.cast("long")).over(wpar)
    wrank = (Window.partitionBy(parent_col, primary)
             .orderBy(F.col("n"), F.col(child_col)))
    rn = F.row_number().over(wrank)
    out = (cells
           .withColumn("_prim", primary)
           .withColumn("_npar", n_primary)
           .withColumn("_rn", rn)
           .withColumn("suppressed",
                       F.col("_prim")
                       | ((F.col("_npar") == 1) & (~F.col("_prim"))
                          & (F.col("_rn") == 1))))
    keep = [parent_col, child_col,
            F.when(~F.col("suppressed"), F.col("n")).alias("n")]
    if value_col is not None:
        keep.append(F.when(~F.col("suppressed"),
                           F.col("sum_value")).alias("sum_value"))
    keep.append(F.col("suppressed"))
    return out.select(*keep)


def cluster_split(docs: DataFrame, weights: dict[str, float],
                  cluster_col: str,
                  salt: str = "split-v1") -> DataFrame:
    """Leakage-free train/val/test split: the split decision hashes the
    CLUSTER key (e.g. the canonical member id of a duplicate group)
    instead of the row id, so every member of a cluster lands in the
    same split — duplicates and near-duplicates can never straddle
    train/eval (the contamination mode docs_contamination_check /
    emb_cross_split_leakage audit for; this operator prevents it by
    construction).

    Exactly :func:`hash_split` keyed on the cluster column (delegates,
    so the bucket arithmetic cannot drift between the two)."""
    return hash_split(docs, weights, id_col=cluster_col, salt=salt)


def interleave_sources(docs: DataFrame, id_col: str = "doc_id",
                       group_col: str = "source",
                       bucket: int = 1024) -> DataFrame:
    """Deterministic ROUND-ROBIN curriculum order: position documents
    so consecutive training positions cycle through the sources
    (every source's i-th document comes before any source's (i+1)-th)
    — the interleave that stops a source-clustered corpus from feeding
    a model hour-long single-source streaks, without randomness.

    ``global_pos`` = lexicographic rank of
    ``(within-source rank, source, id)``.  Both ranks are built from
    the TWO-PHASE global prefix machinery (operators/prefix.py), never
    a full-corpus single-partition window: the within-source rank is a
    per-key running count over ``id div bucket`` range buckets, and
    the global position is a running count over rank-range buckets.
    The serial steps are the two |buckets|-row carry windows; row-level
    windows stay bucket-parallel.  Rows per rank-bucket are
    ``bucket * |groups|`` — size ``bucket`` to taste when interleaving
    very many groups.  Output: ``(id, group, source_rank, global_pos)``.
    """
    from .prefix import running_total

    d = (docs.select(id_col, group_col)
         .withColumn("_one", F.lit(1).cast("long"))
         .withColumn("_b", F.expr(f"{id_col} div {bucket}")))
    r = running_total(d, "_b", [id_col], "_one", out_col="source_rank",
                      key_cols=[group_col])
    r = r.withColumn("_rb", F.expr(f"(source_rank - 1) div {bucket}"))
    pos = running_total(r, "_rb", ["source_rank", group_col], "_one",
                        out_col="global_pos")
    return pos.select(id_col, group_col,
                      F.col("source_rank").cast("long").alias("source_rank"),
                      F.col("global_pos").cast("long").alias("global_pos"))


def budget_allocation(docs: DataFrame, k: int,
                      group_col: str = "source",
                      weight_col: str = "n_chars") -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a sampling budget:
    split ``k`` slots across groups proportionally to their total
    ``weight_col``, in EXACT integers — the allocation step a
    stratified corpus sample runs before drawing, with the property
    that every group gets either floor or ceil of its exact
    proportional share and the totals add to ``k`` precisely (no
    float rounding drift between engines or between runs).

    Convention (all int64): ``base = (k * w) div W``; the
    ``k - SUM(base)`` leftover slots go to the groups with the largest
    remainders ``(k * w) % W``, ties to the lexicographically smaller
    group.  Overflow bound: ``k * max(w) < 2**63`` — at k = 1e6 that
    allows ~9.2e12 weight per group (raise into DECIMAL if a single
    group ever carries more).

    Scale shape: one map-side-combinable aggregate to |groups| rows;
    every downstream step (scalar total crossJoin, remainder rank
    window, final projection) runs on that aggregate, never the
    corpus.  The remainder rank is a single-partition window over the
    |groups|-row aggregate — the docs_corpus_card class, allowlisted
    in the plan sweep with that boundedness reason.  Output:
    ``(group, weight, alloc)`` with ``SUM(alloc) = k``.
    """
    per = (docs.groupBy(group_col)
           .agg(F.sum(weight_col).cast("long").alias("w")))
    # NOT named "W": Spark's default case-insensitive resolution would
    # collide it with the per-group "w" after the crossJoin
    tot = F.broadcast(per.agg(F.sum("w").cast("long").alias("_tot")))
    j = per.crossJoin(tot).select(
        group_col, "w",
        F.expr(f"(CAST({k} AS BIGINT) * w) div _tot").alias("base"),
        F.expr(f"(CAST({k} AS BIGINT) * w) % _tot").alias("rem"))
    resid = F.broadcast(j.agg(
        (F.lit(k).cast("long") - F.sum("base")).alias("resid")))
    wr = Window.orderBy(F.desc("rem"), F.col(group_col))
    return (j.crossJoin(resid)
            .withColumn("_rr", F.row_number().over(wr))
            .select(group_col, F.col("w").alias("weight"),
                    (F.col("base")
                     + F.when(F.col("_rr") <= F.col("resid"),
                              F.lit(1).cast("long"))
                     .otherwise(F.lit(0).cast("long"))).alias("alloc")))
