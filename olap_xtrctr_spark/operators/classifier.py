"""Trained quality classifier — the classifier-filter step of the
canonical LLM data pipeline (GPT-3-style: score every document with a
linear model trained to separate a high-quality reference from the
raw crawl, keep probabilistically by score; same shape as fasttext
quality filters in CCNet-descended pipelines).

Spark-first shape:

* featurization is JVM-side (``Tokenizer`` + ``HashingTF`` — hashed
  bag-of-words, no vocabulary build, no Python in the row path);
* training is Spark ML ``LogisticRegression`` (distributed
  treeAggregate gradients; the only driver-side state is the
  coefficient vector, ``n_features`` floats);
* scoring broadcasts the fitted pipeline and stays in the JVM.

At 100 TB the real-world discipline is train-on-sample /
score-everything: the trainer takes an explicit ``max_train_rows``
cap (deterministic hash-sample, logged — no silent caps) while
``score_quality_classifier`` runs over the full corpus.

No counterpart in the reference (an SSAS client has no training
loop); beyond-reference extension per the round brief.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "weak_quality_labels",
    "classifier_filter",
    "train_quality_classifier",
    "score_quality_classifier",
    "auc_rank_sum",
    "classifier_quality_report",
]


def weak_quality_labels(docs: DataFrame, text_col: str = "text",
                        pos_quantile: float = 0.75,
                        neg_quantile: float = 0.25) -> DataFrame:
    """Weak labels from the deterministic heuristic ``quality_score``:
    top-quantile docs are positives, bottom-quantile negatives, the
    ambiguous middle is dropped (standard distant-supervision setup
    when no curated reference corpus exists).  Exact percentiles —
    one map-side-combinable aggregation, two scalar thresholds."""
    from .text import quality_score

    scored = quality_score(docs, text_col).join(
        docs.select("doc_id", text_col), "doc_id")
    lo, hi = scored.agg(
        F.expr(f"percentile(quality_score, {neg_quantile})"),
        F.expr(f"percentile(quality_score, {pos_quantile})")).first()
    return (scored
            .filter((F.col("quality_score") <= lo)
                    | (F.col("quality_score") >= hi))
            .select("doc_id", text_col,
                    (F.col("quality_score") >= hi).cast("double")
                    .alias("label")))


def train_quality_classifier(labeled: DataFrame, text_col: str = "text",
                             label_col: str = "label",
                             n_features: int = 1 << 18,
                             max_iter: int = 30, reg_param: float = 1e-3,
                             max_train_rows: int = 1_000_000,
                             seed: int = 42):
    """Fit tokenizer → hashed-BoW → logistic regression.  Returns the
    fitted ``PipelineModel``.

    ``max_train_rows``: deterministic xxhash64 sample cap — training is
    iterative (one distributed pass per iteration), so at corpus scale
    it runs on a sample while scoring runs on everything; the applied
    sampling rate is logged (no silent caps)."""
    import logging

    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    n = labeled.count()
    if n > max_train_rows:
        frac_milli = max_train_rows * 1000 // n
        labeled = labeled.filter(
            F.pmod(F.xxhash64("doc_id", F.lit(seed)), 1000) < frac_milli)
        logging.getLogger(__name__).warning(
            "train_quality_classifier: sampled training set to ~%d of "
            "%d rows (deterministic hash sample; scoring still covers "
            "the full corpus)", max_train_rows, n)
    pipe = Pipeline(stages=[
        RegexTokenizer(inputCol=text_col, outputCol="_toks",
                       pattern=r"\W+", toLowercase=True),
        HashingTF(inputCol="_toks", outputCol="_features",
                  numFeatures=n_features, binary=True),
        LogisticRegression(featuresCol="_features", labelCol=label_col,
                           maxIter=max_iter, regParam=reg_param,
                           standardization=False),
    ])
    model = pipe.fit(labeled)
    # Spark pins the fit-time SparkSession inside the LR model's
    # training summary, and the summary rides into every later
    # model.transform task closure.  Once ANY Observation has been
    # registered in the session — the engine's own no-silent-caps
    # watchers (_observe_dropped) do exactly that — the session's
    # lazily-created ObservationManager is not java-serializable and
    # scoring dies with NotSerializableException.  A persist/reload
    # round-trip is the public-API way to shed the summary (ML writers
    # never persist summaries), leaving a closure-clean model of just
    # coefficients.  Local temp suffices on local[*]; on a multi-node
    # cluster route this through a shared persist dir (the durable jobs
    # store) since ML persistence writes through the cluster FS.
    import os
    import tempfile

    from pyspark.ml import PipelineModel
    with tempfile.TemporaryDirectory(prefix="olap-clf-") as tmp:
        path = os.path.join(tmp, "model")
        model.write().overwrite().save(path)
        model = PipelineModel.load(path)
    return model


def score_quality_classifier(docs: DataFrame, model,
                             text_col: str = "text") -> DataFrame:
    """P(quality) per document — JVM pipeline transform, coefficients
    broadcast; nothing but (doc_id, prob) leaves the stage."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.select("doc_id", text_col))
    return scored.select(
        "doc_id",
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"))


def classifier_filter(scored: DataFrame, threshold: float | None = None,
                      lottery_alpha: float | None = None,
                      prob_col: str = "quality_prob",
                      id_col: str = "doc_id",
                      salt: str = "clf-keep-v1") -> DataFrame:
    """Keep/drop decision over classifier scores — the last step of the
    filter loop.  Two standard modes:

    * ``threshold``: keep iff prob >= threshold (hard cut);
    * ``lottery_alpha``: probabilistic keep with acceptance probability
      ``prob ** alpha`` — the GPT-3-style score lottery that keeps a
      thin high-quality tail of the low-scoring mass instead of a
      cliff, made DETERMINISTIC by drawing the uniform variate from a
      hash of the id (reproducible across engines, partitionings and
      retries — the same discipline as the sampling family).

    Exactly one mode must be set.  Returns the kept rows with a
    ``keep_reason`` column."""
    if (threshold is None) == (lottery_alpha is None):
        raise ValueError("set exactly one of threshold / lottery_alpha")
    if threshold is not None:
        return (scored.filter(F.col(prob_col) >= threshold)
                .withColumn("keep_reason", F.lit("threshold")))
    u = (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col(id_col).cast("string"), F.lit(salt))), 1, 15),
        16, 10).cast("double") / F.lit(float(16 ** 15)))
    return (scored.filter(u < F.pow(F.col(prob_col),
                                    F.lit(float(lottery_alpha))))
            .withColumn("keep_reason", F.lit("lottery")))


def auc_rank_sum(scored: DataFrame, label_col: str = "label",
                 score_col: str = "score") -> float:
    """Exact ROC AUC as the Mann-Whitney rank-sum statistic, computed
    with DataFrame ops only — no MLlib evaluator (whose RDD conversion
    path breaks under a shared session with registered Observations:
    CollectMetrics state is not task-serializable) and no driver-side
    score collection.

    Ties get average ranks (the standard definition):
    AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg), R_pos = sum of
    positive ranks ascending by score.  Phase 1 groups by score
    (map-side combinable), so the global-order window runs over the
    DISTINCT-score table, not the examples; for a holdout whose score
    set is itself huge, quantize scores to fixed bins first (AUC is
    insensitive to order-preserving binning at reasonable width)."""
    from pyspark.sql import Window

    g = (scored.groupBy(F.col(score_col).alias("_s"))
         .agg(F.count("*").cast("double").alias("_n"),
              F.sum(F.col(label_col).cast("double")).alias("_np")))
    w = (Window.orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = g.withColumn("_cum", F.sum("_n").over(w))
    row = g.agg(
        F.sum(F.col("_np") * (F.col("_cum") - F.col("_n")
                              + (F.col("_n") + 1) / 2)).alias("r_pos"),
        F.sum("_np").alias("n_pos"),
        F.sum("_n").alias("n_all")).first()
    n_pos, n_neg = row["n_pos"] or 0.0, (row["n_all"] or 0.0) - (
        row["n_pos"] or 0.0)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"AUC undefined: n_pos={n_pos:g}, n_neg={n_neg:g}")
    return (row["r_pos"] - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def classifier_quality_report(docs: DataFrame, text_col: str = "text",
                              auc_floor: float = 0.75,
                              seed: int = 42) -> DataFrame:
    """End-to-end entry: weak labels → deterministic 80/20 hash split →
    train → holdout AUC gate → score the FULL corpus → per-decile
    histogram of classifier probabilities with mean heuristic score per
    decile (the monotonicity a sane classifier must show).

    The AUC gate is the in-entry differential check (same discipline as
    the ANN family): a returned row PROVES the trained model separates
    the held-out weak labels, not merely that the pipeline ran.  Fails
    loudly below ``auc_floor``."""
    from pyspark.ml.functions import vector_to_array

    labeled = weak_quality_labels(docs, text_col).cache()
    is_holdout = F.pmod(F.xxhash64("doc_id", F.lit(seed)), 5) == 0
    train, holdout = (labeled.filter(~is_holdout),
                      labeled.filter(is_holdout))
    model = train_quality_classifier(train, text_col)
    auc = auc_rank_sum(
        model.transform(holdout).select(
            "label", vector_to_array("probability")[1].alias("score")),
        label_col="label", score_col="score")
    if auc < auc_floor:
        raise RuntimeError(
            f"classifier_quality_report: holdout AUC {auc:.3f} below "
            f"floor {auc_floor} — the trained filter does not separate "
            f"the weak labels; do not use it to keep/drop data")
    from .text import quality_score

    probs = score_quality_classifier(docs, model, text_col)
    heur = quality_score(docs, text_col).select("doc_id", "quality_score")
    return (probs.join(heur, "doc_id")
            .withColumn("decile",
                        F.least(F.floor(F.col("quality_prob") * 10),
                                F.lit(9)).cast("int"))
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("quality_prob"), 4).alias("avg_prob"),
                 F.round(F.avg("quality_score"), 4).alias("avg_heuristic"))
            .withColumn("holdout_auc_milli",
                        F.lit(int(auc * 1000)).cast("bigint"))
            .orderBy("decile"))


def quality_classifier_frozen(docs: DataFrame,
                              text_col: str = "text") -> DataFrame:
    """FROZEN quality classifier — the value-exact sibling of the
    hashed-BoW pipeline above (feature hashing is murmur3, which no
    SQL oracle reproduces; these four integer text stats every oracle
    already mirrors).  Logistic-regression weights trained once in
    Spark (scripts/train_frozen_codebooks.py) with the feature scaling
    folded in at 10⁶ fixed point, so the serving logit is an exact
    int64 dot product and keep ⇔ logit > 0 compares identically on
    any engine.  The learned hashed-BoW classifier stays the library
    path for real reference-corpus filtering; this is the
    freeze-discipline demonstration plus a cheap JVM-only scorer."""
    from .frozen_codebooks import QUALITY_LR_BIAS_I, QUALITY_LR_WEIGHTS_I
    from .text import LANG_STOPWORDS, PUNCT_CLASS
    t = F.col(text_col)
    stop_pat = r"\b(" + "|".join(LANG_STOPWORDS["en"]) + r")\b"
    f = [F.size(F.split(F.trim(t), r"\s+")).cast("bigint"),
         F.greatest(F.length(t), F.lit(1)).cast("bigint"),
         F.regexp_count(F.lower(t), F.lit(stop_pat)).cast("bigint"),
         F.regexp_count(t, F.lit(PUNCT_CLASS)).cast("bigint")]
    logit = F.lit(QUALITY_LR_BIAS_I).cast("bigint")
    for w, feat in zip(QUALITY_LR_WEIGHTS_I, f):
        logit = logit + F.lit(int(w)).cast("bigint") * feat
    return docs.select("doc_id", logit.alias("logit_u"),
                       (logit > 0).cast("int").alias("keep"))
