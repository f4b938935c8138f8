"""Recall validation for the approximate operator family, measured
against the EXACT operators (which are oracle-verified) at sf0.01.

Mirrors the reference's reconciliation discipline (every load step is
count-checked, database/migrate_csv_to_db.py:182-208): an approximate
index whose recall silently collapses must fail CI, not ship.

Ground truths:
* near-dup text pairs  -> ngram_jaccard_pairs (exact Jaccard, oracle-green)
* near-dup embeddings  -> embedding_near_dups (exact GEMM, oracle-green)
* top-k neighbors      -> cosine_topk (exact brute force, oracle-green)
"""
from __future__ import annotations

import pytest

from olap_xtrctr_spark.operators import dedup as D
from olap_xtrctr_spark.operators import similarity as S
from olap_xtrctr_spark.session import load_table

SF_RECALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_RECALL, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_RECALL, "embeddings").cache()


@pytest.fixture(scope="module")
def exact_jaccard_pairs(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in D.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert len(pairs) >= 10, "fixture must contain planted near-dup docs"
    return pairs


@pytest.fixture(scope="module")
def planted_embedding_pairs(emb):
    pairs = [(r.id_a, r.id_b)
             for r in D.embedding_near_dups(emb, threshold=0.45).collect()]
    assert len(pairs) >= 10, "fixture must contain planted near-dup vectors"
    return pairs


def test_minhash_lsh_recall_vs_exact_jaccard(docs, exact_jaccard_pairs):
    """Banded MinHash-LSH must recover >=90% of the true Jaccard>=0.3
    pairs at its configured threshold."""
    truth = {p for p, j in exact_jaccard_pairs.items() if j >= 0.3}
    found = {(r.id_a, r.id_b)
             for r in D.minhash_lsh_pairs(docs, threshold=0.3).collect()}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.9, f"minhash-LSH recall collapsed: {recall:.2f}"


def test_simhash_recall_vs_exact_jaccard(docs, exact_jaccard_pairs):
    """Multi-block SimHash candidate generation must recover >=90% of
    the true near-dup pairs (their hamming distances are well inside
    the pigeonhole guarantee n_blocks-1)."""
    truth = set(exact_jaccard_pairs)
    found = {(r.id_a, r.id_b)
             for r in D.simhash_near_pairs(docs, max_hamming=16).collect()}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.9, f"simhash recall collapsed: {recall:.2f}"


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_lsh_topk_recall_vs_exact(emb, planted_embedding_pairs):
    """Multi-table hyperplane LSH: >=90% of exact top-3 neighbors found
    for random queries, and >=85% of planted near-dup partners at k=1."""
    qids = [0, 1, 2, 3, 4]
    exact = _topk_sets(S.cosine_topk(emb, qids, k=3).collect())
    approx = _topk_sets(S.lsh_cosine_topk(emb, qids, k=3).collect())
    total = sum(len(v) for v in exact.values())
    hit = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    assert hit / total >= 0.9, f"LSH top-k recall collapsed: {hit}/{total}"

    pq = sorted({a for a, _ in planted_embedding_pairs})
    found = _topk_sets(S.lsh_cosine_topk(emb, pq, k=1).collect())
    ok = sum(1 for a, b in planted_embedding_pairs
             if b in found.get(a, set()))
    n = len(planted_embedding_pairs)
    assert ok / n >= 0.85, f"LSH planted-pair recall collapsed: {ok}/{n}"


def test_lsh_topk_md5_twin_recall(emb, planted_embedding_pairs):
    """The oracle-exact md5 top-k twin holds the fast path's quality
    contract: exact-top-3 recall above the floor for random queries,
    planted partners found at k=1."""
    qids = [0, 1, 2, 3, 4]
    exact = _topk_sets(S.cosine_topk(emb, qids, k=3).collect())
    approx = _topk_sets(
        S.lsh_cosine_topk_md5(emb, qids, k=3, n_tables=16,
                              bits_per_table=4).collect())
    total = sum(len(v) for v in exact.values())
    hit = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    assert hit / total >= 0.8, \
        f"md5 LSH top-k recall collapsed: {hit}/{total}"

    pq = sorted({a for a, _ in planted_embedding_pairs})
    found = _topk_sets(
        S.lsh_cosine_topk_md5(emb, pq, k=1, n_tables=16,
                              bits_per_table=4).collect())
    ok = sum(1 for a, b in planted_embedding_pairs
             if b in found.get(a, set()))
    n = len(planted_embedding_pairs)
    assert ok / n >= 0.85, \
        f"md5 LSH planted-pair recall collapsed: {ok}/{n}"


def test_ivf_topk_recall_on_planted_pairs(emb, planted_embedding_pairs):
    """IVF with a majority of cells probed must find >=90% of planted
    near-dup partners at k=1.  (These fixtures are near-uniform random,
    the hardest case for IVF — real corpora cluster, and at scale
    n_clusters grows ~sqrt(n) so the probed FRACTION shrinks.)"""
    pq = sorted({a for a, _ in planted_embedding_pairs})
    found = _topk_sets(S.ivf_cosine_topk(emb, pq, k=1, n_probe=5).collect())
    ok = sum(1 for a, b in planted_embedding_pairs
             if b in found.get(a, set()))
    n = len(planted_embedding_pairs)
    assert ok / n >= 0.9, f"IVF planted-pair recall collapsed: {ok}/{n}"


def test_pq_topk_recall_vs_exact(emb):
    """PQ-ADC shortlist + exact re-rank must recover >=80% of the exact
    top-3 sets (measured 30/30 at the defaults on this fixture — the
    floor leaves noise margin for KMeans tie-breaks across PySpark
    versions).  Near-uniform random vectors are PQ's hardest case; the
    default grid (m=16 × 64 centroids) is sized for it."""
    qids = list(range(10))
    exact = _topk_sets(S.cosine_topk(emb, qids, k=3).collect())
    pq = _topk_sets(S.pq_cosine_topk(emb, qids, k=3).collect())
    overlap = sum(len(exact[q] & pq[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert overlap / total >= 0.8, f"PQ overlap {overlap}/{total}"


def test_pq_topk_recall_on_planted_pairs(emb, planted_embedding_pairs):
    """PQ must find >=85% of planted near-dup partners at k=1 (measured
    14/14 at the defaults; the re-rank stage makes the shortlist the
    only recall risk)."""
    qids = sorted({a for a, _ in planted_embedding_pairs})
    found = _topk_sets(S.pq_cosine_topk(emb, qids, k=1).collect())
    ok = sum(1 for a, b in planted_embedding_pairs
             if b in found.get(a, set()))
    n = len(planted_embedding_pairs)
    assert ok / n >= 0.85, f"PQ planted-pair recall collapsed: {ok}/{n}"


def test_ivfpq_topk_recall_on_planted_pairs(emb, planted_embedding_pairs):
    """The composed residual-encoded IVFPQ index (coarse-cell pruning
    + residual PQ-ADC + exact re-rank) must keep >=85% planted
    recall@1 at n_probe=3 of 8 cells — TIGHTER than the round-5 floor
    (n_probe=5): pruning and compression errors compound, so this
    floor guards the COMPOSITION, not just the halves.  Measured
    13/14 at n_probe=3 and 14/14 at n_probe=5 (deterministic seeds;
    SCALE.md round-6 note)."""
    qids = sorted({a for a, _ in planted_embedding_pairs})
    n = len(planted_embedding_pairs)
    found = _topk_sets(S.ivfpq_cosine_topk(emb, qids, k=1,
                                           n_probe=3).collect())
    ok = sum(1 for a, b in planted_embedding_pairs
             if b in found.get(a, set()))
    assert ok / n >= 0.85, f"IVFPQ planted-pair recall collapsed: {ok}/{n}"
    found5 = _topk_sets(S.ivfpq_cosine_topk(emb, qids, k=1,
                                            n_probe=5).collect())
    ok5 = sum(1 for a, b in planted_embedding_pairs
              if b in found5.get(a, set()))
    assert ok5 >= ok, "more probes must never lose recall"
    assert ok5 / n >= 0.85, f"IVFPQ recall at n_probe=5: {ok5}/{n}"


def test_quantized_topk_recall_vs_exact(emb):
    """int8 quantization must preserve the exact top-3 neighborhood
    almost perfectly (64-dim vectors, ~0.4% worst-case per-component
    error): >=80% overlap of the top-3 sets, and rank-1 preserved for
    >=80% of queries."""
    qids = list(range(10))
    exact = _topk_sets(S.cosine_topk(emb, qids, k=3).collect())
    quant = _topk_sets(S.dequantized_cosine_topk(emb, qids, k=3).collect())
    overlap = sum(len(exact[q] & quant[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert overlap / total >= 0.8, f"quantized overlap {overlap}/{total}"


def test_ngram_candidates_then_edit_distance_verify(spark):
    """The documented full-recall composition: LSH/ngram CANDIDATE pairs
    fed into exact Levenshtein as the VERIFY step (instead of length
    blocking) — near-dups that straddle a length bucket still survive."""
    from pyspark.sql import functions as F
    from olap_xtrctr_spark.operators import dedup as D

    base = ("the quick brown fox jumps over the lazy dog and then "
            "reflects on the nature of laziness itself for a while")
    docs = spark.createDataFrame(
        [(1, base),
         (2, base + " plus a moderately long appended tail of words"),
         (3, "completely different content about spark planning here "
             "with enough tokens to shingle properly and then some")],
        "doc_id long, text string")
    cands = D.ngram_jaccard_pairs(docs, n=3, threshold=0.3)
    texts = docs.select(F.col("doc_id").alias("id"),
                        F.substring("text", 1, 200).alias("pre"))
    verified = (cands
                .join(texts.withColumnRenamed("id", "id_a")
                           .withColumnRenamed("pre", "pre_a"), on="id_a")
                .join(texts.withColumnRenamed("id", "id_b")
                           .withColumnRenamed("pre", "pre_b"), on="id_b")
                .withColumn("edit_dist",
                            F.levenshtein("pre_a", "pre_b", 60))
                .filter(F.col("edit_dist") >= 0)
                .select("id_a", "id_b", "edit_dist"))
    out = {(r["id_a"], r["id_b"]): r["edit_dist"]
           for r in verified.collect()}
    # docs 1/2 differ by a 47-char tail (len difference >> any length
    # bucket of width 40) yet survive candidates->verify
    assert set(out) == {(1, 2)}
    assert 40 <= out[(1, 2)] <= 60


def test_lsh_near_dup_pairs_recall_and_precision(emb, planted_embedding_pairs):
    """All-pairs LSH near-dup at the loose-threshold setting (planted
    pairs sit near cosine 0.5 -> 4 bits / 16 tables): >=85% of the
    exact-GEMM pairs recovered, and every reported pair verified exact
    (precision 1.0 by construction — assert the threshold holds)."""
    got = S.lsh_near_dup_pairs(emb, threshold=0.45, n_tables=16,
                               bits_per_table=4).collect()
    found = {(r.id_a, r.id_b) for r in got}
    truth = set(planted_embedding_pairs)
    recall = len(truth & found) / len(truth)
    assert recall >= 0.85, f"LSH near-dup recall collapsed: {recall:.2f}"
    assert all(r.cosine >= 0.45 for r in got)


def test_lsh_near_dup_md5_twin_recall_and_precision(
        emb, planted_embedding_pairs):
    """The oracle-exact md5 twin holds the same quality contract as the
    fast path at the loose-threshold setting: planted pairs recovered
    above the floor, every reported pair above the verify threshold
    (precision 1.0 — candidates are exact-verified)."""
    got = S.lsh_near_dup_pairs_md5(emb, threshold=0.45, n_tables=16,
                                   bits_per_table=4).collect()
    found = {(r.id_a, r.id_b) for r in got}
    truth = set(planted_embedding_pairs)
    recall = len(truth & found) / len(truth)
    assert recall >= 0.85, \
        f"md5-LSH near-dup recall collapsed: {recall:.2f}"
    assert all(r.cosine >= 0.45 for r in got)


def test_hybrid_search_modes_agree(emb, docs):
    """query_id (lazy, in-plan) and query_vec (literal) must score
    identically; empty terms mean pure vector search, not a crash."""
    qvec = [float(x) for x in
            emb.filter(emb.vec_id == 0).first()["embedding"]]
    by_id = S.hybrid_search(docs, emb, ["vector", "stream"],
                            query_id=0, k=5).collect()
    by_vec = S.hybrid_search(docs, emb, ["vector", "stream"],
                             query_vec=qvec, k=5).collect()
    assert [tuple(r) for r in by_id] == [tuple(r) for r in by_vec]
    pure = S.hybrid_search(docs, emb, [], query_id=0, k=3).collect()
    assert len(pure) == 3
    import pytest
    with pytest.raises(ValueError, match="exactly one"):
        S.hybrid_search(docs, emb, ["x"])
    with pytest.raises(ValueError, match="exactly one"):
        S.hybrid_search(docs, emb, ["x"], query_vec=qvec, query_id=0)


def test_ann_entry_gates_fail_loudly_on_collapse(spark, monkeypatch):
    """The in-entry differential gates must RAISE when the approximate
    operator degrades — a rows-only driver row must never go green on
    collapsed recall.  Simulated by monkeypatching the operator to
    return an empty/duplicate-free result."""
    import pytest

    from olap_xtrctr_spark.workload import WORKLOAD

    # near-dup pairs: empty output = recall 0 -> gate raises
    empty_pairs = S.lsh_near_dup_pairs(
        load_table(spark, SF_RECALL, "embeddings"),
        threshold=0.45, n_tables=16, bits_per_table=4).limit(0)
    monkeypatch.setattr(S, "lsh_near_dup_pairs",
                        lambda *a, **k: empty_pairs)
    with pytest.raises(AssertionError, match="recall"):
        WORKLOAD["emb_lsh_near_dup_pairs"].fn(spark, SF_RECALL)

    # top-k: self-matches only -> exact top-1 never found -> gate raises
    emb = load_table(spark, SF_RECALL, "embeddings")
    bogus = S.cosine_topk(emb, [0, 1, 2, 3, 4], k=1).limit(0)
    monkeypatch.setattr(S, "pq_cosine_topk", lambda *a, **k: bogus)
    with pytest.raises(AssertionError, match="top-1"):
        WORKLOAD["emb_pq_topk"].fn(spark, SF_RECALL)


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """Deterministic mixture-of-Gaussians corpus (the clustered regime
    IVF pruning was designed for — SCALE.md round-7 probe; the parquet
    testdata embeddings are near-uniform, where pruning cannot show).
    2,000 vectors, 16 anisotropic components, dim 32, fixed seed."""
    import numpy as np
    rng = np.random.default_rng(20260814)
    n, k, dim = 2000, 16, 32
    centers = rng.normal(0.0, 1.0, size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    scales = rng.uniform(0.02, 0.15, size=(k, dim))
    assign = rng.integers(0, k, size=n)
    vecs = centers[assign] + rng.normal(0.0, 1.0, (n, dim)) * scales[assign]
    rows = [(int(i), [float(x) for x in vecs[i]], int(assign[i]))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int").cache()


def test_ivf_prunes_cells_on_clustered_corpus(clustered_emb):
    """On clustered data IVF recall must hold at n_probe << n_cells —
    the round-7 measured pruning regime (recall@10 = 1.0 at 2/32 cells
    at 20k vectors; this pins the smaller in-CI replica)."""
    qids = list(range(0, 2000, 40))
    exact, approx = {}, {}
    for r in S.cosine_topk(clustered_emb, qids, k=5).collect():
        exact.setdefault(r.query_id, []).append(r.neighbor_id)
    for r in S.ivf_cosine_topk(clustered_emb, qids, k=5,
                               n_clusters=16, n_probe=2).collect():
        approx.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = sum(len(set(exact[q]) & set(approx.get(q, [])))
               for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.9, (
        f"IVF recall@5 at n_probe=2/16 collapsed to {hits / total:.3f} "
        f"on clustered data — cell pruning regression")


def test_residual_ivfpq_beats_global_pq_on_clustered_corpus(clustered_emb):
    """Residual encoding must show a NONZERO gain on clustered data
    (round-7 probe: +0.207 recall@3 at 20k; zero on uniform vectors —
    this is the regime the residual path exists for)."""
    qids = list(range(0, 2000, 80))
    exact = {}
    for r in S.cosine_topk(clustered_emb, qids, k=3).collect():
        exact.setdefault(r.query_id, []).append(r.neighbor_id)

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r.query_id, []).append(r.neighbor_id)
        hits = sum(len(set(exact[q]) & set(got.get(q, []))) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    r_pq = recall(S.pq_cosine_topk(clustered_emb, qids, k=3,
                                   m=8, dim=32).collect())
    r_ivfpq = recall(S.ivfpq_cosine_topk(
        clustered_emb, qids, k=3, n_clusters=16, n_probe=4,
        m=8, dim=32).collect())
    assert r_ivfpq > r_pq, (
        f"residual IVFPQ ({r_ivfpq:.3f}) must beat global-codebook PQ "
        f"({r_pq:.3f}) on clustered vectors")
    assert r_ivfpq >= 0.55, f"residual IVFPQ recall {r_ivfpq:.3f} too low"


def test_cross_split_leakage_lsh_gate_fails_loudly(spark, monkeypatch):
    """The LSH leakage audit's differential gate must raise on recall
    collapse — same contract as the other rows-only ANN entries."""
    import pytest

    from olap_xtrctr_spark.workload import WORKLOAD

    empty = S.lsh_near_dup_pairs(
        load_table(spark, SF_RECALL, "embeddings"),
        threshold=0.40, n_tables=16, bits_per_table=4).limit(0)
    monkeypatch.setattr(S, "lsh_near_dup_pairs", lambda *a, **k: empty)
    with pytest.raises(AssertionError, match="recall"):
        WORKLOAD["emb_cross_split_leakage_lsh"].fn(spark, SF_RECALL)


def test_hll_md5_accuracy_and_merge(spark):
    """Oracle-exact md5 HLL: estimates within the expected rse band of
    the truth (p=10 -> ~3.2% rse; allow 4 sigma), the linear-counting
    branch exact for tiny cardinalities, and sharded register merges
    equal to the one-shot registers (max per register is associative)."""
    from pyspark.sql import functions as F

    from olap_xtrctr_spark.operators.sketches import (
        hll_md5_distinct, hll_md5_estimate, hll_md5_registers)

    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.concat(F.lit("u"), (F.col("id"))).alias("uid"))
    truth = {r["g"]: r["c"] for r in
             df.groupBy("g").agg(F.countDistinct("uid").alias("c"))
             .collect()}
    est = {r["g"]: r["n_distinct_est"] for r in
           hll_md5_distinct(df, ["g"], "uid").collect()}
    for g, t in truth.items():
        assert abs(est[g] - t) / t < 0.13, (g, est[g], t)

    # tiny cardinality -> linear counting is near-exact
    tiny = spark.range(25).select(
        F.lit("t").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("uid"))
    e = hll_md5_distinct(tiny, ["g"], "uid").first()["n_distinct_est"]
    # register collisions make linear counting undercount by the
    # number of colliding pairs (3 here for this salt) — still within
    # the sketch's contract for 25 keys over 1024 registers
    assert abs(e - 25) <= 3

    # shard merge: max-per-register over shard registers == one-shot
    sharded = df.withColumn("_shard", F.col("uid").substr(-1, 1))
    regs = hll_md5_registers(
        sharded, ["g", "_shard"], "uid")
    merged = (regs.groupBy("g", "reg")
              .agg(F.max("max_rank").alias("max_rank")))
    via_merge = {r["g"]: r["n_distinct_est"] for r in
                 hll_md5_estimate(merged, ["g"]).collect()}
    assert via_merge == est


# ---- frozen-codebook full-oracle twins (round 12) ---------------------------
# emb_pq_topk_exact / emb_ivfpq_topk_exact are value-exact against the
# DuckDB oracle BY CONSTRUCTION (integer codebooks + integer ADC); what
# can still silently degrade is their QUALITY — the frozen grid
# transferring badly would collapse recall while the oracle happily
# agrees.  These floors guard that.

def test_pq_frozen_planted_recall(emb, planted_embedding_pairs):
    """Frozen-codebook PQ at the entry settings (refine=32) must keep
    >=0.85 planted recall@1 (measured 12/14 on this fixture — the
    frozen 8x16 grid is coarser than the learned 16x64 one, hence the
    wider shortlist)."""
    qids = sorted({a for a, _ in planted_embedding_pairs})
    found = _topk_sets(S.pq_topk_frozen(emb, qids, k=1,
                                        refine=32).collect())
    ok = sum(1 for a, b in planted_embedding_pairs
             if b in found.get(a, set()))
    n = len(planted_embedding_pairs)
    assert ok / n >= 0.85, f"frozen PQ planted recall: {ok}/{n}"


def test_ivfpq_frozen_planted_recall(emb, planted_embedding_pairs):
    """Frozen coarse cells + residual codebooks at the entry settings
    (n_probe=5 of 8, refine=32) must keep >=0.85 planted recall@1
    (measured 14/14; at n_probe=3 the frozen cells separate planted
    partners — 7/14 — which is why the entry probes wider)."""
    qids = sorted({a for a, _ in planted_embedding_pairs})
    found = _topk_sets(S.ivfpq_topk_frozen(emb, qids, k=1, n_probe=5,
                                           refine=32).collect())
    ok = sum(1 for a, b in planted_embedding_pairs
             if b in found.get(a, set()))
    n = len(planted_embedding_pairs)
    assert ok / n >= 0.85, f"frozen IVFPQ planted recall: {ok}/{n}"


def test_semantic_dedup_frozen_matches_trained_contract(emb):
    """The frozen-cell SemDeDup entries (full-oracle since r12) keep
    the trained variant's contract: precision 1 vs the exact GEMM pair
    table (same cosine, same threshold — blocking can only LOSE pairs)
    and recall >= 0.7 on this fixture (measured 14/14)."""
    exact = {(r.id_a, r.id_b)
             for r in D.embedding_near_dups(emb, threshold=0.45).collect()}
    got = {(r.id_a, r.id_b)
           for r in S.semantic_dedup_pairs_frozen(
               emb, threshold=0.45, n_assign=3).collect()}
    assert got <= exact, f"phantom pairs: {sorted(got - exact)[:5]}"
    assert exact and len(got & exact) / len(exact) >= 0.7


def test_semantic_dedup_frozen_default_threshold_matches_trained():
    """ADVICE r12: the frozen twins' default threshold must equal the
    trained variants' (0.995, near-duplicate semantics) — default
    callers of the dedup CLI/HTTP semantic mode used to inherit the
    aggressive 0.45 sweep the workload entries pass EXPLICITLY."""
    import inspect

    for frozen, trained in ((S.semantic_dedup_pairs_frozen,
                             S.semantic_dedup_pairs),
                            (S.semantic_dedup_frozen, S.semantic_dedup)):
        f = inspect.signature(frozen).parameters["threshold"].default
        t = inspect.signature(trained).parameters["threshold"].default
        assert f == t == 0.995, (frozen.__name__, f, t)


def test_ivf_frozen_planted_recall(emb, planted_embedding_pairs):
    """Frozen-cell IVF (exact cosine within n_probe=5 probed cells)
    must keep >=0.85 planted recall@1 — the only loss channel is the
    coarse stage separating a planted pair across unprobed cells
    (measured 14/14 on this fixture)."""
    qids = sorted({a for a, _ in planted_embedding_pairs})
    found = _topk_sets(S.ivf_topk_frozen(emb, qids, k=1,
                                         n_probe=5).collect())
    ok = sum(1 for a, b in planted_embedding_pairs
             if b in found.get(a, set()))
    n = len(planted_embedding_pairs)
    assert ok / n >= 0.85, f"frozen IVF planted recall: {ok}/{n}"


def test_quality_classifier_frozen_agrees_with_weak_labels(docs):
    """The frozen integer-LR quality classifier (the value-exact
    sibling of the hashed-BoW pipeline) must keep >=0.95 agreement
    with the weak labels it was trained against (measured 253/253 at
    sf0.01) — the guard against the frozen weights silently rotting
    as fixtures evolve."""
    from olap_xtrctr_spark.operators.classifier import (
        quality_classifier_frozen, weak_quality_labels)
    lab = {r["doc_id"]: int(r["label"])
           for r in weak_quality_labels(docs).collect()}
    pred = {r["doc_id"]: r["keep"]
            for r in quality_classifier_frozen(docs).collect()}
    agree = sum(1 for d, l in lab.items() if pred[d] == l)
    assert agree / len(lab) >= 0.95, f"{agree}/{len(lab)}"
