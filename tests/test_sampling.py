"""Deterministic sampling/splitting operators (operators/sampling.py).

The load-bearing property of every operator here is key-determinism:
re-running, re-partitioning, or re-ordering the input must select the
SAME rows — that's what makes a training-data sample reproducible on a
cluster with retries and speculative execution.
"""
import pytest
from pyspark.sql import functions as F

from olap_xtrctr_spark.operators import sampling as SM
from olap_xtrctr_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_hash_split_partitions_and_fractions(spark, docs):
    out = SM.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n          # exhaustive, no row dropped
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)
    # determinism across partitionings: same assignment after repartition
    again = {(r["doc_id"], r["split"]) for r in
             SM.hash_split(docs.repartition(7), {"train": 0.8, "val": 0.1,
                                                 "test": 0.1})
             .select("doc_id", "split").collect()}
    first = {(r["doc_id"], r["split"]) for r in
             out.select("doc_id", "split").collect()}
    assert first == again


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        SM.hash_split(docs, {})
    with pytest.raises(ValueError):
        SM.hash_split(docs, {"a": 0.9, "b": 0.3})


def test_stratified_sample_rates_and_determinism(spark, docs):
    out = SM.stratified_sample(docs, {"en": 1.0, "es": 0.0},
                               default_rate=0.0)
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}                    # rate-1 stratum kept whole
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en
    half = SM.stratified_sample(docs, {"en": 0.5}, default_rate=0.0)
    # hash buckets are uniform: expect ~half, generous tolerance
    assert 0.3 * n_en < half.count() < 0.7 * n_en
    assert {r["doc_id"] for r in half.select("doc_id").collect()} == \
        {r["doc_id"] for r in
         SM.stratified_sample(docs.repartition(5), {"en": 0.5},
                              default_rate=0.0)
         .select("doc_id").collect()}


def test_uniform_sample_k_exact_size_and_stable(spark, docs):
    a = {r["doc_id"] for r in SM.uniform_sample_k(docs, 50).collect()}
    b = {r["doc_id"] for r in
         SM.uniform_sample_k(docs.repartition(9), 50).collect()}
    assert len(a) == 50 and a == b


def test_uniform_sample_k_is_topk_not_global_sort(spark, docs):
    plan = SM.uniform_sample_k(docs, 10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan    # per-partition heap + merge
    assert "Sort " not in plan                # no full sort of the corpus


def test_incremental_dedup_removes_cross_and_intra_batch_dups(spark, docs):
    # seen = even doc_ids; new = odd doc_ids PLUS a copy of one seen doc's
    # text under a fresh id (cross-batch dup) and a repeated odd text
    # (intra-batch dup) — neither may survive
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    seen_row = seen.select("doc_id", "text", "lang", "source",
                           "n_chars").first()
    odd_row = odd.select("doc_id", "text", "lang", "source",
                         "n_chars").first()
    spark_ = docs.sparkSession
    extra = spark_.createDataFrame(
        [(10_000_001, seen_row["text"], seen_row["lang"],
          seen_row["source"], seen_row["n_chars"]),
         (10_000_002, odd_row["text"], odd_row["lang"],
          odd_row["source"], odd_row["n_chars"])],
        schema=docs.schema)
    new = odd.unionByName(extra)
    kept = {r["doc_id"] for r in
            SM.incremental_dedup(new, seen).select("doc_id").collect()}
    assert 10_000_001 not in kept             # cross-batch dup dropped
    assert 10_000_002 not in kept             # intra-batch dup: keep-first
    assert odd_row["doc_id"] in kept          # the original survives


def test_length_histogram_totals(spark, docs):
    hist = SM.length_histogram(docs, bucket_chars=100).collect()
    assert sum(r["n_docs"] for r in hist) == docs.count()
    total = docs.agg(F.sum("n_chars")).first()[0]
    assert sum(r["total_chars"] for r in hist) == total


def test_prepare_corpus_pipeline(spark, docs):
    from olap_xtrctr_spark.operators.pipeline import prepare_corpus
    from olap_xtrctr_spark.operators.text import fingerprint, quality_score
    out = prepare_corpus(docs, min_quality=0.5).collect()
    ids = {r["doc_id"] for r in out}
    assert len(ids) == len(out) > 0           # unique survivors
    assert {r["split"] for r in out} <= {"train", "val"}
    # every survivor passed the quality gate
    q_ok = {r["doc_id"] for r in
            quality_score(docs)
            .filter("quality_score >= 0.5").collect()}
    assert ids <= q_ok
    # no two survivors share a fingerprint, and each is its group's min
    # id within the quality-passed set
    fps = {r["doc_id"]: r["fingerprint"] for r in
           fingerprint(docs).collect()}
    by_fp = {}
    for d in sorted(q_ok):
        by_fp.setdefault(fps[d], d)
    assert ids == set(by_fp.values())


def test_prepared_corpus_roundtrip_partitioned_by_split(spark, docs,
                                                        tmp_path):
    """The end of the pipeline: write the prepared corpus partitioned by
    split, read it back, and get exactly the same assignment (the
    physical layout a downstream trainer consumes)."""
    from olap_xtrctr_spark.operators.pipeline import prepare_corpus
    from olap_xtrctr_spark.sinks import write_parquet

    out = prepare_corpus(docs, min_quality=0.5)
    n = write_parquet(out, str(tmp_path / "corpus"),
                      partition_by=["split"])
    assert n == out.count()
    back = spark.read.parquet(str(tmp_path / "corpus"))
    assert {(r["doc_id"], r["split"]) for r in back.collect()} == \
        {(r["doc_id"], r["split"]) for r in out.collect()}
    # split pruning reaches the read plan
    q = back.filter(F.col("split") == "train")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan


def test_temperature_mix_rates_boundaries(spark):
    from olap_xtrctr_spark.operators import sampling as SM
    docs = spark.createDataFrame(
        [(1, "a b c d", "big"), (2, "e f g h", "big"),
         (3, "i j", "small")],
        "doc_id long, text string, source string")
    # T=1: proportional to tokens (8 vs 2 -> 800000 / 200000 ppm)
    t1 = {r["source"]: r["mix_rate_ppm"]
          for r in SM.temperature_mix_rates(docs, 1.0).collect()}
    assert t1 == {"big": 800000, "small": 200000}
    # T=0: uniform across sources (fxexp(0) == 1 exactly)
    t0 = {r["source"]: r["mix_rate_ppm"]
          for r in SM.temperature_mix_rates(docs, 0.0).collect()}
    assert t0 == {"big": 500000, "small": 500000}
    # 0<T<1 sits strictly between; ppm sum within DIV-floor slack
    t7 = {r["source"]: r["mix_rate_ppm"]
          for r in SM.temperature_mix_rates(docs, 0.7).collect()}
    assert 500000 < t7["big"] < 800000
    assert 1_000_000 - len(t7) <= sum(t7.values()) <= 1_000_000


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """Docs sharing the target slice's vocabulary must outscore docs
    that don't: the importance weight is a hashed-ngram LLR, so a raw
    doc written in the target's words has positive-leaning buckets."""
    from pyspark.sql import Row
    target_text = "solar panels convert sunlight into electric power"
    rows = [
        Row(doc_id=0, source="tgt", text=target_text),
        Row(doc_id=1, source="tgt",
            text="solar power systems store electric energy"),
        Row(doc_id=2, source="raw",
            text="solar panels and electric power at home"),
        Row(doc_id=3, source="raw",
            text="recipe for sourdough bread with olive oil"),
    ]
    df = spark.createDataFrame(rows)
    w = {r["doc_id"]: r["weight_micro"]
         for r in SM.dsir_importance_weights(
             df, F.col("source") == "tgt", n_buckets=64).collect()}
    assert set(w) == {0, 1, 2, 3}
    assert w[2] > w[3], f"target-like doc not preferred: {w}"


def test_dsir_weights_exact_integer_and_deterministic(spark, docs):
    """Two runs produce identical integer weights (the ln is frozen to
    micro-units per bucket before any per-doc math)."""
    cond = F.col("source") == "src0"
    a = sorted(map(tuple, SM.dsir_importance_weights(docs, cond)
                   .collect()))
    b = sorted(map(tuple, SM.dsir_importance_weights(docs, cond)
                   .collect()))
    assert a == b and len(a) > 0
    assert all(isinstance(r[2], int) for r in a)


def test_dsir_gumbel_sample_deterministic_and_tempered(spark, docs):
    """Gumbel resampling is deterministic across runs (md5 noise); at
    tiny temperature weights dominate (matches the hard top-k set);
    at huge temperature noise dominates (selection diverges)."""
    cond = F.col("source") == "src0"
    a = [tuple(r) for r in SM.dsir_gumbel_sample(docs, cond, k=20,
                                                 temperature=1.0).collect()]
    b = [tuple(r) for r in SM.dsir_gumbel_sample(docs, cond, k=20,
                                                 temperature=1.0).collect()]
    assert a == b and len(a) == 20
    cold = {r["doc_id"] for r in SM.dsir_gumbel_sample(
        docs, cond, k=20, temperature=1e-6).collect()}
    hard = {r["doc_id"] for r in SM.dsir_select_top_k(
        docs, cond, k=20).collect()}
    assert cold == hard
    hot = {r["doc_id"] for r in SM.dsir_gumbel_sample(
        docs, cond, k=20, temperature=1e9).collect()}
    assert hot != hard
    with pytest.raises(ValueError):
        SM.dsir_gumbel_sample(docs, cond, temperature=0)


def test_shuffle_corpus_deterministic_and_sharded(spark):
    from olap_xtrctr_spark.operators.sampling import shuffle_corpus

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(100)],
                                 "doc_id long, text string")
    a = shuffle_corpus(docs, n_shards=4).collect()
    b = shuffle_corpus(docs.repartition(7), n_shards=4).collect()
    ka = sorted((r["doc_id"], r["shard"], r["shard_pos"]) for r in a)
    kb = sorted((r["doc_id"], r["shard"], r["shard_pos"]) for r in b)
    assert ka == kb                       # partitioning-independent
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():   # dense 1..n per shard
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # different salt -> different permutation
    c = shuffle_corpus(docs, n_shards=4, salt="epoch-2").collect()
    kc = sorted((r["doc_id"], r["shard"], r["shard_pos"]) for r in c)
    assert kc != ka
    import pytest
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_corpus(docs, n_shards=0)


def test_token_budget_fill_prefix_and_boundary(spark):
    from olap_xtrctr_spark.operators.sampling import token_budget_fill

    rows = [(1, 10, 900), (2, 10, 900), (3, 10, 800),
            (4, 10, 700), (5, 10, 700)]
    scored = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, score_milli long")
    # budget 25: docs 1, 2 fit (cum 10, 20); doc 3 would cross -> out
    out = {r["doc_id"]: r["cum_tokens"]
           for r in token_budget_fill(scored, 25).collect()}
    assert out == {1: 10, 2: 20}
    # budget 35: boundary lands INSIDE score 800's block
    out = {r["doc_id"]: r["cum_tokens"]
           for r in token_budget_fill(scored, 35).collect()}
    assert out == {1: 10, 2: 20, 3: 30}
    # ties at the boundary score break by id: budget 45 admits doc 4
    # (id-ordered) but not doc 5
    out = {r["doc_id"]: r["cum_tokens"]
           for r in token_budget_fill(scored, 45).collect()}
    assert out == {1: 10, 2: 20, 3: 30, 4: 40}
    # budget below the first doc -> empty
    assert token_budget_fill(scored, 5).count() == 0


def test_grouped_token_cap_per_group_prefix_and_boundary(spark):
    from olap_xtrctr_spark.operators.sampling import grouped_token_cap

    rows = [  # (doc_id, source, n_tokens, score_milli)
        (1, "a", 10, 900), (2, "a", 10, 900), (3, "a", 10, 800),
        (4, "b", 10, 700), (5, "b", 10, 700), (6, "b", 10, 600)]
    scored = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long, score_milli long")
    # cap 25: each group keeps its best 2 docs (cum 10, 20); the third
    # would cross and is out — independently per group
    out = {r["doc_id"]: (r["source"], r["cum_tokens"])
           for r in grouped_token_cap(scored, 25, group_col="source")
           .collect()}
    assert out == {1: ("a", 10), 2: ("a", 20),
                   4: ("b", 10), 5: ("b", 20)}
    # ties at a group's boundary score break by id (4 in, 5 out at 15)
    out = grouped_token_cap(scored, 15, group_col="source")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 4]
    # a cap larger than any group keeps everything
    assert grouped_token_cap(scored, 1000, group_col="source").count() == 6


def test_grouped_token_cap_windows_stay_inside_the_group(spark, sf_dir):
    """Scale claim: every window is keyed by the group (plus score for
    the per-row pass) — no global running total, no corpus range sort."""
    from olap_xtrctr_spark.operators.sampling import grouped_token_cap
    from olap_xtrctr_spark.operators.text import quality_score
    from olap_xtrctr_spark.session import load_table
    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs).select(
        "doc_id", "n_tokens",
        F.round(F.col("quality_score") * 1000).cast("bigint")
         .alias("score_milli")) \
        .join(docs.select("doc_id", "source"), "doc_id")
    plan = grouped_token_cap(scored, 5_000, group_col="source") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(source" in plan
    assert "rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_cross_split_leakage_flags_only_cross_split_twins(spark):
    import hashlib

    from olap_xtrctr_spark.operators.dedup import cross_split_leakage

    def bucket(i):
        h = hashlib.md5(f"{i}:split-v1".encode()).hexdigest()
        return int(h[:15], 16) % 10_000

    train = [i for i in range(60) if bucket(i) < 8000]
    evalid = [i for i in range(60) if bucket(i) >= 8000]
    assert len(train) >= 3 and len(evalid) >= 1
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    far = [0.0, 1.0, 0.0, 0.0]
    rows = [(train[0], base), (evalid[0], near),   # cross-split twin
            (train[1], base), (train[2], base),    # in-split dups only
            (train[3] if len(train) > 3 else train[0] + 100, far)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cross_split_leakage(emb, {"train": 0.8, "eval": 0.2},
                              threshold=0.99).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    expected = {(min(train[0], evalid[0]), max(train[0], evalid[0])),
                (min(train[1], evalid[0]), max(train[1], evalid[0])),
                (min(train[2], evalid[0]), max(train[2], evalid[0]))}
    assert pairs == expected
    for r in got:
        assert {r["split_a"], r["split_b"]} == {"train", "eval"}
        assert r["cosine"] >= 0.99


def test_kanon_release_primary_and_complementary_rules(spark):
    from olap_xtrctr_spark.operators.sampling import kanon_release

    rows = []
    for parent, child, cnt in (("A", 1, 3), ("A", 2, 10), ("A", 3, 7),
                               ("B", 1, 2), ("B", 2, 4), ("B", 3, 9),
                               ("C", 1, 6), ("C", 2, 8)):
        rows += [(parent, child, 1.0)] * cnt
    df = spark.createDataFrame(rows, "p string, c long, value double")
    out = {(r["p"], r["c"]): r for r in
           kanon_release(df, "p", "c", k=5, value_col="value").collect()}
    assert len(out) == 8
    # A: one primary (c=1, n=3) -> complementary hides the smallest
    # remaining cell (c=3, n=7); c=2 stays visible
    assert out[("A", 1)]["suppressed"] and out[("A", 1)]["n"] is None
    assert out[("A", 3)]["suppressed"] and out[("A", 3)]["sum_value"] is None
    assert not out[("A", 2)]["suppressed"] and out[("A", 2)]["n"] == 10
    # B: TWO primaries -> no complementary needed; c=3 stays visible
    assert out[("B", 1)]["suppressed"] and out[("B", 2)]["suppressed"]
    assert not out[("B", 3)]["suppressed"] and out[("B", 3)]["n"] == 9
    # C: nothing under k -> nothing suppressed
    assert not out[("C", 1)]["suppressed"]
    assert not out[("C", 2)]["suppressed"]
    # the subtraction attack is actually closed: per parent, either 0
    # or >= 2 suppressed cells
    for p in ("A", "B", "C"):
        hidden = sum(1 for (pp, _), r in out.items()
                     if pp == p and r["suppressed"])
        assert hidden in (0, 2)


def test_cluster_split_no_straddle(spark):
    """cluster_split contracts: (1) members of a cluster always share a
    split; (2) the assignment matches hash_split applied to the cluster
    key; (3) empty / over-1 weights rejected."""
    import pytest as _pytest

    from olap_xtrctr_spark.operators import sampling as SM

    rows = [(i, f"c{i % 50}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id int, canon string")
    out = SM.cluster_split(df, {"train": 0.8, "val": 0.1, "test": 0.1},
                           "canon")
    per_cluster = (out.groupBy("canon")
                   .agg(F.countDistinct("split").alias("n")).collect())
    assert all(r["n"] == 1 for r in per_cluster)
    # equals hash_split on the cluster key itself
    ref = {r["canon"]: r["split"] for r in SM.hash_split(
        df.select("canon").distinct(),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        id_col="canon").collect()}
    assert all(r["split"] == ref[r["canon"]] for r in out.collect())
    with _pytest.raises(ValueError, match="non-empty"):
        SM.cluster_split(df, {}, "canon")
    with _pytest.raises(ValueError, match="> 1"):
        SM.cluster_split(df, {"a": 0.9, "b": 0.3}, "canon")


def test_dedup_weights(spark):
    """dedup_weights: multiplicity, capped weight, and distinct-source
    spread per surviving text, keyed by md5 digest."""
    from olap_xtrctr_spark.operators import dedup as D

    rows = ([(i, "same text", f"s{i % 2}") for i in range(6)]
            + [(10, "unique", "s0")])
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    out = {r["keep_id"]: r for r in D.dedup_weights(df).collect()}
    assert out[0]["weight"] == 6 and out[0]["weight_capped"] == 4
    assert out[0]["n_sources"] == 2
    assert out[10]["weight"] == 1 and out[10]["weight_capped"] == 1
    assert out[10]["n_sources"] == 1


# ---- round-13 wave 2: curriculum interleave + budget apportionment ---------

def test_interleave_sources_round_robin(spark):
    from olap_xtrctr_spark.operators import sampling as SM
    # uneven sources: a has 3 docs, b has 2, c has 1
    rows = [(0, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["global_pos"]: (r["doc_id"], r["source"], r["source_rank"])
           for r in SM.interleave_sources(docs, bucket=2).collect()}
    # lexicographic (rank, source, id): rank-1 of a,b,c then rank-2 of
    # a,b then rank-3 of a
    assert [out[i] for i in range(1, 7)] == [
        (0, "a", 1), (3, "b", 1), (5, "c", 1),
        (1, "a", 2), (4, "b", 2), (2, "a", 3)]


def test_budget_allocation_hamilton_exact(spark):
    from olap_xtrctr_spark.operators import sampling as SM
    # weights 5, 3, 2 over k=7: exact shares 3.5/2.1/1.4 ->
    # base 3/2/1 (sum 6), largest remainder .5 -> s0 gets the 7th slot
    docs = spark.createDataFrame(
        [(0, "s0", 5), (1, "s1", 3), (2, "s2", 2)],
        "doc_id long, source string, n_chars long")
    got = {r["source"]: r["alloc"]
           for r in SM.budget_allocation(docs, k=7).collect()}
    assert got == {"s0": 4, "s1": 2, "s2": 1}

    # remainder TIE: weights 1,1 over k=3 -> base 1/1, one leftover
    # slot, tie on remainder 1/2 broken to the smaller source name
    docs2 = spark.createDataFrame(
        [(0, "sA", 1), (1, "sB", 1)],
        "doc_id long, source string, n_chars long")
    got2 = {r["source"]: r["alloc"]
            for r in SM.budget_allocation(docs2, k=3).collect()}
    assert got2 == {"sA": 2, "sB": 1}


def test_budget_allocation_sums_to_k_on_fixture(spark, sf_dir):
    from olap_xtrctr_spark.operators import sampling as SM
    from olap_xtrctr_spark.session import load_table
    import pyspark.sql.functions as F
    docs = load_table(spark, sf_dir, "documents")
    out = SM.budget_allocation(docs, k=12_345)
    agg = out.agg(F.sum("alloc").alias("s"),
                  F.count("*").alias("g")).collect()[0]
    assert agg["s"] == 12_345 and agg["g"] == 20
