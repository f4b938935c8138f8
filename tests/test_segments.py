"""Segment-level dedup operators — hand-computed frames.

Segments are non-overlapping ``seg_tokens``-token windows; with
seg_tokens=2 a 4-token doc "a b c d" has segments ["a b", "c d"].
"""
from pyspark.sql import Row

from olap_xtrctr_spark.operators import segments as SEG


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


def _by_id(out):
    return {r["doc_id"]: (r["n_segments"], r["n_kept"], r["kept_text"])
            for r in out.collect()}


def test_segment_dedup_first_occurrence_wins(spark):
    # "a b" appears in docs 0, 1, 2 — only doc 0 (earliest) keeps it;
    # doc 1 additionally repeats it internally (positions 0 and 2):
    # both later occurrences are cut.
    df = _docs(spark, ["a b c d", "a b x y a b", "a b", "p q"])
    got = _by_id(SEG.segment_dedup(df, seg_tokens=2))
    assert got == {0: (2, 2, "a b c d"),
                   1: (3, 1, "x y"),
                   2: (1, 0, ""),
                   3: (1, 1, "p q")}


def test_segment_dedup_final_short_window_kept(spark):
    # 5 tokens with seg_tokens=2 -> segments "a b", "c d", "e": the
    # trailing 1-token window is its own segment and dedups separately
    df = _docs(spark, ["a b c d e", "e"])
    got = _by_id(SEG.segment_dedup(df, seg_tokens=2))
    assert got == {0: (3, 3, "a b c d e"), 1: (1, 0, "")}


def test_segment_freq_filter_drops_from_all_docs(spark):
    # "x y" is in 3 distinct docs (> max_docs=2): removed everywhere,
    # including its first occurrence; "a b" (2 docs) survives.
    df = _docs(spark, ["x y a b", "x y c d", "x y", "a b"])
    got = _by_id(SEG.segment_freq_filter(df, seg_tokens=2, max_docs=2))
    assert got == {0: (2, 1, "a b"),
                   1: (2, 1, "c d"),
                   2: (1, 0, ""),
                   3: (1, 1, "a b")}


def test_segment_freq_filter_counts_docs_not_occurrences(spark):
    # "q r" occurs 3 times but in only 2 distinct docs -> kept
    df = _docs(spark, ["q r q r", "q r", "z z"])
    got = _by_id(SEG.segment_freq_filter(df, seg_tokens=2, max_docs=2))
    assert got == {0: (2, 2, "q r q r"),
                   1: (1, 1, "q r"),
                   2: (1, 1, "z z")}


def test_segment_dedup_incremental_equals_one_shot(spark):
    """Folding id-ordered batches through the seen store == one-shot
    corpus dedup; a later batch loses segments the earlier one owns."""
    texts = ["a b c d", "a b x y a b", "a b", "p q", "x y z w", "c d"]
    df = _docs(spark, texts)
    want = _by_id(SEG.segment_dedup(df, seg_tokens=2))

    seen, got = None, {}
    for lo, hi in ((0, 2), (2, 4), (4, 6)):
        batch = df.filter((df.doc_id >= lo) & (df.doc_id < hi))
        res, seen = SEG.segment_dedup_incremental(batch, seen,
                                                  seg_tokens=2)
        seen = seen.localCheckpoint()
        got.update(_by_id(res))
    assert got == want
    # the store holds every distinct segment exactly once
    segs = [r["chunk_text"] for r in seen.collect()]
    assert len(segs) == len(set(segs))
    assert "a b" in segs and "z w" in segs


def test_segment_dedup_incremental_first_batch_no_store(spark):
    df = _docs(spark, ["a b a b"])
    res, seen = SEG.segment_dedup_incremental(df, None, seg_tokens=2)
    assert _by_id(res) == {0: (2, 1, "a b")}
    assert seen.count() == 1


def test_duplicate_span_removal_hand_computed(spark):
    out = {r["doc_id"]: (r["n_tokens"], r["n_dup_spans"],
                         r["n_dup_tokens"], r["dup_spans"])
           for r in SEG.duplicate_span_removal(
               _docs(spark, ["a b c d e",     # first owner of everything
                             "x b c d y",     # interior copy at offset 1
                             "A B c d E",     # full copy (case-folded)
                             "a b q a b",     # two disjoint copies
                             "z",             # shorter than k: no window
                             "m m m"]),       # within-doc repeat
               k=2).collect()}
    assert out[0] == (5, 0, 0, "")
    assert out[1] == (5, 1, 3, "1-3")        # [1,2]+[2,3] merge to 1-3
    assert out[2] == (5, 1, 5, "0-4")
    assert out[3] == (5, 2, 4, "0-1,3-4")    # disjoint spans stay split
    assert out[4] == (1, 0, 0, "")
    assert out[5] == (3, 1, 2, "1-2")        # second "m m" window


def test_duplicate_span_removal_rejects_k1_and_stays_pair_free(spark):
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    with pytest.raises(ValueError, match="k >= 2"):
        SEG.duplicate_span_removal(_docs(spark, ["a"]), k=1)

    from olap_xtrctr_spark.session import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    df = SEG.duplicate_span_removal(docs, k=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no posting-list PAIR generation (the flatten(transform(...))
    # signature of _ngram_pair_counts; "slice"/"collect_list" alone
    # appear legitimately in the zip-chain gram construction and the
    # bounded span-report rollup) and no global sort: marking windows
    # key on the shingle, runs on doc_id
    assert "flatten(transform" not in plan
    assert "rangepartitioning" not in plan
    assert "windowspecdefinition(_sh" in plan
    assert "windowspecdefinition(doc_id" in plan


def test_duplicate_spans_incremental_equals_one_shot(spark):
    rows = ["a b c d e", "x b c d y", "p q r s", "a b c d e z"]
    docs = _docs(spark, rows)
    one_shot = {r["doc_id"]: r for r in
                SEG.duplicate_span_removal(docs, k=2).collect()}
    seen, outs = None, {}
    for lo, hi in ((0, 1), (2, 3)):       # id-ordered batches
        b = docs.filter((docs.doc_id >= lo) & (docs.doc_id <= hi))
        res, seen = SEG.duplicate_spans_incremental(b, seen, k=2)
        seen = seen.localCheckpoint()
        outs.update({r["doc_id"]: r for r in res.collect()})
    assert set(outs) == set(one_shot)
    for i in one_shot:
        for c in ("n_tokens", "n_dup_spans", "n_dup_tokens", "dup_spans"):
            assert outs[i][c] == one_shot[i][c], (i, c)
    # doc 3 duplicates doc 0 ACROSS batches: the store must catch it
    assert outs[3]["n_dup_spans"] >= 1


def test_duplicate_spans_incremental_first_batch_no_store(spark):
    res, seen = SEG.duplicate_spans_incremental(
        _docs(spark, ["a b a b"]), None, k=2)
    out = res.collect()[0]
    assert (out["n_dup_spans"], out["dup_spans"]) == (1, "2-3")
    assert seen.count() == 2               # distinct grams: "a b", "b a"


def test_hash_keyed_windows_match_string_keyed(spark):
    """The 100 TB shuffle trade-off (xxhash64 window keys instead of
    segment/shingle text) must be output-identical on real data —
    collisions aside, which 500 docs cannot produce."""
    from olap_xtrctr_spark.session import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    a = {tuple(r) for r in SEG.segment_dedup(docs, seg_tokens=8).collect()}
    b = {tuple(r) for r in SEG.segment_dedup(docs, seg_tokens=8,
                                             hash_keys=True).collect()}
    assert a == b

    c = {tuple(r) for r in
         SEG.duplicate_span_removal(docs, k=8).collect()}
    d = {tuple(r) for r in
         SEG.duplicate_span_removal(docs, k=8, hash_keys=True).collect()}
    assert c == d


def test_duplicate_span_strip_hand_computed_and_consistent(spark):
    out = {r["doc_id"]: (r["n_tokens"], r["n_kept"], r["kept_text"])
           for r in SEG.duplicate_span_strip(
               _docs(spark, ["a b c d e", "x b c d y",
                             "a b q a b", "m m m"]), k=2).collect()}
    assert out[0] == (5, 5, "a b c d e")      # first owner keeps all
    assert out[1] == (5, 2, "x y")            # interior span 1-3 cut
    assert out[2] == (5, 1, "q")              # both "a b" copies cut
    assert out[3] == (3, 1, "m")              # within-doc repeat cut

    # consistency with the report on real data: kept == total - dup
    from olap_xtrctr_spark.session import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rep = {r["doc_id"]: r for r in
           SEG.duplicate_span_removal(docs, k=8).collect()}
    stp = {r["doc_id"]: r for r in
           SEG.duplicate_span_strip(docs, k=8).collect()}
    assert set(rep) == set(stp)
    for i in rep:
        assert stp[i]["n_kept"] == rep[i]["n_tokens"] \
            - rep[i]["n_dup_tokens"], i


def test_duplicate_span_strip_uses_equi_join_not_nested_loop(spark):
    """The removal anti-join must be an equi-join on (id, position) —
    a per-document BETWEEN predicate would plan as a nested-loop join
    and melt at corpus scale."""
    from olap_xtrctr_spark.session import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = SEG.duplicate_span_strip(docs, k=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_duplicate_spans_bucketed_store_parity_and_pruning(spark, tmp_path):
    """VERDICT r7 task 4: the on-disk bucketed gram store must (1)
    reproduce the monolithic fold / one-shot report exactly on
    id-ordered batches, (2) append only new grams (store growth ==
    corpus distinct grams, files only under _bucket= partitions), and
    (3) probe with a partition filter (the touched-bucket pruning)."""
    rows = ["a b c d e", "x b c d y", "p q r s", "a b c d e z"]
    docs = _docs(spark, rows)
    one_shot = {r["doc_id"]: r for r in
                SEG.duplicate_span_removal(docs, k=2).collect()}
    store = str(tmp_path / "gram_store")
    outs = {}
    for lo, hi in ((0, 1), (2, 3)):       # id-ordered batches
        b = docs.filter((docs.doc_id >= lo) & (docs.doc_id <= hi))
        res = SEG.duplicate_spans_incremental_bucketed(
            spark, b, store, k=2, n_buckets=8)
        outs.update({r["doc_id"]: r for r in res.collect()})
    assert set(outs) == set(one_shot)
    for i in one_shot:
        for c in ("n_tokens", "n_dup_spans", "n_dup_tokens", "dup_spans"):
            assert outs[i][c] == one_shot[i][c], (i, c)
    assert outs[3]["n_dup_spans"] >= 1     # cross-batch catch

    # store growth == distinct grams of the whole corpus, no dup rows
    from olap_xtrctr_spark.operators.segments_spans import stride1_grams
    want = {r["_sh"] for r in
            stride1_grams(docs, 2, "text", "doc_id").select("_sh").distinct().collect()}
    got = spark.read.parquet(store).collect()
    assert {r["gram"] for r in got} == want
    assert len(got) == len(want)           # append-only, no duplicates

    # idempotent-ish growth: re-ingesting batch 2 adds NOTHING new
    b2 = docs.filter(docs.doc_id >= 2)
    SEG.duplicate_spans_incremental_bucketed(
        spark, b2, store, k=2, n_buckets=8)
    assert spark.read.parquet(store).count() == len(want)
    # and every window of the re-ingested batch is now a duplicate


def test_cdc_dedup_is_shift_robust_where_grid_is_not(spark):
    """The CDC claim, demonstrated: doc 1 is doc 0 with ONE token
    prepended.  The fixed 8-token grid shifts every segment, so
    grid dedup keeps (almost) everything in doc 1; CDC boundaries
    re-synchronize at the next boundary token, so CDC removes most of
    doc 1's chunks as duplicates of doc 0's."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
            "psi omega one two three four five six seven eight nine "
            "ten eleven twelve thirteen fourteen fifteen sixteen")
    docs = spark.createDataFrame(
        [(0, base), (1, "INSERTED " + base)],
        "doc_id long, text string")

    grid = {r["doc_id"]: r for r in
            SEG.segment_dedup(docs, seg_tokens=8).collect()}
    cdc = {r["doc_id"]: r for r in
           SEG.cdc_segment_dedup(docs, divisor=4).collect()}

    # grid: the one-token shift changes every 8-token window of doc 1,
    # so nothing (or near nothing) is removed
    assert grid[1]["n_kept"] >= grid[1]["n_segments"] - 1
    # cdc: boundaries re-sync, so a majority of doc 1's chunks are
    # recognized as duplicates and removed
    assert cdc[1]["n_kept"] <= cdc[1]["n_segments"] // 2, cdc[1]
    # doc 0 (first occurrence) keeps everything under both schemes
    assert grid[0]["n_kept"] == grid[0]["n_segments"]
    assert cdc[0]["n_kept"] == cdc[0]["n_segments"]


def test_cdc_segments_empty_docs_and_validation(spark):
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   ")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           SEG.cdc_segment_dedup(docs, divisor=4).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_segments"] == 0 and out[2]["kept_text"] == ""
    assert out[3]["n_kept"] == 0
    assert out[1]["kept_text"] == "hello world"
    with _pytest.raises(ValueError, match="divisor"):
        SEG.cdc_segments(docs, divisor=0)


def test_stream_span_dedup_bucketed_idempotent_rerun(spark, sf_dir):
    """The streaming bucketed span fold (workloads/docs_segments.py)
    is idempotent end-to-end: a second invocation finds the committed
    checkpoint + batch markers and returns byte-identical reports
    without re-folding (re-folding against the populated store would
    mark EVERYTHING duplicate — the exact failure the _COMMITTED
    markers prevent)."""
    from olap_xtrctr_spark.workload import WORKLOAD

    fn = WORKLOAD["docs_stream_span_dedup_bucketed"].fn
    first = sorted(map(tuple, fn(spark, sf_dir).collect()))
    second = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert first == second
    assert first  # non-empty report

