"""The declared query workload: every operator from SURVEY.md §2 (plus
the beyond-reference extensions) as a (Spark callable, DuckDB oracle
SQL) pair.  ``__spark_entry__.py`` re-exports these for the driver's
correctness gate.

Cross-engine exactness strategy:
* double SUM/AVG go through DECIMAL(18,4) (exact, order-independent)
  and back to double — identical bits on both engines;
* pivot/count cells coalesce to 0 on both sides;
* ranked outputs carry an explicit deterministic rank (ties broken by
  unique ids) instead of relying on row order.

Round-6 structure: the entry builders live in per-family modules under
``olap_xtrctr_spark/workloads/`` (cube, tpch, members_nav, docs_text,
similarity, events — moved verbatim; VERDICT r5 item 8) with the
shared helpers in ``workload_shared``.  This module keeps the public
surface: ``WORKLOAD``, ``build_workload``, the gate-window manifest,
and compat re-exports.
"""
from __future__ import annotations

from .workload_shared import (AVG_D, CATALOG, MES_CASE,  # noqa: F401
                              QuerySpec, SUM_D)
from .workloads import (cube, curation, docs_segments,  # noqa: F401
                        docs_text, events, members_nav, multimodal_real,
                        similarity, tpch)

# ---- driver gate-window manifest -----------------------------------------
# The external correctness gate grades the FIRST _GATE_WINDOW entries of
# queries().  Instead of rotating the dict by a count (fragile — ADVICE r3),
# an explicit manifest names the entries that need a fresh driver row this
# round; everything after the front keeps build order, so the gate's
# remaining slots re-grade the round-1/2 block (cube_*/tpch_*/members_*)
# for regression coverage.  Entries past the window all have green rows
# from earlier rounds; WORKLOAD.md documents which round graded what.
_GATE_WINDOW = 50
_GATE_FRONT = [
    # Round-7 rotation (VERDICT r6 task 1): drain the driver-verification
    # backlog.  Computed from CORRECTNESS_r01..r06 latest-grade rounds:
    # the 5 r2-latest entries, the 3 never-graded r6 additions, the 8
    # NEW round-7 entries (DISCOVER rowsets + classifier / curation /
    # LM-scoring family + the ADVICE-r6 ORDER path), and 34 of the 35
    # r3-latest entries (build order; events_user_activity yields its
    # slot to the new entries — it keeps its green r3 row and the local
    # all-entries gate).  Everything rotated out keeps a green r3-r6
    # driver row and stays covered by scripts/check_correctness.py.
    # members_pagination leads: the first gate entry absorbs session
    # warmup, and it is both cheap and itself r2-stale — the warmup
    # slot does rotation work too.
    "members_pagination",             # r2-latest (warmup absorber)
    "members_full_view",              # r2-latest
    "members_level_cardinalities",    # r2-latest
    "docs_token_stats",               # r2-latest
    "docs_lang_id",                   # r2-latest
    "cube_bottomcount_nations",       # never driver-graded (added r6)
    "docs_lang_id_ngram",             # never driver-graded (added r6)
    "events_asof_attribution_tolerance",  # never driver-graded (added r6)
    "dmv_discover_schema_rowsets",    # NEW r7 (VERDICT r6 task 4)
    "dmv_discover_properties",        # NEW r7 (VERDICT r6 task 9)
    "docs_quality_classifier",        # NEW r7 (trained quality filter)
    "docs_quality_weak_labels",       # NEW r7 (its full-oracle anchor)
    "emb_cluster_balanced_sample",    # NEW r7 (diversity subsample)
    "docs_quality_lottery",           # NEW r7 (keep-lottery primitive)
    "docs_ngram_lm_score",            # NEW r7 (bigram-LM perplexity)
    "cube_order_by_unselected_measure",  # NEW r7 (ADVICE-r6 ORDER path)
    # r3-latest block, build order:
    "docs_quality_score",
    "docs_top_tokens",
    "docs_fingerprint",
    "docs_redact_pii",
    "docs_pack_sequences",
    "docs_strip_markup",
    "docs_contamination_check",
    "docs_mix_corpus",
    "docs_hash_split",
    "docs_stratified_sample",
    "docs_incremental_dedup",
    "emb_cosine_topk",
    "emb_quantized_topk",
    # Mid-round additions (new entries have NO driver row — strictly
    # weaker than the r3-green rows of the five entries they displace,
    # whose semantics stay covered elsewhere: exact_dup_groups /
    # exact_dedup_keep by docs_keep_canonical + incremental_dedup,
    # norms/quantize by the *_topk entries above, uniform_sample_k by
    # stratified_sample + docs_quality_lottery.  Displaced entries keep
    # their green r3 rows and the local all-entries gate.
    "docs_segment_dedup",             # NEW r7 (segment-level dedup)
    "docs_segment_freq_filter",       # NEW r7 (boilerplate segments)
    "multimodal_wav_decode_stats",    # NEW r7 (real WAV codec oracle)
    "multimodal_ppm_decode_stats",    # NEW r7 (real PPM codec oracle)
    "multimodal_ppm_resize_real",     # NEW r7 (real resize oracle)
    # Wave-3 additions displace the three digest-chain multimodal
    # stubs (green r3 rows; their decode/resize semantics are now
    # covered IN-window by the real-codec entries above, and they stay
    # in the local all-entries gate).
    "docs_source_capped_corpus",      # NEW r7 (domain balancing)
    "emb_cross_split_leakage",        # NEW r7 (split-leakage audit)
    "docs_bpe_roundtrip",             # NEW r7 (tokenizer integrity)
    # docs_duplicate_spans displaces events_top_hours_per_type (green
    # r3 row; plain grouped top-k whose semantics stay exercised by
    # events_hourly_rollup in-window and the local all-entries gate).
    "docs_duplicate_spans",           # NEW r7 (exact stride-1 spans)
    # Third-wave swaps: the streaming span chain and the corpus card
    # displace events_value_percentiles / events_retention_cohorts
    # (green r3 rows; percentile and cohort semantics stay exercised by
    # events_user_deciles / events_rfm_segments and the local gate).
    "docs_stream_span_dedup",         # NEW r7 (streaming span chain)
    "docs_corpus_card",               # NEW r7 (release datasheet)
    # Final swaps: the strip's byte-exact kept_text oracle and the CMS
    # displace emb_near_dup_pairs / events_stream_user_totals (green r3
    # rows; the GEMM pair kernel is exercised in-window through
    # emb_cross_split_leakage, streaming state through
    # events_stream_sessionize/dedup and the span chain).
    "docs_duplicate_span_strip",      # NEW r7 (rewrite form)
    "docs_cms_token_freq",            # NEW r7 (oracle-exact CMS)
    "docs_near_dup_clusters",
    "docs_prepare_corpus",
    "docs_keep_canonical",
    "docs_ngram_jaccard_pairs",
    "events_hourly_rollup",
    "events_stream_sessionize",
    "events_stream_dedup",
    # events_kanon_release displaces events_type_user_distinct (green
    # r3 row; distinct-count semantics stay exercised by
    # events_user_deciles/events_key_skew_report and the local gate).
    "events_kanon_release",           # NEW r7 (release suppression)
]




def build_workload() -> dict[str, QuerySpec]:
    q: dict[str, QuerySpec] = {}

    def add(name, fn, sql):
        q[name] = QuerySpec(name, fn, sql)

    # Registration order == the pre-split file's build order (cube ->
    # tpch -> members -> text -> similarity -> events); each module's
    # internal order is verbatim, so build order is byte-stable.
    # docs_segments / multimodal_real (round-7 additions) register
    # last: existing build order stays byte-stable, new entries appear
    # past the legacy tail.
    for mod in (cube, tpch, members_nav, docs_text, similarity, events,
                docs_segments, multimodal_real, curation):
        mod.register(add)

    # Order per the gate-window manifest (see _GATE_FRONT above).
    missing = [n for n in _GATE_FRONT if n not in q]
    assert not missing, f"gate manifest names unknown entries: {missing}"
    assert len(_GATE_FRONT) == _GATE_WINDOW, (
        f"gate manifest must fill the driver's window exactly: "
        f"{len(_GATE_FRONT)} names for {_GATE_WINDOW} slots — a short "
        f"front silently burns slots on build-order entries, a long "
        f"one silently drops its tail from grading")
    assert len(set(_GATE_FRONT)) == len(_GATE_FRONT), \
        "gate manifest contains duplicates"
    assert len(q) > _GATE_WINDOW, \
        "workload shrank below the driver's grading window"
    front = set(_GATE_FRONT)
    ordered = _GATE_FRONT + [n for n in q if n not in front]
    return {n: q[n] for n in ordered}


WORKLOAD = build_workload()

