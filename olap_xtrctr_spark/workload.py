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
    # Round-8 rotation (VERDICT r7 tasks 2+3): every slot is a
    # full-oracle entry the driver can hash-match — the two r7
    # rows-only entries (docs_quality_classifier,
    # emb_cluster_balanced_sample) move behind the window (their
    # in-entry gates + pytest still verify them; the driver's weaker
    # rows-only check added nothing).  Slots go to: (a) the 7 entries
    # whose semantics changed this round (the host-libm ln freeze fix
    # — lm_score/dsir*/bm25 — plus the CMS absent-probe and BPE
    # empty-doc oracle fixes), (b) the 4 never-driver-graded
    # full-oracle entries (the other 3 never-graded are rows-only by
    # nature — BPE train/token-count and the LSH leakage path — and
    # stay behind the window), (c) the full r3-latest block (15), and
    # (d) the oldest r4-latest entries in build order — each NEW
    # round-8 entry appended via _R8_NEW below displaces one more from
    # the r4 tail (displaced entries keep green r4 rows and the local
    # all-entries gate, and rotate in round 9).
    "cube_head_nations",              # never graded (cheap warmup absorber)
    "cube_tail_ordered_nations",      # never graded
    "docs_ngram_lm_score",            # RED r7 -> host-libm lookup fix
    "docs_dsir_weights",              # impl changed (host-libm llr)
    "docs_dsir_top_docs",             # impl changed (host-libm llr)
    "docs_dsir_gumbel_sample",        # impl changed (host-libm noise)
    "docs_bm25_topk",                 # impl changed (host-libm idf)
    "docs_cms_token_freq",            # semantics changed (absent probe row)
    "docs_bpe_roundtrip",             # oracle changed (empty-doc rows)
    "docs_segment_dedup_incremental",     # never graded
    "docs_duplicate_spans_incremental",   # never graded
    # r3-latest block (all 15, build order):
    "docs_uniform_sample_k",
    "docs_exact_dup_groups",
    "docs_exact_dedup_keep",
    "emb_norms",
    "emb_quantize",
    "emb_near_dup_pairs",
    "multimodal_resize",
    "multimodal_frames",
    "multimodal_features",
    "events_stream_user_totals",
    "events_value_percentiles",
    "events_retention_cohorts",
    "events_type_user_distinct",
    "events_top_hours_per_type",
    "events_user_activity",
    # r4-latest block (build order; the tail yields to _R8_NEW):
    "members_fulltext_stemmed",
    "docs_token_count_bpe",
    "docs_repetition_stats",
    "docs_repetition_filter",
    "docs_pack_sequences_sharded",
    "docs_token_familiarity",
    "docs_contract_check",
    "docs_sample_k_per_group",
    "docs_vocab_coverage",
    "docs_length_histogram",
    "emb_semantic_dedup_clusters",
    "events_stream_hourly",
    "events_sessionize",
    "events_funnel_conversion",
    "events_stream_dedup_bounded",
    "events_stream_click_purchase_join",
    "events_asof_click_attribution",
    "events_value_range_tiers",
    "events_props_topk",
    "events_stream_enriched_tiers",
    "docs_chunk_overlap",
    "docs_boilerplate_ngrams",
    "docs_boilerplate_filter",
    "docs_edit_distance_pairs",
]

# NEW round-8 entries enter the front as they land, displacing the r4
# tail (displaced entries keep their green r4 rows + the local gate and
# rotate next round).  By the end of round 8 the displacement reached
# 5 entries of the r3 block (events_value_percentiles /
# retention_cohorts / type_user_distinct / top_hours_per_type /
# user_activity — simple aggs, pytest + local-gate covered): rotate
# those back in FIRST in round 9, ahead of the r4 block.
_R8_NEW = [
    "cube_descendants_region_nations",   # NEW r8 (DESCENDANTS nav)
    "cube_ancestor_region_rollup",       # NEW r8 (ANCESTOR rollup)
    "docs_ccnet_buckets",                # NEW r8 (CCNet ppl split)
    "docs_minhash_lsh_pairs_exact",      # NEW r8 (oracle-exact MinHash)
    "docs_simhash_pairs_exact",          # NEW r8 (oracle-exact SimHash)
    "docs_minhash_dedup_corpus_exact",   # NEW r8 (exact LSH dedup e2e)
    "docs_cms_token_freq_by_lang",       # NEW r8 (grouped CMS path)
    "events_kmv_users_by_type",          # NEW r8 (oracle-exact KMV)
    "events_value_quantiles_sampled",    # NEW r8 (det-sample quantiles)
    "events_stream_kmv_users",           # NEW r8 (streaming KMV fold)
    "docs_cdc_segment_dedup",            # NEW r8 (content-defined chunks)
    "cube_children_of_region",           # never graded (full-oracle nav)
    "events_kmv_type_overlap",           # NEW r8 (KMV set-op estimates)
    "docs_dedup_weighted_keep",          # NEW r8 (repeat-weight soft dedup)
    "docs_cluster_split",                # NEW r8 (leakage-free split)
    "events_stream_cms_heavy_users",     # NEW r8 (streaming CMS fold)
    "cube_month_delta",                  # NEW r8 (PrevMember time intel)
    "cube_region_yoy_delta",             # NEW r8 (partitioned PrevMember)
    "cube_region_ytd",                   # NEW r8 (SUM(YTD) running total)
    "events_hourly_moving_avg",          # NEW r8 (exact-window smoothing)
    "events_bloom_semijoin",             # NEW r8 (bloom-prefiltered join)
    "docs_token_pmi_top",                # NEW r8 (PMI collocations)
    "cube_rolling_quarter",              # NEW r8 (LASTPERIODS window)
    "events_sliding_distinct_users",     # NEW r8 (sliding KMV merge)
    "emb_random_projection",             # NEW r8 (JL sign projection)
    "cube_next_month_delta",             # NEW r8 (NextMember lead)
    "cube_named_set_rows",               # NEW r8 (WITH SET expansion)
    "docs_incremental_near_dups",        # NEW r8 (batch-vs-corpus LSH)
    "docs_dedup_keep_best",              # NEW r8 (quality-priority keep)
]
_GATE_FRONT = _GATE_FRONT[:-len(_R8_NEW)] + _R8_NEW




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
    curation.register_r8(add)     # round-8 additions append last
    docs_segments.register_r8(add)
    cube.register_r9(add)         # round-9 additions append after r8

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

