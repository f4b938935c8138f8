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
                        similarity, tpch, wave9)

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
    # ---- Round-9 rotation (VERDICT r8 task 2) ----------------------
    # (a) the 2 r8-RED rows, re-graded after the libm-free fixedlog
    #     oracle rewrite;
    "docs_ngram_lm_score",            # RED r7+r8 -> fixed-op ladder
    "docs_ccnet_buckets",             # RED r8 (same LM scores)
    # (b) every entry whose ORACLE changed this round (ladder rewrite
    #     / schema change) — green r8 rows are stale for them;
    "docs_dsir_weights",
    "docs_dsir_top_docs",
    "docs_dsir_gumbel_sample",
    "docs_bm25_topk",
    "docs_token_pmi_top",
    "docs_temperature_mix_rates",     # also r4-stale; mix_rate_ppm now
    # (c) never-graded full-oracle entries: r8 leftovers (bottom-k
    #     quantile family got the deterministic tiebreak this round,
    #     so their oracles changed too) + the round-9 additions;
    "cube_declining_months",
    "cube_month_vs_last_year",
    "events_bottomk_value_quantiles",
    "events_sliding_value_quantiles",
    "events_stream_bottomk_quantiles",
    "docs_stream_span_dedup_bucketed",   # NEW r9 (bucketed span stream)
    "cube_named_set_sum_member",         # NEW r9 (SUM over named set)
    "cube_aggregate_set_member",         # NEW r9 (AGGREGATE over set)
    "cube_toppercent_nations",           # NEW r9 (cumulative cut)
    "cube_bottompercent_nations",        # NEW r9
    "cube_topsum_months",                # NEW r9 (absolute threshold)
    # (d) the 5 r3-displaced entries (workload.py r8 note: rotate
    #     these back FIRST);
    "events_value_percentiles",
    "events_retention_cohorts",
    "events_type_user_distinct",
    "events_top_hours_per_type",
    "events_user_activity",
    # (c2) round-9 wave 2: the DistinctCount measure (which also
    #     changed cube_all_measures_global's schema — re-grade) and
    #     the UNION/EXCEPT/INTERSECT set operators;
    "cube_distinct_orders_by_region",    # NEW r9 (SSAS DistinctCount)
    "cube_set_except_regions",           # NEW r9 (set operators)
    "cube_set_union_intersect_regions",  # NEW r9 (nested set algebra)
    "cube_all_measures_global",          # schema changed (+distinct_orders)
    "cube_slicer_set",                   # NEW r9 (SET in WHERE slicer)
    "cube_calc_over_calc",               # NEW r9 (dependency-ordered calcs)
    "docs_char_entropy",                 # NEW r9 (fixedlog entropy)
    "events_hll_md5_users_by_type",      # NEW r9 (oracle-exact HLL)
    "events_stream_hll_md5_users",       # NEW r9 (streaming HLL fold)
    "cube_drillthrough_region",          # NEW r9 (DRILLTHROUGH)
    # (e) the 16 oldest r4-latest FULL-ORACLE entries in build order
    #     (rows-only r4 entries stay behind the window — the driver's
    #     weaker check adds nothing, r8 lesson; the remaining 14 r4
    #     full-oracle entries rotate in round 10:
    #     events_asof_click_attribution,
    #     events_value_range_tiers, events_props_topk,
    #     events_stream_enriched_tiers, docs_chunk_overlap,
    #     docs_boilerplate_ngrams, docs_boilerplate_filter,
    #     docs_edit_distance_pairs, docs_prepare_chunks,
    #     events_stream_session_tracker, events_rollup_incremental,
    #     events_props_variant_stats, events_user_deciles,
    #     events_type_trigrams).
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
    curation.register_r8(add)     # round-8 additions append last
    docs_segments.register_r8(add)
    cube.register_r9(add)         # round-9 additions append after r8
    wave9.register(add)
    similarity.similarity_textpairs.register_r10(add)  # round-10 tail

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

