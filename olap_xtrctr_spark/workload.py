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
                        similarity, tpch, wave9, wave10, wave11, wave12)

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
    # ---- Round-12 rotation (VERDICT r11 task 1: FULL-ORACLE entries
    # ONLY — r11 burned 4 of 50 slots on rows-only no_oracle rows;
    # build_workload() now asserts every front name carries SQL) -----
    # (a) the 7 entries that have NEVER received a driver row — the
    #     round-11 wave-2 additions.  The two SemDeDup entries were
    #     rows-only until this round; they now run the frozen-coarse-
    #     center variant with full DuckDB oracles (wave11/wave12):
    "docs_source_chain_components",
    "docs_neardup_components",
    "docs_softdedup_weights",
    "docs_bloom_decontaminate",
    "docs_stream_bloom_fold",
    "emb_semantic_dedup_pairs",
    "emb_semantic_dedup_corpus",
    # (b) the 2 NEW round-12 full-oracle entries (graded the round
    #     they land): the frozen-codebook PQ/IVFPQ exact twins —
    #     the last ANN family members without value-exact siblings:
    "emb_pq_topk_exact",
    "emb_ivfpq_topk_exact",
    # (c) 41 of the 49-entry r6 staleness tail (all full-oracle).
    #     docs_containment_pairs_prefix and docs_ngram_novelty also
    #     re-grade CHANGED paths: the former gains the r12 regime
    #     pre-probe (VERDICT task 3), both consumed the r11 zip-chain
    #     shingle rework that was deferred from the r11 window:
    "docs_containment_pairs_prefix",
    "docs_ngram_novelty",
    "docs_winnow_span_dedup",
    "docs_dedup_impact_report",
    "docs_quality_threshold_sweep",
    "docs_shuffle_corpus",
    "docs_token_budget_fill",
    "docs_versioned_time_travel",
    "docs_vocab_build",
    "cube_3dim_crossjoin",
    "cube_catalog_1998_nation",
    "cube_filter_measure_condition",
    "cube_filter_set",
    "cube_rollup_subtotals",
    "cube_topcount_nations",
    "events_clustered_scan_pruning",
    "events_stream_type_drift",
    "events_stream_upsert_latest",
    "members_apartados",
    "members_children_exact",
    "members_children_prefix",
    "members_depth_filter",
    "members_fulltext_search",
    "members_nation_list",
    "members_ordinal_sort",
    "members_search",
    "members_variables_of_apartados",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q21_waiting_orders",
]
# Deliberately DEFERRED to the r13 window (49 r6-stale + 7 never-
# graded + 2 new = 58 candidates for 50 slots): the 8 remaining
# r6-stale TPC-H entries — tpch_q2_min_cost_supplier,
# tpch_q4_order_priority, tpch_q11_important_stock,
# tpch_q13_customer_distribution, tpch_q16_parts_supplier,
# tpch_q17_small_quantity, tpch_q20_excess_shippers,
# tpch_q22_global_sales_opportunity — chosen because they are pure
# Catalyst SQL translations whose engine paths have not changed since
# their last green row (no custom-operator code in their lineage), so
# they carry the lowest regression risk of the tail; they queue FIRST
# for r13.  The r11 changed-path shingle consumers not already in this
# window (docs_ngram_jaccard_pairs, the contamination family, the
# span-dedup family) hold r7+ rows, were re-verified locally at sf0.01
# this round (SCALE.md r12), and queue behind those eight.  The five
# LATE round-12 additions (emb_ivf_topk_exact,
# emb_cluster_balanced_exact, emb_stream_semantic_dedup,
# emb_ivfpq_index_topk, docs_quality_classifier_exact — added after
# this manifest was sized to the verdict's exact task-1 composition)
# are locally green at sf0.001 AND sf0.01 and queue with the r13
# front as well.





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
    cube.register_r10(add)
    wave10.register(add)          # round-10 wave 2 (prefix family)
    wave11.register(add)          # round-11 (ADVICE-fix path pins)
    wave12.register(add)          # round-12 (frozen-codebook ANN twins)

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
    rows_only = [n for n in _GATE_FRONT if q[n].sql is None]
    assert not rows_only, (
        f"gate manifest contains rows-only entries {rows_only}: the "
        f"driver can only mark them no_oracle, burning certification "
        f"slots (VERDICT r11 task 1) — their freshness signal is the "
        f"local gate + tests/test_recall.py, never the driver window")
    assert len(q) > _GATE_WINDOW, \
        "workload shrank below the driver's grading window"
    front = set(_GATE_FRONT)
    ordered = _GATE_FRONT + [n for n in q if n not in front]
    return {n: q[n] for n in ordered}


WORKLOAD = build_workload()

