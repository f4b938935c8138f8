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
from .workloads import (cube, docs_text, events, members_nav,  # noqa: F401
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
    # Round-6 rotation (VERDICT r5 item 1): the 50 entries whose latest
    # driver rows are the stalest — the whole r2-graded block (40 entries:
    # tpch_*, members_*, cube_3dim/filter_set/catalog_1998/rollup_subtotals,
    # docs_token_stats, docs_lang_id) plus the 10 oldest r3-graded docs_*
    # entries, in build order within each staleness class.  Computed from
    # CORRECTNESS_r01..r05 latest-pass rounds.  Everything rotated out
    # keeps a green r4/r5 driver row and stays covered by the local
    # all-entries gate (scripts/check_correctness.py).  New round-6
    # entries (no driver row yet) lead; each displaces one r3-stale
    # entry from the back of the front (still r3-green + local-gated).
    # cube_3dim leads: the first gate entry absorbs session warmup, so
    # keep it a cheap known-quantity query and let the new entries'
    # driver timings stay readable
    "cube_3dim_crossjoin",
    "docs_containment_pairs_prefix",
    "events_clustered_scan_pruning",
    "docs_shuffle_corpus",
    "docs_vocab_build",
    "docs_token_budget_fill",
    "docs_ngram_novelty",
    "docs_winnow_span_dedup",
    "cube_calc_measure_avg_price",
    "cube_topcount_nations",
    "cube_filter_measure_condition",
    "docs_quality_threshold_sweep",
    "docs_dedup_impact_report",
    "events_stream_type_drift",
    "docs_versioned_time_travel",
    "events_stream_upsert_latest",
    "cube_filter_set",
    "cube_catalog_1998_nation",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_revenue",
    "tpch_q4_order_priority",
    "tpch_q13_customer_distribution",
    "tpch_q16_parts_supplier",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
    "tpch_q18_large_orders",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q20_excess_shippers",
    "tpch_q21_waiting_orders",
    "cube_rollup_subtotals",
    "members_nation_list",
    "members_depth_filter",
    "members_search",
    "members_fulltext_search",
    "members_children_exact",
    "members_children_prefix",
    "members_apartados",
    "members_variables_of_apartados",
    "members_ordinal_sort",
]




def build_workload() -> dict[str, QuerySpec]:
    q: dict[str, QuerySpec] = {}

    def add(name, fn, sql):
        q[name] = QuerySpec(name, fn, sql)

    # Registration order == the pre-split file's build order (cube ->
    # tpch -> members -> text -> similarity -> events); each module's
    # internal order is verbatim, so build order is byte-stable.
    for mod in (cube, tpch, members_nav, docs_text, similarity, events):
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

