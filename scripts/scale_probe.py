"""Scale probe: replicate the sf0.1 star schema Nx (key-shifted, so join
cardinalities scale like real growth) into a scratch dir, run the cube
headline queries there, and report per-query timings plus the physical
join strategies AQE picked — the point is to verify the broadcast->SMJ
transition stays clean past the test SF (BASELINE.md round-2 question).

Usage: python scripts/scale_probe.py [factor] [scratch_dir]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.plans import join_strategies
from olap_xtrctr_spark.workload import WORKLOAD

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SCRATCH = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe"
# optional comma-separated substring filter over PROBE_QUERIES
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None
SRC = "/root/testdata/sf0.1"

# fact/bridge tables are replicated with shifted keys; pure dimension
# tables (closed key domains joined by every copy) stay as-is.
KEYED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    # key-shifted copies share TEXT: every replica is an exact dup of its
    # original, so the dedup probes see realistic heavy duplication
    "documents": ["doc_id"],
    # shifted user/event ids: user count grows 10x (sessionize windows
    # stay narrow per user), hourly rollup rows get 10x denser
    "events": ["event_id", "user_id"],
}
ASIS = ["region", "nation", "supplier", "part", "embeddings"]

PROBE_QUERIES = [
    "cube_nation_sales",
    "cube_3dim_crossjoin",
    "cube_slicer_where_tuple",
    "cube_variables_pivot",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier",
    "tpch_q18_large_orders",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_orders",
    "docs_hash_split",
    "docs_pack_sequences",
    "docs_pack_sequences_sharded",
    "docs_incremental_dedup",
    "docs_exact_dedup_keep",
    # round-4 additions
    "docs_repetition_stats",
    "docs_repetition_filter",
    "docs_token_count_bpe",
    "docs_top_tokens",
    "events_sessionize",
    "events_hourly_rollup",
    "events_hourly_anomalies",
    "events_funnel_conversion",
    # round-4 second wave
    "events_props_topk",
    "docs_chunk_overlap",
    "docs_boilerplate_ngrams",
    # NOTE: key-shifted doc replicas are exact text dups, so the blocked
    # levenshtein pair count grows ~quadratically with FACTOR inside each
    # (lang, len-bucket) block — the probe MEASURES that concentration
    "docs_edit_distance_pairs",
    "events_type_trigrams",
    "events_user_deciles",
    "events_rollup_incremental",
    "events_props_variant_stats",
    "docs_prepare_chunks",
    "docs_temperature_mix_rates",
    # round-5 additions (docs replicas keep their source value, so the
    # per-fingerprint source sets stay small while dup counts grow 10x —
    # the bounded-window-state claim is what the probe checks)
    "docs_cross_source_dup",
    "docs_lexical_diversity",
    # streaming replays (probe-able since the replicator writes events as
    # a single file matching the entries' pathGlobFilter): bounded-state
    # and replay-overhead claims measured at scale
    "events_stream_hourly",
    "events_stream_dedup_bounded",
    "events_stream_session_tracker",
    # round-5 closing additions
    "docs_hybrid_search",
    "events_silence_report",
    "events_key_skew_report",
    "events_rfm_segments",
    "events_type_transitions",
    # round-5 continuation: winnowing (exact-dup replicas concentrate
    # each fingerprint's posting list ~FACTOR deep — pair gen grows
    # ~FACTOR^2 inside dup groups, same documented shape as
    # edit_distance), corpus-composition diagnostics (vocab-bounded),
    # and the previously unprobed streaming variants (sessionize,
    # unbounded dedup, interval join, anomalies)
    # round-11 additions: the rewritten two-phase RFM rides with the
    # prefix-family entries; the signed-walk milestones and the
    # de-vacuated per-source token milestones check the floor-div /
    # per-key carry forms at ~sf1
    "docs_source_token_milestones",
    "events_value_drawdown_milestones",
    # connected components: doc replication makes 250-deep chains per
    # source (the log-round contraction stress) and concentrates the
    # levenshtein pair table ~FACTOR^2 inside dup groups
    "docs_source_chain_components",
    "docs_neardup_components",
    "docs_winnow_fingerprints",
    "docs_winnow_dup_pairs",
    "docs_source_tv_distance",
    "docs_distinctive_terms",
    "events_stream_sessionize",
    "events_stream_dedup",
    "events_stream_click_purchase_join",
    "events_stream_anomalies",
    # round-5 continuation, second wave
    "docs_winnow_dup_extent",
    "docs_snapshot_diff",
    "events_type_drift_daily",
    "events_ohlc_hourly",
    "events_stream_ohlc",
    "tpch_join_profile_orders_customer",
    # round-6 additions: novelty/span-dedup concentrate posting lists
    # ~FACTOR deep inside dup groups (novelty must stay LINEAR there —
    # that is its design claim); shuffle/budget-fill must not global-sort
    "docs_ngram_novelty",
    "docs_winnow_span_dedup",
    "docs_shuffle_corpus",
    "docs_token_budget_fill",
    "docs_containment_pairs_prefix",
    "events_stream_type_drift",
    "docs_quality_threshold_sweep",
    "docs_dedup_impact_report",
    "cube_calc_measure_avg_price",
    "cube_topcount_nations",
    "cube_filter_measure_condition",
    "events_stream_upsert_latest",
    "docs_versioned_time_travel",
    # round-5 third wave: containment shares the jaccard posting-list
    # core (dup replicas concentrate pair gen ~FACTOR^2 inside groups,
    # documented above for edit_distance/winnow); DSIR is explode + two
    # map-side-combinable aggs — expected ~linear; the left-outer stream
    # join measures outer-state eviction at 10x event density
    "docs_containment_pairs",
    "docs_dsir_weights",
    "events_stream_unconverted_clicks",
    # round-7: the as-of family (VERDICT r6 task 5) — as-of joins are
    # the classic skew trap; key-shifted users keep per-user click
    # streams narrow while the user count grows FACTOR x, so the probe
    # checks the union+window shape scales with users, not pairs
    "events_asof_click_attribution",
    "events_asof_attribution_tolerance",
    # round-7 third wave: grouped cap must stay group-windowed (hot
    # domains grow 10x deep here since replicas keep their source);
    # leakage rides the guarded exact-GEMM kernel (embeddings stay
    # as-is — the probe confirms the pair+split join shape, not corpus
    # growth); bpe_roundtrip's Python stays distinct-word-sized while
    # the corpus grows FACTOR x (replicas share vocabulary)
    "docs_source_capped_corpus",
    "emb_cross_split_leakage",
    "docs_bpe_roundtrip",
    # exact stride-1 spans: replica flood marks ~90% of windows — the
    # worst case for span-merge state; online variant adds store probes
    "docs_duplicate_spans",
    "docs_duplicate_spans_incremental",
    "events_first_touch_attribution",
    "events_linear_attribution",
    # round-7 curation ops: classifier trains distributed (per-iteration
    # treeAggregate over the weak-label set), cluster sample is one
    # KMeans + one window — both must stay minutes-free at ~sf1
    "docs_quality_classifier",
    "docs_quality_weak_labels",
    "emb_cluster_balanced_sample",
    # round-7 second wave: segment dedup sees exact-dup replicas (every
    # segment's occurrence list grows FACTOR deep — the window stays
    # per-segment, no pairs, so cost must stay ~linear); BPE touches
    # the corpus once then iterates on the (unchanged-size) vocab, so
    # 10x corpus should cost ~1 extra corpus pass, not 10x iterations
    "docs_segment_dedup",
    "docs_segment_freq_filter",
    "docs_bpe_train",
    "docs_bpe_token_count",
    "multimodal_wav_decode_stats",
    # round-8: host-libm lookups must stay bounded-metadata at scale
    # (LM count-of-counts ~ thousands; bm25 |terms| rows); the md5
    # oracle-exact sketch variants concentrate dup replicas ~FACTOR
    # deep per bucket (same documented posting shape as the xxhash
    # fast paths); ccnet adds one lang-keyed window over the LM scores
    "docs_ngram_lm_score",
    "docs_ccnet_buckets",
    "docs_bm25_topk",
    "docs_dsir_gumbel_sample",
    "docs_minhash_lsh_pairs_exact",
    "docs_simhash_pairs_exact",
    "docs_minhash_dedup_corpus_exact",
    "cube_descendants_region_nations",
    "cube_ancestor_region_rollup",
    # round-8 wave 3: KMV overlap runs on sketch state only (G^2*k
    # rows — cost must be flat vs corpus growth after the one distinct
    # pass); dedup weights / cluster split are single text-hash
    # shuffles (replica flood makes every group FACTOR deep — both
    # must stay linear, no pairs); the CMS stream fold's store is
    # 4x256 cells regardless of user count; the PrevMember lags are
    # axis-cardinality windows over the star join
    "events_kmv_type_overlap",
    "docs_dedup_weighted_keep",
    "docs_cluster_split",
    "events_stream_cms_heavy_users",
    "cube_month_delta",
    "cube_region_yoy_delta",
    # round-8 wave 4: moving avg runs on the aggregated hourly table
    # (type-keyed window, corpus-linear base agg); bloom prefilter is
    # k broadcast semi-probes ahead of the exact join (probe-side
    # pruning must not add a shuffle); PMI joins are vocab-sized after
    # two map-side-combinable count passes (replica flood multiplies
    # counts, not vocab); YTD is an axis-cardinality window
    "events_hourly_moving_avg",
    "events_bloom_semijoin",
    "docs_token_pmi_top",
    "cube_region_ytd",
    # round-8 wave 5: sliding KMV re-merges sketch state per window
    # position (hours x 64 x 6 rows, corpus-independent after the one
    # distinct pass); LASTPERIODS is an axis window; JL projection is
    # a scan-speed per-row fold (10x rows -> ~10x, no shuffle)
    "events_sliding_distinct_users",
    "cube_rolling_quarter",
    "emb_random_projection",
    # round-8 wave 6: lead() mirror of the PrevMember window; named
    # set expands to the pushed region-key filter
    "cube_next_month_delta",
    "cube_named_set_rows",
    # round-8 wave 6 dedup: incremental LSH probes seen-side buckets
    # only (no self-join; replica flood deepens buckets ~FACTOR — the
    # documented posting shape); keep_best is one digest-keyed window
    "docs_incremental_near_dups",
    "docs_dedup_keep_best",
    "cube_declining_months",
    # bottom-k quantile sketch: one distinct-free window over (type, hash)
    # — state 64 rows/type regardless of corpus size
    "events_bottomk_value_quantiles",
    # round-9: sliding re-merge A/B (hourly partials once, <=6x64 sketch
    # rows per window position) + streaming bucketed span-store fold
    # (per-batch store writes O(new grams), probes touch _bucket=
    # partitions only)
    "events_sliding_value_quantiles",
    "docs_stream_span_dedup_bucketed",
    # round-9 wave 2: conditional set-aggregate (single fact scan),
    # exact distinct-count (two-phase partial distinct), cumulative
    # TOPPERCENT cut (axis-bounded window), libm-free temperature mix
    "cube_named_set_sum_member",
    "cube_distinct_orders_by_region",
    "cube_toppercent_nations",
    "docs_temperature_mix_rates",
    "docs_char_entropy",
    "events_hll_md5_users_by_type",
    # round-10: DRILLTHROUGH must stay a filter+limit over the fact
    # scan (no axis materialization, no groupBy); calc-over-calc adds
    # only post-agg projections over the same single-scan plan; the
    # md5 LSH twin's n x dim x bits explode must stay linear (embeddings
    # stay as-is in the replicator — shape check, not corpus growth)
    "cube_drillthrough_region",
    "cube_calc_over_calc",
    "emb_lsh_near_dup_pairs_exact",
    # decontamination: replica flood deepens each shingle's posting
    # list ~FACTOR on BOTH sides (src0 replicates too), so the
    # attribution pair count grows ~FACTOR^2 inside dup groups — the
    # documented posting shape; the removal stays one left-anti join
    "docs_contamination_attribution",
    "docs_decontaminated_corpus",
    # RETURN projection must prune the fact ReadSchema to the returned
    # columns; subselect restriction must push its keys into the scan
    # exactly like a slicer
    "cube_drillthrough_return",
    "cube_subselect_regions",
    # span-level decontamination: marked-position interval merge must
    # stay contaminated-mass-sized (replica flood multiplies the eval
    # gram hits ~FACTOR on both sides)
    "docs_contamination_spans",
    # md5-LSH twins over the query/split sides: n x dim x bits
    # signature cost (documented linear), no all-pairs anywhere
    "emb_lsh_topk_exact",
    "emb_cross_split_leakage_lsh_exact",
    # round-10 wave 2: the two-phase prefix family — the claim under
    # test is that wall-clock tracks max(bucket size), not |input|
    # (row-level windows stay partitioned; only the |buckets|-row
    # carry window is serial)
    "events_revenue_milestones",
    "events_peak_concurrency",
    "events_stream_milestones",
    # post-agg MDX additions (axis-sized windows/arrays over the same
    # single-scan star plan)
    "cube_median_region_sales",
    "cube_rank_nations",
    "cube_nonempty_prev_months",
    "events_session_occupancy",
    "events_value_exact_ranks",
    "docs_source_token_milestones",
    # persisted IVF index: build-once cost vs partition-pruned query
    "emb_ivf_index_topk",
    # round-13: source-graph PageRank (distinct (source,shingle) agg +
    # df-bounded pair join must absorb the 10x shingle instances; the
    # unrolled iterations run over |sources|-row checkpoints, invariant
    # to FACTOR) and per-dimension drift (one (source,dim) shuffle; the
    # embeddings side stays as-is so this measures the docs-join path)
    "docs_source_pagerank",
    "emb_source_dim_drift",
    # round-13 wave 2: the double-prefix interleave (two bucket-carry
    # serial steps, row windows bucket-parallel) and the |sources|-row
    # apportionment (corpus cost = one combinable aggregate)
    "docs_interleave_sources",
    "docs_budget_allocation",
    # round-13 wave 3: personalized PPR — same corpus-side cost as
    # docs_source_pagerank plus the contamination seed derivation
    # (one more shingle vocab join), iterations still |sources|-row
    "docs_contamination_pagerank",
]

KEY_SPAN = 100_000_000  # far above any sf0.1 key


def build(spark) -> None:
    if os.path.isdir(SCRATCH):
        shutil.rmtree(SCRATCH)
    os.makedirs(SCRATCH)
    for t in ASIS:
        shutil.copy(f"{SRC}/{t}.parquet", f"{SCRATCH}/{t}.parquet")
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(FACTOR):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_SPAN))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        if t == "events":
            # single FILE named events.parquet (not a directory): the
            # streaming entries' pathGlobFilter targets the driver's
            # single-file layout, so this makes them probe-able at scale
            tmp = f"{SCRATCH}/_events_tmp"
            out.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(f for f in os.listdir(tmp)
                        if f.startswith("part-") and f.endswith(".parquet"))
            shutil.move(f"{tmp}/{part}", f"{SCRATCH}/events.parquet")
            shutil.rmtree(tmp)
        else:
            out.write.mode("overwrite").parquet(f"{SCRATCH}/{t}.parquet")
        print(f"# built {t}: x{FACTOR}", file=sys.stderr)


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    print(f"# probe at ~sf{FACTOR * 0.1:g} ({SCRATCH})", file=sys.stderr)
    queries = PROBE_QUERIES if ONLY is None else [
        n for n in PROBE_QUERIES if any(s in n for s in ONLY)]
    for name in queries:
        fn = WORKLOAD[name].fn
        t0 = time.perf_counter()
        df = fn(spark, SCRATCH)
        n = df.count()
        dt = time.perf_counter() - t0
        strats = join_strategies(df)   # executedPlan after AQE finalized
        print(f"{name}: {dt:.2f}s rows={n} joins={strats}")


if __name__ == "__main__":
    main()
