"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.workload import WORKLOAD

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative headline set: cube aggregations (joins + groupBy), TPC-H
# style scans, metadata generation, dedup/similarity/text extensions,
# event analytics.
HEADLINE = [
    "cube_nation_sales",
    "cube_3dim_crossjoin",
    "cube_time_rollup",
    "cube_slicer_where_tuple",
    "cube_variables_pivot",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_orders",
    "members_nation_list",
    "members_level_cardinalities",
    "members_full_view",
    "docs_ngram_jaccard_pairs",
    "docs_minhash_lsh_pairs",
    "docs_quality_score",
    "docs_hash_split",
    "docs_incremental_dedup",
    "docs_pack_sequences",
    "docs_segment_dedup",           # round-7 addition: segment-level dedup
    "docs_duplicate_spans",         # round-7 addition: exact stride-1 spans
    "emb_cosine_topk",
    "emb_near_dup_pairs",
    "multimodal_features",
    "events_sessionize",
    "events_hourly_rollup",
    "events_stream_hourly",
    "events_stream_sessionize",
    "events_stream_dedup",
]


WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up: run each headline query once at sf0.001 so JVM startup,
    # parquet reader init and whole-stage-codegen compilation aren't billed
    # to the measured sf0.1 runs (the warm-up reads DIFFERENT files, so no
    # data from the measured scale factor is pre-cached).
    spark.range(1).count()
    t_warm = time.perf_counter()
    for name in HEADLINE:
        try:
            WORKLOAD[name].fn(spark, WARMUP_SF_DIR).count()
        except Exception as exc:  # a broken warm-up must not kill the bench
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    warmup_sec = round(time.perf_counter() - t_warm, 3)

    # Host-state calibration (VERDICT r6 task 8): a fixed synthetic job
    # whose cost is independent of the workload under test.  Comparing
    # calibration_job_sec across BENCH_rN files separates host drift
    # (calibration moved too) from plan regressions (calibration stable,
    # query moved) without cross-referencing BASELINE.md prose.  Median
    # of 3 shuffling aggregations over 50M generated rows — CPU + shuffle
    # bound, no file I/O, deterministic input.
    def calib_once() -> float:
        t0 = time.perf_counter()
        (spark.range(50_000_000)
         .selectExpr("id % 1000 AS k", "id AS v")
         .groupBy("k").sum("v").count())
        return time.perf_counter() - t0

    calib = sorted(calib_once() for _ in range(3))[1]

    # Prime the persistent members/guard caches for the measured SF —
    # they are cross-process infrastructure (fingerprint-keyed parquet
    # spill + cards.json), and a fresh environment would otherwise bill
    # the one-time build (~14 s measured at sf0.1) to whichever members_*
    # query happens to run first.  BASELINE numbers are recorded with the
    # spill present.
    try:
        from olap_xtrctr_spark.cube import sales_cube
        from olap_xtrctr_spark.metadata import cached_members_df
        cached_members_df(spark, sales_cube(), SF_DIR).count()
    except Exception as exc:
        print(f"# members-cache prime failed: {exc}", file=sys.stderr)

    # Cold members-cache BUILD time (VERDICT r13 item 6): the members_*
    # headline queries read the primed spill, so the ~one-time build
    # path was never benched and a regression there could hide forever.
    # Measure the exact miss path (16-hierarchy union build -> parquet
    # spill -> re-read -> count) against a scratch dir, once — reported
    # as its own top-level field so the 3-pass headline totals stay
    # comparable round-over-round.
    members_build_sec = None
    try:
        import shutil
        import tempfile
        from olap_xtrctr_spark.metadata import members_df
        scratch = tempfile.mkdtemp(prefix="sgr-members-cold-")
        spill = os.path.join(scratch, "members_spill")
        t0 = time.perf_counter()
        members_df(spark, sales_cube(), SF_DIR).write.mode(
            "overwrite").parquet(spill)
        spark.read.parquet(spill).count()
        members_build_sec = round(time.perf_counter() - t0, 3)
        shutil.rmtree(scratch, ignore_errors=True)
    except Exception as exc:
        print(f"# members cold-build probe failed: {exc}", file=sys.stderr)

    # Three passes per query (pass-wise, so pass 1 stays comparable to
    # the single-pass totals of earlier rounds): single-pass numbers let
    # host noise masquerade as plan regressions (SCALE.md probe #14 — a
    # 67.9 s end-of-session GC artifact got a whole operator flagged
    # perf-weak).  The median is the self-describing per-query signal;
    # min bounds the noise floor.
    passes: dict[str, list[float]] = {}
    failed: list[str] = []
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    for pass_i in range(n_passes):
        for name in HEADLINE:
            if name in failed:
                continue
            spec = WORKLOAD[name]
            t0 = time.perf_counter()
            # One broken query must not zero the whole round's bench
            # signal: record the failure and keep measuring the rest.
            try:
                df = spec.fn(spark, SF_DIR)
                n = df.count()
            except Exception as exc:
                failed.append(name)
                print(f"# {name}: FAILED ({exc})", file=sys.stderr)
                continue
            t = round(time.perf_counter() - t0, 3)
            # Release operator-tracked persists AFTER the clock stops
            # (r13): operators that cache an intermediate reused inside
            # their own plan (e.g. the minhash signature table) register
            # it via session.track_persist; without this release, pass
            # N+1's structurally-identical plan would silently reuse
            # pass N's cached blocks (Spark's CacheManager matches
            # canonicalized subtrees) and the medians would measure the
            # cache, not the query.  Pass 1 numbers were always honest;
            # this keeps passes 2-3 honest too.  No headline operator
            # used track_persist before r13, so this changes no
            # historical number.
            from olap_xtrctr_spark.session import release_tracked_caches
            release_tracked_caches()
            passes.setdefault(name, []).append(t)
            if pass_i == 0:
                print(f"# {name}: {t:.3f}s ({n} rows)", file=sys.stderr)

    def med(ts: list[float]) -> float:
        return round(sorted(ts)[len(ts) // 2], 3)

    timings = {n: ts[0] for n, ts in passes.items()}
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall_clock",
        # pass-1 total: continuity with BENCH_r01-r05 (cold-ish cache)
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": {n: round(min(ts), 3) for n, ts in passes.items()},
        "value_median": round(sum(med(ts) for ts in passes.values()), 3),
        "n_passes": n_passes,
        "failed": failed,
        # host-state covariates: compare against other rounds' values
        # before reading any total as a plan change
        "calibration_job_sec": round(calib, 3),
        "calibration_warmup_sec": warmup_sec,
        "members_cache_build_sec": members_build_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Full record (incl. per-query medians) goes to a sidecar file: the
    # r13 round-over-round comparison was lost to the driver's tail
    # buffer truncating the (valid) ~4 KB contract line, so the printed
    # line carries only what the comparison machinery reads —
    # queries_median moved to the sidecar (r14; value_median, the
    # headline median signal, stays on the line).  The line itself is
    # the contract; BENCH_LAST.json is recovery insurance.
    full = dict(out)
    full["queries_median"] = {n: med(ts) for n, ts in passes.items()}
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_LAST.json"), "w") as fh:
            json.dump(full, fh, indent=2)
    except OSError as exc:
        print(f"# BENCH_LAST.json write failed: {exc}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
