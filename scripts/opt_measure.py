"""Round-13 optimization measurement harness (guide §1).

For each headline query: capture .explain("formatted") into
plans/r13/<name>_<tag>.txt, and time it bench-style (fn + count) over
N passes, split into plan-build time (the fn() call: Python query
construction + analysis) and action time (count(), same action the
bench uses — kept for continuity with BENCH_r01-r12; the noop sink is
used as a secondary timing to show column-pruning sensitivity).

Usage: python scripts/opt_measure.py <tag> [name_filter] [passes]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.session import release_tracked_caches
from olap_xtrctr_spark.workload import WORKLOAD

from bench import HEADLINE

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
FILT = sys.argv[2] if len(sys.argv) > 2 else ""
PASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 3

PLAN_DIR = "/root/repo/plans/r13"
os.makedirs(PLAN_DIR, exist_ok=True)

# Streaming replays EXECUTE inside fn() and return a memory-sink table,
# so their "plan" is a trivial scan; time fn() end-to-end for them.
STREAMING = {"events_stream_hourly", "events_stream_sessionize",
             "events_stream_dedup", "events_stream_ohlc"}


def main() -> None:
    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    # identical warm-up discipline to bench.py
    spark.range(1).count()
    names = [n for n in HEADLINE if FILT in n]
    for name in names:
        try:
            WORKLOAD[name].fn(spark, "/root/testdata/sf0.001").count()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    release_tracked_caches()
    try:
        from olap_xtrctr_spark.cube import sales_cube
        from olap_xtrctr_spark.metadata import cached_members_df
        cached_members_df(spark, sales_cube(), SF_DIR).count()
    except Exception as exc:
        print(f"# members prime failed: {exc}", file=sys.stderr)

    out: dict[str, dict] = {}
    for name in names:
        spec = WORKLOAD[name]
        rec: dict = {"build": [], "count": [], "noop": []}
        for p in range(PASSES):
            release_tracked_caches()
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            rec["build"].append(round(t1 - t0, 3))
            rec["count"].append(round(t2 - t1, 3))
            rec["rows"] = n
            if name not in STREAMING:
                t3 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                rec["noop"].append(round(time.perf_counter() - t3, 3))
            if p == 0 and name not in STREAMING:
                import contextlib
                import io
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(f"{PLAN_DIR}/{name}_{TAG}.txt", "w") as f:
                    f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        med = lambda xs: sorted(xs)[len(xs) // 2] if xs else None
        rec["build_med"] = med(rec["build"])
        rec["count_med"] = med(rec["count"])
        rec["noop_med"] = med(rec["noop"])
        rec["total_med"] = round((rec["build_med"] or 0)
                                 + (rec["count_med"] or 0), 3)
        out[name] = rec
        print(f"{name}: build={rec['build_med']} count={rec['count_med']} "
              f"noop={rec['noop_med']} rows={rec['rows']}", flush=True)
    with open(f"{PLAN_DIR}/timings_{TAG}.json", "w") as f:
        json.dump(out, f, indent=1)
    tot = sum(r["total_med"] for r in out.values())
    print(f"TOTAL (build+count med): {tot:.2f}s over {len(out)} queries")


if __name__ == "__main__":
    main()
