"""One timed pass over EVERY workload entry at a given SF (fn + count,
bench methodology) — finds non-headline stragglers the bench set does
not cover.  Read-only diagnostic; prints one line per entry and a
sorted summary.

Usage: python scripts/workload_timing_scan.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.session import release_tracked_caches
from olap_xtrctr_spark.workload import WORKLOAD

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> int:
    spark = get_spark("workload-timing-scan")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    times: dict[str, float] = {}
    failures = []
    for name, spec in WORKLOAD.items():
        spark.sparkContext.setJobDescription(f"scan:{name}")
        t0 = time.perf_counter()
        try:
            spec.fn(spark, SF).count()
            t = time.perf_counter() - t0
            times[name] = t
            print(f"OK   {name}: {t:.3f}s", flush=True)
        except Exception as ex:                      # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: {str(ex)[:160]}", flush=True)
        finally:
            release_tracked_caches()
    print("\n== slowest 30 ==")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{t:8.3f}  {name}")
    print(f"\n{len(times)} ok, {len(failures)} failed: {failures or ''}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
