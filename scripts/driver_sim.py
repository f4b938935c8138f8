"""Driver simulation: run every queries() entry under a PLAIN
SparkSession — none of get_spark()'s confs — exactly like the external
correctness driver does.  Round 1 failed 6 queries on this (the
nanosAsLong conf lived only in the builder); this script keeps the
self-containment contract honest.

Usage: python scripts/driver_sim.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    spark = (SparkSession.builder.master("local[8]")
             .appName("driver-sim").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    assert e.entry(spark).count() >= 0
    from olap_xtrctr_spark.session import release_tracked_caches
    failures = []
    for name, fn in e.queries().items():
        try:
            n = fn(spark, SF).count()
            print(f"OK   {name}: {n} rows", flush=True)
        except Exception as ex:                     # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: {str(ex)[:200]}", flush=True)
        finally:
            # per-entry cache hygiene (VERDICT r12 task 8): a 296-entry
            # session would otherwise accumulate every diamond
            # operator's pinned intermediate in executor memory
            release_tracked_caches()
    print(f"{len(e.queries()) - len(failures)} ok, "
          f"{len(failures)} failed{': ' if failures else ''}{failures or ''}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
