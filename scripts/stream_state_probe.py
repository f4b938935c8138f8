"""r14 streaming fixed-floor probe (VERDICT r13 item 7): can a state
store provider or trigger knob shave the ~1.1 s/query bounded-replay
floor?  Arms, alternating passes over the 3 headline replays:

  hdfs     — default HDFSBackedStateStoreProvider (current)
  rocksdb  — RocksDBStateStoreProvider
  rocksdb+clog — RocksDB with changelog checkpointing (lighter commits)

availableNow batching is already the shipped trigger; the replay width
and tmpfs scratch checkpoints are the r13 trims.

Usage: python scripts/stream_state_probe.py [sf_dir] [passes]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.session import release_tracked_caches
from olap_xtrctr_spark.workload import WORKLOAD

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3

ENTRIES = ["events_stream_hourly", "events_stream_sessionize",
           "events_stream_dedup"]

PROVIDER = "spark.sql.streaming.stateStore.providerClass"
HDFS = ("org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider")
ROCKS = ("org.apache.spark.sql.execution.streaming."
         "state.RocksDBStateStoreProvider")
CLOG = ("spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled")


def main() -> None:
    spark = get_spark("stream-state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    arms = (("hdfs", HDFS, "false"), ("rocksdb", ROCKS, "false"),
            ("rocksdb+clog", ROCKS, "true"))
    results: dict[str, list[float]] = {}
    for p in range(PASSES):
        for arm, provider, clog in arms:
            spark.conf.set(PROVIDER, provider)
            spark.conf.set(CLOG, clog)
            for name in ENTRIES:
                spark.sparkContext.setJobDescription(
                    f"stream probe {arm} {name} pass{p}")
                t0 = time.perf_counter()
                n = WORKLOAD[name].fn(spark, SF).count()
                dt = time.perf_counter() - t0
                release_tracked_caches()
                results.setdefault(f"{name}:{arm}", []).append(dt)
                print(f"# pass{p} {arm:13s} {name}: {dt:.3f}s rows={n}",
                      file=sys.stderr)
    spark.conf.set(PROVIDER, HDFS)
    spark.conf.set(CLOG, "false")
    totals: dict[str, float] = {}
    for k in sorted(results):
        ts = sorted(results[k])
        med = ts[len(ts) // 2]
        totals[k.split(":")[1]] = totals.get(k.split(":")[1], 0) + med
        print(f"{k}: med={med:.3f} min={ts[0]:.3f} all="
              f"{[round(t,3) for t in ts]}")
    for arm, tot in sorted(totals.items()):
        print(f"TRIO {arm}: {tot:.3f}s (sum of medians)")


if __name__ == "__main__":
    main()
