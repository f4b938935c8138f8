"""Round-13 streaming-replay overhead probe (guide §1).

The three headline availableNow replays cost ~1.2-1.6 s each, mostly
fixed micro-batch machinery.  Variables:
  * state-store width (currently max(4, defaultParallelism//4) = 8):
    each state partition pays open/commit per micro-batch;
  * checkpoint location: memory-sink replays create a temp checkpoint
    under java.io.tmpdir (disk); /dev/shm is tmpfs.

Usage: python scripts/stream_replay_probe.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.session import events_schema
from olap_xtrctr_spark.streaming import events as EV

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main():
    spark = get_spark("stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    schema = events_schema(spark, SF)

    def run(name, fn):
        ts = []
        for p in range(3):
            t0 = time.perf_counter()
            fn(spark, SF, schema).count()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1], [round(t, 3) for t in ts]

    # warm
    EV.replay_hourly_rollup(spark, "/root/testdata/sf0.001",
                            events_schema(spark, "/root/testdata/sf0.001"))

    import olap_xtrctr_spark.streaming.events as E

    orig = E.run_stream_to_memory

    def patched_width(width, ckpt=None):
        def rsm(spark, sdf, qname, output_mode="complete"):
            spark.conf.set("spark.sql.shuffle.partitions", str(width))
            w = (sdf.writeStream.format("memory").queryName(qname)
                 .outputMode(output_mode).trigger(availableNow=True))
            if ckpt:
                w = w.option("checkpointLocation",
                             f"{ckpt}/{qname}_{time.monotonic_ns()}")
            return w.start()
        return rsm

    for label, width, ckpt in (
            ("width8_tmp", 8, None),
            ("width4_tmp", 4, None),
            ("width2_tmp", 2, None),
            ("width8_shm", 8, "/dev/shm/sgr13_ck"),
            ("width4_shm", 4, "/dev/shm/sgr13_ck"),
    ):
        E.run_stream_to_memory = patched_width(width, ckpt)
        try:
            for qname, fn in (
                    ("hourly", EV.replay_hourly_rollup),
                    ("sess", lambda s, d, sc: EV.replay_sessionize(
                        s, d, sc, second_resolution=True)),
                    ("dedup", EV.replay_dedup_counts)):
                med, ts = run(qname, fn)
                print(f"{label} {qname}: med={med:.3f} {ts}", flush=True)
        finally:
            E.run_stream_to_memory = orig


if __name__ == "__main__":
    main()
