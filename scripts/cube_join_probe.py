"""Round-13 fact⋈dim-view join-side A/B (guide §1/§3.1).

Variants (same session, runtime conf + query._DIM_JOIN_MODE toggles):
  off   pre-r13: static estimates decide -> planner broadcasts the FACT
        on the cube star joins (observed inverted build side)
  hint  broadcast-hint the dim-view side (local default)
  aqe   no hint, static autoBroadcastJoinThreshold=-1, adaptive
        threshold 10m -> every estimate-based broadcast decided from
        RUNTIME sizes (the 100 TB-safe policy)

Measures the cube headline queries (engine path) and the TPC-H joins
(hand-written path, only the conf varies) — 3 passes, medians.

Usage: python scripts/cube_join_probe.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from olap_xtrctr_spark import get_spark
import olap_xtrctr_spark.query as Q
from olap_xtrctr_spark.session import release_tracked_caches
from olap_xtrctr_spark.workload import WORKLOAD

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

QUERIES = ["cube_nation_sales", "cube_3dim_crossjoin",
           "cube_slicer_where_tuple", "cube_variables_pivot",
           "members_full_view",
           "tpch_q5_local_supplier", "tpch_q9_product_profit",
           "tpch_q18_large_orders", "tpch_q21_waiting_orders"]


def main():
    spark = get_spark("cube-join-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    for name in QUERIES:           # warm code paths at tiny SF
        WORKLOAD[name].fn(spark, "/root/testdata/sf0.001").count()
    try:
        from olap_xtrctr_spark.cube import sales_cube
        from olap_xtrctr_spark.metadata import cached_members_df
        cached_members_df(spark, sales_cube(), SF).count()
    except Exception as exc:
        print(f"# members prime failed: {exc}", file=sys.stderr)

    results = {}
    for mode in ("off", "hint", "aqe"):
        Q._DIM_JOIN_MODE = "hint" if mode == "hint" else "off"
        if mode == "aqe":
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        for name in QUERIES:
            ts = []
            for p in range(3):
                spark.sparkContext.setJobDescription(f"{mode}:{name} p{p}")
                t0 = time.perf_counter()
                WORKLOAD[name].fn(spark, SF).count()
                ts.append(time.perf_counter() - t0)
                release_tracked_caches()
            results.setdefault(name, {})[mode] = sorted(ts)[1]
            print(f"{mode:5s} {name}: med={sorted(ts)[1]:.3f} "
                  f"{[round(t, 3) for t in ts]}", flush=True)
    print("\nname, off, hint, aqe")
    for name in QUERIES:
        r = results[name]
        print(f"{name}: {r['off']:.3f} {r['hint']:.3f} {r['aqe']:.3f}")
    tot = {m: sum(results[n][m] for n in QUERIES)
           for m in ("off", "hint", "aqe")}
    print(f"TOTALS: off={tot['off']:.2f} hint={tot['hint']:.2f} "
          f"aqe={tot['aqe']:.2f}")


if __name__ == "__main__":
    main()
