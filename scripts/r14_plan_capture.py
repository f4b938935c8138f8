"""Capture plans/r14/<query>_{before,after}.txt for the r14-touched
queries: before = the pre-r14 shape (monkeypatched old simhash
signature), after = the committed code.  Cube queries are captured
under the default gate (plans unchanged vs r13 — the bench-flat claim)
and the denied-gate path is additionally captured as
cube_nation_sales_gate_denied.txt (the 100 TB posture).

Usage: python scripts/r14_plan_capture.py [sf_dir]
"""
from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators import dedup as D
from olap_xtrctr_spark.workload import WORKLOAD

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = "/root/repo/plans/r14"


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def cap(path: str, df) -> None:
    with open(path, "w") as fh:
        fh.write(fmt(df))
    print(f"# wrote {path}", file=sys.stderr)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r14-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    from simhash_kernel_probe import old_signature
    new_kernel = D._simhash_kernel

    def old_kernel(docs, text_col, id_col, hash_sql, bits):
        fam = "xx" if hash_sql == D._XXHASH64_TOKEN_SQL else "md5"
        return old_signature(docs, text_col, id_col, fam, bits)

    for name in ("docs_simhash_pairs", "docs_simhash_pairs_exact"):
        D._simhash_kernel = old_kernel
        cap(f"{OUT}/{name}_before.txt", WORKLOAD[name].fn(spark, SF))
        D._simhash_kernel = new_kernel
        cap(f"{OUT}/{name}_after.txt", WORKLOAD[name].fn(spark, SF))

    # cube under the default gate: the r14 claim is "plans unchanged at
    # local scale" — capture after only (diff against plans/r13 finals)
    from olap_xtrctr_spark import query as Q
    for name in ("cube_nation_sales", "cube_slicer_where_tuple"):
        cap(f"{OUT}/{name}_after.txt", WORKLOAD[name].fn(spark, SF))
    # the denied-gate path (the SF-grown bridge posture)
    os.environ["SPARK_GRAFT_DIM_HINT_MAX_BYTES"] = "64"
    Q._DIM_HINT_GATE.clear()
    cap(f"{OUT}/cube_nation_sales_gate_denied.txt",
        WORKLOAD["cube_nation_sales"].fn(spark, SF))
    del os.environ["SPARK_GRAFT_DIM_HINT_MAX_BYTES"]
    Q._DIM_HINT_GATE.clear()


if __name__ == "__main__":
    main()
