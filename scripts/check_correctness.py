"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at the given SF, compare
row count, schema (column names), and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [name_filter]
       (name_filter "@window" = the driver's exact first-50 scope)

KNOWN LIMITATION (round-9 note): this gate runs ONE DuckDB build (the
container's), while the driver runs ITS OWN — and round 8 proved the
two can disagree bitwise on libm transcendentals (ln), turning
local-green entries driver-red.  A second-DuckDB-version cross-check
would have caught that a round earlier, but the container has no
network (pip cannot fetch another duckdb wheel — verified r9).  The
durable mitigation is structural instead: NO oracle may call
ln/log/exp at all and pow only in measured-exact forms
(tests/test_hostmath.py lint); every float score goes through the
fixed-op IEEE ladders in operators/fixedlog.py, which are
engine-version-independent by construction (bit-equality swept across
CPython/DuckDB/Spark in tests/test_fixedlog.py).  If a future
container gains network or a second duckdb wheel appears in the image,
run this gate under both versions and diff the oracle halves.

ROUND-10 ADDITION: every passing entry is ALSO fetched via
``fetchdf()`` (pandas) and the two fetch paths must agree — the r8/r9
red class (HUGEINT output columns rendering as float64 in Arrow/pandas
harnesses) was invisible to the ``fetchall`` path alone.  See
``pandas_path_check`` and tests/test_oracle_types.py.
"""
from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry
from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.session import TABLES

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILT = sys.argv[2] if len(sys.argv) > 2 else ""


def norm(v):
    # 12 significant digits, not 6: the driver hashes full values, and
    # %.6g silently truncates e.g. 10000.1234 -> "10000.1", passing
    # locally what the driver would fail.  12g keeps every ROUND(x,4)
    # output exact while still absorbing sub-ulp double noise.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.12g}" if abs(v) < 1e15 else f"{v:.12e}"
    return str(v)


_INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"}


def pandas_path_check(con, sql, dcols, dset):
    """Second harness path (VERDICT r9 task 2): fetch the oracle via
    ``fetchdf()`` (pandas/Arrow, the way a driver-style harness fetches)
    and assert it agrees with the ``fetchall`` path.

    The r8/r9 driver-red class was invisible to ``fetchall`` → ``str``:
    DuckDB types ``SUM(BIGINT)`` / integer ``//`` as HUGEINT, which
    ``fetchdf`` silently renders as float64 EVEN WITH NO NULLS —
    rows/schema match, value rendering diverges.  Two checks:

    1. dtype check — any integer-declared column arriving float64 with
       zero NULLs is the HUGEINT signature (NULL-coerced int columns
       are a known pandas artifact shared by both paths, exempt);
    2. value check — normalized pandas values (NaN/NaT→None,
       DATE→date) must equal the fetchall-path set.

    Returns an error string, or None if both paths agree.
    """
    import pandas as pd

    desc = con.execute("DESCRIBE " + sql).fetchall()
    typ_by_col = {d[0]: d[1].upper() for d in desc}
    pdf = con.execute(sql).fetchdf()
    for col in pdf.columns:
        t = typ_by_col.get(col, "")
        if (t in _INT_TYPES and str(pdf[col].dtype) == "float64"
                and pdf[col].notna().all()):
            return (f"column {col} ({t}) renders float64 via pandas "
                    "with no NULLs — HUGEINT-class type divergence")

    def pnorm(v, t):
        if v is None or v is pd.NaT or (isinstance(v, float)
                                        and math.isnan(v)):
            return "None"
        if t == "DATE" and hasattr(v, "date"):
            return str(v.date())
        return norm(float(v) if isinstance(v, float) else v)

    cols = list(pdf.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    pset = sorted(
        tuple(pnorm(r[i], typ_by_col.get(cols[i], "")) for i in order)
        for r in pdf.itertuples(index=False, name=None))
    # fetchall-side None renders "None"; NaN stays "nan" there but the
    # pandas path cannot distinguish NULL from NaN, so fold both.
    dset_folded = [tuple("None" if x == "nan" else x for x in row)
                   for row in dset]
    pset_folded = [tuple("None" if x == "nan" else x for x in row)
                   for row in pset]
    if dset_folded != pset_folded:
        diff = [(a, b) for a, b in zip(dset_folded, pset_folded)
                if a != b][:3]
        return f"fetchdf path disagrees with fetchall path, e.g. {diff}"
    return None


def main() -> int:
    spark = get_spark("correctness")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        except duckdb.IOException:
            # Spark-written table = a DIRECTORY of part files (the
            # scale-probe replicas); the driver's testdata is one file
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM '{SF}/{t}.parquet/*.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    # "@window" replicates the driver's grading scope: the first 50
    # entries of queries() at the given sf_dir.
    window = set(list(qs)[:50]) if FILT == "@window" else None
    n_pass = n_fail = n_rows_only = 0
    from olap_xtrctr_spark.session import release_tracked_caches
    for name, fn in qs.items():
        # per-entry cache hygiene (VERDICT r12 task 8): release the
        # PREVIOUS entry's tracked pins (top-of-loop so every
        # continue path below is covered), else a full-workload run
        # accumulates every diamond operator's cached intermediate
        release_tracked_caches()
        if window is not None:
            if name not in window:
                continue
        elif FILT and not any(f in name for f in FILT.split("|")):
            continue
        try:
            df = fn(spark, SF)
            srows = df.collect()
            scols = sorted(df.columns)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = sorted(d[0] for d in res.description)
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if scols != dcols:
            print(f"FAIL  {name}: schema {scols} != {dcols}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(drows)}")
            n_fail += 1
            continue
        didx = [[d[0] for d in res.description].index(c) for c in dcols]
        sset = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
        dset = sorted(tuple(norm(r[i]) for i in didx) for r in drows)
        if sset != dset:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, e.g. {diff}")
            n_fail += 1
            continue
        err = pandas_path_check(con, oracles[name], dcols, dset)
        if err:
            print(f"FAIL  {name}: {err}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows")
        n_pass += 1
    release_tracked_caches()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
