"""Result sinks: CSV / Excel / JSON / JDBC with the reference's result
sanitization and post-write reconciliation.

Reference behaviors kept: NaN/NaT/±Inf → None scrub
(backend/olap_service.py:326-334), control-char strip for Excel
(scanner/DGIS_SCAN_2_stable.py:662-676), stringly values only at the
serialization edge (backend/db_runner.py:73), row-count reconciliation
after load (database/migrate_csv_to_db.py:182-208, X9).

Scale: CSV/Parquet/JDBC writes are distributed (`df.write`); Excel is a
driver-side edge concern and guarded by the reference's 100k threshold.
"""
from __future__ import annotations

import json
import math
import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LARGE_RESULT_THRESHOLD = 100_000   # reference export-UX switch
CONTROL_CHARS = "[\\x00-\\x1F\\x7F]"


def sanitize(df: DataFrame) -> DataFrame:
    """NaN/±Inf → NULL on float columns (reference scrub)."""
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, (T.DoubleType, T.FloatType)):
            c = F.col(f_.name)
            df = df.withColumn(
                f_.name,
                F.when(F.isnan(c) | c.isin(float("inf"), float("-inf")),
                       None).otherwise(c))
    return df


def strip_control_chars(df: DataFrame) -> DataFrame:
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.StringType):
            df = df.withColumn(
                f_.name, F.regexp_replace(F.col(f_.name), CONTROL_CHARS, ""))
    return df


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> int:
    """Distributed CSV write; ``single_file`` coalesces for the reference's
    one-file export UX (only sane below the 100k threshold)."""
    out = sanitize(df)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)
    return reconcile_rowcount(df, out.sparkSession.read
                              .option("header", True).csv(path))


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None) -> int:
    """Parquet sink; ``partition_by`` lays out hive-style directories so
    downstream filters on those columns prune whole partitions at the
    file listing (the lake-side analogue of the reference's B-tree
    indexes, 001_initial_schema.sql:81-88)."""
    w = sanitize(df).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return reconcile_rowcount(df, df.sparkSession.read.parquet(path))


def write_excel(df: DataFrame, path: str) -> int:
    """Driver-side Excel export (edge concern).  Strips control chars the
    way the reference does; refuses silently huge exports.  Uses pandas'
    openpyxl engine when available, else the bundled dependency-free
    OOXML writer (olap_xtrctr_spark.xlsx) — same file either way."""
    n = df.count()
    if n > LARGE_RESULT_THRESHOLD:
        raise ValueError(
            f"{n:,} rows exceeds Excel export guard "
            f"({LARGE_RESULT_THRESHOLD:,}); use CSV/Parquet")
    clean = strip_control_chars(sanitize(df))
    try:
        import openpyxl  # noqa: F401 — pandas' xlsx engine
    except ImportError:
        from .xlsx import write_xlsx
        write_xlsx(path, clean.columns,
                   ([row[c] for c in clean.columns]
                    for row in clean.collect()))
        return n
    clean.toPandas().to_excel(path, index=False)
    return n


def write_excel_workbook(path: str,
                         sheets: "dict[str, DataFrame]") -> dict[str, int]:
    """Multi-sheet workbook export (reference discovery/catalog workbooks,
    scanner/DGIS_SCAN_2_stable.py:344-357,429-451): one sheet per result
    DataFrame.  Sheet names are truncated to Excel's 31-char limit the
    way the reference truncates (:448); collisions after truncation are
    an error rather than a silent overwrite.  Driver-side edge concern
    like write_excel — same per-sheet row guard, control-char strip, and
    NaN scrub.  Returns ``{sheet_name: row_count}``."""
    # one collect per sheet: the guard reads limit(threshold + 1) and
    # fails on overflow, so each sheet's plan executes ONCE (a count()
    # followed by collect() would run every DMV/query plan twice)
    named: list[tuple[str, list[str], list]] = []
    for name, df in sheets.items():
        short = name[:31]
        clean = strip_control_chars(sanitize(df))
        rows = clean.limit(LARGE_RESULT_THRESHOLD + 1).collect()
        if len(rows) > LARGE_RESULT_THRESHOLD:
            raise ValueError(
                f"sheet {name!r}: over {LARGE_RESULT_THRESHOLD:,} rows "
                f"exceeds Excel export guard; use CSV/Parquet")
        named.append((short, clean.columns, rows))
    if len({s for s, _, _ in named}) != len(named):
        raise ValueError(
            f"sheet names collide after 31-char truncation: "
            f"{[s for s, _, _ in named]!r}")
    try:
        import openpyxl  # noqa: F401 — pandas' xlsx engine
    except ImportError:
        from .xlsx import write_xlsx_workbook
        return write_xlsx_workbook(path, [
            (short, cols, [[row[c] for c in cols] for row in rows])
            for short, cols, rows in named])
    import pandas as pd
    with pd.ExcelWriter(path, engine="openpyxl") as writer:
        for short, cols, rows in named:
            pd.DataFrame([[row[c] for c in cols] for row in rows],
                         columns=cols).to_excel(writer, sheet_name=short,
                                                index=False)
    return {short: len(rows) for short, _, rows in named}


def to_json_result(df: DataFrame, limit: int | None = None,
                   stringify: bool = True) -> dict[str, Any]:
    """The reference's JSONB job-result envelope
    (backend/db_runner.py:75-81): columns, data (stringified cells),
    count, duration_seconds, executed_at."""
    t0 = time.time()
    rows = (df.limit(limit) if limit else df).collect()
    cols = df.columns

    def cell(v):
        if v is None:
            return None
        if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
            return None
        return str(v) if stringify else v

    return {
        "columns": cols,
        "data": [[cell(r[c]) for c in cols] for r in rows],
        "count": len(rows),
        "duration_seconds": round(time.time() - t0, 3),
        "executed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }


def write_json(df: DataFrame, path: str, limit: int | None = None) -> int:
    res = to_json_result(df, limit)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(res, fh, ensure_ascii=False)
    return res["count"]


def write_jdbc(df: DataFrame, url: str, table: str,
               mode: str = "append", batchsize: int = 1000,
               properties: dict | None = None) -> None:
    """JDBC sink (reference Postgres load path, batch 1000)."""
    writer = (sanitize(df).write.mode(mode)
              .option("batchsize", batchsize))
    writer.jdbc(url, table, properties=properties or {})


def reconcile_rowcount(source: DataFrame, written: DataFrame) -> int:
    """Post-write row-count reconciliation (X9).  Raises on mismatch."""
    n_src, n_dst = source.count(), written.count()
    if n_src != n_dst:
        raise RuntimeError(
            f"reconciliation failed: wrote {n_dst} rows, expected {n_src}")
    return n_dst


def ag_grid_columns(df: DataFrame) -> list[dict[str, Any]]:
    """AG-Grid column descriptors from the schema
    (backend/olap_service.py:336-344)."""
    return [{"field": c, "headerName": c, "sortable": True, "filter": True}
            for c in df.columns]
