"""Checked CSV ingestion: schema-enforced reads with corrupt-record
capture and post-load reconciliation.

The reference ingests its members CSVs with a verify-counts step after
load (database/migrate_csv_to_db.py:182-208: inserted count vs CSV
rows, mismatch surfaced not swallowed).  This is the Spark-side
equivalent for arbitrary CSVs: PERMISSIVE parse with the malformed
raw lines preserved in a rescue column, a split into (good, bad), and
an ingest-to-parquet wrapper that reports both counts so a silent
parse loss is impossible.

Scale shape: one distributed CSV scan; the good/bad split is two
filters over the same cached parse (no second scan); reconciliation
counts come from the parquet read-back, not the in-memory frame.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESCUE_COL = "_corrupt_record"


def read_csv_checked(spark: SparkSession, path: str,
                     schema: T.StructType,
                     header: bool = True) -> tuple[DataFrame, DataFrame]:
    """Read a CSV against an EXPLICIT schema (never inferSchema — a
    sampling pass that can silently flip a column's type between
    loads).  Returns ``(good, bad)``: ``bad`` holds the raw text of
    every line that failed to parse, ``good`` the typed rows.

    Implementation note: Spark only populates the rescue column for a
    row when it is selected from a frame that includes it, and a
    malformed row nulls OUT the typed columns — so the split predicate
    is the rescue column itself."""
    if RESCUE_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not define {RESCUE_COL!r}")
    # a NEW StructType — StructType.add mutates in place, which would
    # permanently grow the CALLER's schema object
    full = T.StructType(list(schema.fields)
                        + [T.StructField(RESCUE_COL, T.StringType())])
    df = (spark.read.schema(full)
          .option("header", header)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", RESCUE_COL)
          .csv(path)).cache()
    good = (df.filter(F.col(RESCUE_COL).isNull())
            .drop(RESCUE_COL))
    bad = (df.filter(F.col(RESCUE_COL).isNotNull())
           .select(F.col(RESCUE_COL).alias("raw_line")))
    return good, bad


def ingest_csv_to_parquet(spark: SparkSession, csv_path: str,
                          out_dir: str, schema: T.StructType,
                          header: bool = True) -> dict:
    """CSV → parquet with the reference's verify-counts discipline:
    parse, split good/bad, write good rows, read the parquet BACK and
    reconcile.  Returns the report; raises if the written count does
    not match the good count (a silent write loss, not a data-quality
    issue — bad rows are reported, never dropped silently)."""
    good, bad = read_csv_checked(spark, csv_path, schema, header=header)
    n_good, n_bad = good.count(), bad.count()
    good.write.mode("overwrite").parquet(out_dir)
    n_written = spark.read.parquet(out_dir).count()
    if n_written != n_good:
        raise ValueError(
            f"ingest reconciliation failed: wrote {n_written} rows but "
            f"parsed {n_good} good rows")
    return {"csv_path": csv_path, "out_dir": out_dir,
            "n_good": n_good, "n_bad": n_bad,
            "n_written": n_written,
            "ok": True}


def read_jsonl_checked(spark: SparkSession, path: str,
                       schema: T.StructType
                       ) -> tuple[DataFrame, DataFrame]:
    """Checked JSONL (one JSON object per line — THE interchange format
    for LLM corpora): same explicit-schema PERMISSIVE contract as
    ``read_csv_checked`` — typed good rows, raw text of every
    unparseable line, nothing silently dropped.  ``inferSchema``-style
    sampling is refused for the same reason: a type that flips between
    loads is a silent corpus change.

    JSON-specific caveat handled here: Spark also routes rows that
    parse as JSON but MISMATCH the schema (e.g. a string where a long
    is declared) into the rescue column — so ``bad`` covers both
    malformed lines and schema drift, which is exactly what an
    ingestion gate wants to see."""
    if RESCUE_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not define {RESCUE_COL!r}")
    full = T.StructType(list(schema.fields)
                        + [T.StructField(RESCUE_COL, T.StringType())])
    df = (spark.read.schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", RESCUE_COL)
          .json(path)).cache()
    good = (df.filter(F.col(RESCUE_COL).isNull())
            .drop(RESCUE_COL))
    bad = (df.filter(F.col(RESCUE_COL).isNotNull())
           .select(F.col(RESCUE_COL).alias("raw_line")))
    return good, bad


def ingest_jsonl_to_parquet(spark: SparkSession, jsonl_path: str,
                            out_dir: str,
                            schema: T.StructType) -> dict:
    """JSONL → parquet with the same verify-counts discipline as the
    CSV path: parse, split, write good rows, read back, reconcile."""
    good, bad = read_jsonl_checked(spark, jsonl_path, schema)
    n_good, n_bad = good.count(), bad.count()
    good.write.mode("overwrite").parquet(out_dir)
    n_written = spark.read.parquet(out_dir).count()
    if n_written != n_good:
        raise ValueError(
            f"ingest reconciliation failed: wrote {n_written} rows but "
            f"parsed {n_good} good rows")
    return {"jsonl_path": jsonl_path, "out_dir": out_dir,
            "n_good": n_good, "n_bad": n_bad,
            "n_written": n_written,
            "ok": True}
