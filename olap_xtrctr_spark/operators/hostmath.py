"""Host-libm frozen transcendental lookups.

Why this module exists: the engine's exactness discipline freezes every
float-valued score to integer micro-units (``ROUND(f(x) * 1e6)``) so a
DuckDB oracle can reproduce results bit-for-bit.  That freeze is sound
for md5-derived integers (exact on both engines) but NOT for ``ln``:
Spark evaluates ``ln`` with the JVM's ``Math.log`` while DuckDB calls
the host libm, and the two disagree in the last ulp for ~1% of integer
arguments (measured: 18 532 bitwise mismatches over the first 2M ints
on this box).  Whenever the true value sits within ~1e-10 of a rounding
boundary, that ulp flips ``ROUND`` and the frozen integers diverge —
the exact rows-match/hash-mismatch signature the round-7 driver
recorded for ``docs_ngram_lm_score``.

The fix: every ``ln`` the engine needs is applied to a BOUNDED set of
driver-visible arguments — distinct integer counts (count-of-counts for
the LM model, ``n_buckets`` rows for DSIR, |terms| rows for BM25, the
10 000-bucket noise domain for Gumbel).  So we compute those values
ONCE on the driver with CPython's ``math.log`` — which links the same
host libm DuckDB links (measured bit-identical over 2M integer args) —
and ship them to executors as broadcast lookup tables / literals.  The
JVM's libm never touches a frozen value, so the freeze is
libm-independent by construction on any driver host.

Rounding: SQL ``ROUND(x)`` (Spark HALF_UP, DuckDB std::round) is
half-away-from-zero; CPython's ``round`` is banker's.  ``micro`` below
implements half-away-from-zero explicitly so the lookup mirrors the SQL
the oracles run.
"""
from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


def round_half_away(x: float) -> int:
    """SQL ROUND(x): round-half-away-from-zero to an int."""
    if x >= 0:
        return int(math.floor(x + 0.5))
    return -int(math.floor(-x + 0.5))


def micro(x: float) -> int:
    """Freeze a float to integer micro-units the way the oracles do:
    ``CAST(ROUND(x * 1e6) AS BIGINT)``."""
    return round_half_away(x * 1e6)


def ln_micro(x: float) -> int:
    """``CAST(ROUND(ln(x) * 1e6) AS BIGINT)`` via the host libm."""
    return micro(math.log(x))


def lookup_df(spark: SparkSession, pairs: Iterable[tuple],
              key_col: str, val_col: str,
              key_type: str = "bigint") -> DataFrame:
    """A (key -> frozen-micro-value) lookup table built on the driver.

    Bounded-metadata discipline: callers pass ONLY driver-scale
    argument sets (distinct count values, bucket domains, term lists —
    thousands of rows at 100 TB, never per-row data) and join the
    result back broadcast-style."""
    rows = [(k, int(v)) for k, v in pairs]
    return spark.createDataFrame(
        rows, schema=f"{key_col} {key_type}, {val_col} bigint")
