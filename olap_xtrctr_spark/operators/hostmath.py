"""Frozen transcendental lookups — now libm-free (round 9).

History: the engine's exactness discipline freezes every float-valued
score to integer micro-units (``ROUND(f(x) * 1e6)``) so a DuckDB
oracle can reproduce results bit-for-bit.  Round 7 moved the engine's
``ln`` off the JVM's ``Math.log`` onto driver-computed CPython values
(this module), on the premise that CPython's libm == DuckDB's libm.
The round-8 driver FALSIFIED that premise: ``docs_ngram_lm_score``
passed the local DuckDB 1.0.0 oracle bit-exactly yet stayed red on
the driver, whose DuckDB build resolves ``ln`` differently in the
last ulp.  Any libm anywhere in the contract is environment-dependent.

Round 9 closes the class: both sides now evaluate ONE fixed sequence
of IEEE-754 double ops (``fixedlog.py``) — the engine through these
driver-built lookups (CPython floats are IEEE doubles; every op in
the sequence is exactly specified), the oracle through the paired SQL
ladder ``fixedlog.ladder_sql`` emits.  No ``ln``/``exp``/``pow`` call
reaches any libm on either side; ``tests/test_hostmath.py`` lints all
oracle SQL for transcendentals, ``tests/test_fixedlog.py`` sweeps
CPython vs DuckDB vs Spark for bit-equality.

Rounding: SQL ``ROUND(x)`` (Spark HALF_UP, DuckDB std::round) is
half-away-from-zero ON THE EXACT BINARY VALUE; ``fixedlog.micro``
mirrors it via ``Decimal`` (exact double conversion), not
``floor(x+0.5)`` (which misrounds 0.49999999999999994 — ADVICE r8).
"""
from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

from .fixedlog import fxln, fxln_micro, micro, round_half_away

__all__ = ["fxln", "fxln_micro", "ln_micro", "lookup_df", "micro",
           "round_half_away"]

# Back-compat alias: every pre-round-9 call site freezes via ln_micro.
ln_micro = fxln_micro


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
