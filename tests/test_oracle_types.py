"""Oracle output-TYPE discipline (the round-8/9 driver-red class).

``docs_ngram_lm_score`` + ``docs_ccnet_buckets`` were driver-red for
three consecutive rounds with the signature rows-match / schema-match /
hash-MISMATCH.  Rounds 8-9 chased libm; the round-9 judge's DESCRIBE
audit found the real cause: exactly those two oracles — and no others
of 244 — emitted **HUGEINT** output columns (DuckDB types
``SUM(BIGINT)`` and integer ``//`` as HUGEINT).  The local replica
compares via ``fetchall()`` → Python ints → ``str`` and is structurally
blind to HUGEINT-vs-BIGINT; a pandas/Arrow-fetching harness (the
driver) renders HUGEINT differently (float64 ``…​.0`` formatting) and
hash-mismatches.

Invariant pinned here: **no oracle may emit a HUGEINT, UHUGEINT, or
DECIMAL output column.**  Intermediate wide arithmetic is fine
(the sketch family multiplies DECIMAL(38,0) internally); the FINAL
select list must land on the narrow engine-portable types only.
Bare decimal literals (``0.5`` is DECIMAL(2,1) in DuckDB) are caught
too — use e-notation (``5e-1``) or ``fixedlog._d``.

Triage rule this encodes (VERDICT r9): a driver row that is
rows-match/hash-mismatch means *check oracle output types first*,
not numerics.
"""
from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from olap_xtrctr_spark.session import TABLES

SF = "/root/testdata/sf0.001"

_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def test_no_wide_output_types(oracle_con):
    """DESCRIBE every oracle; fail on HUGEINT/UHUGEINT/DECIMAL outputs.

    DESCRIBE binds and types the query without executing it, so this
    sweeps all ~250 oracles in seconds.
    """
    offenders = []
    described = 0
    for name, sql in entry.oracle_sql().items():
        rows = oracle_con.execute("DESCRIBE " + sql).fetchall()
        described += 1
        for col, typ, *_ in rows:
            if any(w in typ.upper() for w in _FORBIDDEN):
                offenders.append((name, col, typ))
    assert described > 200, "oracle inventory shrank unexpectedly"
    assert not offenders, (
        "oracle output columns with engine-divergent rendering types "
        "(CAST them to BIGINT/DOUBLE in the final select): "
        f"{offenders}")


def test_lm_pair_casts_present():
    """The two round-8/9 red entries keep their explicit BIGINT casts."""
    oracles = entry.oracle_sql()
    for name in ("docs_ngram_lm_score", "docs_ccnet_buckets"):
        sql = oracles[name].upper()
        assert "AS BIGINT" in sql, f"{name} lost its BIGINT output cast"
