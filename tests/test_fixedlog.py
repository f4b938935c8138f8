"""Cross-engine bit-equality for the fixed-op ln/exp (fixedlog.py).

This is the enforcement layer of the round-9 libm-free freeze: the
Python lambdas and the SQL templates in fixedlog's step tables must
execute the IDENTICAL IEEE-double op sequence, so CPython, DuckDB and
Spark produce the same 64 bits for every argument.  Any drift between
the paired columns of a step table fails these sweeps immediately.

Domains swept = the oracles' actual argument classes:
* integer counts (LM count-of-counts, DSIR llr, PMI)   -> 1..200k + big
* u = (bucket+0.5)/10000 and nested -ln(-ln(u))        -> Gumbel noise
* (n_docs - df + 0.5)/(df + 0.5) + 1 ratios            -> BM25 idf
* exp over [-40, 40] and exp(0.7*ln(n))                -> temperature^T
"""
from __future__ import annotations

import math
import struct

import duckdb
import pytest

from olap_xtrctr_spark.operators.fixedlog import (
    fxexp, fxln, fxln_micro, ladder_sql, micro, round_half_away)


def bits(x: float) -> bytes:
    return struct.pack("<d", x)


# ---------------------------------------------------------------- python


def test_fxln_accuracy_vs_libm():
    for x in [1, 2, 3, 10, 1000, 123457, 2**52, 0.5, 0.001, 1e-9,
              1.0000001, 2.718281828459045]:
        want = math.log(x)
        got = fxln(float(x))
        assert got == pytest.approx(want, rel=1e-14, abs=1e-15), x
    assert fxln(1.0) == 0.0


def test_fxexp_accuracy_vs_libm():
    for i in range(-430, 431, 7):
        x = i / 10.0
        assert fxexp(x) == pytest.approx(math.exp(x), rel=1e-13), x
    assert fxexp(0.0) == 1.0


def test_domain_errors():
    with pytest.raises(ValueError):
        fxln(0.0)
    with pytest.raises(ValueError):
        fxln(-1.0)
    with pytest.raises(ValueError):
        fxln(2.0 ** 64)
    with pytest.raises(ValueError):
        fxexp(50.0)
    with pytest.raises(ValueError):
        fxexp(-50.0)


def test_round_half_away_matches_duckdb_round():
    con = duckdb.connect()
    cases = [0.0, 0.4999999, 0.5, 1.5, 2.5, 17.499999999, 17.5,
             -0.5, -1.5, -2.5, -17.5, 123456.5, -123456.5,
             0.49999999999999994,    # floor(x+0.5) misrounds this one
             -0.49999999999999994]
    for x in cases:
        want = con.execute(
            "SELECT CAST(ROUND(CAST(? AS DOUBLE)) AS BIGINT)",
            [x]).fetchone()[0]
        assert round_half_away(x) == want, x
    assert round_half_away(0.49999999999999994) == 0
    assert micro(1.2345675) == round_half_away(1.2345675 * 1e6)


# ---------------------------------------------------------------- duckdb


def test_duckdb_ln_bit_equal_integer_sweep():
    con = duckdb.connect()
    sql = ladder_sql(
        "SELECT CAST(range AS BIGINT) AS n FROM range(1, 200001)",
        lns=[("n", "lnv")])
    for n, lnv in con.execute(f"SELECT n, lnv FROM ({sql})").fetchall():
        assert bits(lnv) == bits(fxln(float(n))), n


def test_duckdb_ln_bit_equal_large_and_fractional():
    con = duckdb.connect()
    # pseudo-random large ints (md5-derived, deterministic) + ratios
    sql = ladder_sql(
        "SELECT x, (CAST(x AS DOUBLE) + 0.5e0) / 3.0e0 AS r FROM ("
        "SELECT 1 + TRY_CAST(concat('0x', substr(md5(CAST(range AS "
        "VARCHAR)), 1, 13)) AS BIGINT) AS x FROM range(0, 2000))",
        lns=[("x", "lx"), ("r", "lr")])
    for x, r, lx, lr in con.execute(
            f"SELECT x, r, lx, lr FROM ({sql})").fetchall():
        assert bits(lx) == bits(fxln(float(x))), x
        assert bits(lr) == bits(fxln((x + 0.5) / 3.0)), x


def test_duckdb_gumbel_nested_bit_equal():
    con = duckdb.connect()
    sql = ladder_sql(
        "SELECT CAST(range AS BIGINT) AS b, (CAST(range AS DOUBLE) + "
        "0.5e0) / 10000.0e0 AS u FROM range(0, 10000)",
        lns=[("u", "l1"), ("0.0e0 - l1", "l2")])
    for b, l2 in con.execute(f"SELECT b, l2 FROM ({sql})").fetchall():
        py = fxln(0.0 - fxln((b + 0.5) / 10000.0))
        assert bits(l2) == bits(py), b


def test_duckdb_exp_and_pow_composition_bit_equal():
    con = duckdb.connect()
    sql = ladder_sql(
        "SELECT CAST(range AS BIGINT) AS i, (CAST(range AS DOUBLE) - "
        "4000.0e0) / 100.0e0 AS y FROM range(0, 8000)",
        exps=[("y", "ev")])
    for i, ev in con.execute(f"SELECT i, ev FROM ({sql})").fetchall():
        assert bits(ev) == bits(fxexp((i - 4000.0) / 100.0)), i
    # pow(n, 0.7) = exp(0.7*ln(n)) — the temperature-mix path
    sql2 = ladder_sql(
        "SELECT CAST(range AS BIGINT) AS n FROM range(1, 50001)",
        lns=[("n", "lnn")], exps=[("0.7e0 * lnn", "w")])
    for n, w in con.execute(f"SELECT n, w FROM ({sql2})").fetchall():
        assert bits(w) == bits(fxexp(0.7 * fxln(float(n)))), n


def test_duckdb_micro_freeze_matches_python():
    # the full oracle pattern: CAST(ROUND(lnv * 1e6) AS BIGINT)
    con = duckdb.connect()
    sql = ladder_sql(
        "SELECT CAST(range AS BIGINT) AS n FROM range(1, 100001)",
        lns=[("n", "lnv")])
    rows = con.execute(
        f"SELECT n, CAST(ROUND(lnv * 1e6) AS BIGINT) FROM ({sql})"
    ).fetchall()
    for n, m in rows:
        assert m == fxln_micro(float(n)), n


# ----------------------------------------------------------------- spark


def test_spark_ladder_bit_equal(spark):
    # the exp arg references the ln chain's output — composition
    sql = ladder_sql(
        "SELECT CAST(id AS BIGINT) AS n FROM range(1, 100001)",
        lns=[("n", "lnv")], exps=[("0.7e0 * lnv", "w")])
    rows = spark.sql(f"SELECT n, lnv, w FROM ({sql})").collect()
    assert len(rows) == 100000
    for r in rows:
        assert bits(r["lnv"]) == bits(fxln(float(r["n"]))), r["n"]
        assert bits(r["w"]) == bits(fxexp(0.7 * fxln(float(r["n"])))), \
            r["n"]


def test_spark_gumbel_nested_bit_equal(spark):
    sql = ladder_sql(
        "SELECT CAST(id AS BIGINT) AS b, (CAST(id AS DOUBLE) + 0.5e0) "
        "/ 10000.0e0 AS u FROM range(0, 10000)",
        lns=[("u", "l1"), ("0.0e0 - l1", "l2")])
    for r in spark.sql(f"SELECT b, l2 FROM ({sql})").collect():
        py = fxln(0.0 - fxln((r["b"] + 0.5) / 10000.0))
        assert bits(r["l2"]) == bits(py), r["b"]


def test_spark_micro_freeze_matches_python(spark):
    sql = ladder_sql(
        "SELECT CAST(id AS BIGINT) AS n FROM range(1, 50001)",
        lns=[("n", "lnv")])
    rows = spark.sql(
        f"SELECT n, CAST(ROUND(lnv * 1e6) AS BIGINT) AS m FROM ({sql})"
    ).collect()
    for r in rows:
        assert r["m"] == fxln_micro(float(r["n"])), r["n"]


def test_duckdb_hll_linear_domain_bit_equal():
    """The HLL linear-counting argument domain (1024/V for every
    possible zero-register count V) — the lookup the engine freezes
    must match the oracle ladder bit-for-bit over the WHOLE domain,
    not just the values a given dataset happens to hit."""
    con = duckdb.connect()
    sql = ladder_sql(
        "SELECT CAST(range AS BIGINT) AS v, 1024.0e0 / CAST(range AS "
        "DOUBLE) AS r FROM range(1, 1025)",
        lns=[("r", "lnv")])
    rows = con.execute(
        f"SELECT v, CAST(ROUND(1024.0e0 * lnv) AS BIGINT) FROM ({sql})"
    ).fetchall()
    assert len(rows) == 1024
    for v, want in rows:
        got = round_half_away(1024.0 * fxln(1024.0 / float(v)))
        assert got == want, v


def test_spark_hll_linear_domain_bit_equal(spark):
    sql = ladder_sql(
        "SELECT CAST(id AS BIGINT) AS v, 1024.0e0 / CAST(id AS DOUBLE)"
        " AS r FROM range(1, 1025)",
        lns=[("r", "lnv")])
    rows = spark.sql(
        f"SELECT v, CAST(ROUND(1024.0e0 * lnv) AS BIGINT) AS m "
        f"FROM ({sql})").collect()
    assert len(rows) == 1024
    for r in rows:
        got = round_half_away(1024.0 * fxln(1024.0 / float(r["v"])))
        assert got == r["m"], r["v"]
