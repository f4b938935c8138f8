"""Frozen-transcendental discipline (operators/hostmath.py +
operators/fixedlog.py).

History of the bug class this file pins shut:

* round 7: Spark's JVM ``Math.log`` vs DuckDB's libm — last-ulp
  disagreement flips ``ROUND(ln(x)*1e6)`` near .5 boundaries
  (docs_ngram_lm_score red).  Fix: freeze ln on the driver (CPython).
* round 8: the driver's DuckDB build resolves ``ln`` differently from
  the LOCAL DuckDB — the "CPython libm == DuckDB libm" premise holds
  on this box and FAILS on the driver host (same entry red again,
  local-green).  Conclusion: ANY libm call in an oracle is
  environment-dependent.
* round 9: both sides evaluate one fixed IEEE-double op sequence
  (``fixedlog.py``); no oracle may call a transcendental AT ALL.

The lint here enforces the round-9 invariant outright — there is no
allowlist anymore, because round 8 proved an allowlisted oracle can
still diverge.  ``pow``/``power`` are allowed only in the
measured-exact forms that have passed the driver since round 5
(integer powers of 2/16 whose results are exact doubles, and
``pow(x, 2.0)`` which every engine computes as x*x).
"""
from __future__ import annotations

import pathlib
import re

import duckdb
import pytest

from olap_xtrctr_spark.operators.hostmath import (
    fxln, ln_micro, lookup_df, micro, round_half_away)

REPO = pathlib.Path(__file__).resolve().parent.parent

_TRANSCENDENTAL = re.compile(r"\b(ln|log|log10|log2|exp)\s*\(",
                             re.IGNORECASE)
# pow/power forms measured exact across engines (exact power-of-two /
# square results; driver-green since r5): power(16, 15), power(2, k),
# POWER(x, 2.0).  Anything else (fractional exponents!) must go
# through the fixedlog ladder like docs_temperature_mix_rates does.
_POW_ANY = re.compile(r"\b(pow|power)\s*\(", re.IGNORECASE)
_POW_OK = re.compile(
    r"\b(?:pow|power)\s*\(\s*(?:16\s*,\s*15|2\s*,|[a-z_0-9.]+\s*,\s*2\.0)",
    re.IGNORECASE)


def test_round_half_away_matches_sql_round():
    con = duckdb.connect()
    cases = [0.0, 0.4999999, 0.5, 1.5, 2.5, 17.499999999, 17.5,
             -0.5, -1.5, -2.5, -17.5, 123456.5, -123456.5,
             0.49999999999999994, -0.49999999999999994]
    for x in cases:
        want = con.execute(
            "SELECT CAST(ROUND(CAST(? AS DOUBLE)) AS BIGINT)",
            [x]).fetchone()[0]
        assert round_half_away(x) == want, x
    assert micro(1.2345675) == round_half_away(1.2345675 * 1e6)


def test_ln_micro_is_fixedlog_backed():
    # hostmath's ln_micro must be the fixed-op ln, not any libm
    from olap_xtrctr_spark.operators.fixedlog import fxln_micro
    assert ln_micro is fxln_micro
    for k in (1, 2, 3, 17, 123456, 2**40):
        assert ln_micro(float(k)) == micro(fxln(float(k)))


def test_lm_model_argument_set_agrees_with_duckdb_ladder(spark, sf_dir):
    # the LM model's actual ln arguments at sf0.001: distinct c12+1,
    # distinct c1+v, and v — the frozen lookups must equal what the
    # oracle's fixed-op ladder produces on DuckDB for those args.
    from olap_xtrctr_spark.operators.fixedlog import ladder_sql
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    lad = ladder_sql(
        r"""WITH tok AS (
          SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents WHERE source = 'src0'),
        uni AS (SELECT unnest(t) AS w FROM tok),
        big AS (
          SELECT unnest(list_transform(list_zip(t[1:len(t) - 1], t[2:]),
                                       p -> p[1] || ' ' || p[2])) AS bg
          FROM tok),
        v AS (SELECT COUNT(DISTINCT w) AS v FROM uni),
        c1 AS (SELECT COUNT(*) AS c FROM uni GROUP BY w),
        c12 AS (SELECT COUNT(*) AS c FROM big GROUP BY bg),
        args AS (
          SELECT DISTINCT arg FROM (
            SELECT c1.c + v.v AS arg FROM c1, v
            UNION ALL SELECT c + 1 FROM c12
            UNION ALL SELECT v FROM v))
        SELECT arg FROM args""",
        lns=[("arg", "lnv")])
    rows = con.execute(
        f"SELECT arg, CAST(ROUND(lnv * 1e6) AS BIGINT) FROM ({lad})"
    ).fetchall()
    assert len(rows) > 10
    for a, want in rows:
        assert ln_micro(float(a)) == want, a


def test_lookup_df_schema_and_broadcastability(spark):
    lut = lookup_df(spark, [(3, ln_micro(3.0)), (7, ln_micro(7.0))],
                    "k", "v_micro")
    assert [f.name for f in lut.schema.fields] == ["k", "v_micro"]
    assert dict((r.k, r.v_micro) for r in lut.collect()) == {
        3: ln_micro(3.0), 7: ln_micro(7.0)}


def test_no_transcendental_in_any_oracle():
    # THE round-9 lint: no oracle SQL may call ln/log/exp — period.
    # Round 8 proved an allowlisted libm oracle still diverges across
    # DuckDB builds; the fixedlog ladder is the only sanctioned path.
    import __spark_entry__ as entry
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        m = _TRANSCENDENTAL.search(sql)
        if m:
            offenders[name] = m.group(0)
    assert not offenders, (
        f"oracles call libm transcendentals — use the fixedlog ladder "
        f"(operators/fixedlog.py): {offenders}")


def test_pow_in_oracles_only_measured_exact_forms():
    import __spark_entry__ as entry
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        for m in _POW_ANY.finditer(sql):
            frag = sql[m.start():m.start() + 40]
            if not _POW_OK.match(frag):
                offenders[name] = frag
    assert not offenders, (
        f"oracles call pow/power outside the measured-exact forms "
        f"(16^15, 2^k, x^2.0) — fractional exponents must use the "
        f"fixedlog exp∘ln ladder: {offenders}")


def test_no_jvm_log_in_engine_source():
    # the JVM's Math.log must never touch a frozen value: no operator /
    # workload / streaming module may call F.log / F.exp / math.log.
    pat = re.compile(
        r"\bF\.(log|log1p|log2|log10|exp|expm1)\s*\(|\bmath\.(log|exp"
        r"|log2|log10|pow)\s*\(")
    hits = []
    for p in (REPO / "olap_xtrctr_spark").rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if pat.search(line):
                hits.append(f"{p.relative_to(REPO)}:{i}")
    assert not hits, f"libm/JVM transcendentals in engine source: {hits}"


def test_ngram_lm_empty_reference_raises(spark):
    from pyspark.sql import functions as F
    from olap_xtrctr_spark.operators.text import ngram_lm_score
    docs = spark.createDataFrame(
        [("d1", "hello world", "src1")], "doc_id string, text string, "
        "source string")
    with pytest.raises(ValueError, match="reference slice"):
        ngram_lm_score(docs, reference_cond=F.col("source") == "src0")
