"""Host-libm freeze discipline (operators/hostmath.py).

The round-7 driver flagged docs_ngram_lm_score with a
rows-match/hash-mismatch row: Spark's JVM ``Math.log`` and the libm
DuckDB links disagree in the last ulp for ~1% of integer arguments, and
near a ``ROUND(ln(x)*1e6)`` boundary that flips the frozen integer.
These tests pin the fix:

* ``micro``/``round_half_away`` mirror SQL ROUND (half-away-from-zero)
  exactly, including negative halves;
* CPython's ``math.log`` is bit-identical to DuckDB's ``ln`` (both
  call the host libm) over integer ranges and over the LM model's
  actual argument set, so driver-built lookups are engine-portable by
  construction on ANY host;
* a provenance lint: no workload oracle may use ln/log/exp unless its
  Spark side goes through the hostmath lookup pattern (the allowlist
  below), and no operator module may call the JVM-side ``F.log``/
  ``F.exp`` at all.
"""
from __future__ import annotations

import math
import pathlib
import re

import duckdb
import pytest

from olap_xtrctr_spark.operators.hostmath import (
    ln_micro, lookup_df, micro, round_half_away)

REPO = pathlib.Path(__file__).resolve().parent.parent

# Workload entries whose ORACLE legitimately contains ln()/exp():
# every one of them computes the matching Spark-side values via a
# driver-built host-libm lookup (hostmath.py), so the two engines'
# transcendentals come from the same libm.  Adding a new entry whose
# oracle uses ln/log/exp without the lookup pattern fails the lint.
FROZEN_HOSTLIBM_ENTRIES = {
    "docs_ngram_lm_score",      # operators/text.py ngram_lm_score
    "docs_ccnet_buckets",       # ... ccnet_perplexity_buckets (same model)
    "docs_dsir_weights",        # operators/sampling.py dsir_importance_weights
    "docs_dsir_top_docs",       # ... dsir_select_top_k (same llr table)
    "docs_dsir_gumbel_sample",  # ... dsir_gumbel_sample (+ noise lookup)
    "docs_bm25_topk",           # operators/text.py bm25_topk
    "docs_token_pmi_top",       # ... token_pmi_top (per-term ln freeze)
}

_TRANSCENDENTAL = re.compile(r"\b(ln|log|log10|log2|exp)\s*\(",
                             re.IGNORECASE)


def test_round_half_away_matches_sql_round():
    con = duckdb.connect()
    cases = [0.0, 0.4999999, 0.5, 1.5, 2.5, 17.499999999, 17.5,
             -0.5, -1.5, -2.5, -17.5, 123456.5, -123456.5]
    for x in cases:
        want = con.execute(
            "SELECT CAST(ROUND(CAST(? AS DOUBLE)) AS BIGINT)",
            [x]).fetchone()[0]
        assert round_half_away(x) == want, x
    assert micro(1.2345675) == round_half_away(1.2345675 * 1e6)


def test_cpython_ln_bit_identical_to_duckdb_over_integers():
    # the foundation of the whole discipline: CPython's math.log and
    # DuckDB's ln call the same host libm, bit-for-bit.
    con = duckdb.connect()
    rows = con.execute(
        "SELECT k, ln(CAST(k AS DOUBLE)) FROM range(1, 200001) t(k)"
    ).fetchall()
    for k, d in rows:
        assert math.log(k) == d, k


def test_lm_model_argument_set_agrees_with_duckdb(spark, sf_dir):
    # the LM model's actual ln arguments at sf0.001: distinct c12+1,
    # distinct c1+v, and v — frozen values must equal what the oracle's
    # CAST(ROUND(ln(arg)*1e6) AS BIGINT) produces on this host.
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    args = con.execute(r"""
        WITH tok AS (
          SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents WHERE source = 'src0'),
        uni AS (SELECT unnest(t) AS w FROM tok),
        big AS (
          SELECT unnest(list_transform(list_zip(t[1:len(t) - 1], t[2:]),
                                       p -> p[1] || ' ' || p[2])) AS bg
          FROM tok),
        v AS (SELECT COUNT(DISTINCT w) AS v FROM uni),
        c1 AS (SELECT COUNT(*) AS c FROM uni GROUP BY w),
        c12 AS (SELECT COUNT(*) AS c FROM big GROUP BY bg)
        SELECT DISTINCT arg FROM (
          SELECT c1.c + v.v AS arg FROM c1, v
          UNION ALL SELECT c + 1 FROM c12
          UNION ALL SELECT v FROM v)""").fetchall()
    assert len(args) > 10
    for (a,) in args:
        want = con.execute(
            "SELECT CAST(ROUND(ln(CAST(? AS BIGINT)) * 1e6) AS BIGINT)",
            [a]).fetchone()[0]
        assert ln_micro(a) == want, a


def test_lookup_df_schema_and_broadcastability(spark):
    lut = lookup_df(spark, [(3, ln_micro(3)), (7, ln_micro(7))],
                    "k", "v_micro")
    assert [f.name for f in lut.schema.fields] == ["k", "v_micro"]
    assert dict((r.k, r.v_micro) for r in lut.collect()) == {
        3: ln_micro(3), 7: ln_micro(7)}


def test_oracle_transcendental_provenance_lint():
    # any oracle using ln/log/exp must be on the hostmath allowlist —
    # i.e. its Spark side freezes those values with the host libm.
    import __spark_entry__ as entry
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        m = _TRANSCENDENTAL.search(sql)
        if m and name not in FROZEN_HOSTLIBM_ENTRIES:
            offenders[name] = m.group(0)
    assert not offenders, (
        f"oracles use transcendentals without the hostmath lookup "
        f"pattern (see operators/hostmath.py): {offenders}")
    # and the allowlist itself must stay live
    missing = FROZEN_HOSTLIBM_ENTRIES - set(entry.oracle_sql())
    assert not missing, f"stale allowlist entries: {missing}"


def test_no_jvm_log_in_engine_source():
    # the JVM's Math.log must never touch a frozen value: no operator /
    # workload / streaming module may call F.log / F.exp.
    pat = re.compile(r"\bF\.(log|log1p|log2|log10|exp|expm1)\s*\(")
    hits = []
    for p in (REPO / "olap_xtrctr_spark").rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if pat.search(line):
                hits.append(f"{p.relative_to(REPO)}:{i}")
    assert not hits, f"JVM-side transcendentals in engine source: {hits}"


def test_ngram_lm_empty_reference_raises(spark):
    from pyspark.sql import functions as F
    from olap_xtrctr_spark.operators.text import ngram_lm_score
    docs = spark.createDataFrame(
        [("d1", "hello world", "src1")], "doc_id string, text string, "
        "source string")
    with pytest.raises(ValueError, match="reference slice"):
        ngram_lm_score(docs, reference_cond=F.col("source") == "src0")
