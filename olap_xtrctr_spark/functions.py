"""SQL-callable scalar functions: the engine's core text metrics
exposed to ``spark.sql`` users as SQL UDFs (CREATE TEMPORARY FUNCTION
... RETURN <expr>).

The reference has no user-defined-function surface (SURVEY §2.10) —
this is an engine extension: an analyst writing plain SQL against the
documents table gets the SAME fingerprint / token-count / PII
semantics as the operator pipeline, because each body is generated
from the operator module's own pattern constants (one source of
truth, no drift).  SQL scalar functions inline into the plan as
ordinary Catalyst expressions — whole-stage codegen, no Python, no
serialization boundary — unlike registered Python UDFs.
"""
from __future__ import annotations

from pyspark.sql import SparkSession

from .operators.text import BPE_SPLIT_PATTERN, PII_PATTERNS


def _sql_str(s: str) -> str:
    """Python string → Spark SQL single-quoted literal (backslashes are
    escape characters in Spark SQL literals)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def _redact_expr(col: str) -> str:
    expr = col
    for name, pat in PII_PATTERNS:
        expr = (f"regexp_replace({expr}, {_sql_str(pat)}, "
                f"'[{name.upper()}]')")
    return expr


def sql_function_defs() -> dict[str, str]:
    """name → CREATE-function DDL (temporary, session-scoped)."""
    bpe = _sql_str(BPE_SPLIT_PATTERN)
    ws = _sql_str(r"\s+")
    skel = _sql_str("[^a-z0-9]")
    return {
        # operators/text.fingerprint
        "doc_fingerprint": f"""
            CREATE OR REPLACE TEMPORARY FUNCTION doc_fingerprint(t STRING)
            RETURNS STRING
            RETURN md5(encode(regexp_replace(lower(t), {skel}, ''),
                              'UTF-8'))""",
        # operators/text.token_count_bpe (whitespace count)
        "token_count_ws": f"""
            CREATE OR REPLACE TEMPORARY FUNCTION token_count_ws(t STRING)
            RETURNS BIGINT
            RETURN CAST(size(split(trim(t), {ws})) AS BIGINT)""",
        # operators/text.token_count_bpe (BPE-ish count)
        "token_count_bpe": f"""
            CREATE OR REPLACE TEMPORARY FUNCTION token_count_bpe(t STRING)
            RETURNS BIGINT
            RETURN CAST(regexp_count(t, {bpe}) AS BIGINT)""",
        # operators/text.redact_pii (redaction only; counts are the
        # operator's job)
        "redact_pii": f"""
            CREATE OR REPLACE TEMPORARY FUNCTION redact_pii(t STRING)
            RETURNS STRING
            RETURN {_redact_expr('t')}""",
        # per-document type-token ratio in the same integer milli-units
        # as operators/text.lexical_diversity's per-group form
        "ttr_milli": f"""
            CREATE OR REPLACE TEMPORARY FUNCTION ttr_milli(t STRING)
            RETURNS BIGINT
            RETURN CAST((size(array_distinct(filter(
                           split(trim(lower(t)), {ws}), x -> x <> '')))
                         * 1000)
                        DIV greatest(size(filter(
                           split(trim(lower(t)), {ws}), x -> x <> '')), 1)
                        AS BIGINT)""",
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every function; returns the registered names."""
    defs = sql_function_defs()
    for ddl in defs.values():
        spark.sql(ddl)
    return sorted(defs)
