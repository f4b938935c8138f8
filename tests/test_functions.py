"""SQL-callable scalar functions: same semantics as the operator
pipeline (bodies generated from the operators' own pattern constants),
inlined as Catalyst expressions."""
from olap_xtrctr_spark.functions import register_sql_functions
from olap_xtrctr_spark.operators import text as TX
from olap_xtrctr_spark.session import load_table


def test_sql_functions_match_operators(spark, sf_dir):
    names = register_sql_functions(spark)
    assert names == ["doc_fingerprint", "redact_pii", "token_count_bpe",
                     "token_count_ws", "ttr_milli"]
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("fn_docs")
    got = {r["doc_id"]: (r["fp"], r["ws"], r["bpe"]) for r in spark.sql(
        "SELECT doc_id, doc_fingerprint(text) fp, "
        "token_count_ws(text) ws, token_count_bpe(text) bpe "
        "FROM fn_docs").collect()}
    fp = {r["doc_id"]: r["fingerprint"]
          for r in TX.fingerprint(docs).collect()}
    tc = {r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_bpe"])
          for r in TX.token_count_bpe(docs).collect()}
    assert all(got[d] == (fp[d], *tc[d]) for d in got)


def test_sql_redact_and_ttr(spark):
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT redact_pii('mail a@b.com, call +1 555-123-4567, "
        "host 10.0.0.1') AS red, ttr_milli('a a a b') AS ttr, "
        "ttr_milli('') AS empty").first()
    assert row["red"] == "mail [EMAIL], call [PHONE], host [IPV4]"
    assert row["ttr"] == 500
    assert row["empty"] == 0          # greatest(...,1) guards DIV 0


def test_sql_functions_inline_no_python(spark, sf_dir):
    """SQL scalar functions must inline into codegen — no Python eval
    node may appear (that is the point of this surface vs a registered
    Python UDF)."""
    register_sql_functions(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "fn_docs_plan")
    plan = spark.sql(
        "SELECT doc_fingerprint(text) FROM fn_docs_plan") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "md5" in plan              # inlined expression visible
