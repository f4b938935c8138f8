"""Plan-shape regression guards: the physical plans that make the engine
scale must not silently degrade (broadcasts, pushdown, pruning)."""
import re

from pyspark.sql import functions as F

from olap_xtrctr_spark import (AxisItem, CubeQueryEngine, QueryRequest,
                               default_registry)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_joins_broadcast_and_prune(spark, sf_dir):
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    df = eng.execute(QueryRequest(
        "VENTAS_2025", measures=["Sum Extendedprice"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Nation")]))
    plan = _plan(df)
    # all equi-joins of this query broadcast at test scale (AQE or hint)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # column pruning reached the fact scan: lineitem has 11 columns, the
    # query needs 2 (+ join key)
    scan = next(l for l in plan.splitlines()
                if "Scan parquet" in l and "lineitem" in l)
    read_cols = re.search(r"FileScan parquet \[([^\]]*)\]", scan)
    assert read_cols and len(read_cols.group(1).split(",")) <= 3


def test_member_filter_pushdown_reaches_scan(spark, sf_dir):
    """A member-literal axis filter must appear as a pushed filter on the
    dimension-view scan, not as a post-join Filter only."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    df = eng.execute(QueryRequest(
        "VENTAS_2025", measures=["Sum Quantity"],
        rows=[AxisItem("Dim Customer", "Geografía", members=[
            "[Dim Customer].[Geografía].[Region].&[0]"])]))
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(r_regionkey,0\)", plan)


def test_aggregation_is_partial_before_exchange(spark, sf_dir):
    """Map-side combine: a partial HashAggregate sits below the Exchange."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    df = eng.execute(QueryRequest(
        "VENTAS_2025", measures=["Total Registros"],
        rows=[AxisItem("Dim Orders", "Estado", level="Estado")]))
    plan = _plan(df)
    assert "partial_count" in plan


def test_docs_ops_stay_jvm_side(spark, sf_dir):
    """Text operators must not fall back to python UDF evaluation."""
    from olap_xtrctr_spark.operators import text as TX
    from olap_xtrctr_spark.session import load_table
    docs = load_table(spark, sf_dir, "documents")
    for op in (TX.token_stats, TX.quality_score, TX.lang_id, TX.fingerprint):
        plan = _plan(op(docs))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
