"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship cube query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 and
the beyond-reference extensions; ``oracle_sql()`` gives the DuckDB
equivalent for each (omitted only for hash-seeded operators whose
outputs are engine-specific by construction).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from olap_xtrctr_spark.query import AxisItem, CubeQueryEngine, QueryRequest
from olap_xtrctr_spark.cube import default_registry
from olap_xtrctr_spark.workload import WORKLOAD


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    eng = CubeQueryEngine(spark, default_registry(), "/root/testdata/sf0.001")
    return eng.execute(QueryRequest(
        "VENTAS_2025",
        measures=["Sum Extendedprice", "Total Registros", "Sum Quantity"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Nation")],
    ))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in WORKLOAD.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in WORKLOAD.items()
            if spec.sql is not None}
