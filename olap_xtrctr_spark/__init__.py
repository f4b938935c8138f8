"""olap_xtrctr_spark — a PySpark-native OLAP engine with the query and
data-processing capabilities of the reference client stack, re-expressed
Spark-first (DataFrame/SQL + Catalyst), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing, streaming)."""

from .cube import CubeDef, CubeRegistry, default_registry, sales_cube
from .functions import register_sql_functions
from .query import AxisItem, CubeQueryEngine, FilterSpec, QueryRequest
from .session import get_spark, load_star, load_table, register_views

__all__ = [
    "CubeDef", "CubeRegistry", "default_registry", "sales_cube",
    "AxisItem", "CubeQueryEngine", "FilterSpec", "QueryRequest",
    "get_spark", "load_star", "load_table", "register_views",
    "register_sql_functions",
]

__version__ = "0.1.0"
