"""DMV-equivalent metadata DataFrames derived from the cube registry.

The reference discovers metadata through XMLA DMV rowsets
($system.DBSCHEMA_*/MDSCHEMA_*, scanner/DGIS_SCAN_2_stable.py:256-342)
and caches a members table (CSV contract
scanner/DGIS_SCAN_2_stable.py:491-497).  Here all of it is *derived*
from the registered cubes: static rowsets (catalogs/cubes/dimensions/
hierarchies/levels/measures) come straight from the registry;
``MDSCHEMA_MEMBERS`` / the members cache table is a distributed
``select distinct`` per hierarchy level over the dimension views with
synthesized unique names (SURVEY §1.4 "Member").

Scale: members generation is pure DataFrame ops (distinct + joins for
child counts) — no driver-side loops — so a 1.7M-member catalog
(reference scale, 001_initial_schema.sql:67) or far larger remains
distributed.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import naming
from .cube import CubeDef, CubeRegistry, Dimension, Hierarchy

MEMBER_COLS = [
    "CATALOGO", "DIMENSION", "JERARQUIA", "NIVEL_NOMBRE", "NIVEL_NUMERO",
    "MIEMBRO_CAPTION", "MIEMBRO_UNIQUE_NAME", "PARENT_UNIQUE_NAME",
    "CHILDREN_CARDINALITY", "MIEMBRO_ORDINAL", "MIEMBRO_KEY",
]


def _hier_source(spark: SparkSession, cube: CubeDef, dim: Dimension,
                 sf_dir: str) -> DataFrame:
    if dim.view is None:  # degenerate: derive from the fact table
        return cube.fact(spark, sf_dir)
    return cube.views[dim.view](spark, sf_dir)


def _level_members(cube: CubeDef, dim: Dimension, hier: Hierarchy,
                   src: DataFrame, depth: int) -> DataFrame:
    """Distinct members at 1-based ``depth`` with synthesized unique names."""
    levels = hier.levels[:depth]
    lv = levels[-1]
    key_cols = [F.col(l.key_col) for l in levels]
    sel = [F.col(l.key_col).alias(f"_k{i+1}") for i, l in enumerate(levels)]
    sel.append(F.col(lv.caption_col).alias("MIEMBRO_CAPTION"))
    if lv.ordinal_col is not None:
        sel.append(F.col(lv.ordinal_col).cast("int").alias("MIEMBRO_ORDINAL"))
    distinct = src.select(*sel).distinct()

    uname = naming.encode_col(
        dim.name, hier.name, hier.levels[0].name,
        [F.col(f"_k{i+1}") for i in range(depth)])
    out = distinct.select(
        F.lit(cube.catalog).alias("CATALOGO"),
        F.lit(dim.name).alias("DIMENSION"),
        F.lit(f"{dim.name}.{hier.name}").alias("JERARQUIA"),
        F.lit(lv.name).alias("NIVEL_NOMBRE"),
        F.lit(depth).alias("NIVEL_NUMERO"),
        F.col("MIEMBRO_CAPTION").cast("string").alias("MIEMBRO_CAPTION"),
        uname.alias("MIEMBRO_UNIQUE_NAME"),
        naming.parent_col(uname).alias("PARENT_UNIQUE_NAME"),
        (F.col("MIEMBRO_ORDINAL") if lv.ordinal_col is not None
         else F.lit(None).cast("int")).alias("MIEMBRO_ORDINAL"),
        F.col(f"_k{depth}").cast("string").alias("MIEMBRO_KEY"),
        *[F.col(f"_k{i+1}") for i in range(depth)],
    )

    # CHILDREN_CARDINALITY: distinct next-level keys under this member
    if depth < len(hier.levels):
        child = hier.levels[depth]
        counts = (
            src.groupBy(*[F.col(l.key_col).alias(f"_k{i+1}")
                          for i, l in enumerate(levels)])
               .agg(F.countDistinct(child.key_col).alias("CHILDREN_CARDINALITY"))
        )
        out = out.join(counts, [f"_k{i+1}" for i in range(depth)], "left")
        out = out.withColumn("CHILDREN_CARDINALITY",
                             F.col("CHILDREN_CARDINALITY").cast("long"))
    else:
        out = out.withColumn("CHILDREN_CARDINALITY", F.lit(0).cast("long"))
    return out.select(*MEMBER_COLS)


def _all_member(spark: SparkSession, cube: CubeDef, dim: Dimension,
                hier: Hierarchy, level1_count: int) -> DataFrame:
    """The synthetic 'All' member (NIVEL_NUMERO 0) the reference suppresses
    everywhere (N3, scanner/DGIS_SCAN_2_stable.py:746-747)."""
    row = Row(
        CATALOGO=cube.catalog, DIMENSION=dim.name,
        JERARQUIA=f"{dim.name}.{hier.name}", NIVEL_NOMBRE="(All)",
        NIVEL_NUMERO=0, MIEMBRO_CAPTION="All",
        MIEMBRO_UNIQUE_NAME=f"[{dim.name}].[{hier.name}].[All]",
        PARENT_UNIQUE_NAME=None, CHILDREN_CARDINALITY=level1_count,
        MIEMBRO_ORDINAL=None, MIEMBRO_KEY=None,
    )
    schema = T.StructType([
        T.StructField("CATALOGO", T.StringType()),
        T.StructField("DIMENSION", T.StringType()),
        T.StructField("JERARQUIA", T.StringType()),
        T.StructField("NIVEL_NOMBRE", T.StringType()),
        T.StructField("NIVEL_NUMERO", T.IntegerType()),
        T.StructField("MIEMBRO_CAPTION", T.StringType()),
        T.StructField("MIEMBRO_UNIQUE_NAME", T.StringType()),
        T.StructField("PARENT_UNIQUE_NAME", T.StringType()),
        T.StructField("CHILDREN_CARDINALITY", T.LongType()),
        T.StructField("MIEMBRO_ORDINAL", T.IntegerType()),
        T.StructField("MIEMBRO_KEY", T.StringType()),
    ])
    return spark.createDataFrame([row], schema)


def members_df(spark: SparkSession, cube: CubeDef, sf_dir: str,
               include_all: bool = False) -> DataFrame:
    """The members cache table (reference CSV contract, FIXTURES.md §1).

    ``include_all=False`` by default: the All rows need a separate count
    job per hierarchy, and every reference consumer suppresses them; the
    navigation API adds them only when asked.
    """
    frames: list[DataFrame] = []
    for dim in cube.dimensions.values():
        for hier in dim.hierarchies.values():
            src = _hier_source(spark, cube, dim, sf_dir)
            for depth in range(1, len(hier.levels) + 1):
                frames.append(_level_members(cube, dim, hier, src, depth))
            if include_all:
                n1 = src.select(hier.levels[0].key_col).distinct().count()
                frames.append(_all_member(spark, cube, dim, hier, n1))
    return reduce(DataFrame.unionByName, frames)


# ---- static DMV rowsets (registry-derived) --------------------------------

def catalogs_df(spark: SparkSession, registry: CubeRegistry) -> DataFrame:
    cats = sorted({c.catalog for c in registry._cubes.values()})
    rows = [Row(CATALOG_NAME=c, DESCRIPTION=f"Catalogo {c}") for c in cats]
    return spark.createDataFrame(rows)


def cubes_df(spark: SparkSession, registry: CubeRegistry) -> DataFrame:
    rows = [Row(CATALOG_NAME=c.catalog, CUBE_NAME=c.name)
            for c in registry._cubes.values()]
    return spark.createDataFrame(rows)


def dimensions_df(spark: SparkSession, cube: CubeDef) -> DataFrame:
    rows = [Row(CUBE_NAME=cube.name,
                DIMENSION_NAME=d.name,
                DIMENSION_UNIQUE_NAME=f"[{d.name}]")
            for d in cube.dimensions.values()]
    return spark.createDataFrame(rows)


def hierarchies_df(spark: SparkSession, cube: CubeDef) -> DataFrame:
    rows = [Row(CUBE_NAME=cube.name,
                DIMENSION_UNIQUE_NAME=f"[{d.name}]",
                HIERARCHY_NAME=h.name,
                HIERARCHY_UNIQUE_NAME=f"[{d.name}].[{h.name}]",
                HIERARCHY_CAPTION=h.name,
                HIERARCHY_IS_VISIBLE=True)
            for d in cube.dimensions.values()
            for h in d.hierarchies.values()]
    return spark.createDataFrame(rows)


def levels_df(spark: SparkSession, cube: CubeDef) -> DataFrame:
    rows = [Row(CUBE_NAME=cube.name,
                DIMENSION_UNIQUE_NAME=f"[{d.name}]",
                HIERARCHY_UNIQUE_NAME=f"[{d.name}].[{h.name}]",
                LEVEL_NAME=lv.name,
                LEVEL_UNIQUE_NAME=f"[{d.name}].[{h.name}].[{lv.name}]",
                LEVEL_CAPTION=lv.name,
                LEVEL_NUMBER=i + 1)
            for d in cube.dimensions.values()
            for h in d.hierarchies.values()
            for i, lv in enumerate(h.levels)]
    return spark.createDataFrame(rows)


def measures_df(spark: SparkSession, cube: CubeDef) -> DataFrame:
    rows = [Row(CUBE_NAME=cube.name,
                MEASURE_NAME=m.name,
                MEASURE_UNIQUE_NAME=m.unique_name,
                MEASURE_CAPTION=m.name,
                MEASURE_AGGREGATOR=m.aggregator.upper(),
                MEASURE_IS_VISIBLE=m.visible)
            for m in cube.measures.values()]
    return spark.createDataFrame(rows)


DMV_BUILDERS = {
    "DBSCHEMA_CATALOGS": "catalogs",
    "MDSCHEMA_CUBES": "cubes",
    "MDSCHEMA_DIMENSIONS": "dimensions",
    "MDSCHEMA_HIERARCHIES": "hierarchies",
    "MDSCHEMA_LEVELS": "levels",
    "MDSCHEMA_MEASURES": "measures",
    "MDSCHEMA_MEMBERS": "members",
}


def register_dmv_views(spark: SparkSession, registry: CubeRegistry,
                       cube: CubeDef, sf_dir: str) -> None:
    """Expose the DMV rowsets as temp views named ``system_<ROWSET>`` so the
    DMV SQL front-end (M2-M5) can scan them."""
    catalogs_df(spark, registry).createOrReplaceTempView("system_DBSCHEMA_CATALOGS")
    cubes_df(spark, registry).createOrReplaceTempView("system_MDSCHEMA_CUBES")
    dimensions_df(spark, cube).createOrReplaceTempView("system_MDSCHEMA_DIMENSIONS")
    hierarchies_df(spark, cube).createOrReplaceTempView("system_MDSCHEMA_HIERARCHIES")
    levels_df(spark, cube).createOrReplaceTempView("system_MDSCHEMA_LEVELS")
    measures_df(spark, cube).createOrReplaceTempView("system_MDSCHEMA_MEASURES")
    members_df(spark, cube, sf_dir).createOrReplaceTempView("system_MDSCHEMA_MEMBERS")
