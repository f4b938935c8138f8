"""Normalized metadata snapshot: the reference's 5-table Postgres schema
(catalogs / dimensions / hierarchies / levels / members,
database/migrations/001_initial_schema.sql:13-88) and its denormalized
``v_members_full`` view (001_initial_schema.sql:95-116), rebuilt as
DataFrame ops.

Surrogate keys: the reference uses Postgres SERIAL ids assigned at load
time (001_initial_schema.sql:14,26,40,54,70).  A sequence is a
single-writer bottleneck at scale, so here every surrogate id is a
deterministic ``xxhash64`` of the row's natural-key path — stable
across runs, computable in parallel on every executor, and joinable
without coordination.

The reconstruction join (J1, SURVEY §2.8) is a chain of broadcast hash
joins: every table except ``members`` is tiny metadata.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAT = ["CATALOGO"]
_DIM = _CAT + ["DIMENSION"]
_HIER = _DIM + ["JERARQUIA"]
_LVL = _HIER + ["NIVEL_NOMBRE"]


def normalize_members(members: DataFrame) -> dict[str, DataFrame]:
    """Split the denormalized members cache into the reference's
    normalized 5-table schema.  ``dropDuplicates`` per entity plays the
    role of the loader's ``ON CONFLICT`` upsert
    (migrate_csv_to_db.py:102-163); each table carries its surrogate id,
    its parent's id, and only its own attributes."""
    catalogs = (members
                .select(F.xxhash64(*_CAT).alias("catalog_id"),
                        F.col("CATALOGO").alias("code"))
                .dropDuplicates())
    dimensions = (members
                  .select(F.xxhash64(*_DIM).alias("dimension_id"),
                          F.xxhash64(*_CAT).alias("catalog_id"),
                          F.col("DIMENSION").alias("dimension_name"))
                  .dropDuplicates())
    hierarchies = (members
                   .select(F.xxhash64(*_HIER).alias("hierarchy_id"),
                           F.xxhash64(*_DIM).alias("dimension_id"),
                           F.col("JERARQUIA").alias("hierarchy_name"))
                   .dropDuplicates())
    levels = (members
              .select(F.xxhash64(*_LVL).alias("level_id"),
                      F.xxhash64(*_HIER).alias("hierarchy_id"),
                      F.col("NIVEL_NOMBRE").alias("level_name"),
                      F.col("NIVEL_NUMERO").alias("level_number"))
              .dropDuplicates())
    member_rows = members.select(
        F.xxhash64(*_LVL).alias("level_id"),
        F.col("MIEMBRO_CAPTION").alias("member_caption"),
        F.col("MIEMBRO_UNIQUE_NAME").alias("member_unique_name"),
        F.col("PARENT_UNIQUE_NAME").alias("parent_unique_name"),
        F.col("CHILDREN_CARDINALITY").alias("children_cardinality"),
        F.col("MIEMBRO_ORDINAL").alias("member_ordinal"),
        F.col("MIEMBRO_KEY").alias("member_key"),
    )
    return {
        "catalogs": catalogs,
        "dimensions": dimensions,
        "hierarchies": hierarchies,
        "levels": levels,
        "members": member_rows,
    }


def v_members_full(tables: dict[str, DataFrame]) -> DataFrame:
    """members ⋈ levels ⋈ hierarchies ⋈ dimensions ⋈ catalogs — the
    denormalized navigation view (001_initial_schema.sql:95-116).
    Everything except ``members`` is broadcast."""
    return (
        tables["members"]
        .join(F.broadcast(tables["levels"]), "level_id")
        .join(F.broadcast(tables["hierarchies"]), "hierarchy_id")
        .join(F.broadcast(tables["dimensions"]), "dimension_id")
        .join(F.broadcast(tables["catalogs"]), "catalog_id")
        .select(
            F.col("code").alias("catalog_code"),
            "dimension_name", "hierarchy_name", "level_name", "level_number",
            "member_caption", "member_unique_name", "parent_unique_name",
            "children_cardinality",
        )
    )
