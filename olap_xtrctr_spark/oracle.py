"""DuckDB oracle SQL generation.

The driver's correctness gate runs each ``queries()`` entry on Spark AND
the matching ``oracle_sql()`` string on DuckDB over the same parquet
views, then hash-compares values.  This module generates the SQL halves
*from the same CubeDef* the Spark side executes, so the two stay in
structural sync by construction (same view joins, same unique-name
concatenation, same captions/keys).
"""
from __future__ import annotations

from .cube import MONTHS_ES, CubeDef, Dimension, Hierarchy

# ---- star-schema view SQL (mirrors cube.py view builders) -----------------

_MES_CASE = "CASE month(l_shipdate) " + " ".join(
    f"WHEN {i+1} THEN '{m}'" for i, m in enumerate(MONTHS_ES)) + " END"

VIEW_SQL: dict[str, str] = {
    "orders_wide": """
        SELECT o_orderkey,
               r_name  AS cust_region,   r_regionkey AS cust_region_key,
               n_name  AS cust_nation,   n_nationkey AS cust_nation_key,
               c_name  AS cust_customer, c_custkey   AS cust_customer_key,
               c_mktsegment AS cust_segment,
               o_orderstatus AS order_estado,
               o_orderpriority AS order_prioridad
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
    """,
    "supplier_geo": """
        SELECT s_suppkey,
               r_name AS supp_region,   r_regionkey AS supp_region_key,
               n_name AS supp_nation,   n_nationkey AS supp_nation_key,
               s_name AS supp_supplier, s_suppkey   AS supp_supplier_key
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "part_view": """
        SELECT p_partkey,
               p_brand   AS prod_brand,
               p_type    AS prod_tipo,
               p_name    AS prod_part,
               p_partkey AS prod_part_key
        FROM part
    """,
    "customer_geo": """
        SELECT r_name AS cust_region,   r_regionkey AS cust_region_key,
               n_name AS cust_nation,   n_nationkey AS cust_nation_key,
               c_name AS cust_customer, c_custkey   AS cust_customer_key,
               c_mktsegment AS cust_segment
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "orders_dim": """
        SELECT o_orderstatus AS order_estado,
               o_orderpriority AS order_prioridad
        FROM orders
    """,
    "time_view": f"""
        SELECT CAST(year(l_shipdate) AS INTEGER)  AS anio,
               CAST(month(l_shipdate) AS INTEGER) AS mes_num,
               {_MES_CASE} AS mes
        FROM lineitem
    """,
}

# The fact joined to every view it needs (mirrors the engine's fact+view join)
FACT_JOINED_SQL = """
    lineitem
    JOIN ({orders_wide}) ow ON l_orderkey = ow.o_orderkey
""".strip()


def view_cte(*names: str) -> str:
    """WITH-clause text defining the requested views."""
    parts = [f"{n} AS ({VIEW_SQL[n]})" for n in names]
    return ", ".join(parts)


def _src_view(dim: Dimension) -> str:
    view = dim.members_view or dim.view
    return view if view is not None else "time_view"


def _uname_sql(dim: Dimension, hier: Hierarchy, depth: int) -> str:
    base = f"'[{dim.name}].[{hier.name}].[{hier.levels[0].name}]'"
    pieces = [base]
    for i in range(depth):
        pieces.append(f"'.&[' || CAST(_k{i+1} AS VARCHAR) || ']'")
    return " || ".join(pieces)


def _level_members_sql(cube: CubeDef, dim: Dimension, hier: Hierarchy,
                       depth: int) -> str:
    levels = hier.levels[:depth]
    lv = levels[-1]
    view = _src_view(dim)

    inner_cols = [f"{l.key_col} AS _k{i+1}" for i, l in enumerate(levels)]
    inner_cols.append(f"{lv.caption_col} AS MIEMBRO_CAPTION")
    if lv.ordinal_col is not None:
        inner_cols.append(f"{lv.ordinal_col} AS _ord")
    inner = f"SELECT DISTINCT {', '.join(inner_cols)} FROM {view}"

    uname = _uname_sql(dim, hier, depth)
    parent = (_uname_sql(dim, hier, depth - 1).replace("_k", "b._k")
              if depth >= 2 else "CAST(NULL AS VARCHAR)")
    uname = uname.replace("_k", "b._k")
    ordinal = ("CAST(b._ord AS INTEGER)" if lv.ordinal_col is not None
               else "CAST(NULL AS INTEGER)")

    if depth < len(hier.levels):
        child = hier.levels[depth]
        group_cols = [f"{l.key_col} AS _c{i+1}" for i, l in enumerate(levels)]
        counts = (f"SELECT {', '.join(group_cols)}, "
                  f"COUNT(DISTINCT {child.key_col}) AS _cc FROM {view} "
                  f"GROUP BY {', '.join(l.key_col for l in levels)}")
        join_on = " AND ".join(f"b._k{i+1} = c._c{i+1}" for i in range(depth))
        from_clause = f"({inner}) b LEFT JOIN ({counts}) c ON {join_on}"
        children = "CAST(c._cc AS BIGINT)"
    else:
        from_clause = f"({inner}) b"
        children = "CAST(0 AS BIGINT)"

    return f"""
        SELECT
          '{cube.catalog}' AS CATALOGO,
          '{dim.name}' AS DIMENSION,
          '{dim.name}.{hier.name}' AS JERARQUIA,
          '{lv.name}' AS NIVEL_NOMBRE,
          CAST({depth} AS INTEGER) AS NIVEL_NUMERO,
          CAST(b.MIEMBRO_CAPTION AS VARCHAR) AS MIEMBRO_CAPTION,
          {uname} AS MIEMBRO_UNIQUE_NAME,
          {parent} AS PARENT_UNIQUE_NAME,
          {children} AS CHILDREN_CARDINALITY,
          {ordinal} AS MIEMBRO_ORDINAL,
          CAST(b._k{depth} AS VARCHAR) AS MIEMBRO_KEY
        FROM {from_clause}
    """


def members_sql(cube: CubeDef) -> str:
    """One SELECT producing exactly the rows of metadata.members_df(cube)."""
    selects = []
    for dim in cube.dimensions.values():
        for hier in dim.hierarchies.values():
            for depth in range(1, len(hier.levels) + 1):
                selects.append(_level_members_sql(cube, dim, hier, depth))
    return "\nUNION ALL\n".join(selects)


def members_cte(cube: CubeDef) -> str:
    """WITH clause defining the views + a ``members`` relation, ready to
    prefix any member-navigation oracle query."""
    views = view_cte("orders_wide", "supplier_geo", "part_view", "time_view",
                     "customer_geo", "orders_dim")
    return f"WITH {views}, members AS ({members_sql(cube)})"
