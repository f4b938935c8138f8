"""Quick local smoke: flagship query vs DuckDB oracle at sf0.001."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from olap_xtrctr_spark import (AxisItem, CubeQueryEngine, QueryRequest,
                               default_registry, get_spark)

SF = "/root/testdata/sf0.001"

spark = get_spark("smoke")
eng = CubeQueryEngine(spark, default_registry(), SF)

req = QueryRequest(
    catalog="VENTAS_2025",
    measures=["Sum Extendedprice", "Total Registros"],
    rows=[AxisItem("Dim Customer", "Geografía", level="Nation")],
)
df = eng.execute(req)
df.show(30, truncate=False)
df.explain("formatted")

got = {(r["nation"], round(r["sum_extendedprice"], 2), r["total_registros"])
       for r in df.collect()}

con = duckdb.connect()
for t in ["lineitem", "orders", "customer", "nation", "region"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
exp = {(n, round(s, 2), c) for n, s, c in con.execute("""
    SELECT n_name, SUM(l_extendedprice), COUNT(*)
    FROM lineitem JOIN orders ON l_orderkey=o_orderkey
    JOIN customer ON o_custkey=c_custkey
    JOIN nation ON c_nationkey=n_nationkey
    GROUP BY n_name
""").fetchall()}

assert got == exp, f"MISMATCH\nonly spark: {got - exp}\nonly duck: {exp - got}"
print(f"OK: {len(got)} rows match duckdb oracle")
