"""TPC-H-style workload entries q1-q22 (first half).

Entry builders moved VERBATIM from the round-6 ``workloads/tpch.py``
(round-7 split, VERDICT r6 task 7); build order inside this module is
unchanged.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..query import AxisItem, QueryRequest
from ..session import load_events as _events
from ..session import load_table
from ..workload_shared import (AVG_D, CATALOG, SUM_D, _FACT_OW, _OW,
                               _eng)



def register(add) -> None:
    # ================= TPC-H-style headline queries =======================

    def tpch_q1(spark, sf):
        li = load_table(spark, sf, "lineitem")
        dec = lambda c: c.cast("decimal(18,4)")
        # Cross-engine exactness: double->decimal casts agree between Spark
        # and DuckDB for SINGLE column values, but NOT for a multi-factor
        # double product (its decimal expansion can land on a .00005
        # boundary where the engines' conversion rules part ways), and
        # decimal DOWNCASTS disagree on exact ties (Spark HALF_UP, DuckDB
        # half-toward-zero).  So: cast each factor to a decimal sized so
        # every product stays inside precision 38 WITHOUT any intermediate
        # rounding — the whole chain is exact decimal arithmetic, identical
        # on both engines.  (12,4)*(6,4) -> (19,8); *(6,4) -> (26,12).
        ext_d = F.col("l_extendedprice").cast("decimal(12,4)")
        disc_f = (F.lit(1.0) - F.col("l_discount")).cast("decimal(6,4)")
        tax_f = (F.lit(1.0) + F.col("l_tax")).cast("decimal(6,4)")
        disc_price = ext_d * disc_f
        charge = disc_price * tax_f
        return (li.filter(F.col("l_shipdate") <= "2000-09-02")
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
                     F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
                     F.sum(disc_price).cast("double").alias("sum_disc_price"),
                     F.sum(charge).cast("double").alias("sum_charge"),
                     (F.sum(dec(F.col("l_quantity"))).cast("double")
                      / F.count("l_quantity")).alias("avg_qty"),
                     (F.sum(dec(F.col("l_discount"))).cast("double")
                      / F.count("l_discount")).alias("avg_disc"),
                     F.count(F.lit(1)).alias("count_order")))

    # DuckDB's decimal->double cast is not correctly rounded at high scale
    # (computed in float, can be 1 ulp off Spark's BigDecimal.doubleValue);
    # the VARCHAR bridge makes it exact-decimal -> correctly-rounded double.
    _DISC_PRICE_D = ("CAST(l_extendedprice AS DECIMAL(12,4))"
                     " * CAST(1.0 - l_discount AS DECIMAL(6,4))")
    _CHARGE_D = f"{_DISC_PRICE_D} * CAST(1.0 + l_tax AS DECIMAL(6,4))"

    add("tpch_q1_pricing_summary", tpch_q1,
        f"""SELECT l_returnflag, l_linestatus,
               {SUM_D('l_quantity')} AS sum_qty,
               {SUM_D('l_extendedprice')} AS sum_base_price,
               CAST(CAST(SUM({_DISC_PRICE_D}) AS VARCHAR) AS DOUBLE)
                   AS sum_disc_price,
               CAST(CAST(SUM({_CHARGE_D}) AS VARCHAR) AS DOUBLE)
                   AS sum_charge,
               {AVG_D('l_quantity')} AS avg_qty,
               {AVG_D('l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus""")

    def tpch_q5(spark, sf):
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders")
        c = load_table(spark, sf, "customer")
        s = load_table(spark, sf, "supplier")
        n = load_table(spark, sf, "nation")
        r = load_table(spark, sf, "region")
        revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
            .cast("decimal(18,4)")
        return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                .join(c, F.col("o_custkey") == F.col("c_custkey"))
                .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
                      & (F.col("c_nationkey") == F.col("s_nationkey")))
                .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
                .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
                .filter((F.col("r_name") == "ASIA")
                        & (F.col("o_orderdate") >= "1996-01-01")
                        & (F.col("o_orderdate") < "1998-01-01"))
                .groupBy(F.col("n_name").alias("nation"))
                .agg(F.sum(revenue).cast("double").alias("revenue")))

    add("tpch_q5_local_supplier", tpch_q5,
        f"""SELECT n_name AS nation,
               {SUM_D('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name""")

    def tpch_q3ish(spark, sf):
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders")
        c = load_table(spark, sf, "customer")
        revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
            .cast("decimal(18,4)")
        return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                .join(c, F.col("o_custkey") == F.col("c_custkey"))
                .filter((F.col("c_mktsegment") == "BUILDING")
                        & (F.col("o_orderdate") < "1998-03-15")
                        & (F.col("l_shipdate") > "1998-03-15"))
                .groupBy("o_orderpriority")
                .agg(F.sum(revenue).cast("double").alias("revenue"),
                     F.count(F.lit(1)).alias("n_lines")))

    add("tpch_q3_shipping_priority", tpch_q3ish,
        f"""SELECT o_orderpriority,
               {SUM_D('l_extendedprice * (1 - l_discount)')} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY o_orderpriority""")

    def tpch_q6(spark, sf):
        li = load_table(spark, sf, "lineitem")
        return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                          & (F.col("l_shipdate") < "1997-01-01")
                          & (F.col("l_discount") >= 0.02)
                          & (F.col("l_discount") <= 0.06)
                          & (F.col("l_quantity") < 24))
                .agg(F.sum((F.col("l_extendedprice") * F.col("l_discount"))
                           .cast("decimal(18,4)"))
                      .cast("double").alias("revenue")))

    add("tpch_q6_forecast_revenue", tpch_q6,
        f"""SELECT {SUM_D('l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 24""")

    def tpch_q12(spark, sf):
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders")
        hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                .filter((F.col("l_shipdate") >= "1997-01-01")
                        & (F.col("l_shipdate") < "1998-01-01"))
                .groupBy("l_returnflag")
                .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
                     F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count")))

    # BIGINT casts: DuckDB SUM(int) yields HUGEINT (-> float64 at the
    # arrow edge) while Spark SUM(int) is bigint; same values, different
    # schema — cast the oracle side down.
    add("tpch_q12_priority_shipping", tpch_q12,
        """SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag""")

    def tpch_q14(spark, sf):
        li = load_table(spark, sf, "lineitem")
        p = load_table(spark, sf, "part")
        rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
            .cast("decimal(18,4)")
        promo = F.when(F.col("p_type") == "PROMO", rev) \
            .otherwise(F.lit(0).cast("decimal(18,4)"))
        return (li.join(p, F.col("l_partkey") == F.col("p_partkey"))
                .filter((F.col("l_shipdate") >= "1997-06-01")
                        & (F.col("l_shipdate") < "1997-07-01"))
                .agg((F.lit(100.0) * F.sum(promo).cast("double")
                      / F.sum(rev).cast("double")).alias("promo_revenue_pct")))

    add("tpch_q14_promo_revenue", tpch_q14,
        f"""SELECT 100.0
               * {SUM_D("CASE WHEN p_type = 'PROMO' "
                        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
               / {SUM_D('l_extendedprice * (1 - l_discount)')}
               AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-06-01'
          AND l_shipdate <  TIMESTAMP '1997-07-01'""")

    def tpch_q4(spark, sf):
        # EXISTS → left_semi join: no row multiplication, the join only
        # probes — at scale this is the cheapest correlated-subquery shape
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders")
        returned = li.filter(F.col("l_returnflag") == "R") \
                     .select("l_orderkey")
        return (o.filter((F.col("o_orderdate") >= "1996-07-01")
                         & (F.col("o_orderdate") < "1996-10-01"))
                 .join(returned, F.col("o_orderkey") == F.col("l_orderkey"),
                       "left_semi")
                 .groupBy("o_orderpriority")
                 .agg(F.count(F.lit(1)).alias("order_count")))

    add("tpch_q4_order_priority", tpch_q4,
        """SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R')
        GROUP BY o_orderpriority""")

    def tpch_q13(spark, sf):
        # left outer join + two-level aggregation (count distribution);
        # customers with zero orders must appear with c_count = 0
        o = load_table(spark, sf, "orders") \
            .filter(F.col("o_orderpriority") != "1-URGENT") \
            .select("o_orderkey", "o_custkey")
        c = load_table(spark, sf, "customer").select("c_custkey")
        per_cust = (c.join(o, F.col("c_custkey") == F.col("o_custkey"),
                           "left")
                    .groupBy("c_custkey")
                    .agg(F.count("o_orderkey").alias("c_count")))
        return (per_cust.groupBy("c_count")
                .agg(F.count(F.lit(1)).alias("custdist")))

    add("tpch_q13_customer_distribution", tpch_q13,
        """SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
        GROUP BY c_count""")

    def tpch_q16(spark, sf):
        # anti join (NOT IN supplier complaints) + distinct-count per group
        p = load_table(spark, sf, "part")
        ps = load_table(spark, sf, "supplier") \
            .filter(F.col("s_acctbal") < 0).select("s_suppkey")
        li = load_table(spark, sf, "lineitem") \
            .select("l_partkey", "l_suppkey").dropDuplicates()
        return (li.join(F.broadcast(ps),
                        F.col("l_suppkey") == F.col("s_suppkey"),
                        "left_anti")
                .join(p.filter(F.col("p_type") != "PROMO"),
                      F.col("l_partkey") == F.col("p_partkey"))
                .groupBy("p_brand", "p_type")
                .agg(F.count_distinct("l_suppkey").alias("supplier_cnt")))

    add("tpch_q16_parts_supplier", tpch_q16,
        """SELECT p_brand, p_type,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
        JOIN part ON l_partkey = p_partkey
        WHERE p_type <> 'PROMO'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type""")

    def tpch_q19(spark, sf):
        # disjunction of conjunctive band predicates: Catalyst extracts
        # the common l_partkey equi-key and pushes the residual OR below
        # the join — the classic pushdown stress test
        li = load_table(spark, sf, "lineitem")
        p = load_table(spark, sf, "part")
        j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        band = (
            ((F.col("p_brand") == "Brand#12") & (F.col("l_quantity") >= 1)
             & (F.col("l_quantity") <= 30) & (F.col("p_size") <= 10))
            | ((F.col("p_brand") == "Brand#23") & (F.col("l_quantity") >= 5)
               & (F.col("l_quantity") <= 35) & (F.col("p_size") <= 20))
            | ((F.col("p_brand") == "Brand#34") & (F.col("l_quantity") >= 10)
               & (F.col("l_quantity") <= 40) & (F.col("p_size") <= 30)))
        rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
            .cast("decimal(18,4)")
        return j.filter(band).agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"))

    add("tpch_q19_discounted_revenue", tpch_q19,
        f"""SELECT {SUM_D('l_extendedprice * (1 - l_discount)')} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 30
               AND p_size <= 10)
           OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 5 AND 35
               AND p_size <= 20)
           OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 10 AND 40
               AND p_size <= 30)""")

    def tpch_q22(spark, sf):
        # global-aggregate broadcast + anti join: customers above the
        # average balance with no orders
        c = load_table(spark, sf, "customer")
        # anti-join against URGENT orders (this generator gives every
        # customer at least one order, so the plain form selects nothing)
        o = (load_table(spark, sf, "orders")
             .filter(F.col("o_orderpriority") == "1-URGENT")
             .select("o_custkey"))
        # avg comparison as an exact-decimal cross-multiply (bal * n >
        # total) — a float avg threshold could flip rows near the
        # boundary differently per engine
        dec_bal = F.col("c_acctbal").cast("decimal(18,4)")
        agg = (c.filter(F.col("c_acctbal") > 0)
               .agg(F.sum(dec_bal).alias("tot_bal"),
                    F.count(F.lit(1)).alias("n_pos")))
        return (c.crossJoin(F.broadcast(agg))
                 .filter(dec_bal * F.col("n_pos") > F.col("tot_bal"))
                 .join(o, F.col("c_custkey") == F.col("o_custkey"),
                       "left_anti")
                 .groupBy("c_mktsegment")
                 .agg(F.count(F.lit(1)).alias("numcust"),
                      F.sum(dec_bal).cast("double").alias("totacctbal")))

    add("tpch_q22_global_sales_opportunity", tpch_q22,
        f"""SELECT c_mktsegment, COUNT(*) AS numcust,
               {SUM_D('c_acctbal')} AS totacctbal
        FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(18,4))
              * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4)))
                 FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment""")
