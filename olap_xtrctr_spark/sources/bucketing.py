"""Bucketed tables: shuffle-free co-located joins for repeated big⋈big
joins on the same key.

At 100 TB, `lineitem ⋈ orders` shuffles BOTH sides on every query.
Bucketing both tables on the join key at write time pre-partitions the
data once, so every subsequent join is exchange-free (each task reads
matching bucket files from both sides).  This is the batch analogue of
co-partitioned storage; the one-time write cost amortizes across every
downstream query of the pipeline.

`sortBy` within buckets additionally removes the sort of a sort-merge
join.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import load_table

DEFAULT_BUCKETS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def write_bucketed(spark: SparkSession, sf_dir: str,
                   tables: dict[str, str] | None = None,
                   n_buckets: int = 8, prefix: str = "bucketed_") -> list[str]:
    """Materialize bucketed+sorted managed tables; returns table names.
    ``n_buckets`` should be sized so each bucket's data fits one task
    comfortably (at 100 TB: thousands of buckets, not 8)."""
    tables = tables or DEFAULT_BUCKETS
    names = []
    for name, key in tables.items():
        out = f"{prefix}{name}"
        _drop_table_and_location(spark, out)
        (load_table(spark, sf_dir, name)
         .write.bucketBy(n_buckets, key).sortBy(key)
         .mode("overwrite").format("parquet").saveAsTable(out))
        names.append(out)
    return names


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """Idempotent drop: the session catalog is in-memory, so a previous
    process may have left the managed location on disk without a catalog
    entry — remove both or saveAsTable fails with LOCATION_ALREADY_EXISTS."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table}")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def bucketed_join(spark: SparkSession,
                  left: str = "bucketed_lineitem",
                  right: str = "bucketed_orders",
                  left_key: str = "l_orderkey",
                  right_key: str = "o_orderkey") -> DataFrame:
    """Join two co-bucketed tables — the plan contains NO Exchange on
    either side (asserted in tests/test_bucketing.py)."""
    l, r = spark.table(left), spark.table(right)
    return l.join(r, l[left_key] == r[right_key])


def join_has_no_shuffle(df: DataFrame) -> bool:
    """True when the executed join plan contains no shuffle Exchange
    (kept here for back-compat; canonical home is plans.py)."""
    from ..plans import join_has_no_shuffle as _impl
    return _impl(df)


def write_seen_fingerprints(spark: SparkSession, docs: DataFrame,
                            table: str = "seen_fingerprints",
                            n_buckets: int = 8) -> str:
    """Materialize the already-ingested corpus's dedup fingerprints as a
    table bucketed on the fingerprint — the steady state of
    ``operators.sampling.incremental_dedup``: each new batch's anti-join
    probes co-located buckets, so the seen side is never reshuffled no
    matter how many batches follow (at 100 TB: thousands of buckets and
    the table only ever appends)."""
    from ..operators.text import fingerprint

    _drop_table_and_location(spark, table)
    (fingerprint(docs).select("fingerprint")
     .write.bucketBy(n_buckets, "fingerprint").sortBy("fingerprint")
     .mode("overwrite").format("parquet").saveAsTable(table))
    return table


def incremental_dedup_bucketed(spark: SparkSession, new_batch: DataFrame,
                               table: str = "seen_fingerprints",
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """``incremental_dedup`` against a bucketed seen-table: the anti-join
    shuffles ONLY the new batch (hashed into the table's bucketing), the
    seen side reads its buckets in place."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.text import fingerprint

    new_fp = new_batch.join(
        fingerprint(new_batch, text_col).select(id_col, "fingerprint"),
        on=id_col)
    seen_fp = spark.table(table)
    w_first = F.min(F.col(id_col)).over(Window.partitionBy("fingerprint"))
    return (new_fp.join(seen_fp, on="fingerprint", how="left_anti")
            .withColumn("_keep", w_first == F.col(id_col))
            .filter(F.col("_keep"))
            .drop("_keep", "fingerprint"))
