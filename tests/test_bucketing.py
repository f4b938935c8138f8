"""Bucketed co-located join: the big⋈big join runs without a shuffle."""
from pyspark.sql import functions as F

from olap_xtrctr_spark.sources.bucketing import (bucketed_join,
                                                 join_has_no_shuffle,
                                                 write_bucketed)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    write_bucketed(spark, sf_dir, n_buckets=4)
    # force the sort-merge path so the assertion is about co-location,
    # not about AQE broadcasting the small test-scale side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark)
        assert join_has_no_shuffle(joined), \
            joined._jdf.queryExecution().executedPlan().toString()
        # and it computes the right thing
        expected = spark.table("bucketed_lineitem").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_reuses_partitioning(spark, sf_dir):
    """Aggregation on the bucket key needs no new exchange either."""
    write_bucketed(spark, sf_dir, n_buckets=4)
    agg = (spark.table("bucketed_lineitem")
           .groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                 .cast("double").alias("qty")))
    assert join_has_no_shuffle(agg), \
        agg._jdf.queryExecution().executedPlan().toString()
