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


def test_incremental_dedup_bucketed_seen_side_no_exchange(spark, sf_dir):
    """The steady-state ingest shape: the bucketed seen-fingerprint table
    joins without an Exchange on its side (only the new batch hashes
    into the bucketing)."""
    from pyspark.sql import functions as F

    from olap_xtrctr_spark.session import load_table
    from olap_xtrctr_spark.sources.bucketing import (
        incremental_dedup_bucketed, write_seen_fingerprints)

    docs = load_table(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    write_seen_fingerprints(spark, seen, "seen_fp_test")
    out = incremental_dedup_bucketed(spark, new, "seen_fp_test")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly the scan side of the bucketed table must be exchange-free:
    # no Exchange may sit between the seen-table scan and the join
    seen_scan = [l for l in plan.splitlines() if "seen_fp_test" in l]
    assert seen_scan and "Bucketed: true" in plan
    # and the result equals the unbucketed operator on the same split
    from olap_xtrctr_spark.operators.sampling import incremental_dedup
    expect = {r["doc_id"] for r in
              incremental_dedup(new, seen).select("doc_id").collect()}
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert got == expect


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from olap_xtrctr_spark.sources.maintenance import (compact_parquet,
                                                       parquet_dir_stats)
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(10_000).withColumnRenamed("id", "k")
    df.repartition(32).write.parquet(src)          # 32 tiny files
    assert parquet_dir_stats(src)["n_files"] == 32
    stats = compact_parquet(spark, src, dst, target_mb=128)
    assert stats["files_before"] == 32
    assert stats["files_after"] == 1               # tiny data -> one file
    got = spark.read.parquet(dst)
    assert got.count() == 10_000
    assert got.agg({"k": "sum"}).collect()[0][0] == 10_000 * 9_999 // 2
    # source untouched (write-new/verify/rename discipline)
    assert parquet_dir_stats(src)["n_files"] == 32


def test_compact_parquet_empty_dir_raises(spark, tmp_path):
    import pytest
    from olap_xtrctr_spark.sources.maintenance import compact_parquet
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError):
        compact_parquet(spark, str(empty), str(tmp_path / "out"))


def test_cluster_parquet_separates_key_ranges(spark, tmp_path):
    """After clustering, each output file's row-group min/max stats span
    a narrow disjoint range of the cluster key — the metadata a scan
    uses to skip files without reading them."""
    import glob as g
    import pyarrow.parquet as pq
    from olap_xtrctr_spark.sources.maintenance import cluster_parquet
    from pyspark.sql import functions as F

    src = str(tmp_path / "unclustered")
    dst = str(tmp_path / "clustered")
    # interleaved key values so the unclustered layout has NO
    # separation; a fat incompressible-ish payload forces multiple
    # output files at target_mb=1 (so the disjointness assertions are
    # never vacuously skipped)
    df = (spark.range(40_000)
          .select((F.col("id") % 100).alias("k"),
                  F.sha2(F.col("id").cast("string"), 512).alias("payload")))
    df.repartition(8).write.parquet(src)
    stats = cluster_parquet(spark, src, dst, ["k"], target_mb=1)
    assert stats["files_after"] > 1
    spans = []
    for f in sorted(g.glob(f"{dst}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = min(md.row_group(i).column(0).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(0).statistics.max
                 for i in range(md.num_row_groups))
        spans.append((lo, hi))
    # disjoint (range-partitioned) key spans across files
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
    # and collectively much narrower than the full domain per file
    if len(spans) > 1:
        assert max(hi - lo for lo, hi in spans) < 100
    # data intact
    got = spark.read.parquet(dst)
    assert got.count() == 40_000


def test_maintenance_rewrites_refuse_in_place(spark, tmp_path):
    import pytest
    from olap_xtrctr_spark.sources.maintenance import (cluster_parquet,
                                                       compact_parquet)
    src = str(tmp_path / "d")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="disjoint"):
        compact_parquet(spark, src, src)
    with pytest.raises(ValueError, match="disjoint"):
        cluster_parquet(spark, src, str(tmp_path / "d/../d"), ["id"])
    # nesting either way is just as corrupting as equality
    with pytest.raises(ValueError, match="disjoint"):
        compact_parquet(spark, src, str(tmp_path / "d/compacted"))
    with pytest.raises(ValueError, match="disjoint"):
        compact_parquet(spark, str(tmp_path / "d/sub"), src)
    # disjoint dirs still work
    assert compact_parquet(spark, src,
                           str(tmp_path / "out"))["files_after"] >= 1


# ---- training-shard export (sources/shards.py) ---------------------------

def test_write_training_shards_manifest_roundtrip(spark, sf_dir, tmp_path):
    from olap_xtrctr_spark.session import load_table
    from olap_xtrctr_spark.sources import shards as SH

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    manifest = SH.write_training_shards(docs, out, target_mb=1)
    assert manifest["total_rows"] == docs.count()
    assert manifest["n_shards"] == len(manifest["shards"]) >= 1
    assert sum(s["rows"] for s in manifest["shards"]) \
        == manifest["total_rows"]
    assert set(manifest["columns"]) == set(docs.columns)

    # a clean copy verifies...
    assert SH.verify_training_shards(spark, out) == {"ok": True,
                                                     "problems": []}
    # ...an immutable-dir re-export refuses...
    import pytest
    with pytest.raises(ValueError, match="committed"):
        SH.write_training_shards(docs, out)
    # ...and tampering is caught (truncate one shard)
    import os
    victim = os.path.join(out, manifest["shards"][0]["file"])
    with open(victim, "r+b") as f:
        f.truncate(os.path.getsize(victim) - 64)
    res = SH.verify_training_shards(spark, out)
    assert not res["ok"] and any("size drift" in p for p in res["problems"])


def test_verify_training_shards_requires_manifest(spark, tmp_path):
    from olap_xtrctr_spark.sources import shards as SH

    d = tmp_path / "uncommitted"
    spark.range(10).write.parquet(str(d))      # data but no manifest
    res = SH.verify_training_shards(spark, str(d))
    assert not res["ok"] and "uncommitted" in res["problems"][0]


def test_zorder_parquet_prunes_both_dimensions(spark, tmp_path):
    """Z-order: each output file covers a narrow span of BOTH clustered
    columns (a lexicographic sort can only serve the first)."""
    import glob as g

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from olap_xtrctr_spark.sources.maintenance import zorder_parquet

    src = str(tmp_path / "plain")
    dst = str(tmp_path / "zordered")
    df = (spark.range(120_000)
          .select((F.col("id") % 200).alias("k1"),
                  ((F.col("id") * 7919) % 200).alias("k2"),
                  F.sha2(F.col("id").cast("string"), 512).alias("payload")))
    df.repartition(8).write.parquet(src)
    stats = zorder_parquet(spark, src, dst, ["k1", "k2"], target_mb=1)
    assert stats["files_after"] >= 8

    def file_ranges(col_idx):
        out = []
        for f in sorted(g.glob(f"{dst}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo = min(md.row_group(i).column(col_idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(col_idx).statistics.max
                     for i in range(md.num_row_groups))
            out.append((lo, hi))
        return out

    # the property that matters: a 10%-of-domain filter on EITHER
    # column alone skips files from footer stats (a round-robin layout
    # skips zero; a lexicographic sort only serves its first column).
    # Window [30, 50) sits inside one top-level z-quadrant — an
    # interval straddling the median hits both halves by construction,
    # the curve's known worst case.
    for idx in (0, 1):
        ranges = file_ranges(idx)
        hit = sum(1 for lo, hi in ranges if not (hi < 30 or lo > 50))
        assert hit <= 0.5 * len(ranges), (idx, ranges)
    # data intact
    assert spark.read.parquet(dst).count() == 120_000


def test_zorder_parquet_validations(spark, tmp_path):
    import pytest

    from olap_xtrctr_spark.sources.maintenance import zorder_parquet

    src = str(tmp_path / "zv")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="2 columns"):
        zorder_parquet(spark, src, str(tmp_path / "o1"), ["id"])
    with pytest.raises(ValueError, match="bits"):
        zorder_parquet(spark, src, str(tmp_path / "o2"), ["id", "id"],
                       bits=16)


def test_upsert_parquet_replaces_and_appends(spark, tmp_path):
    from pyspark.sql import functions as F

    from olap_xtrctr_spark.sources.maintenance import upsert_parquet

    target = str(tmp_path / "t")
    dst = str(tmp_path / "t2")
    spark.range(10).select("id", F.lit("old").alias("v")) \
        .write.parquet(target)
    updates = spark.createDataFrame(
        [(3, "new"), (7, "new"), (42, "brand")], "id long, v string")
    stats = upsert_parquet(spark, target, dst, updates, ["id"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(dst).collect()}
    assert len(got) == 11                       # 10 originals + 1 new key
    assert got[3] == "new" and got[7] == "new" and got[42] == "brand"
    assert got[0] == "old"
    assert stats["files_before"] >= 1
    # schema mismatch refused
    import pytest
    bad = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="schema"):
        upsert_parquet(spark, target, str(tmp_path / "t3"), bad, ["id"])


# ---- checked CSV ingestion (sources/ingest.py) ---------------------------

def test_read_csv_checked_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql import types as T

    from olap_xtrctr_spark.sources import ingest as IN

    csv = tmp_path / "in.csv"
    csv.write_text("id,name,score\n"
                   "1,alice,3.5\n"
                   "2,bob,oops\n"          # non-numeric score
                   "3,carol,9.25\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType())])
    good, bad = IN.read_csv_checked(spark, str(csv), schema)
    assert {r["id"] for r in good.collect()} == {1, 3}
    bad_lines = [r["raw_line"] for r in bad.collect()]
    assert bad_lines == ["2,bob,oops"]


def test_ingest_csv_to_parquet_reconciles(spark, tmp_path):
    from pyspark.sql import types as T

    from olap_xtrctr_spark.sources import ingest as IN

    csv = tmp_path / "in2.csv"
    csv.write_text("id,v\n" + "\n".join(f"{i},{i*2}" for i in range(100))
                   + "\nbadline,xx\n")
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.LongType())])
    rep = IN.ingest_csv_to_parquet(spark, str(csv),
                                   str(tmp_path / "out"), schema)
    assert rep["n_good"] == 100 and rep["n_bad"] == 1 and rep["ok"]
    assert spark.read.parquet(str(tmp_path / "out")).count() == 100
    # rescue column name collision refused
    import pytest
    s2 = T.StructType([T.StructField("_corrupt_record", T.StringType())])
    with pytest.raises(ValueError, match="_corrupt_record"):
        IN.read_csv_checked(spark, str(csv), s2)


def test_read_csv_checked_does_not_mutate_schema(spark, tmp_path):
    from pyspark.sql import types as T

    from olap_xtrctr_spark.sources import ingest as IN

    csv = tmp_path / "m.csv"
    csv.write_text("id\n1\n")
    schema = T.StructType([T.StructField("id", T.LongType())])
    IN.read_csv_checked(spark, str(csv), schema)
    assert [f.name for f in schema.fields] == ["id"]   # caller untouched
    # and a second call with the same object works
    good, _ = IN.read_csv_checked(spark, str(csv), schema)
    assert good.count() == 1


def test_hilbert_index_matches_reference_and_is_bijective(spark):
    from pyspark.sql import functions as F

    from olap_xtrctr_spark.sources.maintenance import (_hilbert_cols,
                                                       _xy2d_ref)

    bits, n = 4, 16
    df = (spark.range(n * n)
          .select((F.col("id") % n).cast("long").alias("x"),
                  (F.col("id") / n).cast("long").alias("y")))
    work, d_col, _aux = _hilbert_cols(df, "x", "y", bits)
    got = {(r["x"], r["y"]): r[d_col] for r in work.collect()}
    ref = {(x, y): _xy2d_ref(bits, x, y)
           for x in range(n) for y in range(n)}
    assert got == ref
    assert len(set(got.values())) == n * n   # a true space-filling curve


def test_hilbert_parquet_prunes_both_dimensions(spark, tmp_path):
    """Same file-pruning contract as Z-order: a 10%-of-domain filter on
    EITHER clustered column skips most files from footer stats."""
    import glob as g

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from olap_xtrctr_spark.sources.maintenance import hilbert_parquet

    src = str(tmp_path / "plain")
    dst = str(tmp_path / "hilberted")
    df = (spark.range(120_000)
          .select((F.col("id") % 200).alias("k1"),
                  ((F.col("id") * 7919) % 200).alias("k2"),
                  F.sha2(F.col("id").cast("string"), 512).alias("payload")))
    df.repartition(8).write.parquet(src)
    stats = hilbert_parquet(spark, src, dst, ["k1", "k2"], target_mb=1)
    assert stats["files_after"] >= 8

    def file_ranges(col_idx):
        out = []
        for f in sorted(g.glob(f"{dst}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo = min(md.row_group(i).column(col_idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(col_idx).statistics.max
                     for i in range(md.num_row_groups))
            out.append((lo, hi))
        return out

    for idx in (0, 1):
        ranges = file_ranges(idx)
        hit = sum(1 for lo, hi in ranges if not (hi < 30 or lo > 50))
        assert hit <= 0.5 * len(ranges), (idx, ranges)
    assert spark.read.parquet(dst).count() == 120_000
    # schema untouched: every helper column dropped
    assert sorted(spark.read.parquet(dst).columns) == ["k1", "k2",
                                                       "payload"]


def test_hilbert_parquet_validations(spark, tmp_path):
    import pytest

    from olap_xtrctr_spark.sources.maintenance import hilbert_parquet

    src = str(tmp_path / "hv")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="exactly 2"):
        hilbert_parquet(spark, src, str(tmp_path / "o1"), ["id"])
    with pytest.raises(ValueError, match="bits"):
        hilbert_parquet(spark, src, str(tmp_path / "o2"), ["id", "id"],
                        bits=16)


def test_clustered_scan_demo_skips_rowgroups(spark, tmp_path):
    """The end-to-end file-skipping demo: clustered rewrite separates
    the key, footer stats exclude a majority of row groups for the
    point predicate, the predicate reaches the scan, and the rollup
    result is identical to querying the original table."""
    from pyspark.sql import functions as F

    from olap_xtrctr_spark.session import load_events
    from olap_xtrctr_spark.sources.maintenance import (
        clustered_scan_demo, rowgroup_skip_stats)

    sf = "/root/testdata/sf0.01"
    out = clustered_scan_demo(spark, sf, event_type="click",
                              scratch_dir=str(tmp_path / "demo"))
    got = {r["hour"]: (r["n_events"], r["sum_value"])
           for r in out.collect()}
    exp_df = (load_events(spark, sf)
              .filter(F.col("event_type") == "click")
              .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.col("value").cast("decimal(18,4)"))
                    .cast("double").alias("sum_value")))
    exp = {r["hour"]: (r["n_events"], r["sum_value"])
           for r in exp_df.collect()}
    assert got == exp and got
    stats = rowgroup_skip_stats(
        str(tmp_path / "demo" / "events_clustered"),
        "event_type", "click")
    assert stats["n_row_groups"] >= 2
    assert stats["n_skippable"] / stats["n_row_groups"] >= 0.5


def test_rowgroup_skip_stats_unclustered_baseline():
    """The original single-file layout can skip nothing for a value
    present in the data — the baseline the demo improves on."""
    from olap_xtrctr_spark.sources.maintenance import rowgroup_skip_stats

    st = rowgroup_skip_stats("/root/testdata/sf0.01/events.parquet",
                             "event_type", "click")
    assert st["n_skippable"] == 0


def test_versioned_snapshots_lifecycle(spark, tmp_path):
    """write -> list -> read -> time travel; uncommitted remnants are
    invisible; optimistic concurrency refuses a stale parent."""
    import os

    import pytest

    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, x string")
    v2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")],
                               "id long, x string")
    m1 = V.write_version(v1, t)
    assert (m1["version"], m1["parent"], m1["n_rows"]) == (1, None, 2)
    m2 = V.write_version(v2, t, expected_parent=1)
    assert (m2["version"], m2["n_rows"]) == (2, 3)
    assert [m["version"] for m in V.list_versions(t)] == [1, 2]
    # time travel: v1 still reads exactly as written
    assert {tuple(r) for r in V.read_version(spark, t, 1).collect()} \
        == {(1, "a"), (2, "b")}
    assert V.read_version(spark, t, verify_count=True).count() == 3
    # stale parent -> conflict
    with pytest.raises(V.VersionConflict, match="concurrent"):
        V.write_version(v1, t, expected_parent=1)
    # crash remnant: data dir without manifest is invisible
    spark.range(5).write.parquet(os.path.join(t, "v00003"))
    assert V.latest_version(t) == 2
    with pytest.raises(FileNotFoundError, match="not committed"):
        V.read_version(spark, t, 3)
    # ...and the next committed write takes over that version number
    m3 = V.write_version(v1, t, expected_parent=2)
    assert m3["version"] == 3 and V.read_version(spark, t, 3).count() == 2


def test_versioned_diff_summary_promotion_gate(spark, tmp_path):
    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    V.write_version(spark.createDataFrame(
        [(1, "a"), (2, "b"), (4, "d")], "id long, x string"), t)
    V.write_version(spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], "id long, x string"), t)
    summ = {r["status"]: r["n_rows"]
            for r in V.version_diff_summary(spark, t, 1, 2,
                                            ["id"]).collect()}
    assert summ == {"unchanged": 1, "changed": 1, "added": 1,
                    "removed": 1}


def test_version_schema_changes_from_manifests(spark, tmp_path):
    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    V.write_version(spark.createDataFrame([(1, "a")],
                                          "id long, x string"), t)
    V.write_version(spark.createDataFrame([(1, "a", 2.0)],
                                          "id long, x string, y double"),
                    t)
    V.write_version(spark.createDataFrame([(1, 2.0)],
                                          "id long, y double"), t)
    ch = V.version_schema_changes(t)
    assert ch == [
        {"from_version": 1, "to_version": 2, "added": ["y"],
         "removed": []},
        {"from_version": 2, "to_version": 3, "added": [],
         "removed": ["x"]},
    ]


def test_upsert_batch_idempotent_and_merging(spark, tmp_path):
    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    b0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (2, 11, "b2")],   # dup key 2
        "id long, seq long, x string")
    m0 = V.upsert_batch(spark, b0, t, ["id"], "seq", batch_id=0)
    assert m0["version"] == 1 and m0["batch_id"] == 0
    assert {tuple(r) for r in V.read_version(spark, t).collect()} \
        == {(1, 10, "a"), (2, 11, "b2")}      # max-seq wins in-batch
    # redelivery of the same epoch is a no-op
    assert V.upsert_batch(spark, b0, t, ["id"], "seq", batch_id=0) is None
    assert V.latest_version(t) == 1
    # next epoch updates key 2, inserts key 3
    b1 = spark.createDataFrame([(2, 20, "B"), (3, 20, "c")],
                               "id long, seq long, x string")
    m1 = V.upsert_batch(spark, b1, t, ["id"], "seq", batch_id=1)
    assert m1["version"] == 2
    assert {tuple(r) for r in V.read_version(spark, t).collect()} \
        == {(1, 10, "a"), (2, 20, "B"), (3, 20, "c")}
    # time travel still sees the pre-upsert state
    assert {tuple(r) for r in V.read_version(spark, t, 1).collect()} \
        == {(1, 10, "a"), (2, 11, "b2")}


def test_stream_upsert_versioned_end_to_end(spark, tmp_path):
    """availableNow stream -> one committed version per micro-batch;
    the table converges to one row per key (latest by seq)."""
    import pyspark.sql.functions as F

    from olap_xtrctr_spark.sources import versioned as V

    src = str(tmp_path / "src")
    (spark.range(20)
     .select((F.col("id") % 5).alias("k"), F.col("id").alias("seq"),
             F.concat(F.lit("v"), F.col("id")).alias("x"))
     .write.parquet(src))
    sdf = spark.readStream.schema("k long, seq long, x string").parquet(src)
    q = V.stream_upsert_versioned(sdf, str(tmp_path / "tbl"),
                                  ["k"], "seq",
                                  str(tmp_path / "ckpt"))
    q.awaitTermination()
    out = {r["k"]: (r["seq"], r["x"])
           for r in V.read_version(spark, str(tmp_path / "tbl")).collect()}
    # latest seq per key: 15..19
    assert out == {k: (15 + k, f"v{15 + k}") for k in range(5)}
    vs = V.list_versions(str(tmp_path / "tbl"))
    assert vs and all("batch_id" in m for m in vs)


def test_upsert_batch_cdc_deletes(spark, tmp_path):
    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    b0 = spark.createDataFrame(
        [(1, 10, "a", False), (2, 10, "b", False)],
        "id long, seq long, x string, deleted boolean")
    V.upsert_batch(spark, b0, t, ["id"], "seq", 0, delete_col="deleted")
    # tombstone for key 1; stale non-delete behind it loses by order
    b1 = spark.createDataFrame(
        [(1, 20, "zz", True), (1, 15, "late", False), (3, 20, "c", False)],
        "id long, seq long, x string, deleted boolean")
    V.upsert_batch(spark, b1, t, ["id"], "seq", 1, delete_col="deleted")
    rows = {tuple(r) for r in V.read_version(spark, t).collect()}
    assert rows == {(2, 10, "b"), (3, 20, "c")}
    assert "deleted" not in V.read_version(spark, t).columns


def test_versioned_rollback_is_append_only(spark, tmp_path):
    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    V.write_version(spark.createDataFrame([(1, "good")],
                                          "id long, x string"), t)
    V.write_version(spark.createDataFrame([(1, "bad")],
                                          "id long, x string"), t)
    m = V.rollback(spark, t, 1)
    assert m["version"] == 3
    assert (m["rolled_back_from"], m["rolled_back_to"]) == (2, 1)
    assert V.read_version(spark, t).collect()[0]["x"] == "good"
    # history intact: the bad version is still addressable
    assert V.read_version(spark, t, 2).collect()[0]["x"] == "bad"


def test_read_jsonl_checked_catches_malformed_and_drifted(spark, tmp_path):
    from pyspark.sql import types as T

    from olap_xtrctr_spark.sources import ingest as IN

    p = tmp_path / "c.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n'
                 'not json at all\n'
                 '{"doc_id": "not-a-number", "text": "drift"}\n'
                 '{"doc_id": 2, "text": "fine"}\n')
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    good, bad = IN.read_jsonl_checked(spark, str(p), schema)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    raws = [r["raw_line"] for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)
    assert any("not-a-number" in r for r in raws)


def test_ingest_jsonl_to_parquet_reconciles(spark, tmp_path):
    from pyspark.sql import types as T

    from olap_xtrctr_spark.sources import ingest as IN

    p = tmp_path / "c.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nbroken\n')
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    rep = IN.ingest_jsonl_to_parquet(spark, str(p),
                                     str(tmp_path / "out"), schema)
    assert rep["ok"] and rep["n_good"] == 1 and rep["n_bad"] == 1
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1


def test_jsonl_training_shards_roundtrip_and_verify(spark, tmp_path):
    from olap_xtrctr_spark.sources import shards as SH

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)],
        "doc_id long, text string")
    out = str(tmp_path / "jl")
    m = SH.write_training_shards(df, out, target_mb=1, fmt="jsonl")
    assert m["format"] == "jsonl" and m["total_rows"] == 100
    assert "schema_json" in m
    res = SH.verify_training_shards(spark, out)
    assert res["ok"], res
    # tamper with a shard -> verify must fail
    import os
    fp = os.path.join(out, m["shards"][0]["file"])
    with open(fp, "a") as fh:
        fh.write('{"doc_id": 999, "text": "injected"}\n')
    res2 = SH.verify_training_shards(spark, out)
    assert not res2["ok"]


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    import os

    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    b0 = spark.createDataFrame(
        [(i, 10, f"v{i}") for i in range(40)],
        "id long, seq long, x string")
    m0 = V.upsert_batch_bucketed(spark, b0, t, ["id"], "seq", 0,
                                 n_buckets=8)
    assert m0["version"] == 1 and m0["n_rows"] == 40
    # epoch 1 touches ONE key -> at most one bucket dir in v2
    b1 = spark.createDataFrame([(7, 20, "updated")],
                               "id long, seq long, x string")
    m1 = V.upsert_batch_bucketed(spark, b1, t, ["id"], "seq", 1,
                                 n_buckets=8)
    v2_buckets = [d for d in os.listdir(os.path.join(t, "v00002"))
                  if d.startswith("_bucket=")]
    assert len(v2_buckets) == 1
    # untouched buckets still reference v1 paths in the manifest
    assert sum(p.startswith("v00001/") for p in
               m1["bucket_data"].values()) == 7
    out = {r["id"]: (r["seq"], r["x"])
           for r in V.read_version_bucketed(spark, t).collect()}
    assert len(out) == 40 and out[7] == (20, "updated")
    assert out[3] == (10, "v3")
    # redelivery no-ops; time travel to v1 sees the pre-update row
    assert V.upsert_batch_bucketed(spark, b1, t, ["id"], "seq", 1,
                                   n_buckets=8) is None
    old = {r["id"]: r["x"]
           for r in V.read_version_bucketed(spark, t, 1).collect()}
    assert old[7] == "v7"


def test_bucketed_gc_respects_reachability(spark, tmp_path):
    import os

    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    V.upsert_batch_bucketed(
        spark, spark.createDataFrame([(i, 1, "a") for i in range(40)],
                                     "id long, seq long, x string"),
        t, ["id"], "seq", 0, n_buckets=8)
    V.upsert_batch_bucketed(
        spark, spark.createDataFrame([(7, 2, "b")],
                                     "id long, seq long, x string"),
        t, ["id"], "seq", 1, n_buckets=8)
    # v1 is PARTLY live (7 untouched buckets) -> GC from v2 must keep it
    assert V.gc_unreachable(t, keep_from=2) == []
    assert os.path.isdir(os.path.join(t, "v00001"))
    # rewrite everything in epoch 2 -> v1 and v2 become unreachable
    V.upsert_batch_bucketed(
        spark, spark.createDataFrame([(i, 3, "c") for i in range(40)],
                                     "id long, seq long, x string"),
        t, ["id"], "seq", 2, n_buckets=8)
    removed = V.gc_unreachable(t, keep_from=3)
    assert set(removed) == {"v00001", "v00002"}
    out = {r["id"]: r["x"]
           for r in V.read_version_bucketed(spark, t).collect()}
    assert len(out) == 40 and set(out.values()) == {"c"}

def test_upsert_batch_stale_later_batch_does_not_regress(spark, tmp_path):
    """ADVICE r6: the max-order_col rule holds ACROSS batches — a later
    micro-batch carrying an OLDER row for a key must not replace the
    table's newer row (file sources can split input across epochs)."""
    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    b0 = spark.createDataFrame([(1, 20, "new"), (2, 5, "b")],
                               "id long, seq long, x string")
    V.upsert_batch(spark, b0, t, ["id"], "seq", batch_id=0)
    # batch 1 carries a STALE row for key 1 and a fresh key 3
    b1 = spark.createDataFrame([(1, 10, "stale"), (3, 1, "c")],
                               "id long, seq long, x string")
    V.upsert_batch(spark, b1, t, ["id"], "seq", batch_id=1)
    rows = {tuple(r) for r in V.read_version(spark, t).collect()}
    assert rows == {(1, 20, "new"), (2, 5, "b"), (3, 1, "c")}
    # equal order_col: the batch wins the tie (replayed upserts/deletes
    # converge)
    b2 = spark.createDataFrame([(2, 5, "b-tie")],
                               "id long, seq long, x string")
    V.upsert_batch(spark, b2, t, ["id"], "seq", batch_id=2)
    rows = {tuple(r) for r in V.read_version(spark, t).collect()}
    assert rows == {(1, 20, "new"), (2, 5, "b-tie"), (3, 1, "c")}


def test_upsert_batch_stale_tombstone_does_not_delete(spark, tmp_path):
    """A CDC tombstone older than the table's current row loses."""
    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    b0 = spark.createDataFrame([(1, 20, "keep", False)],
                               "id long, seq long, x string, del boolean")
    V.upsert_batch(spark, b0, t, ["id"], "seq", 0, delete_col="del")
    b1 = spark.createDataFrame([(1, 10, "zz", True)],
                               "id long, seq long, x string, del boolean")
    V.upsert_batch(spark, b1, t, ["id"], "seq", 1, delete_col="del")
    rows = {tuple(r) for r in V.read_version(spark, t).collect()}
    assert rows == {(1, 20, "keep")}
    # a NEWER tombstone still deletes
    b2 = spark.createDataFrame([(1, 30, "zz", True)],
                               "id long, seq long, x string, del boolean")
    V.upsert_batch(spark, b2, t, ["id"], "seq", 2, delete_col="del")
    assert V.read_version(spark, t).count() == 0


def test_write_version_recas_before_manifest_commit(spark, tmp_path,
                                                    monkeypatch):
    """ADVICE r6: a concurrent commit landing DURING the data write must
    surface as VersionConflict at the manifest commit point, not be
    silently clobbered."""
    import os

    import pytest

    from olap_xtrctr_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    V.write_version(spark.createDataFrame([(1, "a")],
                                          "id long, x string"), t)
    real = V.latest_version
    calls = []

    def racing(table_dir):
        calls.append(1)
        v = real(table_dir)
        # call 1 = the pre-write check (sees 1, passes); call 2 = the
        # re-CAS: simulate a concurrent writer having committed v2
        if len(calls) == 2:
            return (v or 0) + 1
        return v

    monkeypatch.setattr(V, "latest_version", racing)
    with pytest.raises(V.VersionConflict, match="during the data write"):
        V.write_version(spark.createDataFrame([(2, "b")],
                                              "id long, x string"),
                        t, expected_parent=1)
    monkeypatch.setattr(V, "latest_version", real)
    # the losing manifest was never committed; no tmp remnants
    assert V.latest_version(t) == 1
    assert not any(f.endswith(".tmp") for f in os.listdir(t))
    assert {tuple(r) for r in V.read_version(spark, t).collect()} \
        == {(1, "a")}
