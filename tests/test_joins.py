"""asof_join / bin_range_join semantics and plan-shape guards."""
import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from olap_xtrctr_spark.operators import joins as J


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_backward_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=_ts(10)), Row(k=1, ts=_ts(12)),
         Row(k=2, ts=_ts(9))])
    right = spark.createDataFrame(
        [Row(k=1, ts=_ts(10), px=100.0),    # equal ts: inclusive match
         Row(k=1, ts=_ts(11), px=110.0),
         Row(k=2, ts=_ts(23), px=999.0)])   # only AFTER left → no match
    out = {(r["k"], r["ts"]): (r["px_right"], r["ts_right"])
           for r in J.asof_join(left, right, key="k").collect()}
    assert out[(1, _ts(10))] == (100.0, _ts(10))   # inclusive
    assert out[(1, _ts(12))] == (110.0, _ts(11))   # latest prior
    assert out[(2, _ts(9))] == (None, None)        # nothing prior


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts(12))])
    right = spark.createDataFrame([Row(k=1, ts=_ts(10), px=1.0)])
    fresh = J.asof_join(left, right, key="k",
                        tolerance_seconds=3 * 3600).collect()[0]
    stale = J.asof_join(left, right, key="k",
                        tolerance_seconds=3600).collect()[0]
    assert fresh["px_right"] == 1.0
    assert stale["px_right"] is None


def test_asof_plan_single_shuffle_no_nested_loop(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts(10))])
    right = spark.createDataFrame([Row(k=1, ts=_ts(9), px=1.0)])
    plan = _plan(J.asof_join(left, right, key="k"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan          # union+window, no join at all


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Cross-library oracle: on randomized keyed event times, asof_join
    must agree row-for-row with pandas.merge_asof (backward, inclusive,
    per-key) — the reference semantics both DuckDB ASOF JOIN and pandas
    implement."""
    import random

    import pandas as pd

    rng = random.Random(42)
    for trial in range(3):
        left_rows = [(k, _ts(rng.randrange(0, 24), rng.randrange(0, 60)))
                     for k in range(1, 5) for _ in range(rng.randrange(1, 6))]
        right_rows = [(k, _ts(rng.randrange(0, 24), rng.randrange(0, 60)),
                       float(i))
                      for i, k in enumerate(
                          k for k in range(1, 5)
                          for _ in range(rng.randrange(0, 6)))]
        # unique right (key, ts) so the match is well-defined in both
        seen, uniq = set(), []
        for k, ts, v in right_rows:
            if (k, ts) not in seen:
                seen.add((k, ts))
                uniq.append((k, ts, v))
        left = spark.createDataFrame(left_rows, "k long, ts timestamp")
        right = spark.createDataFrame(uniq, "k long, ts timestamp, px double")
        got = {(r["k"], r["ts"]): r["px_right"]
               for r in J.asof_join(left, right, key="k").collect()}
        lp = pd.DataFrame(left_rows, columns=["k", "ts"]) \
            .sort_values("ts", kind="stable")
        rp = pd.DataFrame(uniq, columns=["k", "ts", "px"]) \
            .sort_values("ts", kind="stable")
        if len(rp) == 0:
            exp = {(r.k, r.ts.to_pydatetime()): None
                   for r in lp.itertuples()}
        else:
            m = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
            exp = {(r.k, r.ts.to_pydatetime()):
                   (None if pd.isna(r.px) else r.px)
                   for r in m.itertuples()}
        assert got == exp, f"trial {trial}"


def test_bin_range_join_boundaries_and_spanning(spark):
    left = spark.createDataFrame(
        [Row(id=i, v=float(v)) for i, v in
         enumerate([0.0, 9.99, 10.0, 49.99, 50.0, 149.0])])
    ranges = spark.createDataFrame(
        [Row(tier="a", lo=0.0, hi=10.0),     # narrow: inside one bin
         Row(tier="b", lo=10.0, hi=50.0),    # spans several 7-wide bins
         Row(tier="c", lo=50.0, hi=150.0)])
    out = {r["id"]: r["tier"] for r in J.bin_range_join(
        left, ranges, "v", bin_width=7.0).collect()}
    assert out == {0: "a", 1: "a", 2: "b", 3: "b", 4: "c", 5: "c"}
    # lo inclusive, hi exclusive: every boundary value lands exactly once
    plan = _plan(J.bin_range_join(left, ranges, "v", bin_width=7.0))
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_profile_exact_cardinality_skew_and_nulls(spark):
    from olap_xtrctr_spark.operators.joins import join_profile
    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "k int")
    right = spark.createDataFrame(
        [(1,), (1,), (3,), (None,), (None,)], "k int")
    r = join_profile(left, right, ["k"]).collect()[0]
    assert r["n_left"] == 5 and r["n_right"] == 5
    assert r["distinct_left"] == 3 and r["distinct_right"] == 3  # incl. null group
    assert r["max_key_mult_left"] == 3 and r["max_key_mult_right"] == 2
    assert r["null_key_rows_left"] == 1 and r["null_key_rows_right"] == 2
    # inner join output: key 1 -> 3*2 = 6; nulls never match
    assert r["est_output_rows"] == 6
    # cross-check against the actual join
    assert left.join(right, "k").count() == 6


def test_join_profile_disjoint_keys_zero_output(spark):
    from olap_xtrctr_spark.operators.joins import join_profile
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(3,)], "k int")
    r = join_profile(left, right, ["k"]).collect()[0]
    assert r["est_output_rows"] == 0


def test_bloom_semi_join_exact_and_bounded(spark):
    """bloom_semi_join contracts: (1) result EXACTLY equals the plain
    semi-join (the bloom stage is plan shape, not semantics) across a
    key universe big enough to force false positives through the
    prefilter; (2) the bit-position table is bounded by m_bits and
    deterministic; (3) k_hashes is validated."""
    import pytest as _pytest

    from olap_xtrctr_spark.operators import joins as J

    probe = spark.createDataFrame(
        [(i, f"u{i % 997}") for i in range(5000)], "row_id int, k string")
    build = spark.createDataFrame(
        [(f"u{i}",) for i in range(0, 997, 13)], "k string")

    got = {r["row_id"] for r in
           J.bloom_semi_join(probe, build, "k", m_bits=256).collect()}
    want = {r["row_id"] for r in
            probe.join(build.distinct(), "k", "left_semi").collect()}
    assert got == want and want      # small m -> many FPs, still exact

    bits1 = sorted(r["pos"] for r in
                   J.bloom_positions(build, "k", m_bits=256).collect())
    bits2 = sorted(r["pos"] for r in
                   J.bloom_positions(build, "k", m_bits=256).collect())
    assert bits1 == bits2
    assert 0 < len(bits1) <= 256

    with _pytest.raises(ValueError, match="k_hashes"):
        J.bloom_positions(build, "k", k_hashes=0)
