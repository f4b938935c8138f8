"""Temporal / range join operators Spark lacks as builtins.

Spark's optimizer turns an inequality-only join condition into a
BroadcastNestedLoopJoin — quadratic work and a broadcast of a whole
side, the classic 100 TB scale-killer.  Both operators here re-express
the semantics as equi-join-shaped plans:

* ``asof_join`` — pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
  (backward, inclusive) via the union+window trick: one shuffle on the
  key, linear work, no range explosion.
* ``bin_range_join`` — interval containment via integer binning: each
  interval explodes to the bins it overlaps, rows equi-join on their
  bin, an exact filter removes bin-edge false positives.  Works when
  BOTH sides are large (no broadcast requirement).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              suffix: str = "_right",
              tolerance_seconds: int | None = None) -> DataFrame:
    """Backward as-of join: attach to each left row the LATEST right row
    with ``right_ts <= left_ts`` in the same ``key`` group (inclusive —
    DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` semantics); left rows
    with no prior right row keep NULLs.

    Implementation: tag both sides, ``unionByName`` on (key, ts), and
    carry the last non-null right payload forward with ONE window
    partitioned by the key — a single shuffle, no inequality join, no
    BroadcastNestedLoopJoin.  Right rows order before left rows at equal
    timestamps (tag 0 < 1), which is what makes the match inclusive.

    Determinism: if several right rows share (key, right_ts), which one
    wins is tie-dependent — pre-dedup the right side (row_number over a
    stable order) when that matters; the workload entry does.

    ``tolerance_seconds``: matches older than the tolerance are nulled
    out (pandas ``merge_asof(tolerance=...)``).
    """
    payload = [c for c in right.columns if c not in (key, right_ts)]
    out_cols = [c + suffix for c in payload] + [right_ts + suffix]
    l_sel = left.select("*", F.col(left_ts).alias("_ats"),
                        F.lit(1).alias("_side"))
    r_sel = right.select(
        F.col(key),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(right_ts + suffix),
        *[F.col(c).alias(c + suffix) for c in payload])
    u = l_sel.unionByName(r_sel, allowMissingColumns=True)
    w = (Window.partitionBy(key).orderBy(F.col("_ats").asc(),
                                         F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in out_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    matched = u.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        ok = (F.unix_timestamp(F.col("_ats"))
              - F.unix_timestamp(F.col(right_ts + suffix))
              <= F.lit(tolerance_seconds))
        for c in out_cols:
            matched = matched.withColumn(c, F.when(ok, F.col(c)))
    return matched.select(*left.columns, *out_cols)


def bin_range_join(left: DataFrame, ranges: DataFrame, value_col: str,
                   lo_col: str = "lo", hi_col: str = "hi",
                   bin_width: float = 1.0) -> DataFrame:
    """Join left rows to interval rows with ``lo <= value < hi``
    (half-open) WITHOUT an inequality join: intervals explode to the
    integer bins they overlap (fanout = interval_span / bin_width,
    bounded and chosen by the caller), rows compute their bin, both
    sides equi-join on the bin id — shuffle-shaped, AQE-optimizable,
    valid even when the ranges side is far too big to broadcast — and
    an exact predicate drops bin-edge false positives.

    ``bin_width`` trades fanout (small width → many bin copies per
    interval) against false-positive filtering (large width → more
    non-matching candidates per bin); interval span is the right order
    of magnitude.
    """
    binned_ranges = ranges.withColumn(
        "_bin", F.explode(F.sequence(
            F.floor(F.col(lo_col) / bin_width).cast("long"),
            F.floor(F.col(hi_col) / bin_width).cast("long"))))
    return (left.withColumn(
                "_bin", F.floor(F.col(value_col) / bin_width).cast("long"))
            .join(binned_ranges, "_bin")
            .filter((F.col(value_col) >= F.col(lo_col))
                    & (F.col(value_col) < F.col(hi_col)))
            .drop("_bin"))


def join_profile(left: DataFrame, right: DataFrame,
                 keys: list[str]) -> DataFrame:
    """Pre-join key diagnostics — the one-row report to read BEFORE
    launching a 100 TB join: row and distinct-key counts per side, null
    keys (rows that can never match but still shuffle), the worst
    per-key multiplicity on each side (the skew hot spot), and the
    EXACT output cardinality of the inner join
    (sum over keys of count_left * count_right).  A many-to-many join
    that would explode shows up here as est_output_rows orders of
    magnitude above either input, for the price of two count
    aggregations instead of the join itself.

    Scale shape: each side collapses to per-key counts first (map-side
    combinable, bounded by distinct keys), the two count tables join on
    the key (AQE broadcasts the smaller), and everything rolls up to
    one row.  The raw payloads never shuffle.
    """
    from pyspark.sql import functions as F

    def side(df, tag):
        nullc = F.when(
            F.greatest(*[F.col(c).isNull() for c in keys])
            if len(keys) > 1 else F.col(keys[0]).isNull(), 1).otherwise(0)
        per = (df.select(*keys, nullc.alias("_isnull"))
                 .groupBy(*keys)
                 .agg(F.count(F.lit(1)).alias(f"n_{tag}"),
                      F.max("_isnull").alias("_null")))
        return per

    pl = side(left, "l")
    pr = side(right, "r")
    lstats = pl.agg(
        F.sum("n_l").cast("bigint").alias("n_left"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_left"),
        F.max("n_l").cast("bigint").alias("max_key_mult_left"),
        F.sum(F.col("_null") * F.col("n_l")).cast("bigint")
         .alias("null_key_rows_left"))
    rstats = pr.agg(
        F.sum("n_r").cast("bigint").alias("n_right"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_right"),
        F.max("n_r").cast("bigint").alias("max_key_mult_right"),
        F.sum(F.col("_null") * F.col("n_r")).cast("bigint")
         .alias("null_key_rows_right"))
    # inner-join cardinality: null keys never match, mirror SQL semantics
    joined = (pl.filter(F.col("_null") == 0)
                .join(pr.filter(F.col("_null") == 0), keys)
                .agg(F.coalesce(
                    F.sum(F.col("n_l").cast("decimal(19,0)")
                          * F.col("n_r").cast("decimal(19,0)")),
                    F.lit(0)).cast("bigint").alias("est_output_rows")))
    return lstats.crossJoin(rstats).crossJoin(joined)


# ---- Bloom-prefiltered semi-join ------------------------------------------

def bloom_positions(build: DataFrame, key_col: str, m_bits: int = 8192,
                    k_hashes: int = 4,
                    salt: str = "bloom-v1") -> DataFrame:
    """The SET bit positions of a deterministic Bloom filter over the
    build side's keys: k salted md5 hashes per key into an m-bit
    space, returned as a DISTINCT single-column ``pos`` table (at most
    ``m_bits`` rows no matter how many keys went in — the bounded
    artifact that makes the filter shippable between pipeline stages).
    md5-derived => any engine, and any later run, reproduces the same
    bit set."""
    if not 0 < k_hashes <= 16:
        raise ValueError(f"k_hashes out of range: {k_hashes}")
    from functools import reduce
    cols = []
    for i in range(k_hashes):
        h = F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                              F.lit(salt), F.lit(str(i))))
        cols.append(build.select(
            (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
             % m_bits).alias("pos")))
    return reduce(lambda a, b: a.unionByName(b), cols).distinct()


def bloom_semi_join(probe: DataFrame, build: DataFrame, key_col: str,
                    m_bits: int = 8192, k_hashes: int = 4,
                    salt: str = "bloom-v1") -> DataFrame:
    """Semi-join reduction: keep probe rows whose key is in the build
    side, with a Bloom pre-filter ahead of the exact join — the
    classic 100 TB pattern for joining a huge fact stream against a
    selective key set.  The probe side first runs k broadcast
    LEFT SEMI probes against the (<= m_bits row) bit-position table —
    rows missing ANY position are guaranteed non-members and never
    reach the exact join's shuffle; survivors (members + the bounded
    false-positive mass) finish with the exact semi-join, so the
    RESULT is exactly ``probe SEMI JOIN build`` — the bloom stage is
    plan shape, not semantics.

    Unlike Spark's own runtime bloom injection (AQE), the bit set here
    is deterministic (md5) and materializable: at scale you persist
    ``bloom_positions`` once (a few KB) and prefilter every downstream
    consumer without re-reading the build side.

    False-positive rate at default (m=8192, k=4): standard
    (1 - e^{-kn/m})^k — ~2.4% at n=1000 keys; saturation degrades
    gracefully toward a no-op prefilter, never wrong results."""
    if "_bloom_pos" in probe.columns or "_bpos" in probe.columns:
        raise ValueError(
            "bloom_semi_join: probe side may not carry reserved "
            "columns _bloom_pos/_bpos")
    bits = (bloom_positions(build, key_col, m_bits, k_hashes, salt)
            .withColumnRenamed("pos", "_bloom_pos"))
    filtered = probe
    for i in range(k_hashes):
        h = F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                              F.lit(salt), F.lit(str(i))))
        pos = (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
               % m_bits)
        filtered = (filtered.withColumn("_bpos", pos)
                    .join(F.broadcast(bits),
                          F.col("_bpos") == F.col("_bloom_pos"),
                          "left_semi")
                    .drop("_bpos"))
    # left_semi is already existential: no distinct() on the build side
    # (it would add a full exchange+aggregate for no semantic effect)
    return filtered.join(build.select(key_col), key_col, "left_semi")
