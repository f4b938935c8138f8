"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 4 as ``hll_sketch_agg`` / ``hll_union_agg``).

Why sketches at 100 TB: an exact COUNT(DISTINCT user) over a year of
events re-shuffles the raw key space every time the question is asked.
A partial HLL sketch per (coarse grain, e.g. hour) is a few KB of
mergeable state: rolling it up to day/month/all-time is a union of
sketches — no second pass over raw data, no key shuffle, bounded error
(~1% at lg_k=12).  This is the same partial-state discipline the
streaming rollups use, applied to cardinality.

All three operators are plain DataFrame aggregations — map-side
combined, one shuffle on the group keys.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 lg_k: int = 12) -> DataFrame:
    """Estimated distinct ``value_col`` per group, single pass."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(
                F.hll_sketch_agg(value_col, F.lit(lg_k)))
                .alias("n_distinct_est")))


def hll_partial(df: DataFrame, group_cols: list[str], value_col: str,
                lg_k: int = 12) -> DataFrame:
    """Mergeable binary sketch per group — the state to persist at the
    finest rollup grain (hour/shard); a few KB per group."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")))


def hll_rollup(partials: DataFrame, group_cols: list[str],
               sketch_col: str = "hll") -> DataFrame:
    """Union fine-grain partial sketches up to a coarser grain and
    estimate — answers 'distinct over any window' from persisted
    state without touching raw data."""
    return (partials.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(F.hll_union_agg(sketch_col))
                 .alias("n_distinct_est")))


# ---- count-min sketch (heavy-hitter frequency estimation) ------------------
# Deterministic hash rows (the sampling family's md5(value:salt)
# discipline, one salt per depth), so unlike HLL the ENTIRE sketch is
# reproducible by an external SQL engine — counters, merges, and
# estimates all carry full oracles.

CMS_SALTS = ("cms-d0", "cms-d1", "cms-d2", "cms-d3")


def _cms_slot(value_col: str, salt: str, width: int):
    h = F.md5(F.concat_ws(":", F.col(value_col), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
            % width).cast("int")


def cms_slot_sql(value_expr: str, salt: str, width: int) -> str:
    """DuckDB mirror of _cms_slot (oracle building block)."""
    return (f"CAST(TRY_CAST(concat('0x', substr(md5(concat({value_expr}, "
            f"':{salt}')), 1, 15)) AS BIGINT) % {width} AS INTEGER)")


def cms_counters(df: DataFrame, value_col: str, width: int = 256,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Count-min counter table: one row per (group?, depth, slot) with
    the summed hit count.  Each depth row places a value in one slot
    via its salted hash; counters are plain map-side-combinable counts,
    and MERGING shards is summing their counter tables (slot-aligned by
    construction) — the mergeability that makes a CMS the
    bounded-memory answer to "how often is X" at 100 TB: depth*width
    cells of state regardless of key cardinality.

    Estimates are one-sided: min over depth rows of the value's slot
    counters >= the true count, within eps*N with the standard
    (width, depth) guarantees."""
    from functools import reduce
    groups = list(group_cols or [])
    rows = [df.select(*groups, F.lit(d).alias("depth"),
                      _cms_slot(value_col, salt, width).alias("slot"))
            for d, salt in enumerate(CMS_SALTS)]
    exploded = reduce(lambda a, b: a.unionByName(b), rows)
    return (exploded.groupBy(*groups, "depth", "slot")
            .agg(F.count(F.lit(1)).cast("bigint").alias("counter")))


def cms_estimate(counters: DataFrame, probes: DataFrame,
                 value_col: str, width: int = 256,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Estimate each probe value's frequency from a counter table:
    min over ALL depth rows of its slot counter, with an absent slot
    row counting as exactly 0 — so a probe that was never inserted
    reports ``freq_est = 0`` instead of vanishing or inheriting a
    looser populated-depths-only min (the probe side of the join is
    preserved).

    ``group_cols`` must name the counter table's group columns (the
    same list passed to ``cms_counters``); probes then carry those
    columns too and estimates are per (group, value).  The column sets
    are checked so a grouped counter table can never be silently
    estimated ungrouped (which would min across groups sharing a
    slot).

    Plan shape: the counter table is the CMS's bounded state —
    depth*width cells per group regardless of key cardinality — so it
    broadcasts onto the probe side."""
    from functools import reduce
    groups = list(group_cols or [])
    expected = set(groups) | {"depth", "slot", "counter"}
    if set(counters.columns) != expected:
        raise ValueError(
            f"cms_estimate: counter table columns "
            f"{sorted(counters.columns)} do not match group_cols"
            f"={groups} (expected exactly {sorted(expected)}); pass "
            f"the same group_cols used for cms_counters")
    keyed = [probes.select(*groups, F.col(value_col),
                           F.lit(d).alias("depth"),
                           _cms_slot(value_col, salt, width).alias("slot"))
             for d, salt in enumerate(CMS_SALTS)]
    probe_slots = reduce(lambda a, b: a.unionByName(b), keyed)
    joined = probe_slots.join(F.broadcast(counters),
                              groups + ["depth", "slot"], "left")
    return (joined.groupBy(*groups, value_col)
            .agg(F.min(F.coalesce(F.col("counter"), F.lit(0)))
                 .cast("bigint").alias("freq_est")))


# ---- KMV (k-minimum-values) distinct-count sketch --------------------------
# The oracle-exact complement to HLL: the sketch is the k smallest
# DISTINCT 60-bit md5 values of the key, the estimate is pure integer
# arithmetic ((k-1) * 2^60) DIV h_k — so counters, merges, and
# estimates all carry full SQL oracles, the same discipline as the CMS.

KMV_SPACE = 1 << 60


def _kmv_hash(value_col: str):
    h = F.md5(F.concat_ws(":", F.col(value_col), F.lit("kmv-v1")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def kmv_hash_sql(value_expr: str) -> str:
    """DuckDB mirror of _kmv_hash (oracle building block)."""
    return (f"TRY_CAST(concat('0x', substr(md5(concat({value_expr}, "
            f"':kmv-v1')), 1, 15)) AS BIGINT)")


def kmv_partial(df: DataFrame, group_cols: list[str], value_col: str,
                k: int = 64) -> DataFrame:
    """Per-group KMV state: the k smallest distinct hash values, one
    row per (group, hash).  The corpus pass is a map-side-combinable
    distinct on (group, hash) — the shuffle carries DISTINCT pairs
    only, never raw rows — then a group-keyed window over that
    (cardinality-sized) table keeps the k minima.  MERGING shards is
    unioning their partials and re-taking the k minima
    (:func:`kmv_merge`) — the mergeability that lets per-shard/hour
    state roll up without touching raw data again."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    dh = (df.select(*group_cols, _kmv_hash(value_col).alias("kmv_h"))
          .groupBy(*group_cols, "kmv_h").agg(F.lit(1).alias("_one"))
          .drop("_one"))
    w = Window.partitionBy(*group_cols).orderBy("kmv_h")
    return (dh.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def kmv_merge(partials: DataFrame, group_cols: list[str],
              k: int = 64) -> DataFrame:
    """Union per-shard KMV partials up to a coarser grain: distinct
    hashes, re-take the k minima per group."""
    dh = partials.select(*group_cols, "kmv_h").distinct()
    w = Window.partitionBy(*group_cols).orderBy("kmv_h")
    return (dh.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def kmv_estimate(partials: DataFrame, group_cols: list[str],
                 k: int = 64) -> DataFrame:
    """Distinct-count estimates from KMV state: when a group holds
    fewer than k hashes the count is EXACT (the sketch saw every
    distinct value); otherwise est = ((k-1) * 2^60) DIV h_k — integer
    division on the k-th smallest hash, reproducible bit-for-bit by
    any SQL engine.  Standard guarantees: unbiased, rel. error
    ~ 1/sqrt(k-2)."""
    agg = (partials.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("_n"),
                F.max("kmv_h").alias("_hk")))
    est = F.when(
        F.col("_n") < k, F.col("_n").cast("bigint")).otherwise(
        F.expr(f"CAST(({k - 1} * CAST({KMV_SPACE} AS DECIMAL(38,0))) "
               f"DIV _hk AS BIGINT)"))
    return agg.select(*group_cols, est.alias("n_distinct_est"))


def kmv_overlap(partials: DataFrame, group_col: str,
                k: int = 64) -> DataFrame:
    """Set-operation cardinalities from KMV state alone (the theta-sketch
    union/intersection estimator, Beyer et al. 2007): for every
    unordered group pair (g_a < g_b) estimate ``union_est`` and
    ``inter_est`` of the two groups' underlying value sets — WITHOUT
    touching the raw data again.  This is the 100 TB point of keeping
    sketch state: per-group state is <= k rows, so G groups' pairwise
    overlap matrix costs O(G^2 * k) sketch rows total, vs a raw-data
    self-join that reshuffles the corpus per pair.

    Estimator: pool both groups' hashes, keep the k smallest of the
    union (threshold tau = k-th smallest, INCLUDED — the convention is
    pinned here and mirrored by the oracle); below tau, membership in a
    group's sketch <=> membership in its set, so
    ``rho = |{h <= tau : h in K_a and h in K_b}|`` and
    ``inter_est = rho/k * union_est``, evaluated as the overflow-free
    integer decomposition ``(u DIV k)*rho + ((u % k)*rho) DIV k``.
    When the pooled union holds fewer than k distinct hashes both
    sketches are complete sets and BOTH estimates are exact counts.
    All arithmetic is integer on md5-derived hashes — any SQL engine
    reproduces it bit-for-bit."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    pa = partials.select(F.col(group_col).alias("g_a"), "kmv_h")
    pb = partials.select(F.col(group_col).alias("g_b"), "kmv_h")
    pairs = (pa.select("g_a").distinct()
             .join(pb.select("g_b").distinct(),
                   F.col("g_a") < F.col("g_b")))
    ha = (pairs.join(pa, "g_a")
          .select("g_a", "g_b", "kmv_h",
                  F.lit(1).alias("in_a"), F.lit(0).alias("in_b")))
    hb = (pairs.join(pb, "g_b")
          .select("g_a", "g_b", "kmv_h",
                  F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    pooled = (ha.unionByName(hb)
              .groupBy("g_a", "g_b", "kmv_h")
              .agg(F.max("in_a").alias("in_a"),
                   F.max("in_b").alias("in_b")))
    w = Window.partitionBy("g_a", "g_b").orderBy("kmv_h")
    sk = (pooled.withColumn("_rn", F.row_number().over(w))
          .filter(F.col("_rn") <= k))
    agg = (sk.groupBy("g_a", "g_b")
           .agg(F.count(F.lit(1)).alias("_n"),
                F.max("kmv_h").alias("_hk"),
                F.sum((F.col("in_a") * F.col("in_b")).cast("bigint"))
                 .alias("_rho")))
    union_est = F.when(
        F.col("_n") < k, F.col("_n").cast("bigint")).otherwise(
        F.expr(f"CAST(({k - 1} * CAST({KMV_SPACE} AS DECIMAL(38,0))) "
               f"DIV _hk AS BIGINT)"))
    agg = agg.withColumn("union_est", union_est)
    inter_est = F.when(F.col("_n") < k, F.col("_rho")).otherwise(
        (F.expr(f"union_est DIV {k}") * F.col("_rho"))
        + F.expr(f"((union_est % {k}) * _rho) DIV {k}"))
    return agg.select("g_a", "g_b", "union_est",
                      inter_est.cast("bigint").alias("inter_est"))


def kmv_sliding_estimate(df: DataFrame, ts_col: str, value_col: str,
                         window_hours: int = 6,
                         k: int = 64) -> DataFrame:
    """Sliding-window distinct-count estimates from PER-HOUR KMV state:
    for each hour, the estimated distinct ``value_col`` count over the
    trailing ``window_hours`` hours — the classic streaming-analytics
    ask ("unique users in the last 6 h, hourly") answered WITHOUT
    re-scanning raw data per window position.

    The raw stream is touched once (the per-hour kmv_partial distinct
    pass); every window position then re-merges <= window_hours * k
    sketch rows — the KMV merge is exact (k minima of the union), so a
    value active in several of the trailing hours counts once, and the
    estimate is the same integer arithmetic any SQL engine reproduces.
    At 100 TB the hourly partials are the durable artifact (64 rows/h)
    and window repositioning costs sketch-sized work, not corpus
    scans.

    Gap contract (ADVICE r8): window positions are emitted only for
    CALENDAR HOURS PRESENT IN THE DATA — an hour with zero events
    yields no output row (and contributes nothing to later windows),
    rather than a row estimating the trailing hours around it.  The
    oracle encodes the same contract.  A consumer needing a gap-free
    spine should join against an explicit hour sequence (the
    hourly_rollup_gapfilled discipline in streaming/events.py)."""
    hourly = kmv_partial(
        df.select(F.date_trunc("hour", F.col(ts_col)).alias("_h"),
                  F.col(value_col)),
        ["_h"], value_col, k=k)
    hours = hourly.select(F.col("_h").alias("hour")).distinct()
    span = (hourly.alias("s").join(
        hours.alias("t"),
        (F.col("s._h") <= F.col("t.hour"))
        & (F.col("s._h") >= F.col("t.hour")
           - F.expr(f"INTERVAL {window_hours - 1} HOURS")))
        .select("hour", "kmv_h").distinct())
    merged = kmv_merge(span.withColumnRenamed("hour", "_h"),
                       ["_h"], k=k)
    return (kmv_estimate(merged, ["_h"], k=k)
            .withColumnRenamed("_h", "hour"))


# ---- bottom-k sample sketch (mergeable quantiles) --------------------------
# The quantile complement to KMV: state is the k rows with the SMALLEST
# md5 row-key hashes per group — a deterministic uniform row sample of
# fixed size whose merge (k minima of the union) is exact, so per-shard
# or per-hour state rolls up without re-reading raw data, and quantile
# estimates are rank picks over the sampled values — pure integer
# arithmetic + stored doubles, fully oracle-reproducible.

def bottomk_partial(df: DataFrame, group_cols: list[str], key_col: str,
                    value_col: str, k: int = 64,
                    salt: str = "bk-v1") -> DataFrame:
    """Per-group bottom-k sample state: the rows whose md5(key:salt)
    hash is among the group's k smallest, carried as (group, bk_h,
    value).  Because the hash order is a reproducible uniform
    permutation of ROWS, the retained values are a uniform size-k
    sample; merging shards re-takes the k minima of the union
    (:func:`bottomk_merge`) — same discipline as KMV, but keeping the
    VALUE alongside the hash so quantiles (not just cardinality) come
    out of the sketch.

    Determinism at the k-boundary: duplicate ``key_col`` values hash
    to the SAME bk_h but may carry different values, so ordering by
    the hash alone would make which row survives rank k
    engine-dependent (ADVICE r8).  The (bk_h, value) tiebreak pins
    it — same discipline in :func:`bottomk_merge`."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    h = F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                          F.lit(salt)))
    hv = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    w = Window.partitionBy(*group_cols).orderBy("bk_h", "value")
    return (df.select(*group_cols, hv.alias("bk_h"),
                      F.col(value_col).alias("value"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def bottomk_merge(partials: DataFrame, group_cols: list[str],
                  k: int = 64) -> DataFrame:
    """Union per-shard bottom-k partials: re-take the k hash-minima
    per group (rows are keyed by distinct row hashes, so the union
    never double-counts a row).  Ordered by (bk_h, value) so the
    k-boundary row is deterministic even when distinct keys collide
    on bk_h with different values (ADVICE r8)."""
    dh = partials.select(*group_cols, "bk_h", "value").distinct()
    w = Window.partitionBy(*group_cols).orderBy("bk_h", "value")
    return (dh.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def bottomk_quantiles(partials: DataFrame, group_cols: list[str],
                      ps: tuple = (0.5, 0.9, 0.99),
                      names: tuple = ("q50", "q90", "q99")) -> DataFrame:
    """Quantile estimates from bottom-k state: percentile_disc-style
    rank picks over the sampled values (rank ceil(p*n), ties broken by
    the row hash) — the deterministic-sample discipline of
    events_value_quantiles_sampled applied to MERGEABLE bounded state.
    Standard error ~ O(1/sqrt(k)) in rank space."""
    w = Window.partitionBy(*group_cols).orderBy("value", "bk_h")
    wn = Window.partitionBy(*group_cols)
    ranked = (partials.withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(wn)))
    picks = [F.max(F.when(
        F.col("_rn") == F.expr(f"CAST(ceil({p} * _n) AS BIGINT)"),
        F.col("value"))).alias(name)
        for p, name in zip(ps, names)]
    return ranked.groupBy(*group_cols).agg(*picks)


def bottomk_sliding_quantiles(df: DataFrame, ts_col: str, key_col: str,
                              value_col: str, window_hours: int = 6,
                              k: int = 64,
                              ps: tuple = (0.5, 0.9, 0.99),
                              names: tuple = ("q50", "q90", "q99")
                              ) -> DataFrame:
    """Sliding-window quantiles from per-hour bottom-k state: for each
    hour, rank-pick quantile estimates over the trailing
    ``window_hours`` hours' pooled samples — rolling latency/size
    percentiles (the SRE dashboard staple) WITHOUT re-scanning raw
    data per window position (the kmv_sliding_estimate discipline
    applied to the quantile sketch: raw stream touched once for the
    hourly partials, each window position re-merges <= window_hours*k
    sketch rows).  Same gap contract as kmv_sliding_estimate: hours
    absent from the data produce no window position row."""
    hourly = bottomk_partial(
        df.select(F.date_trunc("hour", F.col(ts_col)).alias("_h"),
                  F.col(key_col), F.col(value_col)),
        ["_h"], key_col, value_col, k=k)
    hours = hourly.select(F.col("_h").alias("hour")).distinct()
    span = (hourly.alias("s").join(
        hours.alias("t"),
        (F.col("s._h") <= F.col("t.hour"))
        & (F.col("s._h") >= F.col("t.hour")
           - F.expr(f"INTERVAL {window_hours - 1} HOURS")))
        .select("hour", "bk_h", "value").distinct())
    merged = bottomk_merge(span.withColumnRenamed("hour", "_h"),
                           ["_h"], k=k)
    return (bottomk_quantiles(merged, ["_h"], ps, names)
            .withColumnRenamed("_h", "hour"))


# ---- oracle-exact HLL (md5 registers + fixed-op corrections) --------------
# The DataSketches HLL above is the production fast path; this twin is
# the r8 MinHash move applied to HyperLogLog: every step — the 60-bit
# md5 hash, the register index/rank split, the harmonic sum, and the
# small-range linear-counting correction — is either exact integer
# arithmetic or a FIXED sequence of IEEE-double ops (fixedlog.py), so
# an external SQL engine reproduces the ESTIMATES bit-for-bit.  With
# KMV (cardinality + set ops), CMS (frequency) and bottom-k
# (quantiles), this completes oracle-exactness across the whole
# sketch family, HLL included.

HLL_SALT = "hll-v1"
_HLL_P = 10                      # 2^10 = 1024 registers (~3.2% rse)


def _hll_alpha_num(p: int) -> float:
    """alpha_m * m^2 * 2^60 as ONE double literal (the raw-estimate
    numerator): computed once here, emitted via repr into the oracle,
    so both engines parse the identical double."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * 18446744073709551616.0 / 16.0  # * 2^60


def hll_md5_registers(df: DataFrame, group_cols: list[str],
                      value_col: str, p: int = _HLL_P) -> DataFrame:
    """Per-group HLL register table (group, reg, max_rank): the
    mergeable state.  60-bit md5 hash splits into p low bits (the
    register) and 60-p high bits (rank = leading zeros + 1, via the
    bin()-length trick — bin() drops leading zeros on both engines, so
    rank needs no loops and no logs).  Merge = MAX per register."""
    m = 1 << p
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col(value_col).cast("string"),
                          F.lit(HLL_SALT))), 1, 15), 16, 10).cast("bigint")
    # no pre-dedup: MAX per register absorbs duplicates, and the
    # groupBy's map-side combine caps shuffle rows at m per group per
    # partition — one shuffle total
    d = (df.select(*group_cols, h.alias("_h"))
         .withColumn("reg", (F.col("_h") % m).cast("int"))
         .withColumn("_w", F.expr(f"_h DIV {m}")))
    rank = (F.when(F.col("_w") == 0, F.lit(60 - p + 1))
            .otherwise(F.lit(60 - p + 1)
                       - F.length(F.expr("bin(_w)")))).cast("int")
    return (d.withColumn("_r", rank)
            .groupBy(*group_cols, "reg")
            .agg(F.max("_r").alias("max_rank")))


def hll_md5_estimate(registers: DataFrame, group_cols: list[str],
                     p: int = _HLL_P) -> DataFrame:
    """Cardinality estimates from register state, oracle-exact:

    * harmonic sum as an INTEGER: S = Σ 2^(60 - max_rank) over present
      registers + (m - |present|)·2^60 for the zero registers —
      DECIMAL(38,0) accumulation (2^70 max at p=10, past BIGINT);
    * raw estimate = (alpha·m²·2^60) / CAST(S AS DOUBLE) — one
      correctly-rounded cast + one division, same bits everywhere;
    * small-range correction (raw <= 2.5m, zero registers exist):
      linear counting m·ln(m/V) through the fixedlog fixed-op ln,
      frozen per distinct V on the driver (V has at most m+1 values —
      bounded metadata).  The standard large-range correction starts
      at 2^32/30 ≈ 1.4e8 — far above any 60-bit-hash workload here —
      and is deliberately omitted (documented contract)."""
    from .fixedlog import fxln, round_half_away
    from .hostmath import lookup_df

    m = 1 << p
    num = _hll_alpha_num(p)
    agg = (registers.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("_nreg"),
                F.sum(F.expr("CAST(power(2, 60 - max_rank) "
                             "AS DECIMAL(38,0))")).alias("_s_used")))
    two60 = "1152921504606846976"            # 2^60 exact
    s_total = F.expr(
        f"_s_used + CAST({m} - _nreg AS DECIMAL(38,0)) * {two60}")
    est_raw = F.lit(num) / s_total.cast("double")
    # linear-counting freeze: V -> ROUND(m * fxln(m / V)), all m
    # possible V values precomputed on the driver
    spark = registers.sparkSession
    lin = lookup_df(
        spark,
        ((v, round_half_away(float(m) * fxln(float(m) / float(v))))
         for v in range(1, m + 1)),
        "_v", "_lin_est")
    out = (agg.withColumn("_v", (F.lit(m) - F.col("_nreg")).cast("bigint"))
           .withColumn("_raw", est_raw)
           .join(F.broadcast(lin), "_v", "left"))
    est = (F.when((F.col("_raw") <= F.lit(2.5 * m))
                  & (F.col("_v") > 0), F.col("_lin_est"))
           .otherwise(F.round(F.col("_raw")).cast("bigint")))
    return out.select(*group_cols, est.alias("n_distinct_est"))


def hll_md5_distinct(df: DataFrame, group_cols: list[str],
                     value_col: str, p: int = _HLL_P) -> DataFrame:
    """One-call convenience: registers -> estimate, single pass."""
    return hll_md5_estimate(
        hll_md5_registers(df, group_cols, value_col, p),
        group_cols, p)


# ---- Bloom filter (membership sketch) ---------------------------------------
# The decontamination workhorse at 100 TB: an exact shingle-vocabulary
# anti-join needs the whole train vocabulary shuffled per probe run; a
# Bloom filter is m bits of MERGEABLE state (shard bitmaps OR
# together) with zero false negatives and a bounded false-positive
# rate (~(1-e^{-kn/m})^k).  Same md5(value:salt) discipline as the
# CMS/KMV rows above, so bit positions, merges, and probe verdicts —
# INCLUDING the false positives — are reproducible by an external SQL
# engine: the sketch family stays oracle-exact end to end.

BLOOM_SALTS = ("bloom-k0", "bloom-k1", "bloom-k2", "bloom-k3")


def _bloom_pos(value_col: str, salt: str, m: int):
    h = F.md5(F.concat_ws(":", F.col(value_col), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
            % m).cast("int")


def bloom_pos_sql(value_expr: str, salt: str, m: int) -> str:
    """DuckDB mirror of _bloom_pos (oracle building block)."""
    return (f"CAST(TRY_CAST(concat('0x', substr(md5(concat({value_expr},"
            f" ':{salt}')), 1, 15)) AS BIGINT) % {m} AS INTEGER)")


def bloom_bits(df: DataFrame, value_col: str, m: int = 4096,
               group_cols: list[str] | None = None) -> DataFrame:
    """The filter's SET bit positions, one row per (group?, pos) —
    the sparse-bitmap representation (at most m rows per group
    regardless of input size; map-side-combined distinct).  MERGING
    shard filters is a union + distinct (bitmap OR), so the state
    folds exactly like the other sketches."""
    from functools import reduce
    groups = list(group_cols or [])
    rows = [df.select(*groups, _bloom_pos(value_col, salt, m)
                      .alias("pos"))
            for salt in BLOOM_SALTS]
    return reduce(lambda a, b: a.unionByName(b), rows) \
        .distinct()


def bloom_merge(*bit_tables: DataFrame) -> DataFrame:
    """OR shard bitmaps: union + distinct.  merge(build(A), build(B))
    == build(A ∪ B) bit-for-bit by construction."""
    from functools import reduce
    return reduce(lambda a, b: a.unionByName(b), bit_tables).distinct()


def bloom_probe(bits: DataFrame, probes: DataFrame, value_col: str,
                m: int = 4096,
                group_cols: list[str] | None = None) -> DataFrame:
    """Membership verdict per probe row: ``maybe_present = 1`` iff ALL
    k positions are set (zero false negatives; false positives at the
    documented rate and REPRODUCIBLE — the oracle computes the same
    bits).  The bit table is bounded by m rows/group, so it broadcasts
    onto the probe side; absent rows count as unset bits.

    The probe set is deduplicated on (group, value) INSIDE the
    function (ADVICE r11): the verdict compares a row count against
    ``len(BLOOM_SALTS)``, so a duplicated probe row would double its
    per-salt rows and flip a genuinely-present value to 0 — a false
    negative, breaking the filter's one hard guarantee.  Output stays
    one verdict row per distinct (group, value), which is what every
    caller joins back on."""
    from functools import reduce
    groups = list(group_cols or [])
    uniq = probes.select(*groups, value_col).distinct()
    keyed = [uniq.select(*groups, F.col(value_col),
                         _bloom_pos(value_col, salt, m).alias("pos"))
             for salt in BLOOM_SALTS]
    probe_pos = reduce(lambda a, b: a.unionByName(b), keyed)
    expected = set(groups) | {"pos"}
    if set(bits.columns) != expected:
        raise ValueError(
            f"bloom_probe: bit-table columns {sorted(bits.columns)} do "
            f"not match group_cols={groups} (expected exactly "
            f"{sorted(expected)}); pass the same group_cols used for "
            f"bloom_bits — a grouped filter probed ungrouped would "
            f"OR bits across groups")
    hit = bits.withColumn("_set", F.lit(1))
    joined = probe_pos.join(F.broadcast(hit), groups + ["pos"], "left")
    return (joined.groupBy(*groups, value_col)
            .agg((F.sum(F.coalesce(F.col("_set"), F.lit(0)))
                  == len(BLOOM_SALTS)).cast("int")
                 .alias("maybe_present")))
