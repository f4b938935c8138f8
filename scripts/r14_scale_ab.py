"""r14 scale-side A/B (VERDICT r13 item 1): run the structurally
reworked queries at ~sf1 (10x key-shifted replicas; embeddings as 10x
PERTURBED replicas so ANN doesn't degenerate) with the OLD (r12) and
NEW shapes monkeypatch-alternated in the same process, at the core
count given by $SPARK_GRAFT_CPUS.  The claim under test: the reworked
shapes' 8->32-core scaling and absolute times beat the old shapes'
once data volume, not fixed cost, dominates.

OLD shapes are verbatim copies from commit a5c4356 (the r12-graded
code) and from the pre-r14 simhash; NEW shapes are the committed
operators, driven through the real WORKLOAD entries where the entry
wrapper adds no scale-relevant work.

Usage: SPARK_GRAFT_CPUS=32 python scripts/r14_scale_ab.py \
           [scratch] [passes] [filter]
Builds the replica into `scratch` if absent (delete to rebuild).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from pyspark.sql import functions as F

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark import session as SESS
from olap_xtrctr_spark.operators import dedup as D
from olap_xtrctr_spark.operators import similarity as S
from olap_xtrctr_spark.session import load_table, release_tracked_caches
from olap_xtrctr_spark.workload import WORKLOAD

SCRATCH = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sp_r14"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 2
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None
EPS = 0.03


def build_replica(spark) -> None:
    if os.path.isdir(SCRATCH) and os.path.exists(
            f"{SCRATCH}/embeddings.parquet"):
        print(f"# replica {SCRATCH} exists", file=sys.stderr)
        return
    argv, sys.argv = sys.argv, [sys.argv[0]]   # scale_probe parses argv
    try:
        import scale_probe as SP
    finally:
        sys.argv = argv
    SP.FACTOR, SP.SCRATCH = 10, SCRATCH
    SP.build(spark)
    # swap the ASIS embeddings copy for 10x PERTURBED replicas
    # (ann_scale_probe recipe): replica k of vec v = v + eps*noise(k,i),
    # deterministic, so every family is a known near-dup cluster
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    shift = base.agg(F.max("vec_id")).first()[0] + 1

    def perturbed(k: int):
        return F.transform(
            "embedding",
            lambda x, i: x + F.lit(EPS) * (
                (F.xxhash64(F.col("vec_id"), F.lit(k), i) % 2001 - 1000)
                / F.lit(1000.0)).cast("float"))

    parts = [base]
    for k in range(1, 10):
        parts.append(base.select(
            (F.col("vec_id") + k * shift).alias("vec_id"),
            perturbed(k).alias("embedding"), "label"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    os.remove(f"{SCRATCH}/embeddings.parquet")
    out.write.mode("overwrite").parquet(f"{SCRATCH}/embeddings.parquet")
    print("# built 10x perturbed embeddings", file=sys.stderr)


# ---------------- OLD shapes (verbatim from a5c4356 / pre-r14) -------------

def old_ngram_pair_counts(docs, text_col, id_col, n, max_doc_freq,
                          op_name):
    ex = D.shingle_docs(docs, text_col, id_col, n)
    posting = ex.groupBy("shingle").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids"))
    sizes = (posting.select(F.explode("ids").alias("_sid"))
                    .groupBy("_sid").agg(F.count(F.lit(1)).alias("sz")))
    posting = posting.filter(F.size("ids") > 1)
    if max_doc_freq is not None:
        posting = posting.filter(F.size("ids") <= max_doc_freq)
    pairs = posting.select(F.explode(F.expr(
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "b -> struct(a AS id_a, b AS id_b))))")).alias("p")
    ).select("p.id_a", "p.id_b")
    inter = pairs.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("inter"))
    sa = sizes.select(F.col("_sid").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_sid").alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa.hint("shuffle_hash"), "id_a")
                 .join(sb.hint("shuffle_hash"), "id_b"))


def old_minhash_lsh_pairs(docs, text_col="text", id_col="doc_id", n=3,
                          num_hashes=32, bands=8, threshold=0.5):
    sig = D.minhash_signatures(docs, text_col, id_col, n, num_hashes)
    rows_per_band = num_hashes // bands
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[f"h{b * rows_per_band + i}"
                              for i in range(rows_per_band)])
                 .alias("bucket"))
        for b in range(bands)]
    banded = sig.select(
        id_col, F.explode(F.array(*band_cols)).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    cand = (banded.alias("a")
            .join(banded.alias("b"),
                  (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.bucket") == F.col("b.bucket"))
                  & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    sa = sig.select(F.col(id_col).alias("id_a"),
                    *[F.col(f"h{i}").alias(f"a{i}")
                      for i in range(num_hashes)])
    sb = sig.select(F.col(id_col).alias("id_b"),
                    *[F.col(f"h{i}").alias(f"b{i}")
                      for i in range(num_hashes)])
    scored = cand.join(sa, "id_a").join(sb, "id_b")
    sim = sum([(F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
               for i in range(num_hashes)]) / num_hashes
    return (scored.filter(sim >= threshold)
                  .withColumn("est_jaccard", F.round(sim, 4))
                  .select("id_a", "id_b", "est_jaccard"))


def old_tpch_q2(spark, sf):
    from pyspark.sql import Window
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    p = load_table(spark, sf, "part")
    eur = (s.join(F.broadcast(n),
                  F.col("s_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    offers = (li.join(F.broadcast(eur),
                      F.col("l_suppkey") == F.col("s_suppkey"))
              .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal",
                       "n_name")
              .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                   .alias("unit_price")))
    tgt = p.filter((F.col("p_size") == 10)
                   & (F.col("p_type") == "SMALL")) \
           .select("p_partkey", "p_name")
    cand = offers.join(F.broadcast(tgt),
                       F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    return (cand.withColumn("best", F.min("unit_price").over(w))
            .filter(F.col("unit_price") == F.col("best"))
            .select("p_partkey", "p_name", "s_name", "s_acctbal",
                    "n_name", "unit_price"))


def old_tpch_q21(spark, sf):
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    s = load_table(spark, sf, "supplier")
    li_f = li.join(o.filter(F.col("o_orderstatus") == "F")
                   .select("o_orderkey"),
                   F.col("l_orderkey") == F.col("o_orderkey"),
                   "left_semi")
    per_os = (li_f.groupBy("l_orderkey", "l_suppkey")
              .agg(F.max(F.when(F.col("l_returnflag") == "R", 1)
                         .otherwise(0)).alias("has_ret")))
    per_order = (per_os.groupBy("l_orderkey")
                 .agg(F.count(F.lit(1)).alias("n_supp"),
                      F.sum("has_ret").alias("n_ret_supp")))
    blamed = (per_os.filter(F.col("has_ret") == 1)
              .join(per_order.filter((F.col("n_supp") > 1)
                                     & (F.col("n_ret_supp") == 1)),
                    "l_orderkey", "left_semi"))
    return (blamed.join(F.broadcast(s),
                        F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait")))


def old_md5_lsh_buckets(emb, n_tables, bits_per_table, id_col, vec_col,
                        quant_scale):
    import hashlib
    spark = emb.sparkSession
    dim = emb.select(F.size(vec_col).alias("d")).first()["d"]
    rows = []
    for t in range(n_tables):
        for b in range(bits_per_table):
            for i in range(dim):
                nib = int(hashlib.md5(
                    f"lshplane:{t}:{b}:{i}".encode()).hexdigest()[0], 16)
                rows.append((t, b, i, 1 if nib >= 8 else -1))
    planes = spark.createDataFrame(rows, "t int, b int, i int, c long")
    q = emb.select(
        F.col(id_col),
        F.posexplode(F.expr(
            f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE)"
            f" * {quant_scale} + 0.5) AS BIGINT))")).alias("i", "qv"))
    dots = (q.join(F.broadcast(planes), "i")
             .groupBy(id_col, "t", "b")
             .agg(F.sum(F.col("c") * F.col("qv")).alias("d")))
    return (dots.groupBy(id_col, "t")
            .agg(F.sum(F.when(F.col("d") >= 0,
                              F.expr("CAST(power(2, b) AS BIGINT)"))
                       .otherwise(F.lit(0).cast("long")))
                 .alias("bucket")))


def old_simhash_kernel(docs, text_col, id_col, hash_sql, bits):
    toks = docs.select(
        id_col, F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                  r"\s+")).alias("tok"))
    if hash_sql == D._XXHASH64_TOKEN_SQL:
        toks = toks.select(id_col, F.xxhash64("tok").alias("_h"))
        votes = [
            F.sum(F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1,
                         1).otherwise(-1)).alias(f"v{i}")
            for i in range(bits)]
    else:
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10) \
            .cast("bigint")
        toks = toks.select(id_col, h.alias("_h"))
        votes = [
            F.sum(F.when(F.expr(f"(_h DIV {2 ** i}) % 2") == 1, 1)
                   .otherwise(-1)).alias(f"v{i}")
            for i in range(bits)]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = sum([
        F.when(F.col(f"v{i}") > 0,
               F.lit(1).cast("long") * (2 ** i if i < 63 else -(2 ** 63)))
         .otherwise(0)
        for i in range(bits)])
    return agg.select(id_col, sig.alias("simhash"))


def main() -> None:
    spark = get_spark("r14-scale-ab")
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)
    sf = SCRATCH
    emb = lambda: load_table(spark, sf, "embeddings")

    new_core = D._ngram_pair_counts
    new_minhash = D.minhash_lsh_pairs
    new_buckets = S._md5_lsh_buckets
    new_simk = D._simhash_kernel
    new_pin = SESS.track_persist

    def set_arm(arm: str) -> None:
        old = arm == "old"
        D._ngram_pair_counts = old_ngram_pair_counts if old else new_core
        D.minhash_lsh_pairs = old_minhash_lsh_pairs if old else new_minhash
        S._md5_lsh_buckets = old_md5_lsh_buckets if old else new_buckets
        D._simhash_kernel = old_simhash_kernel if old else new_simk

    # (name, fn(arm) -> DataFrame, arms)
    CASES = [
        ("docs_ngram_jaccard_pairs",
         lambda arm: WORKLOAD["docs_ngram_jaccard_pairs"].fn(spark, sf),
         ("old", "new")),
        ("docs_minhash_lsh_pairs",
         lambda arm: WORKLOAD["docs_minhash_lsh_pairs"].fn(spark, sf),
         ("old", "new")),
        ("docs_simhash_pairs_exact",
         lambda arm: WORKLOAD["docs_simhash_pairs_exact"].fn(spark, sf),
         ("old", "new")),
        ("tpch_q2_min_cost_supplier",
         lambda arm: (old_tpch_q2(spark, sf) if arm == "old"
                      else WORKLOAD["tpch_q2_min_cost_supplier"]
                      .fn(spark, sf)),
         ("old", "new")),
        ("tpch_q21_waiting_orders",
         lambda arm: (old_tpch_q21(spark, sf) if arm == "old"
                      else WORKLOAD["tpch_q21_waiting_orders"]
                      .fn(spark, sf)),
         ("old", "new")),
        # operator driven directly (the entry wrapper adds recall gates
        # tuned to the real fixture, not scale-relevant work)
        ("emb_lsh_near_dup_pairs_exact",
         lambda arm: S.lsh_near_dup_pairs_md5(emb(), threshold=0.45),
         ("old", "new")),
        # emb_semantic_dedup_pairs is EXCLUDED from the ~sf1 harness
        # (measured, first run of this script): 10x perturbed replicas
        # concentrate ~10 near-identical vectors per family, the frozen
        # cells stay few, and the WITHIN-CELL self-join goes quadratic
        # — the old (unpinned) arm spilled until the disk filled
        # (SPILL_OUT_OF_MEMORY, ~80 GB) at 20k vectors.  That join is
        # the same in both arms (the r13 pin removes recomputed
        # ASSIGNMENTS, not join volume), so the sf1 A/B cannot isolate
        # the pin; the r13 sf0.1 evidence (25.8 -> 6.4 s) stands.
        # plan unchanged since r12 — scaling ratio evidence only
        ("tpch_q5_local_supplier",
         lambda arm: WORKLOAD["tpch_q5_local_supplier"].fn(spark, sf),
         ("new",)),
        ("tpch_q9_product_profit",
         lambda arm: WORKLOAD["tpch_q9_product_profit"].fn(spark, sf),
         ("new",)),
        ("cube_nation_sales",
         lambda arm: WORKLOAD["cube_nation_sales"].fn(spark, sf),
         ("new",)),
    ]
    cases = CASES if ONLY is None else [
        c for c in CASES if any(s in c[0] for s in ONLY)]

    results: dict[str, list[float]] = {}
    for p in range(PASSES):
        for name, make, arms in cases:
            for arm in arms:
                set_arm(arm)
                # the old semantic-dedup shape = the pin monkeypatched
                # out (3x assignment evaluation)
                SESS.track_persist = (
                    (lambda df, storage_level=None: df)
                    if (arm == "old" and name == "emb_semantic_dedup_pairs")
                    else new_pin)
                spark.sparkContext.setJobDescription(
                    f"scaleAB {arm} {name} pass{p}")
                t0 = time.perf_counter()
                n = make(arm).count()
                dt = time.perf_counter() - t0
                release_tracked_caches()
                results.setdefault(f"{name}:{arm}", []).append(dt)
                print(f"# pass{p} {arm:3s} {name}: {dt:.2f}s rows={n}",
                      file=sys.stderr)
    set_arm("new")
    SESS.track_persist = new_pin
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    for k in sorted(results):
        ts = sorted(results[k])
        print(f"cpus={cpus} {k}: med={ts[len(ts)//2]:.2f} "
              f"min={ts[0]:.2f} all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
