"""Round-11 additions: full-oracle entries pinning the paths the
round's ADVICE fixes touched — a set statistic inside FILTER (the
spec maps now scan ``req.having``), NON EMPTY over an all-calculated
query (the test moved after the calc step), and signed running-
milestone streams (floor-division milestone indices on both engines)
— plus the SemDeDup cluster-blocked semantic dedup pair/corpus
entries (FULL ORACLE since r12: the frozen-coarse-center variant makes
the cell blocking exact integer arithmetic DuckDB reproduces; the
precision-1-by-construction + recall gates vs the exact GEMM pair
table remain as belt-and-braces).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..mdx import parse_mdx
from ..operators import prefix as P
from ..session import load_table
from ..workload_shared import CATALOG, MES_CASE, SUM_D, _FACT_OW, _OW, _eng

_REGION_SET = ("{ [Dim Customer].[Geografía].[Region].&[0], "
               "[Dim Customer].[Geografía].[Region].&[1], "
               "[Dim Customer].[Geografía].[Region].&[2], "
               "[Dim Customer].[Geografía].[Region].&[3], "
               "[Dim Customer].[Geografía].[Region].&[4] }")


def register(add) -> None:
    # FILTER condition referencing a set STATISTIC (ADVICE r10 fix 1:
    # these refs are collected from req.having now, not only from
    # req.calculated): keep the years whose total exceeds 5x the
    # MEDIAN region slice — with 5 near-even regions the ratio
    # hovers around 5.0, so the screen discriminates (keeps some,
    # drops some) at every gate SF (measured: 3 of 7 years at
    # sf0.001, 4 of 7 at sf0.01).
    def filter_setstat(spark, sf):
        return _eng(spark, sf).execute(parse_mdx(
            "SELECT { [Measures].[Sum Extendedprice] } ON COLUMNS, "
            "FILTER([D Tiempo].[Calendario].[Año].MEMBERS, "
            "[Measures].[Sum Extendedprice] > "
            f"5 * MEDIAN({_REGION_SET}, [Measures].[Sum Extendedprice]"
            ")) ON ROWS FROM [sales]", CATALOG))

    # MEDIAN over the odd-sized (5-member) set is the middle per-
    # region value on both engines — no interpolation, so the 5x
    # comparison is the same IEEE multiply+compare bit-for-bit.
    add("cube_filter_setstat_years", filter_setstat,
        f"""WITH {_OW},
        a AS (
          SELECT CAST(year(l_shipdate) AS INTEGER) AS anio,
                 cust_region_key AS rk,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                      AS DOUBLE) AS v
          FROM {_FACT_OW} GROUP BY 1, 2),
        tot AS (
          SELECT CAST(year(l_shipdate) AS INTEGER) AS anio,
                 {SUM_D('l_extendedprice')} AS sum_extendedprice
          FROM {_FACT_OW} GROUP BY 1),
        md AS (SELECT anio, MEDIAN(v) AS m FROM a GROUP BY 1)
        SELECT t.anio, t.sum_extendedprice
        FROM tot t JOIN md USING (anio)
        WHERE t.sum_extendedprice > 5 * md.m""")

    # NON EMPTY over an ALL-CALCULATED query (ADVICE r10 fix 3: the
    # test now runs on the calc cells after materialization instead of
    # silently no-op'ing): months where nation 21 bought brand
    # Brand#12 at all — the sparse-slice month screen.
    def nonempty_all_calc(spark, sf):
        return _eng(spark, sf).execute(parse_mdx(
            "WITH MEMBER [Measures].[N21 Qty] AS "
            "AGGREGATE({ [Dim Customer].[Geografía].[Region].&[1]"
            ".&[21] }, [Measures].[Sum Quantity]) "
            "SELECT { [Measures].[N21 Qty] } ON COLUMNS, "
            "NON EMPTY [D Tiempo].[Calendario].[Mes].MEMBERS "
            "DIMENSION PROPERTIES MEMBER_CAPTION ON ROWS "
            "FROM [sales] "
            "WHERE ([Dim Producto].[Producto].[Brand].&[Brand#12])",
            CATALOG))

    add("cube_nonempty_all_calc_months", nonempty_all_calc,
        f"""WITH {_OW},
        pv AS (SELECT p_partkey, p_brand FROM part),
        f AS (
          SELECT CAST(year(l_shipdate) AS INTEGER) AS anio,
                 {MES_CASE} AS mes, month(l_shipdate) AS mn,
                 l_quantity, cust_region_key, cust_nation_key
          FROM {_FACT_OW} JOIN pv ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#12'),
        a AS (
          SELECT anio, mes, mn,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                      FILTER (WHERE cust_region_key = 1
                              AND cust_nation_key = 21)
                      AS DOUBLE) AS n21_qty
          FROM f GROUP BY 1, 2, 3)
        SELECT anio, mes, n21_qty
        FROM a WHERE n21_qty IS NOT NULL""")

    # SIGNED running milestones (ADVICE r10 fix 5: Spark's div
    # truncates toward zero, the oracle's // floors — the engine now
    # floor-divides, so a mixed-sign stream is oracle-exact): the
    # value stream centered at its nominal 50.0000 mean becomes a
    # near-zero-drift walk whose up-crossings of 100-unit boundaries
    # are the reported milestones.
    def drawdown_milestones(spark, sf):
        df = load_table(spark, sf, "events").select(
            "event_id", "ts",
            ((F.col("value").cast("decimal(18,4)") * 10000)
             .cast("long") - 500000).alias("sv"),
            F.expr("unix_timestamp(ts) div 3600").alias("hb"))
        return P.running_milestones(
            df, "hb", ["ts", "event_id"], "sv",
            step=1_000_000, id_cols=["event_id"])

    # SemDeDup (cluster-blocked semantic near-dup) — FULL ORACLE since
    # r12 (VERDICT r11 task 1's "full-oracle entries only" rule): the
    # entries run the frozen-coarse-center variant (exact int64 cell
    # argmin against the learned-then-frozen centers in
    # operators/frozen_codebooks.py, trained once in Spark), so DuckDB
    # recomputes cells, candidate pairs and the exact cosine screen
    # bit-for-bit.  The trained-KMeans semantic_dedup_pairs stays the
    # library's adaptive path; the differential gates vs the exact
    # GEMM pair table remain — precision must be 1 BY CONSTRUCTION
    # (same exact cosine, same threshold; a violation means the
    # blocking emitted a phantom pair), recall floored at 0.7.
    def semantic_pairs(spark, sf):
        from ..operators import dedup as D
        from ..operators import similarity as S
        emb = load_table(spark, sf, "embeddings")
        out = S.semantic_dedup_pairs_frozen(emb, threshold=0.45,
                                            n_assign=3)
        if emb.count() <= 100_000:
            exact = {(r["id_a"], r["id_b"])
                     for r in D.embedding_near_dups(
                         emb, threshold=0.45).collect()}
            got = {(r["id_a"], r["id_b"]) for r in out.collect()}
            if not got <= exact:
                raise AssertionError(
                    f"emb_semantic_dedup_pairs: phantom pairs "
                    f"{sorted(got - exact)[:5]} not in the exact GEMM "
                    f"table (precision must be 1 by construction)")
            if exact and len(got & exact) / len(exact) < 0.7:
                raise AssertionError(
                    f"emb_semantic_dedup_pairs: recall "
                    f"{len(got & exact)}/{len(exact)} below floor 0.7")
        return out

    from .wave12 import SEM_CORPUS_ORACLE, SEM_PAIRS_ORACLE

    add("emb_semantic_dedup_pairs", semantic_pairs, SEM_PAIRS_ORACLE)

    # the deduplicated corpus itself: kept = all minus {id_b of pairs}
    # (greedy min-id representative); the in-entry check re-derives
    # the keep set from the pair table and compares EXACTLY.
    def semantic_corpus(spark, sf):
        from ..operators import similarity as S
        emb = load_table(spark, sf, "embeddings")
        kept = S.semantic_dedup_frozen(emb, threshold=0.45,
                                       n_assign=3).select("vec_id")
        if emb.count() <= 100_000:
            dropped = {r["id_b"] for r in S.semantic_dedup_pairs_frozen(
                emb, threshold=0.45, n_assign=3).collect()}
            want = {r["vec_id"] for r in emb.select("vec_id").collect()
                    } - dropped
            got = {r["vec_id"] for r in kept.collect()}
            if got != want:
                raise AssertionError(
                    f"emb_semantic_dedup_corpus: keep set diverges "
                    f"from the pair-table derivation "
                    f"(missing {sorted(want - got)[:5]}, "
                    f"extra {sorted(got - want)[:5]})")
        return kept

    add("emb_semantic_dedup_corpus", semantic_corpus, SEM_CORPUS_ORACLE)

    # Distributed connected components (large-star/small-star), full
    # oracle #1: minimal spanning CHAINS inside each source group (20
    # groups x 25 docs -> 24-deep chains, the contraction worst case)
    # must reunite to min(doc_id) per group — the oracle states the
    # group identity, the engine has to earn it transitively.
    def source_chain_components(spark, sf):
        from ..operators import graph as G
        from ..workload_shared import _docs
        return G.chain_components(_docs(spark, sf), "doc_id", "source")

    add("docs_source_chain_components", source_chain_components,
        """SELECT doc_id,
               CAST(MIN(doc_id) OVER (PARTITION BY source) AS BIGINT)
                 AS component
        FROM documents""")

    # Full oracle #2 — transitive NEAR-dup groups over the blocked
    # Levenshtein pair table: the engine runs CC on the pair edges;
    # the oracle computes the same pairs in SQL and closes them with
    # a recursive CTE (min label over the reachability set).  Only
    # nodes that appear in a pair are labeled (callers join back for
    # singletons), matching connected_components' contract.
    def neardup_components(spark, sf):
        from ..operators import dedup as D
        from ..workload_shared import _docs
        return D.soft_dedup_components(_docs(spark, sf), max_dist=20,
                                       prefix_chars=80, block_width=100)

    add("docs_neardup_components", neardup_components,
        """WITH RECURSIVE b AS (
          SELECT doc_id, lang, substring(text, 1, 80) AS pre,
                 CAST(floor(length(text) / 100.0) AS BIGINT) AS blk_len
          FROM documents),
        p AS (
          SELECT a.doc_id AS u, b2.doc_id AS v
          FROM b a JOIN b b2
            ON a.lang = b2.lang AND a.blk_len = b2.blk_len
           AND a.doc_id < b2.doc_id
          WHERE levenshtein(a.pre, b2.pre) <= 20),
        e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
        reach(n, m) AS (
          SELECT u, v FROM e
          UNION
          SELECT r.n, e2.v FROM reach r JOIN e e2 ON r.m = e2.u),
        lbl AS (
          SELECT n, LEAST(n, MIN(m)) AS component
          FROM reach GROUP BY n)
        SELECT CAST(n AS BIGINT) AS doc_id,
               CAST(component AS BIGINT) AS component
        FROM lbl""")

    # Soft dedup (full oracle): instead of DROPPING near-duplicates,
    # down-weight them — every doc's training weight is
    # 1 / |its transitive near-dup group| (exact integer ppm), the
    # keep-information-lose-redundancy alternative to hard dedup.
    # Composes the CC labels over the levenshtein pair table;
    # singletons weigh 1.0 (1,000,000 ppm).
    def softdedup_weights(spark, sf):
        from ..operators import dedup as D
        from ..workload_shared import _docs
        return D.soft_dedup_weights(_docs(spark, sf), max_dist=20,
                                    prefix_chars=80, block_width=100)

    add("docs_softdedup_weights", softdedup_weights,
        """WITH RECURSIVE b AS (
          SELECT doc_id, lang, substring(text, 1, 80) AS pre,
                 CAST(floor(length(text) / 100.0) AS BIGINT) AS blk_len
          FROM documents),
        p AS (
          SELECT a.doc_id AS u, b2.doc_id AS v
          FROM b a JOIN b b2
            ON a.lang = b2.lang AND a.blk_len = b2.blk_len
           AND a.doc_id < b2.doc_id
          WHERE levenshtein(a.pre, b2.pre) <= 20),
        e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
        reach(n, m) AS (
          SELECT u, v FROM e
          UNION
          SELECT r.n, e2.v FROM reach r JOIN e e2 ON r.m = e2.u),
        lbl AS (
          SELECT n, LEAST(n, MIN(m)) AS component
          FROM reach GROUP BY n),
        sz AS (
          SELECT component, COUNT(*) AS gsz FROM lbl GROUP BY 1)
        SELECT d.doc_id,
               CAST(COALESCE(sz.gsz, 1) AS INTEGER) AS group_size,
               CAST(1000000 // COALESCE(sz.gsz, 1) AS BIGINT)
                 AS weight_ppm
        FROM documents d
        LEFT JOIN lbl ON d.doc_id = lbl.n
        LEFT JOIN sz ON lbl.component = sz.component""")

    # Bloom-filter decontamination (full oracle, INCLUDING any false
    # positives — the bit positions are md5-derived like every sketch
    # in the family, so the SQL oracle reproduces the filter exactly):
    # the bounded-state alternative to docs_contamination_check's
    # exact vocabulary join — m bits of mergeable state instead of the
    # whole train shingle vocabulary.  Same contam-v1 split, same
    # 3-gram shingle convention.
    _BLOOM_M = 262_144    # kn/m ~ 0.25 at the fixture's ~16.5k vocab

    def bloom_decontaminate(spark, sf):
        from ..operators import dedup as D
        from ..operators import sketches as SK
        from ..operators.sampling import _hash_bucket
        from ..workload_shared import _docs
        docs = _docs(spark, sf)
        b = _hash_bucket(F.col("doc_id"), "contam-v1")
        test, train = docs.filter(b < 1000), docs.filter(b >= 1000)
        vocab = D.shingle_docs(train).select("shingle").distinct()
        bits = SK.bloom_bits(vocab, "shingle", m=_BLOOM_M)
        test_sh = D.shingle_docs(test)
        verdict = SK.bloom_probe(
            bits, test_sh.select("shingle").distinct(), "shingle",
            m=_BLOOM_M)
        return (test_sh.join(verdict, "shingle")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_shingles"),
                     F.sum("maybe_present").cast("bigint")
                     .alias("n_bloom_hits")))

    from ..operators.sampling import hash_bucket_sql
    from ..operators.sketches import BLOOM_SALTS, bloom_pos_sql
    _CB2 = hash_bucket_sql("doc_id", "contam-v1")
    _bpos = [bloom_pos_sql("shingle", s, _BLOOM_M) for s in BLOOM_SALTS]

    _BLOOM_ORACLE = rf"""WITH toks AS (
          SELECT doc_id, {_CB2} AS b,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, b,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        vocab AS (SELECT DISTINCT shingle FROM sh WHERE b >= 1000),
        bits AS (SELECT DISTINCT pos FROM (
          SELECT {_bpos[0]} AS pos FROM vocab
          UNION ALL SELECT {_bpos[1]} FROM vocab
          UNION ALL SELECT {_bpos[2]} FROM vocab
          UNION ALL SELECT {_bpos[3]} FROM vocab)),
        probe_sh AS (SELECT DISTINCT shingle FROM sh WHERE b < 1000),
        ppos AS (
          SELECT shingle, {_bpos[0]} AS pos FROM probe_sh
          UNION ALL SELECT shingle, {_bpos[1]} FROM probe_sh
          UNION ALL SELECT shingle, {_bpos[2]} FROM probe_sh
          UNION ALL SELECT shingle, {_bpos[3]} FROM probe_sh),
        verdict AS (
          SELECT p.shingle,
                 CASE WHEN COUNT(bt.pos) = 4 THEN 1 ELSE 0 END AS mp
          FROM ppos p LEFT JOIN bits bt USING (pos)
          GROUP BY p.shingle)
        SELECT s.doc_id, COUNT(*) AS n_shingles,
               CAST(SUM(v.mp) AS BIGINT) AS n_bloom_hits
        FROM sh s JOIN verdict v USING (shingle)
        WHERE s.b < 1000
        GROUP BY s.doc_id"""

    add("docs_bloom_decontaminate", bloom_decontaminate, _BLOOM_ORACLE)

    # STREAMING Bloom fold: the filter is built INCREMENTALLY over an
    # availableNow file stream of the train split (one doc_id slice
    # per micro-batch); each batch ORs its shingles' bit positions
    # into the durable sparse-bitmap store (union + distinct — the
    # Bloom merge, exact and batch-order-insensitive, so the folded
    # filter provably equals the one-shot build and the entry SHARES
    # the batch oracle).  Commit markers make replays no-ops; restart
    # recovery re-reads the last committed store.  This is streaming
    # decontamination at ingestion time: state is <= m rows, bounded
    # at any corpus size.
    def stream_bloom_fold(spark, sf):
        import hashlib
        import os
        import shutil

        from ..operators import dedup as D
        from ..operators import sketches as SK
        from ..operators.sampling import _hash_bucket
        from ..workload_shared import _docs
        docs = _docs(spark, sf)
        b = _hash_bucket(F.col("doc_id"), "contam-v1")
        test, train = docs.filter(b < 1000), docs.filter(b >= 1000)
        # Staged-fixture invalidation (ADVICE r11): the directory-inode
        # size is blind to same-size regenerated part files, so sign
        # the corpus with the SAME (path, size, mtime_ns) scheme as
        # ivf_build_index, over the actual parquet part files; and key
        # the staging root by a hash of the FULL sf path, not its
        # basename — two corpora named "sfX" elsewhere must not share
        # staged batches.
        sig_parts = []
        for p in sorted(docs.inputFiles()):
            local = p[len("file:"):] if p.startswith("file:") else p
            try:
                st = os.stat(local)
                sig_parts.append(f"{p}|{st.st_size}|{st.st_mtime_ns}")
            except OSError:
                sig_parts.append(p)       # remote FS: path-only term
        sig = hashlib.sha256("\n".join(sig_parts).encode()).hexdigest()
        sf_key = (os.path.basename(os.path.normpath(sf)) + "-"
                  + hashlib.sha256(os.path.abspath(sf).encode())
                  .hexdigest()[:12])
        root = os.path.join("/tmp", "olap_xtrctr_bloom_stream", sf_key)
        marker = os.path.join(root, "_DEMO_SRC")
        if not (os.path.exists(marker)
                and open(marker).read().strip() == sig):
            shutil.rmtree(root, ignore_errors=True)
            os.makedirs(os.path.join(root, "src"), exist_ok=True)
            b1, b2 = train.agg(
                F.expr("percentile(doc_id, 0.3333)"),
                F.expr("percentile(doc_id, 0.6667)")).first()
            conds = [F.col("doc_id") <= b1,
                     (F.col("doc_id") > b1) & (F.col("doc_id") <= b2),
                     F.col("doc_id") > b2]
            for i, cond in enumerate(conds):
                tmp = os.path.join(root, f"_tmp{i}")
                train.filter(cond).coalesce(1).write.mode(
                    "overwrite").parquet(tmp)
                part = next(f for f in os.listdir(tmp)
                            if f.startswith("part-")
                            and f.endswith(".parquet"))
                dst = os.path.join(root, "src", f"batch{i}.parquet")
                shutil.move(os.path.join(tmp, part), dst)
                shutil.rmtree(tmp)
                os.utime(dst, (1_000_000 + i, 1_000_000 + i))
            with open(marker, "w") as fh:
                fh.write(sig)
        out = os.path.join(root, "out")
        os.makedirs(out, exist_ok=True)
        state: dict = {"bits": None, "last": None}

        def fold(batch, batch_id: int) -> None:
            bspark = batch.sparkSession
            store = os.path.join(out, f"bits_b{batch_id}")
            cmark = os.path.join(out, f"_COMMITTED_b{batch_id}")
            if os.path.exists(cmark):
                state["bits"] = bspark.read.parquet(store)
                state["last"] = store
                return                     # replayed batch: no-op
            prev = state["bits"]
            if prev is None and batch_id > 0:    # restart recovery
                prev = bspark.read.parquet(
                    os.path.join(out, f"bits_b{batch_id - 1}"))
            vocab = D.shingle_docs(batch).select("shingle").distinct()
            new = SK.bloom_bits(vocab, "shingle", m=_BLOOM_M)
            merged = new if prev is None else SK.bloom_merge(prev, new)
            merged.write.mode("overwrite").parquet(store)
            open(cmark, "w").close()
            state["bits"] = bspark.read.parquet(store)
            state["last"] = store

        q = (spark.readStream.schema(train.schema)
             .option("maxFilesPerTrigger", 1)
             .parquet(os.path.join(root, "src"))
             .writeStream.foreachBatch(fold)
             .option("checkpointLocation", os.path.join(root, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        import glob as _glob
        last = state["last"] or sorted(
            _glob.glob(os.path.join(out, "bits_b*")))[-1]
        bits = spark.read.parquet(last)
        test_sh = D.shingle_docs(test)
        verdict = SK.bloom_probe(
            bits, test_sh.select("shingle").distinct(), "shingle",
            m=_BLOOM_M)
        return (test_sh.join(verdict, "shingle")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_shingles"),
                     F.sum("maybe_present").cast("bigint")
                     .alias("n_bloom_hits")))

    add("docs_stream_bloom_fold", stream_bloom_fold, _BLOOM_ORACLE)

    # NOTE: DuckDB's integer ``//`` TRUNCATES toward zero (unlike
    # python's, which floors) — the oracle spells FLOOR division out
    # explicitly so both engines use the same milestone indices on the
    # negative side of the walk.
    add("events_value_drawdown_milestones", drawdown_milestones,
        """WITH v AS (
          SELECT event_id, ts,
                 CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                   - 500000 AS sv
          FROM events),
        r AS (
          SELECT event_id, sv,
                 SUM(sv) OVER (ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
          FROM v),
        r2 AS (
          SELECT event_id, sv, running,
                 (running // 1000000)
                   - (CASE WHEN running < 0
                           AND running % 1000000 <> 0
                      THEN 1 ELSE 0 END) AS hi,
                 ((running - sv) // 1000000)
                   - (CASE WHEN (running - sv) < 0
                           AND (running - sv) % 1000000 <> 0
                      THEN 1 ELSE 0 END) AS lo
          FROM r)
        SELECT event_id,
               CAST(hi AS BIGINT) AS milestone,
               CAST(hi - lo AS BIGINT) AS n_crossed,
               CAST(running AS BIGINT) AS running
        FROM r2 WHERE hi > lo""")
