"""Round-12 additions (VERDICT r11 task 2): the frozen-codebook
full-oracle ANN twins.

The rows-only PQ/IVFPQ entries quantize with LEARNED codebooks (not
SQL-expressible); these twins run the SAME serving algorithms (exact-
int code assignment → integer ADC → exact re-rank) against the
learned-then-frozen integer codebooks in operators/frozen_codebooks.py,
whose constants are emitted as literal VALUES into the DuckDB oracle —
the freeze discipline that closed the md5-LSH family in r10.  Every
scoring step is exact int64 arithmetic; only the re-rank touches float
cosine (the convention every emb_* oracle already matches bit-for-bit).

This module also owns the shared SQL fragments the frozen oracles use
(wave11's upgraded SemDeDup entries import them from here).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import frozen_codebooks as FC
from ..session import load_table

# ---- shared oracle fragments ------------------------------------------------

#: floor(x·10⁴) int quantization — mirror of similarity._vint_expr
VINT_SQL = ("list_transform(embedding, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {FC.SCALE}.0) AS BIGINT))")

#: the engine-wide exact float cosine convention (a=query side rows
#: aliased q/e or a/b by the caller)
COS_QE = """list_sum(list_transform(list_zip(q.qvec, e.embedding),
       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
     / (sqrt(list_sum(list_transform(q.qvec,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      * sqrt(list_sum(list_transform(e.embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""

COS_AB = """list_sum(list_transform(list_zip(a.embedding, b.embedding),
       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
     / (sqrt(list_sum(list_transform(a.embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      * sqrt(list_sum(list_transform(b.embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""


def coarse_values_sql() -> str:
    """(cell, cen BIGINT[]) VALUES rows for the frozen coarse centers."""
    return ",".join(f"({i}, {list(c)}::BIGINT[])"
                    for i, c in enumerate(FC.COARSE_CENTERS_I))


def _book_values_sql(books) -> str:
    """(s, c, cen BIGINT[]) VALUES rows for a per-subspace codebook."""
    return ",".join(f"({s}, {c}, {list(cen)}::BIGINT[])"
                    for s, book in enumerate(books)
                    for c, cen in enumerate(book))


def frozen_cells_sql(n_assign: int) -> str:
    """CTE body: each vector's ``n_assign`` nearest frozen coarse cells
    (exact int64 L2, ties to the lower cell id) — expects a ``cc(cell,
    cen)`` VALUES CTE in scope; yields ``cells(vec_id, cell)``."""
    return f"""vi AS (SELECT vec_id, embedding, {VINT_SQL} AS vint
           FROM embeddings),
        cdist AS (
          SELECT v.vec_id, cc.cell,
                 list_sum(list_transform(list_zip(v.vint, cc.cen),
                   p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2
          FROM vi v, cc),
        cells AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
            FROM cdist) WHERE rn <= {n_assign})"""


# SemDeDup oracles over the frozen cells — shared by wave11's upgraded
# emb_semantic_dedup_pairs/_corpus entries and the r12 streaming fold
# (which provably equals the batch corpus on id-ordered batches).
SEM_PAIRS_ORACLE = f"""WITH cc(cell, cen) AS (VALUES {coarse_values_sql()}),
        {frozen_cells_sql(3)},
        cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                 FROM cells x JOIN cells y
                   ON x.cell = y.cell AND x.vec_id < y.vec_id)
        SELECT c.id_a, c.id_b, ROUND({COS_AB}, 4) AS cosine
        FROM cand c JOIN embeddings a ON a.vec_id = c.id_a
                    JOIN embeddings b ON b.vec_id = c.id_b
        WHERE {COS_AB} >= 0.45"""

SEM_CORPUS_ORACLE = f"""WITH cc(cell, cen) AS (VALUES {coarse_values_sql()}),
        {frozen_cells_sql(3)},
        cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                 FROM cells x JOIN cells y
                   ON x.cell = y.cell AND x.vec_id < y.vec_id),
        dropped AS (SELECT DISTINCT c.id_b
                    FROM cand c
                    JOIN embeddings a ON a.vec_id = c.id_a
                    JOIN embeddings b ON b.vec_id = c.id_b
                    WHERE {COS_AB} >= 0.45)
        SELECT e.vec_id FROM embeddings e
        WHERE e.vec_id NOT IN (SELECT id_b FROM dropped)"""

_QIDS = "(0, 1, 2, 3, 4)"
# refine=32 / n_probe=5: the frozen grid (8×16 codebooks trained once)
# is coarser than the learned per-corpus quantizers, so the shortlist
# and probe budget are wider — measured planted recall@1 at sf0.01:
# pq 12/14, ivfpq 14/14 (tests/test_recall.py pins the floors).  The
# shortlist stays k·refine = 96 rows per query at ANY corpus size.
_K, _REFINE, _NPROBE = 3, 32, 5
_SUB = FC.SUB_D


def _pq_exact_oracle() -> str:
    short = _K * _REFINE
    return f"""WITH cb(s, c, cen) AS (VALUES {_book_values_sql(FC.PQ_CODEBOOKS_I)}),
        vi AS (SELECT vec_id, embedding, {VINT_SQL} AS vint
               FROM embeddings),
        dist AS (
          SELECT v.vec_id, cb.s, cb.c,
                 list_sum(list_transform(
                   list_zip(v.vint[(cb.s*{_SUB}+1):(cb.s*{_SUB}+{_SUB})],
                            cb.cen),
                   p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
          FROM vi v, cb),
        codes AS (
          SELECT vec_id, s, c AS code FROM (
            SELECT vec_id, s, c,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                     ORDER BY d, c) AS rn
            FROM dist) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding AS qvec, vint AS qint
              FROM vi WHERE vec_id IN {_QIDS}),
        lut AS (
          SELECT q.query_id, cb.s, cb.c,
                 list_sum(list_transform(
                   list_zip(q.qint[(cb.s*{_SUB}+1):(cb.s*{_SUB}+{_SUB})],
                            cb.cen),
                   p -> p[1]*p[2])) AS partial
          FROM q, cb),
        norms AS (SELECT vec_id,
                    sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nnorm
                  FROM embeddings),
        adc AS (
          SELECT l.query_id, c.vec_id AS neighbor_id,
                 SUM(l.partial) AS adc_dot
          FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.c
          WHERE c.vec_id <> l.query_id GROUP BY 1, 2),
        sc AS (SELECT a.query_id, a.neighbor_id,
                      CAST(a.adc_dot AS DOUBLE) / n.nnorm AS score
               FROM adc a JOIN norms n ON a.neighbor_id = n.vec_id),
        short AS (SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id) AS rn
            FROM sc) WHERE rn <= {short}),
        re AS (SELECT s.query_id, s.neighbor_id, {COS_QE} AS cos
               FROM short s
               JOIN embeddings e ON e.vec_id = s.neighbor_id
               JOIN q ON q.query_id = s.query_id)
        SELECT query_id, rank, neighbor_id, ROUND(cos, 4) AS cosine FROM (
          SELECT query_id, neighbor_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
          FROM re) WHERE rank <= {_K}"""


def _ivfpq_exact_oracle() -> str:
    short = _K * _REFINE
    return f"""WITH cc(cell, cen) AS (VALUES {coarse_values_sql()}),
        rb(s, c, cen) AS (VALUES {_book_values_sql(FC.RESIDUAL_CODEBOOKS_I)}),
        vi AS (SELECT vec_id, embedding, {VINT_SQL} AS vint
               FROM embeddings),
        cd AS (SELECT v.vec_id, cc.cell,
                 list_sum(list_transform(list_zip(v.vint, cc.cen),
                   p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2
               FROM vi v, cc),
        asg AS (SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn FROM cd)
          WHERE rn = 1),
        res AS (SELECT v.vec_id, a.cell,
                 list_transform(list_zip(v.vint, cc.cen),
                   p -> p[1]-p[2]) AS rint
               FROM vi v JOIN asg a USING (vec_id)
               JOIN cc ON cc.cell = a.cell),
        dist AS (SELECT r.vec_id, r.cell, rb.s, rb.c,
                 list_sum(list_transform(
                   list_zip(r.rint[(rb.s*{_SUB}+1):(rb.s*{_SUB}+{_SUB})],
                            rb.cen),
                   p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
               FROM res r, rb),
        codes AS (SELECT vec_id, cell, s, c AS code FROM (
            SELECT vec_id, cell, s, c,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                     ORDER BY d, c) AS rn
            FROM dist) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding AS qvec, vint AS qint
              FROM vi WHERE vec_id IN {_QIDS}),
        qd AS (SELECT q.query_id, cc.cell,
                 list_sum(list_transform(list_zip(q.qint, cc.cen),
                   p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2,
                 list_sum(list_transform(list_zip(q.qint, cc.cen),
                   p -> p[1]*p[2])) AS qc_dot
               FROM q, cc),
        probes AS (SELECT query_id, cell, qc_dot FROM (
            SELECT query_id, cell, qc_dot,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY d2, cell) AS rn
            FROM qd) WHERE rn <= {_NPROBE}),
        lut AS (SELECT q.query_id, rb.s, rb.c,
                 list_sum(list_transform(
                   list_zip(q.qint[(rb.s*{_SUB}+1):(rb.s*{_SUB}+{_SUB})],
                            rb.cen),
                   p -> p[1]*p[2])) AS partial
               FROM q, rb),
        norms AS (SELECT vec_id,
                    sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nnorm
                  FROM embeddings),
        adc AS (SELECT p.query_id, c2.vec_id AS neighbor_id,
                       MIN(p.qc_dot) + SUM(l.partial) AS adc_dot
                FROM codes c2
                JOIN probes p ON p.cell = c2.cell
                JOIN lut l ON l.query_id = p.query_id
                          AND l.s = c2.s AND l.c = c2.code
                WHERE c2.vec_id <> p.query_id
                GROUP BY 1, 2),
        sc AS (SELECT a.query_id, a.neighbor_id,
                      CAST(a.adc_dot AS DOUBLE) / n.nnorm AS score
               FROM adc a JOIN norms n ON a.neighbor_id = n.vec_id),
        short AS (SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id) AS rn
            FROM sc) WHERE rn <= {short}),
        re AS (SELECT s.query_id, s.neighbor_id, {COS_QE} AS cos
               FROM short s
               JOIN embeddings e ON e.vec_id = s.neighbor_id
               JOIN q ON q.query_id = s.query_id)
        SELECT query_id, rank, neighbor_id, ROUND(cos, 4) AS cosine FROM (
          SELECT query_id, neighbor_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
          FROM re) WHERE rank <= {_K}"""


def register(add) -> None:
    from ..operators import similarity as S

    # PQ with frozen codebooks: full-oracle twin of emb_pq_topk (the
    # learned-codebook original keeps its recall gate; this twin pins
    # the ADC/shortlist/re-rank machinery value-exactly).
    def pq_exact(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return S.pq_topk_frozen(emb, [0, 1, 2, 3, 4], k=_K,
                                refine=_REFINE)

    add("emb_pq_topk_exact", pq_exact, _pq_exact_oracle())

    # IVFPQ (coarse cells + residual PQ) with frozen centers/codebooks:
    # full-oracle twin of emb_ivfpq_topk.
    def ivfpq_exact(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return S.ivfpq_topk_frozen(emb, [0, 1, 2, 3, 4], k=_K,
                                   n_probe=_NPROBE, refine=_REFINE)

    add("emb_ivfpq_topk_exact", ivfpq_exact, _ivfpq_exact_oracle())

    # IVF coarse-pruning with frozen centers: full-oracle twin of
    # emb_ivf_topk (cells + probes exact-int, scoring exact cosine
    # over probed cells only).
    def ivf_exact(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return S.ivf_topk_frozen(emb, [0, 1, 2, 3, 4], k=_K,
                                 n_probe=_NPROBE)

    _IVF_EXACT_SQL = f"""WITH cc(cell, cen) AS (VALUES {coarse_values_sql()}),
        {frozen_cells_sql(1)},
        q AS (SELECT vec_id AS query_id, embedding AS qvec,
                     {VINT_SQL} AS qint
              FROM embeddings WHERE vec_id IN {_QIDS}),
        qd AS (SELECT q.query_id, cc.cell,
                 list_sum(list_transform(list_zip(q.qint, cc.cen),
                   p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2
               FROM q, cc),
        probes AS (SELECT query_id, cell FROM (
            SELECT query_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY d2, cell) AS rn
            FROM qd) WHERE rn <= {_NPROBE}),
        cand AS (SELECT p.query_id, c.vec_id AS neighbor_id
                 FROM cells c JOIN probes p ON p.cell = c.cell
                 WHERE c.vec_id <> p.query_id),
        sc AS (SELECT cd.query_id, cd.neighbor_id, {COS_QE} AS cos
               FROM cand cd
               JOIN embeddings e ON e.vec_id = cd.neighbor_id
               JOIN q ON q.query_id = cd.query_id)
        SELECT query_id, rank, neighbor_id, ROUND(cos, 4) AS cosine FROM (
          SELECT query_id, neighbor_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
          FROM sc) WHERE rank <= {_K}"""

    add("emb_ivf_topk_exact", ivf_exact, _IVF_EXACT_SQL)

    # Cluster-balanced sampling with frozen cells: full-oracle twin of
    # emb_cluster_balanced_sample (frozen argmin cell + the md5
    # hash-rank permutation every sampling oracle already matches).
    def cbal_exact(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return S.cluster_balanced_sample_frozen(emb, k_per_cluster=5)

    _CBAL_SQL = f"""WITH cc(cell, cen) AS (VALUES {coarse_values_sql()}),
        {frozen_cells_sql(1)},
        r AS (SELECT vec_id, cell AS cluster,
                 ROW_NUMBER() OVER (PARTITION BY cell ORDER BY
                   md5(concat(CAST(vec_id AS VARCHAR), ':cbal-v1')),
                   vec_id) AS rank
              FROM cells)
        SELECT vec_id, CAST(cluster AS INTEGER) AS cluster,
               CAST(rank AS INTEGER) AS rank
        FROM r WHERE rank <= 5"""

    add("emb_cluster_balanced_exact", cbal_exact, _CBAL_SQL)

    # STREAMING semantic dedup at ingestion time: the corpus arrives as
    # an availableNow file stream in vec_id-ordered micro-batches; each
    # batch assigns its vectors to their frozen cells, screens them
    # against the durable same-cell store of EVERYTHING processed so
    # far (dropped vectors still block larger ids — the greedy min-id
    # rule is "any smaller-id near-dup", not "any surviving one") plus
    # its own smaller-id batch-mates, and appends itself to the store.
    # With id-ordered batches the kept set provably equals the batch
    # semantic_dedup_frozen corpus, so the entry SHARES that oracle.
    # Commit markers make replays no-ops; restart recovery re-reads the
    # last committed store version.  State is the cell-exploded corpus
    # itself (an index, partitioned by the join key — never driver
    # state), and each batch touches only its own cells' rows.
    def stream_semantic_dedup(spark, sf):
        import hashlib
        import os
        import shutil

        from ..operators import similarity as S
        from ..operators.frozen_codebooks import COARSE_CENTERS_I
        emb = load_table(spark, sf, "embeddings")
        sig_parts = []
        for p in sorted(emb.inputFiles()):
            local = p[len("file:"):] if p.startswith("file:") else p
            try:
                st = os.stat(local)
                sig_parts.append(f"{p}|{st.st_size}|{st.st_mtime_ns}")
            except OSError:
                sig_parts.append(p)
        sig = hashlib.sha256("\n".join(sig_parts).encode()).hexdigest()
        sf_key = (os.path.basename(os.path.normpath(sf)) + "-"
                  + hashlib.sha256(os.path.abspath(sf).encode())
                  .hexdigest()[:12])
        root = os.path.join("/tmp", "olap_xtrctr_semdedup_stream",
                            sf_key)
        marker = os.path.join(root, "_DEMO_SRC")
        if not (os.path.exists(marker)
                and open(marker).read().strip() == sig):
            shutil.rmtree(root, ignore_errors=True)
            os.makedirs(os.path.join(root, "src"), exist_ok=True)
            b1, b2 = emb.agg(
                F.expr("percentile(vec_id, 0.3333)"),
                F.expr("percentile(vec_id, 0.6667)")).first()
            conds = [F.col("vec_id") <= b1,
                     (F.col("vec_id") > b1) & (F.col("vec_id") <= b2),
                     F.col("vec_id") > b2]
            for i, cond in enumerate(conds):
                tmp = os.path.join(root, f"_tmp{i}")
                emb.filter(cond).coalesce(1).write.mode(
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
        cells_of = S._argmin_cells_expr("_vint", COARSE_CENTERS_I, 3)
        state: dict = {"store": None, "last_v": -1}

        def assigned(df):
            return (df.select("vec_id", "embedding")
                    .withColumn("_vint",
                                F.expr(S._vint_expr("embedding")))
                    .withColumn("cell", F.explode(F.expr(cells_of)))
                    .drop("_vint"))

        def fold(batch, batch_id: int) -> None:
            bspark = batch.sparkSession
            store = os.path.join(out, f"store_b{batch_id}")
            drops = os.path.join(out, f"dropped_b{batch_id}")
            cmark = os.path.join(out, f"_COMMITTED_b{batch_id}")
            if os.path.exists(cmark):
                state["store"] = bspark.read.parquet(store)
                state["last_v"] = batch_id
                return                     # replayed batch: no-op
            prev = state["store"]
            if prev is None and batch_id > 0:    # restart recovery
                prev = bspark.read.parquet(
                    os.path.join(out, f"store_b{batch_id - 1}"))
            bc = assigned(batch)
            blockers = bc.select(
                "cell", F.col("vec_id").alias("id_a"),
                F.col("embedding").alias("_va"))
            if prev is not None:
                blockers = prev.select(
                    "cell", F.col("vec_id").alias("id_a"),
                    F.col("embedding").alias("_va")).unionByName(blockers)
            probe = bc.select("cell", F.col("vec_id").alias("id_b"),
                              F.col("embedding").alias("_vb"))
            dropped = (blockers.join(probe, "cell")
                       .filter(F.col("id_a") < F.col("id_b"))
                       .dropDuplicates(["id_a", "id_b"])
                       .filter(S._cosine(F.col("_va"), F.col("_vb"))
                               >= 0.45)
                       .select(F.col("id_b").alias("vec_id"))
                       .distinct())
            if batch_id > 0:
                dropped = dropped.unionByName(
                    bspark.read.parquet(
                        os.path.join(out, f"dropped_b{batch_id - 1}"))
                ).distinct()
            dropped.write.mode("overwrite").parquet(drops)
            merged = bc if prev is None else prev.unionByName(bc)
            merged.write.mode("overwrite").parquet(store)
            open(cmark, "w").close()
            state["store"] = bspark.read.parquet(store)
            state["last_v"] = batch_id

        q = (spark.readStream.schema(emb.schema)
             .option("maxFilesPerTrigger", 1)
             .parquet(os.path.join(root, "src"))
             .writeStream.foreachBatch(fold)
             .option("checkpointLocation", os.path.join(root, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        import glob as _glob
        last = sorted(_glob.glob(os.path.join(out, "dropped_b*")))[-1]
        dropped = spark.read.parquet(last)
        return (emb.select("vec_id")
                .join(dropped, "vec_id", "left_anti"))

    add("emb_stream_semantic_dedup", stream_semantic_dedup,
        SEM_CORPUS_ORACLE)

    # The PERSISTED compressed-index serving path, full oracle: build
    # the IVFPQ codes index once (idempotent via corpus + codebook
    # signatures), query it with the exact-refined tail — the result
    # is defined to equal the inline frozen operator, so the entry
    # SHARES emb_ivfpq_topk_exact's oracle.  This is the shape that
    # matters at 100 TB: the raw vectors are scanned once at build,
    # queries read only probed cells' ~12-byte code rows.
    def ivfpq_index_topk(spark, sf):
        import hashlib
        import os

        emb = load_table(spark, sf, "embeddings")
        sf_key = (os.path.basename(os.path.normpath(sf)) + "-"
                  + hashlib.sha256(os.path.abspath(sf).encode())
                  .hexdigest()[:12])
        root = os.path.join("/tmp", "olap_xtrctr_ivfpq_index", sf_key)
        S.ivfpq_build_index(emb, root)
        queries = emb.filter(F.col("vec_id").isin([0, 1, 2, 3, 4]))
        return S.ivfpq_query_index(spark, root, queries, k=_K,
                                   n_probe=_NPROBE, refine_with=emb,
                                   refine=_REFINE)

    add("emb_ivfpq_index_topk", ivfpq_index_topk, _ivfpq_exact_oracle())

    # Frozen quality classifier: the value-exact sibling of the
    # rows-only hashed-BoW docs_quality_classifier — an exact int64
    # logit over the four oracle-exact text stats, weights frozen by
    # the generator.  keep ⇔ logit > 0 on both engines bit-for-bit.
    def quality_classifier_exact(spark, sf):
        from ..operators.classifier import quality_classifier_frozen
        from ..workload_shared import _docs
        return quality_classifier_frozen(_docs(spark, sf))

    _qw = FC.QUALITY_LR_WEIGHTS_I
    _QCL_SQL = rf"""WITH q AS (
          SELECT doc_id,
            CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS n_tokens,
            CAST(greatest(length(text), 1) AS BIGINT) AS n_chars,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS stop_hits,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 AS BIGINT) AS punct
          FROM documents)
        SELECT doc_id,
          CAST(({_qw[0]}) * n_tokens + ({_qw[1]}) * n_chars
             + ({_qw[2]}) * stop_hits + ({_qw[3]}) * punct
             + ({FC.QUALITY_LR_BIAS_I}) AS BIGINT) AS logit_u,
          CASE WHEN ({_qw[0]}) * n_tokens + ({_qw[1]}) * n_chars
                  + ({_qw[2]}) * stop_hits + ({_qw[3]}) * punct
                  + ({FC.QUALITY_LR_BIAS_I}) > 0
               THEN 1 ELSE 0 END AS keep
        FROM q"""

    add("docs_quality_classifier_exact", quality_classifier_exact,
        _QCL_SQL)
