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
