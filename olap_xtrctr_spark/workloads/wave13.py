"""Round-13 additions: corpus-governance analytics over the existing
exact machinery.

* ``docs_source_pagerank`` — weighted PageRank over the source-level
  content-sharing graph (edge weight = distinct shared word shingles,
  df-bounded like the whole jaccard family), the FIXED iteration count
  unrolled both as one Spark plan and as chained oracle CTEs so an
  ITERATIVE algorithm gets a full value-exact oracle: every step is
  integer fixed-point (the frozen-codebook discipline applied to
  iteration instead of learned constants).
* ``emb_source_dim_drift`` — per-source embedding-centroid drift by
  DIMENSION (which direction did a source's content move), exact int64
  sums under the engine-wide floor(x*SCALE) quantization; only the
  final mean difference touches doubles, one fixed expression shape
  both engines evaluate identically.

Wave 2 adds the curriculum/allocation pair: ``docs_interleave_sources``
(deterministic round-robin training order from the two-phase prefix
machinery composed twice) and ``docs_budget_allocation`` (exact
Hamilton apportionment — totals provably sum to k).  Wave 3 adds
``docs_contamination_pagerank`` — PERSONALIZED PageRank whose teleport
set is the 5 sources with the most held-out/train shingle collisions
(exact docs_contamination_check counts): proximity-to-contamination
ranks for audit triage.  All five entries queue for the r14 driver
window (same late-entry precedent as the r12 frozen twins); until
then their freshness signal is the local gate at both SFs + the edge
fixture + unit tests.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..workload_shared import _docs, _emb

_PR_SCALE = 1_000_000_000
_PR_DAMP = 85
_PR_ITERS = 5


def _pagerank_oracle(seed_ctes: str = "", seeded: bool = False) -> str:
    """Chained-CTE mirror of graph.weighted_pagerank over the shared-
    shingle source graph: pr0 .. pr{iters} unrolled, every op exact
    integer (``//`` == Spark ``div`` — all quantities non-negative).

    ``seeded=True`` emits the PERSONALIZED variant: ``seed_ctes`` must
    define a ``seeds(source)`` CTE; the node table gains a 0/1 ``tp``
    flag, ``n`` becomes |seeds|, and both teleport terms multiply by
    the flag — the mirror of ``weighted_pagerank(teleport=...)``."""
    base = f"((CAST({_PR_SCALE} AS BIGINT) * {100 - _PR_DAMP}) // 100) // n"
    t0 = "tp * " if seeded else ""
    tk = "nodes.tp * " if seeded else ""
    nodes_cte = ("""nodes AS (
      SELECT source AS node,
             CASE WHEN source IN (SELECT source FROM seeds)
                  THEN 1 ELSE 0 END AS tp
      FROM (SELECT DISTINCT source FROM documents))""" if seeded else
                 "nodes AS (SELECT DISTINCT source AS node FROM documents)")
    nn_cte = ("nn AS (SELECT CAST(SUM(tp) AS BIGINT) AS n FROM nodes)"
              if seeded else
              "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)")
    ctes = [f"""pr0 AS (
      SELECT node, {t0}(CAST({_PR_SCALE} AS BIGINT) // n) AS pr
      FROM nodes CROSS JOIN nn)"""]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(f"""pr{i} AS (
      SELECT nodes.node,
             {tk}({base}) + ({_PR_DAMP} * COALESCE(s.m, CAST(0 AS BIGINT)))
                      // 100 AS pr
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT e.v, CAST(SUM((p.pr * e.w) // wt.wt) AS BIGINT) AS m
        FROM pr{i - 1} p
        JOIN e ON p.node = e.u
        JOIN wout wt ON e.u = wt.u
        GROUP BY e.v) s ON nodes.node = s.v)""")
    chain = ",\n    ".join(([seed_ctes] if seed_ctes else [])
                           + [nodes_cte, nn_cte] + ctes)
    return rf"""WITH toks AS (
      SELECT doc_id, source,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents),
    sh AS (
      SELECT DISTINCT source,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 1)),
               i -> array_to_string(t[i:i+2], ' ')))) AS shingle
      FROM toks),
    keep AS (
      SELECT shingle
      FROM (SELECT shingle, COUNT(*) AS ns FROM sh GROUP BY 1)
      WHERE ns BETWEEN 2 AND 8),
    p AS (
      SELECT a.source AS u, b.source AS v, CAST(COUNT(*) AS BIGINT) AS w
      FROM sh a
      JOIN keep USING (shingle)
      JOIN sh b USING (shingle)
      WHERE a.source < b.source
      GROUP BY 1, 2),
    e AS (SELECT u, v, w FROM p UNION ALL SELECT v, u, w FROM p),
    wout AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wt FROM e GROUP BY 1),
    {chain}
    SELECT node AS source, pr AS pr_ppb FROM pr{_PR_ITERS}"""


def register(add) -> None:

    def source_pagerank(spark, sf):
        from ..operators import graph as G
        docs = _docs(spark, sf)
        edges = G.shared_shingle_group_edges(docs, n=3, max_groups=8)
        nodes = docs.select(F.col("source").alias("node")).distinct()
        return (G.weighted_pagerank(edges, nodes, iters=_PR_ITERS,
                                    damping_pct=_PR_DAMP,
                                    scale=_PR_SCALE)
                .select(F.col("node").alias("source"), "pr_ppb"))

    add("docs_source_pagerank", source_pagerank, _pagerank_oracle())

    def dim_drift(spark, sf):
        from ..operators import similarity as S
        return S.source_dim_drift(_emb(spark, sf), _docs(spark, sf), k=5)

    add("emb_source_dim_drift", dim_drift, """WITH j AS (
      SELECT d.source,
             generate_subscripts(e.embedding, 1) - 1 AS dim,
             CAST(floor(CAST(unnest(e.embedding) AS DOUBLE) * 10000.0)
                  AS BIGINT) AS q
      FROM embeddings e
      JOIN documents d ON e.vec_id = d.doc_id),
    s AS (
      SELECT source, dim, CAST(SUM(q) AS BIGINT) AS ssum,
             CAST(COUNT(*) AS BIGINT) AS n_s
      FROM j GROUP BY 1, 2),
    g AS (
      SELECT dim, CAST(SUM(ssum) AS BIGINT) AS gsum,
             CAST(SUM(n_s) AS BIGINT) AS n
      FROM s GROUP BY 1),
    d AS (
      SELECT source, dim,
             (CAST(ssum AS DOUBLE) / CAST(n_s AS DOUBLE)
              - CAST(gsum AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0
               AS diff
      FROM s JOIN g USING (dim)),
    r AS (
      SELECT source, dim, diff,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY abs(diff) DESC, dim) AS INTEGER) AS rank
      FROM d)
    SELECT source, CAST(dim AS INTEGER) AS dim,
           ROUND(diff, 6) AS mean_diff, rank
    FROM r WHERE rank <= 5""")


def register_wave2(add) -> None:

    def interleave(spark, sf):
        from ..operators import sampling as SM
        return SM.interleave_sources(_docs(spark, sf))

    add("docs_interleave_sources", interleave, """WITH r AS (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY doc_id) AS BIGINT) AS source_rank
      FROM documents)
    SELECT doc_id, source, source_rank,
           CAST(ROW_NUMBER() OVER (ORDER BY source_rank, source, doc_id)
                AS BIGINT) AS global_pos
    FROM r""")

    def allocation(spark, sf):
        from ..operators import sampling as SM
        return SM.budget_allocation(_docs(spark, sf), k=10_000)

    add("docs_budget_allocation", allocation, """WITH per AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
      FROM documents GROUP BY 1),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM per),
    j AS (
      SELECT source, w,
             (CAST(10000 AS BIGINT) * w) // tw AS base,
             (CAST(10000 AS BIGINT) * w) % tw AS rem
      FROM per CROSS JOIN tot),
    res AS (SELECT CAST(10000 - SUM(base) AS BIGINT) AS resid FROM j),
    rr AS (
      SELECT j.*, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                       AS BIGINT) AS _rr
      FROM j)
    SELECT source, w AS weight,
           CAST(base + CASE WHEN _rr <= resid THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM rr CROSS JOIN res""")


_SEED_CTES = r"""ctoks AS (
      SELECT doc_id, source, {CB} AS b,
             regexp_split_to_array(trim(lower(text)), '\s+') AS ct
      FROM documents),
    csh AS (
      SELECT doc_id, source, b,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(ct) - 2, 1)),
               i -> array_to_string(ct[i:i+2], ' ')))) AS shingle
      FROM ctoks),
    cvocab AS (SELECT DISTINCT shingle FROM csh WHERE b >= 1000),
    contam AS (
      SELECT s.source,
             CAST(SUM(CASE WHEN v.shingle IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM csh s LEFT JOIN cvocab v ON s.shingle = v.shingle
      WHERE s.b < 1000
      GROUP BY s.source),
    seeds AS (SELECT source FROM contam ORDER BY c DESC, source LIMIT 5)"""


def register_wave3(add) -> None:
    # Personalized PageRank for contamination influence: teleport mass
    # lands ONLY on the 5 sources whose held-out docs carry the most
    # train-shingle collisions (the exact docs_contamination_check
    # counts, summed per source), so the stationary ranks answer the
    # audit question "which sources sit nearest the contamination in
    # the duplication graph".  Same unrolled exact-integer machinery
    # as docs_source_pagerank, |S| replacing N in both teleport terms.
    def contamination_pagerank(spark, sf):
        from ..operators import graph as G
        docs = _docs(spark, sf)
        seeds = G.contamination_seed_sources(docs, top_k=5)
        edges = G.shared_shingle_group_edges(docs, n=3, max_groups=8)
        nodes = docs.select(F.col("source").alias("node")).distinct()
        return (G.weighted_pagerank(edges, nodes, iters=_PR_ITERS,
                                    damping_pct=_PR_DAMP,
                                    scale=_PR_SCALE, teleport=seeds)
                .select(F.col("node").alias("source"), "pr_ppb"))

    from ..operators.sampling import hash_bucket_sql
    add("docs_contamination_pagerank", contamination_pagerank,
        _pagerank_oracle(
            seed_ctes=_SEED_CTES.replace(
                "{CB}", hash_bucket_sql("doc_id", "contam-v1")),
            seeded=True))
