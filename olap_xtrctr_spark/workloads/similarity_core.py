"""Embeddings + near-dup similarity entries (exact / quantized).

Entry builders moved VERBATIM from the round-6 ``workloads/similarity.py``
(round-7 split, VERDICT r6 task 7); build order inside this module is
unchanged.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..session import load_table
from ..operators import dedup as D
from ..operators import sampling as SM
from ..operators import similarity as S
from ..operators import text as TX
from ..workload_shared import (_docs, _emb)


def register(add) -> None:
    # ================= extensions: similarity =============================

    add("emb_norms",
        lambda spark, sf: S.embedding_norms(_emb(spark, sf)),
        """SELECT vec_id,
               ROUND(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
        FROM embeddings""")

    add("emb_cosine_topk",
        lambda spark, sf: S.cosine_topk(_emb(spark, sf), [0, 1, 2, 3, 4], k=3),
        """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
                      FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
            list_sum(list_transform(list_zip(q.qvec, e.embedding),
              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(q.qvec,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
          FROM embeddings e JOIN q ON e.vec_id <> q.query_id)
        SELECT query_id, rank, neighbor_id, ROUND(cos, 4) AS cosine FROM (
          SELECT query_id, neighbor_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
          FROM scored)
        WHERE rank <= 3""")

    # keyword-filtered exact vector search (the RAG retrieval shape);
    # query vector = embedding 0 resolved LAZILY in-plan (no driver
    # action at construction), terms prune the candidate set first
    add("docs_hybrid_search",
        lambda spark, sf: S.hybrid_search(
            _docs(spark, sf), _emb(spark, sf),
            ["vector", "stream"], query_id=0, k=10),
        """WITH q AS (SELECT embedding AS qvec FROM embeddings
                      WHERE vec_id = 0),
        cands AS (SELECT doc_id FROM documents
                  WHERE lower(text) LIKE '%vector%'
                    AND lower(text) LIKE '%stream%'),
        scored AS (
          SELECT e.vec_id AS doc_id,
            ROUND(list_sum(list_transform(list_zip(e.embedding, q.qvec),
              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.qvec,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
              AS cosine
          FROM embeddings e JOIN cands c ON e.vec_id = c.doc_id, q)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id)
                    AS INTEGER) AS rank,
               doc_id, cosine
        FROM scored
        ORDER BY cosine DESC, doc_id LIMIT 10""")

    add("emb_quantize",
        lambda spark, sf: S.quantize_embeddings(_emb(spark, sf))
        .select("vec_id",
                F.concat_ws(",", F.col("q_codes").cast("array<string>"))
                .alias("codes"),
                F.col("q_scale")),
        """SELECT vec_id,
               array_to_string(list_transform(embedding, x ->
                 CAST(greatest(-127, least(127, CAST(floor(
                   CAST(x AS DOUBLE) /
                   (greatest(list_max(list_transform(embedding,
                      v -> abs(CAST(v AS DOUBLE)))), 1e-30) / 127.0))
                   AS INTEGER))) AS VARCHAR)), ',') AS codes,
               greatest(list_max(list_transform(embedding,
                  v -> abs(CAST(v AS DOUBLE)))), 1e-30) / 127.0 AS q_scale
        FROM embeddings""")

    add("emb_quantized_topk",
        lambda spark, sf: S.dequantized_cosine_topk(
            _emb(spark, sf), [0, 1, 2, 3, 4], k=3),
        """WITH deq AS (
          SELECT vec_id,
                 list_transform(embedding, x ->
                   CAST(greatest(-127, least(127, CAST(floor(
                     CAST(x AS DOUBLE) /
                     (greatest(list_max(list_transform(embedding,
                        v -> abs(CAST(v AS DOUBLE)))), 1e-30) / 127.0))
                     AS INTEGER))) AS DOUBLE)
                   * (greatest(list_max(list_transform(embedding,
                        v -> abs(CAST(v AS DOUBLE)))), 1e-30) / 127.0))
                   AS e
          FROM embeddings),
        q AS (SELECT vec_id AS query_id, e AS qvec FROM deq
              WHERE vec_id IN (0,1,2,3,4)),
        scored AS (
          SELECT q.query_id, d.vec_id AS neighbor_id,
            list_sum(list_transform(list_zip(q.qvec, d.e),
              p -> p[1] * p[2]))
            / (sqrt(list_sum(list_transform(q.qvec, x -> x * x)))
             * sqrt(list_sum(list_transform(d.e, x -> x * x)))) AS cos
          FROM deq d JOIN q ON d.vec_id <> q.query_id)
        SELECT query_id, rank, neighbor_id, ROUND(cos, 4) AS cosine FROM (
          SELECT query_id, neighbor_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
          FROM scored)
        WHERE rank <= 3""")

    add("emb_near_dup_pairs",
        lambda spark, sf: D.embedding_near_dups(_emb(spark, sf),
                                                threshold=0.45),
        """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(
                 list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(a.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
                 AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(a.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(b.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              >= 0.45""")

    # SemDeDup-style semantic dedup (Abbas et al. 2023): exact-cosine
    # near-dup pairs → connected components; cluster == vec_id marks the
    # canonical keeper.  Same min-label propagation as the text path;
    # the oracle closes the identical edge set with a recursive CTE.
    _COS = """list_sum(list_transform(list_zip(a.embedding, b.embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(a.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(b.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
    add("emb_semantic_dedup_clusters",
        lambda spark, sf: D.near_dup_clusters(
            D.embedding_near_dups(_emb(spark, sf), threshold=0.45))
            .withColumnRenamed("doc_id", "vec_id"),
        f"""WITH RECURSIVE pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE {_COS} >= 0.45),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION SELECT src, src FROM edges
          UNION SELECT r.src, e.dst
          FROM reach r JOIN edges e ON r.dst = e.src)
        SELECT src AS vec_id, MIN(dst) AS cluster FROM reach GROUP BY src""")

    # end-to-end dedup pipeline: exact jaccard pairs → connected
    # components.  Spark runs distributed min-label propagation; the
    # oracle computes the same components as a recursive-CTE transitive
    # closure over the identical exact-jaccard edge set.
    add("docs_near_dup_clusters",
        lambda spark, sf: D.near_dup_clusters(
            D.ngram_jaccard_pairs(_docs(spark, sf), threshold=0.2)),
        r"""WITH RECURSIVE toks AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            generate_series(1, greatest(len(t) - 2, 1)),
            i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE i / (sa.sz + sb.sz - i) >= 0.2),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION SELECT src, src FROM edges
          UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        SELECT src AS doc_id, MIN(dst) AS cluster FROM reach GROUP BY src""")

    def corpus_prep(spark, sf):
        from ..operators.pipeline import prepare_corpus
        return prepare_corpus(_docs(spark, sf), min_quality=0.5)

    # the canonical corpus-prep composition: quality gate -> keep-first
    # exact dedup -> deterministic split, one lineage, full SQL oracle
    add("docs_prepare_corpus", corpus_prep,
        rf"""WITH q AS (
          SELECT doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS q_tok,
            greatest(length(text), 1) AS q_chr,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS q_stop,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 AS INTEGER) AS q_punct
          FROM documents),
        passed AS (
          SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)
          WHERE ROUND(
            (CASE WHEN q_tok >= 10 AND q_tok <= 5000
                  THEN 0.4 ELSE 0.0 END)
            + least(q_stop / greatest(q_tok, 1) * 2.0, 0.4)
            - least(q_punct / q_chr * 5.0, 0.2)
            + (CASE WHEN q_chr / greatest(q_tok, 1) >= 3.0
                     AND q_chr / greatest(q_tok, 1) <= 12.0
                    THEN 0.2 ELSE 0.0 END), 4) >= 0.5),
        fp AS (
          SELECT doc_id,
                 md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                   AS fingerprint
          FROM passed),
        kept AS (
          SELECT doc_id FROM fp
          WHERE doc_id = (SELECT MIN(f2.doc_id) FROM fp f2
                          WHERE f2.fingerprint = fp.fingerprint))
        SELECT doc_id,
               CASE WHEN {SM.hash_bucket_sql('doc_id', 'split-v1')} < 9000
                    THEN 'train' ELSE 'val' END AS split
        FROM kept""")

    # the full dedup pipeline: exact-jaccard pairs → connected
    # components → one canonical survivor per cluster (keep-min-id),
    # singletons untouched — corpus size in, deduped corpus out
    add("docs_keep_canonical",
        lambda spark, sf: D.keep_canonical(
            _docs(spark, sf),
            D.near_dup_clusters(
                D.ngram_jaccard_pairs(_docs(spark, sf), threshold=0.2)))
        .select("doc_id", "lang", "source"),
        r"""WITH RECURSIVE toks AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            generate_series(1, greatest(len(t) - 2, 1)),
            i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE i / (sa.sz + sb.sz - i) >= 0.2),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION SELECT src, src FROM edges
          UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS doc_id, MIN(dst) AS cluster
                 FROM reach GROUP BY src)
        SELECT d.doc_id, d.lang, d.source
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        WHERE c.doc_id IS NULL OR d.doc_id = c.cluster""")

    # rows-only checks (hash functions are engine-specific → no SQL oracle)
    add("docs_minhash_lsh_pairs",
        lambda spark, sf: D.minhash_lsh_pairs(_docs(spark, sf), threshold=0.3),
        None)
    # the SCALE-path dedup pipeline: banded MinHash-LSH candidates (never
    # all-pairs) -> components -> canonical corpus.  Probabilistic, so
    # rows-only here; its recall vs the exact pipeline is pinned in
    # tests/test_recall.py
    add("docs_minhash_dedup_corpus",
        lambda spark, sf: D.keep_canonical(
            _docs(spark, sf),
            D.near_dup_clusters(
                D.minhash_lsh_pairs(_docs(spark, sf), threshold=0.3)))
        .select("doc_id", "lang", "source"),
        None)
    # hamming <= 6: inside the multi-block pigeonhole guarantee (n_blocks-1)
    # and tight enough to mean "near-dup" on vocabulary-overlapping corpora
    # (hamming 16 admits ~24% of ALL pairs of this fixture)
    add("docs_simhash_pairs",
        lambda spark, sf: D.simhash_near_pairs(_docs(spark, sf),
                                               max_hamming=6),
        None)
    # product quantization + ADC shortlist + exact re-rank — the
    # compressed-scan serving path (IVFPQ's PQ half).  KMeans codebooks →
    # not SQL-expressible → rows-only; quality contract =
    # tests/test_recall.py PQ floors (exact-top3 recovery + planted@1)

    # ---- cluster-balanced subsample (round 7, beyond-reference) -------
    # Diversity-preserving curation: at most k vectors per KMeans cell,
    # deterministic hash-rank within the cell.  KMeans cell ids are not
    # SQL-expressible → rows-only; the wrapper enforces the structural
    # contract in-entry (rank bound, cluster-id range, id uniqueness)
    # and raises on violation, so a returned row carries real signal.
    def cluster_balanced(spark, sf):
        from pyspark.sql import functions as FF

        from ..operators.similarity import cluster_balanced_sample
        out = cluster_balanced_sample(_emb(spark, sf), k_per_cluster=40,
                                      n_clusters=16).cache()
        chk = out.agg(
            FF.count(FF.lit(1)).alias("n"),
            FF.countDistinct("vec_id").alias("n_ids"),
            FF.max("rank").alias("max_rank"),
            FF.min("cluster").alias("min_c"),
            FF.max("cluster").alias("max_c")).first()
        if not (chk.n == chk.n_ids and chk.max_rank <= 40
                and 0 <= chk.min_c and chk.max_c < 16):
            raise RuntimeError(
                f"cluster_balanced_sample structural contract violated: "
                f"{chk.asDict()}")
        return out

    add("emb_cluster_balanced_sample", cluster_balanced, None)
