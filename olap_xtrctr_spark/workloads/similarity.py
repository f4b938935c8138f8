"""Documents+embeddings: dedup / similarity / ANN / multimodal entries.

Entry builders moved VERBATIM from ``workload.py`` (round-6 split);
build order inside this module is unchanged.
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
    # ---- in-entry differential gates for the rows-only ANN family ----
    # The driver's rows-only check proves only "ran and returned rows";
    # these wrappers make that row carry REAL signal (VERDICT r5 item 4)
    # by computing recall against the oracle-green exact operator INSIDE
    # the entry and failing loudly below the floor.  Gated behind a
    # corpus-size cap so the exact pass can't become the scale
    # bottleneck the approximate operator exists to avoid; the skip is
    # logged, never silent.  Documented in PARITY.md.
    _ANN_GATE_MAX_VECS = 100_000

    def _ann_gate_skipped(n_vecs: int, name: str) -> bool:
        if n_vecs > _ANN_GATE_MAX_VECS:
            import logging
            logging.getLogger(__name__).warning(
                "%s: differential recall gate skipped (%d vectors > "
                "cap %d) — covered by tests/test_recall.py floors",
                name, n_vecs, _ANN_GATE_MAX_VECS)
            return True
        return False

    def _hash_index_topk_gated(spark, sf, which: str):
        emb = _emb(spark, sf)
        qids = [0, 1, 2, 3, 4]
        if which == "lsh":
            out = S.lsh_cosine_topk(emb, qids, k=3)
            floor = 0.8                   # measured 5/5 at sf0.01
        else:
            # n_probe=5 of 8 for the same uniform-corpus reason as the
            # composed index (measured: 2/5 at the default n_probe=2,
            # 4/5 at 5); floor >=4/5
            out = S.ivf_cosine_topk(emb, qids, k=3, n_probe=5)
            floor = 0.7
        name = f"emb_{which}_topk"
        if not _ann_gate_skipped(emb.count(), name):
            exact1 = {r["query_id"]: r["neighbor_id"]
                      for r in S.cosine_topk(emb, qids, k=1).collect()}
            approx = {}
            for r in out.collect():
                approx.setdefault(r["query_id"], set()).add(
                    r["neighbor_id"])
            hits = sum(1 for q, n1 in exact1.items()
                       if n1 in approx.get(q, set()))
            if exact1 and hits / len(exact1) < floor:
                raise AssertionError(
                    f"{name}: exact top-1 in approx top-3 for only "
                    f"{hits}/{len(exact1)} queries (floor {floor})")
        return out

    add("emb_lsh_topk",
        lambda spark, sf: _hash_index_topk_gated(spark, sf, "lsh"),
        None)
    add("emb_ivf_topk",
        lambda spark, sf: _hash_index_topk_gated(spark, sf, "ivf"),
        None)

    def _pq_topk_gated(spark, sf, composed: bool):
        emb = _emb(spark, sf)
        qids = [0, 1, 2, 3, 4]
        if composed:
            # n_probe=5 of 8: on this NEAR-UNIFORM corpus an arbitrary
            # query's true top-1 sits in a random cell (measured
            # in-top-3 rate: 2/5 at n_probe=3, 4/5 at 5), so the entry
            # probes a majority of cells and the gate floor is 0.7
            # (>=4/5) — cell pruning bounds what the composed index
            # can promise for NON-planted neighbors on uniform data,
            # unlike the planted near-dups tests/test_recall.py pins
            # at n_probe=3.
            out = S.ivfpq_cosine_topk(emb, qids, k=3, n_probe=5)
            name, floor = "emb_ivfpq_topk", 0.7
        else:
            out = S.pq_cosine_topk(emb, qids, k=3)
            name, floor = "emb_pq_topk", 0.8
        if not _ann_gate_skipped(emb.count(), name):
            exact1 = {r["query_id"]: r["neighbor_id"]
                      for r in S.cosine_topk(emb, qids, k=1).collect()}
            approx = {}
            for r in out.collect():
                approx.setdefault(r["query_id"], set()).add(
                    r["neighbor_id"])
            hits = sum(1 for q, n1 in exact1.items()
                       if n1 in approx.get(q, set()))
            if exact1 and hits / len(exact1) < floor:
                raise AssertionError(
                    f"{name}: exact top-1 in approx top-3 for only "
                    f"{hits}/{len(exact1)} queries (floor {floor})")
        return out

    add("emb_pq_topk",
        lambda spark, sf: _pq_topk_gated(spark, sf, composed=False),
        None)
    # the composed index: IVF cell pruning bounds how MANY codes are
    # read, PQ bounds how BIG each read is; exact tail re-ranks.
    # Rows-only (two KMeans stages); recall floor guards the composition
    add("emb_ivfpq_topk",
        lambda spark, sf: _pq_topk_gated(spark, sf, composed=True),
        None)

    def _lsh_near_dup_gated(spark, sf):
        emb = _emb(spark, sf)
        out = S.lsh_near_dup_pairs(emb, threshold=0.45, n_tables=16,
                                   bits_per_table=4)
        if not _ann_gate_skipped(emb.count(), "emb_lsh_near_dup_pairs"):
            exact = {(r["id_a"], r["id_b"]) for r in
                     D.embedding_near_dups(emb, threshold=0.45).collect()}
            got = {(r["id_a"], r["id_b"]) for r in out.collect()}
            # the operator exact-verifies candidates, so precision is
            # 1.0 by construction — assert it, then gate recall
            stray = got - exact
            if stray:
                raise AssertionError(
                    f"emb_lsh_near_dup_pairs: {len(stray)} pairs not in "
                    f"the exact GEMM output — verification broke")
            if exact and len(got) / len(exact) < 0.7:
                raise AssertionError(
                    f"emb_lsh_near_dup_pairs: recall "
                    f"{len(got)}/{len(exact)} vs exact pairs "
                    f"(floor 0.7)")
        return out

    # all-pairs near-dup WITHOUT the GEMM broadcast bound (the scale path
    # embedding_near_dups reroutes to); loose-threshold setting matches
    # the planted cosine-0.5 pairs.  Approximate recall → rows-only;
    # quality contract = the in-entry differential gate above plus
    # tests/test_recall.py recall+precision floors
    add("emb_lsh_near_dup_pairs", _lsh_near_dup_gated, None)

    # max_doc_freq: finite stop-shingle cap (well above the observed max
    # df at test SFs — 25 at sf0.1 — so results here are exact; at corpus
    # scale it bounds the O(df^2) pair blowup and logs what it drops).
    # Oracle shingles use clamped list slicing (t[i:i+2]) to match Spark's
    # F.slice truncation for docs shorter than n tokens.
    add("docs_ngram_jaccard_pairs",
        lambda spark, sf: D.ngram_jaccard_pairs(_docs(spark, sf), n=3,
                                                threshold=0.2,
                                                max_doc_freq=1000),
        r"""WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               ROUND(i / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / (sa.sz + sb.sz - i) >= 0.2""")

    # DSIR data selection (hashed-ngram importance weights): per-bucket
    # log-likelihood ratios frozen to integer micro-units once per
    # corpus, so each doc's weight is exact integer arithmetic — the
    # single ln happens n_buckets times, never per document, keeping the
    # cross-engine comparison bit-exact.  DuckDB SUM(BIGINT) → HUGEINT,
    # hence the final CASTs (the r4 anomalies lesson).
    add("docs_dsir_weights",
        lambda spark, sf: SM.dsir_importance_weights(
            _docs(spark, sf), F.col("source") == "src0"),
        r"""WITH d AS (
          SELECT doc_id, source = 'src0' AS is_target,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        f AS (
          SELECT doc_id, is_target, unnest(list_concat(t,
                   list_transform(
                     generate_series(1, greatest(len(t) - 1, 0)),
                     i -> concat(t[i], ' ', t[i+1])))) AS feat
          FROM d),
        b AS (
          SELECT doc_id, is_target,
                 TRY_CAST(concat('0x', substr(md5(concat('f:', feat)),
                   1, 15)) AS BIGINT) % 1024 AS bucket
          FROM f),
        dc AS (SELECT doc_id, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
        corpus AS (
          SELECT bucket, COUNT(*) AS cr,
                 SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
          FROM b GROUP BY 1),
        tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM corpus),
        llr AS (
          SELECT bucket, CAST(ROUND((LN(ct + 1) - LN(tt + 1024)
                   - LN(cr + 1) + LN(tr + 1024)) * 1e6) AS BIGINT)
                 AS llr_micro
          FROM corpus, tot)
        SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
               CAST(SUM(c * llr_micro) AS BIGINT) AS weight_micro
        FROM dc JOIN llr USING (bucket)
        GROUP BY 1""")

    # the selection half of DSIR: top-k docs by importance weight,
    # deterministic ties by id (TakeOrderedAndProject — no global sort)
    add("docs_dsir_top_docs",
        lambda spark, sf: SM.dsir_select_top_k(
            _docs(spark, sf), F.col("source") == "src0", k=50),
        r"""WITH base AS (WITH d AS (
            SELECT doc_id, source = 'src0' AS is_target,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS t
            FROM documents),
          f AS (
            SELECT doc_id, is_target, unnest(list_concat(t,
                     list_transform(
                       generate_series(1, greatest(len(t) - 1, 0)),
                       i -> concat(t[i], ' ', t[i+1])))) AS feat
            FROM d),
          b AS (
            SELECT doc_id, is_target,
                   TRY_CAST(concat('0x', substr(md5(concat('f:', feat)),
                     1, 15)) AS BIGINT) % 1024 AS bucket
            FROM f),
          dc AS (SELECT doc_id, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
          corpus AS (
            SELECT bucket, COUNT(*) AS cr,
                   SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
            FROM b GROUP BY 1),
          tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM corpus),
          llr AS (
            SELECT bucket, CAST(ROUND((LN(ct + 1) - LN(tt + 1024)
                     - LN(cr + 1) + LN(tr + 1024)) * 1e6) AS BIGINT)
                   AS llr_micro
            FROM corpus, tot)
          SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
                 CAST(SUM(c * llr_micro) AS BIGINT) AS weight_micro
          FROM dc JOIN llr USING (bucket)
          GROUP BY 1
          )
        SELECT CAST(ROW_NUMBER() OVER (
                 ORDER BY weight_micro DESC, doc_id) AS INTEGER) AS rank,
               doc_id, n_feats, weight_micro
        FROM base
        ORDER BY weight_micro DESC, doc_id
        LIMIT 50""")

    # stochastic DSIR via Gumbel-top-k with a DETERMINISTIC noise
    # source (md5-bucket uniform -> -ln(-ln(u))), integer micro-units
    # before comparison — reproducible resampling any engine replays
    add("docs_dsir_gumbel_sample",
        lambda spark, sf: SM.dsir_gumbel_sample(
            _docs(spark, sf), F.col("source") == "src0", k=50),
        r"""WITH base AS (WITH d AS (
            SELECT doc_id, source = 'src0' AS is_target,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS t
            FROM documents),
          f AS (
            SELECT doc_id, is_target, unnest(list_concat(t,
                     list_transform(
                       generate_series(1, greatest(len(t) - 1, 0)),
                       i -> concat(t[i], ' ', t[i+1])))) AS feat
            FROM d),
          b AS (
            SELECT doc_id, is_target,
                   TRY_CAST(concat('0x', substr(md5(concat('f:', feat)),
                     1, 15)) AS BIGINT) % 1024 AS bucket
            FROM f),
          dc AS (SELECT doc_id, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
          corpus AS (
            SELECT bucket, COUNT(*) AS cr,
                   SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
            FROM b GROUP BY 1),
          tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM corpus),
          llr AS (
            SELECT bucket, CAST(ROUND((LN(ct + 1) - LN(tt + 1024)
                     - LN(cr + 1) + LN(tr + 1024)) * 1e6) AS BIGINT)
                   AS llr_micro
            FROM corpus, tot)
          SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
                 CAST(SUM(c * llr_micro) AS BIGINT) AS weight_micro
          FROM dc JOIN llr USING (bucket)
          GROUP BY 1
          ),
        keyed AS (
          SELECT doc_id, weight_micro,
                 CAST(ROUND(weight_micro / 1.0) AS BIGINT)
                 + CAST(ROUND(-LN(-LN((TRY_CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':dsir-gumbel-v1')), 1, 15)) AS BIGINT) % 10000
                     + 0.5) / 10000.0)) * 1e6) AS BIGINT) AS key_micro
          FROM base)
        SELECT CAST(ROW_NUMBER() OVER (
                 ORDER BY key_micro DESC, doc_id) AS INTEGER) AS rank,
               doc_id, weight_micro, key_micro
        FROM keyed
        ORDER BY key_micro DESC, doc_id
        LIMIT 50""")

    # BM25 ranked retrieval — idf frozen to micro-units per TERM (the
    # only ln), each (doc,term) contribution rounded to integer milli
    # BEFORE the per-doc sum → order-independent exact integer score
    add("docs_bm25_topk",
        lambda spark, sf: TX.bm25_topk(_docs(spark, sf),
                                       ["hash", "join", "stream"], k=10),
        r"""WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(
                   trim(lower(text)), '\s+')) AS token
          FROM documents),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        tot AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT)
                  AS total_len FROM dl),
        hits AS (SELECT doc_id, token FROM toks
                 WHERE token IN ('hash', 'join', 'stream')),
        dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df
                  FROM hits GROUP BY 1),
        idf AS (
          SELECT token, CAST(ROUND(LN((n_docs - df + 0.5) / (df + 0.5)
                   + 1.0) * 1e6) AS BIGINT) AS idf_micro
          FROM dfreq, tot),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
               FROM hits GROUP BY 1, 2),
        contrib AS (
          SELECT tf.doc_id, CAST(ROUND(
                   idf_micro * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75
                     * (dl * n_docs / total_len)))) / 1000.0)
                 AS BIGINT) AS contrib_milli
          FROM tf JOIN dl ON dl.doc_id = tf.doc_id
          JOIN idf ON idf.token = tf.token, tot),
        scored AS (
          SELECT doc_id, CAST(SUM(contrib_milli) AS BIGINT)
                   AS score_milli,
                 COUNT(*) AS n_terms_hit
          FROM contrib GROUP BY 1)
        SELECT CAST(ROW_NUMBER() OVER (
                 ORDER BY score_milli DESC, doc_id) AS INTEGER) AS rank,
               doc_id, n_terms_hit, score_milli
        FROM scored
        ORDER BY score_milli DESC, doc_id
        LIMIT 10""")

    # asymmetric containment |A∩B| / min(|A|,|B|) over the same shingle
    # sets — the doc-inside-doc detector Jaccard structurally misses
    # when sizes differ.  contained_id = the smaller side (ties → id_a).
    _CONTAINMENT_SQL = r"""WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               ROUND(i / LEAST(sa.sz, sb.sz), 4) AS containment,
               CASE WHEN sb.sz < sa.sz THEN id_b ELSE id_a END
                 AS contained_id
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / LEAST(sa.sz, sb.sz) >= 0.5"""

    add("docs_containment_pairs",
        lambda spark, sf: D.ngram_containment_pairs(_docs(spark, sf), n=3,
                                                    threshold=0.5,
                                                    max_doc_freq=1000),
        _CONTAINMENT_SQL)

    # PPJoin prefix-filtered variant: bit-identical contract (same
    # oracle), different cost profile — see the operator docstring for
    # the measured trade-off and when to pick which
    add("docs_containment_pairs_prefix",
        lambda spark, sf: D.ngram_containment_pairs_prefix(
            _docs(spark, sf), n=3, threshold=0.5, max_doc_freq=1000),
        _CONTAINMENT_SQL)

    # winnowing (Schleimer et al. 2003): substring-level fingerprints —
    # shared token runs of length >= w+k-1 guarantee a shared fingerprint.
    # Oracle mirrors the selection exactly: sliding-window MIN over the
    # 60-bit md5 gram hashes via a ROWS window frame, then DISTINCT.
    _WINNOW_WINS_SQL = r"""WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        grams AS (
          SELECT doc_id, i,
                 TRY_CAST(concat('0x', substr(md5(
                   array_to_string(t[i:i+3], ' ')), 1, 15)) AS BIGINT) AS h,
                 len(t) - 3 AS n_grams
          FROM toks, LATERAL (SELECT UNNEST(generate_series(
            1, greatest(len(t) - 3, 0))) AS i) u),
        wins AS (
          SELECT doc_id,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW
                              AND 4 FOLLOWING) AS fp,
                 i, n_grams
          FROM grams),
        wfil AS (
          SELECT doc_id, i, fp, n_grams
          FROM wins WHERE i <= greatest(n_grams - 4, 1))"""

    _WINNOW_FPS_SQL = _WINNOW_WINS_SQL + """
        SELECT DISTINCT doc_id, fp FROM wfil"""

    add("docs_winnow_fingerprints",
        lambda spark, sf: D.winnow_fingerprints(_docs(spark, sf), k=4, w=5),
        _WINNOW_FPS_SQL)

    # max_doc_freq mirrors the 100 TB stop-fingerprint guard in BOTH
    # engines (no fp reaches it at this SF — the semantics contract is
    # what's under test, like ngram_jaccard's 1000 cap)
    add("docs_winnow_dup_pairs",
        lambda spark, sf: D.winnow_dup_pairs(_docs(spark, sf), k=4, w=5,
                                             min_shared=2,
                                             max_doc_freq=1000),
        f"""WITH fps AS ({_WINNOW_FPS_SQL}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM fps GROUP BY doc_id),
        dfreq AS (SELECT fp, COUNT(*) AS nd FROM fps GROUP BY fp),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 COUNT(*) AS n_shared
          FROM fps a JOIN fps b
            ON a.fp = b.fp AND a.doc_id < b.doc_id
          JOIN dfreq d ON d.fp = a.fp AND d.nd <= 1000
          GROUP BY 1, 2)
        SELECT id_a, id_b, n_shared,
               CAST((n_shared * 1000) // least(sa.sz, sb.sz)
                    AS BIGINT) AS containment_milli
        FROM shared
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_shared >= 2""")

    add("docs_winnow_match_spans",
        lambda spark, sf: D.winnow_match_spans(_docs(spark, sf), k=4,
                                               w=5, min_shared=2,
                                               max_doc_freq=1000),
        _WINNOW_WINS_SQL + """,
        fps AS (SELECT DISTINCT doc_id, fp FROM wfil),
        dfreq AS (SELECT fp, COUNT(*) AS nd FROM fps GROUP BY 1),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM fps a JOIN fps b
            ON a.fp = b.fp AND a.doc_id < b.doc_id
          JOIN dfreq d ON d.fp = a.fp AND d.nd <= 1000
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        dirs AS (
          SELECT id_a AS doc_id, id_b AS other_id FROM shared
          UNION ALL
          SELECT id_b, id_a FROM shared),
        matched AS (
          SELECT b.doc_id, b.other_id, w.i - 1 AS pos, w.n_grams
          FROM dirs b
          JOIN fps pf ON pf.doc_id = b.other_id
          JOIN wfil w ON w.doc_id = b.doc_id AND w.fp = pf.fp),
        sp AS (
          SELECT doc_id, other_id, pos, n_grams,
                 CASE WHEN pos - lag(pos) OVER
                        (PARTITION BY doc_id, other_id ORDER BY pos) > 5
                      THEN 1 ELSE 0 END AS new_span
          FROM matched),
        sp2 AS (
          SELECT *, SUM(new_span) OVER
                   (PARTITION BY doc_id, other_id ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS span
          FROM sp)
        SELECT doc_id, other_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               -- clamp to the last real token index (n_grams + k - 2)
               -- for sub-w-gram docs with one truncated window
               CAST(least(MAX(pos) + 7, MAX(n_grams) + 2)
                    AS BIGINT) AS span_end,
               COUNT(*) AS n_windows
        FROM sp2 GROUP BY doc_id, other_id, span""")

    # span-LEVEL dedup (Lee et al. 2022 move): the later doc of every
    # matched span loses the covered tokens; earliest occurrence keeps
    # its text.  Cleaned text is over the winnowing tokenization
    # (lowercased, whitespace-normalized) — span offsets index those
    # tokens.  Fully-covered duplicates stay present with empty text.
    add("docs_winnow_span_dedup",
        lambda spark, sf: D.winnow_span_dedup(_docs(spark, sf), k=4,
                                              w=5, min_shared=2,
                                              max_doc_freq=1000),
        _WINNOW_WINS_SQL + """,
        fps AS (SELECT DISTINCT doc_id, fp FROM wfil),
        dfreq AS (SELECT fp, COUNT(*) AS nd FROM fps GROUP BY 1),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM fps a JOIN fps b
            ON a.fp = b.fp AND a.doc_id < b.doc_id
          JOIN dfreq d ON d.fp = a.fp AND d.nd <= 1000
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        dirs AS (
          SELECT id_a AS doc_id, id_b AS other_id FROM shared
          UNION ALL
          SELECT id_b, id_a FROM shared),
        matched AS (
          SELECT b.doc_id, b.other_id, w.i - 1 AS pos, w.n_grams
          FROM dirs b
          JOIN fps pf ON pf.doc_id = b.other_id
          JOIN wfil w ON w.doc_id = b.doc_id AND w.fp = pf.fp),
        sp AS (
          SELECT doc_id, other_id, pos, n_grams,
                 CASE WHEN pos - lag(pos) OVER
                        (PARTITION BY doc_id, other_id ORDER BY pos) > 5
                      THEN 1 ELSE 0 END AS new_span
          FROM matched),
        sp2 AS (
          SELECT *, SUM(new_span) OVER
                   (PARTITION BY doc_id, other_id ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS span
          FROM sp),
        spans AS (
          SELECT doc_id, other_id,
                 MIN(pos) AS span_start,
                 least(MAX(pos) + 7, MAX(n_grams) + 2) AS span_end
          FROM sp2 GROUP BY doc_id, other_id, span),
        myspans AS (
          SELECT doc_id, span_start, span_end
          FROM spans WHERE doc_id > other_id),
        tok AS (
          SELECT doc_id, u.i - 1 AS pos, t[u.i] AS tok, len(t) AS orig
          FROM toks, LATERAL (SELECT UNNEST(generate_series(
            1, len(t))) AS i) u),
        removed AS (
          SELECT DISTINCT t.doc_id, t.pos
          FROM tok t JOIN myspans s
            ON s.doc_id = t.doc_id
           AND t.pos BETWEEN s.span_start AND s.span_end),
        kept AS (
          SELECT t.* FROM tok t
          LEFT JOIN removed r ON r.doc_id = t.doc_id AND r.pos = t.pos
          WHERE r.doc_id IS NULL),
        agg AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(a.clean_text, '') AS clean_text,
               CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_tokens,
               CAST(len(regexp_split_to_array(trim(lower(d.text)),
                    '\\s+')) - COALESCE(a.n_kept, 0) AS BIGINT)
                 AS n_tokens_removed
        FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""")

    # per-source before/after table of an exact-dedup run, for
    # recomputing mixing weights on POST-dedup token masses
    add("docs_dedup_impact_report",
        lambda spark, sf: D.dedup_impact_report(_docs(spark, sf)),
        r"""WITH slim AS (
          SELECT doc_id, source, md5(text) AS h,
                 len(regexp_split_to_array(trim(text), '\s+')) AS nt
          FROM documents),
        fl AS (
          SELECT source, nt,
                 CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY h)
                      THEN 1 ELSE 0 END AS kept
          FROM slim)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(kept) AS BIGINT) AS n_docs_kept,
               CAST(SUM(nt) AS BIGINT) AS n_tokens,
               CAST(SUM(nt * kept) AS BIGINT) AS n_tokens_kept,
               CAST((SUM(kept) * 1000) // COUNT(*) AS BIGINT)
                 AS docs_kept_milli,
               CAST((SUM(nt * kept) * 1000) // greatest(SUM(nt), 1)
                    AS BIGINT) AS tokens_kept_milli
        FROM fl GROUP BY source""")

    # per-doc n-gram novelty: fraction of a doc's shingles it is the
    # corpus-wide FIRST owner of — originator-vs-echo signal with NO
    # pair generation (linear in shingles at any duplication depth)
    add("docs_ngram_novelty",
        lambda spark, sf: D.ngram_novelty(_docs(spark, sf), n=3),
        r"""WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        first AS (SELECT shingle, MIN(doc_id) AS f FROM sh GROUP BY 1)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN doc_id = f THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST((SUM(CASE WHEN doc_id = f THEN 1 ELSE 0 END) * 1000)
                    // COUNT(*) AS BIGINT) AS novelty_milli
        FROM sh JOIN first USING (shingle)
        GROUP BY doc_id""")

    add("docs_winnow_dup_extent",
        lambda spark, sf: D.winnow_dup_extent(_docs(spark, sf), k=4, w=5),
        _WINNOW_WINS_SQL + """,
        dfreq AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd
                  FROM wfil GROUP BY 1)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_shared_windows,
               CAST((SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1000)
                    // COUNT(*) AS BIGINT) AS shared_milli
        FROM wfil JOIN dfreq USING (fp)
        GROUP BY doc_id""")

    # pre-join key profiling: exact inner-join cardinality + skew/null
    # diagnostics from per-key counts only (payloads never shuffle)
    def jprofile(spark, sf):
        from ..operators.joins import join_profile
        o = load_table(spark, sf, "orders").select(
            F.col("o_custkey").alias("custkey"))
        c = load_table(spark, sf, "customer").select(
            F.col("c_custkey").alias("custkey"))
        return join_profile(o, c, ["custkey"])

    add("tpch_join_profile_orders_customer", jprofile,
        """WITH pl AS (
          SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
        pr AS (
          SELECT c_custkey AS k, COUNT(*) AS n FROM customer GROUP BY 1),
        l AS (SELECT CAST(SUM(n) AS BIGINT) AS n_left,
                     CAST(COUNT(*) AS BIGINT) AS distinct_left,
                     CAST(MAX(n) AS BIGINT) AS max_key_mult_left,
                     CAST(SUM(CASE WHEN k IS NULL THEN n ELSE 0 END)
                          AS BIGINT) AS null_key_rows_left
              FROM pl),
        r AS (SELECT CAST(SUM(n) AS BIGINT) AS n_right,
                     CAST(COUNT(*) AS BIGINT) AS distinct_right,
                     CAST(MAX(n) AS BIGINT) AS max_key_mult_right,
                     CAST(SUM(CASE WHEN k IS NULL THEN n ELSE 0 END)
                          AS BIGINT) AS null_key_rows_right
              FROM pr),
        j AS (SELECT CAST(coalesce(SUM(pl.n * pr.n), 0) AS BIGINT)
                       AS est_output_rows
              FROM pl JOIN pr USING (k) WHERE k IS NOT NULL)
        SELECT * FROM l, r, j""")

    # unicode normalization: a combining-acute suffix is synthesized
    # in-plan on BOTH engines, so the hashes only match if NFC really
    # composed it (DuckDB ships nfc_normalize; NFKC has no DuckDB
    # counterpart and stays pytest-covered)
    def unicode_norm(spark, sf):
        from ..operators.text import normalize_unicode
        d = _docs(spark, sf).withColumn(
            "text", F.concat(F.col("text"), F.lit(" café")))
        return (normalize_unicode(d, form="NFC")
                .select("doc_id",
                        F.md5(F.encode(F.col("text_norm"), "UTF-8"))
                         .alias("norm_hash"),
                        F.length("text_norm").cast("bigint")
                         .alias("n_chars_norm")))

    add("docs_unicode_normalize", unicode_norm,
        """SELECT doc_id,
               md5(nfc_normalize(text || ' cafe' || chr(769)))
                 AS norm_hash,
               CAST(length(nfc_normalize(text || ' cafe' || chr(769)))
                    AS BIGINT) AS n_chars_norm
        FROM documents""")

    # snapshot diff: both versions derived deterministically from the one
    # documents table (md5 buckets), so the oracle reconstructs them and
    # the promotion-gate counts compare exactly
    def snap_diff(spark, sf):
        from ..operators.diff import snapshot_diff_summary
        from ..operators.sampling import _hash_bucket
        docs = _docs(spark, sf)
        b = _hash_bucket(F.col("doc_id"), "snap-v1")
        old = docs.filter(b % 10 < 9)
        new = (docs.filter(b % 10 > 0)
               .withColumn("text",
                           F.when(b % 3 == 0,
                                  F.concat(F.col("text"), F.lit(" v2")))
                            .otherwise(F.col("text"))))
        return snapshot_diff_summary(old, new, ["doc_id"])

    # the same old/new pair driven through the VERSIONED table surface:
    # write v1, write v2 (optimistic parent check), read both back,
    # diff — the whole write→commit-marker→time-travel-read chain is
    # what the oracle match certifies (scratch keyed by source size,
    # rebuilt only when the source changes)
    def versioned_travel(spark, sf):
        import os

        from ..operators.diff import snapshot_diff_summary
        from ..operators.sampling import _hash_bucket
        from ..sources import versioned as V
        docs = _docs(spark, sf)
        b = _hash_bucket(F.col("doc_id"), "snap-v1")
        old = docs.filter(b % 10 < 9)
        new = (docs.filter(b % 10 > 0)
               .withColumn("text",
                           F.when(b % 3 == 0,
                                  F.concat(F.col("text"), F.lit(" v2")))
                            .otherwise(F.col("text"))))
        sig = str(os.path.getsize(f"{sf}/documents.parquet"))
        t = os.path.join("/tmp", "olap_xtrctr_versioned_demo",
                         os.path.basename(os.path.normpath(sf)))
        marker = os.path.join(t, "_DEMO_SRC")
        if not (os.path.exists(marker)
                and open(marker).read().strip() == sig):
            import shutil
            shutil.rmtree(t, ignore_errors=True)
            V.write_version(old, t)
            V.write_version(new, t, expected_parent=1)
            os.makedirs(t, exist_ok=True)
            with open(marker, "w") as fh:
                fh.write(sig)
        return snapshot_diff_summary(
            V.read_version(spark, t, 1, verify_count=True),
            V.read_version(spark, t, 2, verify_count=True), ["doc_id"])

    _SB = SM.hash_bucket_sql("doc_id", "snap-v1")
    _SNAP_FP = ("md5(concat_ws(chr(31), "
                "coalesce(CAST({t} AS VARCHAR), chr(0)), "
                "coalesce(CAST(lang AS VARCHAR), chr(0)), "
                "coalesce(CAST(source AS VARCHAR), chr(0)), "
                "coalesce(CAST(n_chars AS VARCHAR), chr(0))))")

    _SNAP_DIFF_SQL = f"""WITH old AS (
          SELECT doc_id, {_SNAP_FP.format(t="text")} AS o
          FROM documents WHERE {_SB} % 10 < 9),
        new AS (
          SELECT doc_id,
                 {_SNAP_FP.format(
                     t=f"CASE WHEN {_SB} % 3 = 0 THEN concat(text, ' v2') "
                       "ELSE text END")} AS n
          FROM documents WHERE {_SB} % 10 > 0),
        j AS (SELECT old.o, new.n
              FROM old FULL OUTER JOIN new USING (doc_id))
        SELECT CASE WHEN o IS NULL THEN 'added'
                    WHEN n IS NULL THEN 'removed'
                    WHEN o <> n THEN 'changed'
                    ELSE 'unchanged' END AS status,
               COUNT(*) AS n_rows
        FROM j GROUP BY 1"""

    add("docs_snapshot_diff", snap_diff, _SNAP_DIFF_SQL)
    add("docs_versioned_time_travel", versioned_travel, _SNAP_DIFF_SQL)

    # multimodal plumbing: binary payloads → mapInPandas feature extraction
    # (deterministic fake codec — no media libs in this container; the
    # Spark-side schema/batching/partitioning is the real thing under test)
    from ..operators.multimodal import extract_features, synthetic_media

    def multimodal_canon(spark, sf):
        # Library callers get the raw array<float> feature column from
        # extract_features; the harness entry serializes it (floor-
        # quantized to 1e-6, comma-joined) because the driver's
        # canonicalizer hashes cell values and an array cell is
        # unhashable.  floor (not round) so there is no tie-breaking
        # rule to disagree on cross-engine; the float32 -> double
        # promotion and the multiply are IEEE-exact on both.
        feats = extract_features(synthetic_media(spark, 256), dim=8)
        return feats.select(
            "media_id", "kind", "n_bytes", "digest",
            F.concat_ws(",", F.transform(
                F.col("feature"),
                lambda x: F.floor(x.cast("double") * F.lit(1000000.0))
                           .cast("bigint").cast("string")))
             .alias("feature_q"))

    def multimodal_resize(spark, sf):
        from ..operators.multimodal import resize_images, synthetic_media
        media = synthetic_media(spark, 256).filter(F.col("kind") == "image")
        return resize_images(media, 64, 64).select(
            "media_id", "kind", "target_w", "target_h", "digest")

    # resize: stub codec is a digest chain over (payload_hex, WxH), so
    # the oracle rebuilds the fixture and recomputes the chain
    add("multimodal_resize", multimodal_resize,
        """WITH m AS (SELECT unnest(generate_series(0, 255)) AS i),
        p AS (SELECT i, repeat(md5(CAST(i AS VARCHAR)), 1 + i % 4) AS ph
              FROM m WHERE i % 3 = 0)
        SELECT CAST(i AS BIGINT) AS media_id, 'image' AS kind,
               CAST(64 AS INTEGER) AS target_w,
               CAST(64 AS INTEGER) AS target_h,
               sha256(concat(ph, ':64x64')) AS digest
        FROM p""")

    def multimodal_frames(spark, sf):
        from ..operators.multimodal import sample_frames, synthetic_media
        return sample_frames(synthetic_media(spark, 256), stride=2)

    # frame sampling: 1->N fan-out; n_frames = 1 + n_bytes % 5 with
    # n_bytes = 16*(1+i%4), stride 2, frame digest chained off the
    # payload digest
    add("multimodal_frames", multimodal_frames,
        """WITH m AS (SELECT unnest(generate_series(0, 255)) AS i),
        p AS (SELECT i, repeat(md5(CAST(i AS VARCHAR)), 1 + i % 4) AS ph,
                     16 * (1 + i % 4) AS n_bytes
              FROM m WHERE i % 3 = 2),
        f AS (SELECT i, ph,
                     unnest(generate_series(0, n_bytes % 5, 2)) AS frame_idx
              FROM p)
        SELECT CAST(i AS BIGINT) AS media_id,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               sha256(concat(sha256(ph), ':', CAST(frame_idx AS VARCHAR)))
                   AS frame_digest
        FROM f""")

    # Full oracle: the synthetic fixture and the fake codec are both
    # hex-string hash chains precisely so DuckDB (VARCHAR-only hash
    # functions) can recompute every column, including the per-element
    # float32 feature quantization.
    add("multimodal_features", multimodal_canon,
        """WITH m AS (SELECT unnest(generate_series(0, 255)) AS i),
        p AS (SELECT i,
                     repeat(md5(CAST(i AS VARCHAR)), 1 + i % 4) AS ph
              FROM m),
        d AS (SELECT i, ph, sha256(ph) AS dg, sha256(sha256(ph)) AS fd
              FROM p)
        SELECT CAST(i AS BIGINT) AS media_id,
               CASE CAST(i % 3 AS INTEGER) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               CAST(length(ph) / 2 AS INTEGER) AS n_bytes,
               dg AS digest,
               array_to_string(list_transform(generate_series(0, 7), j ->
                 CAST(FLOOR(CAST(CAST(CAST(TRY_CAST(concat('0x',
                        substr(fd, 8*j+7, 2) || substr(fd, 8*j+5, 2) ||
                        substr(fd, 8*j+3, 2) || substr(fd, 8*j+1, 2))
                      AS BIGINT) AS DOUBLE) / 4294967296 AS REAL) AS DOUBLE)
                      * 1000000.0) AS BIGINT)), ',') AS feature_q
        FROM d""")
