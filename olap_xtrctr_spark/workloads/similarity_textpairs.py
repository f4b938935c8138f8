"""Token-level pair generators: jaccard / DSIR / BM25 / containment / winnowing.

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

from ..operators.fixedlog import ladder_sql

# Fixed-op ln oracle ladders (libm-free; operators/fixedlog.py) —
# built once at import, interpolated into the oracle SQL below.  The
# round-8 driver proved libm-backed ln() diverges across DuckDB
# builds; these ladders make oracle and engine evaluate the identical
# IEEE-double op sequence.
_LLR_LADDER = ladder_sql(
    "SELECT * FROM corpus, tot",
    lns=[("ct + 1", "l1"), ("tt + 1024", "l2"),
         ("cr + 1", "l3"), ("tr + 1024", "l4")])
_GUMBEL_BUCKET = ("TRY_CAST(concat('0x', substr(md5(concat(CAST(doc_id AS "
                  "VARCHAR), ':dsir-gumbel-v1')), 1, 15)) AS BIGINT) % 10000")
_GUMBEL_LADDER = ladder_sql(
    "SELECT doc_id, weight_micro, (CAST(" + _GUMBEL_BUCKET +
    " AS DOUBLE) + 0.5e0) / 10000.0e0 AS u FROM base",
    lns=[("u", "l1"), ("0.0e0 - l1", "l2")])
_IDF_LADDER = ladder_sql(
    "SELECT token, df, n_docs FROM dfreq, tot",
    lns=[("((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0)", "lnv")])


def register(add) -> None:
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
        rf"""WITH d AS (
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
          SELECT bucket, CAST(ROUND((((l1 - l2) - l3) + l4) * 1e6)
                   AS BIGINT) AS llr_micro
          FROM ({_LLR_LADDER}))
        SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
               CAST(SUM(c * llr_micro) AS BIGINT) AS weight_micro
        FROM dc JOIN llr USING (bucket)
        GROUP BY 1""")

    # the selection half of DSIR: top-k docs by importance weight,
    # deterministic ties by id (TakeOrderedAndProject — no global sort)
    add("docs_dsir_top_docs",
        lambda spark, sf: SM.dsir_select_top_k(
            _docs(spark, sf), F.col("source") == "src0", k=50),
        rf"""WITH base AS (WITH d AS (
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
            SELECT bucket, CAST(ROUND((((l1 - l2) - l3) + l4) * 1e6)
                     AS BIGINT) AS llr_micro
            FROM ({_LLR_LADDER}))
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
        rf"""WITH base AS (WITH d AS (
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
            SELECT bucket, CAST(ROUND((((l1 - l2) - l3) + l4) * 1e6)
                     AS BIGINT) AS llr_micro
            FROM ({_LLR_LADDER}))
          SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
                 CAST(SUM(c * llr_micro) AS BIGINT) AS weight_micro
          FROM dc JOIN llr USING (bucket)
          GROUP BY 1
          ),
        keyed AS (
          SELECT doc_id, weight_micro,
                 CAST(ROUND(weight_micro / 1.0) AS BIGINT)
                 + CAST(ROUND((0.0e0 - l2) * 1e6) AS BIGINT) AS key_micro
          FROM ({_GUMBEL_LADDER}))
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
        rf"""WITH toks AS (
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
          SELECT token, CAST(ROUND(lnv * 1e6) AS BIGINT) AS idf_micro
          FROM ({_IDF_LADDER})),
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
    # the measured trade-off.  regime='prefix' is FORCED here so the
    # driver row keeps grading the prefix pair-machinery itself (the
    # gate fixture's df histogram is near-flat, so 'auto' would route
    # to the core and this entry would just re-grade
    # docs_containment_pairs); library callers get the r12 auto-probe
    # that refuses the measured 45 GB-spill regime.
    add("docs_containment_pairs_prefix",
        lambda spark, sf: D.ngram_containment_pairs_prefix(
            _docs(spark, sf), n=3, threshold=0.5, max_doc_freq=1000,
            regime="prefix"),
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


def register_r8(add) -> None:
    from ..operators import dedup as D

    # ORACLE-EXACT MinHash-LSH (round 8): md5-derived hash family makes
    # banding, the bucket self-join, and the signature-similarity
    # estimate bit-reproducible in SQL — upgrading the minhash family
    # from rows-only to a full value oracle (the xxhash64 operator
    # stays the fast path; this is the audit/verification variant).
    add("docs_minhash_lsh_pairs_exact",
        lambda spark, sf: D.minhash_lsh_pairs_md5(
            _docs(spark, sf), n=3, num_hashes=16, bands=4,
            threshold=0.5),
        r"""WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+')
            AS t
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        hs AS (
          SELECT doc_id,
                 TRY_CAST(concat('0x', substr(md5(shingle), 1, 12))
                   AS BIGINT) AS h1,
                 TRY_CAST(concat('0x', substr(md5(concat(shingle, ':2')),
                   1, 8)) AS BIGINT) AS h2
          FROM sh),
        sig AS (
          SELECT doc_id, r.i, MIN(h1 + r.i * h2) AS m
          FROM hs, range(16) r(i) GROUP BY 1, 2),
        bnd AS (
          SELECT doc_id, i // 4 AS band,
                 md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i))
                   AS bucket
          FROM sig GROUP BY doc_id, i // 4),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bnd a JOIN bnd b
            ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id),
        eq AS (
          SELECT c.id_a, c.id_b,
                 SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS k
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.id_a
          JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
          GROUP BY 1, 2)
        SELECT id_a, id_b, ROUND(k / 16.0, 4) AS est_jaccard
        FROM eq WHERE k / 16.0 >= 0.5""")

    # ORACLE-EXACT SimHash (round 8): 60-bit md5 token hash, per-bit
    # sign votes, pigeonhole block join, Hamming via bit_count(xor) —
    # every stage SQL-reproducible, upgrading the simhash family from
    # rows-only to a full value oracle.  6 blocks of 10 bits give the
    # exact-recall guarantee for hamming <= 5.
    add("docs_simhash_pairs_exact",
        lambda spark, sf: D.simhash_near_pairs_md5(
            _docs(spark, sf), max_hamming=5),
        r"""WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                   AS tok
          FROM documents),
        hs AS (
          SELECT doc_id,
                 TRY_CAST(concat('0x', substr(md5(tok), 1, 15))
                   AS BIGINT) AS h
          FROM toks),
        votes AS (
          SELECT doc_id, r.i,
                 SUM(CASE WHEN (h // power(2, r.i)::BIGINT) % 2 = 1
                          THEN 1 ELSE -1 END) AS v
          FROM hs, range(60) r(i) GROUP BY 1, 2),
        sig AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN v > 0
                          THEN power(2, i)::BIGINT ELSE 0 END)
                   AS BIGINT) AS simhash
          FROM votes GROUP BY doc_id),
        blk AS (
          SELECT doc_id, simhash, r.b AS blk_id,
                 (simhash // power(2, r.b * 10)::BIGINT) % 1024
                   AS blk_val
          FROM sig, range(6) r(b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.simhash AS sig_a, b.simhash AS sig_b
          FROM blk a JOIN blk b
            ON a.blk_id = b.blk_id AND a.blk_val = b.blk_val
               AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
        FROM cand
        WHERE bit_count(xor(sig_a, sig_b)) <= 5""")

    # the full SCALE-path dedup pipeline, ORACLE-EXACT end to end
    # (round 8): md5 MinHash-LSH candidates -> min-label connected
    # components -> canonical corpus.  The recursive-CTE components +
    # keep-canonical tail is the docs_near_dup_clusters pattern; the
    # pair stage is docs_minhash_lsh_pairs_exact's CTE chain verbatim.
    add("docs_minhash_dedup_corpus_exact",
        lambda spark, sf: D.keep_canonical(
            _docs(spark, sf),
            D.near_dup_clusters(
                D.minhash_lsh_pairs_md5(_docs(spark, sf), n=3,
                                        num_hashes=16, bands=4,
                                        threshold=0.5)))
        .select("doc_id", "lang", "source"),
        r"""WITH RECURSIVE toks AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+')
            AS t
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        hs AS (
          SELECT doc_id,
                 TRY_CAST(concat('0x', substr(md5(shingle), 1, 12))
                   AS BIGINT) AS h1,
                 TRY_CAST(concat('0x', substr(md5(concat(shingle, ':2')),
                   1, 8)) AS BIGINT) AS h2
          FROM sh),
        sig AS (
          SELECT doc_id, r.i, MIN(h1 + r.i * h2) AS m
          FROM hs, range(16) r(i) GROUP BY 1, 2),
        bnd AS (
          SELECT doc_id, i // 4 AS band,
                 md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i))
                   AS bucket
          FROM sig GROUP BY doc_id, i // 4),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bnd a JOIN bnd b
            ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id),
        eq AS (
          SELECT c.id_a, c.id_b,
                 SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS k
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.id_a
          JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b FROM eq WHERE k / 16.0 >= 0.5),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION SELECT src, src FROM edges
          UNION SELECT r.src, e.dst FROM reach r
                JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS doc_id, MIN(dst) AS cluster
                 FROM reach GROUP BY src)
        SELECT d.doc_id, d.lang, d.source
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        WHERE c.doc_id IS NULL OR d.doc_id = c.cluster""")


def register_r10(add) -> None:
    from ..operators import similarity as S

    # ORACLE-EXACT embedding LSH near-dup (round 10, VERDICT r9 task
    # 6): the last rows-only near-dup family member gets a full-oracle
    # md5 twin like the minhash/simhash ones.  ±1 hyperplanes from md5
    # nibbles, integer-frozen projections (no float sums until the
    # final verify cosine, which both engines round to 4 decimals
    # before the threshold) — the SQL mirrors every stage, so result
    # sets match bit-for-bit.
    # CTE chain shared by both md5-LSH twins (near-dup pairs + top-k):
    # quantized vectors -> md5 planes -> integer dots -> (vec, table,
    # bucket) signatures.
    _MD5_LSH = r"""qv AS (
          SELECT vec_id, embedding,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1e3 + 5e-1)
                        AS BIGINT)) AS q
          FROM embeddings),
        planes AS (
          SELECT t.t, b.b, i.i,
                 CASE WHEN TRY_CAST(concat('0x', substr(md5(concat(
                        'lshplane:', t.t, ':', b.b, ':', i.i)), 1, 1))
                      AS INTEGER) >= 8 THEN 1 ELSE -1 END AS c
          FROM range(16) t(t), range(4) b(b), range(64) i(i)),
        dots AS (
          SELECT v.vec_id, p.t, p.b,
                 CAST(SUM(p.c * v.q[p.i + 1]) AS BIGINT) AS d
          FROM qv v, planes p GROUP BY 1, 2, 3),
        buckets AS (
          SELECT vec_id, t,
                 CAST(SUM(CASE WHEN d >= 0 THEN power(2, b)::BIGINT
                          ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY 1, 2)"""

    _COS_AB = """list_sum(list_transform(
                     list_zip(a.embedding, b.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(a.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(b.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""

    add("emb_lsh_near_dup_pairs_exact",
        lambda spark, sf: S.lsh_near_dup_pairs_md5(
            _emb(spark, sf), threshold=0.45, n_tables=16,
            bits_per_table=4),
        f"""WITH {_MD5_LSH},
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM buckets a JOIN buckets b
            ON a.t = b.t AND a.bucket = b.bucket
               AND a.vec_id < b.vec_id)
        SELECT id_a, id_b, cosine FROM (
          SELECT c.id_a, c.id_b, ROUND({_COS_AB}, 4) AS cosine
          FROM cand c
          JOIN embeddings a ON a.vec_id = c.id_a
          JOIN embeddings b ON b.vec_id = c.id_b)
        WHERE cosine >= 0.45""")

    # ORACLE-EXACT LSH top-k: the same signature chain serving the
    # query side — candidates share ANY (table, bucket) cell with a
    # query, exact-cosine ranked with the deterministic
    # (cos DESC, neighbor_id) tiebreak.  Upgrades the last rows-only
    # ANN family member (emb_lsh_topk) with a value-exact sibling.
    add("emb_lsh_topk_exact",
        lambda spark, sf: S.lsh_cosine_topk_md5(
            _emb(spark, sf), [0, 1, 2, 3, 4], k=3, n_tables=16,
            bits_per_table=4),
        f"""WITH {_MD5_LSH},
        qb AS (
          SELECT vec_id AS query_id, t, bucket FROM buckets
          WHERE vec_id IN (0, 1, 2, 3, 4)),
        cand AS (
          SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
          FROM buckets s JOIN qb q
            ON s.t = q.t AND s.bucket = q.bucket
               AND s.vec_id <> q.query_id),
        scored AS (
          SELECT c.query_id, c.neighbor_id, {_COS_AB} AS cos
          FROM cand c
          JOIN embeddings a ON a.vec_id = c.query_id
          JOIN embeddings b ON b.vec_id = c.neighbor_id)
        SELECT query_id, rank, neighbor_id, ROUND(cos, 4) AS cosine
        FROM (
          SELECT query_id, neighbor_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id) AS INTEGER)
                   AS rank
          FROM scored)
        WHERE rank <= 3""")

    from ..operators import dedup as D

    # ORACLE-EXACT cross-split leakage on the LSH scale path (round
    # 10): the md5 twin pipeline + the deterministic md5 split rule —
    # the 100 TB no-collect audit shape, now with a full value oracle
    # (the seeded-float "lsh" variant keeps its differential gate and
    # stays the fast path).
    _BA = SM.hash_bucket_sql("a.vec_id", "split-v1")
    _BB = SM.hash_bucket_sql("b.vec_id", "split-v1")
    add("emb_cross_split_leakage_lsh_exact",
        lambda spark, sf: D.cross_split_leakage(
            _emb(spark, sf), {"train": 0.8, "eval": 0.2},
            threshold=0.40, method="lsh_md5", n_tables=16,
            bits_per_table=4),
        f"""WITH {_MD5_LSH},
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM buckets a JOIN buckets b
            ON a.t = b.t AND a.bucket = b.bucket
               AND a.vec_id < b.vec_id),
        pairs AS (
          SELECT c.id_a, c.id_b,
                 CASE WHEN {_BA} < 8000 THEN 'train' ELSE 'eval' END
                   AS split_a,
                 CASE WHEN {_BB} < 8000 THEN 'train' ELSE 'eval' END
                   AS split_b,
                 ROUND({_COS_AB}, 4) AS cosine
          FROM cand c
          JOIN embeddings a ON a.vec_id = c.id_a
          JOIN embeddings b ON b.vec_id = c.id_b)
        SELECT id_a, id_b, split_a, split_b, cosine
        FROM pairs WHERE cosine >= 0.40 AND split_a <> split_b""")

    # Decontamination ATTRIBUTION + REMOVAL (round 10): the existing
    # docs_contamination_check reports eval-side counts; these two
    # complete the GPT-3 appendix-C workflow — which TRAIN doc hit
    # which eval doc, and the decontaminated train corpus after the
    # drop rule.  Split convention: source 'src0' is the held-out
    # eval slice (the same reference_cond the LM-scoring family uses).
    _SH = r"""toks AS (
          SELECT doc_id, source,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, source,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks)"""

    add("docs_contamination_attribution",
        lambda spark, sf: D.contamination_attribution(
            _docs(spark, sf).filter(F.col("source") != "src0"),
            _docs(spark, sf).filter(F.col("source") == "src0"),
            n=3, min_shared=3),
        f"""WITH {_SH}
        SELECT a.doc_id AS train_id, b.doc_id AS test_id,
               COUNT(*) AS shared_ngrams
        FROM sh a JOIN sh b ON a.shingle = b.shingle
        WHERE a.source <> 'src0' AND b.source = 'src0'
        GROUP BY 1, 2 HAVING COUNT(*) >= 3""")

    add("docs_decontaminated_corpus",
        lambda spark, sf: D.decontaminate_corpus(
            _docs(spark, sf).filter(F.col("source") != "src0"),
            _docs(spark, sf).filter(F.col("source") == "src0"),
            n=3, max_shared=2),
        f"""WITH {_SH},
        off AS (
          SELECT DISTINCT train_id FROM (
            SELECT a.doc_id AS train_id
            FROM sh a JOIN sh b ON a.shingle = b.shingle
            WHERE a.source <> 'src0' AND b.source = 'src0'
            GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 3))
        SELECT d.doc_id, d.lang, d.source
        FROM documents d LEFT JOIN off ON d.doc_id = off.train_id
        WHERE d.source <> 'src0' AND off.train_id IS NULL""")

    # SPAN-level decontamination (surgical excision instead of the
    # whole-doc drop): the exact stride-1 span machinery pointed
    # across the train/eval split — k=5 windows, interval-merged into
    # maximal spans, byte-exact span lists on both engines.
    add("docs_contamination_spans",
        lambda spark, sf: D.contamination_spans(
            _docs(spark, sf).filter(F.col("source") != "src0"),
            _docs(spark, sf).filter(F.col("source") == "src0"),
            k=5),
        r"""WITH t AS (
          SELECT doc_id, source,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, source, i - 1 AS pos,
                 array_to_string(list_slice(toks, i, i + 4), ' ') AS sh
          FROM t, LATERAL unnest(generate_series(1, len(toks) - 4))
               AS u(i)),
        ev AS (SELECT DISTINCT sh FROM g WHERE source = 'src0'),
        mk AS (
          SELECT g.doc_id, pos AS s, pos + 4 AS e
          FROM g JOIN ev USING (sh) WHERE g.source <> 'src0'),
        r AS (
          SELECT doc_id, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (
                          PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), -2) + 1
                      THEN 1 ELSE 0 END AS brk
          FROM mk),
        sp AS (SELECT doc_id, s, e,
                      SUM(brk) OVER (PARTITION BY doc_id ORDER BY s)
                        AS sid
               FROM r),
        ag AS (SELECT doc_id, sid, MIN(s) AS ss, MAX(e) AS se
               FROM sp GROUP BY 1, 2),
        pd AS (SELECT doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
                      CAST(SUM(se - ss + 1) AS BIGINT) AS n_dup_tokens,
                      string_agg(ss || '-' || se, ',' ORDER BY ss)
                        AS dup_spans
               FROM ag GROUP BY 1)
        SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
               coalesce(pd.n_dup_spans, 0) AS n_dup_spans,
               coalesce(pd.n_dup_tokens, 0) AS n_dup_tokens,
               coalesce(pd.dup_spans, '') AS dup_spans
        FROM t LEFT JOIN pd USING (doc_id)
        WHERE t.source <> 'src0'""")
