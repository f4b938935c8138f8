"""Corpus-curation entries (round 7, wave 3): per-source token capping
(domain balancing) and embedding-level cross-split leakage detection.
Both full-oracle.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import sampling as SM
from ..operators import text as TX
from ..workload_shared import _docs, _emb
from ..operators.fixedlog import ladder_sql

# Fixed-op ln oracle ladder for PMI (libm-free; operators/fixedlog.py).
_PMI_LADDER = ladder_sql(
    "SELECT p.w1, p.w2, p.c_xy, nt.n AS ntn, nb.n AS nbn, "
    "cx.c AS cxc, cy.c AS cyc FROM p "
    "JOIN cu cx ON p.w1 = cx.w JOIN cu cy ON p.w2 = cy.w "
    "CROSS JOIN nt CROSS JOIN nb",
    lns=[("c_xy", "l_xy"), ("ntn", "l_nt"), ("nbn", "l_nb"),
         ("cxc", "l_cx"), ("cyc", "l_cy")])

# Quality-score CTE shared with docs_token_budget_fill's oracle: the
# operator's published 4-decimal score, scaled to exact milli units.
_SCORED_CTE = r"""q AS (
      SELECT doc_id, source,
        len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        greatest(length(text), 1) AS n_chars,
        CAST(len(regexp_extract_all(lower(text),
          '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS stop_hits,
        CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
             AS INTEGER) AS punct
      FROM documents),
    scored AS (
      SELECT doc_id, source, n_tokens,
        CAST(ROUND(ROUND((
          (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000
                THEN 0.4 ELSE 0.0 END)
          + least(stop_hits / greatest(n_tokens, 1) * 2.0, 0.4)
          - least(punct / n_chars * 5.0, 0.2)
          + (CASE WHEN n_chars / greatest(n_tokens, 1) >= 3.0
                   AND n_chars / greatest(n_tokens, 1) <= 12.0
                  THEN 0.2 ELSE 0.0 END)), 4) * 1000)
          AS BIGINT) AS score_milli
      FROM q)"""

_COS = """list_sum(list_transform(list_zip(a.embedding, b.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""


def register(add) -> None:

    # domain balancing: cap every source at 5k tokens, keeping its
    # best-scoring documents — per-group prefix under a running token
    # total, same boundary rule as docs_token_budget_fill but windowed
    # inside the group (no global sort, no per-group full sort)
    def _source_cap(spark, sf):
        qs = TX.quality_score(_docs(spark, sf))
        docs = _docs(spark, sf).select("doc_id", "source")
        scored = (qs.select(
            "doc_id", "n_tokens",
            F.round(F.col("quality_score") * 1000).cast("bigint")
             .alias("score_milli"))
            .join(docs, "doc_id")
            .select("doc_id", "source", "n_tokens", "score_milli"))
        return SM.grouped_token_cap(scored, cap_tokens=5_000,
                                    group_col="source")

    add("docs_source_capped_corpus", _source_cap,
        f"""WITH {_SCORED_CTE},
        cum AS (
          SELECT *, SUM(n_tokens) OVER (PARTITION BY source
                      ORDER BY score_milli DESC, doc_id) AS cum_tokens
          FROM scored)
        SELECT doc_id, source, n_tokens, score_milli,
               CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM cum WHERE cum_tokens <= 5000""")

    # split-leakage audit: eval vectors with a >=0.40-cosine twin in
    # train — the paraphrase/re-encode leak that verbatim n-gram
    # contamination checks miss.  Split assignment is the deterministic
    # md5 split rule, recomputed by the oracle.
    _B = SM.hash_bucket_sql("a.vec_id", "split-v1")
    _B2 = SM.hash_bucket_sql("b.vec_id", "split-v1")

    add("emb_cross_split_leakage",
        lambda spark, sf: D.cross_split_leakage(
            _emb(spark, sf), {"train": 0.8, "eval": 0.2}, threshold=0.40),
        f"""WITH pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 CASE WHEN {_B} < 8000 THEN 'train' ELSE 'eval' END
                   AS split_a,
                 CASE WHEN {_B2} < 8000 THEN 'train' ELSE 'eval' END
                   AS split_b,
                 ROUND({_COS}, 4) AS cosine
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE {_COS} >= 0.40)
        SELECT id_a, id_b, split_a, split_b, cosine
        FROM pairs WHERE split_a <> split_b""")

    # the 100 TB path for the same audit: LSH-bucketed pair generation
    # (no driver collect) + the identical split join.  Rows-only by
    # construction (LSH recall is approximate) — the quality contract
    # is the in-entry differential gate vs the exact path: precision
    # must be 1.0 (candidates are exact-verified) and recall >= 0.7,
    # with a logged skip above the gate's vector cap (no silent caps).
    _LSH_GATE_MAX_VECS = 100_000

    def _leakage_lsh_gated(spark, sf):
        emb = _emb(spark, sf)
        out = D.cross_split_leakage(
            emb, {"train": 0.8, "eval": 0.2}, threshold=0.40,
            method="lsh", n_tables=16, bits_per_table=4)
        n = emb.count()
        if n > _LSH_GATE_MAX_VECS:
            import logging
            logging.getLogger(__name__).warning(
                "emb_cross_split_leakage_lsh: differential gate skipped "
                "(%d vectors > cap %d)", n, _LSH_GATE_MAX_VECS)
            return out
        exact = {(r["id_a"], r["id_b"]) for r in D.cross_split_leakage(
            emb, {"train": 0.8, "eval": 0.2}, threshold=0.40).collect()}
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        stray = got - exact
        if stray:
            raise AssertionError(
                f"emb_cross_split_leakage_lsh: {len(stray)} pairs not "
                f"in the exact audit — verification or split join broke")
        if exact and len(got) / len(exact) < 0.7:
            raise AssertionError(
                f"emb_cross_split_leakage_lsh: recall {len(got)}/"
                f"{len(exact)} vs the exact audit (floor 0.7)")
        return out

    add("emb_cross_split_leakage_lsh", _leakage_lsh_gated, None)

    # corpus card: the dataset-datasheet table (one row per language) —
    # size, token/char mass, source spread, exact-dup share (corpus-wide
    # normalized fingerprint), and mean quality, all exact integers.
    # The report a data curator attaches to a release; composes the
    # fingerprint/quality operators in ONE pass over the corpus plus a
    # fingerprint-keyed count and a broadcast total.
    def _corpus_card(spark, sf):
        # ONE scan of the wide text column (score + card columns in the
        # same projection), ONE fingerprint-keyed window for dup counts
        # (group = the dup family, no self-join), ONE lang aggregation;
        # the corpus-share denominator is a window over the 5-row
        # per-lang aggregate, never the corpus.  Plan-audited: a prior
        # join-based draft scanned documents six times.
        from pyspark.sql import Window

        from ..operators import text as TXo
        docs = _docs(spark, sf)
        fp = F.md5(F.regexp_replace(F.lower(F.col("text")),
                                    "[^a-z0-9]", ""))
        base = TXo.quality_score(docs, extra={
            "lang": F.col("lang"), "source": F.col("source"),
            "_nc": F.length("text").cast("bigint"), "_fp": fp,
        }).withColumn("q_milli",
                      F.round(F.col("quality_score") * 1000)
                      .cast("bigint"))
        base = base.withColumn(
            "_fpn", F.count(F.lit(1)).over(Window.partitionBy("_fp")))
        per_lang = (base.groupBy("lang")
                    .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                         F.sum("n_tokens").cast("bigint")
                          .alias("n_tokens"),
                         F.sum("_nc").cast("bigint").alias("n_chars"),
                         F.countDistinct("source").cast("bigint")
                          .alias("n_sources"),
                         F.sum((F.col("_fpn") > 1).cast("long"))
                          .cast("bigint").alias("n_dup_docs"),
                         F.expr("CAST(sum(q_milli) DIV count(1) "
                                "AS BIGINT)").alias("mean_quality_milli")))
        tot = Window.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)
        return (per_lang
                .withColumn("_total", F.sum("n_docs").over(tot))
                .select("lang", "n_docs", "n_tokens", "n_chars",
                        "n_sources", "n_dup_docs", "mean_quality_milli",
                        F.expr("CAST((n_docs * 1000) DIV _total "
                               "AS BIGINT)").alias("share_milli")))

    add("docs_corpus_card", _corpus_card,
        r"""WITH q AS (
          SELECT doc_id, lang, source,
            CAST(length(text) AS BIGINT) AS nc,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
            greatest(length(text), 1) AS n_chars_q,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS stop_hits,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 AS INTEGER) AS punct,
            md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
          FROM documents),
        scored AS (
          SELECT *, CAST(ROUND(ROUND((
              (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000
                    THEN 0.4 ELSE 0.0 END)
              + least(stop_hits / greatest(n_tokens, 1) * 2.0, 0.4)
              - least(punct / n_chars_q * 5.0, 0.2)
              + (CASE WHEN n_chars_q / greatest(n_tokens, 1) >= 3.0
                       AND n_chars_q / greatest(n_tokens, 1) <= 12.0
                      THEN 0.2 ELSE 0.0 END)), 4) * 1000)
              AS BIGINT) AS q_milli
          FROM q),
        fpc AS (SELECT fp, COUNT(*) AS fpn FROM q GROUP BY fp),
        tot AS (SELECT COUNT(*) AS total FROM q)
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(nc) AS BIGINT) AS n_chars,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(COUNT(*) FILTER (WHERE fpn > 1) AS BIGINT)
                 AS n_dup_docs,
               CAST(SUM(q_milli) // COUNT(*) AS BIGINT)
                 AS mean_quality_milli,
               CAST((COUNT(*) * 1000) // any_value(total) AS BIGINT)
                 AS share_milli
        FROM scored JOIN fpc USING (fp) CROSS JOIN tot
        GROUP BY lang""")

    # k-anonymity release suppression over a published aggregate (the
    # reference's domain — a health ministry reporting stack — is
    # exactly where this discipline applies): cells under k=8
    # contributors are primary-suppressed, and a parent group with
    # exactly ONE primary suppression also hides its smallest remaining
    # cell (complementary suppression — otherwise parent total minus
    # visible cells reconstructs the hidden value).  On this data k=8
    # exercises BOTH rules: 8 primaries across 4 parents, one of which
    # triggers the complementary path.
    def _kanon(spark, sf):
        from ..session import load_events
        ev = load_events(spark, sf).withColumn(
            "user_cohort", (F.col("user_id") % 97).cast("bigint"))
        return SM.kanon_release(ev, "event_type", "user_cohort",
                                k=8, value_col="value")

    add("events_kanon_release", _kanon,
        """WITH c AS (
          SELECT event_type, CAST(user_id % 97 AS BIGINT) AS user_cohort,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE),
                       4) AS sum_value
          FROM events GROUP BY 1, 2),
        m AS (
          SELECT *, (n < 8) AS prim,
                 SUM(CASE WHEN n < 8 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type) AS npar,
                 ROW_NUMBER() OVER (PARTITION BY event_type, (n < 8)
                                    ORDER BY n, user_cohort) AS rn
          FROM c),
        s AS (
          SELECT *, (prim OR (npar = 1 AND NOT prim AND rn = 1))
                      AS suppressed
          FROM m)
        SELECT event_type, user_cohort,
               CASE WHEN suppressed THEN NULL ELSE n END AS n,
               CASE WHEN suppressed THEN NULL ELSE sum_value END
                 AS sum_value,
               suppressed
        FROM s""")

    # count-min sketch frequency estimates for a fixed probe set —
    # unlike HLL, the md5-salted CMS is reproducible by the oracle, so
    # counters AND estimates are value-exact (the approximation is in
    # the one-sided >=truth guarantee, not in any nondeterminism).
    _CMS_W = 256
    # "zz-absent-zz" is (deliberately) not a corpus token: it pins the
    # probe-preserving semantics — an uninserted probe must report
    # freq_est = 0 (min over all depths with absent slots counting 0),
    # not vanish from the output.
    _CMS_PROBES = ("table", "value", "row", "key", "fast",
                   "merge", "scan", "sort", "zz-absent-zz")

    def _cms_token_freq(spark, sf):
        from ..operators import sketches as SK
        toks = (_docs(spark, sf).select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
             .alias("token"))
            .filter(F.col("token") != ""))
        counters = SK.cms_counters(toks, "token", width=_CMS_W)
        probes = spark.createDataFrame([(t,) for t in _CMS_PROBES],
                                       "token string")
        return SK.cms_estimate(counters, probes, "token", width=_CMS_W)

    from ..operators.sketches import CMS_SALTS, cms_slot_sql
    _cnt_union = "\n          UNION ALL ".join(
        f"SELECT {d} AS depth, {cms_slot_sql('tok', salt, _CMS_W)} AS slot,"
        f" CAST(COUNT(*) AS BIGINT) AS counter FROM toks GROUP BY 1, 2"
        for d, salt in enumerate(CMS_SALTS))
    _probe_union = "\n          UNION ALL ".join(
        f"SELECT token, {d} AS depth,"
        f" {cms_slot_sql('token', salt, _CMS_W)} AS slot FROM probes"
        for d, salt in enumerate(CMS_SALTS))
    _probe_values = ", ".join(f"('{t}')" for t in _CMS_PROBES)

    add("docs_cms_token_freq", _cms_token_freq,
        rf"""WITH tok0 AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
            AS tok
          FROM documents),
        toks AS (SELECT tok FROM tok0 WHERE tok != ''),
        probes(token) AS (VALUES {_probe_values}),
        cnt AS ({_cnt_union}),
        ps AS ({_probe_union})
        SELECT ps.token,
               CAST(MIN(COALESCE(cnt.counter, 0)) AS BIGINT) AS freq_est
        FROM ps LEFT JOIN cnt
          ON cnt.depth = ps.depth AND cnt.slot = ps.slot
        GROUP BY ps.token""")


def register_r8(add) -> None:
    from ..operators.sketches import CMS_SALTS, cms_slot_sql

    # GROUPED count-min sketch (round 8: cms_estimate group_cols path,
    # the ADVICE-r7 fix): one counter table per language, per-(lang,
    # token) estimates, probe side preserved — a language where a probe
    # token never occurs reports freq_est = 0 instead of vanishing or
    # min-ing across languages.
    _W = 256
    _PROBES = ("table", "value", "row", "zz-absent-zz")

    def _cms_by_lang(spark, sf):
        from ..operators import sketches as SK
        docs = _docs(spark, sf)
        toks = (docs.select(
            "lang",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
             .alias("token"))
            .filter(F.col("token") != ""))
        counters = SK.cms_counters(toks, "token", width=_W,
                                   group_cols=["lang"])
        # bounded metadata: collect the distinct langs ONCE instead of
        # riding a langs subquery into each of the 4 probe-union
        # branches (plan-audited: that shape rescanned the lang column
        # 4x through BroadcastNestedLoopJoins)
        langs = sorted(r["lang"]
                       for r in docs.select("lang").distinct().collect())
        probes = spark.createDataFrame(
            [(lg, t) for lg in langs for t in _PROBES],
            "lang string, token string")
        return SK.cms_estimate(counters, probes, "token", width=_W,
                               group_cols=["lang"])

    cnt_union = "\n          UNION ALL ".join(
        f"SELECT lang, {d} AS depth, "
        f"{cms_slot_sql('tok', salt, _W)} AS slot,"
        f" CAST(COUNT(*) AS BIGINT) AS counter FROM toks GROUP BY 1, 2, 3"
        for d, salt in enumerate(CMS_SALTS))
    probe_union = "\n          UNION ALL ".join(
        f"SELECT lang, token, {d} AS depth,"
        f" {cms_slot_sql('token', salt, _W)} AS slot FROM probes"
        for d, salt in enumerate(CMS_SALTS))
    probe_values = ", ".join(f"('{t}')" for t in _PROBES)

    add("docs_cms_token_freq_by_lang", _cms_by_lang,
        rf"""WITH tok0 AS (
          SELECT lang,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                   AS tok
          FROM documents),
        toks AS (SELECT lang, tok FROM tok0 WHERE tok != ''),
        pv(token) AS (VALUES {probe_values}),
        probes AS (
          SELECT DISTINCT d.lang, pv.token FROM documents d, pv),
        cnt AS ({cnt_union}),
        ps AS ({probe_union})
        SELECT ps.lang, ps.token,
               CAST(MIN(COALESCE(cnt.counter, 0)) AS BIGINT) AS freq_est
        FROM ps LEFT JOIN cnt
          ON cnt.lang = ps.lang AND cnt.depth = ps.depth
             AND cnt.slot = ps.slot
        GROUP BY ps.lang, ps.token""")

    # KMV distinct-count sketch (round 8): the oracle-exact complement
    # to HLL — state is the 64 smallest distinct md5-60bit user hashes
    # per event type, the estimate is ((k-1) * 2^60) DIV h_k, all
    # integer arithmetic any engine reproduces; groups seen fewer than
    # k distinct values report their EXACT count.
    from ..operators.sketches import kmv_hash_sql
    from ..session import load_table as _load

    def _kmv_users(spark, sf):
        from ..operators import sketches as SK
        ev = _load(spark, sf, "events")
        part = SK.kmv_partial(ev, ["event_type"], "user_id", k=64)
        return SK.kmv_estimate(part, ["event_type"], k=64)

    add("events_kmv_users_by_type", _kmv_users,
        rf"""WITH h AS (
          SELECT DISTINCT event_type,
                 {kmv_hash_sql('user_id')} AS kmv_h
          FROM events),
        r AS (
          SELECT event_type, kmv_h,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY kmv_h) AS rn
          FROM h),
        p AS (SELECT event_type, kmv_h FROM r WHERE rn <= 64),
        a AS (SELECT event_type, COUNT(*) AS n, MAX(kmv_h) AS hk
              FROM p GROUP BY 1)
        SELECT event_type,
               CAST(CASE WHEN n < 64 THEN n
                    ELSE (63 * CAST(1152921504606846976 AS HUGEINT))
                         // hk END AS BIGINT) AS n_distinct_est
        FROM a""")

    # KMV set-operation estimates (round 8, wave 3): pairwise audience
    # overlap between event types computed from SKETCH STATE ONLY —
    # union/intersection cardinality per unordered type pair via the
    # theta-sketch estimator (operators/sketches.kmv_overlap).  The
    # raw data is touched exactly once (the kmv_partial distinct pass);
    # the G^2 pair matrix then costs O(G^2 * k) sketch rows.  Fully
    # integer arithmetic on md5 hashes => the oracle reproduces every
    # estimate bit-for-bit.
    def _kmv_overlap(spark, sf):
        from ..operators import sketches as SK
        ev = _load(spark, sf, "events")
        part = SK.kmv_partial(ev, ["event_type"], "user_id", k=64)
        return SK.kmv_overlap(part, "event_type", k=64)

    add("events_kmv_type_overlap", _kmv_overlap,
        rf"""WITH h AS (
          SELECT DISTINCT event_type,
                 {kmv_hash_sql('user_id')} AS kmv_h
          FROM events),
        r AS (
          SELECT event_type, kmv_h,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY kmv_h) AS rn
          FROM h),
        p AS (SELECT event_type, kmv_h FROM r WHERE rn <= 64),
        g AS (SELECT DISTINCT event_type FROM p),
        prs AS (SELECT a.event_type AS g_a, b.event_type AS g_b
                FROM g a, g b WHERE a.event_type < b.event_type),
        pooled AS (
          SELECT g_a, g_b, kmv_h,
                 MAX(in_a) AS in_a, MAX(in_b) AS in_b
          FROM (
            SELECT prs.g_a, prs.g_b, p.kmv_h, 1 AS in_a, 0 AS in_b
            FROM prs JOIN p ON p.event_type = prs.g_a
            UNION ALL
            SELECT prs.g_a, prs.g_b, p.kmv_h, 0 AS in_a, 1 AS in_b
            FROM prs JOIN p ON p.event_type = prs.g_b)
          GROUP BY 1, 2, 3),
        sk AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY g_a, g_b
                                       ORDER BY kmv_h) AS rn
          FROM pooled),
        a AS (
          SELECT g_a, g_b, COUNT(*) AS n, MAX(kmv_h) AS hk,
                 SUM(in_a * in_b) AS rho
          FROM sk WHERE rn <= 64 GROUP BY 1, 2),
        u AS (
          SELECT g_a, g_b, n, rho,
                 CAST(CASE WHEN n < 64 THEN n
                      ELSE (63 * CAST(1152921504606846976 AS HUGEINT))
                           // hk END AS BIGINT) AS union_est
          FROM a)
        SELECT g_a, g_b, union_est,
               CAST(CASE WHEN n < 64 THEN rho
                    ELSE (union_est // 64) * rho
                         + ((union_est % 64) * rho) // 64
                    END AS BIGINT) AS inter_est
        FROM u""")

    # Soft dedup with repeat weights (round 8, wave 3): drop exact
    # copies but keep the duplication evidence as per-survivor training
    # weights — raw multiplicity, the capped epoch-repeat weight (the
    # data-constrained-scaling signal: repeats beyond ~4 epochs stop
    # helping), and the distinct-source spread (cross-source copies are
    # a quality prior, same-source copies a crawler artifact).  One
    # md5-keyed groupBy; the shuffle never carries document bodies.
    add("docs_dedup_weighted_keep",
        lambda spark, sf: D.dedup_weights(_docs(spark, sf)),
        """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS weight,
               CAST(LEAST(COUNT(*), 4) AS BIGINT) AS weight_capped,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents GROUP BY md5(text)""")

    # Leakage-free split (round 8, wave 3): the split decision hashes
    # the duplicate group's CANONICAL id, so exact copies can never
    # straddle train/eval — the contamination mode the audit entries
    # (docs_contamination_check, emb_cross_split_leakage) detect is
    # prevented by construction.  One text-hash shuffle to pin the
    # canonical id; the split itself is a projection.
    def _cluster_split(spark, sf):
        from pyspark.sql import Window
        docs = _docs(spark, sf)
        key = F.md5(F.encode(F.col("text"), "UTF-8"))
        w = Window.partitionBy("text_hash")
        canon = (docs.select("doc_id", key.alias("text_hash"))
                 .withColumn("canon", F.min("doc_id").over(w)))
        return (SM.cluster_split(
                    canon, {"train": 0.8, "val": 0.1, "test": 0.1},
                    "canon")
                .select("doc_id", "split"))

    _CB = SM.hash_bucket_sql("canon", "split-v1")
    add("docs_cluster_split",
        lambda spark, sf: _cluster_split(spark, sf),
        f"""WITH c AS (
          SELECT doc_id,
                 MIN(doc_id) OVER (PARTITION BY text) AS canon
          FROM documents)
        SELECT doc_id,
               CASE WHEN {_CB} < 8000 THEN 'train'
                    WHEN {_CB} < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM c""")

    # PMI collocations (round 8, wave 4): top-k adjacent-token pairs
    # by pointwise mutual information — multi-word-expression mining
    # for vocab/tokenizer construction.  PMI decomposes into ln's of
    # integer counts, each frozen via the host-libm lookup discipline
    # (operators/fixedlog.py — libm-free), so the scores are
    # engine-exact on ANY host; the oracle runs the identical
    # fixed-op ladder per term before the same ROUND(l*1e6) freeze.
    add("docs_token_pmi_top",
        lambda spark, sf: TX.token_pmi_top(_docs(spark, sf)),
        rf"""WITH tok AS (
          SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        uni AS (
          SELECT w FROM (SELECT unnest(t) AS w FROM tok) WHERE w != ''),
        bg AS (
          SELECT unnest(list_transform(
                   list_zip(t[1:len(t) - 1], t[2:]),
                   p -> p[1] || ' ' || p[2])) AS bg
          FROM tok),
        cu AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
        cb AS (SELECT bg, COUNT(*) AS c_xy FROM bg GROUP BY bg),
        nt AS (SELECT SUM(c) AS n FROM cu),
        nb AS (SELECT SUM(c_xy) AS n FROM cb),
        p AS (
          SELECT bg, c_xy,
                 string_split(bg, ' ')[1] AS w1,
                 string_split(bg, ' ')[2] AS w2
          FROM cb WHERE c_xy >= 5)
        SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
               CAST(ROUND(l_xy * 1e6) AS BIGINT)
               + 2 * CAST(ROUND(l_nt * 1e6) AS BIGINT)
               - CAST(ROUND(l_nb * 1e6) AS BIGINT)
               - CAST(ROUND(l_cx * 1e6) AS BIGINT)
               - CAST(ROUND(l_cy * 1e6) AS BIGINT) AS pmi_micro
        FROM ({_PMI_LADDER})
        ORDER BY pmi_micro DESC, w1, w2 LIMIT 50""")

    # Sliding-window distinct users (round 8, wave 5): hourly KMV
    # partials re-merged per trailing 6 h window position — window
    # repositioning costs sketch-sized work, never a corpus re-scan
    # (operators/sketches.kmv_sliding_estimate).
    def _kmv_sliding(spark, sf):
        from ..operators import sketches as SK
        return SK.kmv_sliding_estimate(
            _load(spark, sf, "events"), "ts", "user_id",
            window_hours=6, k=64)

    add("events_sliding_distinct_users", _kmv_sliding,
        rf"""WITH h AS (
          SELECT DISTINCT date_trunc('hour', ts) AS hr,
                 {kmv_hash_sql('user_id')} AS kmv_h
          FROM events),
        r AS (
          SELECT hr, kmv_h,
                 ROW_NUMBER() OVER (PARTITION BY hr
                                    ORDER BY kmv_h) AS rn
          FROM h),
        p AS (SELECT hr, kmv_h FROM r WHERE rn <= 64),
        t AS (SELECT DISTINCT hr AS hour FROM p),
        u AS (
          SELECT DISTINCT t.hour, p.kmv_h
          FROM t JOIN p ON p.hr <= t.hour
                       AND p.hr >= t.hour - INTERVAL 5 HOUR),
        rr AS (
          SELECT hour, kmv_h,
                 ROW_NUMBER() OVER (PARTITION BY hour
                                    ORDER BY kmv_h) AS rn
          FROM u),
        a AS (SELECT hour, COUNT(*) AS n, MAX(kmv_h) AS hk
              FROM rr WHERE rn <= 64 GROUP BY 1)
        SELECT hour,
               CAST(CASE WHEN n < 64 THEN n
                    ELSE (63 * CAST(1152921504606846976 AS HUGEINT))
                         // hk END AS BIGINT) AS n_distinct_est
        FROM a""")

    # JL random projection (round 8, wave 5): Rademacher +-1 projection
    # to 16 dims from the deterministic md5 sign matrix
    # (operators/similarity.jl_sign_matrix) — distance-preserving
    # pre-reduction ahead of ANN/clustering; a pure per-row fold, no
    # shuffle, no UDF.  The oracle regenerates the identical matrix.
    from ..operators.similarity import jl_sign_matrix, random_projection

    _JL = jl_sign_matrix(16, 64)
    _jl_cols = ",\n               ".join(
        "ROUND(list_sum(list_transform(list_zip(embedding, ["
        + ", ".join(f"{float(s)}" for s in row)
        + "]), p -> CAST(p[1] AS DOUBLE) * p[2])), 4) AS p" + str(j)
        for j, row in enumerate(_JL))

    add("emb_random_projection",
        lambda spark, sf: random_projection(_emb(spark, sf), 16),
        f"""SELECT vec_id,
               {_jl_cols}
        FROM embeddings""")

    # Incremental near-dup detection (round 8, wave 6): the daily-crawl
    # pattern — the NEW half of the corpus (hash-split) scored against
    # the SEEN half via band-bucket probes only; no self-join on either
    # side (operators/dedup.minhash_incremental_pairs_md5).  Same md5
    # family as docs_minhash_lsh_pairs_exact, so fully oracle-exact.
    _INCB = SM.hash_bucket_sql("doc_id", "incr-near-v1")

    def _incr_near(spark, sf):
        from ..operators.sampling import _hash_bucket
        docs = _docs(spark, sf)
        b = _hash_bucket(F.col("doc_id"), "incr-near-v1")
        return D.minhash_incremental_pairs_md5(
            docs.filter(b >= 5000), docs.filter(b < 5000),
            n=3, num_hashes=16, bands=4, threshold=0.5)

    add("docs_incremental_near_dups", _incr_near,
        rf"""WITH toks AS (
          SELECT doc_id, ({_INCB} >= 5000) AS is_new,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, is_new,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        hs AS (
          SELECT doc_id, is_new,
                 TRY_CAST(concat('0x', substr(md5(shingle), 1, 12))
                   AS BIGINT) AS h1,
                 TRY_CAST(concat('0x', substr(md5(concat(shingle, ':2')),
                   1, 8)) AS BIGINT) AS h2
          FROM sh),
        sig AS (
          SELECT doc_id, is_new, r.i, MIN(h1 + r.i * h2) AS m
          FROM hs, range(16) r(i) GROUP BY 1, 2, 3),
        bnd AS (
          SELECT doc_id, is_new, i // 4 AS band,
                 md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i))
                   AS bucket
          FROM sig GROUP BY doc_id, is_new, i // 4),
        cand AS (
          SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS seen_id
          FROM bnd a JOIN bnd b
            ON a.band = b.band AND a.bucket = b.bucket
          WHERE a.is_new AND NOT b.is_new),
        eq AS (
          SELECT c.new_id, c.seen_id,
                 SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS k
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.new_id
          JOIN sig sb ON sb.doc_id = c.seen_id AND sb.i = sa.i
          GROUP BY 1, 2)
        SELECT new_id, seen_id, ROUND(k / 16.0, 4) AS est_jaccard
        FROM eq WHERE k / 16.0 >= 0.5""")

    # Quality-priority dedup survivor (round 8, wave 6): keep the
    # highest-priority copy per duplicate text (curated source beats
    # crawl), not the first-seen one (operators/dedup.keep_best).
    def _keep_best(spark, sf):
        docs = _docs(spark, sf).withColumn(
            "src_priority",
            F.when(F.col("source") == "src0", F.lit(2))
             .when(F.col("source") == "src1", F.lit(1))
             .otherwise(F.lit(0)))
        return D.keep_best(docs, "src_priority")

    add("docs_dedup_keep_best", _keep_best,
        """SELECT doc_id, md5(text) AS text_hash, src_priority
        FROM (
          SELECT doc_id, text,
                 CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
                      ELSE 0 END AS src_priority,
                 ROW_NUMBER() OVER (
                   PARTITION BY text
                   ORDER BY CASE source WHEN 'src0' THEN 2
                                 WHEN 'src1' THEN 1 ELSE 0 END DESC,
                            doc_id) AS rn
          FROM documents)
        WHERE rn = 1""")

    # Mergeable bottom-k quantile sketch (round 8, wave 7): the
    # quantile complement to KMV — state is the k rows with smallest
    # md5 row hashes per event type (a deterministic uniform sample
    # whose shard merge is exact), estimates are rank picks over the
    # sampled values (operators/sketches.bottomk_*).  Behind the gate
    # window; rotates round 9.
    def _bottomk_quant(spark, sf):
        from ..operators import sketches as SK
        ev = _load(spark, sf, "events")
        part = SK.bottomk_partial(ev, ["event_type"], "event_id",
                                  "value", k=64)
        return SK.bottomk_quantiles(part, ["event_type"])

    _BKH = ("TRY_CAST(concat('0x', substr(md5(concat(CAST(event_id AS "
            "VARCHAR), ':bk-v1')), 1, 15)) AS BIGINT)")
    add("events_bottomk_value_quantiles", _bottomk_quant,
        rf"""WITH h AS (
          SELECT event_type, {_BKH} AS bk_h, value FROM events),
        r AS (
          SELECT event_type, bk_h, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY bk_h, value) AS rn
          FROM h),
        p AS (SELECT event_type, bk_h, value FROM r WHERE rn <= 64),
        rk AS (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value, bk_h) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM p)
        SELECT event_type,
               MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN value END) AS q50,
               MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                        THEN value END) AS q90,
               MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                        THEN value END) AS q99
        FROM rk GROUP BY event_type""")

    # Sliding-window quantiles (round 8, wave 7): rolling value
    # percentiles per hour from trailing 6 h of bottom-k sample state
    # (operators/sketches.bottomk_sliding_quantiles) — window
    # repositioning is sketch-sized work, never a corpus re-scan.
    def _bk_sliding(spark, sf):
        from ..operators import sketches as SK
        return SK.bottomk_sliding_quantiles(
            _load(spark, sf, "events"), "ts", "event_id", "value",
            window_hours=6, k=64)

    _BKH3 = ("TRY_CAST(concat('0x', substr(md5(concat(CAST(event_id AS "
             "VARCHAR), ':bk-v1')), 1, 15)) AS BIGINT)")
    add("events_sliding_value_quantiles", _bk_sliding,
        rf"""WITH h AS (
          SELECT date_trunc('hour', ts) AS hr, {_BKH3} AS bk_h, value
          FROM events),
        r AS (
          SELECT hr, bk_h, value,
                 ROW_NUMBER() OVER (PARTITION BY hr
                                    ORDER BY bk_h, value) AS rn
          FROM h),
        p AS (SELECT hr, bk_h, value FROM r WHERE rn <= 64),
        t AS (SELECT DISTINCT hr AS hour FROM p),
        u AS (
          SELECT DISTINCT t.hour, p.bk_h, p.value
          FROM t JOIN p ON p.hr <= t.hour
                       AND p.hr >= t.hour - INTERVAL 5 HOUR),
        m AS (
          SELECT hour, bk_h, value,
                 ROW_NUMBER() OVER (PARTITION BY hour
                                    ORDER BY bk_h, value) AS rn
          FROM u),
        keep AS (SELECT hour, bk_h, value FROM m WHERE rn <= 64),
        rk AS (
          SELECT hour, value,
                 ROW_NUMBER() OVER (PARTITION BY hour
                                    ORDER BY value, bk_h) AS rn,
                 COUNT(*) OVER (PARTITION BY hour) AS n
          FROM keep)
        SELECT hour,
               MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN value END) AS q50,
               MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                        THEN value END) AS q90,
               MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                        THEN value END) AS q99
        FROM rk GROUP BY hour""")

