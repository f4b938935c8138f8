"""Documents: text analysis / quality / sampling entries.

Entry builders moved VERBATIM from ``workload.py`` (round-6 split);
build order inside this module is unchanged.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import sampling as SM
from ..operators import text as TX
from ..workload_shared import _docs

from ..operators.fixedlog import ladder_sql

# Fixed-op ln oracle ladders for the LM family (libm-free;
# operators/fixedlog.py) — built once at import.
_CTX_LADDER = ladder_sql("SELECT w, c1, v FROM c1, vocab",
                         lns=[("c1 + v", "lnv")])
_SEEN_LADDER = ladder_sql("SELECT bg, c12 FROM c12",
                          lns=[("c12 + 1", "lnv")])
_OOV_LADDER = ladder_sql("SELECT v FROM vocab", lns=[("v", "lnv")])


def register(add) -> None:
    # ================= extensions: text analysis ==========================

    add("docs_token_stats",
        lambda spark, sf: TX.token_stats(_docs(spark, sf)),
        r"""SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INTEGER)
                   AS n_punct,
               length(text) AS len_chars,
               ROUND(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                     / greatest(length(text), 1), 4) AS punct_ratio
        FROM documents""")

    add("docs_lang_id",
        lambda spark, sf: TX.lang_id(_docs(spark, sf)),
        r"""WITH h AS (
          SELECT doc_id, lang,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS hits_en,
            CAST(len(regexp_extract_all(lower(text),
              '\b(el|la|de|que|los|una)\b')) AS INTEGER) AS hits_es,
            CAST(len(regexp_extract_all(lower(text),
              '\b(le|la|les|des|est|une)\b')) AS INTEGER) AS hits_fr,
            CAST(len(regexp_extract_all(lower(text),
              '\b(der|die|und|das|ist|ein)\b')) AS INTEGER) AS hits_de
          FROM documents)
        SELECT doc_id, lang, hits_en, hits_es, hits_fr, hits_de,
               CASE WHEN greatest(hits_en, hits_es, hits_fr, hits_de) = 0
                    THEN 'und'
                    WHEN hits_en = greatest(hits_en, hits_es, hits_fr, hits_de)
                    THEN 'en'
                    WHEN hits_es = greatest(hits_en, hits_es, hits_fr, hits_de)
                    THEN 'es'
                    WHEN hits_fr = greatest(hits_en, hits_es, hits_fr, hits_de)
                    THEN 'fr'
                    ELSE 'de' END AS lang_guess
        FROM h""")

    # char-trigram language ID (Cavnar-Trenkle family) — the n-gram
    # counterpart of the stopword voter; JVM regexp_count vs DuckDB
    # regexp_extract_all over the identical literal alternations
    add("docs_lang_id_ngram",
        lambda spark, sf: TX.lang_id_ngram(_docs(spark, sf)),
        r"""WITH h AS (
          SELECT doc_id, lang,
            CAST(len(regexp_extract_all(lower(text), '\ th|the|he\ |ing|nd\ |\ of|of\ |\ an|and|ion'))
                 AS INTEGER) AS tri_en,
            CAST(len(regexp_extract_all(lower(text), '\ de|de\ |\ la|la\ |os\ |\ qu|que|ue\ |ión|\ el'))
                 AS INTEGER) AS tri_es,
            CAST(len(regexp_extract_all(lower(text), '\ le|le\ |\ de|es\ |ent|\ et|et\ |ion|\ la|que'))
                 AS INTEGER) AS tri_fr,
            CAST(len(regexp_extract_all(lower(text), 'en\ |er\ |\ de|der|ie\ |ein|ich|sch|und|ch\ '))
                 AS INTEGER) AS tri_de
          FROM documents)
        SELECT doc_id, lang, tri_en, tri_es, tri_fr, tri_de,
               CASE WHEN greatest(tri_en, tri_es, tri_fr, tri_de) = 0
                    THEN 'und'
                    WHEN tri_en = greatest(tri_en, tri_es, tri_fr, tri_de)
                    THEN 'en'
                    WHEN tri_es = greatest(tri_en, tri_es, tri_fr, tri_de)
                    THEN 'es'
                    WHEN tri_fr = greatest(tri_en, tri_es, tri_fr, tri_de)
                    THEN 'fr'
                    ELSE 'de' END AS lang_guess
        FROM h""")

    add("docs_quality_score",
        lambda spark, sf: TX.quality_score(_docs(spark, sf)),
        r"""WITH q AS (
          SELECT doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
            greatest(length(text), 1) AS n_chars,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS stop_hits,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 AS INTEGER) AS punct
          FROM documents)
        SELECT doc_id, n_tokens,
          ROUND(
            (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000
                  THEN 0.4 ELSE 0.0 END)
            + least(stop_hits / greatest(n_tokens, 1) * 2.0, 0.4)
            - least(punct / n_chars * 5.0, 0.2)
            + (CASE WHEN n_chars / greatest(n_tokens, 1) >= 3.0
                     AND n_chars / greatest(n_tokens, 1) <= 12.0
                    THEN 0.2 ELSE 0.0 END), 4) AS quality_score
        FROM q""")

    # whitespace + BPE-ish token counting (pretrain-budget proxy); the
    # shared pattern is Java-regex/RE2-safe so the oracle runs it verbatim
    add("docs_token_count_bpe",
        lambda spark, sf: TX.token_count_bpe(_docs(spark, sf)),
        r"""SELECT doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
            AS n_tokens_ws,
          CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
            AS BIGINT) AS n_tokens_bpe
        FROM documents""")

    # the SQL-function surface driven end-to-end: an analyst's plain-SQL
    # query over the registered scalar functions must match the DuckDB
    # re-expression of the same semantics
    def sql_fn_stats(spark, sf):
        from ..functions import register_sql_functions
        register_sql_functions(spark)
        _docs(spark, sf).createOrReplaceTempView("wq_sql_fn_docs")
        return spark.sql(
            "SELECT doc_id, doc_fingerprint(text) AS fingerprint, "
            "token_count_ws(text) AS n_tokens_ws, "
            "ttr_milli(text) AS ttr_milli "
            "FROM wq_sql_fn_docs")

    add("docs_sql_function_stats", sql_fn_stats,
        r"""WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(
            trim(lower(text)), '\s+'), x -> x <> '') AS tl
          FROM documents)
        SELECT d.doc_id,
          md5(regexp_replace(lower(d.text), '[^a-z0-9]', '', 'g'))
            AS fingerprint,
          CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT)
            AS n_tokens_ws,
          CAST((len(list_distinct(t.tl)) * 1000)
               // greatest(len(t.tl), 1) AS BIGINT) AS ttr_milli
        FROM documents d JOIN toks t USING (doc_id)""")

    # Gopher-style intra-doc repetition (exact integer counts — callers
    # derive fractions; ints survive the Arrow edge bit-for-bit)
    add("docs_repetition_stats",
        lambda spark, sf: TX.repetition_stats(_docs(spark, sf)),
        r"""WITH t AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM documents)
        SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
          CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_2grams,
          CAST(len(list_distinct(list_transform(
                range(1, greatest(len(toks) - 1, 0) + 1),
                i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT)
            AS n_distinct_2grams,
          CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_3grams,
          CAST(len(list_distinct(list_transform(
                range(1, greatest(len(toks) - 2, 0) + 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
               AS BIGINT) AS n_distinct_3grams
        FROM t""")

    add("docs_repetition_filter",
        lambda spark, sf: TX.repetition_filter(
            _docs(spark, sf), max_dup_token_frac=0.5501,
            max_dup_2gram_frac=0.2501, min_tokens=20),
        r"""WITH t AS (
          SELECT *, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM documents)
        SELECT doc_id, text, lang, source, n_chars
        FROM t
        WHERE len(toks) >= 20
          AND 1.0 - len(list_distinct(toks)) * 1.0 / len(toks) <= 0.5501
          AND 1.0 - len(list_distinct(list_transform(
                range(1, greatest(len(toks) - 1, 0) + 1),
                i -> toks[i] || ' ' || toks[i+1]))) * 1.0
              / greatest(len(toks) - 1, 1) <= 0.2501""")

    add("docs_top_tokens",
        lambda spark, sf: TX.top_tokens(_docs(spark, sf), k=20),
        r"""WITH toks AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS token
          FROM documents),
        counts AS (
          SELECT token, COUNT(*) AS n FROM toks
          WHERE token <> '' GROUP BY token)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS INTEGER)
                 AS rank, token, n
        FROM counts
        ORDER BY n DESC, token
        LIMIT 20""")

    add("docs_fingerprint",
        lambda spark, sf: TX.fingerprint(_docs(spark, sf)),
        """SELECT doc_id,
               md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                   AS fingerprint
        FROM documents""")

    add("docs_redact_pii",
        lambda spark, sf: TX.redact_pii(_docs(spark, sf))
        .select("doc_id", "n_email", "n_phone", "n_ipv4",
                F.sha2(F.encode("text_redacted", "UTF-8"), 256)
                .alias("redacted_sha")),
        r"""SELECT doc_id,
               CAST(length(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 AS INTEGER) AS n_email,
               CAST(length(regexp_extract_all(text,
                 '\+?\d[\d\s().-]{7,}\d')) AS INTEGER) AS n_phone,
               CAST(length(regexp_extract_all(text,
                 '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INTEGER) AS n_ipv4,
               sha256(regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '[EMAIL]', 'g'),
                 '\+?\d[\d\s().-]{7,}\d', '[PHONE]', 'g'),
                 '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IPV4]', 'g'))
                 AS redacted_sha
        FROM documents""")

    add("docs_pack_sequences",
        lambda spark, sf: TX.pack_sequences(_docs(spark, sf), 2048),
        """SELECT doc_id,
               CAST(length(regexp_split_to_array(trim(text), '\\s+'))
                    AS INTEGER) AS n_tokens,
               CAST(FLOOR((SUM(length(regexp_split_to_array(trim(text),
                        '\\s+'))) OVER (ORDER BY doc_id)
                    - length(regexp_split_to_array(trim(text), '\\s+')))
                    / 2048) AS BIGINT) AS pack_bin
        FROM documents""")

    # the scale path: per-shard packing windows (no single-reducer cumsum)
    add("docs_pack_sequences_sharded",
        lambda spark, sf: TX.pack_sequences(_docs(spark, sf), 2048,
                                            shard_col="source"),
        """SELECT doc_id, source,
               CAST(length(regexp_split_to_array(trim(text), '\\s+'))
                    AS INTEGER) AS n_tokens,
               CAST(FLOOR((SUM(length(regexp_split_to_array(trim(text),
                        '\\s+'))) OVER (PARTITION BY source ORDER BY doc_id)
                    - length(regexp_split_to_array(trim(text), '\\s+')))
                    / 2048) AS BIGINT) AS pack_bin
        FROM documents""")

    add("docs_strip_markup",
        lambda spark, sf: TX.strip_markup(_docs(spark, sf))
        .select("doc_id",
                F.sha2(F.encode("text_clean", "UTF-8"), 256)
                .alias("clean_sha"),
                F.length("text_clean").alias("clean_len")),
        r"""SELECT doc_id,
               sha256(trim(regexp_replace(
                 replace(replace(replace(replace(replace(
                   regexp_replace(text, '<[^>]*>', ' ', 'g'),
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&apos;', ''''), '&amp;', '&'),
                 '\s+', ' ', 'g'))) AS clean_sha,
               length(trim(regexp_replace(
                 replace(replace(replace(replace(replace(
                   regexp_replace(text, '<[^>]*>', ' ', 'g'),
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&apos;', ''''), '&amp;', '&'),
                 '\s+', ' ', 'g'))) AS clean_len
        FROM documents""")

    add("docs_token_familiarity",
        lambda spark, sf: TX.token_familiarity(_docs(spark, sf)),
        r"""WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                   AS token
          FROM documents),
        vocab AS (
          SELECT token, COUNT(*) AS tok_freq FROM toks GROUP BY token)
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(tok_freq) AS BIGINT) AS familiarity_sum
        FROM toks JOIN vocab USING (token)
        GROUP BY doc_id""")

    def contamination(spark, sf):
        from ..operators.sampling import _hash_bucket
        docs = _docs(spark, sf)
        b = _hash_bucket(F.col("doc_id"), "contam-v1")
        test = docs.filter(b < 1000)          # held-out 10%
        train = docs.filter(b >= 1000)
        return D.contamination_check(train, test)

    _CB = SM.hash_bucket_sql("doc_id", "contam-v1")

    # eval-leakage detector: distinct-shingle vocabulary of TRAIN joined
    # against the held-out TEST split's shingles; exact integer outputs
    add("docs_contamination_check", contamination,
        rf"""WITH toks AS (
          SELECT doc_id, {_CB} AS b,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, b,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS shingle
          FROM toks),
        vocab AS (SELECT DISTINCT shingle FROM sh WHERE b >= 1000)
        SELECT s.doc_id, COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN v.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contaminated
        FROM sh s LEFT JOIN vocab v ON s.shingle = v.shingle
        WHERE s.b < 1000
        GROUP BY s.doc_id""")

    def mixing(spark, sf):
        return D.mix_corpus(_docs(spark, sf),
                            {"src0": 0.6, "src1": 0.3, "src2": 0.1},
                            token_budget=20_000) \
            .select("doc_id", "source")

    _MB = SM.hash_bucket_sql("doc_id", "mix-v1")

    # budgeted domain mixing: per-source rate = budget*weight/source_tokens
    # derived in-plan, keep decision by the deterministic id hash
    add("docs_mix_corpus", mixing,
        rf"""WITH ntok AS (
          SELECT doc_id, source,
                 length(regexp_split_to_array(trim(text), '\s+')) AS n_tok
          FROM documents),
        totals AS (
          SELECT source, SUM(n_tok) AS stok FROM ntok GROUP BY source),
        rates AS (
          SELECT source,
                 LEAST(10000, CAST(FLOOR(20000.0 *
                   CASE source WHEN 'src0' THEN 0.6 WHEN 'src1' THEN 0.3
                        WHEN 'src2' THEN 0.1 ELSE 0.0 END
                   * 10000 / stok) AS BIGINT)) AS rate_b
          FROM totals)
        SELECT d.doc_id, d.source
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE {_MB} < r.rate_b""")

    # ---- deterministic sampling / splitting (training-data mixing) -------
    # All hash-derived (md5(id:salt)), so the DuckDB oracle recomputes the
    # exact same sample — reproducibility across engines IS the oracle.
    _BUCKET = SM.hash_bucket_sql("doc_id", "split-v1")

    add("docs_hash_split",
        lambda spark, sf: SM.hash_split(
            _docs(spark, sf), {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("doc_id", "split"),
        f"""SELECT doc_id,
               CASE WHEN {_BUCKET} < 8000 THEN 'train'
                    WHEN {_BUCKET} < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents""")

    # the cutoff-picking curve: per distinct quality score, surviving
    # docs/tokens for a >= filter — corpus touched once, windows only
    # over the bounded per-score table
    add("docs_quality_threshold_sweep",
        lambda spark, sf: TX.quality_threshold_sweep(_docs(spark, sf)),
        r"""WITH q AS (
          SELECT doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
            greatest(length(text), 1) AS n_chars,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS stop_hits,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 AS INTEGER) AS punct
          FROM documents),
        scored AS (
          SELECT n_tokens,
            CAST(ROUND(ROUND((
              (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000
                    THEN 0.4 ELSE 0.0 END)
              + least(stop_hits / greatest(n_tokens, 1) * 2.0, 0.4)
              - least(punct / n_chars * 5.0, 0.2)
              + (CASE WHEN n_chars / greatest(n_tokens, 1) >= 3.0
                       AND n_chars / greatest(n_tokens, 1) <= 12.0
                      THEN 0.2 ELSE 0.0 END)), 4) * 1000)
              AS BIGINT) AS threshold_milli
          FROM q),
        per AS (
          SELECT threshold_milli, COUNT(*) AS d,
                 SUM(n_tokens) AS t
          FROM scored GROUP BY 1),
        c AS (
          SELECT threshold_milli,
                 SUM(d) OVER (ORDER BY threshold_milli DESC) AS kd,
                 SUM(t) OVER (ORDER BY threshold_milli DESC) AS kt,
                 SUM(d) OVER () AS td, SUM(t) OVER () AS tt
          FROM per)
        SELECT threshold_milli,
               CAST(kd AS BIGINT) AS kept_docs,
               CAST(kt AS BIGINT) AS kept_tokens,
               CAST((kd * 1000) // td AS BIGINT) AS kept_docs_milli,
               CAST((kt * 1000) // tt AS BIGINT) AS kept_tokens_milli
        FROM c""")

    # deterministic sharded training order: md5-keyed permutation, rank
    # windows partitioned per shard (never a global sort)
    add("docs_shuffle_corpus",
        lambda spark, sf: SM.shuffle_corpus(_docs(spark, sf), n_shards=8)
        .select("doc_id", "shard", "shard_pos"),
        """WITH keyed AS (
          SELECT doc_id,
                 TRY_CAST(concat('0x', substr(md5(concat(
                   CAST(doc_id AS VARCHAR), ':shuffle-v1')), 1, 15))
                   AS BIGINT) AS key
          FROM documents)
        SELECT doc_id, CAST(key % 8 AS INTEGER) AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY key % 8
                    ORDER BY key, doc_id) AS BIGINT) AS shard_pos
        FROM keyed""")

    # frequency vocabulary with deterministic ids (count desc, token) —
    # TakeOrderedAndProject, never a full-vocab sort
    add("docs_vocab_build",
        lambda spark, sf: TX.build_vocab(_docs(spark, sf), max_size=500,
                                         min_count=2),
        r"""WITH toks AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)),
                 '\s+')) AS token
          FROM documents),
        counts AS (
          SELECT token, COUNT(*) AS n FROM toks
          WHERE token <> '' GROUP BY 1 HAVING COUNT(*) >= 2)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) - 1
                    AS BIGINT) AS token_id,
               token, CAST(n AS BIGINT) AS n
        FROM counts ORDER BY n DESC, token LIMIT 500""")

    # "the best 20k tokens": greedy quality-ordered prefix under a hard
    # token budget; integer milli scores make the boundary engine-exact
    def _budget_fill(spark, sf):
        qs = TX.quality_score(_docs(spark, sf))
        scored = qs.select(
            "doc_id", "n_tokens",
            F.round(F.col("quality_score") * 1000).cast("bigint")
             .alias("score_milli"))
        return SM.token_budget_fill(scored, budget_tokens=20_000)

    add("docs_token_budget_fill", _budget_fill,
        r"""WITH q AS (
          SELECT doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
            greatest(length(text), 1) AS n_chars,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS stop_hits,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 AS INTEGER) AS punct
          FROM documents),
        scored AS (
          -- two-stage rounding mirrors the Spark side exactly: the
          -- quality score is rounded to 4 decimals FIRST (that is the
          -- operator's published value), then scaled to milli
          SELECT doc_id, n_tokens,
            CAST(ROUND(ROUND((
              (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000
                    THEN 0.4 ELSE 0.0 END)
              + least(stop_hits / greatest(n_tokens, 1) * 2.0, 0.4)
              - least(punct / n_chars * 5.0, 0.2)
              + (CASE WHEN n_chars / greatest(n_tokens, 1) >= 3.0
                       AND n_chars / greatest(n_tokens, 1) <= 12.0
                      THEN 0.2 ELSE 0.0 END)), 4) * 1000)
              AS BIGINT) AS score_milli
          FROM q),
        cum AS (
          SELECT *, SUM(n_tokens) OVER (ORDER BY score_milli DESC,
                                        doc_id) AS cum_tokens
          FROM scored)
        SELECT doc_id, n_tokens, score_milli,
               CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM cum WHERE cum_tokens <= 20000""")

    _SBUCKET = SM.hash_bucket_sql("doc_id", "strat-v1")

    add("docs_stratified_sample",
        lambda spark, sf: SM.stratified_sample(
            _docs(spark, sf), {"en": 0.5, "es": 0.25}, default_rate=0.1)
        .select("doc_id", "lang"),
        f"""SELECT doc_id, lang
        FROM documents
        WHERE {_SBUCKET} < CASE lang WHEN 'en' THEN 5000
                                     WHEN 'es' THEN 2500
                                     ELSE 1000 END""")

    add("docs_uniform_sample_k",
        lambda spark, sf: SM.uniform_sample_k(_docs(spark, sf), 100)
        .select("doc_id", "lang"),
        """SELECT doc_id, lang
        FROM documents
        ORDER BY md5(concat(CAST(doc_id AS VARCHAR), ':topk-v1'))
        LIMIT 100""")

    # zlib compression-ratio quality signal — rows-only: zlib is not
    # SQL-expressible (the one Arrow-batched pandas_udf in the text
    # family); tests pin repetitive << prose << random ordering
    add("docs_compression_ratio",
        lambda spark, sf: TX.compression_ratio(_docs(spark, sf)), None)

    # data-contract check: every rule is a conditional sum in ONE
    # aggregate pass (50 rules cost the same scan as one)
    def doc_contracts(spark, sf):
        from ..operators import expectations as EX
        return EX.check(_docs(spark, sf), {
            "doc_id_not_null": EX.not_null("doc_id"),
            "text_non_empty": EX.non_empty("text"),
            "lang_known": EX.isin("lang", ["en", "es", "fr", "de"]),
            "n_chars_range": EX.in_range("n_chars", 1, 10_000),
            "n_chars_consistent":
                F.col("n_chars").eqNullSafe(F.length("text")),
        }).orderBy("rule")

    add("docs_contract_check", doc_contracts,
        """WITH m AS (SELECT
            CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_id,
            CAST(SUM(CASE WHEN NOT coalesce(text IS NOT NULL
                 AND length(text) > 0, FALSE) THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_text,
            CAST(SUM(CASE WHEN NOT coalesce(
                 lang IN ('en','es','fr','de'), FALSE) THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_lang,
            CAST(SUM(CASE WHEN NOT coalesce(
                 n_chars BETWEEN 1 AND 10000, FALSE) THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_range,
            CAST(SUM(CASE WHEN NOT coalesce(
                 n_chars = length(text), FALSE) THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_cons
          FROM documents)
        SELECT rule, n_rows, n_violations FROM (
          SELECT 'doc_id_not_null' AS rule, n_rows, v_id AS n_violations
            FROM m
          UNION ALL SELECT 'text_non_empty', n_rows, v_text FROM m
          UNION ALL SELECT 'lang_known', n_rows, v_lang FROM m
          UNION ALL SELECT 'n_chars_range', n_rows, v_range FROM m
          UNION ALL SELECT 'n_chars_consistent', n_rows, v_cons FROM m)
        ORDER BY rule""")

    # exact-k deterministic sample per group (eval sets / per-domain
    # probes): hash-ranked inside each stratum, engine-independent
    add("docs_sample_k_per_group",
        lambda spark, sf: SM.sample_k_per_group(_docs(spark, sf), 10)
        .select("doc_id", "lang"),
        """SELECT doc_id, lang FROM documents
        QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY md5(concat(CAST(doc_id AS VARCHAR), ':grpk-v1')))
            <= 10""")

    # tokenizer-prep vocab coverage: per-doc OOV mass against the
    # top-30 corpus vocabulary, exact integers
    add("docs_vocab_coverage",
        lambda spark, sf: TX.vocab_coverage(_docs(spark, sf),
                                            vocab_size=30),
        r"""WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(
            trim(lower(text)), '\s+')) AS token
          FROM documents),
        ne AS (SELECT * FROM toks WHERE token <> ''),
        vocab AS (
          SELECT token FROM ne GROUP BY token
          ORDER BY COUNT(*) DESC, token LIMIT 30)
        SELECT doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_tokens,
          CAST(SUM(CASE WHEN token NOT IN (SELECT token FROM vocab)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        FROM ne GROUP BY doc_id""")

    # cross-dump duplication diagnostic (mixing-weight input): per source,
    # docs whose fingerprint also appears under another source
    add("docs_cross_source_dup",
        lambda spark, sf: D.cross_source_duplication(_docs(spark, sf)),
        r"""WITH f AS (
          SELECT doc_id, source,
                 md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
          FROM documents),
        s AS (SELECT fp, COUNT(DISTINCT source) AS n_sources
              FROM f GROUP BY fp)
        SELECT f.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN s.n_sources > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cross_dup
        FROM f JOIN s USING (fp)
        GROUP BY f.source""")

    # per-source type-token ratio (integer milli-units for bit-equality)
    add("docs_lexical_diversity",
        lambda spark, sf: TX.lexical_diversity(_docs(spark, sf)),
        r"""WITH toks AS (
          SELECT source, unnest(regexp_split_to_array(
            trim(lower(text)), '\s+')) AS token
          FROM documents),
        ne AS (SELECT * FROM toks WHERE token <> ''),
        per AS (SELECT source, token, COUNT(*) AS n FROM ne GROUP BY 1, 2)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST((COUNT(*) * 1000) // SUM(n) AS BIGINT) AS ttr_milli
        FROM per GROUP BY source""")

    # corpus composition: shared CTE chain for the distribution-shift and
    # distinctive-terms diagnostics (exact cross-multiplied integers —
    # HUGEINT on the DuckDB side mirrors Spark's DECIMAL(19,0) lane)
    _JOINT_SQL = r"""WITH toks AS (
          SELECT source, unnest(regexp_split_to_array(
            trim(lower(text)), '\s+')) AS token
          FROM documents),
        ne AS (SELECT * FROM toks WHERE token <> ''),
        per AS (SELECT source, token, CAST(COUNT(*) AS HUGEINT) AS c
                FROM ne GROUP BY 1, 2),
        corpus AS (SELECT token, SUM(c) AS ct FROM per GROUP BY 1),
        src AS (SELECT source, SUM(c) AS ts FROM per GROUP BY 1),
        tot AS (SELECT SUM(ct) AS t FROM corpus),
        j AS (SELECT p.source, p.token, p.c, co.ct, s.ts, tot.t
              FROM per p JOIN corpus co USING (token)
              JOIN src s USING (source), tot)"""

    add("docs_source_tv_distance",
        lambda spark, sf: TX.source_tv_distance(_docs(spark, sf)),
        _JOINT_SQL + """,
        agg AS (SELECT source, SUM(abs(c*t - ct*ts)) AS abs_part,
                       SUM(ct) AS cov, any_value(ts) AS ts,
                       any_value(t) AS t
                FROM j GROUP BY source)
        SELECT source, CAST(ts AS BIGINT) AS n_tokens,
               CAST((500 * (abs_part + ts*(t - cov))) // (ts * t)
                    AS BIGINT) AS tv_milli
        FROM agg""")

    add("docs_distinctive_terms",
        lambda spark, sf: TX.distinctive_terms(_docs(spark, sf),
                                               top_n=5, min_count=5),
        _JOINT_SQL + """,
        lift AS (SELECT source, token, c,
                        CAST((c * t * 1000000) // (ct * ts) AS BIGINT)
                          AS lift_ppm
                 FROM j WHERE c >= 5),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY lift_ppm DESC, token ASC) AS rn FROM lift)
        SELECT source, token, CAST(c AS BIGINT) AS n, lift_ppm,
               CAST(rn AS INTEGER) AS rn
        FROM r WHERE rn <= 5""")

    def incr_dedup(spark, sf):
        docs = _docs(spark, sf)
        from ..operators.sampling import _hash_bucket
        b = _hash_bucket(F.col("doc_id"), "batch-v1")
        seen = docs.filter(b % 2 == 0)
        new = docs.filter(b % 2 == 1)
        return SM.incremental_dedup(new, seen).select("doc_id", "lang")

    _BB = SM.hash_bucket_sql("doc_id", "batch-v1")

    add("docs_incremental_dedup", incr_dedup,
        f"""WITH fp AS (
          SELECT doc_id, lang, {_BB} % 2 AS batch,
                 md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                   AS fingerprint
          FROM documents)
        SELECT doc_id, lang FROM fp
        WHERE batch = 1
          AND fingerprint NOT IN (SELECT fingerprint FROM fp
                                  WHERE batch = 0)
          AND doc_id = (SELECT MIN(doc_id) FROM fp f2
                        WHERE f2.batch = 1
                          AND f2.fingerprint = fp.fingerprint)""")

    add("docs_length_histogram",
        lambda spark, sf: SM.length_histogram(_docs(spark, sf)),
        """SELECT CAST(n_chars // 200 AS BIGINT) * 200 AS bucket_lo,
               COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1""")

    add("docs_exact_dup_groups",
        lambda spark, sf: D.exact_dup_groups(_docs(spark, sf)),
        """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
               COUNT(*) AS copies
        FROM documents
        GROUP BY text""")

    def exact_dedup_keep(spark, sf):
        return D.exact_dedup(_docs(spark, sf), ["text"], "doc_id") \
            .select("doc_id", F.md5(F.encode(F.col("text"), "UTF-8"))
                    .alias("text_hash"))

    # deterministic survivor choice: first doc_id per duplicate text group
    add("docs_exact_dedup_keep", exact_dedup_keep,
        """SELECT doc_id, md5(text) AS text_hash
        FROM (SELECT doc_id, text,
                     ROW_NUMBER() OVER (PARTITION BY text
                                        ORDER BY doc_id) AS rn
              FROM documents)
        WHERE rn = 1""")

    # ---- trained quality classifier (round 7, beyond-reference) -------
    # The GPT-3-style classifier filter: hashed-BoW logistic regression
    # trained on weak labels from the oracle-green quality heuristic,
    # holdout-AUC-gated INSIDE the entry (raises below 0.75 — a
    # returned row proves separation, not just execution), scored over
    # the full corpus, reported as a per-decile histogram.  Iterative
    # ML training → not SQL-expressible → rows-only; negative path
    # (gate fires on shuffled labels) in tests/test_operators.py.
    def quality_classifier(spark, sf):
        from ..operators.classifier import classifier_quality_report
        return classifier_quality_report(_docs(spark, sf))

    add("docs_quality_classifier", quality_classifier, None)

    # the classifier's label step stands alone as a FULL oracle: exact
    # interpolated percentiles over the (identically rounded) heuristic
    # scores, keep the tails, label = top-tail membership.  Anchors the
    # rows-only classifier entry to an oracle-checked input contract.
    def weak_labels(spark, sf):
        from ..operators.classifier import weak_quality_labels
        return weak_quality_labels(_docs(spark, sf))

    add("docs_quality_weak_labels", weak_labels,
        r"""WITH q AS (
          SELECT doc_id, text,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
            greatest(length(text), 1) AS n_chars,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS stop_hits,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 AS INTEGER) AS punct
          FROM documents),
        scored AS (
          SELECT doc_id, text,
            ROUND(
              (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000
                    THEN 0.4 ELSE 0.0 END)
              + least(stop_hits / greatest(n_tokens, 1) * 2.0, 0.4)
              - least(punct / n_chars * 5.0, 0.2)
              + (CASE WHEN n_chars / greatest(n_tokens, 1) >= 3.0
                       AND n_chars / greatest(n_tokens, 1) <= 12.0
                      THEN 0.2 ELSE 0.0 END), 4) AS quality_score
          FROM q),
        th AS (SELECT quantile_cont(quality_score, 0.25) AS lo,
                      quantile_cont(quality_score, 0.75) AS hi
               FROM scored)
        SELECT s.doc_id, s.text,
               CAST(s.quality_score >= th.hi AS DOUBLE) AS label
        FROM scored s, th
        WHERE s.quality_score <= th.lo OR s.quality_score >= th.hi""")

    # the keep/drop lottery primitive, oracle-anchored: acceptance
    # probability q01^2 with the uniform variate drawn from md5(id:salt)
    # — both engines compute the identical 60-bit hash prefix, so the
    # kept set is value-exact (the trained-classifier filter applies the
    # SAME primitive to model scores; this entry proves the primitive)
    def quality_lottery(spark, sf):
        from ..operators.classifier import classifier_filter
        from ..operators.text import quality_score
        scored = quality_score(_docs(spark, sf)).select(
            "doc_id",
            F.greatest(F.least(F.col("quality_score"), F.lit(1.0)),
                       F.lit(0.0)).alias("q01"))
        return (classifier_filter(scored, lottery_alpha=2.0,
                                  prob_col="q01")
                .select("doc_id", F.round("q01", 4).alias("q01"),
                        "keep_reason"))

    add("docs_quality_lottery", quality_lottery,
        r"""WITH q AS (
          SELECT doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
            greatest(length(text), 1) AS n_chars,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS stop_hits,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 AS INTEGER) AS punct
          FROM documents),
        scored AS (
          SELECT doc_id,
            greatest(least(ROUND(
              (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000
                    THEN 0.4 ELSE 0.0 END)
              + least(stop_hits / greatest(n_tokens, 1) * 2.0, 0.4)
              - least(punct / n_chars * 5.0, 0.2)
              + (CASE WHEN n_chars / greatest(n_tokens, 1) >= 3.0
                       AND n_chars / greatest(n_tokens, 1) <= 12.0
                      THEN 0.2 ELSE 0.0 END), 4), 1.0), 0.0) AS q01
          FROM q)
        SELECT doc_id, ROUND(q01, 4) AS q01, 'lottery' AS keep_reason
        FROM scored
        WHERE (('0x' || substring(md5(doc_id::VARCHAR || ':clf-keep-v1'),
                                  1, 15))::UBIGINT
               / POWER(16, 15)) < POWER(q01, 2.0)""")

    # CCNet-style bigram-LM scoring (train on a clean reference slice,
    # score everything by mean NLL): the DSIR micro-unit freeze makes
    # the one float op (ln, once per distinct reference bigram/context)
    # reproducible, so the per-doc scores are bit-exact integers on
    # both engines.  Docs with <2 tokens have no bigrams and are
    # absent on both sides by construction.
    # Output columns derived from SUM(BIGINT) or `//` MUST be CAST to
    # BIGINT: DuckDB types them HUGEINT, and an Arrow/pandas-fetching
    # harness renders HUGEINT differently from BIGINT (rows/schema
    # match, value-hash mismatch — the r8/r9 driver-red signature).
    # tests/test_oracle_types.py lints every oracle for this.
    # Shared CTE chain for the LM-scoring family (score + CCNet
    # perplexity-bucket split reuse it verbatim).
    _LM_CORE = rf"""WITH tok AS (
          SELECT doc_id, source,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS t
          FROM documents),
        bigs AS (
          SELECT doc_id, source,
                 list_transform(list_zip(t[1:len(t) - 1], t[2:]),
                                p -> p[1] || ' ' || p[2]) AS bgs
          FROM tok),
        doc_big AS (
          SELECT doc_id, unnest(bgs) AS bg FROM bigs),
        doc_big_w AS (
          SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1
          FROM doc_big),
        ref_uni AS (
          SELECT unnest(t) AS w FROM tok WHERE source = 'src0'),
        ref_big AS (
          SELECT unnest(bgs) AS bg FROM bigs WHERE source = 'src0'),
        vocab AS (SELECT COUNT(DISTINCT w) AS v FROM ref_uni),
        c1 AS (SELECT w, COUNT(*) AS c1 FROM ref_uni GROUP BY w),
        c12 AS (SELECT bg, COUNT(*) AS c12 FROM ref_big GROUP BY bg),
        ctx AS (SELECT w, CAST(ROUND(lnv * 1e6) AS BIGINT)
                         AS ctx_micro
                FROM ({_CTX_LADDER})),
        seen AS (SELECT bg, CAST(ROUND(lnv * 1e6) AS BIGINT)
                          AS hit_micro
                 FROM ({_SEEN_LADDER})),
        oov AS (SELECT CAST(ROUND(lnv * 1e6) AS BIGINT)
                  AS oov_ctx_micro FROM ({_OOV_LADDER})),
        nll AS (
          SELECT d.doc_id,
                 COALESCE(ctx.ctx_micro, oov.oov_ctx_micro)
                 - COALESCE(seen.hit_micro, 0) AS nll_micro
          FROM doc_big_w d
          LEFT JOIN seen ON d.bg = seen.bg
          LEFT JOIN ctx ON d.w1 = ctx.w
          CROSS JOIN oov)"""

    add("docs_ngram_lm_score",
        lambda spark, sf: TX.ngram_lm_score(
            _docs(spark, sf), reference_cond=F.col("source") == "src0"),
        _LM_CORE + r"""
        SELECT doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(nll_micro) AS BIGINT) AS nll_sum_micro,
               CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS mean_nll_micro
        FROM nll GROUP BY doc_id""")

    # CCNet head/middle/tail split (Wenzek et al. 2020 §4.3): rank each
    # language's docs by the frozen mean NLL, cut into 3 equal-count
    # buckets by pure integer rank arithmetic — ties on doc_id, so the
    # split is bit-exact on both engines.
    add("docs_ccnet_buckets",
        lambda spark, sf: TX.ccnet_perplexity_buckets(
            _docs(spark, sf), reference_cond=F.col("source") == "src0"),
        _LM_CORE + r""",
        sc AS (
          SELECT doc_id,
                 CAST(SUM(nll_micro) // COUNT(*) AS BIGINT)
                     AS mean_nll_micro
          FROM nll GROUP BY doc_id),
        ranked AS (
          SELECT d.doc_id, d.lang, sc.mean_nll_micro,
                 ROW_NUMBER() OVER (PARTITION BY d.lang
                     ORDER BY sc.mean_nll_micro, d.doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY d.lang) AS n
          FROM documents d JOIN sc ON d.doc_id = sc.doc_id)
        SELECT doc_id, lang, mean_nll_micro,
               CAST(((rn - 1) * 3) // n AS INTEGER) AS bucket_idx,
               CASE ((rn - 1) * 3) // n WHEN 0 THEN 'head'
                    WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
        FROM ranked""")

