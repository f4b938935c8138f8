"""Events: round-4 second-wave entries.

Entry builders moved VERBATIM from the round-6 ``workloads/events.py``
(round-7 split, VERDICT r6 task 7); build order inside this module is
unchanged.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import sampling as SM
from ..operators import text as TX
from ..streaming import events as EV
from ..workload_shared import SUM_D, _docs
from ..operators.fixedlog import ladder_sql

# Fixed-op pow(x, 0.7) = exp(0.7*ln(x)) oracle ladder (libm-free;
# operators/fixedlog.py — libm pow diverges across DuckDB builds).
_TEMP_LADDER = ladder_sql(
    "SELECT source, n_docs, n_tokens FROM per_src",
    lns=[("n_tokens", "lnn")], exps=[("0.7e0 * lnn", "wexp")])



def register(add) -> None:
    from ..session import load_events as _events
    from ..session import events_schema as _events_schema
    # ---- round-4 second wave ------------------------------------------

    # semi-structured extraction: the events `props` JSON column parsed
    # JVM-side (get_json_object stays in codegen — no Python, no UDF),
    # aggregated, and top-10'd with an explicit deterministic rank.
    def props_topk(spark, sf):
        from pyspark.sql import Window
        agg = (_events(spark, sf)
               .select(F.get_json_object("props", "$.k").cast("int")
                        .alias("k"), "value")
               .groupBy("k")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.sum(F.col("value").cast("decimal(18,4)"))
                     .cast("double").alias("sum_value")))
        # nulls LAST to match DuckDB's ASC default (Spark's asc puts
        # nulls first) — latent k-less-props hardening, no effect today
        top = agg.orderBy(F.desc("n_events"),
                          F.asc_nulls_last("k")).limit(10)
        w = Window.orderBy(F.desc("n_events"),
                           F.asc_nulls_last("k"))  # 10 rows only
        return (top.withColumn("rank", F.row_number().over(w))
                .select("rank", "k", "n_events", "sum_value"))

    add("events_props_topk", props_topk,
        f"""WITH e AS (
          SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                 value
          FROM events),
        c AS (
          SELECT k, COUNT(*) AS n_events, {SUM_D('value')} AS sum_value
          FROM e GROUP BY k)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_events DESC, k)
                    AS INTEGER) AS rank, k, n_events, sum_value
        FROM c ORDER BY n_events DESC, k LIMIT 10""")

    # stream-static broadcast join (the enrichment shape: unbounded
    # stream ⋈ bounded dimension, no state, no watermark); the bounded
    # replay equals the batch tier aggregate so the same SQL is the oracle
    def stream_tiers(spark, sf):
        return EV.replay_enriched_tiers(spark, sf, _events_schema(spark, sf))

    add("events_stream_enriched_tiers", stream_tiers,
        f"""WITH tiers(tier, lo, hi) AS (VALUES
          ('micro', 0.0, 10.0), ('small', 10.0, 50.0),
          ('mid', 50.0, 150.0), ('large', 150.0, 300.0),
          ('huge', 300.0, 1000.0))
        SELECT tier, COUNT(*) AS n_events, {SUM_D('value')} AS sum_value
        FROM events JOIN tiers ON value >= lo AND value < hi
        GROUP BY tier""")

    # fixed-size overlapping token chunks (context-window prep):
    # narrow rowwise posexplode, no shuffle
    add("docs_chunk_overlap",
        lambda spark, sf: TX.chunk_overlap(_docs(spark, sf),
                                           chunk_tokens=32, stride=24),
        r"""WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents),
        s AS (
          SELECT doc_id, toks,
                 unnest(generate_series(0, greatest(len(toks) - 1, 0), 24))
                   AS chunk_start
          FROM t)
        SELECT doc_id,
               CAST(chunk_start / 24 AS INTEGER) AS chunk_idx,
               CAST(chunk_start AS BIGINT) AS chunk_start,
               CAST(len(toks[chunk_start + 1 : chunk_start + 32])
                    AS BIGINT) AS n_chunk_tokens,
               array_to_string(toks[chunk_start + 1 : chunk_start + 32], ' ')
                 AS chunk_text
        FROM s""")

    # intra-corpus boilerplate: verbatim 8-gram spans shared by >= 3
    # distinct documents (RefinedWeb-style repeated-span detector)
    add("docs_boilerplate_ngrams",
        lambda spark, sf: TX.boilerplate_ngrams(_docs(spark, sf),
                                                n=8, min_docs=3),
        r"""WITH t AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(toks) - 7, 0) + 1),
                   i -> array_to_string(toks[i : i + 7], ' '))) AS ngram
          FROM t)
        SELECT ngram, COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences
        FROM g GROUP BY ngram
        HAVING COUNT(DISTINCT doc_id) >= 3""")

    # the actionable boilerplate op: drop documents that are MOSTLY
    # corpus-shared 8-gram spans (template pages that no exact dedup
    # catches); short docs with no 8-grams are kept
    add("docs_boilerplate_filter",
        lambda spark, sf: TX.boilerplate_filter(_docs(spark, sf),
                                                n=8, min_docs=3,
                                                max_frac=0.5),
        r"""WITH t AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(toks) - 7, 0) + 1),
                   i -> array_to_string(toks[i : i + 7], ' '))) AS ngram
          FROM t),
        boiler AS (
          SELECT ngram FROM g GROUP BY ngram
          HAVING COUNT(DISTINCT doc_id) >= 3),
        per_doc AS (
          SELECT g.doc_id, COUNT(*) AS n_grams,
                 CAST(SUM(CASE WHEN b.ngram IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
          FROM g LEFT JOIN boiler b USING (ngram)
          GROUP BY g.doc_id)
        SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        WHERE p.doc_id IS NULL OR p.n_boiler <= 0.5 * p.n_grams""")

    # blocked exact Levenshtein near-dup pairs (the VERIFY-step edit
    # distance, bounded by (lang, length-bucket) blocking)
    add("docs_edit_distance_pairs",
        lambda spark, sf: D.edit_distance_pairs(_docs(spark, sf),
                                                max_dist=20,
                                                prefix_chars=80,
                                                block_width=100),
        """WITH b AS (
          SELECT doc_id, lang, substring(text, 1, 80) AS pre,
                 CAST(floor(length(text) / 100.0) AS BIGINT) AS blk_len
          FROM documents)
        SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
               CAST(levenshtein(a.pre, b2.pre) AS INTEGER) AS edit_dist
        FROM b a JOIN b b2
          ON a.lang = b2.lang AND a.blk_len = b2.blk_len
         AND a.doc_id < b2.doc_id
        WHERE levenshtein(a.pre, b2.pre) <= 20""")

    def chunks_prep(spark, sf):
        from ..operators.pipeline import prepare_chunks
        return prepare_chunks(_docs(spark, sf), min_quality=0.63,
                              chunk_tokens=32, stride=24)

    # chunk-level continuation of prepare_corpus: quality gate ->
    # keep-first exact dedup -> overlapping chunks, one lineage
    add("docs_prepare_chunks", chunks_prep,
        r"""WITH q AS (
          SELECT doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS q_tok,
            greatest(length(text), 1) AS q_chr,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is)\b')) AS INTEGER) AS q_stop,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                 AS INTEGER) AS q_punct
          FROM documents),
        passed AS (
          SELECT d.doc_id, d.text, d.source
          FROM documents d JOIN q USING (doc_id)
          WHERE ROUND(
            (CASE WHEN q_tok >= 10 AND q_tok <= 5000
                  THEN 0.4 ELSE 0.0 END)
            + least(q_stop / greatest(q_tok, 1) * 2.0, 0.4)
            - least(q_punct / q_chr * 5.0, 0.2)
            + (CASE WHEN q_chr / greatest(q_tok, 1) >= 3.0
                     AND q_chr / greatest(q_tok, 1) <= 12.0
                    THEN 0.2 ELSE 0.0 END), 4) >= 0.63),
        fp AS (
          SELECT doc_id, text, source,
                 md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                   AS fingerprint
          FROM passed),
        kept AS (
          SELECT doc_id, text, source FROM fp
          WHERE doc_id = (SELECT MIN(f2.doc_id) FROM fp f2
                          WHERE f2.fingerprint = fp.fingerprint)),
        t AS (
          SELECT doc_id, source,
                 regexp_split_to_array(trim(text), '\s+') AS toks
          FROM kept),
        s AS (
          SELECT doc_id, source, toks,
                 unnest(generate_series(0, greatest(len(toks) - 1, 0), 24))
                   AS chunk_start
          FROM t)
        SELECT doc_id, source,
               CAST(chunk_start / 24 AS INTEGER) AS chunk_idx,
               CAST(chunk_start AS BIGINT) AS chunk_start,
               CAST(len(toks[chunk_start + 1 : chunk_start + 32])
                    AS BIGINT) AS n_chunk_tokens,
               array_to_string(toks[chunk_start + 1 : chunk_start + 32], ' ')
                 AS chunk_text
        FROM s""")

    # temperature re-weighted source mixing rates (weight ∝ n_tokens^T):
    # one bounded-domain aggregation + broadcast scalar normalizer.
    # n_tokens^T = fxexp(T·fxln(n)) via the fixed-op ladder, frozen to
    # weight_micro BEFORE the sum so the normalizer is an
    # order-independent integer
    add("docs_temperature_mix_rates",
        lambda spark, sf: SM.temperature_mix_rates(_docs(spark, sf),
                                                   temperature=0.7),
        rf"""WITH per_src AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                      AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        w AS (
          SELECT source, n_docs, n_tokens,
                 CAST(ROUND(wexp * 1e6) AS BIGINT) AS weight_micro
          FROM ({_TEMP_LADDER})),
        tot AS (SELECT CAST(SUM(weight_micro) AS BIGINT) AS wsum FROM w)
        SELECT source, n_docs, n_tokens, weight_micro,
               CAST((weight_micro * 1000000) // wsum AS BIGINT)
                 AS mix_rate_ppm
        FROM w, tot""")

    def stream_session_tracker(spark, sf):
        from ..streaming.stateful import streaming_session_tracker
        sdf = streaming_session_tracker(
            spark, sf, _events_schema(spark, sf), gap_seconds=1800,
            glob="events.parquet")
        return EV.drain_stream_to_table(
            spark, sdf, "events_stream_session_tracker",
            output_mode="append")

    # custom stateful operator with EVENT-TIME TIMEOUT
    # (applyInPandasWithState): emits each closed session exactly once —
    # closed in-batch by a later event, or flushed by the timeout
    # callback once the watermark passes last_event + gap.  The bounded
    # replay's emission set is deterministic, so a full SQL oracle
    # applies: all sessions except each user's final one, UNLESS the
    # final watermark (max ts - 1 s, in engine milliseconds) passed its
    # deadline — the exact ms arithmetic the state store uses.
    add("events_stream_session_tracker", stream_session_tracker,
        """WITH s AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(epoch_us(ts)) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)
                      IS NULL THEN 1
                      WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)
                          > 1800000000 THEN 1 ELSE 0 END AS new_s
          FROM events),
        sess AS (
          SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM s),
        agg AS (
          SELECT user_id, sid,
                 MIN(ts) AS session_start, MAX(ts) AS session_end,
                 COUNT(*) AS n_events
          FROM sess GROUP BY user_id, sid),
        agg2 AS (
          SELECT *, MAX(sid) OVER (PARTITION BY user_id) AS max_sid
          FROM agg),
        mx AS (SELECT MAX(ts) AS max_ts FROM events)
        SELECT user_id, session_start, session_end,
               CAST(n_events AS BIGINT) AS n_events
        FROM agg2, mx
        WHERE sid < max_sid
           OR (epoch_us(session_end) + 1800000000) // 1000
              < epoch_us(max_ts) // 1000 - 1000""")

    # incremental materialized-view discipline: two partial rollups
    # (disjoint halves of the corpus) merged on the rollup grain must
    # equal the single-pass rollup — the oracle IS the full rollup
    def rollup_incremental(spark, sf):
        ev = _events(spark, sf)
        old = EV.hourly_rollup(ev.filter(F.col("event_id") % 2 == 0))
        delta = EV.hourly_rollup(ev.filter(F.col("event_id") % 2 == 1))
        return EV.merge_rollup(old, delta)

    add("events_rollup_incremental", rollup_incremental,
        f"""SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n_events,
               {SUM_D('value')} AS sum_value
        FROM events
        GROUP BY 1, 2""")

    # VARIANT semi-structured path (Spark 4 binary-encoded JSON): parse
    # once, typed variant_get extraction, aggregate per key range — the
    # modern lakehouse alternative to per-query string JSON parsing
    add("events_props_variant_stats",
        lambda spark, sf: (_events(spark, sf)
            .select(F.parse_json("props").alias("v"), "value")
            .select(F.expr("variant_get(v, '$.k', 'int')").alias("k"),
                    "value")
            .groupBy(F.floor(F.col("k") / 10).cast("int")
                      .alias("k_bucket"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count_distinct("k").alias("n_distinct_k"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                  .cast("double").alias("sum_value"))),
        f"""WITH e AS (
          SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                 value
          FROM events)
        SELECT CAST(FLOOR(k / 10.0) AS INTEGER) AS k_bucket,
               COUNT(*) AS n_events,
               COUNT(DISTINCT k) AS n_distinct_k,
               {SUM_D('value')} AS sum_value
        FROM e GROUP BY 1""")

    # value-based activity deciles: the cumulative window runs over
    # DISTINCT event-count values (bounded), never over users — the
    # scalable replacement for a global NTILE ranking
    add("events_user_deciles",
        lambda spark, sf: EV.user_activity_deciles(_events(spark, sf)),
        """WITH ua AS (
          SELECT user_id, COUNT(*) AS n_events FROM events
          GROUP BY user_id),
        vc AS (
          SELECT n_events, COUNT(*) AS n_users_v FROM ua
          GROUP BY n_events),
        tot AS (SELECT COUNT(*) AS _total FROM ua),
        vd AS (
          SELECT n_events, n_users_v,
                 CAST(least(CEIL((SUM(n_users_v) OVER
                     (ORDER BY n_events DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     * 10) / _total), 10) AS INTEGER) AS decile
          FROM vc, tot)
        SELECT decile,
               CAST(SUM(n_users_v) AS BIGINT) AS n_users,
               MIN(n_events) AS min_events,
               MAX(n_events) AS max_events,
               CAST(SUM(n_events * n_users_v) AS BIGINT) AS total_events
        FROM vd GROUP BY decile""")

    # sequential-pattern mining lite: most common consecutive event-type
    # trigrams across user timelines (one user_id shuffle + bounded-key
    # count + TakeOrderedAndProject — no self-join)
    add("events_type_trigrams",
        lambda spark, sf: EV.event_type_sequences(_events(spark, sf),
                                                  n=3, k=15),
        """WITH s AS (
          SELECT event_type AS t1,
                 lead(event_type, 1) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
                 lead(event_type, 2) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS t3
          FROM events),
        c AS (
          SELECT t1 || ' > ' || t2 || ' > ' || t3 AS seq,
                 COUNT(*) AS n_occurrences
          FROM s WHERE t3 IS NOT NULL
          GROUP BY 1)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, seq)
                    AS INTEGER) AS rank, seq, n_occurrences
        FROM c ORDER BY n_occurrences DESC, seq LIMIT 15""")

    # mergeable one-pass approximate quantiles (approx_percentile = GK
    # sketch): the 100 TB path where the exact milli-quantized sort of
    # events_value_percentiles is too hot.  Rows-only: the sketch's
    # merge error is engine-specific; tests/test_operators.py pins each
    # estimate within 1% of the exact quantile.
    add("events_value_quantiles_approx",
        lambda spark, sf: (_events(spark, sf)
            .groupBy("event_type")
            .agg(F.percentile_approx(
                    "value", [0.5, 0.9, 0.99], 10_000)
                  .alias("q50_q90_q99"))
            .select("event_type",
                    F.col("q50_q90_q99")[0].alias("q50"),
                    F.col("q50_q90_q99")[1].alias("q90"),
                    F.col("q50_q90_q99")[2].alias("q99"))),
        None)


def register_r8(add) -> None:
    from pyspark.sql import Window

    from ..operators.sampling import _hash_bucket, hash_bucket_sql
    from ..operators.sketches import kmv_hash_sql
    from ..session import load_events as _events

    # Deterministic-sample exact quantiles (round 8): the ORACLE-EXACT
    # complement to events_value_quantiles_approx — a 10% md5 sample of
    # events (reproducible across engines/retries, the hash_split
    # discipline) then percentile_disc-style rank picks (value at rank
    # ceil(p*n), ties broken by event_id).  ceil(p*n) is the same IEEE
    # product on both engines; everything else is integer rank
    # comparison — no interpolation, no engine-specific sketch: the
    # picked values are stored doubles compared bit-exact.
    # Scale shape: the sample filter is a pushdown-able projection; one
    # window per event_type over the 10% sample.
    def _quant_sampled(spark, sf):
        ev = _events(spark, sf).filter(
            _hash_bucket(F.col("event_id"), "qsample-v1") < 1000)
        w = Window.partitionBy("event_type").orderBy("value", "event_id")
        wn = Window.partitionBy("event_type")
        ranked = (ev.select("event_type", "value", "event_id")
                  .withColumn("_rn", F.row_number().over(w))
                  .withColumn("_n", F.count(F.lit(1)).over(wn)))
        picks = [
            F.max(F.when(F.col("_rn") == F.expr(
                f"CAST(ceil({p} * _n) AS BIGINT)"), F.col("value")))
            .alias(name)
            for p, name in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99"))]
        return ranked.groupBy("event_type").agg(*picks)

    add("events_value_quantiles_sampled", _quant_sampled,
        rf"""WITH s AS (
          SELECT event_type, value, event_id FROM events
          WHERE {hash_bucket_sql('event_id', 'qsample-v1')} < 1000),
        r AS (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM s)
        SELECT event_type,
               MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN value END) AS q50,
               MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                        THEN value END) AS q90,
               MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                        THEN value END) AS q99
        FROM r GROUP BY event_type""")

    # STREAMING KMV fold (round 8): per-micro-batch KMV partials merged
    # into a durable store — the sketch is order-insensitive and its
    # merge is exact (kmv_merge == sketching the union, pytest-pinned),
    # so the stream fold provably equals the one-shot sketch and SHARES
    # its full oracle.  The replay harness is the span-fold pattern:
    # three ts-ordered file batches, store checkpointed per batch with
    # restart recovery, availableNow drain.
    def _stream_kmv(spark, sf):
        import os
        import shutil

        from ..operators import sketches as SK
        ev = _events(spark, sf)
        sig = str(os.path.getsize(f"{sf}/events.parquet"))
        root = os.path.join("/tmp", "olap_xtrctr_kmv_stream",
                            os.path.basename(os.path.normpath(sf)))
        marker = os.path.join(root, "_DEMO_SRC")
        if not (os.path.exists(marker)
                and open(marker).read().strip() == sig):
            shutil.rmtree(root, ignore_errors=True)
            os.makedirs(os.path.join(root, "src"), exist_ok=True)
            b1, b2 = ev.agg(
                F.expr("percentile(event_id, 0.3333)"),
                F.expr("percentile(event_id, 0.6667)")).first()
            conds = [F.col("event_id") <= b1,
                     (F.col("event_id") > b1) & (F.col("event_id") <= b2),
                     F.col("event_id") > b2]
            for i, cond in enumerate(conds):
                tmp = os.path.join(root, f"_tmp{i}")
                ev.filter(cond).coalesce(1).write.mode(
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
        state: dict = {"part": None, "last": None}

        def fold(batch, batch_id: int) -> None:
            bspark = batch.sparkSession
            store_dir = os.path.join(out, f"store_b{batch_id}")
            prev_dir = os.path.join(out, f"store_b{batch_id - 1}")
            part = state["part"]
            if part is None and batch_id > 0:    # restart recovery
                part = bspark.read.parquet(prev_dir)
            new = SK.kmv_partial(batch, ["event_type"], "user_id", k=64)
            merged = new if part is None else SK.kmv_merge(
                part.unionByName(new), ["event_type"], k=64)
            merged.write.mode("overwrite").parquet(store_dir)
            state["part"] = bspark.read.parquet(store_dir)
            state["last"] = store_dir

        q = (spark.readStream.schema(ev.schema)
             .option("maxFilesPerTrigger", 1)
             .parquet(os.path.join(root, "src"))
             .writeStream.foreachBatch(fold)
             .option("checkpointLocation", os.path.join(root, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        import glob as _glob
        last = state["last"] or sorted(
            _glob.glob(os.path.join(out, "store_b*")))[-1]
        return SK.kmv_estimate(spark.read.parquet(last),
                               ["event_type"], k=64)

    add("events_stream_kmv_users", _stream_kmv,
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

    # STREAMING CMS fold (round 8, wave 3): heavy-hitter detection over
    # an unbounded stream with BOUNDED state — per-micro-batch CMS
    # counters summed into a durable 4x256-cell store (counter addition
    # is the CMS merge, exact and order/batch-insensitive, so the
    # folded counters provably equal the one-shot batch sketch and the
    # entry SHARES the batch CMS's full oracle).  Candidates come from
    # a deterministic 20% hash sample of users (candidate tracking is
    # the part a pure CMS cannot do; the hash-sample discipline keeps
    # it engine-reproducible), each scored by the sketch and flagged
    # heavy at >= 80 events.  Same replay harness as the KMV fold:
    # three ts-ordered file batches, per-batch store with restart
    # recovery, availableNow drain.
    def _stream_cms_heavy(spark, sf):
        import os
        import shutil

        from ..operators import sketches as SK
        ev = _events(spark, sf)
        sig = str(os.path.getsize(f"{sf}/events.parquet"))
        root = os.path.join("/tmp", "olap_xtrctr_cms_stream",
                            os.path.basename(os.path.normpath(sf)))
        marker = os.path.join(root, "_DEMO_SRC")
        if not (os.path.exists(marker)
                and open(marker).read().strip() == sig):
            shutil.rmtree(root, ignore_errors=True)
            os.makedirs(os.path.join(root, "src"), exist_ok=True)
            b1, b2 = ev.agg(
                F.expr("percentile(event_id, 0.3333)"),
                F.expr("percentile(event_id, 0.6667)")).first()
            conds = [F.col("event_id") <= b1,
                     (F.col("event_id") > b1) & (F.col("event_id") <= b2),
                     F.col("event_id") > b2]
            for i, cond in enumerate(conds):
                tmp = os.path.join(root, f"_tmp{i}")
                ev.filter(cond).coalesce(1).write.mode(
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
        state: dict = {"cnt": None, "last": None}

        def fold(batch, batch_id: int) -> None:
            bspark = batch.sparkSession
            store_dir = os.path.join(out, f"store_b{batch_id}")
            prev_dir = os.path.join(out, f"store_b{batch_id - 1}")
            cnt = state["cnt"]
            if cnt is None and batch_id > 0:     # restart recovery
                cnt = bspark.read.parquet(prev_dir)
            new = SK.cms_counters(batch, "user_id", width=256)
            merged = new if cnt is None else (
                cnt.unionByName(new).groupBy("depth", "slot")
                .agg(F.sum("counter").cast("bigint").alias("counter")))
            merged.write.mode("overwrite").parquet(store_dir)
            state["cnt"] = bspark.read.parquet(store_dir)
            state["last"] = store_dir

        q = (spark.readStream.schema(ev.schema)
             .option("maxFilesPerTrigger", 1)
             .parquet(os.path.join(root, "src"))
             .writeStream.foreachBatch(fold)
             .option("checkpointLocation", os.path.join(root, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        import glob as _glob
        last = state["last"] or sorted(
            _glob.glob(os.path.join(out, "store_b*")))[-1]
        counters = spark.read.parquet(last)
        probes = (ev.select("user_id").distinct()
                  .filter(_hash_bucket(F.col("user_id"),
                                       "cms-cand-v1") < 2000))
        est = SK.cms_estimate(counters, probes, "user_id", width=256)
        return est.select("user_id", "freq_est",
                          (F.col("freq_est") >= 80).alias("is_heavy"))

    from ..operators.sketches import CMS_SALTS, cms_slot_sql
    _cnt_union = "\n          UNION ALL ".join(
        f"SELECT {d} AS depth, "
        f"{cms_slot_sql('user_id', salt, 256)} AS slot,"
        f" CAST(COUNT(*) AS BIGINT) AS counter FROM events GROUP BY 1, 2"
        for d, salt in enumerate(CMS_SALTS))
    _probe_union = "\n          UNION ALL ".join(
        f"SELECT user_id, {d} AS depth,"
        f" {cms_slot_sql('user_id', salt, 256)} AS slot FROM probes"
        for d, salt in enumerate(CMS_SALTS))

    add("events_stream_cms_heavy_users", _stream_cms_heavy,
        rf"""WITH probes AS (
          SELECT DISTINCT user_id FROM events
          WHERE {hash_bucket_sql('user_id', 'cms-cand-v1')} < 2000),
        cnt AS ({_cnt_union}),
        ps AS ({_probe_union}),
        est AS (
          SELECT ps.user_id,
                 CAST(MIN(COALESCE(cnt.counter, 0)) AS BIGINT)
                   AS freq_est
          FROM ps LEFT JOIN cnt
            ON cnt.depth = ps.depth AND cnt.slot = ps.slot
          GROUP BY ps.user_id)
        SELECT user_id, freq_est, (freq_est >= 80) AS is_heavy
        FROM est""")

    # Trailing moving average (round 8, wave 4): dashboard smoothing
    # over the hourly rollup — exact window SUMs divided once, so the
    # doubles are engine-identical (streaming/events.hourly_moving_avg).
    from ..streaming import events as EV

    add("events_hourly_moving_avg",
        lambda spark, sf: EV.hourly_moving_avg(_events(spark, sf)),
        f"""WITH b AS (
          SELECT date_trunc('hour', ts) AS hour, event_type,
                 COUNT(*) AS n_events,
                 {SUM_D('value')} AS sum_value
          FROM events GROUP BY 1, 2)
        SELECT hour, event_type, n_events,
               CAST(SUM(n_events) OVER w AS DOUBLE)
                 / CAST(COUNT(*) OVER w AS DOUBLE) AS ma_events,
               CAST(SUM(CAST(sum_value AS DECIMAL(18,4))) OVER w
                    AS DOUBLE)
                 / CAST(COUNT(*) OVER w AS DOUBLE) AS ma_value
        FROM b
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""")

    # Bloom-prefiltered semi-join (round 8, wave 4): big-spender
    # activity — events of users who ever posted value > 250, via the
    # deterministic bloom prefilter ahead of the exact semi-join
    # (operators/joins.bloom_semi_join).  The bloom stage is plan
    # shape, not semantics, so the oracle is the plain semi-join.
    def _bloom_semijoin(spark, sf):
        from ..operators import joins as J
        ev = _events(spark, sf)
        build = ev.filter(F.col("value") > 250).select("user_id")
        joined = J.bloom_semi_join(ev, build, "user_id")
        return (joined.groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum(F.col("value").cast("decimal(18,4)"))
                      .cast("double").alias("sum_value")))

    add("events_bloom_semijoin", _bloom_semijoin,
        f"""WITH b AS (
          SELECT DISTINCT user_id FROM events WHERE value > 250)
        SELECT e.user_id, COUNT(*) AS n_events,
               {SUM_D('value')} AS sum_value
        FROM events e JOIN b USING (user_id)
        GROUP BY 1""")

    # STREAMING bottom-k fold (round 8, wave 7): quantiles over an
    # unbounded stream with bounded state — per-batch bottom-k sample
    # partials re-merged into a durable <=64-rows-per-type store (the
    # merge is exact k-minima-of-union, order/batch-insensitive, so
    # the folded state provably equals the one-shot batch sketch and
    # the entry SHARES the batch oracle).  Completes the fold family:
    # KMV (cardinality), CMS (frequency), bottom-k (quantiles).
    def _stream_bottomk(spark, sf):
        import os
        import shutil

        from ..operators import sketches as SK
        ev = _events(spark, sf)
        sig = str(os.path.getsize(f"{sf}/events.parquet"))
        root = os.path.join("/tmp", "olap_xtrctr_bk_stream",
                            os.path.basename(os.path.normpath(sf)))
        marker = os.path.join(root, "_DEMO_SRC")
        if not (os.path.exists(marker)
                and open(marker).read().strip() == sig):
            shutil.rmtree(root, ignore_errors=True)
            os.makedirs(os.path.join(root, "src"), exist_ok=True)
            b1, b2 = ev.agg(
                F.expr("percentile(event_id, 0.3333)"),
                F.expr("percentile(event_id, 0.6667)")).first()
            conds = [F.col("event_id") <= b1,
                     (F.col("event_id") > b1) & (F.col("event_id") <= b2),
                     F.col("event_id") > b2]
            for i, cond in enumerate(conds):
                tmp = os.path.join(root, f"_tmp{i}")
                ev.filter(cond).coalesce(1).write.mode(
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
        state: dict = {"part": None, "last": None}

        def fold(batch, batch_id: int) -> None:
            bspark = batch.sparkSession
            store_dir = os.path.join(out, f"store_b{batch_id}")
            prev_dir = os.path.join(out, f"store_b{batch_id - 1}")
            part = state["part"]
            if part is None and batch_id > 0:    # restart recovery
                part = bspark.read.parquet(prev_dir)
            new = SK.bottomk_partial(batch, ["event_type"], "event_id",
                                     "value", k=64)
            merged = new if part is None else SK.bottomk_merge(
                part.unionByName(new), ["event_type"], k=64)
            merged.write.mode("overwrite").parquet(store_dir)
            state["part"] = bspark.read.parquet(store_dir)
            state["last"] = store_dir

        q = (spark.readStream.schema(ev.schema)
             .option("maxFilesPerTrigger", 1)
             .parquet(os.path.join(root, "src"))
             .writeStream.foreachBatch(fold)
             .option("checkpointLocation", os.path.join(root, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        import glob as _glob
        last = state["last"] or sorted(
            _glob.glob(os.path.join(out, "store_b*")))[-1]
        from ..operators import sketches as SK2
        return SK2.bottomk_quantiles(spark.read.parquet(last),
                                     ["event_type"])

    _BKH2 = ("TRY_CAST(concat('0x', substr(md5(concat(CAST(event_id AS "
             "VARCHAR), ':bk-v1')), 1, 15)) AS BIGINT)")
    add("events_stream_bottomk_quantiles", _stream_bottomk,
        rf"""WITH h AS (
          SELECT event_type, {_BKH2} AS bk_h, value FROM events),
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
