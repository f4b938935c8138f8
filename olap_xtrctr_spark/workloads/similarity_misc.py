"""Join profiling, unicode, snapshot/versioned, multimodal entries.

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
