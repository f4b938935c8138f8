"""Round-9 wave additions that outgrew their family modules
(docs_text/curation hit the 900-line workload-module budget):
character entropy and the oracle-exact md5 HyperLogLog (batch +
streaming register fold).  Entry semantics and provenance notes live
with the operators (operators/text.char_entropy,
operators/sketches.hll_md5_*)."""
from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ..operators.fixedlog import ladder_sql
from ..operators.sketches import _hll_alpha_num
from ..workload_shared import _docs


def register(add) -> None:
    """Round-9 additions: character entropy — the fixedlog ladder
    generalizing to a NEW ln-derived score (the freeze discipline is
    reusable, not bespoke to the LM family)."""
    _ENT_LC = ladder_sql("SELECT c FROM dc", lns=[("c", "lnv")])
    _ENT_LN = ladder_sql("SELECT n FROM dn", lns=[("n", "lnv")])
    add("docs_char_entropy",
        lambda spark, sf: __import__(
            "olap_xtrctr_spark.operators.text", fromlist=["char_entropy"]
        ).char_entropy(_docs(spark, sf)),
        rf"""WITH chars AS (
          SELECT doc_id, unnest(string_split(text, '')) AS ch
          FROM documents),
        counts AS (
          SELECT doc_id, ch, COUNT(*) AS c
          FROM chars WHERE ch != '' GROUP BY 1, 2),
        tot AS (SELECT doc_id, SUM(c) AS n FROM counts GROUP BY 1),
        dc AS (SELECT DISTINCT c FROM counts),
        dn AS (SELECT DISTINCT n FROM tot),
        lc AS (SELECT c, CAST(ROUND(lnv * 1e6) AS BIGINT) AS lc_micro
               FROM ({_ENT_LC})),
        lnn AS (SELECT n, CAST(ROUND(lnv * 1e6) AS BIGINT) AS ln_micro
                FROM ({_ENT_LN})),
        s AS (SELECT counts.doc_id,
                     CAST(SUM(c * lc_micro) AS BIGINT) AS clc
              FROM counts JOIN lc USING (c) GROUP BY 1)
        SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_chars,
               CAST((lnn.ln_micro * t.n - s.clc) // t.n AS BIGINT)
                 AS entropy_micro
        FROM tot t JOIN lnn ON lnn.n = t.n
        JOIN s ON s.doc_id = t.doc_id""")


    def _hll_md5(spark, sf):
        from ..operators import sketches as SK
        from ..session import load_table
        return SK.hll_md5_distinct(
            load_table(spark, sf, "events"), ["event_type"], "user_id")

    _HLL_NUM = repr(_hll_alpha_num(10))
    _HLL_LADDER = ladder_sql(
        "SELECT event_type, nreg, v, raw, "
        "(1024.0e0 / CAST(CASE WHEN v = 0 THEN 1 ELSE v END AS DOUBLE))"
        " AS lnarg FROM est",
        lns=[("lnarg", "lnv")])
    _HLL_ORACLE = rf"""WITH h AS (
          SELECT event_type,
                 TRY_CAST(concat('0x', substr(md5(concat(
                   CAST(user_id AS VARCHAR), ':hll-v1')), 1, 15))
                   AS BIGINT) AS hv
          FROM events),
        rk AS (
          SELECT event_type, CAST(hv % 1024 AS INTEGER) AS reg,
                 CASE WHEN hv // 1024 = 0 THEN 51
                      ELSE 51 - length(bin(hv // 1024)) END AS rnk
          FROM h),
        mx AS (SELECT event_type, reg, MAX(rnk) AS max_rank
               FROM rk GROUP BY 1, 2),
        agg AS (
          SELECT event_type, COUNT(*) AS nreg,
                 SUM(CAST(power(2, 60 - max_rank) AS HUGEINT)) AS s_used
          FROM mx GROUP BY 1),
        est AS (
          SELECT event_type, nreg, 1024 - nreg AS v,
                 {_HLL_NUM}
                 / CAST(s_used + CAST(1024 - nreg AS HUGEINT)
                        * 1152921504606846976 AS DOUBLE) AS raw
          FROM agg)
        SELECT event_type,
               CASE WHEN raw <= 2560.0e0 AND v > 0
                    THEN CAST(ROUND(1024.0e0 * lnv) AS BIGINT)
                    ELSE CAST(ROUND(raw) AS BIGINT) END
                 AS n_distinct_est
        FROM ({_HLL_LADDER})"""

    add("events_hll_md5_users_by_type", _hll_md5, _HLL_ORACLE)

    # STREAMING HLL fold: per-micro-batch register tables max-merged
    # into a durable <=1024-rows-per-type store (register max is the
    # HLL union — associative and idempotent, so the folded registers
    # provably equal the one-shot sketch and the entry SHARES the
    # batch HLL's full oracle).  Completes the streaming fold family:
    # KMV cardinality, CMS frequency, bottom-k quantiles, HLL.  Same
    # replay harness as the KMV fold: three id-ordered file batches,
    # per-batch store with restart recovery, availableNow drain.
    def _stream_hll(spark, sf):
        import glob as _glob
        import os
        import shutil

        from pyspark.sql import functions as F

        from ..operators import sketches as SK
        from ..session import load_table
        ev = load_table(spark, sf, "events")
        sig = str(os.path.getsize(f"{sf}/events.parquet"))
        root = os.path.join("/tmp", "olap_xtrctr_hll_stream",
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
                     (F.col("event_id") > b1)
                     & (F.col("event_id") <= b2),
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
        state: dict = {"regs": None, "last": None}

        def fold(batch, batch_id: int) -> None:
            bspark = batch.sparkSession
            store_dir = os.path.join(out, f"store_b{batch_id}")
            prev_dir = os.path.join(out, f"store_b{batch_id - 1}")
            regs = state["regs"]
            if regs is None and batch_id > 0:    # restart recovery
                regs = bspark.read.parquet(prev_dir)
            new = SK.hll_md5_registers(batch, ["event_type"],
                                       "user_id")
            merged = new if regs is None else (
                regs.unionByName(new)
                .groupBy("event_type", "reg")
                .agg(F.max("max_rank").alias("max_rank")))
            merged.write.mode("overwrite").parquet(store_dir)
            state["regs"] = bspark.read.parquet(store_dir)
            state["last"] = store_dir

        q = (spark.readStream.schema(ev.schema)
             .option("maxFilesPerTrigger", 1)
             .parquet(os.path.join(root, "src"))
             .writeStream.foreachBatch(fold)
             .option("checkpointLocation", os.path.join(root, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        last = state["last"] or sorted(
            _glob.glob(os.path.join(out, "store_b*")))[-1]
        return SK.hll_md5_estimate(spark.read.parquet(last),
                                   ["event_type"])

    add("events_stream_hll_md5_users", _stream_hll, _HLL_ORACLE)
