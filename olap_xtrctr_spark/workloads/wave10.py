"""Round-10 wave-2 additions: the distributed global-prefix family
(``operators/prefix.py``) — exact running totals without the
single-partition window trap, cumulative milestone detection, and the
interval sweep line (peak concurrency) built on the same two-phase
bucket-carry machinery.  Semantics and the 100-TB argument live with
the operators; this module binds them to the events table and the
bit-exact DuckDB oracles.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..mdx import parse_mdx
from ..operators import prefix as P
from ..session import load_table
from ..workload_shared import CATALOG, SUM_D, _FACT_OW, _OW, _eng


def _events(spark, sf):
    return load_table(spark, sf, "events")


# one milestone per 5,000 value units (frozen DECIMAL(18,4) ten-
# thousandths): ~50 crossings at sf0.001, ~500 at sf0.01 — compact
# output regardless of input size, which is the point of the entry.
_STEP = 50_000_000


def register(add) -> None:
    def milestones(spark, sf):
        df = _events(spark, sf).select(
            "event_id", "ts",
            (F.col("value").cast("decimal(18,4)") * 10000)
            .cast("long").alias("v_tenk"),
            F.expr("unix_timestamp(ts) div 3600").alias("hb"))
        return P.running_milestones(
            df, "hb", ["ts", "event_id"], "v_tenk",
            step=_STEP, id_cols=["event_id"])

    # the oracle states the SPEC (one global running sum); the engine
    # path is the two-phase bucket-carry form — same bits, parallel.
    add("events_revenue_milestones", milestones,
        f"""WITH v AS (
          SELECT event_id, ts,
                 CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                   AS v_tenk
          FROM events),
        r AS (
          SELECT event_id, v_tenk,
                 SUM(v_tenk) OVER (ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
          FROM v)
        SELECT event_id,
               CAST(running // {_STEP} AS BIGINT) AS milestone,
               CAST(running // {_STEP}
                    - (running - v_tenk) // {_STEP} AS BIGINT)
                 AS n_crossed,
               CAST(running AS BIGINT) AS running
        FROM r
        WHERE running // {_STEP} > (running - v_tenk) // {_STEP}""")

    # STREAMING cumulative milestones: an availableNow file stream
    # (one time-ordered slice per micro-batch) folds each batch through
    # running_milestones with the exact BIGINT carry of all prior
    # batches; per-batch reports are idempotent (commit marker after
    # report+carry), restart recovery reloads the last committed carry.
    # Time-ordered arrival makes the folded crossings equal the
    # one-shot crossings, so the SAME batch oracle certifies the
    # stream -> carry-state -> report chain.  This is ingestion-time
    # budget tracking (e.g. "stop at N tokens"): state is ONE integer,
    # never a row set — bounded at any scale.
    def stream_milestones(spark, sf):
        import json
        import os
        import shutil

        ev = _events(spark, sf)
        sig = str(os.path.getsize(f"{sf}/events.parquet"))
        root = os.path.join("/tmp", "olap_xtrctr_ms_stream",
                            os.path.basename(os.path.normpath(sf)))
        marker = os.path.join(root, "_DEMO_SRC")
        if not (os.path.exists(marker)
                and open(marker).read().strip() == sig):
            shutil.rmtree(root, ignore_errors=True)
            os.makedirs(os.path.join(root, "src"), exist_ok=True)
            lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
            lo_s, hi_s = (int(lo.timestamp()), int(hi.timestamp()) + 1)
            span = max(1, (hi_s - lo_s + 3) // 4)
            for i in range(4):   # 4 contiguous time slices
                cond = (
                    (F.unix_timestamp("ts") >= lo_s + i * span)
                    & (F.unix_timestamp("ts") < lo_s + (i + 1) * span))
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
        os.makedirs(out, exist_ok=True)
        state: dict = {"carry": None}

        def fold(batch, batch_id: int) -> None:
            cmark = os.path.join(out, f"_COMMITTED_b{batch_id}")
            if os.path.exists(cmark):
                return                     # replayed batch: no-op
            carry = state["carry"]
            if carry is None:              # restart recovery
                carry = 0 if batch_id == 0 else json.load(
                    open(os.path.join(out,
                                      f"carry_b{batch_id - 1}.json")))
            df = batch.select(
                "event_id", "ts",
                (F.col("value").cast("decimal(18,4)") * 10000)
                .cast("long").alias("v_tenk"),
                F.expr("unix_timestamp(ts) div 3600").alias("hb"))
            rep = P.running_milestones(
                df, "hb", ["ts", "event_id"], "v_tenk",
                step=_STEP, id_cols=["event_id"], base=carry)
            rep.write.mode("overwrite").parquet(
                os.path.join(out, f"report_b{batch_id}"))
            new_carry = carry + (df.agg(F.sum("v_tenk")).first()[0] or 0)
            json.dump(new_carry, open(
                os.path.join(out, f"carry_b{batch_id}.json"), "w"))
            open(cmark, "w").close()
            state["carry"] = new_carry

        q = (spark.readStream.schema(ev.schema)
             .option("maxFilesPerTrigger", 1)
             .parquet(os.path.join(root, "src"))
             .writeStream.foreachBatch(fold)
             .option("checkpointLocation", os.path.join(root, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return spark.read.parquet(os.path.join(out, "report_b*"))

    add("events_stream_milestones", stream_milestones, f"""WITH v AS (
          SELECT event_id, ts,
                 CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                   AS v_tenk
          FROM events),
        r AS (
          SELECT event_id, v_tenk,
                 SUM(v_tenk) OVER (ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
          FROM v)
        SELECT event_id,
               CAST(running // {_STEP} AS BIGINT) AS milestone,
               CAST(running // {_STEP}
                    - (running - v_tenk) // {_STEP} AS BIGINT)
                 AS n_crossed,
               CAST(running AS BIGINT) AS running
        FROM r
        WHERE running // {_STEP} > (running - v_tenk) // {_STEP}""")

    def concurrency(spark, sf):
        iv = P.session_intervals(_events(spark, sf))
        return P.peak_concurrency_hourly(iv)

    # session bounds share events_sessionize's gap convention (strict
    # > 1800 s on floor-epoch seconds, event_id tiebreak); endpoints
    # become +-1 deltas pre-aggregated per distinct second, so the
    # running concurrency curve is tie-free by construction.
    add("events_peak_concurrency", concurrency,
        """WITH secs AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec
          FROM events),
        flagged AS (
          SELECT user_id, ts, event_id, sec,
                 CASE WHEN sec - lag(sec) OVER w IS NULL THEN 1
                      WHEN sec - lag(sec) OVER w > 1800 THEN 1
                      ELSE 0 END AS new_s
          FROM secs
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sid AS (
          SELECT user_id, sec,
                 SUM(new_s) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
          FROM flagged),
        iv AS (
          SELECT user_id, session_seq,
                 MIN(sec) AS start_sec, MAX(sec) + 1 AS end_sec
          FROM sid GROUP BY 1, 2),
        deltas AS (
          SELECT start_sec AS sec, 1 AS delta FROM iv
          UNION ALL
          SELECT end_sec AS sec, -1 AS delta FROM iv),
        net AS (SELECT sec, SUM(delta) AS net FROM deltas GROUP BY sec),
        curve AS (
          SELECT sec, net, sec // 3600 AS hour,
                 SUM(net) OVER (ORDER BY sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS concurrent
          FROM net)
        SELECT CAST(to_timestamp(hour * 3600) AS TIMESTAMP) AS hour,
               CAST(GREATEST(MAX(concurrent),
                             arg_min(concurrent - net, sec)) AS BIGINT)
                 AS peak_concurrent,
               CAST(arg_max(concurrent, sec) AS BIGINT)
                 AS end_concurrent
        FROM curve GROUP BY hour""")

    # MDX set statistics (query.SetStatRef): MEDIAN/MIN over the
    # per-region values of a measure — per-member conditional
    # aggregates in the SAME fact scan, the statistic as a post-agg
    # array expression.  NOT expressible as one OR-predicate aggregate
    # (median of per-member sums != any aggregate of the union slice).
    _REGION_SET = ("{ [Dim Customer].[Geografía].[Region].&[0], "
                   "[Dim Customer].[Geografía].[Region].&[1], "
                   "[Dim Customer].[Geografía].[Region].&[2], "
                   "[Dim Customer].[Geografía].[Region].&[3], "
                   "[Dim Customer].[Geografía].[Region].&[4] }")
    add("cube_median_region_sales",
        lambda spark, sf: _eng(spark, sf).execute(parse_mdx(
            "WITH MEMBER [Measures].[Median Region Sales] AS "
            f"MEDIAN({_REGION_SET}, [Measures].[Sum Extendedprice]) "
            "MEMBER [Measures].[Min Region Sales] AS "
            f"MIN({_REGION_SET}, [Measures].[Sum Extendedprice]) "
            "SELECT { [Measures].[Sum Extendedprice], "
            "[Measures].[Median Region Sales], "
            "[Measures].[Min Region Sales] } ON COLUMNS, "
            "[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
            "FROM [sales]", CATALOG)),
        f"""WITH {_OW},
        a AS (
          SELECT CAST(year(l_shipdate) AS INTEGER) AS anio,
                 cust_region_key AS rk,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                      AS DOUBLE) AS v
          FROM {_FACT_OW} GROUP BY 1, 2),
        tot AS (
          SELECT CAST(year(l_shipdate) AS INTEGER) AS anio,
                 {SUM_D('l_extendedprice')} AS sum_extendedprice
          FROM {_FACT_OW} GROUP BY 1),
        r AS (
          SELECT anio, v,
                 ROW_NUMBER() OVER (PARTITION BY anio ORDER BY v, rk)
                   AS rn,
                 COUNT(*) OVER (PARTITION BY anio) AS n
          FROM a),
        med AS (
          SELECT anio,
                 (MAX(CASE WHEN rn = (n + 1) // 2 THEN v END)
                  + MAX(CASE WHEN rn = (n + 2) // 2 THEN v END)) / 2.0
                   AS median_region_sales,
                 MIN(v) AS min_region_sales
          FROM r GROUP BY anio)
        SELECT tot.anio, sum_extendedprice, median_region_sales,
               min_region_sales
        FROM tot JOIN med USING (anio)""")

    # RANK over the axis set (query.RankRef): one rank() window over
    # the aggregated axis rows — axis-sized cost, ties share a rank.
    add("cube_rank_nations",
        lambda spark, sf: _eng(spark, sf).execute(parse_mdx(
            "WITH MEMBER [Measures].[Sales Rank] AS "
            "RANK([Dim Customer].[Geografía].CurrentMember, "
            "[Measures].[Sum Extendedprice]) "
            "SELECT { [Measures].[Sum Extendedprice], "
            "[Measures].[Sales Rank] } ON COLUMNS, "
            "[Dim Customer].[Geografía].[Nation].MEMBERS ON ROWS "
            "FROM [sales]", CATALOG)),
        f"""WITH {_OW},
        a AS (
          SELECT cust_nation AS nation,
                 {SUM_D('l_extendedprice')} AS sum_extendedprice
          FROM {_FACT_OW} GROUP BY 1)
        SELECT nation, sum_extendedprice,
               CAST(RANK() OVER (ORDER BY sum_extendedprice DESC
                                 NULLS LAST) AS INTEGER) AS sales_rank
        FROM a""")

    # NONEMPTY(set, measure) — the PowerBI/Excel function form (drops
    # axis rows where THAT measure is empty, post-aggregation, so a
    # calculated lag qualifies): the first month has no PrevMember ->
    # its row drops; every surviving row's prev is non-null.
    from ..workload_shared import MES_CASE
    add("cube_nonempty_prev_months",
        lambda spark, sf: _eng(spark, sf).execute(parse_mdx(
            "WITH MEMBER [Measures].[Prev Qty] AS "
            "([Measures].[Sum Quantity], [D Tiempo].[Calendario]"
            ".PrevMember) "
            "SELECT { [Measures].[Sum Quantity], [Measures].[Prev Qty] } "
            "ON COLUMNS, NONEMPTY([D Tiempo].[Calendario].[Mes].MEMBERS"
            ", [Measures].[Prev Qty]) "
            "DIMENSION PROPERTIES MEMBER_CAPTION ON ROWS "
            "FROM [sales]", CATALOG)),
        f"""WITH m AS (
          SELECT CAST(year(l_shipdate) AS INTEGER) AS anio,
                 {MES_CASE} AS mes,
                 month(l_shipdate) AS mn, l_quantity
          FROM lineitem),
        a AS (
          SELECT anio, mes, mn, {SUM_D('l_quantity')} AS sum_quantity
          FROM m GROUP BY 1, 2, 3),
        l AS (
          SELECT anio, mes, sum_quantity,
                 LAG(sum_quantity) OVER (ORDER BY anio, mn) AS prev_qty
          FROM a)
        SELECT anio, mes, sum_quantity, prev_qty
        FROM l WHERE prev_qty IS NOT NULL""")

    # Persisted IVF index lifecycle (build once -> query many): the
    # serving-path shape for ANN at 100 TB — assignments partitioned
    # by cell on disk, queries read ONLY the probed cells (static
    # partition predicate; plan-guarded in tests/test_plans.py).
    # Same differential recall gate as the per-call ANN entries
    # (uniform corpus -> n_probe=5 of 8, floor 0.7); rows-only oracle
    # (KMeans cells are not SQL-expressible).
    def ivf_index_topk(spark, sf):
        import os

        from ..operators import similarity as S
        from ..session import load_table
        emb = load_table(spark, sf, "embeddings")
        sig = str(os.path.getsize(f"{sf}/embeddings.parquet"))
        root = os.path.join("/tmp", "olap_xtrctr_ivf_index",
                            os.path.basename(os.path.normpath(sf)), sig)
        S.ivf_build_index(emb, root)
        qids = [0, 1, 2, 3, 4]
        out = S.ivf_query_index(
            spark, root, emb.filter(F.col("vec_id").isin(qids)),
            k=3, n_probe=5)
        if emb.count() <= 100_000:
            exact1 = {r["query_id"]: r["neighbor_id"]
                      for r in S.cosine_topk(emb, qids, k=1).collect()}
            approx: dict = {}
            for r in out.collect():
                approx.setdefault(r["query_id"], set()).add(
                    r["neighbor_id"])
            hits = sum(1 for q, n1 in exact1.items()
                       if n1 in approx.get(q, set()))
            if exact1 and hits / len(exact1) < 0.7:
                raise AssertionError(
                    f"emb_ivf_index_topk: exact top-1 in approx top-3 "
                    f"for only {hits}/{len(exact1)} queries (floor 0.7)")
        return out

    add("emb_ivf_index_topk", ivf_index_topk, None)

    # MDSCHEMA_FUNCTIONS: the parser's function surface as a DMV —
    # the rows-set wrapper block enumerates mdx._SET_WRAPPERS (the
    # literal dispatch list), so rowset and parser cannot drift; the
    # oracle states the expected inventory literally (exact-value
    # check like dmv_discover_properties).
    def _dmv_functions(spark, sf):
        from .. import metadata
        from ..cube import default_registry
        from ..mdx import execute_dmv
        reg = default_registry()
        cube = reg.resolve(CATALOG)
        metadata.register_dmv_views(spark, reg, cube, sf,
                                    prefix="wl_system")
        return execute_dmv(
            spark,
            "SELECT [FUNCTION_NAME], [RETURN_TYPE] "
            "FROM $system.MDSCHEMA_FUNCTIONS ORDER BY [FUNCTION_NAME]",
            view_prefix="wl_system")

    add("dmv_mdschema_functions", _dmv_functions,
        """SELECT * FROM (VALUES
  ('ADDCALCULATEDMEMBERS', 'Set'),
  ('AGGREGATE', 'Scalar'),
  ('ANCESTOR', 'Member'),
  ('BOTTOMCOUNT', 'Set'),
  ('BOTTOMPERCENT', 'Set'),
  ('BOTTOMSUM', 'Set'),
  ('CROSSJOIN', 'Set'),
  ('DESCENDANTS', 'Set'),
  ('EXCEPT', 'Set'),
  ('FILTER', 'Set'),
  ('HEAD', 'Set'),
  ('HIERARCHIZE', 'Set'),
  ('INTERSECT', 'Set'),
  ('LASTPERIODS', 'Set'),
  ('MAX', 'Scalar'),
  ('MEDIAN', 'Scalar'),
  ('MIN', 'Scalar'),
  ('NONEMPTY', 'Set'),
  ('ORDER', 'Set'),
  ('PARALLELPERIOD', 'Member'),
  ('RANK', 'Scalar'),
  ('STRIPCALCULATEDMEMBERS', 'Set'),
  ('SUM', 'Scalar'),
  ('TAIL', 'Set'),
  ('TOPCOUNT', 'Set'),
  ('TOPPERCENT', 'Set'),
  ('TOPSUM', 'Set'),
  ('UNION', 'Set'),
  ('YTD', 'Set')
) AS t(FUNCTION_NAME, RETURN_TYPE)
ORDER BY FUNCTION_NAME""")

    # time-weighted occupancy: the integral of the concurrency curve
    # decomposes PER INTERVAL (explode to overlapped hours + clamp),
    # so no sweep line or window is needed — embarrassingly parallel,
    # all-integer, same session-interval convention as the peak entry.
    def occupancy(spark, sf):
        iv = P.session_intervals(_events(spark, sf))
        return P.occupancy_hourly(iv)

    add("events_session_occupancy", occupancy,
        """WITH secs AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec
          FROM events),
        flagged AS (
          SELECT user_id, ts, event_id, sec,
                 CASE WHEN sec - lag(sec) OVER w IS NULL THEN 1
                      WHEN sec - lag(sec) OVER w > 1800 THEN 1
                      ELSE 0 END AS new_s
          FROM secs
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sid AS (
          SELECT user_id, sec,
                 SUM(new_s) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
          FROM flagged),
        iv AS (
          SELECT user_id, session_seq,
                 MIN(sec) AS s, MAX(sec) + 1 AS e
          FROM sid GROUP BY 1, 2),
        hours AS (
          SELECT s, e, unnest(generate_series(s // 3600,
                                              (e - 1) // 3600)) AS hour
          FROM iv)
        SELECT CAST(to_timestamp(hour * 3600) AS TIMESTAMP) AS hour,
               CAST(SUM(LEAST(e, (hour + 1) * 3600)
                        - GREATEST(s, hour * 3600)) AS BIGINT)
                 AS busy_seconds,
               COUNT(*) AS n_active_intervals
        FROM hours GROUP BY hour""")

    # exact GLOBAL rank without a global sort: rank = prefix COUNT, so
    # running_total over lit(1) with value-range buckets is the
    # classic distributed-ranking primitive (the same two-phase shape;
    # a naive ROW_NUMBER() OVER (ORDER BY value) would single-task).
    # Sampled output (every 97th rank) keeps the entry compact.
    def exact_ranks(spark, sf):
        df = _events(spark, sf).select(
            "event_id",
            (F.col("value").cast("decimal(18,4)") * 10000)
            .cast("long").alias("v_tenk"),
            F.lit(1).alias("one"),
            # order-aligned bucket: 50-unit value ranges
            F.expr("cast(cast(value as decimal(18,4)) * 10000 as long)"
                   " div 500000").alias("vb"))
        ranked = P.running_total(df, "vb", ["v_tenk", "event_id"],
                                 "one", out_col="rnk")
        return (ranked.filter(F.col("rnk") % 97 == 0)
                .select("event_id", "v_tenk",
                        F.col("rnk").cast("long").alias("rnk")))

    add("events_value_exact_ranks", exact_ranks,
        """WITH v AS (
          SELECT event_id,
                 CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                   AS v_tenk
          FROM events),
        r AS (
          SELECT event_id, v_tenk,
                 ROW_NUMBER() OVER (ORDER BY v_tenk, event_id) AS rnk
          FROM v)
        SELECT event_id, v_tenk, CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk % 97 = 0""")

    # PER-KEY prefix milestones: per-source cumulative token budgets
    # over doc_id ingestion order.  With FEW HUGE keys (a corpus has a
    # handful of sources, each arbitrarily large) the plain
    # Window.partitionBy(source) answer is the same single-task trap
    # one key at a time — the keyed two-phase form partitions every
    # phase by (source, bucket) instead.  Token count = the
    # docs_token_stats whitespace convention.  step=100 is scaled to
    # the gate fixtures (~1.1-1.6k tokens per source => ~12-16
    # crossings each); the r10 step=5000 never produced a row at any
    # gate SF, so the oracle only ever compared EMPTY outputs
    # (VERDICT r10 "vacuously green").
    def source_token_milestones(spark, sf):
        from ..workload_shared import _docs
        df = _docs(spark, sf).select(
            "doc_id", "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
            .cast("long").alias("n_tokens"),
            F.expr("doc_id div 100").alias("db"))
        return P.running_milestones(
            df, "db", ["doc_id"], "n_tokens", step=100,
            id_cols=["doc_id"], key_cols=["source"])

    add("docs_source_token_milestones", source_token_milestones,
        r"""WITH v AS (
          SELECT doc_id, source,
                 CAST(len(regexp_split_to_array(trim(text), '\s+'))
                      AS BIGINT) AS n_tokens
          FROM documents),
        r AS (
          SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
          FROM v)
        SELECT source, doc_id,
               CAST(running // 100 AS BIGINT) AS milestone,
               CAST(running // 100
                    - (running - n_tokens) // 100 AS BIGINT)
                 AS n_crossed,
               CAST(running AS BIGINT) AS running
        FROM r
        WHERE running // 100 > (running - n_tokens) // 100""")
