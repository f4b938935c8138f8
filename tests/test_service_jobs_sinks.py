"""Service façade, job lifecycle, sinks, validators, multimodal plumbing."""
import math
import os

import pytest
from pyspark.sql import Row

from olap_xtrctr_spark import AxisItem, QueryRequest
from olap_xtrctr_spark.jobs import COMPLETED, FAILED
from olap_xtrctr_spark.operators.multimodal import (extract_features,
                                                    synthetic_media)
from olap_xtrctr_spark.service import OlapService
from olap_xtrctr_spark.sinks import (sanitize, to_json_result, write_csv,
                                     write_excel)
from olap_xtrctr_spark.validators import (parse_range_list, sanitize_filename,
                                          sanitize_search)


@pytest.fixture(scope="module")
def svc(spark, sf_dir):
    return OlapService(spark, sf_dir)


def test_catalog_and_dimension_listing(svc):
    cats = svc.get_catalogs()
    assert [c["CATALOG_NAME"] for c in cats] == ["VENTAS_1998",
                                                 "VENTAS_2025"]
    dims = svc.get_dimensions("VENTAS_2025")
    names = {d["name"] for d in dims}
    assert "Dim Customer" in names and "DIM VARIABLES2025" in names
    geo = next(h for d in dims if d["name"] == "Dim Customer"
               for h in d["hierarchies"] if h["name"] == "Geografía")
    assert [lv["name"] for lv in geo["levels"]] == \
        ["Region", "Nation", "Customer"]


def test_measures_listing_visible_only(svc):
    ms = svc.get_measures("VENTAS_2025")
    assert {m["name"] for m in ms} == {
        "Sum Extendedprice", "Total Registros", "Sum Quantity",
        "Avg Discount", "Distinct Orders"}


def test_members_paged_and_apartados(svc):
    page = svc.get_members("VENTAS_2025", "Dim Customer",
                           "Dim Customer.Geografía", "Nation", limit=10)
    assert page["total"] == 25 and len(page["members"]) == 10
    aps = svc.get_apartados("VENTAS_2025")
    assert len(aps) == 25
    vars_ = svc.get_variables(
        "VENTAS_2025", [aps[0]["MIEMBRO_UNIQUE_NAME"]])
    assert all(v["PARENT_UNIQUE_NAME"] == aps[0]["MIEMBRO_UNIQUE_NAME"]
               for v in vars_)


def test_execute_query_response_shape(svc):
    res = svc.execute_query(QueryRequest(
        "VENTAS_2025", measures=["Total Registros"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Region")]))
    assert res["rowCount"] == 5
    assert {c["field"] for c in res["columns"]} == \
        {"region", "total_registros"}
    assert all(set(r) == {"region", "total_registros"} for r in res["rows"])


def test_job_store_survives_restart(spark, tmp_path):
    """Durable jobs (reference 002_jobs_table.sql:5-14): COMPLETED state +
    result payload survive a registry restart; a job left RUNNING by a
    dead process is recovered as FAILED."""
    import json
    import uuid

    from olap_xtrctr_spark.jobs import JobRegistry

    store = str(tmp_path / "jobs")
    reg = JobRegistry(store_dir=store)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    jid = reg.submit("VENTAS_2025", "-- runner-backed", lambda: df)
    assert reg.wait(jid, timeout=60)["status"] == COMPLETED

    # simulated crash: a RUNNING record whose thread no longer exists
    zombie_id = str(uuid.uuid4())
    with open(os.path.join(store, f"{zombie_id}.json"), "w") as f:
        json.dump({"id": zombie_id, "catalog_code": "VENTAS_2025",
                   "mdx_query": "q", "status": "RUNNING",
                   "result_data": None, "error_message": None,
                   "created_at": "2026-01-01T00:00:00",
                   "updated_at": "2026-01-01T00:00:00"}, f)
    reg.shutdown()

    reg2 = JobRegistry(store_dir=store)      # the "restart"
    recovered = reg2.get(jid)
    assert recovered["status"] == COMPLETED
    assert recovered["result_data"]["count"] == 1
    zombie = reg2.get(zombie_id)
    assert zombie["status"] == FAILED
    assert "restart" in zombie["error_message"]
    reg2.shutdown()


def test_cross_process_job_dispatch(spark, tmp_path):
    """v3 pipeline shape (workers/api jobs.ts:45-112 → db_runner.py):
    the submitter persists a QUEUED job (query text only — nothing
    executable crosses the boundary), a SEPARATE registry instance over
    the same store claims and runs it, and the submitter observes
    COMPLETED + results purely through the shared store.  A second
    worker pass must find nothing (atomic claim)."""
    from olap_xtrctr_spark.jobs import JobRegistry, QUEUED

    store = str(tmp_path / "jobs")
    submitter = JobRegistry(store_dir=store)
    jid = submitter.enqueue("VENTAS_2025", "SELECT 1 -- portable payload")
    assert submitter.get(jid)["status"] == QUEUED

    worker = JobRegistry(store_dir=store)    # plays the runner process
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    ran = worker.run_queued(lambda catalog, mdx: df)
    assert ran == 1
    assert worker.run_queued(lambda c, m: df) == 0   # claim is exclusive

    done = submitter.wait(jid, timeout=60)   # read-through from disk
    assert done["status"] == COMPLETED
    assert done["result_data"]["count"] == 2
    # QUEUED jobs survive a restart (nobody owned them yet)
    jid2 = submitter.enqueue("VENTAS_2025", "SELECT 2")
    submitter.shutdown(); worker.shutdown()
    reg3 = JobRegistry(store_dir=store)
    assert reg3.get(jid2)["status"] == QUEUED
    assert reg3.get(jid)["status"] == COMPLETED
    reg3.shutdown()


def test_job_lifecycle_success_and_failure(svc):
    jid = svc.submit_job(
        "VENTAS_2025",
        "SELECT {[Measures].[Total Registros]} ON COLUMNS, "
        "NON EMPTY [Dim Customer].[Geografía].[Region].MEMBERS ON ROWS "
        "FROM [sales]")
    job = svc.jobs.wait(jid, timeout=120)
    assert job["status"] == COMPLETED
    assert job["result_data"]["count"] == 5
    assert job["result_data"]["columns"] == ["region", "total_registros"]
    # data cells are stringified (reference db_runner.py:73)
    assert all(isinstance(v, str) for row in job["result_data"]["data"]
               for v in row)

    # invalid MDX → rejected before dispatch
    with pytest.raises(Exception):
        svc.submit_job("VENTAS_2025", "GARBAGE QUERY")

    # runtime failure → FAILED with message
    jid2 = svc.jobs.submit("VENTAS_2025", "boom",
                           lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    job2 = svc.jobs.wait(jid2, timeout=30)
    assert job2["status"] == FAILED and "boom" in job2["error_message"]


def test_search_sanitized(svc):
    assert svc.search_members("VENTAS_2025", "; DROP TABLE--") == []
    hits = svc.search_members("VENTAS_2025", "EUROPE")
    assert hits


def test_sanitize_nan_inf(spark):
    df = spark.createDataFrame(
        [Row(a=1.0), Row(a=float("nan")), Row(a=float("inf"))])
    vals = [r["a"] for r in sanitize(df).collect()]
    assert vals[0] == 1.0 and vals[1] is None and vals[2] is None


def test_json_result_envelope(spark):
    df = spark.createDataFrame([Row(x=1, y=float("nan"))])
    res = to_json_result(df)
    assert res["columns"] == ["x", "y"]
    assert res["data"] == [["1", None]]
    assert res["count"] == 1 and "executed_at" in res


def test_csv_roundtrip_reconciled(spark, tmp_path):
    df = spark.range(100).withColumnRenamed("id", "x")
    n = write_csv(df, str(tmp_path / "out_csv"), single_file=True)
    assert n == 100


def test_excel_guard(spark, tmp_path, monkeypatch):
    import olap_xtrctr_spark.sinks as sinks
    monkeypatch.setattr(sinks, "LARGE_RESULT_THRESHOLD", 10)
    with pytest.raises(ValueError, match="guard"):
        sinks.write_excel(spark.range(100), str(tmp_path / "x.xlsx"))


def test_excel_export_roundtrip(spark, tmp_path):
    """write_excel works WITHOUT openpyxl (bundled OOXML writer) and the
    file parses back with a structure-level read (zip + XML)."""
    import xml.etree.ElementTree as ET
    import zipfile

    from pyspark.sql import functions as F
    df = spark.range(5).select(
        F.col("id"),
        F.concat(F.lit("n\x01am\x1fe-"), F.col("id").cast("string"))
         .alias("name"),                       # control chars must strip
        (F.col("id") * 1.5).alias("score"))
    path = str(tmp_path / "out.xlsx")
    assert write_excel(df, path) == 5

    with zipfile.ZipFile(path) as zf:
        assert "xl/worksheets/sheet1.xml" in zf.namelist()
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    rows = sheet.findall(f"{ns}sheetData/{ns}row")
    assert len(rows) == 6                      # header + 5 data rows
    texts = [t.text for t in sheet.iter(f"{ns}t")]
    assert "name-0" in texts and all("\x01" not in t for t in texts)
    values = [v.text for v in sheet.iter(f"{ns}v")]
    assert "1.5" in values                     # numeric cell kept native


def test_validators():
    assert parse_range_list("1,3,5-8, 10") == [1, 3, 5, 6, 7, 8, 10]
    with pytest.raises(ValueError):
        parse_range_list("5-2")
    with pytest.raises(ValueError):
        parse_range_list("1,2", max_value=1)
    assert sanitize_search("héllo; DROP--") == "héllo"
    assert "DELETE" not in sanitize_search("DELETE FROM members")
    assert sanitize_filename("a/b\\c:d") == "a_b_c_d"


def test_multimodal_feature_plumbing(spark):
    media = synthetic_media(spark, n=32)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])
    # deterministic: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in feats.collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_explain_query_dry_run(spark, sf_dir):
    """X8: dry-run plans and estimates without executing."""
    from olap_xtrctr_spark import AxisItem, QueryRequest
    from olap_xtrctr_spark.service import OlapService
    svc = OlapService(spark, sf_dir)
    out = svc.explain_query(QueryRequest(
        "VENTAS_2025", measures=["Sum Quantity"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Nation")]))
    assert out["estimated_rows"] == 25
    assert "HashAggregate" in out["plan"] or "Aggregate" in out["plan"]
    assert "nation" in out["columns"]


from hypothesis import given, strategies as st


@given(st.lists(st.integers(min_value=1, max_value=999), min_size=1,
                max_size=20))
def test_parse_range_list_roundtrip_property(vals):
    """Any int list serialized as CSV parses back to its sorted unique set."""
    text = ",".join(str(v) for v in vals)
    assert parse_range_list(text) == sorted(set(vals))


@given(st.integers(min_value=1, max_value=200),
       st.integers(min_value=0, max_value=50))
def test_parse_range_span_property(lo, width):
    hi = lo + width
    assert parse_range_list(f"{lo}-{hi}") == list(range(lo, hi + 1))


def test_diagnose_schema_lists_rowsets(spark, sf_dir):
    """M1/M10: every DMV rowset probes available with its column set."""
    from olap_xtrctr_spark.service import OlapService
    svc = OlapService(spark, sf_dir)
    out = svc.diagnose_schema()
    assert set(out) == {"DBSCHEMA_CATALOGS", "MDSCHEMA_CUBES",
                        "MDSCHEMA_DIMENSIONS", "MDSCHEMA_HIERARCHIES",
                        "MDSCHEMA_LEVELS", "MDSCHEMA_MEASURES",
                        "MDSCHEMA_MEMBERS", "MDSCHEMA_PROPERTIES",
                        "MDSCHEMA_FUNCTIONS",
                        "DISCOVER_SCHEMA_ROWSETS", "DISCOVER_SESSIONS",
                        "DISCOVER_CONNECTIONS", "DISCOVER_PROPERTIES"}
    assert "FUNCTION_NAME" in out["MDSCHEMA_FUNCTIONS"]
    assert "PROPERTY_NAME" in out["MDSCHEMA_PROPERTIES"]
    assert "MIEMBRO_UNIQUE_NAME" in out["MDSCHEMA_MEMBERS"]
    assert "LEVEL_NUMBER" in out["MDSCHEMA_LEVELS"]
    assert "SCHEMA_COLUMNS" in out["DISCOVER_SCHEMA_ROWSETS"]


def test_excel_workbook_multi_sheet(spark, tmp_path):
    """Multi-sheet workbook (reference catalog/discovery exports): three
    sheets, each readable back at the zip+XML level with its own name."""
    import xml.etree.ElementTree as ET
    import zipfile

    import olap_xtrctr_spark.sinks as sinks
    from pyspark.sql import functions as F

    path = str(tmp_path / "wb.xlsx")
    counts = sinks.write_excel_workbook(path, {
        "RESUMEN": spark.createDataFrame(
            [("Catalogo", "VENTAS_2025")], "Info string, Valor string"),
        "Rowsets": spark.range(3).select(
            F.col("id"), F.concat(F.lit("r\x02s-"), F.col("id").cast("string"))
            .alias("rowset")),
        "A-very-long-sheet-name-that-exceeds-31-chars": spark.range(2),
    })
    assert counts == {"RESUMEN": 1, "Rowsets": 3,
                      "A-very-long-sheet-name-that-exc": 2}

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as zf:
        for i in (1, 2, 3):
            assert f"xl/worksheets/sheet{i}.xml" in zf.namelist()
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.iter(f"{ns}sheet")]
        sheet2 = ET.fromstring(zf.read("xl/worksheets/sheet2.xml"))
    assert names == ["RESUMEN", "Rowsets",
                     "A-very-long-sheet-name-that-exc"]
    texts = [t.text for t in sheet2.iter(f"{ns}t")]
    assert "rs-0" in texts          # control char stripped


def test_excel_workbook_collision_and_guard(spark, tmp_path, monkeypatch):
    import olap_xtrctr_spark.sinks as sinks
    with pytest.raises(ValueError, match="collide"):
        sinks.write_excel_workbook(str(tmp_path / "c.xlsx"), {
            "A-very-long-sheet-name-that-exceeds-31-chars": spark.range(1),
            "A-very-long-sheet-name-that-excXX": spark.range(1)})
    monkeypatch.setattr(sinks, "LARGE_RESULT_THRESHOLD", 10)
    with pytest.raises(ValueError, match="guard"):
        sinks.write_excel_workbook(str(tmp_path / "g.xlsx"),
                                   {"big": spark.range(100)})


def test_service_metadata_workbook(svc, tmp_path):
    """RESUMEN + one sheet per DMV rowset, per the reference's catalog
    metadata export."""
    import zipfile

    from olap_xtrctr_spark import metadata

    path = str(tmp_path / "meta.xlsx")
    counts = svc.export_metadata_workbook(path)
    assert set(counts) == {"RESUMEN", *metadata.DMV_BUILDERS}
    assert counts["RESUMEN"] == 3
    assert counts["MDSCHEMA_MEASURES"] >= 5
    assert counts["MDSCHEMA_MEMBERS"] > 0
    with zipfile.ZipFile(path) as zf:
        assert len([n for n in zf.namelist()
                    if n.startswith("xl/worksheets/")]) == len(counts)


def test_dmv_catalog_scoped_views_coexist(svc):
    """Catalog-scoped DMV calls register PER-CUBE view names, so two
    catalogs' rowsets exist side by side — concurrent requests on the
    threaded server can no longer clobber each other's views."""
    svc.execute_dmv("SELECT [CUBE_NAME] FROM $system.MDSCHEMA_MEASURES",
                    catalog="VENTAS_2025")
    svc.execute_dmv("SELECT [CUBE_NAME] FROM $system.MDSCHEMA_MEASURES",
                    catalog="VENTAS_1998")
    a = {r["CUBE_NAME"] for r in
         svc.spark.table("system_sales_MDSCHEMA_MEASURES").collect()}
    b = {r["CUBE_NAME"] for r in
         svc.spark.table("system_ventas1998_MDSCHEMA_MEASURES").collect()}
    assert a == {"sales"} and b == {"ventas1998"}


def test_discover_sessions_reflects_jobs(spark, sf_dir):
    """DISCOVER_SESSIONS = the jobs registry projected to the rowset the
    reference's server scan probes (DGIS_SCAN_2_stable.py:266)."""
    from olap_xtrctr_spark.service import OlapService
    svc = OlapService(spark, sf_dir)
    mdx = ("SELECT {[Measures].[Total Registros]} ON COLUMNS "
           "FROM [sales]")
    jid = svc.submit_job("VENTAS_2025", mdx)
    svc.jobs.wait(jid, timeout=60)
    res = svc.execute_dmv(
        "SELECT [SESSION_ID], [SESSION_STATUS], "
        "[SESSION_CURRENT_DATABASE], [SESSION_LAST_COMMAND] "
        "FROM $system.DISCOVER_SESSIONS "
        "WHERE [SESSION_CURRENT_DATABASE] = 'VENTAS_2025'")
    rows = [dict(zip(res["columns"], r)) for r in res["data"]]
    assert any(r["SESSION_ID"] == jid and r["SESSION_STATUS"] == "COMPLETED"
               and r["SESSION_LAST_COMMAND"] == mdx for r in rows)


def test_discover_connections_and_properties_rowsets(spark, sf_dir):
    from olap_xtrctr_spark.service import OlapService
    svc = OlapService(spark, sf_dir)
    res = svc.execute_dmv("SELECT * FROM $system.DISCOVER_CONNECTIONS")
    conn = [dict(zip(res["columns"], r)) for r in res["data"]]
    assert len(conn) == 1
    assert conn[0]["CONNECTION_ID"] == spark.sparkContext.applicationId
    assert conn[0]["CONNECTION_HOST_NAME"] == spark.sparkContext.master
    # DISCOVER_PROPERTIES restriction pushes down like any DMV (M4)
    props = svc.execute_dmv(
        "SELECT [PROPERTY_NAME], [VALUE] FROM $system.DISCOVER_PROPERTIES "
        "WHERE [PROPERTY_NAME] = 'MemberPageSize'")
    assert props["data"] == [["MemberPageSize", "1000"]]
    # service-level diagnostics payload (reference full_discovery order)
    names = {p["PROPERTY_NAME"] for p in svc.get_server_properties()}
    assert {"ProviderName", "ProviderVersion", "PreviewLimit",
            "MemberPageSize"} <= names


def test_discover_schema_rowsets_lists_itself(spark, sf_dir):
    from olap_xtrctr_spark.service import OlapService
    svc = OlapService(spark, sf_dir)
    res = svc.execute_dmv(
        "SELECT [SCHEMA_NAME], [SCHEMA_COLUMNS] "
        "FROM $system.DISCOVER_SCHEMA_ROWSETS")
    by_name = dict(res["data"])
    assert "DISCOVER_SCHEMA_ROWSETS" in by_name       # self-describing
    assert by_name["DBSCHEMA_CATALOGS"] == "CATALOG_NAME,DESCRIPTION"
    # every advertised rowset is actually queryable through execute_dmv,
    # with exactly the advertised columns
    for name in by_name:
        got = svc.execute_dmv(f"SELECT * FROM $system.{name}")
        assert got["columns"] == by_name[name].split(",")
