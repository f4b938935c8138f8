"""CLI surface: each command produces the documented JSON envelope."""
import json

import pytest

from olap_xtrctr_spark.__main__ import build_parser, run
from olap_xtrctr_spark.service import OlapService


@pytest.fixture(scope="module")
def svc(spark, sf_dir):
    return OlapService(spark, sf_dir)


def _run(svc, *argv):
    return run(build_parser().parse_args(argv), service=svc)


def test_cli_catalogs_measures(svc):
    names = [c["CATALOG_NAME"] for c in _run(svc, "catalogs")["catalogs"]]
    assert names == ["VENTAS_1998", "VENTAS_2025"]
    ms = _run(svc, "measures", "--catalog", "VENTAS_2025")["measures"]
    assert {m["aggregator"] for m in ms} <= {"SUM", "COUNT", "AVG"}


def test_cli_members_page(svc):
    out = _run(svc, "members", "--catalog", "VENTAS_2025",
               "--dimension", "Dim Customer",
               "--hierarchy", "Dim Customer.Geografía",
               "--level", "Nation", "--limit", "7")
    assert out["total"] == 25 and len(out["members"]) == 7


def test_cli_query_and_export(svc, tmp_path):
    mdx = ("SELECT {[Measures].[Total Registros]} ON COLUMNS, "
           "NON EMPTY [Dim Customer].[Geografía].[Region].MEMBERS ON ROWS "
           "FROM [sales]")
    out = _run(svc, "query", "--catalog", "VENTAS_2025", "--mdx", mdx,
               "--export", str(tmp_path / "r.json"))
    assert out["rowCount"] == 5 and out["exported_to"].endswith("r.json")
    dumped = json.load(open(tmp_path / "r.json"))
    assert dumped["count"] == 5


def test_cli_explain_and_dmv(svc):
    mdx = ("SELECT {[Measures].[Sum Quantity]} ON COLUMNS, "
           "[Dim Orders].[Estado].[Estado].MEMBERS ON ROWS FROM [sales]")
    ex = _run(svc, "explain", "--catalog", "VENTAS_2025", "--mdx", mdx)
    assert ex["estimated_rows"] == 3 and "plan" in ex
    dmv = _run(svc, "dmv", "--sql",
               "SELECT [MEASURE_NAME] FROM $system.MDSCHEMA_MEASURES")
    assert dmv["count"] == 5
    diag = _run(svc, "diagnose")
    assert "MDSCHEMA_MEMBERS" in diag["rowsets"]


def test_cli_workload_list_run_export(svc, tmp_path):
    names = _run(svc, "workload", "--list")["queries"]
    assert "docs_keep_canonical" in names and "tpch_q1_pricing_summary" in names
    out = _run(svc, "workload", "--name", "docs_hash_split", "--limit", "5")
    assert out["columns"] == ["doc_id", "split"]
    assert len(out["preview"]) == 5 and out["truncated"]
    out = _run(svc, "workload", "--name", "events_type_user_distinct",
               "--limit", "0", "--export", str(tmp_path / "w.csv"))
    assert out["n_rows"] > 0 and out["exported_to"].endswith("w.csv")
    assert (tmp_path / "w.csv").exists()
