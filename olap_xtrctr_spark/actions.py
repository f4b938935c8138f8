"""One-shot env-var action relay.

The reference's diagnostic runner reads ACTION / CATALOG / PARAMS /
REQUEST_ID from the environment, dispatches to one of seven actions,
and writes a ``result.json`` envelope
(``{"request_id", "action", "status", "data" | "error"}``), exiting
non-zero on error (backend/actions_runner.py:18-21,368-421; the CI
relay contract in query_relay.yml:84-116).  This module mirrors that
contract over the Spark-backed service:

    ACTION=execute_mdx CATALOG=VENTAS_2025 \
    PARAMS='{"mdx": "SELECT ... FROM [sales]"}' REQUEST_ID=r42 \
    python -m olap_xtrctr_spark action

All actions are bounded metadata or page-capped query results — the
envelope is driver-side JSON by design, like the reference's.
"""
from __future__ import annotations

import json
import os
from typing import Any

ACTIONS = ("get_catalogs", "discover_structure", "discover_metadata",
           "diagnose_schema", "get_apartados", "execute_query",
           "execute_mdx")

RESULT_FILE = "result.json"


def build_mdx_query(catalog: str, params: dict) -> str:
    """Standard-syntax MDX from relay params
    (backend/actions_runner.py:220-249): measures-only SELECT with an
    optional WHERE tuple of member unique names."""
    cube = params.get("cube", catalog)
    select_fields = params.get("select", ["[Measures].AllMembers"])
    select_clause = ", ".join(select_fields)
    where_parts = [f["member_unique_name"]
                   for f in params.get("filters", [])
                   if f.get("member_unique_name")]
    mdx = f"SELECT {{{select_clause}}} ON COLUMNS FROM [{cube}]"
    if where_parts:
        mdx += " WHERE (" + ", ".join(where_parts) + ")"
    return mdx


def _dmv_rows(service, sql: str, catalog: str = "") -> list[dict[str, Any]]:
    res = service.execute_dmv(sql, catalog=catalog or None)
    return [dict(zip(res["columns"], row)) for row in res["data"]]


def _discover_structure(service, catalog: str) -> dict:
    # backend/actions_runner.py:85-111: dimensions of the main cube
    # (main cube = the one not prefixed with $)
    dims = _dmv_rows(service, "SELECT [CUBE_NAME], [DIMENSION_NAME] "
                              "FROM $system.MDSCHEMA_DIMENSIONS", catalog)
    main = next((d["CUBE_NAME"] for d in dims
                 if not str(d["CUBE_NAME"]).startswith("$")), catalog)
    return {"catalog": catalog, "main_cube": main,
            "dimensions": [d for d in dims if d["CUBE_NAME"] == main]}


def _get_catalogs_envelope(service) -> dict:
    """backend/actions_runner.py:61-82 data shape (pinned by the
    shipped golden sample ``docs/request id test 002 action.txt``):
    ``{"catalogs": [{"name", "description", "created"}]}``."""
    out = []
    for c in service.get_catalogs():
        name = str(c.get("CATALOG_NAME") or "")
        if name and not name.startswith("$"):
            out.append({"name": name,
                        "description": str(c.get("DESCRIPTION") or ""),
                        "created": str(c.get("DATE_MODIFIED") or "")})
    return {"catalogs": out}


def _get_apartados_envelope(service, catalog: str, params: dict) -> dict:
    """backend/actions_runner.py:114-180 data shape (pinned by the
    shipped golden sample ``docs/apartados_sis2025.json``):
    ``{"dimension": <unique name>, "apartados": [{"MEMBER_UNIQUE_NAME",
    "MEMBER_CAPTION"}]}`` — the Variables dimension found by the same
    VARIABLES → INDICADORES → param-fallback chain."""
    dims = [d["DIMENSION_UNIQUE_NAME"] for d in _dmv_rows(
        service, "SELECT [DIMENSION_UNIQUE_NAME] "
                 "FROM $system.MDSCHEMA_DIMENSIONS", catalog)]
    var_dim = (next((d for d in dims if "VARIABLES" in d.upper()), None)
               or next((d for d in dims
                        if "INDICADORES" in d.upper()), None)
               or params.get("dimension", "[DIM VARIABLES]"))
    members = [{"MEMBER_UNIQUE_NAME": r["MIEMBRO_UNIQUE_NAME"],
                "MEMBER_CAPTION": r["MIEMBRO_CAPTION"]}
               for r in service.get_apartados(catalog)]
    return {"dimension": var_dim, "apartados": members}


def _discover_metadata(service, catalog: str) -> dict:
    # backend/actions_runner.py:309-352: levels + member properties
    levels = _dmv_rows(
        service,
        "SELECT [DIMENSION_UNIQUE_NAME], [HIERARCHY_UNIQUE_NAME], "
        "[LEVEL_UNIQUE_NAME], [LEVEL_CAPTION] FROM $system.MDSCHEMA_LEVELS",
        catalog)
    props = _dmv_rows(
        service,
        "SELECT [DIMENSION_UNIQUE_NAME], [LEVEL_UNIQUE_NAME], "
        "[PROPERTY_NAME], [PROPERTY_CAPTION] "
        "FROM $system.MDSCHEMA_PROPERTIES", catalog)
    return {"levels": levels, "properties": props}


def run_action(service, action: str, catalog: str = "",
               params: dict | None = None,
               request_id: str = "unknown") -> dict:
    """Dispatch one relay action; always returns the result envelope
    (never raises — errors are reported in-band like the reference)."""
    params = params or {}
    result: dict[str, Any] = {"request_id": request_id, "action": action,
                              "status": "success"}
    try:
        if action == "get_catalogs":
            result["data"] = _get_catalogs_envelope(service)
        elif action == "discover_structure":
            result["data"] = _discover_structure(service, catalog)
        elif action == "discover_metadata":
            result["data"] = _discover_metadata(service, catalog)
        elif action == "diagnose_schema":
            result["data"] = service.diagnose_schema()
        elif action == "get_apartados":
            result["data"] = _get_apartados_envelope(service, catalog,
                                                     params)
        elif action == "execute_query":
            mdx = params.get("mdx") or build_mdx_query(catalog, params)
            result["data"] = service.execute_mdx(catalog, mdx)
        elif action == "execute_mdx":
            result["data"] = service.execute_mdx(catalog,
                                                 params.get("mdx", ""))
        else:
            result["status"] = "error"
            result["error"] = f"Unknown action: {action}"
    except Exception as e:                          # noqa: BLE001 — in-band
        result["status"] = "error"
        result["error"] = str(e)
    return result


def run_action_env(service, out_path: str = RESULT_FILE) -> dict:
    """Read the env-var contract, run the action, write the envelope.
    A malformed PARAMS payload still produces an error envelope (the
    relay consumer reads result.json, not a stack trace)."""
    action = os.environ.get("ACTION", "get_catalogs")
    catalog = os.environ.get("CATALOG", "")
    request_id = os.environ.get("REQUEST_ID", "unknown")
    try:
        params = json.loads(os.environ.get("PARAMS", "{}"))
        result = run_action(service, action, catalog, params, request_id)
    except ValueError as e:
        result = {"request_id": request_id, "action": action,
                  "status": "error", "error": f"bad PARAMS json: {e}"}
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(result, f, ensure_ascii=False, indent=2, default=str)
    return result
