"""Physical-plan inspection helpers: the assertions behind the
engine's plan-quality contract (broadcast where broadcastable, filters
pushed to the scan, partial aggregation before the exchange, no Python
in the hot path), usable both by the plan-pinning tests and by callers
auditing their own pipelines.

All helpers read the EXECUTED plan string — what will actually run,
after AQE's re-planning — not the logical plan.
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame

JOIN_STRATEGIES = ("BroadcastHashJoin", "SortMergeJoin",
                   "ShuffledHashJoin", "BroadcastNestedLoopJoin")


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_EXCHANGE_LINE = re.compile(r"^[\s:+|-]*Exchange ")


def shuffle_exchanges(df: DataFrame) -> int:
    """Count of data-shuffle Exchanges (broadcast exchanges excluded —
    they move a bounded build side, not the data).  Matches the node
    at ANY tree position: '+- Exchange' (last child), ':- Exchange'
    (non-last child, e.g. a join's build side), or root."""
    return sum(1 for line in executed_plan(df).splitlines()
               if _EXCHANGE_LINE.match(line))


def join_has_no_shuffle(df: DataFrame) -> bool:
    """True when the executed plan contains no data-shuffle Exchange —
    the co-located (bucketed / pre-partitioned) join contract."""
    return shuffle_exchanges(df) == 0


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Physical join strategy → count (what AQE actually picked)."""
    plan = executed_plan(df)
    out = {s: len(re.findall(s, plan)) for s in JOIN_STRATEGIES}
    return {s: n for s, n in out.items() if n}


def uses_python_eval(df: DataFrame) -> bool:
    """True when a row-at-a-time or Arrow Python eval node is in the
    plan — the slow path the hot-path operators must avoid."""
    plan = executed_plan(df)
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when map-side partial aggregation runs before the exchange
    (the 'partial_' function prefix in HashAggregate/SortAggregate)."""
    return "partial_" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists on the plan's file scans (empty list =
    nothing reached the scan)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — the column-pruning check (a scan
    reading all columns for a narrow projection is wrong)."""
    return re.findall(r"ReadSchema: ([^\n]*)", executed_plan(df))


def audit(df: DataFrame) -> dict:
    """One-call plan audit: the numbers a reviewer asks for first."""
    return {
        "shuffle_exchanges": shuffle_exchanges(df),
        "join_strategies": join_strategies(df),
        "python_eval": uses_python_eval(df),
        "partial_aggregation": has_partial_aggregation(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": scan_read_schemas(df),
    }
