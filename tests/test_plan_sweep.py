"""Workload-wide single-partition plan sweep (VERDICT r11 task 4).

The r10 RFM trap — a global ntile whose window input scales WITH the
data — is the one plan shape that passes every value-level gate and
still dies at 100 TB.  The per-entry guards in test_plans.py pin the
worst known cases; this sweep generalizes them: EVERY workload entry's
physical plan is walked, and any ``Window``/``Sort`` fed by an
``Exchange SinglePartition`` whose subtree carries no bounding limit
must either not exist or be on the allowlist below with a reason.

Allowlist semantics: a single-partition window is legitimate ONLY when
its input is bounded by CONSTRUCTION — a |buckets|-row carry table, a
dimension-cardinality aggregate, a limit-k frame the detector already
recognizes structurally, or reference-mandated global-order semantics
over a guarded member list.  "The fixture is small" is never a reason.
"""
from __future__ import annotations

import pytest

from olap_xtrctr_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"

# Nodes a Window/Sort legitimately reads through on the way to its
# feeding exchange.
_PASS_THROUGH = {"WholeStageCodegenExec", "InputAdapter", "ProjectExec",
                 "FilterExec", "ColumnarToRowExec", "SortExec",
                 "CoalesceExec", "UnionExec"}
# A limit below the exchange bounds the window input structurally —
# the rank-stamp-over-limit(k) idiom needs no allowlist entry.
_BOUNDING = {"GlobalLimitExec", "TakeOrderedAndProjectExec",
             "CollectLimitExec", "LocalLimitExec"}

# entry -> why its single-partition window input is bounded by
# construction (audited r12; see the operator docstrings for details).
ALLOWED_SINGLE_PARTITION = {
    # -- two-phase prefix machinery (operators/prefix.py): the ONLY
    #    serial step is the |value-range buckets|-row carry window over
    #    a pre-aggregated bucket table, never the row stream:
    "events_revenue_milestones": "bucket-carry window (prefix.py)",
    "events_peak_concurrency": "bucket-carry window (prefix.py)",
    "events_value_exact_ranks": "bucket-carry window (prefix.py)",
    "events_value_drawdown_milestones": "bucket-carry window (prefix.py)",
    "events_rfm_segments":
        "three bucket-carry windows (recency/frequency/monetary range "
        "buckets), the r11 rewrite that REMOVED the global-ntile trap",
    "docs_interleave_sources":
        "TWO bucket-carry windows (prefix.py composed twice: per-source "
        "rank over id-range buckets, global position over rank-range "
        "buckets); row-level windows stay bucket-parallel",
    "events_user_deciles":
        "cumulative window over DISTINCT event-count values (bounded "
        "by the count domain), never over users",
    # -- dimension-cardinality windows: the window input is a final
    #    aggregate keyed by calendar months (<= 84 rows at 7 years) or
    #    nations/regions (25/5) — cube-dimension bounded:
    "cube_month_delta": "window over (year,month) aggregate",
    "cube_next_month_delta": "window over (year,month) aggregate",
    "cube_rolling_quarter": "window over (year,month) aggregate",
    "cube_declining_months": "window over (year,month) aggregate",
    "cube_month_vs_last_year": "window over (year,month) aggregate",
    "cube_nonempty_prev_months": "window over (year,month) aggregate",
    "cube_topsum_months": "TOPSUM share scan over (year,month) aggregate",
    "cube_rank_nations": "rank over the 25-nation aggregate",
    "cube_toppercent_nations": "TOPPERCENT share scan over 25 nations",
    "cube_bottompercent_nations": "BOTTOMPERCENT share scan over 25 nations",
    # -- bounded score/threshold domains:
    "docs_quality_threshold_sweep":
        "cumulative counts over the quantized quality-threshold grid "
        "(bounded bucket domain, not docs)",
    "docs_token_budget_fill":
        "boundary search over quality-score buckets (sampling.py "
        "explicitly avoids the full-corpus running sum)",
    "docs_corpus_card":
        "summary-card window over the per-(source,lang) aggregate",
    "docs_budget_allocation":
        "largest-remainder rank over the per-source weight aggregate "
        "(the docs_corpus_card class; sampling.budget_allocation)",
    # -- reference-mandated global order:
    "members_ordinal_sort":
        "reference N4/N5 semantics: globally ordered member list, "
        "level-cardinality bounded and behind the N18 guard",
    "docs_pack_sequences":
        "reference packing semantics: ONE global greedy pack is "
        "order-dependent and inherently serial; "
        "docs_pack_sequences_sharded is the documented scale path",
}


def _simple(jn) -> str:
    return jn.getClass().getSimpleName()


def _children(jn):
    if _simple(jn) == "AdaptiveSparkPlanExec":
        return [jn.initialPlan()]
    ch = jn.children()
    return [ch.apply(i) for i in range(ch.size())]


def _subtree(jn):
    yield jn
    for c in _children(jn):
        yield from _subtree(c)


def find_unbounded_single_partition(plan) -> list[str]:
    """Window/Sort nodes fed by a SinglePartition exchange whose
    subtree carries no structural bound."""
    out = []
    for node in _subtree(plan):
        nm = _simple(node)
        if nm not in ("WindowExec", "WindowGroupLimitExec", "SortExec"):
            continue
        stack = _children(node)
        while stack:
            c = stack.pop()
            cn = _simple(c)
            if cn in _PASS_THROUGH:
                stack.extend(_children(c))
            elif cn == "ShuffleExchangeExec":
                if "SinglePartition" in c.outputPartitioning().toString():
                    names = [_simple(x) for x in _subtree(c)]
                    if not (set(names) & _BOUNDING):
                        out.append(f"{nm} <- Exchange SinglePartition "
                                   f"<- {names[1:4]}")
    return out


# entry -> why a CartesianProduct node is legitimate there (a cross
# join BOTH of whose sides exceed the broadcast threshold — at scale
# this is quadratic unless both sides are bounded by construction).
ALLOWED_CARTESIAN: dict[str, str] = {
    # (currently none: every crossJoin in the engine pairs a broadcast
    # scalar/axis, which plans as BroadcastNestedLoopJoin, and the
    # empty-preserving axis mode sits behind the N18 cardinality guard)
}


def find_cartesian(plan) -> list[str]:
    return [ _simple(n) for n in _subtree(plan)
             if _simple(n) == "CartesianProductExec" ]


@pytest.mark.parametrize("name", list(WORKLOAD))
def test_no_unbounded_single_partition_window(name, spark):
    df = WORKLOAD[name].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan()
    cart = find_cartesian(plan)
    if name in ALLOWED_CARTESIAN:
        assert cart, (f"{name} allowlisted for CartesianProduct but "
                      f"no longer plans one — remove the stale row")
    else:
        assert not cart, (
            f"{name}: CartesianProductExec in the plan — a cross join "
            f"with NO broadcast side is quadratic at scale; broadcast "
            f"the small side or allowlist with the boundedness reason")
    hits = find_unbounded_single_partition(plan)
    if name in ALLOWED_SINGLE_PARTITION:
        # allowlisted entries MUST still exhibit the shape — a stale
        # allowlist row would mask a future regression elsewhere
        assert hits, (f"{name} is allowlisted for a single-partition "
                      f"window but its plan no longer has one — remove "
                      f"the stale allowlist row")
        return
    assert not hits, (
        f"{name}: Window/Sort over an UNBOUNDED single-partition "
        f"exchange — this is the plan shape that dies at 100 TB "
        f"(r10 RFM trap).  Either re-shape the plan (two-phase prefix "
        f"machinery, bucket carries, limit-k rank stamps) or, if the "
        f"input is bounded by construction, add an allowlist row with "
        f"the reason.  Hits: {hits}")
