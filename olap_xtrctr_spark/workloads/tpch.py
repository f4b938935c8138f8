"""TPC-H workload entries: aggregator over the round-7 split
(tpch_a / tpch_b — VERDICT r6 task 7).  Build order is the
concatenation of the two modules' verbatim sections, byte-stable with
the pre-split file."""
from __future__ import annotations

from . import tpch_a, tpch_b


def register(add) -> None:
    tpch_a.register(add)
    tpch_b.register(add)
