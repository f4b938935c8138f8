"""Events workload entries: aggregator over the round-7 split
(events_batch / events_joins / events_wave4 — VERDICT r6 task 7).
Build order is the concatenation of the three modules' verbatim
sections, byte-stable with the pre-split file."""
from __future__ import annotations

from . import events_batch, events_joins, events_wave4


def register(add) -> None:
    events_batch.register(add)
    events_joins.register(add)
    events_wave4.register(add)
    events_wave4.register_r8(add)     # round-8 additions append last
