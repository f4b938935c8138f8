"""Documents+embeddings workload entries: aggregator over the round-7
split (similarity_core / similarity_gates / similarity_textpairs /
similarity_misc — VERDICT r6 task 7).  Build order is the concatenation
of the four modules' verbatim sections, byte-stable with the pre-split
file."""
from __future__ import annotations

from . import (similarity_core, similarity_gates, similarity_misc,
               similarity_textpairs)


def register(add) -> None:
    similarity_core.register(add)
    similarity_gates.register(add)
    similarity_textpairs.register(add)
    similarity_misc.register(add)
    # round-8 additions append LAST so legacy build order stays
    # byte-stable (same discipline as docs_segments/multimodal_real)
    similarity_textpairs.register_r8(add)
