"""Member unique-name codec.

Reproduces the reference's unique-name structure so its parsing
heuristics are exercisable against our metadata
(format per scanner/DGIS_SCAN_2_stable.py:740-800 in the reference):

    [Dim].[Hier].[Level1].&[k1].&[k2]...

* depth  = number of ``.&[`` occurrences
  (scanner/DGIS_SCAN_2_stable.py:740-743)
* child unique name = parent unique name + ``.&[childkey]`` →
  prefix matching resolves children
  (scanner/DGIS_SCAN_2_stable.py:1044-1049)
* the last segment of the part before the first ``.&[`` is the
  level-1 name (scanner/DGIS_SCAN_2_stable.py:790-800)

Keys containing ``.&[`` or ``]`` would break the reference too;
documented out of scope (SURVEY.md §7.3#2).
"""
from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEPTH_RE = r"\.&\["


def encode(dimension: str, hierarchy: str, level1: str, keys: list) -> str:
    """Python-side encoder (driver / tests)."""
    base = f"[{dimension}].[{hierarchy}].[{level1}]"
    return base + "".join(f".&[{k}]" for k in keys)


@dataclass
class ParsedMember:
    dimension: str
    hierarchy: str
    level1: str | None
    keys: list[str]

    @property
    def depth(self) -> int:
        return len(self.keys)


def parse(unique_name: str) -> ParsedMember:
    """Parse ``[Dim].[Hier].[Level1].&[k1].&[k2]`` (level segment optional)."""
    parts = unique_name.split(".&[")
    head, keys = parts[0], [p.rstrip("]") for p in parts[1:]]
    segs = re.findall(r"\[([^\]]*)\]", head)
    if len(segs) >= 3:
        return ParsedMember(segs[0], segs[1], segs[2], keys)
    if len(segs) == 2:
        return ParsedMember(segs[0], segs[1], None, keys)
    raise ValueError(f"unparseable member unique name: {unique_name!r}")


def depth(unique_name: str) -> int:
    return unique_name.count(".&[")


# ---- Column (executor-side, JVM) versions -------------------------------

def depth_col(col: Column) -> Column:
    """Member depth as a Column: count of '.&[' occurrences."""
    return F.regexp_count(col, F.lit(_DEPTH_RE))


def encode_col(dimension: str, hierarchy: str, level1: str, key_cols: list[Column]) -> Column:
    """Build the unique name from key columns, all JVM-side."""
    pieces: list[Column] = [F.lit(f"[{dimension}].[{hierarchy}].[{level1}]")]
    for k in key_cols:
        pieces.extend([F.lit(".&["), k.cast("string"), F.lit("]")])
    return F.concat(*pieces)


def parent_col(unique_name: Column) -> Column:
    """Parent unique name = drop the last '.&[key]' segment (NULL at depth<=1
    keeps 'All' as implicit parent semantics out of the data, matching the
    reference's nullable PARENT_UNIQUE_NAME)."""
    return F.when(
        depth_col(unique_name) >= 2,
        F.regexp_replace(unique_name, r"\.&\[[^\]]*\]$", ""),
    )
