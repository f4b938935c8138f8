"""Input validation / parsing helpers ported from the reference's
driver-side logic (pure Python — these never touch executors).

* range-list selection parse (N13, backend/utils.py:10-68,
  scanner/validators.py:10-44)
* search-term sanitization (N14, scanner/validators.py:47-71)
* filename sanitization (scanner/DGIS_SCAN_2_stable.py:1450-1452)
"""
from __future__ import annotations

import re

# dangerous-pattern list mirrors scanner/validators.py:61 of the reference
_FORBIDDEN = (";", "--", "/*", "*/")
_SQL_KEYWORDS = re.compile(
    r"\b(exec|drop|delete|update|insert)\b", re.IGNORECASE)
_ALLOWED_CHARS = re.compile(r"[^\w\s\-_áéíóúñÁÉÍÓÚÑ#]")


def parse_range_list(text: str, max_value: int | None = None) -> list[int]:
    """'1,3,5-10,15' → sorted unique ints; bounds-checked when max_value
    given.  Invalid tokens raise ValueError (reference behavior: reject)."""
    out: set[int] = set()
    for tok in text.split(","):
        tok = tok.strip()
        if not tok:
            continue
        m = re.fullmatch(r"(\d+)\s*-\s*(\d+)", tok)
        if m:
            lo, hi = int(m.group(1)), int(m.group(2))
            if lo > hi:
                raise ValueError(f"descending range {tok!r}")
            out.update(range(lo, hi + 1))
        elif tok.isdigit():
            out.add(int(tok))
        else:
            raise ValueError(f"invalid selection token {tok!r}")
    if max_value is not None:
        bad = [v for v in out if v < 1 or v > max_value]
        if bad:
            raise ValueError(f"selection out of bounds 1..{max_value}: {bad}")
    return sorted(out)


def sanitize_search(term: str, max_len: int = 100) -> str:
    """Strip dangerous substrings/characters from a free-text search term
    before it can reach a string-assembled query (only the MDX/DMV string
    entry points need this; DataFrame ops are parameterized)."""
    t = term.strip()[:max_len]
    for bad in _FORBIDDEN:
        t = t.replace(bad, "")
    t = _SQL_KEYWORDS.sub("", t)
    return _ALLOWED_CHARS.sub("", t).strip()


def retry_on_failure(max_retries: int = 2, base_delay: float = 2.0):
    """X4 (reference retry_on_failure, scanner/DGIS_SCAN_2_stable.py:152-167):
    retry a flaky call with exponential backoff — kept for external sinks;
    Spark task retries cover executor-side failures."""
    import functools
    import time

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            last: Exception | None = None
            for attempt in range(max_retries + 1):
                try:
                    return fn(*args, **kwargs)
                except Exception as exc:  # noqa: BLE001 — mirror reference
                    last = exc
                    if attempt < max_retries:
                        time.sleep(base_delay * (2 ** attempt))
            raise last

        return wrapper

    return deco


def sanitize_filename(name: str) -> str:
    return re.sub(r"[^\w\-_.]", "_", name)[:128]
