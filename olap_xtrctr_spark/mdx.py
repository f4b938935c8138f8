"""MDX front-end: parses the reference's emitted MDX subset into a
structured QueryRequest (Q16), and the DMV SQL dialect into DataFrame
ops (M3-M5).

Grammar covered (exactly what the reference builds —
scanner/DGIS_SCAN_2_stable.py:1366-1420, backend/olap_service.py:346-453,
backend/actions_runner.py:220-249, frontend/src/utils/mdxBuilder.ts:4-40):

    SELECT { <measures|members> } ON COLUMNS,
           [NON EMPTY] <set> [DIMENSION PROPERTIES <prop>[, <prop>...]] ON ROWS
    FROM [cube]
    [WHERE ( <member> [, <member>...] )]

    Axis ordinals: ON 0 / ON 1 / ON AXIS(0) / ON AXIS(1) are accepted
    as spellings of ON COLUMNS / ON ROWS (the Excel/ADOMD form);
    ordinals >= 2 (PAGES...) stay unsupported.

    <prop> := MEMBER_CAPTION                  (all-ancestors mode)
            | [Dim].[Hier].[Level]            (named superior level)
            | [Hier].[Level]

    <set> := CROSSJOIN(<set>, <set>)
           | DESCENDANTS(<member> | { <member>, ... }, <level path>)
           | DESCENDANTS(<member>, <distance n>)
           | <member>.CHILDREN                  (== DESCENDANTS(m, 1))
           | <member>.PARENT | <member>.SIBLINGS  (path navigation;
             SIBLINGS includes the member; root SIBLINGS = level 1)
           | ANCESTOR(<member>, <level path>)
           | { <member unique name>, ... }
           | UNION(<member set>, <member set>)      (dedup, 1st order)
           | EXCEPT(<member set>, <member set>)
           | INTERSECT(<member set>, <member set>)
           | [Dim].[Hier].[Level].MEMBERS
           | [Dim].[Hier].Levels(n).MEMBERS
           | [Dim].[Hier].MEMBERS

    Rows-set wrappers (composable, outermost-first unwrap):
      FILTER(set, <measure cond>) / ORDER(set, m, ASC|DESC)
      / TOPCOUNT|BOTTOMCOUNT(set, n, m) / HEAD|TAIL(set, n)
      / TOPPERCENT|BOTTOMPERCENT(set, p, m)   (integer p, 1..100)
      / TOPSUM|BOTTOMSUM(set, t, m)           (integer t >= 1)
      / HIERARCHIZE(set)    (transparent: engine output order IS the
        hierarchized order; POST unsupported)
      / ADDCALCULATEDMEMBERS|STRIPCALCULATEDMEMBERS(set)
        (transparent: calculated members exist only on [Measures])
      / NONEMPTY(set[, m])  (bare = the NON EMPTY keyword; with a
        measure, drops axis rows where THAT measure — base or
        calculated — is empty, applied post-aggregation)

    WHERE ( <member> | { <member>, ... }, ... )
      — slicer tuple; a brace-wrapped element is a SET slicer whose
      members OR within their hierarchy (AND across hierarchies)

    DRILLTHROUGH [MAXROWS n] SELECT ... [RETURN <col>, ...]
      — the underlying fact rows behind the selected cells (natural
      fact columns; MAXROWS bounds deterministically; RETURN projects
      a subset — [l_shipdate] fact columns or [Measures].[X] source
      columns, the SSAS RETURN contract)

    FROM (SELECT <set>[, <set>...] ON COLUMNS FROM [cube])
      — subselect space restriction (the Excel-client form): each
      member-literal set restricts its hierarchy across the whole
      outer query — axes AND totals (VisualTotals), unlike a WHERE
      slicer it also restricts a hierarchy that is on rows

    WITH SET [Name] AS '{ <member>, ... }'
      — named set, expanded into its [Name] references before set
      parsing (SSAS query-scoped named sets; build_mdx emits the
      expanded form)
    WITH MEMBER [Measures].[name] AS <arith over [Measures].[X] refs>
      — extension; the arithmetic subset also accepts the SSAS
      period-over-period tuple
      ([Measures].[X], [Dim].[Hier][.CurrentMember].PrevMember)
      (NextMember for the lead form;
      PARALLELPERIOD([Dim].[Hier], n) for lag distance n — n=12 at
      month grain is same-month-last-year)
      (query.LagRef: one lag() window over the axis rows, ordered by
      the named hierarchy's level ordinals, partitioned by the other
      row hierarchies) and the year-to-date running total
      SUM(YTD([Dim].[Hier][.CurrentMember]), <expr>)
      (query.YtdRef: ancestor levels partition, leaf ordinal orders,
      DECIMAL(18,4) accumulation) and the trailing window
      SUM(LASTPERIODS(n, [Dim].[Hier][.CurrentMember]), <expr>)
      (query.LastPeriodsRef: crosses parent boundaries, n-row frame)
      and set aggregation
      SUM({ <member>, ... }, [Measures].[X]) — additive bases only —
      / AGGREGATE({ <member>, ... }, [Measures].[X]) — the base's own
      aggregator (query.SetAggRef: ONE conditional aggregate in the
      fact scan; WITH SET names expand inside calc expressions)
      and set statistics
      MEDIAN/MIN/MAX({ <member>, ... }, [Measures].[X])
      (query.SetStatRef: order statistics over PER-MEMBER values —
      one conditional aggregate per member in the same scan, the
      statistic as a post-agg array expression; members may sit at
      different depths, each cell evaluates independently)
      and axis ranking
      RANK([Dim].[Hier].CurrentMember, <expr>)
      (query.RankRef: one rank() window over the axis rows — the axis
      is the implicit set; ties share a rank with gaps)

    ... CELL PROPERTIES VALUE[, FORMATTED_VALUE ...] — accepted and
      validated for SSAS-client wire compatibility (Excel/SSMS append
      it to every SELECT); the engine returns VALUE regardless

DMV dialect:

    SELECT [c1],[c2] | * FROM $system.<ROWSET>
    [WHERE [c]='v' [AND [c2] > n ...]] [ORDER BY [c] [ASC|DESC]]

Unsupported constructs raise MdxParseError (engine contract: parse the
subset, error on the rest).
"""
from __future__ import annotations

import re
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query import (AxisItem, CalcMeasure, FilterSpec, HeadTailSpec,
                    QueryRequest, TopCountSpec, TopPercentSpec)


class MdxParseError(ValueError):
    pass


_SEG = re.compile(r"\[([^\]]*)\]")


def _segs(expr: str) -> list[str]:
    """Bracketed segments of a name path (up to the first key segment)."""
    head = expr.split(".&[")[0]
    return _SEG.findall(head)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on commas not inside (), {}, []."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


def _paren_inner(expr: str, what: str) -> str:
    """Text between the first '(' and the LAST ')' — raising
    MdxParseError (never ValueError/IndexError) when either bracket is
    missing or reversed, so malformed requests fail the parse contract
    cleanly (the adversarial fuzz found unbalanced ``CROSSJOIN(`` /
    ``NONEMPTY(`` forms crashing with stack traces)."""
    o = expr.find("(")
    c = expr.rfind(")")
    if o < 0 or c < o:
        raise MdxParseError(f"{what}: unbalanced parentheses in {expr!r}")
    return expr[o + 1:c]


def _parse_set(expr: str, properties: bool) -> list[AxisItem]:
    expr = expr.strip()
    up = expr.upper()

    if up.startswith("CROSSJOIN"):
        inner = _paren_inner(expr, "CROSSJOIN")
        parts = _split_top(inner)
        if len(parts) != 2:
            raise MdxParseError(f"CROSSJOIN needs 2 args: {expr!r}")
        return (_parse_set(parts[0], properties)
                + _parse_set(parts[1], properties))

    # UNION / EXCEPT / INTERSECT over member-literal sets of ONE
    # hierarchy (round 9): pure parse-time set algebra — the result is
    # a member-literal AxisItem, so build_mdx emits the RESOLVED set
    # and parse -> build -> parse is a fixpoint.  SSAS order contract:
    # first operand's order wins; UNION dedups (the ALL variant is not
    # in the subset); an empty result is rejected at parse time (the
    # engine's member constraints cannot express "no members" — an
    # empty constraint list means UNCONSTRAINED, the opposite).
    setop = next((f for f in ("UNION", "EXCEPT", "INTERSECT")
                  if up.startswith(f + "(") or up.startswith(f + " (")),
                 None)
    if setop is not None:
        inner = _paren_inner(expr, setop)
        parts = _split_top(inner)
        if len(parts) != 2:
            raise MdxParseError(f"{setop} needs 2 set args: {expr!r}")
        sides = []
        for part in parts:
            items = _parse_set(part, properties)
            if (len(items) != 1 or not items[0].members
                    or items[0].level or items[0].depth
                    or items[0].ancestor):
                raise MdxParseError(
                    f"{setop} operands must be member-literal sets "
                    f"of one hierarchy: {part!r}")
            sides.append(items[0])
        a, b = sides
        if (a.dimension.lower(), a.hierarchy.lower()) !=                 (b.dimension.lower(), b.hierarchy.lower()):
            raise MdxParseError(
                f"{setop} operands must share [Dim].[Hier]: {expr!r}")
        # Membership/dedup compares PARSED identity, not raw strings:
        # the [Dim].[Hier].[Level] segments are case-insensitive (like
        # the operand check above) while &[key] values stay exact
        # (data values).  Raw-string sets would let UNION emit the
        # same member twice when the operands spell the hierarchy in
        # different case.
        def _mkey(m: str) -> tuple:
            from . import naming as _naming
            try:
                p = _naming.parse(m)
            except ValueError:
                return ("?", m.strip().casefold())
            return (p.dimension.casefold(), p.hierarchy.casefold(),
                    p.level1.casefold() if p.level1 else None,
                    tuple(p.keys))

        aset = {_mkey(m) for m in a.members}
        bset = {_mkey(m) for m in b.members}
        if setop == "UNION":
            out = list(a.members)
            seen = set(aset)
            for m in b.members:
                k = _mkey(m)
                if k not in seen:
                    seen.add(k)
                    out.append(m)
        elif setop == "EXCEPT":
            out = [m for m in a.members if _mkey(m) not in bset]
        else:
            out = [m for m in a.members if _mkey(m) in bset]
        if not out:
            raise MdxParseError(
                f"{setop} produced an empty set: {expr!r}")
        return [AxisItem(a.dimension, a.hierarchy, members=out,
                         properties=properties)]

    # DESCENDANTS(member | {set}, [Dim].[Hier].[Level]) /
    # ANCESTOR(member, [Dim].[Hier].[Level]) — member-tree navigation
    # (the parent/child chains the reference scanner walks in pandas,
    # scanner/DGIS_SCAN_2_stable.py:1041-1049), expressed in-query.
    # <member>.CHILDREN — sugar for DESCENDANTS(<member>, distance 1);
    # the target depth is computable from the unique name alone.
    if up.endswith(".CHILDREN"):
        marg = expr[: -len(".CHILDREN")]
        from . import naming as _naming
        try:
            parsed = _naming.parse(marg)
        except ValueError as e:
            raise MdxParseError(str(e)) from e
        segs = _segs(marg)
        if len(segs) < 2:
            raise MdxParseError(f"CHILDREN needs [Dim].[Hier]: {expr!r}")
        return [AxisItem(segs[0], segs[1], depth=parsed.depth + 1,
                         members=[marg], properties=properties)]

    # <member>.PARENT / <member>.SIBLINGS — static path navigation
    # (SSAS member functions): PARENT truncates the last key segment;
    # SIBLINGS is the parent's children INCLUDING the member itself
    # (root-level members' siblings = the whole first level, since the
    # All member is suppressed in this model).  Both lower to the same
    # member-literal / distance forms CHILDREN uses, so build_mdx
    # round-trips them as plain members / DESCENDANTS.
    for sfn in ("PARENT", "SIBLINGS"):
        if up.endswith("." + sfn):
            marg = expr[: -len("." + sfn)].strip()
            from . import naming as _naming
            try:
                parsed = _naming.parse(marg)
            except ValueError as e:
                raise MdxParseError(str(e)) from e
            segs = _segs(marg)
            if len(segs) < 2:
                raise MdxParseError(
                    f"{sfn} needs [Dim].[Hier]: {expr!r}")
            if parsed.depth == 0:
                raise MdxParseError(
                    f"{sfn} of a level path (no member keys): {expr!r}")
            cut = marg.rindex(".&[")
            parent = marg[:cut]
            if sfn == "PARENT":
                if parsed.depth < 2:
                    raise MdxParseError(
                        f"PARENT of a root-level member (the All "
                        f"member is suppressed in this subset): "
                        f"{expr!r}")
                return [AxisItem(segs[0], segs[1], members=[parent],
                                 properties=properties)]
            if parsed.depth < 2:      # SIBLINGS at the root level
                return [AxisItem(segs[0], segs[1], depth=1,
                                 properties=properties)]
            return [AxisItem(segs[0], segs[1], depth=parsed.depth,
                             members=[parent], properties=properties)]

    fn = next((f for f in ("DESCENDANTS", "ANCESTOR")
               if up.startswith(f + "(") or up.startswith(f + " (")), None)
    if fn is not None:
        inner = _paren_inner(expr, fn)
        parts = _split_top(inner)
        if len(parts) != 2:
            raise MdxParseError(f"{fn} needs 2 args: {expr!r}")
        marg, larg = parts
        # numeric second arg: DESCENDANTS(member, n) — members at
        # DISTANCE n below the member (SSAS distance form; n=1 is what
        # build_mdx emits for .CHILDREN items)
        if fn == "DESCENDANTS" and larg.strip().isdigit():
            from . import naming as _naming
            try:
                parsed = _naming.parse(marg.strip())
            except ValueError as e:
                raise MdxParseError(str(e)) from e
            segs = _segs(marg)
            if len(segs) < 2:
                raise MdxParseError(
                    f"DESCENDANTS member needs [Dim].[Hier]: {expr!r}")
            return [AxisItem(segs[0], segs[1],
                             depth=parsed.depth + int(larg.strip()),
                             members=[marg.strip()],
                             properties=properties)]
        if marg.startswith("{"):
            if fn == "ANCESTOR":
                raise MdxParseError(
                    f"ANCESTOR takes a single member, not a set: {expr!r}")
            members = _split_top(marg.strip("{} \n\t"))
            if not members:
                raise MdxParseError(f"empty member set in {fn}: {expr!r}")
        else:
            members = [marg]
        seg_lists = [_segs(m) for m in members]
        if any(len(s) < 2 for s in seg_lists):
            raise MdxParseError(f"{fn} member needs [Dim].[Hier]: {expr!r}")
        dims = {(s[0].lower(), s[1].lower()) for s in seg_lists}
        if len(dims) != 1:
            raise MdxParseError(
                f"{fn} member set spans multiple hierarchies: {expr!r}")
        dim, hier = seg_lists[0][0], seg_lists[0][1]
        lsegs = _segs(larg)
        if not lsegs or ".&[" in larg:
            raise MdxParseError(
                f"{fn} level must be a level path, got {larg!r}")
        if len(lsegs) >= 3 and (lsegs[0].lower() != dim.lower()
                                or lsegs[1].lower() != hier.lower()):
            raise MdxParseError(
                f"{fn} level {larg!r} names a different hierarchy than "
                f"its member argument")
        if len(lsegs) == 2 and lsegs[0].lower() not in (dim.lower(),
                                                        hier.lower()):
            raise MdxParseError(
                f"{fn} level {larg!r} names a different hierarchy than "
                f"its member argument")
        return [AxisItem(dim, hier, level=lsegs[-1], members=members,
                         properties=properties, ancestor=fn == "ANCESTOR")]

    if expr.startswith("{"):
        members = _split_top(expr.strip("{} \n\t"))
        if not members:
            raise MdxParseError(f"empty member set: {expr!r}")
        seg_lists = [_segs(m) for m in members]
        # same guard as the function-branch above: a malformed member
        # (e.g. a bare '.&[k' fragment) can segment to FEWER than two
        # parts, and s[:2] would silently shorten the dims tuple — the
        # fuzz test caught the unguarded [0][1] as an IndexError
        if any(len(s) < 2 for s in seg_lists):
            raise MdxParseError(
                f"member needs [Dim].[Hier]: {expr!r}")
        dims = {tuple(s[:2]) for s in seg_lists}
        if len(dims) != 1:
            raise MdxParseError(
                f"member set spans multiple hierarchies: {expr!r}")
        dim, hier = seg_lists[0][0], seg_lists[0][1]
        return [AxisItem(dim, hier, members=members, properties=properties)]

    m = re.match(r"(.*)\.Levels\s*\(\s*(\d+)\s*\)\s*\.MEMBERS$", expr,
                 re.IGNORECASE)
    if m:
        segs = _segs(m.group(1))
        if len(segs) < 2:
            raise MdxParseError(f"Levels() needs [Dim].[Hier]: {expr!r}")
        return [AxisItem(segs[0], segs[1], depth=int(m.group(2)),
                         properties=properties)]

    if up.endswith(".MEMBERS"):
        segs = _segs(expr[: -len(".MEMBERS")])
        if len(segs) == 3:
            return [AxisItem(segs[0], segs[1], level=segs[2],
                             properties=properties)]
        if len(segs) == 2:   # whole-hierarchy set (single-level, Q6)
            return [AxisItem(segs[0], segs[1], properties=properties)]
        raise MdxParseError(f"unsupported member set path: {expr!r}")

    raise MdxParseError(f"unsupported set expression: {expr!r}")


_CALC_DEF = re.compile(
    r"MEMBER\s+\[Measures\]\s*\.\s*\[([^\]]+)\]\s+AS\s+'?(.*?)'?\s*"
    r"(?=MEMBER\s+\[Measures\]|$)",
    re.IGNORECASE | re.DOTALL)

# WITH SET [Name] AS '{...}' — a named set is pure syntax sugar: its
# text replaces every [Name] reference in the SELECT before set parsing
# (SSAS scopes named sets to the query; no engine state needed).
# build_mdx emits the EXPANDED set, so parse -> build -> parse is a
# fixpoint even though the name itself is not round-tripped.
# the SSAS cell-property names clients actually send; parse_mdx
# validates against this set and the engine returns VALUE regardless
_CELL_PROPERTIES = frozenset({
    "VALUE", "FORMATTED_VALUE", "FORMAT_STRING", "CELL_ORDINAL",
    "FORE_COLOR", "BACK_COLOR", "FONT_FLAGS", "LANGUAGE"})

# rows-set wrapper functions, unwrapped outermost-first in parse_mdx;
# module-level so MDSCHEMA_FUNCTIONS enumerates the SAME list the
# parser dispatches on (sync by construction)
_SET_WRAPPERS = ("BOTTOMCOUNT", "TOPCOUNT", "BOTTOMPERCENT",
                 "TOPPERCENT", "BOTTOMSUM", "TOPSUM", "ORDER",
                 "FILTER", "HEAD", "TAIL", "HIERARCHIZE", "NONEMPTY",
                 "ADDCALCULATEDMEMBERS", "STRIPCALCULATEDMEMBERS")

_SET_DEF = re.compile(
    r"SET\s+\[([^\]]+)\]\s+AS\s+'?(\{[^{}]*\})'?\s*",
    re.IGNORECASE | re.DOTALL)


def _axis_ordinals_to_names(flat: str) -> str:
    """``ON 0`` / ``ON 1`` / ``ON AXIS(0)`` / ``ON AXIS(1)`` → ``ON
    COLUMNS`` / ``ON ROWS`` (the ordinal spelling Excel/ADOMD clients
    emit).  Rewrites only OUTSIDE bracketed names, so a caption like
    ``[Level ON 0]`` is never touched; ordinals >= 2 (PAGES and
    beyond) stay as-is and fail the SELECT shape with a clear error."""
    parts = re.split(r"(\[[^\]]*\])", flat)
    for i in range(0, len(parts), 2):       # even indices: outside []
        parts[i] = re.sub(
            r"\bON\s+(?:AXIS\s*\(\s*0\s*\)|0\b)", "ON COLUMNS",
            parts[i], flags=re.IGNORECASE)
        parts[i] = re.sub(
            r"\bON\s+(?:AXIS\s*\(\s*1\s*\)|1\b)", "ON ROWS",
            parts[i], flags=re.IGNORECASE)
    return "".join(parts)


def parse_mdx(mdx: str, catalog: str) -> QueryRequest:
    flat = _axis_ordinals_to_names(" ".join(mdx.split()))

    # -- CELL PROPERTIES VALUE[, ...] (SSAS clients append this to
    # every SELECT; validated names, engine returns VALUE regardless) --
    cell_props: list[str] = []
    cp = re.search(
        r"\s+CELL\s+PROPERTIES\s+(?P<props>[A-Za-z_]+"
        r"(?:\s*,\s*[A-Za-z_]+)*)\s*$", flat, re.IGNORECASE)
    if cp:
        cell_props = [p.strip().upper()
                      for p in cp.group("props").split(",")]
        unknown = [p for p in cell_props if p not in _CELL_PROPERTIES]
        if unknown:
            raise MdxParseError(
                f"unknown CELL PROPERTIES {unknown} (supported: "
                f"{sorted(_CELL_PROPERTIES)})")
        flat = flat[:cp.start()].strip()

    # DRILLTHROUGH [MAXROWS n] SELECT ... [RETURN c1, c2] — strip the
    # prefix (and the trailing RETURN column list), parse the inner
    # SELECT normally, mark the request (engine returns the underlying
    # fact rows instead of aggregates)
    dt = re.match(r"DRILLTHROUGH\s+(?:MAXROWS\s+(\d+)\s+)?(?=SELECT\s)",
                  flat, re.IGNORECASE)
    if dt:
        body = flat[dt.end():]
        # the RETURN list must run to end-of-statement with a strict
        # column-list shape, so bracketed captions containing the word
        # RETURN mid-query can never match
        ret_cols = None
        rm = re.search(
            r"\s+RETURN\s+((?:\[[^\]]+\](?:\s*\.\s*\[[^\]]+\])?)"
            r"(?:\s*,\s*\[[^\]]+\](?:\s*\.\s*\[[^\]]+\])?)*)\s*$",
            body, re.IGNORECASE)
        if rm:
            ret_cols = [c.strip() for c in re.split(r",(?![^\[]*\])",
                                                    rm.group(1))]
            body = body[:rm.start()]
        if cell_props:
            raise MdxParseError(
                "DRILLTHROUGH does not take CELL PROPERTIES (SSAS "
                "grammar: the clause belongs to SELECT)")
        req = parse_mdx(body, catalog)
        req.drillthrough = True
        req.max_rows = int(dt.group(1)) if dt.group(1) else None
        req.return_cols = ret_cols
        if req.max_rows is not None and req.max_rows < 1:
            raise MdxParseError(f"MAXROWS must be >= 1: {mdx!r}")
        return req

    # -- WITH MEMBER calculated measures (extension beyond the
    # reference's emitted subset; arithmetic validated by the engine's
    # measure-expression parser, never eval) --------------------------
    calcs: list[CalcMeasure] = []
    mw = re.match(
        r"WITH\s+(?P<defs>(?:MEMBER|SET)\s+.*?)\s*(?=SELECT\s)(?P<rest>.*)$",
        flat, re.IGNORECASE)
    if mw:
        defs = mw.group("defs")
        set_defs = _SET_DEF.findall(defs)
        defs = _SET_DEF.sub("", defs)
        for name, expr in _CALC_DEF.findall(defs):
            calcs.append(CalcMeasure(name.strip(), expr.strip()))
        if not calcs and not set_defs:
            raise MdxParseError(
                f"WITH clause without MEMBER/SET defs: {mdx!r}")
        flat = mw.group("rest").strip()
        # Replace only STANDALONE [Name] references, and only in the
        # axis text (before FROM): a set name that collides with a
        # level/hierarchy segment ([D Tiempo].[Calendario].[Mes]) or
        # the cube name must not be rewritten — path segments are
        # always adjacent to a '.', standalone set refs never are.
        mfrom = re.search(r"\sFROM\s", flat, re.IGNORECASE)
        cut = mfrom.start() if mfrom else len(flat)
        axes_part, rest_part = flat[:cut], flat[cut:]
        for sname, sexpr in set_defs:
            pat = re.compile(r"(?<!\.)\[" + re.escape(sname)
                             + r"\](?!\s*\.)")
            axes_part = pat.sub(lambda _m: sexpr.strip(), axes_part)
            # calc-member expressions expand too: SUM([MySet],
            # [Measures].[X]) becomes the set-literal form the
            # measure-expression grammar accepts (query.SetAggRef);
            # build_mdx emits the expanded expr, so the fixpoint holds
            for c in calcs:
                c.expr = pat.sub(lambda _m: sexpr.strip(), c.expr)
        flat = axes_part + rest_part

    # -- FROM (SELECT <sets> ON COLUMNS FROM [cube]) subselect -------------
    # The SSAS space restriction Excel-style clients emit: each inner
    # member-literal set restricts its hierarchy across the WHOLE outer
    # query (axes, totals, slicers — VisualTotals semantics).  The
    # inner text is cut out and replaced by the plain FROM before the
    # outer shape match; the sets ride QueryRequest.subselects.
    subselects: list[FilterSpec] = []
    sfrom = re.search(r"\bFROM\s*\(", flat, re.IGNORECASE)
    if sfrom:
        i = sfrom.end() - 1
        depth = 0
        for j in range(i, len(flat)):
            if flat[j] == "(":
                depth += 1
            elif flat[j] == ")":
                depth -= 1
                if depth == 0:
                    break
        else:
            raise MdxParseError(f"unbalanced subselect parens: {mdx!r}")
        inner = flat[i + 1:j].strip()
        sm = re.match(
            r"SELECT\s+(?P<sets>.*?)\s+ON\s+COLUMNS\s+FROM\s+"
            r"(?P<cube>\[[^\]]*\]|\w+)\s*$", inner, re.IGNORECASE)
        if not sm:
            raise MdxParseError(
                f"unsupported subselect (need SELECT <sets> ON COLUMNS "
                f"FROM [cube], one level deep): {inner!r}")
        sets_txt = sm.group("sets").strip()
        if sets_txt.startswith("(") and sets_txt.endswith(")"):
            sets_txt = sets_txt[1:-1]
        for part in _split_top(sets_txt):
            items = _parse_set(part, False)
            if (len(items) != 1 or not items[0].members
                    or items[0].level or items[0].depth
                    or items[0].ancestor):
                raise MdxParseError(
                    f"subselect sets must be member-literal sets of "
                    f"one hierarchy: {part!r}")
            it = items[0]
            subselects.append(
                FilterSpec(it.dimension, it.hierarchy,
                           list(it.members)))
        flat = " ".join((flat[:sfrom.start()]
                         + f" FROM {sm.group('cube')} "
                         + flat[j + 1:]).split())

    m = re.match(
        r"SELECT\s+(?P<cols>.*?)\s+ON\s+COLUMNS\s*,\s*(?P<rows>.*?)\s+ON\s+ROWS"
        r"\s+FROM\s+(?P<cube>\[[^\]]*\]|\w+)"
        r"(?:\s+WHERE\s*\((?P<where>.*)\)\s*)?$",
        flat, re.IGNORECASE)
    if not m:
        # measures-only form: SELECT {...} ON COLUMNS FROM [cube]
        m2 = re.match(
            r"SELECT\s+(?P<cols>.*?)\s+ON\s+COLUMNS\s+FROM\s+"
            r"(?P<cube>\[[^\]]*\]|\w+)"
            r"(?:\s+WHERE\s*\((?P<where>.*)\)\s*)?$",
            flat, re.IGNORECASE)
        if not m2:
            raise MdxParseError(f"unsupported MDX shape: {mdx!r}")
        m = m2
        rows_raw = None
    else:
        rows_raw = m.group("rows")

    req = QueryRequest(catalog=catalog, cube=m.group("cube").strip("[]"),
                       calculated=calcs, subselects=subselects,
                       cell_properties=cell_props)

    # -- columns: measures / AllMembers / variables ------------------------
    cols = m.group("cols").strip()
    if re.fullmatch(r"\[Measures\]\s*\.\s*AllMembers", cols, re.IGNORECASE):
        req.all_measures = True
    else:
        items = _split_top(cols.strip("{} "))
        for it in items:
            segs = _segs(it)
            if segs and segs[0].lower() == "measures":
                if len(segs) < 2:
                    # e.g. "[Measures].&[..." — a corrupted member key
                    # whose bracket path yields no measure name (fuzz
                    # find, VERDICT r12 task 7)
                    raise MdxParseError(
                        f"measure reference has no name: {it!r}")
                req.measures.append(segs[1])
            else:
                req.variables.append(it)

    # -- rows --------------------------------------------------------------
    if rows_raw is not None:
        r = rows_raw.strip()
        mne = re.match(r"NON\s+EMPTY\s+(.*)$", r, re.IGNORECASE | re.DOTALL)
        req.non_empty = mne is not None
        if mne:
            r = mne.group(1)
        props = False
        prop_paths: list[list[str]] = []
        mdp = re.match(r"(.*?)\s+DIMENSION\s+PROPERTIES\s+(?P<plist>.*)$", r,
                       re.IGNORECASE | re.DOTALL)
        if mdp:
            r = mdp.group(1)
            # The reference emits either intrinsic property names
            # (MEMBER_CAPTION — all-ancestors mode) or named superior
            # levels as [Dim].[Hier].[Level] / [Hier].[Level]
            # (scanner/DGIS_SCAN_2_stable.py:1282-1298,1399-1408).
            for p in _split_top(mdp.group("plist")):
                segs = _segs(p)
                if segs:
                    prop_paths.append(segs)
                else:
                    props = True
        # -- set functions wrapping the rows set (extensions):
        # TOPCOUNT(set, n, [Measures].[X]) / ORDER(set, [Measures].[X],
        # DESC|ASC) / FILTER(set, <measure condition>) — unwrap
        # outermost-first; arbitrary nesting composes.
        def _measure_name(s: str) -> str:
            segs = _segs(s)
            if len(segs) != 2 or segs[0].lower() != "measures":
                raise MdxParseError(f"expected [Measures].[X], got {s!r}")
            return segs[1]

        # Wrapper-order guard (ADVICE r10): the engine's fixed pipeline
        # applies FILTER/NONEMPTY BEFORE the limit operators, which
        # matches SSAS only when the filter is the INNER call —
        # TOPCOUNT(FILTER(set, c), n, m).  The reverse nesting
        # NONEMPTY(TOPCOUNT(set, n, m), m2) evaluates the limit first
        # in SSAS (and may return fewer than n rows), so it is
        # rejected rather than silently reordered.
        _FILTER_FNS = ("NONEMPTY", "FILTER")
        _LIMIT_FNS = ("TOPCOUNT", "BOTTOMCOUNT", "HEAD", "TAIL",
                      "TOPPERCENT", "BOTTOMPERCENT", "TOPSUM",
                      "BOTTOMSUM")
        outer_filter = None
        while True:
            rs = r.strip()
            up = rs.upper()
            fn = next((f for f in _SET_WRAPPERS
                       if up.startswith(f + "(")
                       or up.startswith(f + " (")), None)
            if fn is None:
                break
            if fn in _FILTER_FNS:
                outer_filter = fn
            elif fn in _LIMIT_FNS and outer_filter is not None:
                raise MdxParseError(
                    f"{outer_filter} wrapping {fn} is unsupported: "
                    f"SSAS evaluates the inner {fn} first and THEN "
                    f"filters (possibly returning fewer rows); write "
                    f"{fn}({outer_filter}(set, ...), ...) to filter "
                    f"the set before the limit instead")
            inner = _paren_inner(rs, fn)
            parts = _split_top(inner)
            if fn in ("HEAD", "TAIL"):
                if len(parts) != 2:
                    raise MdxParseError(f"{fn} needs 2 args: {rs!r}")
                if req.head_tail is not None:
                    raise MdxParseError(f"nested {fn} is unsupported")
                if not parts[1].strip().isdigit():
                    raise MdxParseError(
                        f"{fn} count must be an integer: {parts[1]!r}")
                req.head_tail = HeadTailSpec(int(parts[1]),
                                             tail=fn == "TAIL")
            elif fn in ("TOPPERCENT", "BOTTOMPERCENT",
                        "TOPSUM", "BOTTOMSUM"):
                if len(parts) != 3:
                    raise MdxParseError(f"{fn} needs 3 args: {rs!r}")
                if req.toppercent is not None:
                    raise MdxParseError(f"nested {fn} is unsupported")
                if not parts[1].strip().isdigit():
                    raise MdxParseError(
                        f"{fn} threshold must be a positive integer "
                        f"(exact-DECIMAL contract): {parts[1]!r}")
                thr = int(parts[1])
                is_pct = fn.endswith("PERCENT")
                if thr < 1 or (is_pct and thr > 100):
                    raise MdxParseError(
                        f"{fn} threshold out of range: {thr}")
                req.toppercent = TopPercentSpec(
                    thr, _measure_name(parts[2]),
                    bottom=fn.startswith("BOTTOM"),
                    absolute=not is_pct)
            elif fn in ("TOPCOUNT", "BOTTOMCOUNT"):
                if len(parts) != 3:
                    raise MdxParseError(f"{fn} needs 3 args: {rs!r}")
                if req.topcount is not None:
                    raise MdxParseError(f"nested {fn} is unsupported")
                if not parts[1].isdigit():
                    raise MdxParseError(
                        f"{fn} count must be an integer: {parts[1]!r}")
                req.topcount = TopCountSpec(int(parts[1]),
                                            _measure_name(parts[2]),
                                            bottom=fn == "BOTTOMCOUNT")
            elif fn == "ORDER":
                if len(parts) not in (2, 3):
                    raise MdxParseError(f"ORDER needs 2-3 args: {rs!r}")
                direction = (parts[2].strip().upper()
                             if len(parts) == 3 else "ASC")
                if direction not in ("ASC", "DESC", "BASC", "BDESC"):
                    raise MdxParseError(
                        f"ORDER direction {direction!r} unsupported")
                if req.order_by is not None:
                    raise MdxParseError("nested ORDER is unsupported")
                req.order_by = (_measure_name(parts[1]),
                                direction.endswith("DESC"))
            elif fn in ("ADDCALCULATEDMEMBERS",
                        "STRIPCALCULATEDMEMBERS"):
                # transparent: this engine declares calculated members
                # only on [Measures] (never on dimension hierarchies),
                # so a dimension set has none to add or strip — Excel
                # wraps every pivot axis in ADDCALCULATEDMEMBERS
                if len(parts) != 1:
                    raise MdxParseError(
                        f"{fn} takes one set: {rs!r}")
            elif fn == "HIERARCHIZE":
                # transparent: the engine's canonical level-path output
                # order IS hierarchized order (Excel wraps every pivot
                # axis in it); POST (parents after children) is not in
                # the subset
                if len(parts) == 2 and parts[1].strip().upper() == "POST":
                    raise MdxParseError(
                        "HIERARCHIZE POST is unsupported (the engine "
                        "emits parents-before-children order)")
                if len(parts) != 1:
                    raise MdxParseError(
                        f"HIERARCHIZE takes one set: {rs!r}")
            elif fn == "NONEMPTY":
                if len(parts) == 1:
                    req.non_empty = True
                elif len(parts) == 2:
                    req.non_empty_measures.append(
                        _measure_name(parts[1]))
                else:
                    raise MdxParseError(
                        f"NONEMPTY takes (set[, [Measures].[X]]): "
                        f"{rs!r}")
            else:                      # FILTER
                if len(parts) != 2:
                    raise MdxParseError(f"FILTER needs 2 args: {rs!r}")
                req.having.append(parts[1].strip())
            r = parts[0]

        req.rows = _parse_set(r, props)
        if prop_paths:
            matched = [False] * len(prop_paths)
            for item in req.rows:
                names = []
                for i, segs in enumerate(prop_paths):
                    if len(segs) >= 3:
                        hit = (segs[0].lower() == item.dimension.lower()
                               and segs[1].lower() == item.hierarchy.lower())
                    else:
                        hit = segs[0].lower() in (item.dimension.lower(),
                                                  item.hierarchy.lower())
                    if hit:
                        names.append(segs[-1])
                        matched[i] = True
                if names:
                    item.property_list = names
            orphans = [p for p, hit in zip(prop_paths, matched) if not hit]
            if orphans:
                raise MdxParseError(
                    f"DIMENSION PROPERTIES name hierarchies absent from "
                    f"the row axis: {orphans!r}")

    # -- WHERE slicer tuple (Q11) ------------------------------------------
    where = m.group("where")
    if where:
        # tuple elements; a brace-wrapped element is a SET slicer
        # (round 9): its members land as individual slicer strings and
        # the engine ORs members WITHIN a hierarchy while ANDing
        # ACROSS hierarchies (the SSAS set-in-slicer contract).
        out = []
        for part in _split_top(where):
            if part.startswith("{") and part.endswith("}"):
                out.extend(_split_top(part[1:-1]))
            else:
                out.append(part)
        req.slicers = out

    return req


# ---------------------------------------------------------------------------
# MDX builder — the reference's emit side (scanner/DGIS_SCAN_2_stable.py:
# 1366-1420, backend/olap_service.py:346-453, frontend/src/utils/
# mdxBuilder.ts:4-40).  parse_mdx(build_mdx(req)) round-trips (tested).
# ---------------------------------------------------------------------------

def _axis_set(item: AxisItem) -> str:
    if item.members and (item.level is not None
                         or item.depth is not None):
        if item.depth is not None:
            # depth-targeted navigation: the SSAS distance form
            # DESCENDANTS(m, n); .CHILDREN parses to distance 1
            from . import naming as _naming
            if item.ancestor:
                raise ValueError(
                    "ANCESTOR emits by level name only; resolve depth "
                    "to a level before building MDX")
            if len(item.members) != 1:
                raise ValueError(
                    "distance-form DESCENDANTS takes a single member")
            dist = item.depth - _naming.parse(item.members[0]).depth
            if dist < 1:
                raise ValueError(
                    f"DESCENDANTS distance must be >= 1, got {dist}")
            return f"DESCENDANTS({item.members[0]}, {dist})"
        lvl = f"[{item.dimension}].[{item.hierarchy}].[{item.level}]"
        if item.ancestor:
            if len(item.members) != 1:
                raise ValueError("ANCESTOR takes a single member")
            return f"ANCESTOR({item.members[0]}, {lvl})"
        ms = (item.members[0] if len(item.members) == 1
              else "{ " + ", ".join(item.members) + " }")
        return f"DESCENDANTS({ms}, {lvl})"
    if item.members:
        return "{ " + ", ".join(item.members) + " }"
    if item.depth is not None:
        return (f"[{item.dimension}].[{item.hierarchy}]"
                f".Levels({item.depth}).MEMBERS")
    if item.level:
        return (f"[{item.dimension}].[{item.hierarchy}]"
                f".[{item.level}].MEMBERS")
    return f"[{item.dimension}].[{item.hierarchy}].MEMBERS"


def build_mdx(req: QueryRequest, cube_name: str | None = None) -> str:
    """QueryRequest → MDX string in the reference's emitted dialect:
    measures/variables ON COLUMNS, right-folded CROSSJOIN of row sets
    (Q8), DIMENSION PROPERTIES when requested (Q13), NON EMPTY (Q12),
    WHERE slicer tuple (Q11)."""
    if req.all_measures:
        cols = "[Measures].AllMembers"
    elif req.variables:          # Q17: variables take the COLUMNS role
        cols = "{ " + ", ".join(req.variables) + " }"
    else:
        cols = "{ " + ", ".join(
            f"[Measures].[{m}]" for m in req.measures) + " }"

    with_clause = ""
    if req.calculated:
        defs = " ".join(f"MEMBER [Measures].[{c.name}] AS {c.expr}"
                        for c in req.calculated)
        with_clause = f"WITH {defs} "

    dt_prefix = ""
    if getattr(req, "drillthrough", False):
        dt_prefix = "DRILLTHROUGH " + (
            f"MAXROWS {req.max_rows} " if req.max_rows else "")
    parts = [f"{dt_prefix}{with_clause}SELECT {cols} ON COLUMNS"]
    if req.rows:
        sets = [_axis_set(item) for item in req.rows]
        rows = sets[-1]
        for s in reversed(sets[:-1]):       # right-folded, as the reference
            rows = f"CROSSJOIN({s}, {rows})"
        # set-function wrappers (extensions): FILTER innermost (emitted
        # in reverse so re-parsing, which unwraps outermost-first and
        # appends, preserves condition order), then ORDER, then TOPCOUNT
        for m in reversed(getattr(req, "non_empty_measures", []) or []):
            rows = f"NONEMPTY({rows}, [Measures].[{m}])"
        for cond in reversed(req.having):
            rows = f"FILTER({rows}, {cond})"
        if req.order_by is not None:
            name, desc = req.order_by
            rows = (f"ORDER({rows}, [Measures].[{name}], "
                    f"{'DESC' if desc else 'ASC'})")
        if req.topcount is not None:
            tfn = "BOTTOMCOUNT" if req.topcount.bottom else "TOPCOUNT"
            rows = (f"{tfn}({rows}, {req.topcount.n}, "
                    f"[Measures].[{req.topcount.measure}])")
        if req.toppercent is not None:
            tp = req.toppercent
            pfn = ("BOTTOM" if tp.bottom else "TOP") + \
                ("SUM" if tp.absolute else "PERCENT")
            rows = (f"{pfn}({rows}, {tp.threshold}, "
                    f"[Measures].[{tp.measure}])")
        if req.head_tail is not None:   # outermost: executes last
            hfn = "TAIL" if req.head_tail.tail else "HEAD"
            rows = f"{hfn}({rows}, {req.head_tail.n})"
        prop_terms = [
            f"[{item.dimension}].[{item.hierarchy}].[{p}]"
            for item in req.rows
            for p in (item.property_list or [])]
        # an item with the all-ancestors flag but no named list still
        # needs MEMBER_CAPTION emitted alongside any named terms — the
        # parser applies the intrinsic flag to every axis item, and
        # named lists take precedence at resolution, so the mixed
        # emission round-trips semantics-preserving
        if any(item.properties and not item.property_list
               for item in req.rows):
            prop_terms.insert(0, "MEMBER_CAPTION")
        if prop_terms:
            rows += " DIMENSION PROPERTIES " + ", ".join(prop_terms)
        prefix = "NON EMPTY " if req.non_empty else ""
        parts.append(f", {prefix}{rows} ON ROWS")
    cube_ref = f"[{cube_name or req.cube or req.catalog}]"
    if getattr(req, "subselects", None):
        sets = ", ".join(
            "{ " + ", ".join(f.members) + " }" for f in req.subselects)
        if len(req.subselects) > 1:
            sets = f"({sets})"
        parts.append(f"FROM (SELECT {sets} ON COLUMNS FROM {cube_ref})")
    else:
        parts.append(f"FROM {cube_ref}")
    if req.slicers:
        parts.append("WHERE (" + ", ".join(req.slicers) + ")")
    if getattr(req, "return_cols", None):
        parts.append("RETURN " + ", ".join(req.return_cols))
    if getattr(req, "cell_properties", None):
        parts.append("CELL PROPERTIES "
                     + ", ".join(req.cell_properties))
    return " ".join(parts)


# ---------------------------------------------------------------------------
# DMV SQL dialect (M2-M5): SELECT ... FROM $system.X WHERE ... ORDER BY ...
# ---------------------------------------------------------------------------

_DMV_RE = re.compile(
    r"SELECT\s+(?P<cols>\*|[\[\]\w,\s]+?)\s+FROM\s+\$system\.(?P<rowset>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.*?))?\s*$",
    re.IGNORECASE | re.DOTALL)

_COND_RE = re.compile(
    r"\[(?P<col>[^\]]+)\]\s*(?P<op>=|<>|>=|<=|>|<)\s*"
    r"(?P<val>'[^']*'|\S+)")


def execute_dmv(spark: SparkSession, sql: str,
                view_prefix: str = "system") -> DataFrame:
    """Run a DMV query against the registered ``<prefix>_<ROWSET>`` views
    (metadata.register_dmv_views).  Projection/restriction/ordering map to
    select/filter/orderBy — Catalyst pushes them down (M3-M5)."""
    m = _DMV_RE.match(" ".join(sql.split()))
    if not m:
        raise MdxParseError(f"unsupported DMV query: {sql!r}")
    rowset = m.group("rowset").upper()
    try:
        df = spark.table(f"{view_prefix}_{rowset}")
    except Exception as exc:
        raise MdxParseError(f"unknown DMV rowset $system.{rowset}") from exc

    where = m.group("where")
    if where:
        for cond in re.split(r"\s+AND\s+", where, flags=re.IGNORECASE):
            c = _COND_RE.match(cond.strip())
            if not c:
                raise MdxParseError(f"unsupported DMV predicate: {cond!r}")
            col, op, val = c.group("col"), c.group("op"), c.group("val")
            lit = val.strip("'") if val.startswith("'") else (
                float(val) if "." in val else int(val))
            colc = F.col(col)
            expr = {"=": colc == lit, "<>": colc != lit, ">": colc > lit,
                    "<": colc < lit, ">=": colc >= lit, "<=": colc <= lit}[op]
            df = df.filter(expr)

    cols = m.group("cols").strip()
    if cols != "*":
        names = [c.strip().strip("[]") for c in cols.split(",")]
        df = df.select(*names)

    order = m.group("order")
    if order:
        exprs = []
        for part in order.split(","):
            p = part.strip()
            desc = p.upper().endswith(" DESC")
            name = re.sub(r"\s+(ASC|DESC)$", "", p, flags=re.IGNORECASE) \
                     .strip().strip("[]")
            exprs.append(F.col(name).desc() if desc else F.col(name).asc())
        df = df.orderBy(*exprs)
    return df
