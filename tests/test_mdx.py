"""MDX subset parser + DMV SQL front-end."""
import pytest

from olap_xtrctr_spark import CubeQueryEngine, default_registry
from olap_xtrctr_spark.mdx import MdxParseError, execute_dmv, parse_mdx
from olap_xtrctr_spark.metadata import register_dmv_views
from olap_xtrctr_spark.cube import sales_cube


def test_parse_reference_shape():
    mdx = """
    SELECT { [Measures].[Sum Extendedprice], [Measures].[Total Registros] }
    ON COLUMNS,
    NON EMPTY CROSSJOIN([Dim Customer].[Geografía].[Nation].MEMBERS,
                        [Dim Orders].[Estado].[Estado].MEMBERS)
    DIMENSION PROPERTIES MEMBER_CAPTION ON ROWS
    FROM [sales]
    WHERE ([Dim Orders].[Prioridad].[Prioridad].&[1-URGENT])
    """
    req = parse_mdx(mdx, "VENTAS_2025")
    assert req.measures == ["Sum Extendedprice", "Total Registros"]
    assert req.non_empty is True
    assert len(req.rows) == 2
    assert req.rows[0].dimension == "Dim Customer"
    assert req.rows[0].level == "Nation"
    assert req.rows[0].properties is True
    assert req.rows[1].hierarchy == "Estado"
    assert req.slicers == ["[Dim Orders].[Prioridad].[Prioridad].&[1-URGENT]"]
    assert req.cube == "sales"


def test_parse_levels_ordinal_and_allmembers():
    req = parse_mdx(
        "SELECT [Measures].AllMembers ON COLUMNS, "
        "[Dim Proveedor].[Geografía Proveedor].Levels(2).MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert req.all_measures is True
    assert req.rows[0].depth == 2


def test_parse_member_literal_set():
    req = parse_mdx(
        "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, "
        "{ [Dim Customer].[Geografía].[Region].&[0], "
        "[Dim Customer].[Geografía].[Region].&[2] } ON ROWS FROM [sales]",
        "VENTAS_2025")
    assert req.rows[0].members == [
        "[Dim Customer].[Geografía].[Region].&[0]",
        "[Dim Customer].[Geografía].[Region].&[2]"]


def test_parse_rejects_unsupported():
    with pytest.raises(MdxParseError):
        parse_mdx("WITH MEMBER x AS 1 SELECT ...", "C")
    with pytest.raises(MdxParseError):
        parse_mdx("SELECT {[Measures].[X]} ON COLUMNS, "
                  "TOPCOUNT([D].[H].MEMBERS, 5) ON ROWS FROM [c]", "C")


def test_mdx_execution_matches_structured(spark, sf_dir):
    """Parsed MDX must produce the same result as the direct QueryRequest."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    req = parse_mdx(
        "SELECT {[Measures].[Total Registros]} ON COLUMNS, "
        "NON EMPTY [Dim Customer].[Geografía].[Nation].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    via_mdx = {tuple(r) for r in eng.execute(req).collect()}
    from olap_xtrctr_spark import AxisItem, QueryRequest
    direct = {tuple(r) for r in eng.execute(QueryRequest(
        "VENTAS_2025", measures=["Total Registros"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Nation")]))
        .collect()}
    assert via_mdx == direct


def test_dmv_projection_restriction_order(spark, sf_dir):
    reg = default_registry()
    register_dmv_views(spark, reg, sales_cube(), sf_dir)
    df = execute_dmv(spark, """
        SELECT [LEVEL_NAME], [LEVEL_NUMBER] FROM $system.MDSCHEMA_LEVELS
        WHERE [HIERARCHY_UNIQUE_NAME] = '[Dim Customer].[Geografía]'
          AND [LEVEL_NUMBER] > 0
        ORDER BY [LEVEL_NUMBER] ASC""")
    rows = df.collect()
    assert [r["LEVEL_NAME"] for r in rows] == ["Region", "Nation", "Customer"]
    assert df.columns == ["LEVEL_NAME", "LEVEL_NUMBER"]


def test_dmv_star_and_errors(spark, sf_dir):
    reg = default_registry()
    register_dmv_views(spark, reg, sales_cube(), sf_dir)
    assert execute_dmv(
        spark, "SELECT * FROM $system.MDSCHEMA_MEASURES").count() == 6
    with pytest.raises(MdxParseError):
        execute_dmv(spark, "SELECT * FROM $system.NOPE_ROWSET")
    with pytest.raises(MdxParseError):
        execute_dmv(spark, "DELETE FROM $system.MDSCHEMA_CUBES")


# ---- builder round-trip (parse ∘ build = identity) -----------------------

from hypothesis import given, settings, strategies as st

from olap_xtrctr_spark.mdx import build_mdx
from olap_xtrctr_spark.query import AxisItem, QueryRequest

_NAME = st.sampled_from(["Dim Customer", "Dim Orders", "D Tiempo"])
_HIER = st.sampled_from(["Geografía", "Estado", "Calendario"])
_LEVEL = st.sampled_from(["Region", "Nation", "Estado", "Mes"])
_MEASURE = st.sampled_from(["Sum Quantity", "Total Registros", "Avg Discount"])


@st.composite
def _axis(draw):
    dim, hier = draw(_NAME), draw(_HIER)
    kind = draw(st.sampled_from(["level", "depth", "members", "whole",
                                 "descendants", "ancestor"]))
    if kind == "level":
        props = draw(st.one_of(
            st.none(),
            st.lists(st.sampled_from(["Region", "Nation"]), min_size=1,
                     max_size=2, unique=True)))
        return AxisItem(dim, hier, level=draw(_LEVEL),
                        property_list=props)
    if kind == "depth":
        return AxisItem(dim, hier, depth=draw(st.integers(1, 3)))
    if kind == "members":
        keys = draw(st.lists(st.integers(0, 9), min_size=1, max_size=3,
                             unique=True))
        return AxisItem(dim, hier, members=[
            f"[{dim}].[{hier}].[L1].&[{k}]" for k in keys])
    if kind == "descendants":
        keys = draw(st.lists(st.integers(0, 9), min_size=1, max_size=3,
                             unique=True))
        return AxisItem(dim, hier, level=draw(_LEVEL), members=[
            f"[{dim}].[{hier}].[L1].&[{k}]" for k in keys])
    if kind == "ancestor":
        return AxisItem(
            dim, hier, level=draw(_LEVEL), ancestor=True,
            members=[f"[{dim}].[{hier}].[L1]"
                     f".&[{draw(st.integers(0, 9))}]"
                     f".&[{draw(st.integers(0, 9))}]"])
    return AxisItem(dim, hier)


@given(measures=st.lists(_MEASURE, min_size=1, max_size=3, unique=True),
       rows=st.lists(_axis(), min_size=0, max_size=3),
       non_empty=st.booleans(),
       slicer=st.booleans(),
       cell_props=st.lists(
           st.sampled_from(["VALUE", "FORMATTED_VALUE",
                            "FORMAT_STRING", "LANGUAGE"]),
           max_size=3, unique=True),
       ne_measures=st.lists(_MEASURE, max_size=2, unique=True))
def test_build_parse_roundtrip(measures, rows, non_empty, slicer,
                               cell_props, ne_measures):
    # distinct (dim, hier) per row axis — Q9 forbids duplicates anyway
    seen, uniq = set(), []
    for r in rows:
        if (r.dimension, r.hierarchy) not in seen:
            seen.add((r.dimension, r.hierarchy))
            uniq.append(r)
    req = QueryRequest(
        "VENTAS_2025", cube="sales", measures=measures, rows=uniq,
        non_empty=non_empty,
        slicers=(["[Dim Producto].[Producto].[Brand].&[Brand#11]"]
                 if slicer else []),
        cell_properties=cell_props,
        # NONEMPTY wrappers need a rows set to wrap
        non_empty_measures=ne_measures if uniq else [])
    back = parse_mdx(build_mdx(req), "VENTAS_2025")
    assert back.measures == req.measures
    assert back.slicers == req.slicers
    assert back.cube == "sales"
    assert back.cell_properties == req.cell_properties
    assert back.non_empty_measures == req.non_empty_measures
    if uniq:
        assert back.non_empty == req.non_empty
        assert len(back.rows) == len(uniq)
        for a, b in zip(back.rows, uniq):
            assert (a.dimension, a.hierarchy, a.level, a.depth,
                    a.members, a.ancestor) \
                == (b.dimension, b.hierarchy, b.level, b.depth,
                    b.members, b.ancestor)
            assert (a.property_list or None) == \
                (getattr(b, "property_list", None) or None)


def test_build_mdx_reference_shape():
    req = QueryRequest(
        "VENTAS_2025", cube="sales", measures=["Sum Extendedprice"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Nation",
                       properties=True),
              AxisItem("Dim Orders", "Estado", level="Estado")],
        slicers=["[D Tiempo].[Calendario].[Año].&[1997]"])
    mdx = build_mdx(req)
    assert mdx == (
        "SELECT { [Measures].[Sum Extendedprice] } ON COLUMNS , "
        "NON EMPTY CROSSJOIN([Dim Customer].[Geografía].[Nation].MEMBERS, "
        "[Dim Orders].[Estado].[Estado].MEMBERS) "
        "DIMENSION PROPERTIES MEMBER_CAPTION ON ROWS "
        "FROM [sales] WHERE ([D Tiempo].[Calendario].[Año].&[1997])")


# ---- named DIMENSION PROPERTIES list (Q13 full MDX form) ------------------
# Reference scanner/DGIS_SCAN_2_stable.py:1282-1298,1399-1408 emits the
# superior levels as named properties: DIMENSION PROPERTIES
# [Dim].[Hier].[Level1], [Dim].[Hier].[Level2]

def test_parse_named_dimension_properties_list():
    req = parse_mdx(
        "SELECT {[Measures].[Total Registros]} ON COLUMNS, "
        "NON EMPTY [Dim Customer].[Geografía].[Customer].MEMBERS "
        "DIMENSION PROPERTIES [Dim Customer].[Geografía].[Nation] ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert req.rows[0].property_list == ["Nation"]
    assert req.rows[0].properties is False
    # parse ∘ build preserves the named list
    back = parse_mdx(build_mdx(req), "VENTAS_2025")
    assert back.rows[0].property_list == ["Nation"]


def test_parse_named_properties_two_hierarchies():
    req = parse_mdx(
        "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, "
        "CROSSJOIN([Dim Customer].[Geografía].[Customer].MEMBERS, "
        "[Dim Producto].[Producto].[Part].MEMBERS) "
        "DIMENSION PROPERTIES [Dim Customer].[Geografía].[Region], "
        "[Dim Customer].[Geografía].[Nation], "
        "[Producto].[Brand] ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.rows[0].property_list == ["Region", "Nation"]
    assert req.rows[1].property_list == ["Brand"]


def test_parse_named_properties_orphan_hierarchy_rejected():
    with pytest.raises(MdxParseError):
        parse_mdx(
            "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, "
            "[Dim Customer].[Geografía].[Nation].MEMBERS "
            "DIMENSION PROPERTIES [Dim Orders].[Estado].[Estado] ON ROWS "
            "FROM [sales]", "VENTAS_2025")


def test_named_properties_non_ancestor_rejected(spark, sf_dir):
    from olap_xtrctr_spark.query import QueryValidationError
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    req = parse_mdx(
        "SELECT {[Measures].[Total Registros]} ON COLUMNS, "
        "[Dim Customer].[Geografía].[Nation].MEMBERS "
        "DIMENSION PROPERTIES [Dim Customer].[Geografía].[Customer] ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    with pytest.raises(QueryValidationError):
        eng.execute(req)


def test_named_properties_execution_selects_subset(spark, sf_dir):
    """Named list selects only the named ancestor column; the projection
    of the all-ancestors result onto those columns must agree exactly."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    named = eng.execute(parse_mdx(
        "SELECT {[Measures].[Total Registros]} ON COLUMNS, "
        "[Dim Customer].[Geografía].[Customer].MEMBERS "
        "DIMENSION PROPERTIES [Dim Customer].[Geografía].[Nation] ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    assert named.columns[:2] == ["nation", "customer"]
    from olap_xtrctr_spark import AxisItem, QueryRequest
    full = eng.execute(QueryRequest(
        "VENTAS_2025", measures=["Total Registros"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Customer",
                       properties=True)]))
    assert {tuple(r) for r in named.collect()} == \
        {tuple(r) for r in full.select("nation", "customer",
                                       full.columns[-1]).collect()}


def test_mdx_dimension_properties_matches_structured(spark, sf_dir):
    """cube_dimension_properties driven through raw MDX with the named
    property list matches the structured properties=True request (at the
    Nation level the only ancestor IS Region)."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    via_mdx = eng.execute(parse_mdx(
        "SELECT {[Measures].[Total Registros]} ON COLUMNS, "
        "[Dim Customer].[Geografía].[Nation].MEMBERS "
        "DIMENSION PROPERTIES [Dim Customer].[Geografía].[Region] ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    from olap_xtrctr_spark import AxisItem, QueryRequest
    direct = eng.execute(QueryRequest(
        "VENTAS_2025", measures=["Total Registros"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Nation",
                       properties=True)]))
    assert {tuple(r) for r in via_mdx.collect()} == \
        {tuple(r) for r in direct.collect()}


def test_mixed_properties_roundtrip_preserved():
    req = QueryRequest(
        "VENTAS_2025", cube="sales", measures=["Total Registros"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Nation",
                       property_list=["Region"]),
              AxisItem("Dim Orders", "Estado", level="Estado",
                       properties=True)])
    mdx = build_mdx(req)
    assert "MEMBER_CAPTION" in mdx and "[Region]" in mdx
    back = parse_mdx(mdx, "VENTAS_2025")
    assert back.rows[0].property_list == ["Region"]
    assert back.rows[1].properties is True       # all-ancestors kept


def test_parse_with_member_and_roundtrip():
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx

    req = parse_mdx(
        "WITH MEMBER [Measures].[Margin] AS "
        "([Measures].[Sum Extendedprice] - [Measures].[Sum Tax]) / "
        "[Measures].[Sum Extendedprice] "
        "MEMBER [Measures].[Double Qty] AS [Measures].[Sum Quantity] * 2 "
        "SELECT { [Measures].[Margin], [Measures].[Double Qty] } "
        "ON COLUMNS, [Dim Customer].[Geografía].[Nation].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert [c.name for c in req.calculated] == ["Margin", "Double Qty"]
    assert req.measures == ["Margin", "Double Qty"]
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req


def test_parse_set_functions_nested_and_roundtrip():
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx
    from olap_xtrctr_spark.query import TopCountSpec

    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "NON EMPTY TOPCOUNT(ORDER(FILTER("
        "[Dim Customer].[Geografía].[Nation].MEMBERS, "
        "[Measures].[Sum Quantity] > 1000), "
        "[Measures].[Sum Quantity], DESC), 3, [Measures].[Sum Quantity]) "
        "ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.topcount == TopCountSpec(3, "Sum Quantity")
    assert req.order_by == ("Sum Quantity", True)
    assert req.having == ["[Measures].[Sum Quantity] > 1000"]
    assert req.rows[0].level == "Nation"
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req


def test_filter_wrapping_limit_rejected():
    """NONEMPTY/FILTER OUTSIDE a limit operator diverges from SSAS
    (inner evaluates first there, so the result may have fewer than n
    rows) — rejected with the rewrite hint; the inner-filter
    convention TOPCOUNT(FILTER(...)) stays supported (ADVICE r10)."""
    import pytest

    from olap_xtrctr_spark.mdx import MdxParseError, parse_mdx

    N = "[Dim Customer].[Geografía].[Nation].MEMBERS"
    M = "[Measures].[Sum Quantity]"
    bad = [
        f"SELECT {{{M}}} ON COLUMNS, NONEMPTY(TOPCOUNT({N}, 3, {M}), "
        f"{M}) ON ROWS FROM [sales]",
        f"SELECT {{{M}}} ON COLUMNS, FILTER(HEAD({N}, 3), {M} > 0) "
        f"ON ROWS FROM [sales]",
        f"SELECT {{{M}}} ON COLUMNS, NONEMPTY(TOPSUM({N}, 5, {M})) "
        f"ON ROWS FROM [sales]",
    ]
    for q in bad:
        with pytest.raises(MdxParseError, match="unsupported"):
            parse_mdx(q, "VENTAS_2025")
    # inner-filter convention still parses
    ok = parse_mdx(
        f"SELECT {{{M}}} ON COLUMNS, TOPCOUNT(FILTER({N}, {M} > 0), "
        f"3, {M}) ON ROWS FROM [sales]", "VENTAS_2025")
    assert ok.having == [f"{M} > 0"] and ok.topcount.n == 3


def test_parse_set_function_errors():
    import pytest

    from olap_xtrctr_spark.mdx import MdxParseError, parse_mdx

    bad = [
        # TOPCOUNT wrong arity
        "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, TOPCOUNT("
        "[Dim Customer].[Geografía].[Nation].MEMBERS, 5) ON ROWS "
        "FROM [sales]",
        # non-integer count
        "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, TOPCOUNT("
        "[Dim Customer].[Geografía].[Nation].MEMBERS, x, "
        "[Measures].[Sum Quantity]) ON ROWS FROM [sales]",
        # ORDER with a bogus direction
        "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, ORDER("
        "[Dim Customer].[Geografía].[Nation].MEMBERS, "
        "[Measures].[Sum Quantity], SIDEWAYS) ON ROWS FROM [sales]",
        # WITH but no MEMBER defs
        "WITH SELECT {[Measures].[Sum Quantity]} ON COLUMNS "
        "FROM [sales]",
    ]
    for mdx in bad:
        with pytest.raises(MdxParseError):
            parse_mdx(mdx, "VENTAS_2025")


def test_measure_expr_parser_safety_and_shape():
    import pytest

    from olap_xtrctr_spark.query import MeasureExprError, parse_measure_expr

    _, refs = parse_measure_expr(
        "([Measures].[A] + 2) * [Measures].[B] / [Measures].[A]")
    assert refs == ["A", "B", "A"]
    for bad in ("__import__('os')", "[Measures].[A] ;",
                "1 +", "([Measures].[A]", "[Dim].[X]"):
        with pytest.raises(MeasureExprError):
            parse_measure_expr(bad)


def test_parse_bottomcount_and_roundtrip():
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx
    from olap_xtrctr_spark.query import TopCountSpec

    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "BOTTOMCOUNT([Dim Customer].[Geografía].[Nation].MEMBERS, 2, "
        "[Measures].[Sum Quantity]) ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.topcount == TopCountSpec(2, "Sum Quantity", bottom=True)
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req


# ---- property: the measure-expression parser agrees with a direct
# Python evaluation of the same tree (including safe-divide-to-NULL) ----

_expr_leaf = st.one_of(
    st.sampled_from(["[Measures].[A]", "[Measures].[B]"]),
    st.integers(min_value=0, max_value=9).map(str))


def _expr_tree(depth):
    if depth == 0:
        return _expr_leaf
    sub = _expr_tree(depth - 1)
    return st.one_of(
        _expr_leaf,
        st.tuples(sub, st.sampled_from("+-*/"), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"))


def _py_eval(expr, a, b):
    import re as _re

    def rec(s):
        s = s.strip()
        if s.startswith("(") and s.endswith(")"):
            # split on the top-level operator
            depth = 0
            for i, ch in enumerate(s[1:-1], 1):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif depth == 0 and ch in "+-*/" and i > 1:
                    lhs, rhs = rec(s[1:i]), rec(s[i + 1:-1])
                    if lhs is None or rhs is None:
                        return None
                    if ch == "+":
                        return lhs + rhs
                    if ch == "-":
                        return lhs - rhs
                    if ch == "*":
                        return lhs * rhs
                    return None if rhs == 0 else lhs / rhs
        if s == "[Measures].[A]":
            return a
        if s == "[Measures].[B]":
            return b
        return float(s)
    return rec(expr)


@settings(deadline=None, max_examples=25)
@given(_expr_tree(3), st.integers(-5, 5), st.integers(-5, 5))
def test_measure_expr_matches_python_eval(expr, a, b):
    from pyspark.sql import functions as F

    from olap_xtrctr_spark import get_spark
    from olap_xtrctr_spark.query import parse_measure_expr

    spark = get_spark("pytest")     # getOrCreate: reuses the session
    builder, _ = parse_measure_expr(expr)
    cols = {"A": F.lit(float(a)), "B": F.lit(float(b))}
    got = spark.range(1).select(
        builder(lambda n: cols[n]).alias("v")).first()["v"]
    want = _py_eval(expr, float(a), float(b))
    if want is None:
        assert got is None
    else:
        assert got is not None and abs(got - want) < 1e-9 * max(
            1.0, abs(want))


@settings(deadline=None, max_examples=300)
@given(st.text(max_size=120))
def test_parse_mdx_rejects_garbage_cleanly(s):
    """Fuzz: arbitrary input either parses or raises MdxParseError —
    never an unrelated exception (IndexError/AttributeError/...)."""
    from olap_xtrctr_spark.mdx import MdxParseError, parse_mdx
    try:
        parse_mdx(s, "C")
    except MdxParseError:
        pass


@settings(deadline=None, max_examples=200)
@given(st.text(alphabet="SELECT{}[].&, ONCLUMSROWFM()TOPBID0123456789",
               max_size=150))
def test_parse_mdx_rejects_mdx_shaped_garbage_cleanly(s):
    """Same, biased toward MDX-shaped token soup."""
    from olap_xtrctr_spark.mdx import MdxParseError, parse_mdx
    try:
        parse_mdx("SELECT " + s, "C")
    except MdxParseError:
        pass


@settings(deadline=None, max_examples=200)
@given(st.text(alphabet="SELECT*FROM$system.WHEREORDBYASC[]'=<>, _",
               max_size=120))
def test_execute_dmv_rejects_garbage_cleanly(s):
    """Fuzz the DMV SQL dialect: anything that is not the supported
    subset raises MdxParseError, never an unrelated exception.
    (Executed lazily — no SparkSession needed to hit the parser.)"""
    from olap_xtrctr_spark.mdx import MdxParseError, execute_dmv
    try:
        execute_dmv(None, s)           # parser rejects before spark use
    except MdxParseError:
        pass
    except AttributeError:
        # reached actual execution with spark=None: the string PARSED —
        # fine, parsing robustness is what this fuzz pins
        pass


# ---- DESCENDANTS / ANCESTOR (round 8, VERDICT r7 task 6) ----------------

def test_parse_descendants_and_ancestor_shapes():
    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "DESCENDANTS({ [Dim Customer].[Geografía].[Region].&[0], "
        "[Dim Customer].[Geografía].[Region].&[2] }, "
        "[Dim Customer].[Geografía].[Nation]) ON ROWS FROM [sales]",
        "VENTAS_2025")
    (item,) = req.rows
    assert item.level == "Nation" and len(item.members) == 2
    assert not item.ancestor

    req2 = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "ANCESTOR([Dim Customer].[Geografía].[Nation].&[2].&[2], "
        "[Geografía].[Region]) ON ROWS FROM [sales]", "VENTAS_2025")
    (it2,) = req2.rows
    assert it2.ancestor and it2.level == "Region"
    assert it2.members == ["[Dim Customer].[Geografía].[Nation].&[2].&[2]"]
    # short [Hier].[Level] path resolved against the member's hierarchy
    assert it2.dimension == "Dim Customer" and it2.hierarchy == "Geografía"

    # round-trips through build_mdx
    for r in (req, req2):
        back = parse_mdx(build_mdx(r), "VENTAS_2025")
        assert back.rows == r.rows


def test_parse_descendants_ancestor_errors():
    import pytest
    head = "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
    tail = " ON ROWS FROM [sales]"
    bad = [
        # ANCESTOR over a set
        "ANCESTOR({ [D].[H].[L].&[1], [D].[H].[L].&[2] }, [D].[H].[L])",
        # wrong arity
        "DESCENDANTS([D].[H].[L].&[1])",
        # level arg is a member, not a level path
        "DESCENDANTS([D].[H].[L].&[1], [D].[H].[L].&[2])",
        # level path names a different hierarchy
        "DESCENDANTS([D].[H].[L].&[1], [Other].[Hier2].[L2])",
        # member set spanning hierarchies
        "DESCENDANTS({ [D].[H].[L].&[1], [D].[H2].[L].&[2] }, [D].[H].[L])",
    ]
    for b in bad:
        with pytest.raises(MdxParseError):
            parse_mdx(head + b + tail, "VENTAS_2025")


def test_descendants_execution_matches_member_filter(spark, sf_dir):
    """DESCENDANTS(region 2, Nation) == the Nation-level aggregate
    filtered to region 2 by an explicit member set — and its plan
    pushes the region-key constraint into the scan, not a post-agg
    filter."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    via_desc = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "DESCENDANTS([Dim Customer].[Geografía].[Region].&[2], "
        "[Dim Customer].[Geografía].[Nation]) ON ROWS FROM [sales]",
        "VENTAS_2025"))
    rows = {r["nation"]: r["sum_quantity"] for r in via_desc.collect()}
    assert len(rows) == 5

    # same cells as grouping all nations then keeping region-2 ones
    all_n = eng.execute(QueryRequest(
        "VENTAS_2025", measures=["Sum Quantity"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Nation",
                       properties=True)]))
    keep = {r["nation"]: r["sum_quantity"] for r in all_n.collect()
            if r["region"] == "ASIA"}
    assert rows == keep


def test_parent_and_siblings_member_functions(spark, sf_dir):
    """<m>.PARENT truncates the last key (one member, full rollup);
    <m>.SIBLINGS is the parent's children INCLUDING the member; a
    root-level member's SIBLINGS is the whole first level; PARENT of a
    root member errors (All member suppressed); round-trips."""
    from olap_xtrctr_spark.mdx import build_mdx

    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    N = "[Dim Customer].[Geografía].[Nation].&[2].&[2]"
    head = ("SELECT { [Measures].[Total Registros] } ON COLUMNS, ")
    tail = " ON ROWS FROM [sales]"

    # PARENT == ANCESTOR(member, Region): one row, whole-region rollup
    req = parse_mdx(head + f"{N}.PARENT" + tail, "VENTAS_2025")
    assert req.rows[0].members == \
        ["[Dim Customer].[Geografía].[Nation].&[2]"]
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req
    par = eng.execute(req).collect()
    via_anc = eng.execute(parse_mdx(
        head + f"ANCESTOR({N}, [Dim Customer].[Geografía].[Region])"
        + tail, "VENTAS_2025")).collect()
    assert [tuple(r) for r in par] == [tuple(r) for r in via_anc]

    # SIBLINGS == CHILDREN of the parent (5 nations in region 2,
    # including nation &[2].&[2] itself)
    req_s = parse_mdx(head + f"{N}.SIBLINGS" + tail, "VENTAS_2025")
    assert parse_mdx(build_mdx(req_s), "VENTAS_2025") == req_s
    sib = eng.execute(req_s).collect()
    via_children = eng.execute(parse_mdx(
        head + "[Dim Customer].[Geografía].[Region].&[2].CHILDREN"
        + tail, "VENTAS_2025")).collect()
    assert sorted(map(tuple, sib)) == sorted(map(tuple, via_children))
    assert len(sib) == 5

    # root-level member: SIBLINGS = all regions; PARENT errors
    R1 = "[Dim Customer].[Geografía].[Region].&[1]"
    roots = eng.execute(parse_mdx(head + f"{R1}.SIBLINGS" + tail,
                                  "VENTAS_2025")).collect()
    assert len(roots) == 5
    with pytest.raises(MdxParseError, match="PARENT of a root-level"):
        parse_mdx(head + f"{R1}.PARENT" + tail, "VENTAS_2025")
    with pytest.raises(MdxParseError, match="level path"):
        parse_mdx(head + "[Dim Customer].[Geografía].[Region].PARENT"
                  + tail, "VENTAS_2025")


def test_ancestor_execution_full_rollup(spark, sf_dir):
    """ANCESTOR(nation in region 2, Region) is ONE row whose cell is
    the rollup of the whole region (not just the named nation)."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    anc = eng.execute(parse_mdx(
        "SELECT { [Measures].[Total Registros] } ON COLUMNS, "
        "ANCESTOR([Dim Customer].[Geografía].[Nation].&[2].&[2], "
        "[Dim Customer].[Geografía].[Region]) ON ROWS FROM [sales]",
        "VENTAS_2025"))
    rows = anc.collect()
    assert len(rows) == 1 and rows[0]["region"] == "ASIA"
    regions = eng.execute(QueryRequest(
        "VENTAS_2025", measures=["Total Registros"],
        rows=[AxisItem("Dim Customer", "Geografía", level="Region")]))
    want = {r["region"]: r["total_registros"] for r in regions.collect()}
    assert rows[0]["total_registros"] == want["ASIA"]


def test_descendants_ancestor_validation_errors(spark, sf_dir):
    import pytest

    from olap_xtrctr_spark.query import QueryValidationError
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    # DESCENDANTS target above the member's level -> loud error
    with pytest.raises(QueryValidationError, match="DESCENDANTS"):
        eng.execute(QueryRequest(
            "VENTAS_2025", measures=["Sum Quantity"],
            rows=[AxisItem(
                "Dim Customer", "Geografía", level="Region",
                members=["[Dim Customer].[Geografía].[Nation].&[2].&[2]"]
            )]))
    # ANCESTOR target below the member's level -> loud error
    with pytest.raises(QueryValidationError, match="ANCESTOR"):
        eng.execute(QueryRequest(
            "VENTAS_2025", measures=["Sum Quantity"],
            rows=[AxisItem(
                "Dim Customer", "Geografía", level="Customer",
                ancestor=True,
                members=["[Dim Customer].[Geografía].[Region].&[2]"])]))
    # ANCESTOR without a level -> loud error
    with pytest.raises(QueryValidationError, match="ANCESTOR"):
        eng.execute(QueryRequest(
            "VENTAS_2025", measures=["Sum Quantity"],
            rows=[AxisItem(
                "Dim Customer", "Geografía", ancestor=True,
                members=["[Dim Customer].[Geografía].[Region].&[2]"])]))


def test_parse_children_and_distance_descendants():
    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[Dim Customer].[Geografía].[Region].&[0].CHILDREN ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    (item,) = req.rows
    assert item.members == ["[Dim Customer].[Geografía].[Region].&[0]"]
    assert item.depth == 2 and not item.ancestor

    # builder emits the distance form; parse round-trips it
    back = parse_mdx(build_mdx(req), "VENTAS_2025")
    assert "DESCENDANTS(" in build_mdx(req)
    assert back.rows == req.rows

    # explicit distance form, deeper than 1
    r2 = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "DESCENDANTS([Dim Customer].[Geografía].[Region].&[0], 2) "
        "ON ROWS FROM [sales]", "VENTAS_2025")
    assert r2.rows[0].depth == 3


def test_children_execution_equals_descendants_level(spark, sf_dir):
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    via_children = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[Dim Customer].[Geografía].[Region].&[2].CHILDREN ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    via_level = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "DESCENDANTS([Dim Customer].[Geografía].[Region].&[2], "
        "[Dim Customer].[Geografía].[Nation]) ON ROWS FROM [sales]",
        "VENTAS_2025"))
    a = {tuple(r) for r in via_children.collect()}
    b = {tuple(r) for r in via_level.collect()}
    assert a == b and len(a) == 5


def test_set_functions_compose_over_descendants(spark, sf_dir):
    """TOPCOUNT over DESCENDANTS: the outermost-first unwrapper hands
    the inner navigation set to _parse_set, so compositions work."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "TOPCOUNT(DESCENDANTS([Dim Customer].[Geografía].[Region].&[2], "
        "[Dim Customer].[Geografía].[Nation]), 2, "
        "[Measures].[Sum Quantity]) ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.topcount is not None and req.rows[0].level == "Nation"
    rows = eng.execute(req).collect()
    assert len(rows) == 2
    # the two kept nations are the top-2 of the 5 region-2 nations
    all5 = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "DESCENDANTS([Dim Customer].[Geografía].[Region].&[2], "
        "[Dim Customer].[Geografía].[Nation]) ON ROWS FROM [sales]",
        "VENTAS_2025")).collect()
    top2 = sorted((r["sum_quantity"] for r in all5), reverse=True)[:2]
    assert sorted((r["sum_quantity"] for r in rows), reverse=True) == top2


def test_parse_prevmember_tuple_roundtrip():
    """The PrevMember tuple flows through WITH MEMBER verbatim:
    parse -> build_mdx -> parse is a fixpoint, and the expression
    compiles (records the hierarchy marker, not a measure ref)."""
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx
    from olap_xtrctr_spark.query import parse_measure_expr

    req = parse_mdx(
        "WITH MEMBER [Measures].[Qty Delta] AS "
        "[Measures].[Sum Quantity] - "
        "([Measures].[Sum Quantity], [D Tiempo].[Calendario].PrevMember) "
        "SELECT { [Measures].[Qty Delta] } ON COLUMNS, "
        "[D Tiempo].[Calendario].[Mes].MEMBERS ON ROWS FROM [sales]",
        "VENTAS_2025")
    assert [c.name for c in req.calculated] == ["Qty Delta"]
    assert "PrevMember" in req.calculated[0].expr
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req

    _, refs = parse_measure_expr(req.calculated[0].expr)
    assert "Sum Quantity" in [r for r in refs if isinstance(r, str)]
    assert ("__prevmember__", "D Tiempo", "Calendario") in [
        r for r in refs if not isinstance(r, str)]


def test_named_set_expansion_and_nextmember():
    """WITH SET expands into its axis references (build_mdx emits the
    expanded form — parse->build->parse is a fixpoint); NextMember
    parses as the forward LagRef."""
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx
    from olap_xtrctr_spark.query import parse_measure_expr

    req = parse_mdx(
        "WITH SET [Two] AS '{ [Dim Customer].[Geografía].[Region].&[1], "
        "[Dim Customer].[Geografía].[Region].&[3] }' "
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[Two] ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.rows[0].members == [
        "[Dim Customer].[Geografía].[Region].&[1]",
        "[Dim Customer].[Geografía].[Region].&[3]"]
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req

    # SET + MEMBER interleaved in one WITH clause
    req2 = parse_mdx(
        "WITH SET [Two] AS '{ [Dim Customer].[Geografía].[Region].&[1] }' "
        "MEMBER [Measures].[Dbl] AS [Measures].[Sum Quantity] * 2 "
        "SELECT { [Measures].[Dbl] } ON COLUMNS, [Two] ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert [c.name for c in req2.calculated] == ["Dbl"]
    assert req2.rows[0].members

    _, refs = parse_measure_expr(
        "([Measures].[Sum Quantity], [D Tiempo].[Calendario].NextMember)")
    assert ("__prevmember__", "D Tiempo", "Calendario") in [
        r for r in refs if not isinstance(r, str)]


def test_named_set_no_collision_with_path_segments():
    """A set name that collides with a level segment or the cube name
    must not corrupt path references (only STANDALONE [Name] refs in
    the axis text expand)."""
    from olap_xtrctr_spark.mdx import parse_mdx

    req = parse_mdx(
        "WITH SET [Mes] AS '{ [Dim Customer].[Geografía].[Region].&[1] }' "
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[D Tiempo].[Calendario].[Mes].MEMBERS ON ROWS FROM [sales]",
        "VENTAS_2025")
    # the [Mes] LEVEL path survived; the set was simply unused
    assert req.rows[0].level == "Mes" and not req.rows[0].members

    req2 = parse_mdx(
        "WITH SET [sales] AS '{ [Dim Customer].[Geografía].[Region].&[1] }' "
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[sales] ON ROWS FROM [sales]", "VENTAS_2025")
    # the axis ref expanded, the FROM cube name did not
    assert req2.rows[0].members


# ---- round-9 time-intelligence fuzz + negatives (VERDICT r8 task 4) -----


@settings(deadline=None, max_examples=60)
@given(st.integers(1, 400))
def test_parallelperiod_distance_fuzz_parse(spark, n):
    """Every distance n >= 1 parses into LagRef(n) and survives the
    parse -> build_mdx -> parse fixpoint inside WITH MEMBER."""
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx
    from olap_xtrctr_spark.query import LagRef, parse_measure_expr

    expr = (f"[Measures].[Sum Quantity] - ([Measures].[Sum Quantity], "
            f"PARALLELPERIOD([D Tiempo].[Calendario], {n}))")
    builder, refs = parse_measure_expr(expr)
    assert ("__prevmember__", "D Tiempo", "Calendario") in [
        r for r in refs if not isinstance(r, str)]
    seen = []

    def resolve(x):
        if isinstance(x, LagRef):
            seen.append((x.n, x.forward))
            return x.col
        from pyspark.sql import functions as F
        return F.lit(1.0)
    builder(resolve)
    assert seen == [(n, False)]

    mdx = (f"WITH MEMBER [Measures].[Yoy] AS {expr} "
           "SELECT { [Measures].[Yoy] } ON COLUMNS, "
           "[D Tiempo].[Calendario].[Mes].MEMBERS ON ROWS FROM [sales]")
    req = parse_mdx(mdx, "VENTAS_2025")
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req


@settings(deadline=None, max_examples=40)
@given(st.sampled_from(["0", "-1", "-12", "x", "1.5", "", "[n]"]),
       st.sampled_from(["PARALLELPERIOD", "parallelperiod"]))
def test_parallelperiod_bad_distance_rejected(bad, kw):
    """Distances that are not integers >= 1 raise MeasureExprError,
    never an unrelated exception."""
    from olap_xtrctr_spark.query import MeasureExprError, parse_measure_expr

    expr = (f"([Measures].[Sum Quantity], "
            f"{kw}([D Tiempo].[Calendario], {bad}))")
    with pytest.raises(MeasureExprError):
        parse_measure_expr(expr)


def test_parallelperiod_malformed_shapes_rejected():
    from olap_xtrctr_spark.query import MeasureExprError, parse_measure_expr

    bad = [
        # missing n
        "([Measures].[X], PARALLELPERIOD([D Tiempo].[Calendario]))",
        # missing hierarchy
        "([Measures].[X], PARALLELPERIOD(12))",
        # level path instead of [Dim].[Hier]
        "([Measures].[X], PARALLELPERIOD("
        "[D Tiempo].[Calendario].[Mes], 12))",
        # unbalanced parens
        "([Measures].[X], PARALLELPERIOD([D Tiempo].[Calendario], 12)",
        # trailing junk inside the tuple
        "([Measures].[X], PARALLELPERIOD([D Tiempo].[Calendario], 12, 3))",
    ]
    for expr in bad:
        with pytest.raises(MeasureExprError):
            parse_measure_expr(expr)


@settings(deadline=None, max_examples=40)
@given(st.integers(1, 6), st.sampled_from(["<", ">", "<=", ">="]))
def test_filter_over_prevmember_composition_parses(n, op):
    """FILTER over a PrevMember/PARALLELPERIOD calc (the declining-
    months composition) parses and round-trips for any distance and
    comparison direction."""
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx

    mdx = (
        "WITH MEMBER [Measures].[Qty Delta] AS "
        "[Measures].[Sum Quantity] - ([Measures].[Sum Quantity], "
        f"PARALLELPERIOD([D Tiempo].[Calendario], {n})) "
        "SELECT { [Measures].[Sum Quantity], [Measures].[Qty Delta] } "
        "ON COLUMNS, FILTER([D Tiempo].[Calendario].[Mes].MEMBERS, "
        f"[Measures].[Qty Delta] {op} 0) "
        "DIMENSION PROPERTIES MEMBER_CAPTION ON ROWS FROM [sales]")
    req = parse_mdx(mdx, "VENTAS_2025")
    assert [c.name for c in req.calculated] == ["Qty Delta"]
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req


def test_parallelperiod_distance_beyond_axis_all_null(spark, sf_dir):
    """Negative (distance beyond axis): every cell of the lagged
    expression is NULL — the calc column exists, no row errors, and a
    FILTER on it prunes everything rather than failing."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    res = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Yoy] AS "
        "[Measures].[Sum Quantity] - ([Measures].[Sum Quantity], "
        "PARALLELPERIOD([D Tiempo].[Calendario], 9999)) "
        "SELECT { [Measures].[Sum Quantity], [Measures].[Yoy] } "
        "ON COLUMNS, [D Tiempo].[Calendario].[Mes].MEMBERS "
        "ON ROWS FROM [sales]", "VENTAS_2025"))
    rows = res.collect()
    assert rows and all(r["yoy"] is None for r in rows)
    assert all(r["sum_quantity"] is not None for r in rows)

    filtered = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Yoy] AS "
        "[Measures].[Sum Quantity] - ([Measures].[Sum Quantity], "
        "PARALLELPERIOD([D Tiempo].[Calendario], 9999)) "
        "SELECT { [Measures].[Yoy] } ON COLUMNS, "
        "FILTER([D Tiempo].[Calendario].[Mes].MEMBERS, "
        "[Measures].[Yoy] < 0) ON ROWS FROM [sales]", "VENTAS_2025"))
    assert filtered.count() == 0


def test_lastperiods_beyond_axis_equals_running_total(spark, sf_dir):
    """Negative (window beyond axis): LASTPERIODS(n) with n larger
    than the axis clamps to the rows that exist — the first member's
    window is itself, the last member's window is the whole axis, so
    the result equals the unbounded running total."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    big = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Roll] AS "
        "SUM(LASTPERIODS(99999, [D Tiempo].[Calendario]), "
        "[Measures].[Sum Quantity]) "
        "SELECT { [Measures].[Sum Quantity], [Measures].[Roll] } "
        "ON COLUMNS, [D Tiempo].[Calendario].[Mes].MEMBERS "
        "ON ROWS FROM [sales]", "VENTAS_2025")).collect()
    assert big
    # rebuild the expected running total in chronological result order
    run = 0.0
    for r in big:
        run += r["sum_quantity"]
        assert abs(r["roll"] - run) < 1e-6, r


# ---- round-9 MDX surface: set aggregation + TOPPERCENT family ----------


def test_parse_sum_over_named_set_roundtrip():
    """SUM([MySet], [Measures].[X]) expands the named set into the
    set-literal form inside the calc expr; parse -> build -> parse is
    a fixpoint and the compiled expr records the setagg marker."""
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx
    from olap_xtrctr_spark.query import parse_measure_expr

    req = parse_mdx(
        "WITH SET [Mis Regiones] AS "
        "'{ [Dim Customer].[Geografía].[Region].&[1], "
        "[Dim Customer].[Geografía].[Region].&[3] }' "
        "MEMBER [Measures].[Region Sales] AS "
        "SUM([Mis Regiones], [Measures].[Sum Extendedprice]) "
        "SELECT { [Measures].[Region Sales] } ON COLUMNS, "
        "[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS FROM [sales]",
        "VENTAS_2025")
    expr = req.calculated[0].expr
    assert "{" in expr and ".&[1]" in expr and ".&[3]" in expr
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req
    _, refs = parse_measure_expr(expr)
    markers = [r for r in refs if not isinstance(r, str)]
    assert markers and markers[0][0] == "__setagg__"
    assert markers[0][2] == "Sum Extendedprice"
    assert markers[0][3] is True        # SUM spelling -> forced_sum


def test_setagg_parse_negatives():
    from olap_xtrctr_spark.query import MeasureExprError, parse_measure_expr

    bad = [
        # empty set
        "SUM({}, [Measures].[X])",
        # caption path without key ref
        "SUM({ [D].[H].[L].[Cap] }, [Measures].[X])",
        # missing measure
        "SUM({ [D].[H].[L].&[1] })",
        # arithmetic instead of a single measure ref
        "SUM({ [D].[H].[L].&[1] }, [Measures].[X] + 1)",
        # AGGREGATE only takes the set form
        "AGGREGATE(YTD([D].[H]), [Measures].[X])",
        # bad separator
        "SUM({ [D].[H].[L].&[1]; [D].[H].[L].&[2] }, [Measures].[X])",
    ]
    for expr in bad:
        with pytest.raises(MeasureExprError):
            parse_measure_expr(expr)


def test_setagg_validation_errors(spark, sf_dir):
    from olap_xtrctr_spark.query import QueryValidationError

    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    # mixed hierarchies in one set
    with pytest.raises(QueryValidationError, match="share one"):
        eng.execute(parse_mdx(
            "WITH MEMBER [Measures].[Bad] AS "
            "SUM({ [Dim Customer].[Geografía].[Region].&[1], "
            "[Dim Product].[Producto].[Brand].&[x] }, "
            "[Measures].[Sum Quantity]) "
            "SELECT { [Measures].[Bad] } ON COLUMNS, "
            "[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
            "FROM [sales]", "VENTAS_2025"))

    G = "[Dim Customer].[Geografía]"
    tail = (", [Measures].[Sum Quantity]) "
            "SELECT { [Measures].[Bad] } ON COLUMNS, "
            "[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
            "FROM [sales]")
    # duplicate members: the OR-predicate realization counts a fact
    # row once, SSAS SUM over the set would double-count — rejected
    with pytest.raises(QueryValidationError, match="distinct"):
        eng.execute(parse_mdx(
            "WITH MEMBER [Measures].[Bad] AS "
            f"SUM({{ {G}.[Region].&[1], {G}.[Region].&[1] }}"
            + tail, "VENTAS_2025"))
    # ancestor + descendant (mixed depth) overlap the same way
    with pytest.raises(QueryValidationError, match="depth"):
        eng.execute(parse_mdx(
            "WITH MEMBER [Measures].[Bad] AS "
            f"SUM({{ {G}.[Region].&[1], {G}.[Nation].&[1].&[5] }}"
            + tail, "VENTAS_2025"))
    # unknown measure/dimension inside the set-aggregate surface as
    # QueryValidationError like every other MDX typo, not bare KeyError
    with pytest.raises(QueryValidationError, match="unknown measure"):
        eng.execute(parse_mdx(
            "WITH MEMBER [Measures].[Bad] AS "
            f"SUM({{ {G}.[Region].&[1] }}, [Measures].[No Such]) "
            "SELECT { [Measures].[Bad] } ON COLUMNS, "
            "[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
            "FROM [sales]", "VENTAS_2025"))
    with pytest.raises(QueryValidationError,
                       match="unknown dimension"):
        eng.execute(parse_mdx(
            "WITH MEMBER [Measures].[Bad] AS "
            "SUM({ [No Dim].[X].[Y].&[1] }"
            + tail, "VENTAS_2025"))


def test_toppercent_parse_and_negatives():
    from olap_xtrctr_spark.mdx import MdxParseError, build_mdx, parse_mdx

    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "TOPSUM([Dim Customer].[Geografía].[Nation].MEMBERS, 42, "
        "[Measures].[Sum Quantity]) ON ROWS FROM [sales]",
        "VENTAS_2025")
    assert req.toppercent.absolute and req.toppercent.threshold == 42
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req

    req2 = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "BOTTOMPERCENT([Dim Customer].[Geografía].[Nation].MEMBERS, "
        "25, [Measures].[Sum Quantity]) ON ROWS FROM [sales]",
        "VENTAS_2025")
    assert req2.toppercent.bottom and not req2.toppercent.absolute
    assert parse_mdx(build_mdx(req2), "VENTAS_2025") == req2

    bad = [
        # percent out of range
        "TOPPERCENT([D].[H].[L].MEMBERS, 101, [Measures].[X])",
        "TOPPERCENT([D].[H].[L].MEMBERS, 0, [Measures].[X])",
        # non-integer threshold (exact-DECIMAL contract)
        "TOPPERCENT([D].[H].[L].MEMBERS, 12.5, [Measures].[X])",
        # missing args
        "TOPSUM([D].[H].[L].MEMBERS, [Measures].[X])",
    ]
    for rows in bad:
        with pytest.raises(MdxParseError):
            parse_mdx(f"SELECT {{ [Measures].[X] }} ON COLUMNS, "
                      f"{rows} ON ROWS FROM [sales]", "VENTAS_2025")


@settings(deadline=None, max_examples=30)
@given(st.integers(1, 100), st.sampled_from(["TOPPERCENT",
                                             "BOTTOMPERCENT"]))
def test_toppercent_fuzz_thresholds(p, fn):
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx

    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        f"{fn}([Dim Customer].[Geografía].[Nation].MEMBERS, {p}, "
        "[Measures].[Sum Quantity]) ON ROWS FROM [sales]",
        "VENTAS_2025")
    assert req.toppercent.threshold == p
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req


def test_toppercent_minimal_prefix_property(spark, sf_dir):
    """The kept prefix reaches the threshold and is minimal: dropping
    its smallest row goes below the threshold (SSAS TopPercent)."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    top = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "TOPPERCENT([Dim Customer].[Geografía].[Nation].MEMBERS, 50, "
        "[Measures].[Sum Quantity]) ON ROWS FROM [sales]",
        "VENTAS_2025")).collect()
    allr = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[Dim Customer].[Geografía].[Nation].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025")).collect()
    tot = sum(r["sum_quantity"] for r in allr)
    kept = sum(r["sum_quantity"] for r in top)
    assert 0 < len(top) < len(allr)
    assert kept * 100 >= tot * 50
    assert (kept - min(r["sum_quantity"] for r in top)) * 100 \
        < tot * 50


# ---- round-9 wave 2: set operators + DistinctCount measure --------------


def test_set_operators_parse_algebra_and_roundtrip():
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx

    R = "[Dim Customer].[Geografía].[Region]"
    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        f"UNION({{ {R}.&[0], {R}.&[1] }}, {{ {R}.&[1], {R}.&[2] }}) "
        "ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.rows[0].members == [f"{R}.&[0]", f"{R}.&[1]", f"{R}.&[2]"]
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req

    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        f"INTERSECT({{ {R}.&[0], {R}.&[1] }}, {{ {R}.&[1] }}) "
        "ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.rows[0].members == [f"{R}.&[1]"]

    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        f"EXCEPT({{ {R}.&[0], {R}.&[1] }}, {{ {R}.&[1] }}) "
        "ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.rows[0].members == [f"{R}.&[0]"]


def test_set_operators_case_insensitive_membership():
    """Set algebra compares PARSED member identity: [Dim].[Hier].[Level]
    segments case-insensitively (matching the operand hierarchy check),
    &[key] values exactly.  Raw-string sets let UNION duplicate a
    member spelled in different case and EXCEPT miss one."""
    from olap_xtrctr_spark.mdx import build_mdx, parse_mdx

    R = "[Dim Customer].[Geografía].[Region]"
    RLO = "[dim customer].[geografía].[region]"
    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        f"UNION({{ {R}.&[0], {R}.&[1] }}, {{ {RLO}.&[1], {RLO}.&[2] }})"
        " ON ROWS FROM [sales]", "VENTAS_2025")
    # &[1] dedups across spellings; first operand's spelling wins
    assert req.rows[0].members == [f"{R}.&[0]", f"{R}.&[1]",
                                   f"{RLO}.&[2]"]

    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        f"EXCEPT({{ {R}.&[0], {R}.&[1] }}, {{ {RLO}.&[1] }}) "
        "ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.rows[0].members == [f"{R}.&[0]"]

    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        f"INTERSECT({{ {R}.&[1] }}, {{ {RLO}.&[1] }}) "
        "ON ROWS FROM [sales]", "VENTAS_2025")
    assert req.rows[0].members == [f"{R}.&[1]"]

    # key values stay case-SENSITIVE (they are data values)
    E = "[Dim Orders].[Estado].[Estado]"
    with pytest.raises(MdxParseError, match="empty"):
        parse_mdx("SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
                  f"INTERSECT({{ {E}.&[F] }}, {{ {E}.&[f] }}) "
                  "ON ROWS FROM [sales]", "VENTAS_2025")


def test_set_operators_negatives():
    from olap_xtrctr_spark.mdx import parse_mdx

    R = "[Dim Customer].[Geografía].[Region]"
    bad = [
        # empty result
        f"EXCEPT({{ {R}.&[1] }}, {{ {R}.&[1] }})",
        f"INTERSECT({{ {R}.&[1] }}, {{ {R}.&[2] }})",
        # mixed hierarchies
        f"UNION({{ {R}.&[1] }}, {{ [Dim Orders].[Estado].[Estado]"
        f".&[F] }})",
        # non-member operand (level set)
        f"UNION([Dim Customer].[Geografía].[Region].MEMBERS, "
        f"{{ {R}.&[1] }})",
        # arity
        f"UNION({{ {R}.&[1] }})",
    ]
    for rows in bad:
        with pytest.raises(MdxParseError):
            parse_mdx("SELECT { [Measures].[Sum Quantity] } ON COLUMNS,"
                      f" {rows} ON ROWS FROM [sales]", "VENTAS_2025")


def test_distinct_count_measure(spark, sf_dir):
    """DISTINCTCOUNT aggregates exact per-cell distinct keys and is
    never NULL; the global cell equals the table-level distinct."""
    from pyspark.sql import functions as F

    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    per_region = eng.execute(parse_mdx(
        "SELECT { [Measures].[Distinct Orders] } ON COLUMNS, "
        "[Dim Customer].[Geografía].[Region].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025")).collect()
    assert len(per_region) == 5
    assert all(r["distinct_orders"] > 0 for r in per_region)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = li.select(F.countDistinct("l_orderkey")).first()[0]
    got = eng.execute(parse_mdx(
        "SELECT { [Measures].[Distinct Orders] } ON COLUMNS "
        "FROM [sales]", "VENTAS_2025")).first()["distinct_orders"]
    assert got == want
    # regions overlap in orders only if an order spans regions — it
    # cannot (one customer per order), so per-region sums to global
    assert sum(r["distinct_orders"] for r in per_region) == want


def test_set_slicer_or_within_and_across(spark, sf_dir):
    """A brace-wrapped slicer element ORs its members (set-in-slicer);
    distinct hierarchies still AND.  The OR pair equals the sum of the
    two single-member slices."""
    from pyspark.sql import functions as F

    eng = CubeQueryEngine(spark, default_registry(), sf_dir)

    def total(*slicers):
        from olap_xtrctr_spark.query import QueryRequest
        df = eng.execute(QueryRequest(
            "VENTAS_2025", measures=["Total Registros"],
            slicers=list(slicers)))
        return df.first()["total_registros"]

    urgent = total("[Dim Orders].[Prioridad].[Prioridad].&[1-URGENT]")
    high = total("[Dim Orders].[Prioridad].[Prioridad].&[2-HIGH]")
    both = total("[Dim Orders].[Prioridad].[Prioridad].&[1-URGENT]",
                 "[Dim Orders].[Prioridad].[Prioridad].&[2-HIGH]")
    assert both == urgent + high       # OR within one hierarchy

    f_only = total("[Dim Orders].[Estado].[Estado].&[F]")
    mixed = total("[Dim Orders].[Prioridad].[Prioridad].&[1-URGENT]",
                  "[Dim Orders].[Estado].[Estado].&[F]")
    assert mixed < min(urgent, f_only)  # AND across hierarchies

    # MDX brace form parses to the same request
    req = parse_mdx(
        "SELECT { [Measures].[Total Registros] } ON COLUMNS "
        "FROM [sales] WHERE "
        "({ [Dim Orders].[Prioridad].[Prioridad].&[1-URGENT], "
        "[Dim Orders].[Prioridad].[Prioridad].&[2-HIGH] })",
        "VENTAS_2025")
    assert eng.execute(req).first()["total_registros"] == both


def test_toppercent_over_calculated_measure(spark, sf_dir):
    """TOPPERCENT keyed by a CALCULATED measure: the cumulative cut
    resolves through resolve_out (calc alias), and the kept set equals
    the base-measure cut scaled by a constant (monotone key)."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    via_calc = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Qty K] AS "
        "[Measures].[Sum Quantity] / 1000 "
        "SELECT { [Measures].[Qty K] } ON COLUMNS, "
        "TOPPERCENT([Dim Customer].[Geografía].[Nation].MEMBERS, 40, "
        "[Measures].[Qty K]) ON ROWS FROM [sales]",
        "VENTAS_2025")).collect()
    via_base = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "TOPPERCENT([Dim Customer].[Geografía].[Nation].MEMBERS, 40, "
        "[Measures].[Sum Quantity]) ON ROWS FROM [sales]",
        "VENTAS_2025")).collect()
    assert {r["nation"] for r in via_calc} == \
        {r["nation"] for r in via_base}
    assert 0 < len(via_calc) < 25


def test_drillthrough_parse_execute_and_negatives(spark, sf_dir):
    """DRILLTHROUGH returns the fact rows behind the selected cell
    (natural fact columns, predicates pushed); MAXROWS bounds it
    deterministically; set functions/calcs are rejected."""
    from olap_xtrctr_spark.query import QueryValidationError

    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    req = parse_mdx(
        "DRILLTHROUGH SELECT { [Measures].[Sum Quantity] } ON COLUMNS,"
        " { [Dim Customer].[Geografía].[Region].&[2] } ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert req.drillthrough
    from olap_xtrctr_spark.mdx import build_mdx
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req
    df = eng.execute(req)
    assert set(df.columns) >= {"l_orderkey", "l_quantity", "l_shipdate"}
    n_all = df.count()
    assert n_all > 0

    # the drillthrough row count equals the cell's COUNT measure
    cell = eng.execute(parse_mdx(
        "SELECT { [Measures].[Total Registros] } ON COLUMNS, "
        "{ [Dim Customer].[Geografía].[Region].&[2] } ON ROWS "
        "FROM [sales]", "VENTAS_2025")).first()["total_registros"]
    assert n_all == cell

    # MAXROWS: deterministic subset, repeatable across runs
    req_m = parse_mdx(
        "DRILLTHROUGH MAXROWS 7 SELECT { [Measures].[Sum Quantity] } "
        "ON COLUMNS, { [Dim Customer].[Geografía].[Region].&[2] } "
        "ON ROWS FROM [sales]", "VENTAS_2025")
    a = sorted(map(tuple, eng.execute(req_m).collect()))
    b = sorted(map(tuple, eng.execute(req_m).collect()))
    assert len(a) == 7 and a == b

    with pytest.raises(QueryValidationError, match="plain cell"):
        eng.execute(parse_mdx(
            "DRILLTHROUGH SELECT { [Measures].[Sum Quantity] } "
            "ON COLUMNS, TOPCOUNT("
            "[Dim Customer].[Geografía].[Region].MEMBERS, 2, "
            "[Measures].[Sum Quantity]) ON ROWS FROM [sales]",
            "VENTAS_2025"))
    with pytest.raises(MdxParseError):
        parse_mdx("DRILLTHROUGH MAXROWS 0 SELECT { [Measures].[X] } "
                  "ON COLUMNS FROM [sales]", "VENTAS_2025")


def test_subselect_restricts_axis_and_totals(spark, sf_dir):
    """FROM (SELECT {members} ON COLUMNS FROM [cube]): the subselect
    restricts its hierarchy even ON the rows axis (unlike Q10 filters,
    which drop there) and restricts totals (VisualTotals); multiple
    sets AND across hierarchies; round-trips through build_mdx."""
    from olap_xtrctr_spark.mdx import build_mdx

    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    R = "[Dim Customer].[Geografía].[Region]"
    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[Dim Customer].[Geografía].[Region].MEMBERS ON ROWS "
        f"FROM (SELECT {{ {R}.&[1], {R}.&[3] }} ON COLUMNS "
        "FROM [sales])", "VENTAS_2025")
    assert [f.members for f in req.subselects] == \
        [[f"{R}.&[1]", f"{R}.&[3]"]]
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req
    rows = eng.execute(req).collect()
    # rows axis shows ONLY the subselect members
    assert len(rows) == 2

    # restricted global total == sum over the two kept members
    total = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS "
        f"FROM (SELECT {{ {R}.&[1], {R}.&[3] }} ON COLUMNS "
        "FROM [sales])", "VENTAS_2025")).first()["sum_quantity"]
    assert abs(total - sum(r["sum_quantity"] for r in rows)) < 1e-6

    # two sets AND across hierarchies (tuple form)
    E = "[Dim Orders].[Estado].[Estado]"
    both = eng.execute(parse_mdx(
        "SELECT { [Measures].[Total Registros] } ON COLUMNS "
        f"FROM (SELECT ({{ {R}.&[1] }}, {{ {E}.&[F] }}) ON COLUMNS "
        "FROM [sales])", "VENTAS_2025")).first()["total_registros"]
    only_r = eng.execute(parse_mdx(
        "SELECT { [Measures].[Total Registros] } ON COLUMNS "
        f"FROM (SELECT {{ {R}.&[1] }} ON COLUMNS FROM [sales])",
        "VENTAS_2025")).first()["total_registros"]
    assert 0 < both < only_r

    # composes with DRILLTHROUGH (+ RETURN): the restriction becomes a
    # row predicate, so drillthrough row count == the restricted cell
    P = "[Dim Orders].[Prioridad].[Prioridad]"
    dt = eng.execute(parse_mdx(
        "DRILLTHROUGH SELECT { [Measures].[Total Registros] } "
        "ON COLUMNS "
        f"FROM (SELECT ({{ {R}.&[1] }}, {{ {P}.&[1-URGENT] }}) "
        "ON COLUMNS FROM [sales]) RETURN [l_orderkey]", "VENTAS_2025"))
    assert dt.columns == ["l_orderkey"]
    cell = eng.execute(parse_mdx(
        "SELECT { [Measures].[Total Registros] } ON COLUMNS "
        f"FROM (SELECT ({{ {R}.&[1] }}, {{ {P}.&[1-URGENT] }}) "
        "ON COLUMNS FROM [sales])",
        "VENTAS_2025")).first()["total_registros"]
    assert dt.count() == cell > 0

    # negatives: non-member-literal set, nested subselect
    with pytest.raises(MdxParseError, match="member-literal"):
        parse_mdx("SELECT { [Measures].[X] } ON COLUMNS FROM "
                  f"(SELECT {R}.MEMBERS ON COLUMNS FROM [sales])",
                  "VENTAS_2025")
    with pytest.raises(MdxParseError, match="one level deep"):
        parse_mdx("SELECT { [Measures].[X] } ON COLUMNS FROM "
                  f"(SELECT {{ {R}.&[1] }} ON COLUMNS FROM "
                  f"(SELECT {{ {R}.&[1] }} ON COLUMNS FROM [sales]))",
                  "VENTAS_2025")


def test_drillthrough_return_clause(spark, sf_dir):
    """RETURN projects a subset of the natural fact columns:
    [Measures].[X] resolves to the measure's SOURCE column, bracketed
    names are fact columns; duplicates dedup; unknowns and COUNT(*)
    measures are clear errors; parse -> build -> parse round-trips."""
    from olap_xtrctr_spark.mdx import build_mdx
    from olap_xtrctr_spark.query import QueryValidationError

    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    head = ("DRILLTHROUGH MAXROWS 5 SELECT "
            "{ [Measures].[Sum Quantity] } ON COLUMNS, "
            "{ [Dim Customer].[Geografía].[Region].&[2] } ON ROWS "
            "FROM [sales]")
    req = parse_mdx(head + " RETURN [Measures].[Sum Quantity], "
                    "[l_shipdate], [l_quantity]", "VENTAS_2025")
    assert req.return_cols == ["[Measures].[Sum Quantity]",
                               "[l_shipdate]", "[l_quantity]"]
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req
    df = eng.execute(req)
    # Sum Quantity's source column is l_quantity — dedup keeps one
    assert df.columns == ["l_quantity", "l_shipdate"]
    rows = df.collect()
    assert len(rows) == 5
    # deterministic multiset across runs
    assert sorted(map(tuple, rows)) == \
        sorted(map(tuple, eng.execute(req).collect()))

    with pytest.raises(QueryValidationError, match="not a fact column"):
        eng.execute(parse_mdx(head + " RETURN [no_such_col]",
                              "VENTAS_2025"))
    with pytest.raises(QueryValidationError, match="unknown measure"):
        eng.execute(parse_mdx(head + " RETURN [Measures].[No Such]",
                              "VENTAS_2025"))
    with pytest.raises(QueryValidationError, match="no source column"):
        eng.execute(parse_mdx(
            head + " RETURN [Measures].[Total Registros]",
            "VENTAS_2025"))


def test_drillthrough_set_in_slicer_ors(spark, sf_dir):
    """A WHERE set slicer ORs within its hierarchy in DRILLTHROUGH
    exactly as in the aggregate path (parse_mdx flattens the set into
    individual slicer strings; ANDing them returns zero rows for any
    1:1 attribute).  Cross-hierarchy slicers still AND."""
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    P = "[Dim Orders].[Prioridad].[Prioridad]"
    head = ("DRILLTHROUGH SELECT { [Measures].[Sum Quantity] } "
            "ON COLUMNS, { [Dim Customer].[Geografía].[Region].&[2] } "
            "ON ROWS FROM [sales] WHERE ")

    def n(where):
        return eng.execute(parse_mdx(head + where, "VENTAS_2025")).count()

    both = n(f"({{ {P}.&[1-URGENT], {P}.&[2-HIGH] }})")
    urgent = n(f"({P}.&[1-URGENT])")
    high = n(f"({P}.&[2-HIGH])")
    assert urgent > 0 and high > 0
    assert both == urgent + high  # priorities partition the fact rows

    # agrees with the aggregate path's COUNT cell for the same WHERE
    cell = eng.execute(parse_mdx(
        "SELECT { [Measures].[Total Registros] } ON COLUMNS, "
        "{ [Dim Customer].[Geografía].[Region].&[2] } ON ROWS "
        f"FROM [sales] WHERE ({{ {P}.&[1-URGENT], {P}.&[2-HIGH] }})",
        "VENTAS_2025")).first()["total_registros"]
    assert both == cell

    # AND across hierarchies is preserved
    mixed = n(f"({P}.&[1-URGENT], "
              "[Dim Orders].[Estado].[Estado].&[F])")
    assert 0 < mixed < urgent


# ---- set statistics: MEDIAN/MIN/MAX({set}, [Measures].[X]) ----------------

def test_setstat_known_values(spark, sf_dir):
    import duckdb

    G = "[Dim Customer].[Geografía].[Region]"
    rset = "{ " + ", ".join(f"{G}.&[{k}]" for k in range(5)) + " }"
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    df = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Med] AS "
        f"MEDIAN({rset}, [Measures].[Sum Extendedprice]) "
        "MEMBER [Measures].[Lo] AS "
        f"MIN({rset}, [Measures].[Sum Extendedprice]) "
        "MEMBER [Measures].[Hi] AS "
        f"MAX({rset}, [Measures].[Sum Extendedprice]) "
        "SELECT { [Measures].[Med], [Measures].[Lo], [Measures].[Hi] } "
        "ON COLUMNS, [D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    got = {r["anio"]: (r["med"], r["lo"], r["hi"]) for r in df.collect()}
    con = duckdb.connect()
    per = con.execute(f"""
        WITH l AS (SELECT * FROM '{sf_dir}/lineitem.parquet'),
        o AS (SELECT * FROM '{sf_dir}/orders.parquet'),
        c AS (SELECT * FROM '{sf_dir}/customer.parquet'),
        n AS (SELECT * FROM '{sf_dir}/nation.parquet')
        SELECT year(l_shipdate) AS y, n_regionkey AS rk,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                    AS DOUBLE) AS v
        FROM l JOIN o ON l_orderkey = o_orderkey
        JOIN c ON o_custkey = c_custkey
        JOIN n ON c_nationkey = n_nationkey
        GROUP BY 1, 2""").fetchall()
    by_year: dict = {}
    for y, _rk, v in per:
        by_year.setdefault(y, []).append(v)
    for y, vs in by_year.items():
        vs.sort()
        m = len(vs)
        want_med = (vs[(m + 1) // 2 - 1] + vs[(m + 2) // 2 - 1]) / 2.0
        assert got[y] == (want_med, vs[0], vs[-1]), y


def test_setstat_mixed_depth_allowed(spark, sf_dir):
    # an ancestor next to a leaf is legal for statistics (each member
    # evaluates independently) — the setagg double-count rule must NOT
    # fire here; MAX(region 1, one of its nations) == region 1's value
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    df = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Hi] AS "
        "MAX({ [Dim Customer].[Geografía].[Region].&[1], "
        "[Dim Customer].[Geografía].[Region].&[1].&[1] }, "
        "[Measures].[Sum Extendedprice]) "
        "MEMBER [Measures].[Parent] AS "
        "SUM({ [Dim Customer].[Geografía].[Region].&[1] }, "
        "[Measures].[Sum Extendedprice]) "
        "SELECT { [Measures].[Hi], [Measures].[Parent] } ON COLUMNS "
        "FROM [sales]", "VENTAS_2025"))
    row = df.collect()[0]
    assert row["hi"] == row["parent"]


def test_setstat_parse_and_validation_negatives(spark, sf_dir):
    from olap_xtrctr_spark.query import (MeasureExprError,
                                         QueryValidationError,
                                         parse_measure_expr)

    for expr in [
        "MEDIAN(YTD([D].[H]), [Measures].[X])",   # set-literal only
        "MIN({}, [Measures].[X])",
        "MAX({ [D].[H].[L].&[1] }, [Measures].[X] + 1)",
    ]:
        with pytest.raises(MeasureExprError):
            parse_measure_expr(expr)

    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    base = ("WITH MEMBER [Measures].[Bad] AS {expr} "
            "SELECT {{ [Measures].[Bad] }} ON COLUMNS, "
            "[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
            "FROM [sales]")
    G = "[Dim Customer].[Geografía].[Region]"
    cases = [
        (f"MEDIAN({{ {G}.&[1], {G}.&[1] }}, "
         "[Measures].[Sum Quantity])", "distinct"),
        (f"MEDIAN({{ {G}.&[1], [Dim Product].[Producto].[Brand].&[x] }}"
         ", [Measures].[Sum Quantity])", "share one"),
        (f"MEDIAN({{ {G}.&[1] }}, [Measures].[Nope])", "unknown measure"),
    ]
    for expr, msg in cases:
        with pytest.raises(QueryValidationError, match=msg):
            eng.execute(parse_mdx(base.format(expr=expr), "VENTAS_2025"))


def test_setstat_inside_filter_condition(spark, sf_dir):
    """A set statistic used ONLY inside FILTER(set, ...) must still get
    its conditional-aggregate columns (ADVICE r10: the spec maps were
    collected from req.calculated alone, so this raised a raw
    KeyError at execution)."""
    G = "[Dim Customer].[Geografía].[Region]"
    rset = "{ " + ", ".join(f"{G}.&[{k}]" for k in range(5)) + " }"
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    ref = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Lo] AS "
        f"MIN({rset}, [Measures].[Sum Extendedprice]) "
        "SELECT { [Measures].[Sum Extendedprice], [Measures].[Lo] } "
        "ON COLUMNS, [D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    want = sorted(r["anio"] for r in ref.collect()
                  if r["sum_extendedprice"] > 9 * r["lo"])
    filt = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Extendedprice] } ON COLUMNS, "
        "FILTER([D Tiempo].[Calendario].[Año].MEMBERS, "
        "[Measures].[Sum Extendedprice] > "
        f"9 * MIN({rset}, [Measures].[Sum Extendedprice])) ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    assert sorted(r["anio"] for r in filt.collect()) == want
    assert filt.columns == ["anio", "sum_extendedprice"]
    # a set-AGGREGATE ref in FILTER resolves through the same path
    agg = eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Extendedprice] } ON COLUMNS, "
        "FILTER([D Tiempo].[Calendario].[Año].MEMBERS, "
        f"SUM({rset}, [Measures].[Sum Extendedprice]) > 0) ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    assert sorted(r["anio"] for r in agg.collect()) == \
        sorted(r["anio"] for r in ref.collect())


def test_non_empty_tests_calc_cells_when_all_calculated(spark, sf_dir):
    """NON EMPTY on an all-calculated query (no base measure is
    aggregated at all) must test the calculated cells instead of
    silently no-op'ing (ADVICE r10).  The WHERE slicer keeps region 3
    only, so MIN({region 2}, m)'s conditional aggregate is NULL on
    every row: NON EMPTY drops everything."""
    G = "[Dim Customer].[Geografía].[Region]"
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)

    def mdx(ne):
        return ("WITH MEMBER [Measures].[Other] AS "
                f"MIN({{ {G}.&[2] }}, [Measures].[Sum Extendedprice]) "
                "SELECT { [Measures].[Other] } ON COLUMNS, "
                f"{ne}[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
                f"FROM [sales] WHERE ({G}.&[3])")

    kept = eng.execute(parse_mdx(mdx(""), "VENTAS_2025"))
    rows = kept.collect()
    assert len(rows) > 0 and all(r["other"] is None for r in rows)
    dropped = eng.execute(parse_mdx(mdx("NON EMPTY "), "VENTAS_2025"))
    assert dropped.count() == 0


def test_setstat_single_scan_plan(spark, sf_dir):
    # all per-member columns ride ONE fact aggregation: exactly one
    # scan of lineitem in the physical plan
    G = "[Dim Customer].[Geografía].[Region]"
    rset = "{ " + ", ".join(f"{G}.&[{k}]" for k in range(5)) + " }"
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    df = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Med] AS "
        f"MEDIAN({rset}, [Measures].[Sum Extendedprice]) "
        "SELECT { [Measures].[Med] } ON COLUMNS, "
        "[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines()
             if "Scan parquet" in l and "lineitem" in l]
    assert len(scans) == 1, plan


# ---- RANK over the axis set ------------------------------------------------

def test_rank_partitions_by_other_axis(spark, sf_dir):
    # region x priority crossjoin: rank must restart within each region
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    df = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[R] AS "
        "RANK([Dim Orders].[Prioridad].CurrentMember, "
        "[Measures].[Sum Quantity]) "
        "SELECT { [Measures].[Sum Quantity], [Measures].[R] } "
        "ON COLUMNS, CROSSJOIN("
        "[Dim Customer].[Geografía].[Region].MEMBERS, "
        "[Dim Orders].[Prioridad].[Prioridad].MEMBERS) ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    rows = df.collect()
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(
            (r["sum_quantity"], r["r"]))
    for region, cells in by_region.items():
        want = {1}
        cells.sort(key=lambda c: -(c[0] or 0))
        # each region's ranks start at 1 and are rank-with-gaps
        ranks = [c[1] for c in cells]
        assert ranks[0] == 1, (region, cells)
        assert ranks == sorted(ranks), (region, cells)
        del want


def test_rank_ties_share_rank(spark):
    from olap_xtrctr_spark.query import RankRef, parse_measure_expr
    _, refs = parse_measure_expr(
        "RANK([D].[H].CurrentMember, [Measures].[X])")
    markers = [r for r in refs if not isinstance(r, str)]
    assert markers == [("__rank__", "D", "H")]


def test_rank_parse_negatives():
    from olap_xtrctr_spark.query import MeasureExprError, parse_measure_expr
    for expr in [
        "RANK([Measures].[X])",                       # missing member
        "RANK([D].[H], [Measures].[X])",              # no .CurrentMember
        "RANK([D].[H].CurrentMember)",                # missing expr
        "RANK([D].[H].CurrentMember, [Measures].[X]", # unbalanced
    ]:
        with pytest.raises(MeasureExprError):
            parse_measure_expr(expr)


def test_rank_hierarchy_not_on_rows_raises(spark, sf_dir):
    from olap_xtrctr_spark.query import QueryValidationError
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    with pytest.raises(QueryValidationError, match="not on ROWS"):
        eng.execute(parse_mdx(
            "WITH MEMBER [Measures].[R] AS "
            "RANK([Dim Orders].[Prioridad].CurrentMember, "
            "[Measures].[Sum Quantity]) "
            "SELECT { [Measures].[R] } ON COLUMNS, "
            "[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
            "FROM [sales]", "VENTAS_2025"))


# ---- CELL PROPERTIES (SSAS client compat) ----------------------------------

def test_cell_properties_parse_roundtrip_and_execute(spark, sf_dir):
    from olap_xtrctr_spark.mdx import build_mdx
    mdx = ("SELECT { [Measures].[Sum Extendedprice] } ON COLUMNS, "
           "[Dim Customer].[Geografía].[Region].MEMBERS ON ROWS "
           "FROM [sales] "
           "CELL PROPERTIES VALUE, FORMATTED_VALUE, FORMAT_STRING")
    req = parse_mdx(mdx, "VENTAS_2025")
    assert req.cell_properties == ["VALUE", "FORMATTED_VALUE",
                                   "FORMAT_STRING"]
    assert parse_mdx(build_mdx(req), "VENTAS_2025") == req
    # the clause is a no-op on results: same rows as the bare query
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    with_cp = sorted(map(tuple, eng.execute(req).collect()))
    bare = sorted(map(tuple, eng.execute(parse_mdx(
        mdx.split(" CELL PROPERTIES")[0], "VENTAS_2025")).collect()))
    assert with_cp == bare


def test_cell_properties_negatives():
    with pytest.raises(MdxParseError, match="unknown CELL PROPERTIES"):
        parse_mdx(
            "SELECT { [Measures].[X] } ON COLUMNS FROM [sales] "
            "CELL PROPERTIES VALUE, SPARKLE", "VENTAS_2025")
    with pytest.raises(MdxParseError, match="DRILLTHROUGH does not"):
        parse_mdx(
            "DRILLTHROUGH SELECT { [Measures].[X] } ON COLUMNS "
            "FROM [sales] CELL PROPERTIES VALUE", "VENTAS_2025")


def test_cell_properties_where_still_parses():
    req = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[Dim Customer].[Geografía].[Region].MEMBERS ON ROWS "
        "FROM [sales] "
        "WHERE ([Dim Orders].[Prioridad].[Prioridad].&[1-URGENT]) "
        "CELL PROPERTIES VALUE", "VENTAS_2025")
    assert req.cell_properties == ["VALUE"]
    assert req.slicers == [
        "[Dim Orders].[Prioridad].[Prioridad].&[1-URGENT]"]


def test_axis_ordinals_parse_like_names(spark, sf_dir):
    a = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON 0, "
        "[Dim Customer].[Geografía].[Region].MEMBERS ON 1 "
        "FROM [sales]", "VENTAS_2025")
    b = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[Dim Customer].[Geografía].[Region].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert a == b
    c = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON AXIS(0), "
        "[Dim Customer].[Geografía].[Region].MEMBERS ON AXIS(1) "
        "FROM [sales] CELL PROPERTIES VALUE", "VENTAS_2025")
    assert (c.measures, c.rows) == (b.measures, b.rows)
    # ordinals >= 2 stay unsupported with a clear error
    with pytest.raises(MdxParseError, match="unsupported MDX shape"):
        parse_mdx(
            "SELECT { [Measures].[X] } ON 0, [A].[B].[C].MEMBERS ON 1, "
            "[D].[E].[F].MEMBERS ON 2 FROM [sales]", "VENTAS_2025")


# ---- HIERARCHIZE / NONEMPTY client-compat wrappers --------------------------

def test_hierarchize_unwraps_transparently(spark, sf_dir):
    from olap_xtrctr_spark.mdx import build_mdx
    a = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "NON EMPTY HIERARCHIZE(CROSSJOIN("
        "[Dim Customer].[Geografía].[Region].MEMBERS, "
        "[Dim Orders].[Prioridad].[Prioridad].MEMBERS)) ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    b = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "NON EMPTY CROSSJOIN("
        "[Dim Customer].[Geografía].[Region].MEMBERS, "
        "[Dim Orders].[Prioridad].[Prioridad].MEMBERS) ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert a == b
    assert parse_mdx(build_mdx(a), "VENTAS_2025") == a
    with pytest.raises(MdxParseError, match="POST"):
        parse_mdx(
            "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
            "HIERARCHIZE([Dim Customer].[Geografía].[Region].MEMBERS,"
            " POST) ON ROWS FROM [sales]", "VENTAS_2025")


def test_nonempty_function_forms(spark, sf_dir):
    from olap_xtrctr_spark.mdx import build_mdx
    # bare form == NON EMPTY keyword
    a = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "NONEMPTY([Dim Customer].[Geografía].[Region].MEMBERS) ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert a.non_empty is True
    # measure form records the measure and round-trips
    b = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "NONEMPTY([Dim Customer].[Geografía].[Region].MEMBERS, "
        "[Measures].[Sum Extendedprice]) ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert b.non_empty_measures == ["Sum Extendedprice"]
    assert parse_mdx(build_mdx(b), "VENTAS_2025") == b
    # executes; with dense test data it equals the unfiltered rows
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    got = sorted(map(tuple, eng.execute(b).collect()))
    bare = sorted(map(tuple, eng.execute(parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "[Dim Customer].[Geografía].[Region].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025")).collect()))
    assert got == bare


def test_nonempty_filters_calc_measure_nulls(spark, sf_dir):
    # a lag calc is NULL on the first month; NONEMPTY on it drops
    # exactly those axis rows
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    mdx = ("WITH MEMBER [Measures].[Prev] AS "
           "([Measures].[Sum Quantity], "
           "[D Tiempo].[Calendario].PrevMember) "
           "SELECT { [Measures].[Sum Quantity], [Measures].[Prev] } "
           "ON COLUMNS, <SET> ON ROWS FROM [sales]")
    base_set = "[D Tiempo].[Calendario].[Mes].MEMBERS"
    plain = eng.execute(parse_mdx(
        mdx.replace("<SET>", base_set), "VENTAS_2025")).collect()
    ne = eng.execute(parse_mdx(
        mdx.replace("<SET>",
                    f"NONEMPTY({base_set}, [Measures].[Prev])"),
        "VENTAS_2025")).collect()
    n_null = sum(1 for r in plain if r["prev"] is None)
    assert n_null > 0
    assert len(ne) == len(plain) - n_null
    assert all(r["prev"] is not None for r in ne)


def test_addcalculatedmembers_unwraps_like_excel(spark, sf_dir):
    # the exact wrapper stack Excel emits around every pivot axis
    a = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON 0, "
        "NON EMPTY HIERARCHIZE(ADDCALCULATEDMEMBERS("
        "[Dim Customer].[Geografía].[Region].MEMBERS)) ON 1 "
        "FROM [sales] CELL PROPERTIES VALUE, FORMAT_STRING",
        "VENTAS_2025")
    b = parse_mdx(
        "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
        "NON EMPTY [Dim Customer].[Geografía].[Region].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025")
    assert (a.rows, a.measures, a.non_empty) == (
        b.rows, b.measures, b.non_empty)
    with pytest.raises(MdxParseError, match="takes one set"):
        parse_mdx(
            "SELECT { [Measures].[Sum Quantity] } ON COLUMNS, "
            "ADDCALCULATEDMEMBERS([A].[B].[C].MEMBERS, 2) ON ROWS "
            "FROM [sales]", "VENTAS_2025")


def test_setstat_composes_in_arithmetic(spark, sf_dir):
    # the refs parse in unary position, so spread = MAX(...) - MIN(...)
    # composes like any measure arithmetic
    G = "[Dim Customer].[Geografía].[Region]"
    rset = "{ " + ", ".join(f"{G}.&[{k}]" for k in range(5)) + " }"
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    df = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Spread] AS "
        f"MAX({rset}, [Measures].[Sum Extendedprice]) - "
        f"MIN({rset}, [Measures].[Sum Extendedprice]) "
        "MEMBER [Measures].[Hi] AS "
        f"MAX({rset}, [Measures].[Sum Extendedprice]) "
        "MEMBER [Measures].[Lo] AS "
        f"MIN({rset}, [Measures].[Sum Extendedprice]) "
        "SELECT { [Measures].[Spread], [Measures].[Hi], "
        "[Measures].[Lo] } ON COLUMNS, "
        "[D Tiempo].[Calendario].[Año].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    for r in df.collect():
        assert r["spread"] == r["hi"] - r["lo"]
        assert r["spread"] >= 0


def test_rank_over_calculated_measure(spark, sf_dir):
    # RANK's inner expression resolves through the calc chain: a calc
    # declared EARLIER materializes first (DFS order), so ranking by a
    # derived ratio works end-to-end
    eng = CubeQueryEngine(spark, default_registry(), sf_dir)
    df = eng.execute(parse_mdx(
        "WITH MEMBER [Measures].[Avg Price] AS "
        "[Measures].[Sum Extendedprice] / [Measures].[Sum Quantity] "
        "MEMBER [Measures].[Price Rank] AS "
        "RANK([Dim Customer].[Geografía].CurrentMember, "
        "[Measures].[Avg Price]) "
        "SELECT { [Measures].[Avg Price], [Measures].[Price Rank] } "
        "ON COLUMNS, "
        "[Dim Customer].[Geografía].[Nation].MEMBERS ON ROWS "
        "FROM [sales]", "VENTAS_2025"))
    rows = sorted(((r["avg_price"], r["price_rank"])
                   for r in df.collect()), key=lambda x: x[1])
    assert [rk for _, rk in rows] == list(range(1, len(rows) + 1))
    assert [v for v, _ in rows] == sorted((v for v, _ in rows),
                                          reverse=True)


# ---- adversarial near-grammar fuzz (VERDICT r12 task 7) ---------------------
# The parse∘build identity test above covers well-formed requests; this
# strategy mutates VALID queries toward the grammar's edges (unbalanced
# brackets, wrapper misorder, embedded `.&[` inside member keys, every
# ordinal axis spelling, truncations, duplicated spans) and asserts the
# parser's total contract: every outcome is a QueryRequest or a typed
# MdxParseError / QueryValidationError — never a stack trace from a
# stray IndexError/KeyError/RecursionError, and never a silently-wrong
# object of another type.

from olap_xtrctr_spark.query import QueryValidationError

_FUZZ_TEMPLATES = [
    "SELECT {[Measures].[Sum Quantity]} ON COLUMNS FROM [sales]",
    "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, NON EMPTY "
    "{[Dim Customer].[Geografía].[Region].MEMBERS} ON ROWS FROM [sales]",
    "SELECT {[Measures].[Sum Quantity],[Measures].[Total Registros]} "
    "ON 0, {[Dim Customer].[Geografía].[L1].&[3],"
    "[Dim Customer].[Geografía].[L1].&[5]} ON 1 FROM [sales] "
    "WHERE ([Dim Producto].[Producto].[Brand].&[Brand#11])",
    "SELECT NONEMPTY({[Measures].[Sum Quantity]}, "
    "{[Measures].[Sum Quantity]}) ON COLUMNS, "
    "ORDER([Dim Customer].[Geografía].[Nation].MEMBERS, "
    "[Measures].[Sum Quantity], DESC) ON ROWS FROM [sales]",
    "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, "
    "HEAD(CROSSJOIN([Dim Customer].[Geografía].[Region].MEMBERS, "
    "[D Tiempo].[Calendario].[Año].MEMBERS), 5) ON ROWS FROM [sales] "
    "CELL PROPERTIES VALUE, FORMATTED_VALUE",
    "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, "
    "[Dim Customer].[Geografía].[Nation].MEMBERS "
    "DIMENSION PROPERTIES [Region] ON ROWS FROM [sales] MAXROWS 10",
    "SELECT {[Measures].[Sum Quantity]} ON COLUMNS, "
    "[Dim Customer].[Geografía].[L1].&[2].CHILDREN ON ROWS "
    "FROM [sales]",
]

_AXIS_SPELLINGS = st.sampled_from(
    ["ON 0", "ON 1", "ON 2", "ON AXIS(0)", "ON AXIS(1)", "ON AXIS(2)",
     "ON COLUMNS", "ON ROWS", "on columns", "On Rows", "ON COLUMN"])

_CORRUPTIONS = st.sampled_from(
    ["[", "]", "]]", "[[", ".&[", "{", "}", "(", ")", ",", " ",
     "NONEMPTY(", "ORDER(", "HEAD(", "CROSSJOIN(", "DESC",
     ".&[3.&[4]", "&[Brand#[11]", ".CHILDREN", ".ALLMEMBERS",
     "DIMENSION PROPERTIES", "CELL PROPERTIES", "MAXROWS", "MAXROWS 0",
     "WHERE", "FROM", "NON EMPTY", "SELECT", ".&[Región#3]"])


@st.composite
def _near_grammar_mdx(draw):
    s = draw(st.sampled_from(_FUZZ_TEMPLATES))
    for _ in range(draw(st.integers(0, 4))):
        op = draw(st.sampled_from(
            ["insert", "delete", "dup", "axis", "truncate"]))
        i = draw(st.integers(0, max(0, len(s) - 1)))
        if op == "insert":
            s = s[:i] + draw(_CORRUPTIONS) + s[i:]
        elif op == "delete":
            j = min(len(s), i + draw(st.integers(1, 10)))
            s = s[:i] + s[j:]
        elif op == "dup":
            j = min(len(s), i + draw(st.integers(1, 10)))
            s = s[:i] + s[i:j] + s[i:j] + s[j:]
        elif op == "truncate":
            s = s[:max(1, i)]
        else:
            for a in ("ON COLUMNS", "ON ROWS", "ON 0", "ON 1"):
                if a in s:
                    s = s.replace(a, draw(_AXIS_SPELLINGS), 1)
                    break
    return s


@given(_near_grammar_mdx())
@settings(max_examples=500, deadline=None)
def test_parse_mdx_adversarial_total(mdx):
    from olap_xtrctr_spark.query import QueryRequest
    try:
        req = parse_mdx(mdx, "VENTAS_2025")
    except (MdxParseError, QueryValidationError):
        return                      # the typed refusal contract
    assert isinstance(req, QueryRequest)
