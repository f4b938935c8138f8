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
        spark, "SELECT * FROM $system.MDSCHEMA_MEASURES").count() == 5
    with pytest.raises(MdxParseError):
        execute_dmv(spark, "SELECT * FROM $system.NOPE_ROWSET")
    with pytest.raises(MdxParseError):
        execute_dmv(spark, "DELETE FROM $system.MDSCHEMA_CUBES")
