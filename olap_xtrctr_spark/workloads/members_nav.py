"""Member-navigation workload entries (SURVEY §2.3).

Entry builders moved VERBATIM from ``workload.py`` (round-6 split);
build order inside this module is unchanged.
"""
from __future__ import annotations

from .. import members as M
from ..workload_shared import (_MEMBERS_CTE, _members)


def register(add) -> None:
    # ================= member navigation (SURVEY §2.3) ====================

    add("members_nation_list",
        lambda spark, sf: M.get_dimension_members(
            _members(spark, sf), "Dim Customer",
            "Dim Customer.Geografía", "Nation"),
        _MEMBERS_CTE + """
        SELECT MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME
        FROM members
        WHERE DIMENSION = 'Dim Customer'
          AND JERARQUIA = 'Dim Customer.Geografía'
          AND NIVEL_NOMBRE = 'Nation'
          AND MIEMBRO_CAPTION <> 'All'""")

    # old-cube path: level located via depth inference; inferred names are
    # 'Nivel N' for unnamed depths (reference N6) — Nation sits at depth 2
    add("members_depth_filter",
        lambda spark, sf: M.get_dimension_members(
            _members(spark, sf), "Dim Customer",
            "Dim Customer.Geografía", "Nivel 2", use_depth=True),
        _MEMBERS_CTE + """
        SELECT MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME
        FROM members
        WHERE DIMENSION = 'Dim Customer'
          AND JERARQUIA = 'Dim Customer.Geografía'
          AND (length(MIEMBRO_UNIQUE_NAME)
               - length(replace(MIEMBRO_UNIQUE_NAME, '.&[', ''))) / 3 = 2
          AND MIEMBRO_CAPTION <> 'All'""")

    add("members_search",
        lambda spark, sf: M.search_members(
            _members(spark, sf), "EUROPE", dimension="Dim Customer"),
        _MEMBERS_CTE + """
        SELECT DIMENSION, JERARQUIA, NIVEL_NOMBRE,
               MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME
        FROM members
        WHERE upper(MIEMBRO_CAPTION) LIKE '%EUROPE%'
          AND MIEMBRO_CAPTION <> 'All'
          AND DIMENSION = 'Dim Customer'""")

    # N17 tokenized full-text search: multi-term AND, order-independent
    # ("east middle" finds UNITED STATES; substring contains cannot)
    add("members_fulltext_search",
        lambda spark, sf: M.fulltext_search_members(
            _members(spark, sf), "east middle"),
        _MEMBERS_CTE + """
        SELECT DIMENSION, JERARQUIA, NIVEL_NOMBRE,
               MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME
        FROM members
        WHERE MIEMBRO_CAPTION <> 'All'
          AND list_has_all(
                regexp_split_to_array(trim(translate(lower(
                  MIEMBRO_CAPTION), 'áéíóúñü', 'aeiounu')), '[^a-z0-9]+'),
                ['east', 'middle'])""")

    # N17 stemmed variant: both sides pass through the shared Spanish
    # suffix stripper (members.ES_STEM_PATTERN — same regex in Spark's
    # Java engine, Python re, and DuckDB's RE2), so the plural query
    # 'blue widgets' finds the singular caption 'blue widget', matching
    # the reference's to_tsvector('spanish') lexeme behavior.
    add("members_fulltext_stemmed",
        lambda spark, sf: M.fulltext_search_members(
            _members(spark, sf), "blue widgets", stem=True),
        _MEMBERS_CTE + f"""
        SELECT DIMENSION, JERARQUIA, NIVEL_NOMBRE,
               MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME
        FROM members
        WHERE MIEMBRO_CAPTION <> 'All'
          AND list_has_all(
                list_transform(
                  regexp_split_to_array(trim(translate(lower(
                    MIEMBRO_CAPTION), 'áéíóúñü', 'aeiounu')), '[^a-z0-9]+'),
                  t -> regexp_replace(t, '{M.ES_STEM_PATTERN}', '\\1')),
                ['blue', 'widget'])""")

    add("members_children_exact",
        lambda spark, sf: M.children_of(
            _members(spark, sf),
            ["[Dim Customer].[Geografía].[Region].&[2]"]),
        _MEMBERS_CTE + """
        SELECT MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME, PARENT_UNIQUE_NAME
        FROM members
        WHERE PARENT_UNIQUE_NAME = '[Dim Customer].[Geografía].[Region].&[2]'
          AND MIEMBRO_CAPTION <> 'All'""")

    add("members_children_prefix",
        lambda spark, sf: M.children_of(
            _members(spark, sf),
            ["[Dim Customer].[Geografía].[Region].&[2]"],
            prefix_fallback=True),
        _MEMBERS_CTE + """
        SELECT MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME, PARENT_UNIQUE_NAME
        FROM members
        WHERE starts_with(MIEMBRO_UNIQUE_NAME,
                          '[Dim Customer].[Geografía].[Region].&[2]')
          AND MIEMBRO_UNIQUE_NAME <> '[Dim Customer].[Geografía].[Region].&[2]'
          AND MIEMBRO_CAPTION <> 'All'""")

    add("members_apartados",
        lambda spark, sf: M.get_apartados(_members(spark, sf)),
        _MEMBERS_CTE + """
        SELECT MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME, CHILDREN_CARDINALITY
        FROM members
        WHERE upper(JERARQUIA) LIKE '%APARTADO%'
          AND MIEMBRO_CAPTION <> 'All'
          AND NIVEL_NOMBRE = 'Apartado'""")

    add("members_variables_of_apartados",
        lambda spark, sf: M.children_of(
            _members(spark, sf),
            ["[DIM VARIABLES2025].[Apartado y Variable].[Apartado].&[Brand#11]",
             "[DIM VARIABLES2025].[Apartado y Variable].[Apartado].&[Brand#12]"]),
        _MEMBERS_CTE + """
        SELECT MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME, PARENT_UNIQUE_NAME
        FROM members
        WHERE PARENT_UNIQUE_NAME IN (
            '[DIM VARIABLES2025].[Apartado y Variable].[Apartado].&[Brand#11]',
            '[DIM VARIABLES2025].[Apartado y Variable].[Apartado].&[Brand#12]')
          AND MIEMBRO_CAPTION <> 'All'""")

    add("members_ordinal_sort",
        lambda spark, sf: M.members_sorted(
            _members(spark, sf), "D Tiempo", "D Tiempo.Calendario", "Mes"),
        _MEMBERS_CTE + """
        SELECT MIEMBRO_CAPTION, MIEMBRO_ORDINAL,
               CAST(ROW_NUMBER() OVER (ORDER BY
                   coalesce(CAST(MIEMBRO_ORDINAL AS BIGINT),
                            TRY_CAST(MIEMBRO_KEY AS BIGINT)) NULLS LAST,
                   MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME) AS INTEGER) AS rn
        FROM members
        WHERE DIMENSION = 'D Tiempo'
          AND JERARQUIA = 'D Tiempo.Calendario'
          AND NIVEL_NOMBRE = 'Mes'
          AND MIEMBRO_CAPTION <> 'All'""")

    add("members_pagination",
        lambda spark, sf: M.paginate_members(
            _members(spark, sf), "Dim Customer", "Dim Customer.Geografía",
            "Nation", limit=10, offset=10),
        _MEMBERS_CTE + """
        SELECT rn, MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME FROM (
          SELECT CAST(ROW_NUMBER() OVER (
                   ORDER BY MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME) AS INTEGER) AS rn,
                 MIEMBRO_CAPTION, MIEMBRO_UNIQUE_NAME
          FROM members
          WHERE DIMENSION = 'Dim Customer'
            AND JERARQUIA = 'Dim Customer.Geografía'
            AND NIVEL_NOMBRE = 'Nation'
            AND MIEMBRO_CAPTION <> 'All')
        WHERE rn > 10 AND rn <= 20""")

    def members_full(spark, sf):
        from ..normalized import normalize_members, v_members_full
        return v_members_full(normalize_members(_members(spark, sf)))

    # J1: normalized 5-table snapshot reconstructed through the FK join
    # chain (reference v_members_full, 001_initial_schema.sql:95-116);
    # round-trip must reproduce the denormalized members projection
    add("members_full_view", members_full,
        _MEMBERS_CTE + """
        SELECT CATALOGO AS catalog_code,
               DIMENSION AS dimension_name,
               JERARQUIA AS hierarchy_name,
               NIVEL_NOMBRE AS level_name,
               NIVEL_NUMERO AS level_number,
               MIEMBRO_CAPTION AS member_caption,
               MIEMBRO_UNIQUE_NAME AS member_unique_name,
               PARENT_UNIQUE_NAME AS parent_unique_name,
               CHILDREN_CARDINALITY AS children_cardinality
        FROM members""")

    add("members_level_cardinalities",
        lambda spark, sf: M.level_cardinalities(_members(spark, sf)),
        _MEMBERS_CTE + """
        SELECT DIMENSION, JERARQUIA, NIVEL_NOMBRE, COUNT(*) AS n_members
        FROM members
        WHERE MIEMBRO_CAPTION <> 'All'
        GROUP BY 1, 2, 3""")
