"""Ports of the remaining create_pg / SQL reference tests:

- except_properties.test   — PROPERTIES [ARE] ALL COLUMNS EXCEPT (...)
- no_properties.test       — NO PROPERTIES; unregistered-property errors
- 209_property_undefined.test — implicit all-columns properties,
  case-insensitive refs, never-registered error
- optional_edge_table_clause.test — graphs with no EDGE TABLES clause
- non_existing_table.test  — unknown label / unknown graph binder errors
- with_statement_duckpgq.test — WITH + GRAPH_TABLE + comma-joined CTE

Not ported, by design: create_pg_on_view.test (the reference REJECTS
views; every Spark relation is a view, so the restriction has no analog),
wcc_segfault.test (fully commented out in the reference).
"""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQSession
from duckpgq_extension_spark.errors import PGQBinderError

from .conftest import rows


@pytest.fixture(scope="session")
def ddl_pg(spark):
    spark.createDataFrame(
        [Row(id=i, name=n) for i, n in enumerate(["Daniel", "Tavneet", "Gabor", "Peter"])],
        "id long, name string",
    ).createOrReplaceTempView("ddl_student")
    spark.createDataFrame(
        [Row(src=s, dst=d, createDate=c) for s, d, c in
         [(0, 1, 10), (0, 2, 11), (0, 3, 12), (1, 2, 14), (1, 3, 15), (2, 3, 16)]],
        "src long, dst long, createDate long",
    ).createOrReplaceTempView("ddl_know")
    spark.createDataFrame(
        [Row(school_name="VU", school_id=0, school_kind=1),
         Row(school_name="UvA", school_id=1, school_kind=2)],
        "school_name string, school_id long, school_kind long",
    ).createOrReplaceTempView("ddl_school")
    return PGQSession(spark)


def test_properties_are_all_columns_except(ddl_pg):
    """except_properties.test:26-37 — both EXCEPT spellings; the excluded
    column is not a property."""
    for spelling in ("PROPERTIES ARE ALL COLUMNS EXCEPT", "PROPERTIES ALL COLUMNS EXCEPT"):
        ddl_pg.execute(
            f"""CREATE OR REPLACE PROPERTY GRAPH ddl_ex
                VERTEX TABLES (
                    ddl_student LABEL Person,
                    ddl_school {spelling} (school_id)
                        LABEL School IN School_kind (Hogeschool, University)
                )
                EDGE TABLES (
                    ddl_know SOURCE KEY (src) REFERENCES ddl_student (id)
                             DESTINATION KEY (dst) REFERENCES ddl_student (id)
                             LABEL Knows
                )"""
        )
        got = rows(ddl_pg.graph_table(
            "ddl_ex MATCH (s:School) COLUMNS (s.school_name AS nm)"
        ).orderBy("nm"))
        assert got == [("UvA",), ("VU",)]
        with pytest.raises(PGQBinderError, match="never registered"):
            ddl_pg.graph_table("ddl_ex MATCH (s:School) COLUMNS (s.school_id AS x)")


def test_no_properties(ddl_pg):
    """no_properties.test:28-38 — NO PROPERTIES registers nothing."""
    ddl_pg.execute(
        """CREATE OR REPLACE PROPERTY GRAPH ddl_np
           VERTEX TABLES (
               ddl_student LABEL Person,
               ddl_school NO PROPERTIES LABEL School IN School_kind (Hogeschool, University)
           )
           EDGE TABLES (
               ddl_know SOURCE KEY (src) REFERENCES ddl_student (id)
                        DESTINATION KEY (dst) REFERENCES ddl_student (id)
                        LABEL Knows
           )"""
    )
    with pytest.raises(PGQBinderError, match="never registered"):
        ddl_pg.graph_table("ddl_np MATCH (s:School) COLUMNS (s.school_name AS x)")


def test_property_subset_unregistered_error(ddl_pg):
    """no_properties.test:40-48 — querying a column outside PROPERTIES."""
    ddl_pg.execute(
        "CREATE OR REPLACE PROPERTY GRAPH ddl_sub VERTEX TABLES (ddl_student PROPERTIES (id))"
    )
    got = rows(ddl_pg.graph_table("ddl_sub MATCH (s:ddl_student) COLUMNS (s.id) ").orderBy("id"))
    assert got == [(0,), (1,), (2,), (3,)]
    with pytest.raises(PGQBinderError, match="never registered"):
        ddl_pg.graph_table("ddl_sub MATCH (s:ddl_student) COLUMNS (s.id, s.name)")


def test_implicit_all_columns_and_case_insensitive_refs(ddl_pg):
    """209_property_undefined.test — a bare vertex table registers all its
    columns; property refs are case-insensitive; unknown property errors."""
    ddl_pg.execute(
        """CREATE OR REPLACE PROPERTY GRAPH ddl_209
           VERTEX TABLES ( ddl_student )
           EDGE TABLES (
               ddl_know SOURCE KEY (src) REFERENCES ddl_student (id)
                        DESTINATION KEY (dst) REFERENCES ddl_student (id)
                        LABEL Knows
           )"""
    )
    got = rows(ddl_pg.graph_table(
        """ddl_209 MATCH (a:ddl_student WHERE a.name = 'Daniel')-[k:Knows]->(b:ddl_student)
           COLUMNS (b.NAME AS nm)"""
    ).orderBy("nm"))
    assert got == [("Gabor",), ("Peter",), ("Tavneet",)]
    with pytest.raises(PGQBinderError, match="never registered"):
        ddl_pg.graph_table(
            """ddl_209 MATCH (a:ddl_student)-[k:Knows]->(b:ddl_student)
               COLUMNS (b.nonregisteredproperty AS x)"""
        )


def test_vertex_only_graph(ddl_pg):
    """optional_edge_table_clause.test — EDGE TABLES clause omitted."""
    ddl_pg.execute("CREATE OR REPLACE PROPERTY GRAPH ddl_vonly VERTEX TABLES (ddl_student, ddl_school)")
    assert ddl_pg.graph_table("ddl_vonly MATCH (m:ddl_student) COLUMNS (m.id AS i)").count() == 4
    with pytest.raises(PGQBinderError, match="not registered"):
        ddl_pg.graph_table(
            "ddl_vonly MATCH (p:ddl_student)-[k:Knows]->(q:ddl_student) COLUMNS (p.id AS x)"
        )


def test_unknown_label_and_graph_errors(ddl_pg):
    """non_existing_table.test:43-58 parity."""
    ddl_pg.execute("CREATE OR REPLACE PROPERTY GRAPH ddl_err VERTEX TABLES (ddl_student)")
    with pytest.raises(PGQBinderError, match="not registered"):
        ddl_pg.graph_table("ddl_err MATCH (a:Kind) COLUMNS (a.id AS x)")
    with pytest.raises(PGQBinderError, match="does not exist"):
        ddl_pg.graph_table("abc_does_not_exist MATCH (a:Kind) COLUMNS (a.id AS x)")


def test_with_statement_joined_cte(ddl_pg):
    """with_statement_duckpgq.test — WITH CTE + GRAPH_TABLE comma-joined,
    grouped aggregation over graph columns and the CTE scalar."""
    ddl_pg.execute(
        """CREATE OR REPLACE PROPERTY GRAPH ddl_with
           VERTEX TABLES ( ddl_student )
           EDGE TABLES (
               ddl_know SOURCE KEY (src) REFERENCES ddl_student (id)
                        DESTINATION KEY (dst) REFERENCES ddl_student (id)
                        LABEL Knows
           )"""
    )
    got = rows(ddl_pg.sql(
        """WITH edge_count AS (
               SELECT count(*) AS e_count FROM ddl_know
           )
           SELECT src_id, count(*) AS n, count(*) / ec.e_count AS frac
           FROM GRAPH_TABLE(ddl_with
               MATCH (a:ddl_student)-[k:Knows]->(b:ddl_student)
               COLUMNS (a.id AS src_id)
           ) tmp, edge_count ec
           GROUP BY src_id, ec.e_count
           ORDER BY src_id"""
    ))
    assert got == [(0, 3, 0.5), (1, 2, pytest.approx(2 / 6)), (2, 1, pytest.approx(1 / 6))]


def test_or_replace_makes_new_label_visible(spark, ddl_pg):
    """Port of create_or_replace_pg.test: querying a label that is not in
    the graph is a binder error; CREATE OR REPLACE with an inheritance
    typemask registers it, and the same query then succeeds
    (/root/reference/test/sql/create_pg/create_or_replace_pg.test:24-46)."""
    # kind is the inheritance bitmask column: bit 0 = company, bit 1 = university
    spark.createDataFrame(
        [Row(id=0, kind=1), Row(id=1, kind=2)],
        "id long, kind long",
    ).createOrReplaceTempView("ddl_org")
    spark.createDataFrame(
        [Row(pid=0, oid=1), Row(pid=1, oid=1), Row(pid=2, oid=0)],
        "pid long, oid long",
    ).createOrReplaceTempView("ddl_workat")
    ddl_pg.execute(
        """CREATE OR REPLACE PROPERTY GRAPH ddl_rep
           VERTEX TABLES (ddl_student LABEL Person)
           EDGE TABLES (ddl_know SOURCE KEY (src) REFERENCES ddl_student (id)
                        DESTINATION KEY (dst) REFERENCES ddl_student (id) LABEL Knows)"""
    )
    q = ("SELECT * FROM GRAPH_TABLE (ddl_rep MATCH "
         "(a:Person)-[w:workAt]->(u:University) COLUMNS (a.id AS aid)) t")
    with pytest.raises(PGQBinderError, match="University"):
        ddl_pg.sql(q)
    ddl_pg.execute(
        """CREATE OR REPLACE PROPERTY GRAPH ddl_rep
           VERTEX TABLES (
               ddl_student LABEL Person,
               ddl_org LABEL Organisation IN kind (company, university))
           EDGE TABLES (
               ddl_know SOURCE KEY (src) REFERENCES ddl_student (id)
                        DESTINATION KEY (dst) REFERENCES ddl_student (id) LABEL Knows,
               ddl_workat SOURCE KEY (pid) REFERENCES ddl_student (id)
                          DESTINATION KEY (oid) REFERENCES ddl_org (id) LABEL workAt)"""
    )
    got = ddl_pg.sql(q).collect()
    # persons 0 and 1 work at org 1 (university)
    assert sorted(r["aid"] for r in got) == [0, 1]
