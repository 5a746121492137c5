"""DDL / catalog behavior, ported from reference test/sql/create_pg/*."""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQBinderError, PGQSession

from .conftest import rows


@pytest.fixture()
def session(spark):
    spark.createDataFrame([Row(id=1, name="x")], "id long, name string").createOrReplaceTempView(
        "cat_v"
    )
    spark.createDataFrame([Row(a=1, b=1)], "a long, b long").createOrReplaceTempView("cat_e")
    return PGQSession(spark)


DDL = """CREATE PROPERTY GRAPH catpg
VERTEX TABLES ( cat_v LABEL V )
EDGE TABLES ( cat_e SOURCE KEY (a) REFERENCES cat_v (id)
              DESTINATION KEY (b) REFERENCES cat_v (id) LABEL E )"""


def test_create_and_conflicts(session):
    assert session.execute(DDL).collect()[0]["Success"]
    # duplicate fails (create_property_graph.cpp conflict handling)
    with pytest.raises(PGQBinderError):
        session.execute(DDL)
    # IF NOT EXISTS is a no-op; OR REPLACE succeeds
    session.execute(DDL.replace("PROPERTY GRAPH catpg", "PROPERTY GRAPH IF NOT EXISTS catpg"))
    session.execute(DDL.replace("CREATE PROPERTY", "CREATE OR REPLACE PROPERTY"))
    assert session.catalog.names() == ["catpg"]


def test_drop(session):
    session.execute(DDL.replace("catpg", "catpg2"))
    session.execute("DROP PROPERTY GRAPH catpg2")
    with pytest.raises(PGQBinderError):
        session.execute("DROP PROPERTY GRAPH catpg2")
    session.execute("DROP PROPERTY GRAPH IF EXISTS catpg2")  # no error


def test_validation_errors(session):
    # unknown table (create_property_graph.cpp:57-103 analog)
    with pytest.raises(PGQBinderError):
        session.execute(
            """CREATE PROPERTY GRAPH bad1 VERTEX TABLES ( no_such_table LABEL V )"""
        )
    # unknown property column
    with pytest.raises(PGQBinderError):
        session.execute(
            """CREATE PROPERTY GRAPH bad2
               VERTEX TABLES ( cat_v PROPERTIES (nope) LABEL V )"""
        )
    # edge referencing unregistered vertex table
    with pytest.raises(PGQBinderError):
        session.execute(
            """CREATE PROPERTY GRAPH bad3
               VERTEX TABLES ( cat_v LABEL V )
               EDGE TABLES ( cat_e SOURCE KEY (a) REFERENCES other_v (id)
                             DESTINATION KEY (b) REFERENCES cat_v (id) LABEL E )"""
        )
    # duplicate label
    with pytest.raises(PGQBinderError):
        session.execute(
            """CREATE PROPERTY GRAPH bad4
               VERTEX TABLES ( cat_v LABEL Dup, cat_v AS c2 LABEL Dup )"""
        )


def test_persistence_roundtrip(spark, tmp_path):
    path = str(tmp_path / "pgq_catalog")
    spark.createDataFrame([Row(id=1)], "id long").createOrReplaceTempView("persist_v")
    s1 = PGQSession(spark, catalog_path=path)
    s1.execute(
        "CREATE PROPERTY GRAPH persisted VERTEX TABLES ( persist_v LABEL PV )"
    )
    # a brand-new session reloads from disk (reference __duckpgq_internal
    # reload, duckpgq_state.cpp:34-160)
    s2 = PGQSession(spark, catalog_path=path)
    pg = s2.graph("persisted")
    assert pg.vertex_tables[0].main_label == "PV"
    s2.execute("DROP PROPERTY GRAPH persisted")
    s3 = PGQSession(spark, catalog_path=path)
    with pytest.raises(PGQBinderError):
        s3.graph("persisted")


def test_describe_and_show(session):
    session.execute(DDL.replace("catpg", "catpg3"))
    d = session.describe_property_graph("catpg3")
    got = {r["table_name"]: r for r in d.collect()}
    assert got["cat_e"]["source_fk"] == ["a"]
    assert got["cat_v"]["is_vertex_table"]
    # reference 14-column shape (describe_property_graph.cpp:34-61):
    # property_graph leads, catalog/schema trail
    assert d.columns == [
        "property_graph", "table_name", "label", "is_vertex_table",
        "source_table", "source_pk", "source_fk", "destination_table",
        "destination_pk", "destination_fk", "discriminator", "sub_labels",
        "catalog", "schema",
    ]
    assert got["cat_v"]["property_graph"] == "catpg3"
    assert got["cat_v"]["catalog"] is None and got["cat_v"]["schema"] == ""
    names = [r["property_graph"] for r in session.show_property_graphs().collect()]
    assert "catpg3" in names


def test_graph_table_in_cte_and_multiple(pgq):
    # CTE + two GRAPH_TABLEs in one statement (with_clause.test,
    # multiple_graph_table.test analogs)
    df = pgq.sql(
        """
        WITH g1 AS (
          SELECT * FROM GRAPH_TABLE (pg
            MATCH (a:Person)-[k:Knows]->(b:Person)
            COLUMNS (a.name AS an, b.name AS bn)) t1
        ),
        g2 AS (
          SELECT * FROM GRAPH_TABLE (pg
            MATCH (x:Person)-[s:StudyAt]->(y:School)
            COLUMNS (x.name AS xn, y.name AS yn)) t2
        )
        SELECT g1.an, g1.bn, g2.yn
        FROM g1 JOIN g2 ON g1.an = g2.xn
        ORDER BY g1.an, g1.bn, g2.yn
        """
    )
    got = rows(df, sort=False)
    assert len(got) == 8  # every knows-edge joined with the source's school
    assert got[0] == ("Daniel", "Gabor", "VU")


def test_schema_qualified_tables(spark):
    """211_using_other_schemas.test analog: db-qualified table names in DDL."""
    from pyspark.sql import Row

    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS otherdb")
    for t in ("sv", "se"):
        spark.sql(f"DROP TABLE IF EXISTS otherdb.{t}")
        shutil.rmtree(f"spark-warehouse/otherdb.db/{t}", ignore_errors=True)
    spark.createDataFrame(
        [Row(id=1, name="x"), Row(id=2, name="y")], "id long, name string"
    ).write.mode("overwrite").saveAsTable("otherdb.sv")
    spark.createDataFrame([Row(a=1, b=2)], "a long, b long").write.mode(
        "overwrite"
    ).saveAsTable("otherdb.se")
    s = PGQSession(spark)
    s.execute(
        """CREATE OR REPLACE PROPERTY GRAPH sgq
           VERTEX TABLES ( otherdb.sv LABEL V )
           EDGE TABLES ( otherdb.se SOURCE KEY (a) REFERENCES otherdb.sv (id)
                         DESTINATION KEY (b) REFERENCES otherdb.sv (id) LABEL E )"""
    )
    df = s.graph_table("sgq MATCH (x:V)-[e:E]->(y:V) COLUMNS (x.name AS xn, y.name AS yn)")
    assert rows(df) == [("x", "y")]


def test_nested_and_unnamed_subqueries(pgq):
    # nested_subquery.test / unnamed_subquery.test analogs
    df = pgq.sql(
        """
        SELECT id, nested_friend_id
        FROM (
            SELECT id, friend_id AS nested_friend_id
            FROM (
                SELECT id, friend_id
                FROM GRAPH_TABLE (
                    pg MATCH (p:Person)-[k:Knows]->(p2:Person)
                    COLUMNS (p.id as id, p2.id as friend_id)
                )
            )
        ) WHERE id > 1
        """
    )
    assert df.count() == 3  # edges (2,3), (3,0), (4,3)
    joined = pgq.sql(
        """
        SELECT Student.name, friend_id
        FROM Student
        JOIN (
            SELECT student_id, friend_id
            FROM GRAPH_TABLE (
                pg MATCH (p:Person)-[k:Knows]->(p2:Person)
                COLUMNS (p.id as student_id, p2.id as friend_id)
            ) graph
        ) AS subquery
        ON Student.id = subquery.student_id
        """
    )
    assert joined.count() == 8


def test_ctas_over_graph_table(pgq, spark):
    pgq.sql(
        """
        CREATE OR REPLACE TEMP VIEW knows_pairs AS
        SELECT * FROM GRAPH_TABLE (pg
          MATCH (a:Person)-[k:Knows]->(b:Person)
          COLUMNS (a.id AS a_id, b.id AS b_id)) t
        """
    )
    assert spark.table("knows_pairs").count() == 8


def test_graph_table_under_insert_into(spark, pgq):
    """GRAPH_TABLE inside INSERT INTO ... SELECT (copy_to_duckpgq.test:69-77
    inserts a GRAPH_TABLE result into an existing table) and the IS-label
    spelling through the SQL frontend."""
    spark.sql("DROP TABLE IF EXISTS ins_result_t")
    spark.sql("CREATE TABLE ins_result_t (an STRING, bn STRING) USING parquet")
    try:
        pgq.sql(
            """INSERT INTO ins_result_t
               SELECT * FROM GRAPH_TABLE (pg
                 MATCH (a IS Person)-[k is Knows]->(b is Person)
                 WHERE a.name = 'Daniel'
                 COLUMNS (a.name AS an, b.name AS bn)) t"""
        )
        got = sorted(map(tuple, spark.table("ins_result_t").collect()))
        assert got == [("Daniel", "Gabor"), ("Daniel", "Peter"), ("Daniel", "Tavneet")]
    finally:
        spark.sql("DROP TABLE IF EXISTS ins_result_t")


def test_if_not_exists_keeps_original_definition(session, spark):
    """Reference create_if_not_exists.test: IF NOT EXISTS on an existing
    graph is a FULL no-op — the original definition (vertex-table count)
    survives even when the new DDL differs."""
    spark.createDataFrame([Row(id=1)], "id long").createOrReplaceTempView("ine_v2")
    session.execute("""CREATE PROPERTY GRAPH inepg
        VERTEX TABLES ( cat_v LABEL V, ine_v2 LABEL V2 )
        EDGE TABLES ( cat_e SOURCE KEY (a) REFERENCES cat_v (id)
                      DESTINATION KEY (b) REFERENCES cat_v (id) LABEL E )""")
    # a DIFFERENT single-vertex-table definition must not replace it
    session.execute("""CREATE PROPERTY GRAPH IF NOT EXISTS inepg
        VERTEX TABLES ( cat_v LABEL V )
        EDGE TABLES ( cat_e SOURCE KEY (a) REFERENCES cat_v (id)
                      DESTINATION KEY (b) REFERENCES cat_v (id) LABEL E )""")
    pg = session.graph("inepg")
    assert len(pg.vertex_tables) == 2
    session.execute("DROP PROPERTY GRAPH inepg")


def test_query_after_drop_errors(session):
    """Reference drop_property_graph.test: GRAPH_TABLE over a dropped
    graph reports the does-not-exist binder error."""
    session.execute(DDL.replace("catpg", "catpg4"))
    session.execute("DROP PROPERTY GRAPH catpg4")
    with pytest.raises(PGQBinderError, match="does not exist"):
        session.sql(
            "SELECT * FROM GRAPH_TABLE (catpg4 MATCH (a:V) COLUMNS (a.id)) t"
        ).collect()
