"""Edge-integrity guard + metadata accessors + SQL-integration extras."""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQConstraintError, PGQSession

from .conftest import rows


@pytest.fixture()
def dirty(spark):
    """non-unique-vertices.test fixture: duplicate vertex key 'b'."""
    spark.createDataFrame(
        [Row(x="a"), Row(x="b"), Row(x="b")], "x string"
    ).createOrReplaceTempView("nu_v")
    spark.createDataFrame([Row(x1="a", x2="b")], "x1 string, x2 string").createOrReplaceTempView(
        "nu_e"
    )
    s = PGQSession(spark)
    s.execute(
        """CREATE OR REPLACE PROPERTY GRAPH nug
           VERTEX TABLES ( nu_v LABEL v )
           EDGE TABLES ( nu_e SOURCE KEY (x1) REFERENCES nu_v (x)
                         DESTINATION KEY (x2) REFERENCES nu_v (x) LABEL e )"""
    )
    return s


def test_plain_match_tolerates_duplicates(dirty):
    # fixed-length matching over duplicate vertices is fine
    # (non-unique-vertices.test:24-30)
    df = dirty.graph_table("nug MATCH (v1:v)-[e1:e]->(v2:v) COLUMNS (v2.x AS x)")
    assert rows(df) == [("b",), ("b",)]


def test_path_finding_rejects_duplicates(dirty):
    # quantified path over non-unique vertices must raise the reference's
    # constraint error (non-unique-vertices.test:40-56)
    with pytest.raises(PGQConstraintError, match="Non-existent/non-unique"):
        dirty.graph_table(
            """nug MATCH p = ANY SHORTEST (v1:v)-[e1:e]->+(v2:v)
               COLUMNS (path_length(p) AS plen, v2.x AS x)"""
        )


def test_path_finding_rejects_missing_vertex(spark):
    spark.createDataFrame([Row(x="a")], "x string").createOrReplaceTempView("m_v")
    spark.createDataFrame(
        [Row(x1="a", x2="ghost")], "x1 string, x2 string"
    ).createOrReplaceTempView("m_e")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH mg
           VERTEX TABLES ( m_v LABEL v )
           EDGE TABLES ( m_e SOURCE KEY (x1) REFERENCES m_v (x)
                         DESTINATION KEY (x2) REFERENCES m_v (x) LABEL e )"""
    )
    with pytest.raises(PGQConstraintError):
        s.graph_table(
            "mg MATCH (v1:v)-[e1:e]->{1,2}(v2:v) COLUMNS (v2.x AS x)"
        )


def test_metadata_accessors(pgq):
    vt = [r["table"] for r in pgq.get_vertex_table_names("pg").collect()]
    et = [r["table"] for r in pgq.get_edge_table_names("pg").collect()]
    assert vt == ["Student", "School"]
    assert et == ["know", "StudyAt"]
    cols = {r["property"] for r in pgq.get_column_names("pg", "Person").collect()}
    assert cols == {"id", "name"}


def test_explain_over_graph_table(pgq):
    # EXPLAIN composes through the SQL frontend (explain_duckpgq.test analog)
    df = pgq.sql(
        """EXPLAIN SELECT * FROM GRAPH_TABLE (pg
             MATCH (a:Person)-[k:Knows]->(b:Person)
             COLUMNS (a.name AS an)) t"""
    )
    plan_text = df.collect()[0][0]
    assert "Join" in plan_text or "Physical Plan" in plan_text
