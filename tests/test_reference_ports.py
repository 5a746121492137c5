"""Ports of the remaining reference SQL-integration tests:

- pgq_keywords.test        — PGQ keywords usable as aliases / outer names
- generated_sql_quoting.test — reserved-word tables, space-bearing columns
- nested_subquery.test     — GRAPH_TABLE inside nested subqueries/CTEs,
                             duplicate-column `_1` naming
- unnamed_subquery.test    — implicit `unnamed_subquery` alias, FROM-first
- parser -[]-> rejection   — empty edge brackets error (reference parses
                             `-[]->` as a syntax error)
"""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQSession
from duckpgq_extension_spark.errors import PGQParseError

from .conftest import rows


@pytest.fixture(scope="session")
def kw_pg(spark):
    """The Student/know/School/StudyAt schema shared by pgq_keywords.test,
    nested_subquery.test and path-finding-cte.test."""
    spark.createDataFrame(
        [Row(id=i, name=n) for i, n in enumerate(["Daniel", "Tavneet", "Gabor", "Peter", "David"])],
        "id long, name string",
    ).createOrReplaceTempView("kw_student")
    spark.createDataFrame(
        [Row(src=s, dst=d, createDate=c) for s, d, c in
         [(0, 1, 10), (0, 2, 11), (0, 3, 12), (3, 0, 13), (1, 2, 14), (1, 3, 15), (2, 3, 16), (4, 3, 17)]],
        "src long, dst long, createDate long",
    ).createOrReplaceTempView("kw_know")
    spark.createDataFrame(
        [Row(name="VU", Id=0, Kind="University"), Row(name="UVA", Id=1, Kind="University")],
        "name string, Id long, Kind string",
    ).createOrReplaceTempView("kw_school")
    spark.createDataFrame(
        [Row(personId=p, schoolId=s) for p, s in [(0, 0), (1, 0), (2, 1), (3, 1), (4, 1)]],
        "personId long, schoolId long",
    ).createOrReplaceTempView("kw_studyat")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH kw_pg
           VERTEX TABLES (
               kw_student PROPERTIES ( id, name ) LABEL Person,
               kw_school LABEL SCHOOL
           )
           EDGE TABLES (
               kw_know SOURCE KEY ( src ) REFERENCES kw_student ( id )
                       DESTINATION KEY ( dst ) REFERENCES kw_student ( id )
                       LABEL Knows,
               kw_studyat SOURCE KEY ( personId ) REFERENCES kw_student ( id )
                          DESTINATION KEY ( SchoolId ) REFERENCES kw_school ( id )
                          LABEL StudyAt
           )"""
    )
    return s


# -- pgq_keywords.test ------------------------------------------------------


def test_pgq_keyword_aliases(kw_pg):
    """`path` as a SELECT alias and a keyword-heavy outer query around
    GRAPH_TABLE (pgq_keywords.test:10-24,60-69)."""
    assert rows(kw_pg.sql("select 1 as path")) == [(1,)]
    df = kw_pg.sql(
        """SELECT study.name, study.school
           FROM GRAPH_TABLE (kw_pg
               MATCH (a:Person)-[s:StudyAt]->(b:School)
               WHERE a.name = 'Daniel'
               COLUMNS (a.name as name, b.name as school)
           ) study"""
    )
    assert rows(df) == [("Daniel", "VU")]


# -- generated_sql_quoting.test ---------------------------------------------


@pytest.fixture(scope="session")
def quoted_pg(spark):
    spark.sql('CREATE OR REPLACE TEMP VIEW `select` AS '
              "SELECT * FROM VALUES (1, 'Alice'), (2, 'Bob'), (3, 'Carol') "
              "AS t(`from`, `Name Value`)")
    spark.sql('CREATE OR REPLACE TEMP VIEW `group` AS '
              "SELECT * FROM VALUES (1, 2), (1, 3), (2, 3) "
              "AS t(`source key`, `destination key`)")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH pg_quoted
           VERTEX TABLES (
               "select" PROPERTIES ("from", "Name Value") LABEL person
           )
           EDGE TABLES (
               "group" SOURCE KEY ("source key") REFERENCES "select" ("from")
                       DESTINATION KEY ("destination key") REFERENCES "select" ("from")
                       LABEL knows
           )"""
    )
    return s


def test_quoted_match(quoted_pg):
    """generated_sql_quoting.test:45-55 golden."""
    df = quoted_pg.sql(
        """SELECT gt.src_id, gt.dst_name
           FROM GRAPH_TABLE (pg_quoted
               MATCH (a:person)-[k:knows]->(b:person)
               COLUMNS (a."from" AS src_id, b."Name Value" AS dst_name)
           ) gt
           ORDER BY gt.src_id, gt.dst_name"""
    )
    assert rows(df, sort=False) == [(1, "Bob"), (1, "Carol"), (2, "Carol")]


def test_quoted_pagerank(quoted_pg):
    """generated_sql_quoting.test:41-43: pagerank over quoted backing
    tables returns one row per vertex."""
    assert quoted_pg.pagerank("pg_quoted", "person", "knows").count() == 3


def test_quoted_summarize(quoted_pg):
    rows_ = quoted_pg.summarize_property_graph("pg_quoted").collect()
    vrow = next(r for r in rows_ if r.is_vertex_table)
    erow = next(r for r in rows_ if not r.is_vertex_table)
    assert vrow.vertex_count == 3 and erow.edge_count == 3


def test_quoted_where_and_unaliased(quoted_pg):
    """Quoted identifiers in WHERE text and as unaliased COLUMNS (the
    output column takes the bare property name)."""
    df = quoted_pg.graph_table(
        """pg_quoted MATCH (a:person)-[k:knows]->(b:person)
           WHERE a."Name Value" = 'Alice'
           COLUMNS (b."Name Value")"""
    )
    assert df.columns == ["Name Value"]
    assert rows(df) == [("Bob",), ("Carol",)]


# -- nested_subquery.test ---------------------------------------------------


def test_duplicate_column_suffix(kw_pg):
    """nested_subquery.test:33: unaliased duplicate columns get _1 suffix."""
    df = kw_pg.sql(
        "select * from (select id, id_1 from graph_table ( kw_pg match "
        "(p:person)-[k:knows]->(p2:person) columns (p.id, p2.id) ))"
    )
    assert df.columns == ["id", "id_1"]
    assert df.count() == 8


def test_nested_subquery_join(kw_pg):
    """nested_subquery.test:55-64: GRAPH_TABLE subquery joined to a base
    table."""
    df = kw_pg.sql(
        """SELECT kw_student.name, friend_id
           FROM kw_student
           JOIN (
               SELECT student_id, friend_id
               FROM GRAPH_TABLE (
                   kw_pg MATCH (p:Person)-[k:knows]->(p2:Person)
                   COLUMNS (p.id as student_id, p2.id as friend_id)
               ) graph
           ) AS subquery
           ON kw_student.id = subquery.student_id"""
    )
    assert df.count() == 8


def test_nested_cte_aggregate(kw_pg):
    """nested_subquery.test:78-103: double nesting, GROUP BY, and a CTE."""
    df = kw_pg.sql(
        """WITH Friendships AS (
               SELECT person_id, friend_id
               FROM (
                   SELECT person_id, friend_id
                   FROM GRAPH_TABLE (
                       kw_pg MATCH (p:Person)-[k:knows]->(p2:Person)
                       COLUMNS (p.id as person_id, p2.id as friend_id)
                   )
               ) AS Subquery
           )
           SELECT person_id, COUNT(friend_id) AS friend_count
           FROM Friendships GROUP BY person_id"""
    )
    assert rows(df) == [(0, 3), (1, 2), (2, 1), (3, 1), (4, 1)]


# -- unnamed_subquery.test --------------------------------------------------


def test_from_first_shorthand(kw_pg):
    """unnamed_subquery.test:24-31: DuckDB FROM-first syntax."""
    df = kw_pg.sql(
        """FROM GRAPH_TABLE (kw_pg
               MATCH (p:Person)-[k:knows]->(p2:Person)
               COLUMNS (p.name, p2.name)
           )
           limit 3"""
    )
    assert df.count() == 3
    assert df.columns == ["name", "name_1"]


def test_unnamed_subquery_alias(kw_pg):
    """unnamed_subquery.test:76-88: an aliasless GRAPH_TABLE is reachable
    as `unnamed_subquery`."""
    df = kw_pg.sql(
        """SELECT unnamed_subquery.p_name, unnamed_subquery.p2_name
           FROM GRAPH_TABLE (kw_pg
               MATCH (p:Person)-[k:knows]->(p2:Person)
               COLUMNS (p.name as p_name, p2.name as p2_name)
           )
           ORDER BY p_name, p2_name LIMIT 2"""
    )
    assert rows(df, sort=False) == [("Daniel", "Gabor"), ("Daniel", "Peter")]


def test_explicit_alias_still_works(kw_pg):
    df = kw_pg.sql(
        """SELECT tmp.p_name FROM GRAPH_TABLE (kw_pg
               MATCH (p:Person)-[k:knows]->(p2:Person)
               COLUMNS (p.name as p_name, p2.name as p2_name)
           ) tmp LIMIT 2"""
    )
    assert df.count() == 2


# -- path-finding-cte.test analog -------------------------------------------


def test_shortest_path_inside_cte(kw_pg):
    """path-finding-cte.test drives the reference's CSR-CTE rewrite; the
    observable behavior is ANY SHORTEST inside WITH + reuse of the CTE."""
    df = kw_pg.sql(
        """WITH sp AS (
               SELECT a_id, b_id, plen FROM GRAPH_TABLE (kw_pg
                   MATCH p = ANY SHORTEST (a:Person WHERE a.id = 0)-[k:knows]->*(b:Person)
                   COLUMNS (a.id AS a_id, b.id AS b_id, path_length(p) AS plen)
               ) t
           )
           SELECT s1.a_id, s1.b_id, s1.plen FROM sp s1
           JOIN sp s2 ON s1.b_id = s2.b_id WHERE s2.plen >= 1"""
    )
    got = rows(df)
    assert (0, 3, 1) in got


# -- parser parity: empty edge brackets --------------------------------------


def test_empty_edge_brackets_rejected(kw_pg):
    """The reference's PEG grammar requires a binding or label inside
    edge brackets; `-[]->` is a parse error."""
    with pytest.raises(PGQParseError):
        kw_pg.graph_table(
            "kw_pg MATCH (a:Person)-[]->(b:Person) COLUMNS (a.id AS x)"
        )
