"""Ports of reference SQL tests round 2:

- graph_table_keyword.test — `GRAPH TABLE` (space) spelling, lone-identifier
  vertex elements `(Person)`, `AS gt` aliasing
- optional_columns.test    — COLUMNS omitted entirely, trailing comma,
  bare unaliased properties, GROUP BY over graph output
- label_optional.test      — lowercase labels, edge tables without LABEL
  (addressed by table name), did-you-mean label errors
- edgeless_graph.test      — ANY SHORTEST over a graph with zero edges
  (zero-length self-paths only)
- subpath_match.test       — inline edge WHERE, {1,2} from filtered source,
  ALL-unbounded-WALK constraint error
"""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQSession
from duckpgq_extension_spark.errors import PGQBinderError, PGQConstraintError

from .conftest import rows


@pytest.fixture(scope="session")
def sub_pg(spark):
    """Student/know fixture of subpath_match.test (know has edge ids)."""
    spark.createDataFrame(
        [Row(id=i, name=n) for i, n in enumerate(["Daniel", "Tavneet", "Gabor", "Peter", "David"])],
        "id long, name string",
    ).createOrReplaceTempView("sub_student")
    spark.createDataFrame(
        [Row(src=s, dst=d, id=i) for s, d, i in
         [(0, 1, 10), (0, 2, 11), (0, 3, 12), (3, 0, 13), (1, 2, 14), (1, 3, 15), (2, 3, 16), (4, 3, 17), (2, 4, 18)]],
        "src long, dst long, id long",
    ).createOrReplaceTempView("sub_know")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH sub_pg
           VERTEX TABLES ( sub_student PROPERTIES ( id, name ) LABEL Person )
           EDGE TABLES (
               sub_know SOURCE KEY ( src ) REFERENCES sub_student ( id )
                        DESTINATION KEY ( dst ) REFERENCES sub_student ( id )
                        PROPERTIES ( id ) LABEL Knows
           )"""
    )
    return s


@pytest.fixture(scope="session")
def varied_pg(spark):
    """label_optional.test: lowercase label, unlabeled edge table."""
    spark.createDataFrame(
        [Row(id=i, name=n) for i, n in
         enumerate(["Alice", "Bob", "Charlie", "Dave", "Eve", "Frank"])],
        "id long, name string",
    ).createOrReplaceTempView("varied_student")
    spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 4), (4, 5)]],
        "src long, dst long",
    ).createOrReplaceTempView("varied_know")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH varied_pg_label_a
           VERTEX TABLES ( varied_student LABEL a )
           EDGE TABLES (
               varied_know SOURCE KEY ( src ) REFERENCES varied_student ( id )
                           DESTINATION KEY ( dst ) REFERENCES varied_student ( id )
           )"""
    )
    return s


# -- graph_table_keyword.test ------------------------------------------------

def test_graph_table_space_spelling(sub_pg):
    """graph_table_keyword.test:22-27 — `GRAPH TABLE` with a space."""
    got = rows(sub_pg.sql(
        "SELECT id FROM GRAPH TABLE (sub_pg MATCH (Person) COLUMNS (Person.id as id)) ORDER BY id"
    ))
    assert got == [(0,), (1,), (2,), (3,), (4,)]


def test_lone_identifier_vertex(sub_pg):
    """`(Person)` is both binding and label (graph_table_keyword.test:22-35)."""
    got = rows(sub_pg.sql(
        "SELECT id FROM GRAPH_TABLE (sub_pg MATCH (Person) COLUMNS (Person.id as id)) ORDER BY id"
    ))
    assert got == [(0,), (1,), (2,), (3,), (4,)]


def test_lone_identifier_not_a_label(sub_pg):
    with pytest.raises(PGQBinderError):
        sub_pg.graph_table("sub_pg MATCH (nosuch) COLUMNS (nosuch.id AS x)")


def test_graph_table_as_alias(sub_pg):
    """graph_table_keyword.test:52-62 — `AS gt` + qualified outer refs."""
    got = rows(sub_pg.sql(
        """SELECT gt.person, gt.friend
           FROM GRAPH_TABLE (
               sub_pg MATCH (p:Person)-[k:Knows WHERE k.id = 10]->(q:Person)
               COLUMNS (p.name AS person, q.name AS friend)
           ) AS gt
           ORDER BY gt.person, gt.friend"""
    ))
    assert got == [("Daniel", "Tavneet")]


def test_reverse_arrow_same_result(sub_pg):
    """graph_table_keyword.test:41-50 — `(q)<-[k]-(p)` == `(p)-[k]->(q)`."""
    a = rows(sub_pg.sql(
        """SELECT person, friend FROM GRAPH_TABLE (
             sub_pg MATCH (p:Person)-[k:Knows]->(q:Person)
             COLUMNS (p.name AS person, q.name AS friend)) t
           ORDER BY person, friend"""
    ))
    b = rows(sub_pg.sql(
        """SELECT person, friend FROM GRAPH_TABLE (
             sub_pg MATCH (q:Person)<-[k:Knows]-(p:Person)
             COLUMNS (p.name AS person, q.name AS friend)) t
           ORDER BY person, friend"""
    ))
    assert a == b and len(a) == 9


# -- optional_columns.test ---------------------------------------------------

def test_columns_omitted_projects_all_properties(sub_pg):
    """optional_columns.test:27-30 — bare MATCH projects every property."""
    df = sub_pg.sql("SELECT * FROM GRAPH_TABLE (sub_pg MATCH (p:Person)) t ORDER BY id LIMIT 1")
    assert [c.lower() for c in df.columns] == ["id", "name"]
    assert rows(df) == [(0, "Daniel")]


def test_columns_trailing_comma(sub_pg):
    """optional_columns.test:44-55 — `COLUMNS (p.id as p_id,)`."""
    got = rows(sub_pg.sql(
        "SELECT p_id FROM GRAPH_TABLE (sub_pg MATCH (p:Person) COLUMNS (p.id as p_id,)) t ORDER BY p_id LIMIT 3"
    ))
    assert got == [(0,), (1,), (2,)]


def test_columns_bare_property_with_alias_mix(sub_pg):
    """optional_columns.test:70-83 — `COLUMNS (p.id, p.name as nm)`."""
    got = rows(sub_pg.sql(
        "SELECT id, nm FROM GRAPH_TABLE (sub_pg MATCH (p:Person) COLUMNS (p.id, p.name as nm)) t ORDER BY id LIMIT 2"
    ))
    assert got == [(0, "Daniel"), (1, "Tavneet")]


def test_group_by_over_graph_output(sub_pg):
    """optional_columns.test:85-88 — aggregation over a bare-MATCH table."""
    got = rows(sub_pg.sql(
        "SELECT count(*) AS n FROM GRAPH_TABLE (sub_pg MATCH (p:Person)) t"
    ))
    assert got == [(5,)]


# -- label_optional.test -----------------------------------------------------

def test_lcc_with_lowercase_label_and_unlabeled_edge(varied_pg):
    """label_optional.test:44-52 — lcc(varied_pg_label_a, a, varied_know);
    the unlabeled edge table is addressed by table name.  Reference goldens
    verbatim (FLOAT output)."""
    got = sorted(rows(varied_pg.local_clustering_coefficient(
        "varied_pg_label_a", "a", "varied_know"
    )))
    want = [
        (0, pytest.approx(0.6666667, abs=1e-6)),
        (1, pytest.approx(1.0)),
        (2, pytest.approx(0.6666667, abs=1e-6)),
        (3, pytest.approx(0.33333334, abs=1e-6)),
        (4, pytest.approx(0.0)),
        (5, pytest.approx(0.0)),
    ]
    assert got == want


def test_pagerank_runs_on_unlabeled_edge(varied_pg):
    """label_optional.test:54-55 — pagerank over the same graph runs."""
    assert varied_pg.pagerank("varied_pg_label_a", "a", "varied_know").count() == 6


def test_label_error_suggests_closest(varied_pg):
    """label_optional.test:57-60 — table name (case-mismatched) instead of
    label gets a did-you-mean pointing at the real label."""
    with pytest.raises(PGQBinderError, match=r"Did you mean the vertex label 'a'"):
        varied_pg.local_clustering_coefficient("varied_pg_label_a", "variedStudent", "varied_know")


def test_table_name_right_case_gets_table_message(varied_pg):
    """Exact (case-sensitive) table-name hit gets the 'Table ... found'
    message (create_property_graph_info.hpp:173-179)."""
    with pytest.raises(PGQBinderError, match=r"Table 'varied_student' found"):
        varied_pg.local_clustering_coefficient("varied_pg_label_a", "varied_student", "varied_know")


# -- edgeless_graph.test -----------------------------------------------------

def test_edgeless_any_shortest(spark):
    """edgeless_graph.test — zero edges: each vertex reaches itself only,
    with an empty edge list and path_length 0."""
    spark.createDataFrame([Row(id=1), Row(id=2), Row(id=3)], "id long").createOrReplaceTempView("el_nodes")
    spark.createDataFrame([], "src long, dst long").createOrReplaceTempView("el_edges")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH el_graph
           VERTEX TABLES ( el_nodes LABEL N )
           EDGE TABLES ( el_edges SOURCE KEY (src) REFERENCES el_nodes (id)
                         DESTINATION KEY (dst) REFERENCES el_nodes (id) LABEL E )"""
    )
    got = sorted(rows(s.graph_table(
        """el_graph MATCH p = ANY SHORTEST (n1:N)-[e:E]->*(n2:N)
           COLUMNS (n1.id AS a, n2.id AS b, edges(p) AS pe, path_length(p) AS plen)"""
    )))
    assert got == [(1, 1, [], 0), (2, 2, [], 0), (3, 3, [], 0)]


# -- subpath_match.test ------------------------------------------------------

def test_single_vertex_filter(sub_pg):
    """subpath_match.test:36-44."""
    got = rows(sub_pg.sql(
        """SELECT study.a_id, study.name FROM GRAPH_TABLE (sub_pg
             MATCH (a:Person WHERE a.id = 0)
             COLUMNS (a.id as a_id, a.name)) study"""
    ))
    assert got == [(0, "Daniel")]


def test_inline_edge_where(sub_pg):
    """subpath_match.test:46-54 — WHERE inside the edge brackets."""
    got = rows(sub_pg.sql(
        """SELECT study.a_id, study.b_id FROM GRAPH_TABLE (sub_pg
             MATCH (a:Person)-[k:Knows WHERE k.id = 10]->(b:Person)
             COLUMNS (a.id as a_id, b.id as b_id)) study"""
    ))
    assert got == [(0, 1)]


def test_all_unbounded_walk_rejected(sub_pg):
    """subpath_match.test:92-99 + 117-126 — plain `->*` / `->+` error with
    the reference's constraint message."""
    for arrow in ("->*", "->+"):
        with pytest.raises(PGQConstraintError, match="ALL unbounded with path mode WALK"):
            sub_pg.graph_table(
                f"""sub_pg MATCH (a:Person WHERE a.name = 'Peter')-[k:Knows]{arrow}(b:Person)
                    COLUMNS (a.name as a_name, b.name as b_name)"""
            )


def test_bounded_quantifier_from_filtered_source(sub_pg):
    """subpath_match.test:102-113 — {1,2} walks from Peter (global WHERE)."""
    got = sorted(rows(sub_pg.graph_table(
        """sub_pg MATCH (a:Person)-[k:Knows]->{1,2}(b:Person)
           WHERE a.name = 'Peter'
           COLUMNS (a.name as a_name, b.name as b_name)"""
    )))
    assert got == [("Peter", "Daniel"), ("Peter", "Gabor"), ("Peter", "Tavneet")]
