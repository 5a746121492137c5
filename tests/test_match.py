"""Fixed-length MATCH golden tests, ported from the reference
test/sql/pattern_matching/basic_match.test."""

import pytest

from duckpgq_extension_spark.errors import PGQBinderError

from .conftest import rows


def test_studyat_one_hop(pgq):
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[s:StudyAt]->(b:School)
           WHERE a.name = 'Daniel'
           COLUMNS (a.name as name, b.name as school)"""
    )
    assert rows(df) == [("Daniel", "VU")]


def test_two_hop_via_school(pgq):
    df = pgq.graph_table(
        """pg MATCH (a2:Person)-[s2:StudyAt]->(b:School)<-[s:StudyAt]-(a:Person)
           WHERE a.name = 'Daniel' and a.id <> a2.id
           COLUMNS (a.name as name, b.name as school, a2.name as know_name)"""
    )
    assert rows(df) == [("Daniel", "VU", "Tavneet")]


def test_vertex_only(pgq):
    df = pgq.graph_table("pg MATCH (a:Person) COLUMNS (a.id)")
    assert rows(df) == [(0,), (1,), (2,), (3,), (4,)]


def test_vertex_where(pgq):
    df = pgq.graph_table(
        "pg MATCH (a:Person) WHERE a.id = 0 COLUMNS (a.id as a_id, a.name)"
    )
    assert rows(df) == [(0, "Daniel")]


def test_directed_edge(pgq):
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[k:Knows]->(b:Person)
           WHERE a.name = 'Daniel'
           COLUMNS (a.name as a_name, b.name as b_name)"""
    )
    assert rows(df) == [
        ("Daniel", "Gabor"),
        ("Daniel", "Peter"),
        ("Daniel", "Tavneet"),
    ]


def test_reverse_edge(pgq):
    df = pgq.graph_table(
        """pg MATCH (a:Person)<-[k:Knows]-(b:Person)
           WHERE a.name = 'Peter'
           COLUMNS (a.name as a_name, b.name as b_name)"""
    )
    assert rows(df) == [
        ("Peter", "Daniel"),
        ("Peter", "David"),
        ("Peter", "Gabor"),
        ("Peter", "Tavneet"),
    ]


def test_undirected_edge_keeps_duplicates(pgq):
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[k:Knows]-(b:Person)
           WHERE a.name = 'Peter'
           COLUMNS (a.name as a_name, b.name as b_name)"""
    )
    # Daniel appears twice: edges 0->3 and 3->0 both match (basic_match.test:124-138)
    assert rows(df) == [
        ("Peter", "Daniel"),
        ("Peter", "Daniel"),
        ("Peter", "David"),
        ("Peter", "Gabor"),
        ("Peter", "Tavneet"),
    ]


def test_bidirected_edge(pgq):
    df = pgq.graph_table(
        """pg MATCH (a:Person)<-[k:Knows]->(b:Person)
           WHERE a.name = 'Peter'
           COLUMNS (a.name as a_name, b.name as b_name)"""
    )
    assert rows(df) == [("Peter", "Daniel")]


def test_triangle_cycle(pgq):
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[k:Knows]->(b:Person)-[k2:Knows]->(c:Person)-[k3:Knows]->(a:Person)
           COLUMNS (a.name as a_name, b.name as b_name, c.name as c_name)"""
    )
    assert rows(df) == [
        ("Daniel", "Gabor", "Peter"),
        ("Daniel", "Tavneet", "Peter"),
        ("Gabor", "Peter", "Daniel"),
        ("Peter", "Daniel", "Gabor"),
        ("Peter", "Daniel", "Tavneet"),
        ("Tavneet", "Peter", "Daniel"),
    ]


def test_all_edges(pgq):
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[k:Knows]->(b:Person)
           COLUMNS (a.name as a_name, b.name as b_name)"""
    )
    assert len(rows(df)) == 8


def test_case_insensitive_labels_and_bindings(pgq):
    df = pgq.graph_table(
        """pg MATCH (a:PERSON)-[k:knows]->(B:person)
           COLUMNS (a.name as a_name, b.name as b_name)"""
    )
    assert len(rows(df)) == 8


def test_aggregate_columns(pgq):
    df = pgq.graph_table(
        "pg MATCH (a:PERSON)-[k:knows]->(b:person) COLUMNS (avg(a.id) AS m)"
    )
    assert rows(df) == [(1.375,)]


def test_star_columns(pgq):
    df = pgq.graph_table(
        "pg MATCH (a:PERSON)-[k:knows]->(b:person) COLUMNS (a.*)"
    )
    got = rows(df)
    assert got == [
        (0, "Daniel"),
        (0, "Daniel"),
        (0, "Daniel"),
        (1, "Tavneet"),
        (1, "Tavneet"),
        (2, "Gabor"),
        (3, "Peter"),
        (4, "David"),
    ]
    assert df.columns == ["id", "name"]


def test_struct_columns(pgq):
    df = pgq.graph_table(
        "pg MATCH (a:PERSON)-[k:knows]->(b:person) COLUMNS (a, k, b)"
    )
    got = rows(df)
    assert len(got) == 8
    a, k, b = got[0]
    assert a.asDict() == {"id": 0, "name": "Daniel"}
    assert k.asDict() == {"src": 0, "dst": 1, "createDate": 10}


def test_unknown_binding_errors(pgq):
    with pytest.raises(PGQBinderError):
        pgq.graph_table(
            "pg MATCH (:Person)-[k:Knows]->(b:Person) COLUMNS (a.name as a_name)"
        ).collect()
    with pytest.raises(PGQBinderError):
        pgq.graph_table(
            "pg MATCH (a:Person)-[k:Knows]->(b:Person) COLUMNS (doesnotexist, k, b)"
        )


def test_unregistered_property_errors(pgq):
    # School is registered without PROPERTIES -> all columns; Student only (id, name)
    with pytest.raises(PGQBinderError):
        pgq.graph_table(
            "pg MATCH (a:Person)-[k:Knows]->(b:Person) COLUMNS (a.nonexistent)"
        )


def test_sql_frontend(pgq):
    df = pgq.sql(
        """
        SELECT study.a_name, count(study.b_name) AS cnt
        FROM GRAPH_TABLE (pg
            MATCH (a:Person)-[k:Knows]->(b:Person)
            COLUMNS (a.name as a_name, b.name as b_name)
        ) study
        GROUP BY study.a_name
        ORDER BY cnt DESC, study.a_name
        """
    )
    assert rows(df, sort=False) == [
        ("Daniel", 3),
        ("Tavneet", 2),
        ("David", 1),
        ("Gabor", 1),
        ("Peter", 1),
    ]


def test_multiple_patterns_triangle(pgq):
    # conjunctive comma-separated patterns with shared bindings (bi.test style)
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[k1:Knows]->(b:Person),
                    (b:Person)-[k2:Knows]->(c:Person),
                    (c:Person)-[k3:Knows]->(a:Person)
           COLUMNS (a.name as a_name)"""
    )
    assert len(rows(df)) == 6


def test_match_plan_shape_guarantees(pgq, spark):
    """Pin the PERF.md plan claims: a filtered 2-hop match compiles to
    equi-joins only (no CartesianProduct / BroadcastNestedLoopJoin) and
    the vertex filter is pushed into the scan."""
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[e1:Knows]->(b:Person)-[e2:Knows]->(c:Person)
           WHERE a.id < 3
           COLUMNS (a.id AS aid, c.id AS cid)"""
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # the a.id < 3 predicate reaches the a-side relation, not a top filter
    assert "id#" in optimized and "< 3" in optimized
