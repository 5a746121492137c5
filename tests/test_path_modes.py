"""TRAIL / ACYCLIC / SIMPLE path modes (beyond-reference: the reference
rejects every mode except WALK, match.cpp:96-99).

Fixture graph `know` (conftest): 0->1, 0->2, 0->3, 3->0, 1->2, 1->3,
2->3, 4->3.  Goldens below are hand-enumerated over that graph.
"""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQSession
from duckpgq_extension_spark.errors import PGQNotImplementedError

from .conftest import rows


def _mode_paths(pgq, mode):
    return pgq.graph_table(
        f"""pg MATCH p = {mode} (a:Person)-[e:Knows]->*(b:Person)
            WHERE a.id = 0
            COLUMNS (b.id AS bid, path_length(p) AS len)"""
    )


def test_acyclic_quantified_enumeration(pgq):
    # acyclic paths from 0: [], 1, 2, 3, 12, 13, 23, 123  (8 rows incl the
    # zero-hop path; the 3->0 back-edge can never be used)
    df = _mode_paths(pgq, "ACYCLIC")
    got = rows(df)
    assert len(got) == 8
    hist = {}
    for _, ln in got:
        hist[ln] = hist.get(ln, 0) + 1
    assert hist == {0: 1, 1: 3, 2: 3, 3: 1}


def test_simple_quantified_enumeration(pgq):
    # ACYCLIC's 8 paths + the 4 closed walks back to 0:
    # 0-3-0, 0-1-3-0, 0-2-3-0, 0-1-2-3-0
    df = _mode_paths(pgq, "SIMPLE")
    got = rows(df)
    assert len(got) == 12
    closed = [(b, ln) for b, ln in got if b == 0 and ln > 0]
    assert sorted(closed) == [(0, 2), (0, 3), (0, 3), (0, 4)]


def test_trail_quantified_enumeration(pgq):
    # 26 non-empty trails from 0 (hand-enumerated: 11 starting 0->1,
    # 7 starting 0->2, 8 starting 0->3) + the zero-hop path
    df = _mode_paths(pgq, "TRAIL")
    assert df.count() == 27


def test_acyclic_unbounded_star_is_allowed_but_walk_is_not(pgq):
    from duckpgq_extension_spark.errors import PGQConstraintError

    with pytest.raises(PGQConstraintError, match="path mode other than WALK"):
        pgq.graph_table(
            """pg MATCH (a:Person)-[e:Knows]->*(b:Person)
               COLUMNS (b.id AS bid)"""
        ).collect()
    # the same unbounded quantifier IS legal under ACYCLIC
    assert _mode_paths(pgq, "ACYCLIC").count() == 8


def test_acyclic_fixed_two_hop(pgq):
    # 11 two-hop walks; ACYCLIC drops 0->3->0 and 3->0->3
    walk = pgq.graph_table(
        """pg MATCH (a:Person)-[e1:Knows]->(b:Person)-[e2:Knows]->(c:Person)
           COLUMNS (a.id AS aid, c.id AS cid)"""
    )
    assert walk.count() == 11
    acy = pgq.graph_table(
        """pg MATCH ACYCLIC (a:Person)-[e1:Knows]->(b:Person)-[e2:Knows]->(c:Person)
           COLUMNS (a.id AS aid, c.id AS cid)"""
    )
    got = rows(acy)
    assert len(got) == 9
    assert all(a != c for a, c in got)


def test_simple_fixed_allows_closure_only(pgq):
    # shared endpoint binding: (a)->(b)->(a) is a closed 2-walk; SIMPLE
    # keeps it (first=last), ACYCLIC rejects it outright
    q = """pg MATCH {mode} (a:Person)-[e1:Knows]->(b:Person)-[e2:Knows]->(a)
           COLUMNS (a.id AS aid, b.id AS bid)"""
    simple = pgq.graph_table(q.format(mode="SIMPLE"))
    assert rows(simple) == [(0, 3), (3, 0)]
    acyclic = pgq.graph_table(q.format(mode="ACYCLIC"))
    assert acyclic.count() == 0


def test_trail_fixed_requires_edge_id(pgq):
    with pytest.raises(PGQNotImplementedError, match="EDGE ID"):
        pgq.graph_table(
            """pg MATCH TRAIL (a:Person)-[e1:Knows]->(b:Person)-[e2:Knows]->(c:Person)
               COLUMNS (a.id AS aid)"""
        )


def test_trail_fixed_undirected_no_edge_reuse(spark):
    # one undirected edge {0,1}: the 2-walk 0-1-0 re-traverses it, so WALK
    # finds 2 closed walks and TRAIL finds none
    spark.createDataFrame(
        [Row(id=0), Row(id=1)], "id long"
    ).createOrReplaceTempView("tm_v")
    spark.createDataFrame(
        [Row(src=0, dst=1, eid=50)], "src long, dst long, eid long"
    ).createOrReplaceTempView("tm_e")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH tm_pg
           VERTEX TABLES ( tm_v LABEL V )
           EDGE TABLES ( tm_e SOURCE KEY (src) REFERENCES tm_v (id)
                         DESTINATION KEY (dst) REFERENCES tm_v (id)
                         EDGE ID (eid) LABEL E )"""
    )
    q = """tm_pg MATCH {mode} (a:V)-[e1:E]-(b:V)-[e2:E]-(c:V)
           COLUMNS (a.id AS aid, c.id AS cid)"""
    assert s.graph_table(q.format(mode="WALK PATH")).count() == 2
    assert s.graph_table(q.format(mode="TRAIL")).count() == 0


def test_any_shortest_with_mode_equals_walk(pgq):
    # a shortest walk repeats nothing, so ANY SHORTEST ACYCLIC == ANY SHORTEST
    base = pgq.graph_table(
        """pg MATCH p = ANY SHORTEST (a:Person)-[e:Knows]->*(b:Person)
           COLUMNS (a.id AS aid, b.id AS bid, path_length(p) AS len)"""
    )
    acy = pgq.graph_table(
        """pg MATCH p = ANY SHORTEST ACYCLIC (a:Person)-[e:Knows]->*(b:Person)
           COLUMNS (a.id AS aid, b.id AS bid, path_length(p) AS len)"""
    )
    assert rows(base) == rows(acy)


def test_mode_rejects_mixed_segments(pgq):
    with pytest.raises(PGQNotImplementedError, match="multiple pattern segments"):
        pgq.graph_table(
            """pg MATCH ACYCLIC (a:Person)-[e1:Knows]->(b:Person)-[e2:Knows]->{1,2}(c:Person)
               COLUMNS (a.id AS aid)"""
        )


def test_all_shortest_diamond(spark):
    """Diamond 0->{1,2}->3: ALL SHORTEST enumerates BOTH 2-hop paths to 3
    where ANY SHORTEST keeps exactly one (the lex-min)."""
    spark.createDataFrame(
        [Row(id=i) for i in range(4)], "id long"
    ).createOrReplaceTempView("dia_v")
    spark.createDataFrame(
        [Row(src=a, dst=b, eid=e) for e, (a, b) in enumerate([(0, 1), (0, 2), (1, 3), (2, 3)])],
        "src long, dst long, eid long",
    ).createOrReplaceTempView("dia_e")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH dia_pg
           VERTEX TABLES ( dia_v LABEL V )
           EDGE TABLES ( dia_e SOURCE KEY (src) REFERENCES dia_v (id)
                         DESTINATION KEY (dst) REFERENCES dia_v (id)
                         EDGE ID (eid) LABEL E )"""
    )
    q = """dia_pg MATCH p = {mod} (a:V WHERE a.id = 0)-[e:E]->*(b:V WHERE b.id = 3)
           COLUMNS (path_length(p) AS len, element_id(p) AS elems)"""
    any_rows = s.graph_table(q.format(mod="ANY SHORTEST")).collect()
    assert len(any_rows) == 1 and any_rows[0].len == 2
    all_rows = s.graph_table(q.format(mod="ALL SHORTEST")).collect()
    paths = sorted(tuple(r.elems) for r in all_rows)
    assert [r.len for r in all_rows] == [2, 2]
    assert paths == [(0, 0, 1, 2, 3), (0, 1, 2, 3, 3)]


def test_all_shortest_unique_paths_match_any(pgq):
    """On the fixture graph every (0, dst) shortest path is unique, so
    ALL SHORTEST from 0 equals ANY SHORTEST from 0 row-for-row."""
    q = """pg MATCH p = {mod} (a:Person WHERE a.id = 0)-[e:Knows]->*(b:Person)
           COLUMNS (b.id AS bid, path_length(p) AS len)"""
    any_rows = rows(pgq.graph_table(q.format(mod="ANY SHORTEST")))
    all_rows = rows(pgq.graph_table(q.format(mod="ALL SHORTEST")))
    assert any_rows == all_rows


# ---------------------------------------------------- ANY CHEAPEST


@pytest.fixture(scope="module")
def weighted_pg(spark):
    from duckpgq_extension_spark import PGQSession

    spark.createDataFrame([(i,) for i in range(1, 6)], "id long").createOrReplaceTempView("WV")
    spark.createDataFrame(
        [(1, 2, 1, 10), (2, 4, 1, 11), (1, 3, 1, 12), (3, 4, 1, 13), (1, 4, 5, 14)],
        "s long, d long, w long, eid long",
    ).createOrReplaceTempView("WE")
    s = PGQSession(spark)
    s.execute(
        """CREATE OR REPLACE PROPERTY GRAPH wg
        VERTEX TABLES (WV PROPERTIES (id) LABEL N)
        EDGE TABLES (WE SOURCE KEY (s) REFERENCES WV (id)
                     DESTINATION KEY (d) REFERENCES WV (id)
                     EDGE ID (eid) LABEL L)"""
    )
    return s


def test_any_cheapest_star(weighted_pg):
    """ANY CHEAPEST ...->* : cheapest weighted walk with full path
    functions; the diamond's cost-2 route beats the direct w=5 edge and
    the lex-min interleaved tie-break picks [1,e10,2,e11,4]."""
    df = weighted_pg.graph_table(
        """wg MATCH p = ANY CHEAPEST (a:N WHERE a.id = 1)-[e:L COST w]->*(b:N)
           COLUMNS (a.id AS a_id, b.id AS b_id, path_cost(p) AS pc,
                    path_length(p) AS plen, vertices(p) AS vs, edges(p) AS es)"""
    )
    got = {r.b_id: (r.pc, r.plen, r.vs, r.es) for r in df.collect()}
    assert got[1] == (0.0, 0, [1], [])
    assert got[2] == (1.0, 1, [1, 2], [10])
    assert got[4] == (2.0, 2, [1, 2, 4], [10, 11])


def test_any_cheapest_plus_excludes_self(weighted_pg):
    df = weighted_pg.graph_table(
        """wg MATCH ANY CHEAPEST (a:N WHERE a.id = 1)-[e:L COST w]->+(b:N)
           COLUMNS (a.id AS a_id, b.id AS b_id)"""
    )
    assert sorted((r.a_id, r.b_id) for r in df.collect()) == [(1, 2), (1, 3), (1, 4)]


def test_any_cheapest_errors(weighted_pg):
    from duckpgq_extension_spark.errors import PGQBinderError, PGQNotImplementedError

    with pytest.raises(PGQNotImplementedError, match="only the \\* and \\+"):
        weighted_pg.graph_table(
            "wg MATCH ANY CHEAPEST (a:N)-[e:L COST w]->{1,3}(b:N) COLUMNS (a.id AS x)"
        )
    with pytest.raises(PGQBinderError, match="requires COST"):
        weighted_pg.graph_table(
            "wg MATCH ANY CHEAPEST (a:N)-[e:L]->*(b:N) COLUMNS (a.id AS x)"
        )
    with pytest.raises(PGQBinderError, match="does not exist"):
        weighted_pg.graph_table(
            "wg MATCH ANY CHEAPEST (a:N)-[e:L COST nope]->*(b:N) COLUMNS (a.id AS x)"
        )
