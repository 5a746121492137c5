"""Variable-length paths over heterogeneous vertex domains (SNB-style
Person-studyAt->School, reference test/sql/path_finding/complex_matching.test
declares many such edge tables).  Vertex identity is (table, key) via
table-tagged xxhash64 surrogates (plans/compiler.py:_surrogate_parts): the
reference's union CSR sizes one dense-id space by the SOURCE table alone
(src/core/utils/compressed_sparse_row.cpp:132-143), conflating distinct
tables' rowids — these tests pin the principled semantics instead.

The fixture graph has Student ids 0-4 and School ids 0-1: the key domains
OVERLAP, so any untagged-id route would alias Student 0 with School 0 and
invent paths.  Every expectation below is hand-derived from
StudyAt = {(0,0),(1,0),(2,1),(3,1),(4,1)}.
"""

import pytest

from duckpgq_extension_spark.errors import PGQBinderError

from .conftest import rows


def q(pgq, body):
    return pgq.sql(f"SELECT * FROM GRAPH_TABLE(pg {body}) t")


def test_undirected_two_hop_same_school(pgq):
    # dist 2 through the school vertex = classmates; dist 0 (self)
    # excluded by the lower bound, dist 1 lands on School (wrong label)
    df = q(
        pgq,
        """MATCH (a:Person)-[s:StudyAt]-{1,2}(b:Person)
           COLUMNS (a.id AS a_id, b.id AS b_id, CAST(s.dist AS BIGINT) AS dist)""",
    )
    assert rows(df) == sorted(
        [(0, 1, 2), (1, 0, 2), (2, 3, 2), (2, 4, 2), (3, 2, 2), (3, 4, 2),
         (4, 2, 2), (4, 3, 2)],
        key=lambda t: tuple(map(str, t)),
    )


def test_undirected_mixed_terminal_school(pgq):
    # terminal on the OTHER domain: odd distances only
    df = q(
        pgq,
        """MATCH (a:Person WHERE a.id = 2)-[s:StudyAt]-{1,2}(x:SCHOOL)
           COLUMNS (a.id AS a_id, x.Id AS school_id, CAST(s.dist AS BIGINT) AS dist)""",
    )
    assert rows(df) == [(2, 1, 1)]


def test_directed_hetero_is_single_hop(pgq):
    # directed bipartite: School has no outgoing StudyAt edges, so only
    # dist-1 rows exist even under a {1,2} quantifier
    df = q(
        pgq,
        """MATCH (a:Person)-[s:StudyAt]->{1,2}(x:SCHOOL)
           COLUMNS (a.id AS a_id, x.Id AS school_id, CAST(s.dist AS BIGINT) AS dist)""",
    )
    assert rows(df) == sorted(
        [(0, 0, 1), (1, 0, 1), (2, 1, 1), (3, 1, 1), (4, 1, 1)],
        key=lambda t: tuple(map(str, t)),
    )


def test_key_overlap_does_not_alias_domains(pgq):
    # Student 0 and School 0 share the key value 0.  An untagged surrogate
    # would merge them, making School 0 adjacent to Student 1..3 via the
    # know edges of Student 0 — i.e. phantom dist-3 Person terminals.
    # With tags, a {1,3} Person->Person traversal over StudyAt alone still
    # yields ONLY the dist-2 classmates.
    df = q(
        pgq,
        """MATCH (a:Person WHERE a.id = 0)-[s:StudyAt]-{1,3}(b:Person)
           COLUMNS (b.id AS b_id, CAST(s.dist AS BIGINT) AS dist)""",
    )
    assert rows(df) == [(1, 2)]


def test_zero_lower_bound_keeps_self(pgq):
    df = q(
        pgq,
        """MATCH (a:Person WHERE a.id = 0)-[s:StudyAt]-{0,2}(b:Person)
           COLUMNS (b.id AS b_id, CAST(s.dist AS BIGINT) AS dist)""",
    )
    assert rows(df) == [(0, 0), (1, 2)]


def test_any_shortest_hetero_paths(pgq):
    # path arrays over hetero segments carry tagged surrogate ids —
    # observable invariants: interleaved length 2*dist+1, path_length
    # equals the BFS dist
    df = q(
        pgq,
        """MATCH p = ANY SHORTEST (a:Person WHERE a.id = 2)-[s:StudyAt]-{1,2}(b:Person)
           COLUMNS (b.id AS b_id, path_length(p) AS plen,
                    vertices(p) AS vs, edges(p) AS es)""",
    )
    got = df.collect()
    assert sorted(r.b_id for r in got) == [3, 4]
    assert all(r.plen == 2 and len(r.vs) == 3 and len(r.es) == 2 for r in got)
    # the middle vertex of both classmate paths is the same school vertex
    mids = {r.vs[1] for r in got}
    assert len(mids) == 1


def test_unreferenced_terminal_table_errors(pgq):
    with pytest.raises(PGQBinderError, match="does not reference"):
        q(
            pgq,
            """MATCH (a:SCHOOL)-[k:Knows]->{1,2}(b:Person)
               COLUMNS (b.id AS b_id)""",
        ).collect()


def test_whole_graph_algorithms_reject_hetero_edges(pgq):
    # pagerank over StudyAt would have to key Person and School rows in
    # one id space — the silent-conflation bug the tagged-surrogate MATCH
    # route exists to avoid.  The API must refuse, naming the alternative.
    with pytest.raises(PGQBinderError, match="single vertex domain"):
        pgq.pagerank("pg", "Person", "StudyAt").collect()
    # SQL table-function dispatch goes through the same _graph_frames
    with pytest.raises(PGQBinderError, match="single vertex domain"):
        pgq.sql(
            "SELECT * FROM weakly_connected_component(pg, Person, StudyAt)"
        ).collect()


def test_algorithms_reject_unrelated_vertex_label(pgq):
    with pytest.raises(PGQBinderError, match="not the vertex table"):
        pgq.pagerank("pg", "SCHOOL", "Knows").collect()


def test_homogeneous_route_unchanged(pgq):
    # guard: the tag is None on homogeneous graphs, so the pre-existing
    # integral-key BFS answers are untouched (know graph, reference
    # any_shortest semantics)
    df = q(
        pgq,
        """MATCH (a:Person WHERE a.id = 0)-[k:Knows]->{1,2}(b:Person)
           COLUMNS (b.id AS b_id, CAST(k.dist AS BIGINT) AS dist)""",
    )
    assert rows(df) == [(1, 1), (2, 1), (3, 1)]


def test_hetero_sides_with_different_arity_and_types(spark):
    """The two sides of a heterogeneous edge may differ in key arity AND
    physical type: accounts keyed by a composite (region INT, num INT),
    hubs keyed by a single VARCHAR.  Each side hashes with its own tag
    and canonicalization flags (compiler._surrogate_parts); undirected
    2-hop = accounts sharing a hub."""
    from duckpgq_extension_spark import PGQSession

    spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 10, "c"), (2, 30, "d")],
        "region int, num int, nm string",
    ).createOrReplaceTempView("acct")
    spark.createDataFrame(
        [("h1",), ("h2",)], "hname string"
    ).createOrReplaceTempView("hub")
    # (1,10)->h1, (1,20)->h1, (2,10)->h2, (2,30)->h2
    spark.createDataFrame(
        [(1, 10, "h1"), (1, 20, "h1"), (2, 10, "h2"), (2, 30, "h2")],
        "r int, n int, h string",
    ).createOrReplaceTempView("acct_hub")
    s = PGQSession(spark)
    s.execute(
        """CREATE OR REPLACE PROPERTY GRAPH hg
        VERTEX TABLES (
            acct PROPERTIES (region, num, nm) LABEL Acct,
            hub PROPERTIES (hname) LABEL Hub
        )
        EDGE TABLES (
            acct_hub SOURCE KEY (r, n) REFERENCES acct (region, num)
                     DESTINATION KEY (h) REFERENCES hub (hname)
                     LABEL AtHub
        )"""
    )
    df = s.graph_table(
        """hg MATCH (a:Acct WHERE a.region = 1 AND a.num = 10)-[e:AtHub]-{1,2}(b:Acct)
           COLUMNS (b.region AS r2, b.num AS n2, CAST(e.dist AS BIGINT) AS dist)"""
    )
    # (1,10) shares h1 with (1,20) only; (2,10) shares num but not hub
    assert rows(df) == [(1, 20, 2)]
    # hub terminal at dist 1
    dh = s.graph_table(
        """hg MATCH (a:Acct WHERE a.region = 2 AND a.num = 30)-[e:AtHub]-{1,2}(h:Hub)
           COLUMNS (h.hname AS hname, CAST(e.dist AS BIGINT) AS dist)"""
    )
    assert rows(dh) == [("h2", 1)]


def test_hetero_point_pair_bidirectional_route(pgq):
    """Both endpoints pinned by key equality + length-only observation
    triggers the meet-in-the-middle dispatch (compiler._point_eq_where);
    over a heterogeneous edge both BFS directions must use the SAME
    tagged surrogate domain.  Students 0 and 1 share school 0: undirected
    distance 2."""
    df = q(
        pgq,
        """MATCH p = ANY SHORTEST (a:Person WHERE a.id = 0)-[s:StudyAt]-{1,4}(b:Person WHERE b.id = 1)
           COLUMNS (path_length(p) AS plen)""",
    )
    assert rows(df) == [(2,)]
    # cross-component pair: student 0 (school 0) to student 4 (school 1)
    d2 = q(
        pgq,
        """MATCH p = ANY SHORTEST (a:Person WHERE a.id = 0)-[s:StudyAt]-{1,4}(b:Person WHERE b.id = 4)
           COLUMNS (path_length(p) AS plen)""",
    )
    assert rows(d2) == []
