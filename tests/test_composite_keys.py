"""Composite (multi-column) vertex keys.

The reference models pk/fk as vectors (property_graph_table.hpp:56-71) and
its DDL exercises explicit multi-column SOURCE/DESTINATION KEY clauses
(create_pg_with_pk_fk.test drives the explicit-keys error surface).  Here:

- DDL with two-column keys validates and round-trips.
- Fixed-hop MATCH joins on every fk/pk pair (directed, undirected,
  bidirected).
- Path-finding / whole-graph algorithms reject composite keys loudly
  (the interleaved path arrays are flat longs, like the reference's rowid
  lists — a surrogate key is required).
- Key arity mismatches are DDL-time binder errors.
"""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQSession
from duckpgq_extension_spark.errors import PGQBinderError, PGQNotImplementedError

from .conftest import rows


@pytest.fixture(scope="session")
def ck_pg(spark):
    """Vertices keyed by (grp, num): A=(1,1), B=(1,2), C=(2,1).
    Edges A->B, B->C, C->A.  A and C share num=1, so a join that used
    only one key column would produce spurious matches — the tests rely
    on that to prove both columns participate in every endpoint join."""
    spark.createDataFrame(
        [
            Row(grp=1, num=1, name="A"),
            Row(grp=1, num=2, name="B"),
            Row(grp=2, num=1, name="C"),
        ],
        "grp long, num long, name string",
    ).createOrReplaceTempView("ck_nodes")
    spark.createDataFrame(
        [
            Row(sg=1, sn=1, dg=1, dn=2, tag="ab"),
            Row(sg=1, sn=2, dg=2, dn=1, tag="bc"),
            Row(sg=2, sn=1, dg=1, dn=1, tag="ca"),
        ],
        "sg long, sn long, dg long, dn long, tag string",
    ).createOrReplaceTempView("ck_edges")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH ck_pg
           VERTEX TABLES ( ck_nodes LABEL N )
           EDGE TABLES ( ck_edges SOURCE KEY (sg, sn) REFERENCES ck_nodes (grp, num)
                         DESTINATION KEY (dg, dn) REFERENCES ck_nodes (grp, num)
                         LABEL E )"""
    )
    return s


def test_composite_ddl_roundtrip(ck_pg):
    t = ck_pg.graph("ck_pg").edge_tables[0]
    assert t.source_fk == ["sg", "sn"] and t.source_pk == ["grp", "num"]


def test_composite_one_hop(ck_pg):
    df = ck_pg.graph_table(
        """ck_pg MATCH (a:N)-[e:E]->(b:N)
           COLUMNS (a.name AS a_name, b.name AS b_name, e.tag AS tag)"""
    )
    assert rows(df) == [("A", "B", "ab"), ("B", "C", "bc"), ("C", "A", "ca")]


def test_composite_two_hop_shared_binding(ck_pg):
    df = ck_pg.graph_table(
        """ck_pg MATCH (a:N)-[e1:E]->(b:N)-[e2:E]->(c:N)
           WHERE a.name = 'A'
           COLUMNS (a.name AS a_name, b.name AS b_name, c.name AS c_name)"""
    )
    assert rows(df) == [("A", "B", "C")]


def test_composite_undirected(ck_pg):
    df = ck_pg.graph_table(
        """ck_pg MATCH (a:N WHERE a.name = 'A')-[e:E]-(b:N)
           COLUMNS (b.name AS b_name)"""
    )
    # undirected from A: forward A->B, reverse C->A
    assert rows(df) == [("B",), ("C",)]


def test_composite_reverse(ck_pg):
    df = ck_pg.graph_table(
        """ck_pg MATCH (a:N WHERE a.name = 'A')<-[e:E]-(b:N)
           COLUMNS (b.name AS b_name)"""
    )
    assert rows(df) == [("C",)]


def test_composite_quantified_surrogate_bfs(ck_pg):
    """Quantified patterns over composite keys traverse via the xxhash64
    surrogate ids (A=(1,1) and C=(2,1) share num, so single-column keys
    would corrupt the walk).  Cycle A->B->C->A: {1,2} from A reaches B
    (1 hop) and C (2 hops)."""
    df = ck_pg.graph_table(
        """ck_pg MATCH (a:N)-[e:E]->{1,2}(b:N)
           WHERE a.name = 'A' COLUMNS (a.name AS a_name, b.name AS b_name)"""
    )
    assert rows(df) == [("A", "B"), ("A", "C")]


def test_composite_any_shortest_lengths(ck_pg):
    df = ck_pg.graph_table(
        """ck_pg MATCH p = ANY SHORTEST (a:N)-[e:E]->*(b:N)
           WHERE a.name = 'A'
           COLUMNS (b.name AS b_name, path_length(p) AS plen)"""
    )
    assert rows(df) == [("A", 0), ("B", 1), ("C", 2)]


def test_composite_pagerank_surrogate(ck_pg):
    """Whole-graph algorithms run over composite keys via the surrogate
    hash ids and report the natural key columns back.  A->B->C->A is a
    3-cycle, so PageRank is uniform."""
    got = ck_pg.pagerank("ck_pg", "N", "E").collect()
    assert len(got) == 3
    assert {(r["grp"], r["num"]) for r in got} == {(1, 1), (1, 2), (2, 1)}
    ranks = [r["pagerank"] for r in got]
    assert max(ranks) - min(ranks) < 1e-9
    wcc = ck_pg.weakly_connected_component("ck_pg", "N", "E").collect()
    assert len({r["componentId"] for r in wcc}) == 1
    lcc = ck_pg.local_clustering_coefficient("ck_pg", "N", "E").collect()
    assert len(lcc) == 3


def test_composite_arity_mismatch_rejected(spark, ck_pg):
    s = PGQSession(spark)
    with pytest.raises(PGQBinderError, match="arity"):
        s.execute(
            """CREATE PROPERTY GRAPH ck_bad
               VERTEX TABLES ( ck_nodes LABEL BN )
               EDGE TABLES ( ck_edges SOURCE KEY (sg, sn) REFERENCES ck_nodes (grp)
                             DESTINATION KEY (dg, dn) REFERENCES ck_nodes (grp, num)
                             LABEL BE )"""
        )


def test_composite_summarize(ck_pg):
    rows_ = ck_pg.summarize_property_graph("ck_pg").collect()
    vrow = next(r for r in rows_ if r.is_vertex_table)
    erow = next(r for r in rows_ if not r.is_vertex_table)
    assert vrow.vertex_count == 3 and erow.edge_count == 3
    assert erow.isolated_sources == 0 and erow.isolated_destinations == 0
    # reference parity: degree stats use the FIRST fk column only
    # (summarize_property_graph.cpp:72 index [0]); sg values over the
    # cycle's edges are [1, 1, 2] -> occurrences {1: 2, 2: 1}
    assert erow.avg_out_degree == pytest.approx(1.5)


def test_mixed_numeric_key_types_hash_alike(spark):
    """DECIMAL(10,2) vertex pk referenced by DOUBLE and INT fks: the
    surrogate hashes must agree across physical types (r2 ADVICE — the
    plain string rendering gave '5.00' vs '5.0' vs '5' and silently found
    no edges)."""
    from decimal import Decimal
    from duckpgq_extension_spark import PGQSession

    spark.createDataFrame(
        [(Decimal("5.00"), "a"), (Decimal("6.50"), "b"), (Decimal("7.25"), "c")],
        "vk decimal(10,2), name string",
    ).createOrReplaceTempView("mixed_v")
    spark.createDataFrame(
        [(5.0, 6.5), (6.5, 7.25)], "src double, dst double"
    ).createOrReplaceTempView("mixed_e")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH mixed_pg
           VERTEX TABLES ( mixed_v LABEL MV )
           EDGE TABLES ( mixed_e SOURCE KEY (src) REFERENCES mixed_v (vk)
                         DESTINATION KEY (dst) REFERENCES mixed_v (vk) LABEL ME )"""
    )
    rows = s.sql(
        """SELECT t.len FROM GRAPH_TABLE(mixed_pg
             MATCH p = ANY SHORTEST (a:MV)-[e:ME]->*(b:MV)
             WHERE a.name = 'a' AND b.name = 'c'
             COLUMNS (path_length(p) AS len)) t"""
    ).collect()
    assert [r.len for r in rows] == [2]


def test_null_key_vertices_do_not_fake_collision(spark):
    """Vertex rows with NULL keys are excluded from the surrogate collision
    check (countDistinct skips NULL tuples but xxhash64 does not — r2
    ADVICE); path finding over the non-NULL subgraph still works."""
    from duckpgq_extension_spark import PGQSession

    spark.createDataFrame(
        [("x", 1), ("y", 2), (None, 3)], "vk string, payload int"
    ).createOrReplaceTempView("nullk_v")
    spark.createDataFrame([("x", "y")], "src string, dst string").createOrReplaceTempView(
        "nullk_e"
    )
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH nullk_pg
           VERTEX TABLES ( nullk_v LABEL NV )
           EDGE TABLES ( nullk_e SOURCE KEY (src) REFERENCES nullk_v (vk)
                         DESTINATION KEY (dst) REFERENCES nullk_v (vk) LABEL NE )"""
    )
    rows = s.sql(
        """SELECT t.len FROM GRAPH_TABLE(nullk_pg
             MATCH p = ANY SHORTEST (a:NV)-[e:NE]->*(b:NV)
             WHERE a.vk = 'x' AND b.vk = 'y'
             COLUMNS (path_length(p) AS len)) t"""
    ).collect()
    assert [r.len for r in rows] == [1]
