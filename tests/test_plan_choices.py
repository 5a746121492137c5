"""Plan-choice tests for the MATCH compiler's BFS dispatch:

- length-only named paths (COLUMNS uses at most path_length) skip path
  array tracking entirely;
- point-pinned ANY SHORTEST (both endpoints held by a key-equality
  predicate) routes through the bidirectional meet-in-the-middle kernel;
- length-only named paths work on string-keyed graphs (the array route
  requires integral keys for splicing; lengths don't).

Spies monkeypatch the kernels at the compiler's import site so each test
asserts the DISPATCH, not just the answer.
"""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQSession
from duckpgq_extension_spark.plans import compiler as C

from .conftest import rows


@pytest.fixture()
def spy(monkeypatch):
    calls = {"bfs": [], "bidir": []}
    real_bfs = C.pathops.bfs_distances
    real_bidir = C.pathops.bidirectional_length

    def bfs(*a, **kw):
        calls["bfs"].append(kw)
        return real_bfs(*a, **kw)

    def bidir(*a, **kw):
        calls["bidir"].append(kw)
        return real_bidir(*a, **kw)

    monkeypatch.setattr(C.pathops, "bfs_distances", bfs)
    monkeypatch.setattr(C.pathops, "bidirectional_length", bidir)
    return calls


def test_len_only_path_skips_tracking(pgq, spy):
    got = rows(
        pgq.graph_table(
            """pg MATCH p = ANY SHORTEST (a:Person WHERE a.id = 0)-[k:Knows]->{1,3}(b:Person)
               COLUMNS (b.id AS b_id, path_length(p) AS plen)"""
        )
    )
    # 0 -> 1,2,3 at 1 hop (BFS records first visits only)
    assert got == [(1, 1), (2, 1), (3, 1)]
    assert len(spy["bfs"]) == 1 and spy["bfs"][0]["track_paths"] is False


def test_element_id_still_tracks(pgq, spy):
    pgq.graph_table(
        """pg MATCH p = ANY SHORTEST (a:Person WHERE a.id = 0)-[k:Knows]->{1,3}(b:Person)
           COLUMNS (b.id AS b_id, path_length(p) AS plen, element_id(p) AS eid)"""
    ).collect()
    assert len(spy["bfs"]) == 1 and spy["bfs"][0]["track_paths"] is True


def test_point_pinned_uses_bidirectional(pgq, spy):
    got = rows(
        pgq.graph_table(
            """pg MATCH ANY SHORTEST (a:Person WHERE a.id = 4)-[k:Knows]->*(b:Person WHERE b.id = 2)
               COLUMNS (a.id AS a_id, b.id AS b_id)"""
        )
    )
    # 4 -> 3 -> 0 -> 2: reachable, so exactly one row
    assert got == [(4, 2)]
    assert len(spy["bidir"]) == 1 and len(spy["bfs"]) == 0


def test_point_pinned_with_plen(pgq, spy):
    got = rows(
        pgq.graph_table(
            """pg MATCH p = ANY SHORTEST (a:Person WHERE a.id = 4)-[k:Knows]->*(b:Person WHERE b.id = 2)
               COLUMNS (a.id AS a_id, b.id AS b_id, path_length(p) AS plen)"""
        )
    )
    assert got == [(4, 2, 3)]
    assert len(spy["bidir"]) == 1 and len(spy["bfs"]) == 0


def test_non_key_equality_stays_batched(pgq, spy):
    # equality on a NON-key property must not trigger the point route
    got = rows(
        pgq.graph_table(
            """pg MATCH ANY SHORTEST (a:Person WHERE a.name = 'David')-[k:Knows]->*(b:Person WHERE b.id = 2)
               COLUMNS (a.id AS a_id, b.id AS b_id)"""
        )
    )
    assert got == [(4, 2)]
    assert len(spy["bidir"]) == 0 and len(spy["bfs"]) == 1


def test_len_only_on_string_keys(spark, spy):
    """Named length-only paths over VARCHAR vertex keys: the surrogate
    BFS handles the traversal and no array splicing ever needs integral
    ids."""
    spark.createDataFrame(
        [Row(code="a"), Row(code="b"), Row(code="c"), Row(code="d")],
        "code string",
    ).createOrReplaceTempView("snode")
    spark.createDataFrame(
        [Row(s="a", d="b"), Row(s="b", d="c"), Row(s="c", d="d")],
        "s string, d string",
    ).createOrReplaceTempView("sedge")
    s = PGQSession(spark)
    s.execute("DROP PROPERTY GRAPH IF EXISTS strp")
    s.execute(
        """CREATE PROPERTY GRAPH strp
           VERTEX TABLES ( snode LABEL SN )
           EDGE TABLES ( sedge SOURCE KEY (s) REFERENCES snode (code)
                         DESTINATION KEY (d) REFERENCES snode (code) LABEL SE )"""
    )
    got = rows(
        s.graph_table(
            """strp MATCH p = ANY SHORTEST (x:SN WHERE x.code = 'a')-[e:SE]->*(y:SN)
               COLUMNS (y.code AS y_code, path_length(p) AS plen)"""
        )
    )
    assert got == [("a", 0), ("b", 1), ("c", 2), ("d", 3)]


@pytest.fixture()
def cheap_spy(monkeypatch):
    calls = []
    real = C.pathops.cheapest_path_distances

    def spy(*a, **kw):
        calls.append(kw)
        return real(*a, **kw)

    monkeypatch.setattr(C.pathops, "cheapest_path_distances", spy)
    return calls


@pytest.fixture()
def wg_session(spark):
    spark.createDataFrame([(i,) for i in range(1, 6)], "id long").createOrReplaceTempView("PCV")
    spark.createDataFrame(
        [(1, 2, 1, 10), (2, 4, 1, 11), (1, 3, 1, 12), (3, 4, 1, 13), (1, 4, 5, 14)],
        "s long, d long, w long, eid long",
    ).createOrReplaceTempView("PCE")
    s = PGQSession(spark)
    s.execute(
        """CREATE OR REPLACE PROPERTY GRAPH pcg
        VERTEX TABLES (PCV PROPERTIES (id) LABEL N)
        EDGE TABLES (PCE SOURCE KEY (s) REFERENCES PCV (id)
                     DESTINATION KEY (d) REFERENCES PCV (id)
                     EDGE ID (eid) LABEL L)"""
    )
    return s


def test_cheapest_cost_only_skips_tracking(cheap_spy, wg_session):
    """A path variable observed only through path_cost() compiles with
    track_paths=False — the cheapest analog of length-only paths."""
    df = wg_session.graph_table(
        """pcg MATCH p = ANY CHEAPEST (a:N WHERE a.id = 1)-[e:L COST w]->*(b:N)
           COLUMNS (a.id AS a_id, b.id AS b_id, path_cost(p) AS pc)"""
    )
    got = {r.b_id: r.pc for r in df.collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 1.0, 4: 2.0}
    assert len(cheap_spy) == 1 and cheap_spy[0].get("track_paths") is False


def test_cheapest_vertices_tracks(cheap_spy, wg_session):
    df = wg_session.graph_table(
        """pcg MATCH p = ANY CHEAPEST (a:N WHERE a.id = 1)-[e:L COST w]->*(b:N)
           COLUMNS (b.id AS b_id, vertices(p) AS vs)"""
    )
    assert df.count() == 4
    assert len(cheap_spy) == 1 and cheap_spy[0].get("track_paths") is True
