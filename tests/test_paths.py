"""Path-finding golden tests, ported from the reference
test/sql/path_finding/{kleene_star,shortest_path}.test.

Path-content convention: the reference emits DuckDB rowids in
element_id/vertices/edges lists; this engine emits natural vertex keys and
deterministic edge ids instead (documented in SURVEY.md §7 "rowid
semantics").  Tests therefore assert lengths + vertex keys, not edge ids.
"""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQSession
from duckpgq_extension_spark.errors import PGQBinderError, PGQConstraintError

from .conftest import rows


@pytest.fixture(scope="session")
def kleene(spark):
    """F2 fixture: 3 nodes, EMPTY edge table (kleene_star.test:6-24)."""
    spark.createDataFrame([Row(id=1), Row(id=2), Row(id=3)], "id int").createOrReplaceTempView(
        "nodes"
    )
    spark.createDataFrame([], "src int, dst int").createOrReplaceTempView("edges")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH testgraph
           VERTEX TABLES ( nodes LABEL N )
           EDGE TABLES ( edges SOURCE KEY (src) REFERENCES nodes (id)
                         DESTINATION KEY (dst) REFERENCES nodes (id) LABEL E )"""
    )
    return s


def test_kleene_star_zero_length_paths(kleene):
    df = kleene.graph_table(
        """testgraph MATCH p = ANY SHORTEST (n1:N)-[e:E]->*(n2:N)
           COLUMNS (n1.id AS a, n2.id AS b, element_id(p) AS eid,
                    edges(p) AS path_edges, path_length(p) AS plen)"""
    )
    got = rows(df)
    # zero-length paths [v] with length 0 (kleene_star.test:26-34)
    assert got == [(1, 1, [1], [], 0), (2, 2, [2], [], 0), (3, 3, [3], [], 0)]


def test_kleene_plus_empty(kleene):
    df = kleene.graph_table(
        """testgraph MATCH p = ANY SHORTEST (n1:N)-[e:E]->+(n2:N)
           COLUMNS (n1.id AS a, path_length(p) AS plen)"""
    )
    assert rows(df) == []


def test_kleene_bounds(kleene):
    for quant, expect_diag in [("{1,3}", 0), ("{0,3}", 3), ("{,3}", 3), ("{,}", 3)]:
        df = kleene.graph_table(
            f"""testgraph MATCH p = ANY SHORTEST (n1:N)-[e:E]->{quant}(n2:N)
               COLUMNS (n1.id AS a, n2.id AS b)"""
        )
        assert len(rows(df)) == expect_diag, quant


def test_lower_greater_than_upper(kleene):
    with pytest.raises(PGQConstraintError):
        kleene.graph_table(
            """testgraph MATCH p = ANY SHORTEST (n1:N)-[e:E]->{3,1}(n2:N)
               COLUMNS (n1.id AS a)"""
        )


def test_bare_path_variable_rejected(pgq):
    with pytest.raises(PGQBinderError):
        pgq.graph_table(
            """pg MATCH p = ANY SHORTEST (a:Person)-[k:knows]->{1,3}(b:Person)
               COLUMNS (p, a.name as name)"""
        )


def test_any_shortest_plain_edge(pgq):
    df = pgq.graph_table(
        """pg MATCH ANY SHORTEST (a:Person)-[s:StudyAt]->(b:School)
           WHERE a.name = 'Daniel'
           COLUMNS (a.name as name, b.name as school)"""
    )
    assert rows(df) == [("Daniel", "VU")]


def test_shortest_quantified_single_source(pgq):
    df = pgq.graph_table(
        """pg MATCH p = ANY SHORTEST (a:Person WHERE a.name = 'Daniel')-[k:knows]->{1,3}(b:Person)
           COLUMNS (a.name as name, b.name as b_name, path_length(p) AS plen)"""
    )
    assert rows(df) == [
        ("Daniel", "Gabor", 1),
        ("Daniel", "Peter", 1),
        ("Daniel", "Tavneet", 1),
    ]


def test_shortest_all_pairs_lengths(pgq):
    """All-pairs {1,3} lengths from shortest_path.test:63-86 (lengths only;
    vertex contents checked via vertices(p))."""
    df = pgq.graph_table(
        """pg MATCH p = ANY SHORTEST (a:Person)-[k:knows]->{1,3}(b:Person)
           COLUMNS (a.name as name, b.name as b_name, path_length(p) AS plen,
                    vertices(p) AS vs)"""
    )
    got = {(r[0], r[1]): (r[2], r[3]) for r in rows(df)}
    expected_len = {
        ("Daniel", "Gabor"): 1,
        ("Daniel", "Peter"): 1,
        ("Daniel", "Tavneet"): 1,
        ("David", "Daniel"): 2,
        ("David", "Gabor"): 3,
        ("David", "Peter"): 1,
        ("David", "Tavneet"): 3,
        ("Gabor", "Daniel"): 2,
        ("Gabor", "Peter"): 1,
        ("Gabor", "Tavneet"): 3,
        ("Peter", "Daniel"): 1,
        ("Peter", "Gabor"): 2,
        ("Peter", "Tavneet"): 2,
        ("Tavneet", "Daniel"): 2,
        ("Tavneet", "Gabor"): 1,
        ("Tavneet", "Peter"): 1,
    }
    assert {k: v[0] for k, v in got.items()} == expected_len
    for (a, b), (plen, vs) in got.items():
        assert len(vs) == plen + 1
    # spot-check a unique path: David -> Peter -> Daniel
    assert got[("David", "Daniel")][1] == [4, 3, 0]


def test_var_length_without_shortest(pgq):
    # plain {1,2} quantifier: pairs whose shortest distance is in [1,2]
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[k:knows]->{1,2}(b:Person)
           WHERE a.name = 'David'
           COLUMNS (a.name AS a_name, b.name AS b_name, k.dist AS dist)"""
    )
    assert rows(df) == [("David", "Daniel", 2), ("David", "Peter", 1)]


@pytest.fixture(scope="session")
def und_pg(spark):
    """Exact undirected_paths.test fixture (9 edges incl. (2,4))."""
    spark.createDataFrame(
        [Row(id=i, name=n) for i, n in enumerate(["Daniel", "Tavneet", "Gabor", "Peter", "David"])],
        "id long, name string",
    ).createOrReplaceTempView("und_student")
    spark.createDataFrame(
        [
            Row(src=s, dst=d, id=i)
            for s, d, i in [
                (0, 1, 10), (0, 2, 11), (0, 3, 12), (3, 0, 13), (1, 2, 14),
                (1, 3, 15), (2, 3, 16), (4, 3, 17), (2, 4, 18),
            ]
        ],
        "src long, dst long, id long",
    ).createOrReplaceTempView("und_know")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH und_pg
           VERTEX TABLES ( und_student LABEL Person )
           EDGE TABLES ( und_know SOURCE KEY (src) REFERENCES und_student (id)
                         DESTINATION KEY (dst) REFERENCES und_student (id) LABEL Knows )"""
    )
    return s


def test_undirected_any_shortest_goldens(und_pg):
    """undirected_paths.test goldens: ANY SHORTEST -[e]- * from one seed."""
    df = und_pg.graph_table(
        """und_pg MATCH o = ANY SHORTEST (a:Person WHERE a.id = 0)-[e:Knows]-*(b:Person)
           COLUMNS (a.id as a_id, b.id as b_id, path_length(o) AS plen)"""
    )
    assert rows(df) == [(0, 0, 0), (0, 1, 1), (0, 2, 1), (0, 3, 1), (0, 4, 2)]
    df4 = und_pg.graph_table(
        """und_pg MATCH o = ANY SHORTEST (a:Person WHERE a.id = 4)-[e:Knows]-*(b:Person)
           COLUMNS (a.id as a_id, b.id as b_id, path_length(o) AS plen)"""
    )
    assert rows(df4) == [(4, 0, 2), (4, 1, 2), (4, 2, 1), (4, 3, 1), (4, 4, 0)]


def test_shortest_from_nonexistent_source(pgq):
    # undirected_paths.test: WHERE a.id = 999 -> empty result
    df = pgq.graph_table(
        """pg MATCH o = ANY SHORTEST (a:Person WHERE a.id = 999)-[e:Knows]-*(b:Person)
           COLUMNS (a.id as a_id, b.id as b_id)"""
    )
    assert rows(df) == []


def test_shortest_left_and_both_rejected(pgq):
    from duckpgq_extension_spark.errors import PGQNotImplementedError

    # undirected_paths.test:52-72 parity: no shortest path over <- or <->
    for arrow in ("<-[e:Knows]-*", "<-[e:Knows]->*"):
        with pytest.raises(PGQNotImplementedError):
            pgq.graph_table(
                f"""pg MATCH o = ANY SHORTEST (a:Person){arrow}(b:Person)
                    COLUMNS (a.id as a_id)"""
            )


def test_undirected_var_length(pgq):
    # undirected 1-hop reach from David: only Peter; 2 hops reaches rest
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[k:knows]-{1,2}(b:Person)
           WHERE a.name = 'David'
           COLUMNS (b.name AS b_name)"""
    )
    assert rows(df) == [("Daniel",), ("Gabor",), ("Peter",), ("Tavneet",)]


def test_temporal_reachability_respects_time(spark):
    """1->2@5, 2->3@3: from 1 the 2->3 edge is in the past on arrival, so
    3 is unreachable; from 2 it is fine.  A later parallel edge 2->3@7
    re-opens the path and the EARLIEST valid arrival wins."""
    from duckpgq_extension_spark.operators.paths import temporal_reachability

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3)], "src long, dst long, ts long"
    )
    seeds = spark.createDataFrame([(1,), (2,)], "vid long")
    got = {(r.src, r.dst): r.arrival for r in
           temporal_reachability(edges, seeds).collect()}
    assert got == {(1, 1): 0, (1, 2): 5, (2, 2): 0, (2, 3): 3}
    edges2 = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3), (2, 3, 7)], "src long, dst long, ts long"
    )
    got2 = {(r.src, r.dst): r.arrival for r in
            temporal_reachability(edges2, seeds).collect()}
    assert got2[(1, 3)] == 7 and got2[(2, 3)] == 3


def test_temporal_reachability_start_ts(spark):
    from duckpgq_extension_spark.operators.paths import temporal_reachability

    edges = spark.createDataFrame([(1, 2, 5)], "src long, dst long, ts long")
    seeds = spark.createDataFrame([(1,)], "vid long")
    got = {(r.src, r.dst): r.arrival for r in
           temporal_reachability(edges, seeds, start_ts=6).collect()}
    assert got == {(1, 1): 6}  # the only edge departs before we start


def test_cheapest_path_tracked_golden(spark):
    """Diamond with equal-cost branches: cost-2 paths [1,2,4] and [1,3,4]
    tie — the lexicographically smaller array wins; the direct w=5 edge
    loses.  Unreachable-from and the zero-cost self row behave like the
    length-only variant."""
    from duckpgq_extension_spark.operators.paths import cheapest_path_distances

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 4, 1), (1, 3, 1), (3, 4, 1), (1, 4, 5)],
        "src long, dst long, weight long",
    )
    seeds = spark.createDataFrame([(1,)], "src long")
    got = {(r.src, r.dst): (r.cost, r.path) for r in
           cheapest_path_distances(edges, sources=seeds, track_paths=True).collect()}
    assert got[(1, 1)] == (0.0, [1])
    assert got[(1, 4)] == (2.0, [1, 2, 4])
    assert got[(1, 2)] == (1.0, [1, 2]) and got[(1, 3)] == (1.0, [1, 3])
    # tracked costs == length-only costs on a larger pseudo-random graph
    el = [((i * 13 + 3) % 30, (i * 7 + j) % 30, (i + j) % 5 + 1)
          for i in range(40) for j in range(2)]
    el = [(s, d, w) for s, d, w in el if s != d]
    edges2 = spark.createDataFrame(el, "src long, dst long, weight long")
    seeds2 = spark.createDataFrame([(0,), (1,)], "src long")
    plain = {(r.src, r.dst): r.cost for r in
             cheapest_path_distances(edges2, sources=seeds2).collect()}
    tracked = {(r.src, r.dst): (r.cost, r.path) for r in
               cheapest_path_distances(edges2, sources=seeds2, track_paths=True).collect()}
    assert set(plain) == set(tracked)
    wmap = {}
    for s, d, w in el:
        wmap[(s, d)] = min(w, wmap.get((s, d), 99))
    for k, c in plain.items():
        cost, path = tracked[k]
        assert cost == c, k
        # the reported path must exist and sum to the reported cost
        assert path[0] == k[0] and path[-1] == k[1]
        assert sum(wmap[(a, b)] for a, b in zip(path, path[1:])) == cost, k


def test_multi_hop_rounds_match_single_hop(spark):
    """hops_per_round is an opt-in plan knob, not a semantics knob: BFS
    distances and Bellman-Ford costs must be identical for any value,
    including exact max_hops clamping (quantifier upper bounds compile
    to max_hops, so an off-by-one here corrupts `{l,u}` matches).

    Defaults are 1 — hops_per_round=2 is a recorded NEGATIVE perf result
    at sf0.1 (see PERF.md round 5) kept for sparse-frontier graphs; this
    test keeps the opt-in path correct while it is off the hot path.
    """
    from duckpgq_extension_spark.operators.paths import (
        bfs_distances,
        cheapest_path_distances,
    )

    # chain + diamond + 2-cycle: exercises deep frontiers, ties, cycles
    el = [(i, i + 1) for i in range(9)] + [(0, 5), (5, 2), (7, 3), (3, 7)]
    edges = spark.createDataFrame(el, "src long, dst long")
    base = {(r.src, r.dst): r.dist for r in bfs_distances(edges).collect()}
    for hpr in (2, 3):
        got = {(r.src, r.dst): r.dist
               for r in bfs_distances(edges, hops_per_round=hpr).collect()}
        assert got == base, f"hops_per_round={hpr} changed BFS distances"
    for mh in (1, 2, 3):
        capped = {k: v for k, v in base.items() if v <= mh}
        got = {(r.src, r.dst): r.dist
               for r in bfs_distances(edges, max_hops=mh,
                                      hops_per_round=2).collect()}
        assert got == capped, f"max_hops={mh} not exact under multi-hop"

    wedges = spark.createDataFrame(
        [(s, d, (s + d) % 4 + 1) for s, d in el],
        "src long, dst long, weight long",
    )
    seeds = spark.createDataFrame([(0,), (7,)], "src long")
    bcost = {(r.src, r.dst): r.cost
             for r in cheapest_path_distances(wedges, sources=seeds).collect()}
    got = {(r.src, r.dst): r.cost
           for r in cheapest_path_distances(wedges, sources=seeds,
                                            hops_per_round=2).collect()}
    assert got == bcost, "hops_per_round=2 changed Bellman-Ford costs"


def test_temporal_reachability_ts_prune_exact(spark):
    """Round-10: the opt-in monotone-label bound (`ts_prune=True`) is
    EXACT — identical (src, dst, arrival) fixpoint as the unpruned
    kernel, including equal-ts chains right at the bound and multi-seed
    frontiers, across hops_per_round settings."""
    from duckpgq_extension_spark.operators.paths import temporal_reachability

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5), (3, 4, 4),   # equal-ts chain + dead drop
         (1, 3, 2), (3, 4, 9), (4, 5, 1),   # shortcut with later fix-up
         (2, 5, 7), (5, 1, 8), (9, 1, 3)],
        "src long, dst long, ts long")
    seeds = spark.createDataFrame([(1,), (9,)], "vid long")
    base = sorted(map(tuple, temporal_reachability(edges, seeds).collect()))
    for hpr in (1, 2, 4):
        pruned = sorted(map(tuple, temporal_reachability(
            edges, seeds, hops_per_round=hpr, ts_prune=True).collect()))
        assert pruned == base, hpr


def test_temporal_index_roundtrip_and_pruning(spark, tmp_path):
    """r11 (VERDICT r10 item 1): write_temporal_index +
    temporal_reachability_from_index must (a) return exactly what the
    in-memory kernel returns on real data, and (b) turn the per-round
    monotone arrival bound into PartitionFilters on the ts-bucket
    column so bucket directories below the bound are never opened."""
    from pyspark.sql import functions as F

    from duckpgq_extension_spark.operators.paths import (
        _temporal_index_scan,
        temporal_reachability,
        temporal_reachability_from_index,
        write_temporal_index,
    )

    # same edge set as entry_queries.EDGES_SQL + q_temporal_reach, built
    # straight from the raw parquet (c_edges is a setup() temp view)
    ncust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    edges = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") % ncust).alias("dst"),
        (F.col("o_orderkey") % 365).alias("ts"),
    )
    seeds = (
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .where(F.col("c_custkey") < 5)
        .select(F.col("c_custkey").cast("long"))
    )
    idx = str(tmp_path / "tidx")
    write_temporal_index(edges, idx, ts_col="ts", n_buckets=16)
    got = temporal_reachability_from_index(spark, idx, seeds)
    want = temporal_reachability(edges, seeds)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # plan pin: a mid-range bound must appear as a PartitionFilter on __tsb
    meta = spark.read.parquet(f"{idx}/meta").first()
    lo, width = int(meta["lo"]), int(meta["width"])
    bound = lo + 5 * width  # bucket index 5 of 16
    scan = _temporal_index_scan(spark, idx, lo, width, bound)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__tsb" in plan, plan[:1500]
    # and the pruned scan equals the unpruned scan row-filtered in memory
    full = _temporal_index_scan(spark, idx, lo, width, None)
    assert sorted(map(tuple, scan.collect())) == sorted(
        map(tuple, full.where(F.col("__ts") >= bound).collect())
    )


def test_temporal_index_scan_prunes_files(spark, tmp_path):
    """The bucket predicate must reduce the files actually read (file-level
    pruning, not just a row filter)."""
    from pyspark.sql import functions as F

    from duckpgq_extension_spark.operators.paths import (
        _temporal_index_scan,
        write_temporal_index,
    )

    edges = spark.createDataFrame(
        [(i, i + 1, i % 64) for i in range(4096)], "src long, dst long, ts long"
    )
    idx = str(tmp_path / "tidx2")
    write_temporal_index(edges, idx, ts_col="ts", n_buckets=8)

    pruned = _temporal_index_scan(spark, idx, 0, 8, 32)  # buckets >= 4
    full = _temporal_index_scan(spark, idx, 0, 8, None)

    def n_partitions(df):
        # FileSourceScanExec.selectedPartitions is the post-pruning list of
        # bucket directories the scan will actually open
        leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        # Spark 4: selectedPartitions is a ScanFileListing with the
        # post-pruning partition count
        return leaf.selectedPartitions().partitionCount()

    # bound 32 of ts-range 0..63 over 8 buckets -> buckets 4..7 only
    assert n_partitions(full) == 8
    assert n_partitions(pruned) == 4
    assert pruned.count() == edges.where(F.col("ts") >= 32).count()
