"""CSR debug-dump analogs (reference getpgschema.test, get_csr_ptr.test,
get_csr_w_type.test, csr_segfault.test — the CREATE_CSR_VERTEX/EDGE +
get_csr_* family).  The engine keeps adjacency as a checkpointed
DataFrame, so these dumps are DERIVED views of what the kernels
actually traverse; the goldens below are the reference's own expected
arrays from getpgschema.test's 5-vertex / 9-edge graph."""

from pyspark.sql import Row

from duckpgq_extension_spark import PGQSession


GOLDEN_EDGES = [
    (0, 1, 10), (0, 2, 11), (0, 3, 12), (3, 0, 13), (1, 2, 14),
    (1, 3, 15), (2, 3, 16), (4, 3, 17), (2, 4, 18),
]


def _setup(spark):
    spark.createDataFrame(
        [Row(id=i, name=n) for i, n in
         enumerate(["Daniel", "Tavneet", "Gabor", "Peter", "David"])],
        "id long, name string",
    ).createOrReplaceTempView("csr_student")
    spark.createDataFrame(
        [Row(src=s, dst=d, id=i) for s, d, i in GOLDEN_EDGES],
        "src long, dst long, id long",
    ).createOrReplaceTempView("csr_know")
    pgq = PGQSession(spark)
    pgq.execute("""
        CREATE OR REPLACE PROPERTY GRAPH csr_pg
        VERTEX TABLES ( csr_student PROPERTIES (id, name) LABEL CPerson )
        EDGE TABLES (
            csr_know SOURCE KEY (src) REFERENCES csr_student (id)
                     DESTINATION KEY (dst) REFERENCES csr_student (id)
                     PROPERTIES (id) LABEL CKnows
        )
    """)
    return pgq


def test_get_csr_e_matches_reference_golden(spark):
    """getpgschema.test:84-98: `SELECT * from get_csr_e(0)` on this graph
    returns the destination array [1,2,3,2,3,3,4,0,3] — edges sorted by
    (src, dst) in rowid-dense vertex ids (== key order here: ids are
    0..4 in insertion order)."""
    pgq = _setup(spark)
    rows = pgq.get_csr_e("csr_pg", "CPerson", "CKnows").orderBy("pos").collect()
    assert [r.dst for r in rows] == [1, 2, 3, 2, 3, 3, 4, 0, 3]
    assert [r.pos for r in rows] == list(range(9))
    assert [r.src for r in rows] == [0, 0, 0, 1, 1, 2, 2, 3, 4]


def test_get_csr_v_matches_reference_golden(spark):
    """getpgschema.test:100-107: get_csr_v prints the offsets
    [0,3,5,7,8,9,9] (the reference's v array carries n+2 entries; the
    first n are the per-vertex exclusive prefix sums dumped here, the
    trailing entries the total edge count)."""
    pgq = _setup(spark)
    rows = pgq.get_csr_v("csr_pg", "CPerson", "CKnows").orderBy("dense_id").collect()
    assert [r.ptr for r in rows] == [0, 3, 5, 7, 8]
    assert [r.out_degree for r in rows] == [3, 2, 2, 1, 1]
    assert [r.dense_id for r in rows] == list(range(5))
    assert [r.vid for r in rows] == list(range(5))


def test_csr_get_w_type(spark):
    """get_csr_w_type.test:30-45: INTEGER for integral weights, DOUBLE
    for fractional, 'unweighted' without a weight column."""
    pgq = _setup(spark)
    assert pgq.csr_get_w_type("csr_pg", "CPerson", "CKnows") == "unweighted"
    assert (
        pgq.csr_get_w_type("csr_pg", "CPerson", "CKnows", weight_col="id")
        == "INTEGER"
    )


def test_get_csr_e_with_weights(spark):
    """get_csr_w analog: the weight array rides the same CSR order."""
    pgq = _setup(spark)
    rows = (
        pgq.get_csr_e("csr_pg", "CPerson", "CKnows", weight_col="id")
        .orderBy("pos")
        .collect()
    )
    expect = sorted(GOLDEN_EDGES, key=lambda e: (e[0], e[1]))
    assert [(r.src, r.dst, r.weight) for r in rows] == expect


def test_get_csr_e_edge_id_breaks_multigraph_ties(spark):
    """With EDGE ID declared, the dump carries the id lane (the
    reference CSR's edge_ids array, csr_creation.cpp) and uses it to
    break (src, dst) ties, so pos is deterministic on multigraphs."""
    spark.createDataFrame(
        [Row(id=i) for i in range(3)], "id long"
    ).createOrReplaceTempView("csr_mv")
    spark.createDataFrame(
        [Row(src=s, dst=d, eid=e) for s, d, e in
         [(0, 1, 7), (0, 1, 3), (0, 1, 5), (1, 2, 1)]],
        "src long, dst long, eid long",
    ).createOrReplaceTempView("csr_me")
    pgq = PGQSession(spark)
    pgq.execute("""
        CREATE OR REPLACE PROPERTY GRAPH csr_mpg
        VERTEX TABLES ( csr_mv PROPERTIES (id) LABEL MV )
        EDGE TABLES (
            csr_me SOURCE KEY (src) REFERENCES csr_mv (id)
                   DESTINATION KEY (dst) REFERENCES csr_mv (id)
                   EDGE ID (eid) LABEL ME
        )
    """)
    rows = pgq.get_csr_e("csr_mpg", "MV", "ME").orderBy("pos").collect()
    assert [(r.pos, r.src, r.dst, r.edge_id) for r in rows] == [
        (0, 0, 1, 3), (1, 0, 1, 5), (2, 0, 1, 7), (3, 1, 2, 1),
    ]
