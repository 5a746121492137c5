"""Driver-contract query catalog: every operator from SURVEY.md §2 (plus
the beyond-reference pipeline operators) as a (spark, sf_dir) -> DataFrame
callable, paired with an equivalent DuckDB oracle SQL string.

The derived graph: the testdata has no native edge table, so both engines
derive the SAME deterministic directed graph over customers from orders:

    src = o_custkey, dst = o_orderkey % |customer|, eid = o_orderkey,
    w = o_orderkey % 7 + 1

Oracle-matching rules observed throughout (driver hashes sorted values):
- every computed column aliased identically on both sides;
- floats rounded to 6 (or fewer) decimals on both sides, far above the
  cross-engine double noise (~1e-12) so rounding can't flip;
- timestamps compared as epoch microseconds (DuckDB truncates ns -> us the
  same way sources.tables.load_table does);
- graph BFS/pagerank/wcc oracles are recursive CTEs / unrolled iterations
  computing the identical fixed-point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import algorithms
from .api import PGQSession
from .functions import text as TX
from .operators import corpus, dedup, multimodal, paths as pathops, relational, similarity
from .operators.dedup import MINHASH_PRIME, minhash_params
from .sources.tables import load_table, register_all
from .streaming import events as ev

# --------------------------------------------------------------------------
# shared derived-graph SQL (identical text runs on Spark SQL and DuckDB)
# --------------------------------------------------------------------------

EDGES_SQL = (
    "SELECT o_custkey AS src, o_orderkey % (SELECT count(*) FROM customer) AS dst, "
    "o_orderkey AS eid, o_orderkey % 7 + 1 AS w FROM orders"
)
CUSTOMER_TM_SQL = (
    "SELECT c_custkey, c_name, c_acctbal, 1 + (c_custkey % 2) * 2 AS typemask "
    "FROM customer"
)
# composite-key variant: vertices keyed by (nation, custkey); edges carry the
# full two-column endpoint keys (property_graph_table.hpp:56-71 models pk/fk
# as vectors — this exercises the multi-column join path)
CUST2_SQL = (
    "SELECT c_nationkey AS part1, c_custkey AS part2, c_name, c_acctbal "
    "FROM customer"
)
EDGES2_SQL = (
    "SELECT s.c_nationkey AS src1, e.src AS src2, d.c_nationkey AS dst1, "
    "e.dst AS dst2, e.w FROM ({e}) e "
    "JOIN customer s ON s.c_custkey = e.src "
    "JOIN customer d ON d.c_custkey = e.dst"
).format(e=EDGES_SQL)

GRAPH_DDL = """
CREATE OR REPLACE PROPERTY GRAPH social
VERTEX TABLES (
    customer PROPERTIES (c_custkey, c_name, c_acctbal, c_nationkey) LABEL Customer,
    customer_tm PROPERTIES (c_custkey, typemask) LABEL CustomerTM IN typemask (bronze, premium)
)
EDGE TABLES (
    c_edges SOURCE KEY (src) REFERENCES customer (c_custkey)
            DESTINATION KEY (dst) REFERENCES customer (c_custkey)
            EDGE ID (eid) LABEL Follows,
    c_edges AS ce2 SOURCE KEY (src) REFERENCES customer_tm (c_custkey)
            DESTINATION KEY (dst) REFERENCES customer_tm (c_custkey)
            EDGE ID (eid) LABEL FollowsTM
)
"""

# string-key variant: vertices keyed by the VARCHAR c_name (exercises the
# non-integral surrogate route end to end)
CUSTS_SQL = "SELECT c_name, c_acctbal FROM customer"
EDGES_S_SQL = (
    "SELECT s.c_name AS sname, d.c_name AS dname FROM ({e}) e "
    "JOIN customer s ON s.c_custkey = e.src "
    "JOIN customer d ON d.c_custkey = e.dst"
).format(e=EDGES_SQL)

GRAPHS_DDL = """
CREATE OR REPLACE PROPERTY GRAPH social_s
VERTEX TABLES (
    custs PROPERTIES (c_name, c_acctbal) LABEL CS
)
EDGE TABLES (
    edges_s SOURCE KEY (sname) REFERENCES custs (c_name)
            DESTINATION KEY (dname) REFERENCES custs (c_name)
            LABEL FS
)
"""

# heterogeneous-domain variant: supplier—locatedIn—nation is a bipartite
# edge table whose endpoints live in DIFFERENT vertex tables (the SNB
# Person-likes->Message shape, reference complex_matching.test).  Vertex
# identity is (table, key) via table-tagged surrogates
# (plans/compiler.py:_surrogate_parts) — supplier 3 and nation 3 never merge.
GRAPH_BIP_DDL = """
CREATE OR REPLACE PROPERTY GRAPH bipartite
VERTEX TABLES (
    supplier PROPERTIES (s_suppkey, s_name, s_nationkey) LABEL Supp,
    nation PROPERTIES (n_nationkey, n_name) LABEL Nat
)
EDGE TABLES (
    supplier AS sloc SOURCE KEY (s_suppkey) REFERENCES supplier (s_suppkey)
             DESTINATION KEY (s_nationkey) REFERENCES nation (n_nationkey)
             LABEL LocIn
)
"""

GRAPH2_DDL = """
CREATE OR REPLACE PROPERTY GRAPH social2
VERTEX TABLES (
    cust2 PROPERTIES (part1, part2, c_name, c_acctbal) LABEL C2
)
EDGE TABLES (
    edges2 SOURCE KEY (src1, src2) REFERENCES cust2 (part1, part2)
           DESTINATION KEY (dst1, dst2) REFERENCES cust2 (part1, part2)
           LABEL F2
)
"""

_SETUP: dict = {}


def setup(spark: SparkSession, sf_dir: str, force: bool = False) -> PGQSession:
    """Register the testdata views + property graphs for `sf_dir`.

    Cached PER SESSION with the last-registered sf_dir: a call for a
    DIFFERENT sf_dir always re-registers, because
    createOrReplaceTempView re-points the shared view names — keying the
    cache by (session, sf_dir) let a cross-scale call leave every
    sibling entry silently stale (the round-3 bench bug).  `force=True`
    re-registers unconditionally."""
    key = id(spark)
    hit = _SETUP.get(key)
    if hit is not None and hit[0] == sf_dir and not force:
        return hit[1]
    try:  # the driver's session may not carry our session.py configs
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    except Exception:
        pass
    register_all(spark, sf_dir)
    spark.sql(f"CREATE OR REPLACE TEMP VIEW c_edges AS {EDGES_SQL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW customer_tm AS {CUSTOMER_TM_SQL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW cust2 AS {CUST2_SQL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW edges2 AS {EDGES2_SQL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW custs AS {CUSTS_SQL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW edges_s AS {EDGES_S_SQL}")
    pgq = PGQSession(spark)
    pgq.execute(GRAPH_DDL)
    pgq.execute(GRAPH2_DDL)
    pgq.execute(GRAPHS_DDL)
    pgq.execute(GRAPH_BIP_DDL)
    _SETUP[key] = (sf_dir, pgq)
    return pgq


def _with_e(body: str, recursive: bool = False) -> str:
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"{kw} e AS ({EDGES_SQL}) {body}"


# --------------------------------------------------------------------------
# graph pattern matching (SURVEY §2A MATCH compiler)
# --------------------------------------------------------------------------


def q_match_1hop(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH (a:Customer)-[f:Follows]->(b:Customer)
           WHERE a.c_acctbal > 9000
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key, f.w AS w)"""
    )


O_MATCH_1HOP = _with_e(
    """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key, e.w AS w
       FROM customer a JOIN e ON e.src = a.c_custkey
       JOIN customer b ON b.c_custkey = e.dst
       WHERE a.c_acctbal > 9000"""
)


def q_match_2hop(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH (a:Customer)-[f1:Follows]->(b:Customer)-[f2:Follows]->(c:Customer)
           WHERE a.c_custkey < 100
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key, c.c_custkey AS c_key)"""
    )


O_MATCH_2HOP = _with_e(
    """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key, c.c_custkey AS c_key
       FROM customer a
       JOIN e e1 ON e1.src = a.c_custkey JOIN customer b ON b.c_custkey = e1.dst
       JOIN e e2 ON e2.src = b.c_custkey JOIN customer c ON c.c_custkey = e2.dst
       WHERE a.c_custkey < 100"""
)


def q_match_undirected(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH (a:Customer)-[f:Follows]-(b:Customer)
           WHERE a.c_custkey = 7
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key)"""
    )


O_MATCH_UNDIRECTED = _with_e(
    """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
       FROM customer a
       JOIN (SELECT src AS s, dst AS d FROM e UNION ALL SELECT dst, src FROM e) u
         ON u.s = a.c_custkey
       JOIN customer b ON b.c_custkey = u.d
       WHERE a.c_custkey = 7"""
)


def q_match_reverse(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH (a:Customer)<-[f:Follows]-(b:Customer)
           WHERE a.c_custkey < 20
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key)"""
    )


O_MATCH_REVERSE = _with_e(
    """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
       FROM customer a JOIN e ON e.dst = a.c_custkey
       JOIN customer b ON b.c_custkey = e.src
       WHERE a.c_custkey < 20"""
)


def q_match_bidirected(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH (a:Customer)<-[f:Follows]->(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key)"""
    )


O_MATCH_BIDIRECTED = _with_e(
    """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
       FROM customer a
       JOIN e e1 ON e1.src = a.c_custkey
       JOIN customer b ON b.c_custkey = e1.dst
       JOIN e e2 ON e2.src = b.c_custkey AND e2.dst = a.c_custkey"""
)


def q_match_triangle(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH (a:Customer)-[f1:Follows]->(b:Customer),
                        (b:Customer)-[f2:Follows]->(c:Customer),
                        (c:Customer)-[f3:Follows]->(a:Customer)
           WHERE a.c_custkey < b.c_custkey AND b.c_custkey < c.c_custkey
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key, c.c_custkey AS c_key)"""
    )


O_MATCH_TRIANGLE = _with_e(
    """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key, c.c_custkey AS c_key
       FROM customer a
       JOIN e e1 ON e1.src = a.c_custkey JOIN customer b ON b.c_custkey = e1.dst
       JOIN e e2 ON e2.src = b.c_custkey JOIN customer c ON c.c_custkey = e2.dst
       JOIN e e3 ON e3.src = c.c_custkey AND e3.dst = a.c_custkey
       WHERE a.c_custkey < b.c_custkey AND b.c_custkey < c.c_custkey"""
)


def q_match_inheritance(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH (a:premium)-[f:FollowsTM]->(b:bronze)
           WHERE a.c_custkey < 50
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key)"""
    )


O_MATCH_INHERITANCE = _with_e(
    """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
       FROM (SELECT * FROM ({TM}) WHERE (typemask & 2) = 2) a
       JOIN e ON e.src = a.c_custkey
       JOIN (SELECT * FROM ({TM}) WHERE (typemask & 1) = 1) b
         ON b.c_custkey = e.dst
       WHERE a.c_custkey < 50""".format(TM=CUSTOMER_TM_SQL)
)


def q_match_composite_key(spark, sf_dir):
    """2-hop MATCH over a graph whose vertices are keyed by a composite
    (nation, custkey) pair — every endpoint join is a two-column equality
    (reference models pk/fk as vectors, property_graph_table.hpp:56-71)."""
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social2 MATCH (a:C2)-[f:F2]->(b:C2)-[g:F2]->(c:C2)
           WHERE a.c_acctbal > 9500 AND a.part1 <> b.part1
           COLUMNS (a.part1 AS a_n, a.part2 AS a_key, b.part2 AS b_key,
                    c.part2 AS c_key, g.w AS w2)"""
    )


O_MATCH_COMPOSITE_KEY = f"""
WITH e0 AS ({EDGES_SQL}),
e2 AS (SELECT s.c_nationkey AS src1, e0.src AS src2, d.c_nationkey AS dst1,
              e0.dst AS dst2, e0.w
       FROM e0 JOIN customer s ON s.c_custkey = e0.src
               JOIN customer d ON d.c_custkey = e0.dst),
c2 AS ({CUST2_SQL})
SELECT a.part1 AS a_n, a.part2 AS a_key, b.part2 AS b_key,
       c.part2 AS c_key, g.w AS w2
FROM c2 a
JOIN e2 f ON f.src1 = a.part1 AND f.src2 = a.part2
JOIN c2 b ON b.part1 = f.dst1 AND b.part2 = f.dst2
JOIN e2 g ON g.src1 = b.part1 AND g.src2 = b.part2
JOIN c2 c ON c.part1 = g.dst1 AND c.part2 = g.dst2
WHERE a.c_acctbal > 9500 AND a.part1 <> b.part1
"""


# --------------------------------------------------------------------------
# path finding (SURVEY §2A kernels)
# --------------------------------------------------------------------------


def q_var_length_1_2(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH (a:Customer WHERE a.c_custkey < 30)-[f:Follows]->{1,2}(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key,
                    CAST(f.dist AS BIGINT) AS dist)"""
    )


O_VAR_LENGTH_1_2 = _with_e(
    """, bfs(src, dst, d) AS (
         SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 30
         UNION
         SELECT b.src, e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.dst WHERE b.d < 2
       )
       SELECT src AS a_key, dst AS b_key, CAST(min(d) AS BIGINT) AS dist
       FROM bfs GROUP BY src, dst HAVING min(d) BETWEEN 1 AND 2""",
    recursive=True,
)


def q_var_length_hetero(spark, sf_dir):
    """Variable-length path over a heterogeneous (bipartite) edge table,
    traversed undirected: suppliers at distance 2 are co-nation suppliers
    (the path runs through the nation vertex).  Exercises the
    table-tagged-surrogate union domain (compiler._surrogate_parts) that
    replaces the reference's conflated union CSR
    (compressed_sparse_row.cpp:132-143)."""
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """bipartite MATCH (s:Supp WHERE s.s_suppkey <= 40)-[l:LocIn]-{1,2}(x:Supp)
           COLUMNS (s.s_suppkey AS src_key, x.s_suppkey AS dst_key,
                    CAST(l.dist AS BIGINT) AS dist)"""
    )


# traversal-faithful oracle: BFS over the integer-tagged union domain
# (supplier k -> 2k, nation k -> 2k+1) so the recursion walks the same
# bipartite graph the engine does; terminal filter = even (supplier) ids
O_VAR_LENGTH_HETERO = """
WITH RECURSIVE ue AS (
  SELECT s_suppkey * 2 AS a, s_nationkey * 2 + 1 AS b FROM supplier
), und AS (
  SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue
), bfs(src, dst, d) AS (
  SELECT s_suppkey * 2, s_suppkey * 2, 0 FROM supplier WHERE s_suppkey <= 40
  UNION
  SELECT f.src, u.b, f.d + 1 FROM bfs f JOIN und u ON u.a = f.dst WHERE f.d < 2
), mind AS (SELECT src, dst, MIN(d) AS d FROM bfs GROUP BY src, dst)
SELECT CAST(src // 2 AS BIGINT) AS src_key, CAST(dst // 2 AS BIGINT) AS dst_key,
       CAST(d AS BIGINT) AS dist
FROM mind WHERE dst % 2 = 0 AND d BETWEEN 1 AND 2
"""


def q_shortest_len(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH p = ANY SHORTEST (a:Customer WHERE a.c_custkey < 10)-[f:Follows]->{1,4}(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key,
                    path_length(p) AS plen)"""
    )


O_SHORTEST_LEN = _with_e(
    """, bfs(src, dst, d) AS (
         SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
         UNION
         SELECT b.src, e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.dst WHERE b.d < 4
       )
       SELECT src AS a_key, dst AS b_key, CAST(min(d) AS BIGINT) AS plen
       FROM bfs GROUP BY src, dst HAVING min(d) BETWEEN 1 AND 4""",
    recursive=True,
)


def q_shortest_composite(spark, sf_dir):
    """ANY SHORTEST over the composite-key graph (xxhash64 surrogate ids
    inside the BFS; natural two-column keys in the output).  The oracle
    runs the same BFS as a recursive CTE directly on the composite keys,
    proving the surrogate route is invisible in the results."""
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social2 MATCH p = ANY SHORTEST (a:C2 WHERE a.part2 < 10)-[f:F2]->{1,4}(b:C2)
           COLUMNS (a.part1 AS a_n, a.part2 AS a_key, b.part1 AS b_n,
                    b.part2 AS b_key, path_length(p) AS plen)"""
    )


O_SHORTEST_COMPOSITE = f"""
WITH RECURSIVE e2 AS ({EDGES2_SQL}),
bfs(a1, a2, b1, b2, d) AS (
  SELECT c_nationkey, c_custkey, c_nationkey, c_custkey, 0
  FROM customer WHERE c_custkey < 10
  UNION
  SELECT b.a1, b.a2, e.dst1, e.dst2, b.d + 1 FROM bfs b
  JOIN e2 e ON e.src1 = b.b1 AND e.src2 = b.b2 WHERE b.d < 4
)
SELECT a1 AS a_n, a2 AS a_key, b1 AS b_n, b2 AS b_key,
       CAST(min(d) AS BIGINT) AS plen
FROM bfs GROUP BY 1, 2, 3, 4 HAVING min(d) BETWEEN 1 AND 4
"""


def q_shortest_string(spark, sf_dir):
    """ANY SHORTEST over a graph keyed by the VARCHAR c_name — the
    non-integral surrogate route, oracle-checked with a recursive CTE
    running directly on the string keys."""
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social_s MATCH p = ANY SHORTEST (a:CS WHERE a.c_name <= 'Customer#000000009')-[f:FS]->{1,4}(b:CS)
           COLUMNS (a.c_name AS a_name, b.c_name AS b_name, path_length(p) AS plen)"""
    )


O_SHORTEST_STRING = f"""
WITH RECURSIVE es AS ({EDGES_S_SQL}),
bfs(a, b, d) AS (
  SELECT c_name, c_name, 0 FROM customer WHERE c_name <= 'Customer#000000009'
  UNION
  SELECT f.a, e.dname, f.d + 1 FROM bfs f
  JOIN es e ON e.sname = f.b WHERE f.d < 4
)
SELECT a AS a_name, b AS b_name, CAST(min(d) AS BIGINT) AS plen
FROM bfs GROUP BY a, b HAVING min(d) BETWEEN 1 AND 4
"""


def q_reachability(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH ANY SHORTEST (a:Customer WHERE a.c_custkey < 5)-[f:Follows]->*(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key)"""
    )


O_REACHABILITY = _with_e(
    """, bfs(src, dst) AS (
         SELECT c_custkey, c_custkey FROM customer WHERE c_custkey < 5
         UNION
         SELECT b.src, e.dst FROM bfs b JOIN e ON e.src = b.dst
       )
       SELECT src AS a_key, dst AS b_key FROM bfs""",
    recursive=True,
)


def q_shortest_path_vertices(spark, sf_dir):
    """Full path contents, hash-checkable: ANY SHORTEST ties break
    deterministically to the lexicographically-smallest interleaved
    [v,e,v,...] path (operators/paths.py module notes), and the graph DDL
    designates `eid` as the edge id, so both engines can compute the exact
    same path.  The array is serialized to a string because the driver's
    canonicalizer hashes scalars."""
    pgq = setup(spark, sf_dir)
    df = pgq.graph_table(
        """social MATCH p = ANY SHORTEST (a:Customer WHERE a.c_custkey < 3)-[f:Follows]->{1,3}(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key,
                    path_length(p) AS plen, vertices(p) AS path_vertices)"""
    )
    return df.select(
        "a_key",
        "b_key",
        "plen",
        F.concat_ws(
            "->", F.transform(F.col("path_vertices"), lambda x: x.cast("string"))
        ).alias("path_str"),
    )


O_SHORTEST_PATH_VERTICES = _with_e(
    """, paths(src, dst, d, path) AS (
         SELECT c_custkey, c_custkey, 0, [CAST(c_custkey AS BIGINT)]
         FROM customer WHERE c_custkey < 3
         UNION
         SELECT p.src, e.dst, p.d + 1,
                list_append(list_append(p.path, CAST(e.eid AS BIGINT)),
                            CAST(e.dst AS BIGINT))
         FROM paths p JOIN e ON e.src = p.dst WHERE p.d < 3
       ),
       best AS (SELECT src, dst, min(d) AS d FROM paths GROUP BY src, dst),
       chosen AS (
         SELECT p.src, p.dst, p.d, min(p.path) AS path
         FROM paths p
         JOIN best b ON b.src = p.src AND b.dst = p.dst AND b.d = p.d
         GROUP BY p.src, p.dst, p.d
       )
       SELECT src AS a_key, dst AS b_key, CAST(d AS BIGINT) AS plen,
              array_to_string(
                list_transform(generate_series(1, len(path), 2), i -> path[i]),
                '->') AS path_str
       FROM chosen WHERE d BETWEEN 1 AND 3""",
    recursive=True,
)


def q_topk_paths(spark, sf_dir):
    """Beyond-reference SHORTEST k (the reference rejects it with "TopK has
    not been implemented yet.", top_k.test:33-49): the k best walks per
    (src, dst) ranked by (hop count, lexicographic interleaved path).  The
    interleaved [v,e,v,...] path is serialized to a string so the driver
    can hash it.  Note the rank runs over ALL walks of length <= upper
    (including the 0-hop self walk); the quantifier bound filters AFTER
    ranking — mirrored exactly in the oracle."""
    pgq = setup(spark, sf_dir)
    df = pgq.graph_table(
        """social MATCH p = SHORTEST 2 (a:Customer WHERE a.c_custkey < 3)-[f:Follows]->{1,3}(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key,
                    path_length(p) AS plen, element_id(p) AS path_elems)"""
    )
    return df.select(
        "a_key",
        "b_key",
        "plen",
        F.concat_ws(
            "->", F.transform(F.col("path_elems"), lambda x: x.cast("string"))
        ).alias("path_str"),
    )


O_TOPK_PATHS = _with_e(
    """, paths(src, dst, d, path) AS (
         SELECT c_custkey, c_custkey, 0, [CAST(c_custkey AS BIGINT)]
         FROM customer WHERE c_custkey < 3
         UNION
         SELECT p.src, e.dst, p.d + 1,
                list_append(list_append(p.path, CAST(e.eid AS BIGINT)),
                            CAST(e.dst AS BIGINT))
         FROM paths p JOIN e ON e.src = p.dst WHERE p.d < 3
       ),
       ranked AS (
         SELECT src, dst, d, path,
                row_number() OVER (PARTITION BY src, dst ORDER BY d, path) AS rn
         FROM paths
       )
       SELECT src AS a_key, dst AS b_key, CAST(d AS BIGINT) AS plen,
              array_to_string(path, '->') AS path_str
       FROM ranked WHERE rn <= 2 AND d BETWEEN 1 AND 3""",
    recursive=True,
)


def q_acyclic_paths(spark, sf_dir):
    """ACYCLIC path-mode enumeration (beyond-reference: the reference
    rejects every non-WALK path mode, match.cpp:96-99).  One row per
    vertex-distinct path of 1..3 hops from the low-key customers, with the
    interleaved [v,e,v,...] path serialized so the driver hashes the
    actual paths, not just counts."""
    pgq = setup(spark, sf_dir)
    df = pgq.graph_table(
        """social MATCH p = ACYCLIC (a:Customer WHERE a.c_custkey < 3)-[f:Follows]->{1,3}(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key,
                    path_length(p) AS plen, element_id(p) AS path_elems)"""
    )
    return df.select(
        "a_key",
        "b_key",
        "plen",
        F.concat_ws(
            "->", F.transform(F.col("path_elems"), lambda x: x.cast("string"))
        ).alias("path_str"),
    )


O_ACYCLIC_PATHS = _with_e(
    """, paths(src, dst, d, path, vseen) AS (
         SELECT c_custkey, c_custkey, 0, [CAST(c_custkey AS BIGINT)],
                [CAST(c_custkey AS BIGINT)]
         FROM customer WHERE c_custkey < 3
         UNION ALL
         SELECT p.src, e.dst, p.d + 1,
                list_append(list_append(p.path, CAST(e.eid AS BIGINT)),
                            CAST(e.dst AS BIGINT)),
                list_append(p.vseen, CAST(e.dst AS BIGINT))
         FROM paths p JOIN e ON e.src = p.dst
         WHERE p.d < 3 AND NOT list_contains(p.vseen, e.dst)
       )
       SELECT src AS a_key, dst AS b_key, CAST(d AS BIGINT) AS plen,
              array_to_string(path, '->') AS path_str
       FROM paths WHERE d BETWEEN 1 AND 3""",
    recursive=True,
)


def q_trail_paths(spark, sf_dir):
    """TRAIL path-mode enumeration (beyond-reference): every edge-distinct
    walk of 1..3 hops from the two lowest-key customers — vertices may
    repeat, edges may not."""
    pgq = setup(spark, sf_dir)
    df = pgq.graph_table(
        """social MATCH p = TRAIL (a:Customer WHERE a.c_custkey < 2)-[f:Follows]->{1,3}(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key,
                    path_length(p) AS plen, element_id(p) AS path_elems)"""
    )
    return df.select(
        "a_key",
        "b_key",
        "plen",
        F.concat_ws(
            "->", F.transform(F.col("path_elems"), lambda x: x.cast("string"))
        ).alias("path_str"),
    )


O_TRAIL_PATHS = _with_e(
    """, paths(src, dst, d, path, eseen) AS (
         SELECT c_custkey, c_custkey, 0, [CAST(c_custkey AS BIGINT)],
                CAST([] AS BIGINT[])
         FROM customer WHERE c_custkey < 2
         UNION ALL
         SELECT p.src, e.dst, p.d + 1,
                list_append(list_append(p.path, CAST(e.eid AS BIGINT)),
                            CAST(e.dst AS BIGINT)),
                list_append(p.eseen, CAST(e.eid AS BIGINT))
         FROM paths p JOIN e ON e.src = p.dst
         WHERE p.d < 3 AND NOT list_contains(p.eseen, CAST(e.eid AS BIGINT))
       )
       SELECT src AS a_key, dst AS b_key, CAST(d AS BIGINT) AS plen,
              array_to_string(path, '->') AS path_str
       FROM paths WHERE d BETWEEN 1 AND 3""",
    recursive=True,
)


def q_all_shortest_paths(spark, sf_dir):
    """ALL SHORTEST enumeration (beyond-reference: the reference rejects it,
    match.cpp:81-104): EVERY minimal-length path per (src, dst) within the
    {1,4} window, one row per path, serialized so the driver hashes the
    actual path sets."""
    pgq = setup(spark, sf_dir)
    df = pgq.graph_table(
        """social MATCH p = ALL SHORTEST (a:Customer WHERE a.c_custkey < 3)-[f:Follows]->{1,4}(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key,
                    path_length(p) AS plen, element_id(p) AS path_elems)"""
    )
    return df.select(
        "a_key",
        "b_key",
        "plen",
        F.concat_ws(
            "->", F.transform(F.col("path_elems"), lambda x: x.cast("string"))
        ).alias("path_str"),
    )


O_ALL_SHORTEST_PATHS = _with_e(
    """, paths(src, dst, d, path) AS (
         SELECT c_custkey, c_custkey, 0, [CAST(c_custkey AS BIGINT)]
         FROM customer WHERE c_custkey < 3
         UNION
         SELECT p.src, e.dst, p.d + 1,
                list_append(list_append(p.path, CAST(e.eid AS BIGINT)),
                            CAST(e.dst AS BIGINT))
         FROM paths p JOIN e ON e.src = p.dst WHERE p.d < 4
       ),
       best AS (SELECT src, dst, MIN(d) AS d FROM paths GROUP BY src, dst)
       SELECT p.src AS a_key, p.dst AS b_key, CAST(p.d AS BIGINT) AS plen,
              array_to_string(p.path, '->') AS path_str
       FROM paths p JOIN best b ON b.src = p.src AND b.dst = p.dst AND b.d = p.d
       WHERE p.d BETWEEN 1 AND 4""",
    recursive=True,
)


def q_cheapest_path(spark, sf_dir):
    setup(spark, sf_dir)
    edges = pathops.edge_frame(
        spark.table("c_edges"), "src", "dst", weight_col="w"
    )
    sources = spark.table("customer").where("c_custkey < 10").select(
        F.col("c_custkey").cast("long")
    )
    dist = pathops.cheapest_path_distances(edges, sources=sources)
    return dist.select(
        F.col("src").alias("a_key"),
        F.col("dst").alias("b_key"),
        F.col("cost").cast("bigint").alias("cost"),
    )


O_CHEAPEST_PATH = _with_e(
    """, wf(src, dst, cost) AS (
         SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
         UNION
         SELECT w.src, e.dst, w.cost + e.w FROM wf w JOIN e ON e.src = w.dst
         WHERE w.cost + e.w <= 60
       )
       SELECT src AS a_key, dst AS b_key, CAST(min(cost) AS BIGINT) AS cost
       FROM wf GROUP BY src, dst""",
    recursive=True,
)


# --------------------------------------------------------------------------
# whole-graph algorithms (SURVEY §2A table functions)
# --------------------------------------------------------------------------


def q_pagerank(spark, sf_dir):
    setup(spark, sf_dir)
    edges = pathops.edge_frame(spark.table("c_edges"), "src", "dst")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    ranks = algorithms.pagerank(edges, vertices, tol=0.0, max_iter=10)
    return ranks.select("vid", F.round("pagerank", 6).alias("pr"))


def _pagerank_parts(iters: int = 10) -> list[str]:
    """The pagerank power-iteration as reusable CTE parts (shared by
    O_PAGERANK and the composed O_GRAPH_REPORT oracle); the final
    ranks CTE is r{iters}."""
    parts = [
        f"verts AS (SELECT c_custkey AS vid FROM customer)",
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM customer)",
        "odeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS cnt FROM e GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT vid, 1.0 / n.n AS rank FROM verts CROSS JOIN n)",
    ]
    for i in range(1, iters + 1):
        p, c = f"r{i - 1}", f"r{i}"
        # MATERIALIZED: each iteration references the previous one twice
        # (dangling sum + contribution join); DuckDB would otherwise inline
        # the CTE per reference and the plan doubles per iteration --
        # measured 0.03 s at 2 iterations, 13.9 s at 8 (exponential)
        parts.append(
            f"""{c} AS MATERIALIZED (
              SELECT v.vid,
                     0.15 / n.n + 0.85 * (COALESCE(m.mass, 0) + d.dang / n.n) AS rank
              FROM verts v
              CROSS JOIN n
              CROSS JOIN (SELECT COALESCE(SUM({p}.rank), 0) AS dang
                          FROM {p} LEFT JOIN odeg ON {p}.vid = odeg.src
                          WHERE odeg.src IS NULL) d
              LEFT JOIN (SELECT e.dst AS vid, SUM({p}.rank / odeg.cnt) AS mass
                         FROM {p} JOIN odeg ON odeg.src = {p}.vid
                         JOIN e ON e.src = {p}.vid GROUP BY e.dst) m
                ON m.vid = v.vid)"""
        )
    return parts


def _pagerank_oracle(iters: int = 10) -> str:
    body = ",\n".join(_pagerank_parts(iters))
    return f"WITH e AS ({EDGES_SQL}),\n{body}\nSELECT vid, ROUND(rank, 6) AS pr FROM r{iters}"


O_PAGERANK = _pagerank_oracle(10)


def q_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (beyond-reference): teleport + dangling mass
    return to the source set (every 100th customer) instead of all
    vertices — proximity-to-sources ranking.  Fixed 10 iterations so the
    DuckDB oracle can replay them as unrolled CTEs."""
    setup(spark, sf_dir)
    edges = pathops.edge_frame(spark.table("c_edges"), "src", "dst")
    cust = spark.table("customer")
    vertices = cust.select(F.col("c_custkey").cast("long"))
    sources = cust.where(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").cast("long")
    )
    ranks = algorithms.pagerank(edges, vertices, tol=0.0, max_iter=10, sources=sources)
    return ranks.select("vid", F.round("pagerank", 6).alias("ppr"))


def _ppr_oracle(iters: int = 10) -> str:
    parts = [
        "verts AS (SELECT c_custkey AS vid FROM customer)",
        "ns AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM customer WHERE c_custkey % 100 = 0)",
        "rst AS MATERIALIZED (SELECT vid, CASE WHEN vid % 100 = 0 THEN 1.0 / ns.ns ELSE 0.0 END AS reset FROM verts CROSS JOIN ns)",
        "odeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS cnt FROM e GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT vid, reset AS rank FROM rst)",
    ]
    for i in range(1, iters + 1):
        p, c = f"r{i - 1}", f"r{i}"
        # MATERIALIZED: see _pagerank_oracle -- inlining doubles per iteration
        parts.append(
            f"""{c} AS MATERIALIZED (
              SELECT v.vid,
                     0.15 * v.reset + 0.85 * (COALESCE(m.mass, 0) + d.dang * v.reset) AS rank
              FROM rst v
              CROSS JOIN (SELECT COALESCE(SUM({p}.rank), 0) AS dang
                          FROM {p} LEFT JOIN odeg ON {p}.vid = odeg.src
                          WHERE odeg.src IS NULL) d
              LEFT JOIN (SELECT e.dst AS vid, SUM({p}.rank / odeg.cnt) AS mass
                         FROM {p} JOIN odeg ON odeg.src = {p}.vid
                         JOIN e ON e.src = {p}.vid GROUP BY e.dst) m
                ON m.vid = v.vid)"""
        )
    body = ",\n".join(parts)
    return f"WITH e AS ({EDGES_SQL}),\n{body}\nSELECT vid, ROUND(rank, 6) AS ppr FROM r{iters}"


O_PERSONALIZED_PAGERANK = _ppr_oracle(10)


def q_weighted_pagerank(spark, sf_dir):
    """Weighted PageRank (beyond-reference): rank splits across out-edges
    proportional to the edge weight `w` instead of uniformly.  Fixed 10
    iterations for the unrolled-CTE oracle."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    ranks = algorithms.pagerank(
        edges, vertices, tol=0.0, max_iter=10, weight_col="w"
    )
    return ranks.select("vid", F.round("pagerank", 6).alias("wpr"))


def _wpr_oracle(iters: int = 10) -> str:
    parts = [
        "verts AS (SELECT c_custkey AS vid FROM customer)",
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM customer)",
        # cnt NULL when the weight sum is <= 0 — such vertices are DANGLING
        # in the implementation (algorithms.pagerank NULLs out_deg), so the
        # oracle's dangling test below is cnt IS NULL, never a divide-by-zero
        "odeg AS MATERIALIZED (SELECT src, CASE WHEN SUM(w) > 0 THEN CAST(SUM(w) AS DOUBLE) END AS cnt FROM e GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT vid, 1.0 / n.n AS rank FROM verts CROSS JOIN n)",
    ]
    for i in range(1, iters + 1):
        p, c = f"r{i - 1}", f"r{i}"
        # MATERIALIZED: see _pagerank_oracle -- inlining doubles per iteration
        parts.append(
            f"""{c} AS MATERIALIZED (
              SELECT v.vid,
                     0.15 / n.n + 0.85 * (COALESCE(m.mass, 0) + d.dang / n.n) AS rank
              FROM verts v
              CROSS JOIN n
              CROSS JOIN (SELECT COALESCE(SUM({p}.rank), 0) AS dang
                          FROM {p} LEFT JOIN odeg
                            ON {p}.vid = odeg.src AND odeg.cnt IS NOT NULL
                          WHERE odeg.src IS NULL) d
              LEFT JOIN (SELECT e.dst AS vid, SUM({p}.rank * e.w / odeg.cnt) AS mass
                         FROM {p} JOIN odeg ON odeg.src = {p}.vid AND odeg.cnt IS NOT NULL
                         JOIN e ON e.src = {p}.vid GROUP BY e.dst) m
                ON m.vid = v.vid)"""
        )
    body = ",\n".join(parts)
    return f"WITH e AS ({EDGES_SQL}),\n{body}\nSELECT vid, ROUND(rank, 6) AS wpr FROM r{iters}"


O_WEIGHTED_PAGERANK = _wpr_oracle(10)


def q_sampled_neighborhood(spark, sf_dir):
    """Two-layer GraphSAGE-style sampled neighborhood
    (algorithms.sampled_neighborhood): fan-out 3 then 2 from every 100th
    customer; deterministic hash draws, so the DuckDB oracle replays the
    identical per-layer ranking."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").cast("long")
    )
    return algorithms.sampled_neighborhood(edges, seeds, fanouts=[3, 2], salt="sn")


def _sn_rank(salt: str) -> str:
    return (
        "ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY "
        "('0x' || substr(md5(CAST(e.src AS VARCHAR) || '|' || "
        f"CAST(e.dst AS VARCHAR) || '|{salt}'), 1, 15))::BIGINT ASC, "
        "e.src ASC, e.dst ASC)"
    )


O_SAMPLED_NEIGHBORHOOD = f"""
WITH e AS ({EDGES_SQL}),
f0 AS (SELECT c_custkey AS vid FROM customer WHERE c_custkey % 100 = 0),
c0 AS (
  SELECT e.src, e.dst, {_sn_rank('sn|0')} AS rk
  FROM e WHERE e.src IN (SELECT vid FROM f0)),
s0 AS (SELECT src, dst, 0 AS layer FROM c0 WHERE rk <= 3),
v1 AS (SELECT DISTINCT dst AS vid FROM s0
       WHERE dst NOT IN (SELECT vid FROM f0)),
c1 AS (
  SELECT e.src, e.dst, {_sn_rank('sn|1')} AS rk
  FROM e WHERE e.src IN (SELECT vid FROM v1)),
s1 AS (SELECT src, dst, 1 AS layer FROM c1 WHERE rk <= 2)
SELECT src, dst, layer FROM s0
UNION ALL
SELECT src, dst, layer FROM s1
"""


def q_k_core(spark, sf_dir):
    """k-core decomposition (algorithms.k_core, beyond-reference):
    vertices of the 15-core of the follows graph.  The oracle unrolls 30
    peeling rounds — the sf0.01 correctness graph reaches its fixpoint in
    7, peeling is idempotent at the fixpoint, and extra MATERIALIZED
    rounds over a converged set are near-free; the margin guards against
    a deeper pendant cascade if the driver ever compares at another
    scale."""
    setup(spark, sf_dir)
    edges = pathops.edge_frame(spark.table("c_edges"), "src", "dst")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    return algorithms.k_core(edges, vertices, k=15)


def _k_core_oracle(k: int = 15, rounds: int = 30) -> str:
    parts = [
        """und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e WHERE src <> dst
    UNION ALL SELECT dst, src FROM e WHERE src <> dst))""",
        "v0 AS (SELECT c_custkey AS vid FROM customer)",
    ]
    for i in range(1, rounds + 1):
        p, c = f"v{i - 1}", f"v{i}"
        parts.append(
            f"""{c} AS MATERIALIZED (
  SELECT u.src AS vid FROM und u
  JOIN {p} x ON u.src = x.vid
  JOIN {p} y ON u.dst = y.vid
  GROUP BY u.src HAVING count(*) >= {k})"""
        )
    body = ",\n".join(parts)
    return f"WITH e AS ({EDGES_SQL}),\n{body}\nSELECT vid FROM v{rounds}"


O_K_CORE = _k_core_oracle()


def q_neighbor_sample(spark, sf_dir):
    """Deterministic GraphSAGE-style neighborhood sampling
    (algorithms.neighbor_sample): at most 3 out-edges per vertex chosen
    by content-hash order — reproducible, so the DuckDB oracle replays
    the identical md5 ranking."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    return algorithms.neighbor_sample(edges, k=3, salt="ns1").select("src", "dst")


O_NEIGHBOR_SAMPLE = _with_e(
    """, r AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (
           PARTITION BY src
           ORDER BY ('0x' || substr(md5(CAST(src AS VARCHAR) || '|' ||
                     CAST(dst AS VARCHAR) || '|ns1'), 1, 15))::BIGINT ASC,
                    src ASC, dst ASC
         ) AS rk
  FROM e)
SELECT src, dst FROM r WHERE rk <= 3"""
)


def q_wcc(spark, sf_dir):
    setup(spark, sf_dir)
    edges = pathops.edge_frame(spark.table("c_edges"), "src", "dst")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    return algorithms.weakly_connected_component(edges, vertices)


O_WCC = _with_e(
    """, und AS (SELECT src, dst FROM e WHERE src <> dst
                 UNION SELECT dst, src FROM e WHERE src <> dst),
       reach(a, b) AS (
         SELECT c_custkey, c_custkey FROM customer
         UNION
         SELECT r.a, u.dst FROM reach r JOIN und u ON u.src = r.b
       )
       SELECT a AS vid, min(b) AS component_id FROM reach GROUP BY a""",
    recursive=True,
)


def q_lcc(spark, sf_dir):
    setup(spark, sf_dir)
    edges = pathops.edge_frame(spark.table("c_edges"), "src", "dst")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    lcc = algorithms.local_clustering_coefficient(edges, vertices)
    return lcc.select("vid", F.round("local_clustering_coefficient", 6).alias("lcc"))


O_LCC = _with_e(
    """, und AS (SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM e WHERE src <> dst
           UNION ALL SELECT dst, src FROM e WHERE src <> dst)),
       deg AS (SELECT src AS v, count(*) AS d FROM und GROUP BY src),
       tri AS (SELECT n1.src AS v, count(*) AS links
               FROM und n1
               JOIN und n2 ON n1.src = n2.src AND n1.dst <> n2.dst
               JOIN und n3 ON n3.src = n1.dst AND n3.dst = n2.dst
               GROUP BY n1.src)
       SELECT c.c_custkey AS vid,
              ROUND(CASE WHEN COALESCE(deg.d, 0) < 2 THEN 0.0
                    ELSE CAST(COALESCE(tri.links, 0) AS DOUBLE) / (deg.d * (deg.d - 1))
                    END, 6) AS lcc
       FROM customer c
       LEFT JOIN deg ON deg.v = c.c_custkey
       LEFT JOIN tri ON tri.v = c.c_custkey"""
)


_SUMMARIZE_DEG_COLS = [
    f"{s}_{d}_degree"
    for d in ("in", "out")
    for s in ("avg", "min", "max", "q25", "q50", "q75")
]


def q_summarize(spark, sf_dir):
    """SUMMARIZE PROPERTY GRAPH in the reference's exact 22-column
    one-row-per-table shape (summarize_property_graph.test:22-27);
    degree doubles rounded to 6 for the cross-engine hash."""
    pgq = setup(spark, sf_dir)
    s = pgq.summarize_property_graph("social")
    return s.select(
        "table_name", "is_vertex_table", "source_table", "destination_table",
        "vertex_count", "edge_count",
        "unique_source_count", "unique_destination_count",
        "isolated_sources", "isolated_destinations",
        *[F.round(F.col(c), 6).alias(c) for c in _SUMMARIZE_DEG_COLS],
    )


def _summarize_oracle() -> str:
    deg_nulls = ", ".join(
        f"CAST(NULL AS DOUBLE) AS {c}" for c in _SUMMARIZE_DEG_COLS
    )
    deg_stats = ", ".join(
        f"ROUND(s_{d}.{s}_{d}, 6) AS {s}_{d}_degree"
        for d in ("in", "out")
        for s in ("avg", "min", "max", "q25", "q50", "q75")
    )
    stat_cte = (
        "SELECT CAST(AVG(deg) AS DOUBLE) AS avg_{d}, CAST(MIN(deg) AS DOUBLE) AS min_{d}, "
        "CAST(MAX(deg) AS DOUBLE) AS max_{d}, quantile_cont(deg, 0.25) AS q25_{d}, "
        "quantile_cont(deg, 0.50) AS q50_{d}, quantile_cont(deg, 0.75) AS q75_{d} FROM {src}"
    )
    vrow = (
        "SELECT '{t}' AS table_name, TRUE AS is_vertex_table, "
        "CAST(NULL AS VARCHAR) AS source_table, CAST(NULL AS VARCHAR) AS destination_table, "
        "(SELECT count(*) FROM customer) AS vertex_count, CAST(NULL AS BIGINT) AS edge_count, "
        "CAST(NULL AS BIGINT) AS unique_source_count, CAST(NULL AS BIGINT) AS unique_destination_count, "
        "CAST(NULL AS BIGINT) AS isolated_sources, CAST(NULL AS BIGINT) AS isolated_destinations, "
        + deg_nulls
    )
    erow = (
        "SELECT 'c_edges' AS table_name, FALSE AS is_vertex_table, "
        "'{v}' AS source_table, '{v}' AS destination_table, "
        "CAST(NULL AS BIGINT) AS vertex_count, ec.ec AS edge_count, "
        "ec.usc AS unique_source_count, ec.udc AS unique_destination_count, "
        "iso_s.n AS isolated_sources, iso_d.n AS isolated_destinations, "
        + deg_stats + " FROM ec, iso_s, iso_d, s_in, s_out"
    )
    return f"""
WITH e AS ({EDGES_SQL}),
ideg AS (SELECT dst, count(*) AS deg FROM e GROUP BY dst),
odeg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
s_in AS ({stat_cte.format(d='in', src='ideg')}),
s_out AS ({stat_cte.format(d='out', src='odeg')}),
ec AS (SELECT count(*) AS ec, count(DISTINCT src) AS usc, count(DISTINCT dst) AS udc FROM e),
iso_s AS (SELECT count(*) AS n FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = c.c_custkey)),
iso_d AS (SELECT count(*) AS n FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.dst = c.c_custkey))
{vrow.format(t='customer')}
UNION ALL
{vrow.format(t='customer_tm')}
UNION ALL
{erow.format(v='customer')}
UNION ALL
{erow.format(v='customer_tm')}
"""


O_SUMMARIZE = _summarize_oracle()


def q_create_vertex_table(spark, sf_dir):
    pgq = setup(spark, sf_dir)
    return pgq.create_vertex_table(spark.table("c_edges"), "src", "dst", "derived_vertices")


O_CREATE_VERTEX_TABLE = _with_e(
    "SELECT src AS id FROM e UNION SELECT dst AS id FROM e"
)


# --------------------------------------------------------------------------
# relational / window / as-of (SURVEY §2B + §2C)
# --------------------------------------------------------------------------


def q_tpch_q1(spark, sf_dir):
    setup(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 0).cast("bigint").alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ).cast("bigint").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


O_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       CAST(ROUND(SUM(l_extendedprice), 0) AS BIGINT) AS sum_base_price,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_topk_per_group(spark, sf_dir):
    setup(spark, sf_dir)
    li = spark.table("lineitem").withColumn(
        "uniq", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    top = relational.top_k_per_group(
        li, ["l_returnflag"], "l_extendedprice", 3, tie_breaker="uniq"
    )
    return top.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
        F.col("rank").cast("bigint").alias("rank"),
    )


O_TOPK_PER_GROUP = """
SELECT l_returnflag, l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY l_returnflag
      ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber ASC) AS rank
  FROM lineitem
) WHERE rank <= 3
"""


def q_interval_join(spark, sf_dir):
    """Interval containment join, time-bucket blocked (equi-join on the
    bucket grid + exact predicate; never an inequality-only cartesian):
    user-0 session windows against the whole event stream."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    sessions = ev.session_stats(events.where(F.col("user_id") == 0), gap_minutes=60)
    iv = sessions.select(
        F.col("session_id").cast("bigint").alias("session_id"),
        F.col("session_start").alias("s"),
        F.col("session_end").alias("e"),
    ).localCheckpoint()  # iv derives from events; sever the lineage so the
    # interval side joining back against events is not a self-join
    out = relational.interval_join(iv, events, "s", "e", "ts", bucket="1 hour")
    return out.select(
        "session_id", "event_id", ev.epoch_us(F.col("ts")).alias("ts_us")
    )


O_INTERVAL_JOIN = """
WITH u0 AS (SELECT * FROM events WHERE user_id = 0),
flagged AS (
  SELECT *, CASE WHEN COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER w, 3600000001)
                 > 3600000000 THEN 1 ELSE 0 END AS new_session
  FROM u0 WINDOW w AS (ORDER BY ts)
),
sessions AS (
  SELECT SUM(new_session) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id, ts
  FROM flagged
),
iv AS (SELECT session_id, MIN(ts) AS s, MAX(ts) AS e FROM sessions GROUP BY session_id)
SELECT CAST(iv.session_id AS BIGINT) AS session_id, ev.event_id, epoch_us(ev.ts) AS ts_us
FROM iv JOIN events ev ON ev.ts >= iv.s AND ev.ts <= iv.e
"""
# session_id is a windowed SUM -> HUGEINT in DuckDB; pandas/arrow fetch turns
# HUGEINT into float64 ("1.0" vs Spark's "1" under a value hash), so the
# oracle must cast every integral aggregate it emits (CORRECTNESS_r02 red).


def q_asof_join(spark, sf_dir):
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    orders_u = (
        spark.table("orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = relational.as_of_join(
        events.withColumnRenamed("user_id", "k"),
        orders_u.withColumnRenamed("o_custkey", "k"),
        "k",
        "ts",
        "o_orderdate",
        ["o_orderkey"],
    )
    return out.select("event_id", "k", F.col("o_orderkey_r").alias("matched_order"))


O_ASOF_JOIN = """
WITH orders_u AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id AS k, o.o_orderkey AS matched_order
FROM (SELECT * FROM events WHERE user_id < 50) e
ASOF LEFT JOIN orders_u o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_window_running_sum(spark, sf_dir):
    from pyspark.sql import Window

    setup(spark, sf_dir)
    li = spark.table("lineitem").where(F.col("l_suppkey") < 20)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity")).over(w).cast("bigint").alias("running_qty"),
    )


O_WINDOW_RUNNING_SUM = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(l_quantity) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
FROM lineitem WHERE l_suppkey < 20
"""


def q_rollup_orders(spark, sf_dir):
    setup(spark, sf_dir)
    o = spark.table("orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 0).cast("bigint").alias("total"),
    )


O_ROLLUP_ORDERS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_cube_lineitem(spark, sf_dir):
    setup(spark, sf_dir)
    li = spark.table("lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum("l_quantity").cast("bigint").alias("qty"),
    )


O_CUBE_LINEITEM = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(l_quantity) AS BIGINT) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_semi_anti_join(spark, sf_dir):
    """Customers with orders but no high-value order (semi + anti join)."""
    setup(spark, sf_dir)
    c = spark.table("customer")
    o = spark.table("orders")
    with_orders = c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
    big = o.where(F.col("o_totalprice") > 300000)
    return with_orders.join(
        big, with_orders["c_custkey"] == big["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


O_SEMI_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


def q_streaming_window(spark, sf_dir):
    """Real Structured-Streaming execution (readStream over the events
    parquet rewritten to a bounded dir, watermarked tumbling agg, memory
    sink).  Append-mode emission is deterministic for a bounded source:
    exactly the windows whose end <= final watermark (max event time,
    floored to ms as Spark's event-time stats do, minus the 1 h delay) —
    which the DuckDB oracle reproduces with a batch aggregation + filter."""
    import tempfile

    setup(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="pgq_stream_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    stream = ev.stream_from_parquet(spark, src)
    q = ev.run_stream_to_memory(
        ev.windowed_stream(stream, "1 day", "1 hour"), "bench_stream_out"
    )
    q.stop()
    return spark.table("bench_stream_out").select(
        ev.epoch_us(F.col("window_start")).alias("start_us"),
        ev.epoch_us(F.col("window_end")).alias("end_us"),
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


def q_streaming_dedup(spark, sf_dir):
    """Real Structured-Streaming dedup (readStream over the events parquet
    written TWICE, dropDuplicatesWithinWatermark on event_id, memory sink).
    Deterministic despite arbitrary arrival order because every duplicate
    pair is bit-identical — whichever copy wins, the emitted row is the
    same — so the oracle is simply the original table."""
    import tempfile

    setup(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="pgq_dedup_stream_")
    ev_rows = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ev_rows.unionByName(ev_rows).write.mode("overwrite").parquet(src)
    stream = ev.stream_from_parquet(spark, src)
    q = ev.run_stream_to_memory(
        ev.dedup_stream(stream, ["event_id"], watermark="365 days"),
        "bench_dedup_stream_out",
    )
    q.stop()
    return spark.table("bench_dedup_stream_out").select(
        "event_id",
        ev.epoch_us(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
    )


def q_streaming_degree(spark, sf_dir):
    """Incremental graph degree maintenance (streaming/events.degree_stream):
    the c_edges edge set replayed as a file stream, running out-/in-degree
    per vertex in complete mode; deterministic because addition commutes,
    so the final state equals the batch aggregation (the oracle)."""
    import tempfile

    setup(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="pgq_degree_stream_")
    spark.table("c_edges").select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).write.mode("overwrite").parquet(src)
    stream = ev.stream_from_parquet(spark, src, schema="src long, dst long")
    q = ev.run_stream_to_memory(
        ev.degree_stream(stream), "bench_degree_stream_out", output_mode="complete"
    )
    q.stop()
    return spark.table("bench_degree_stream_out")


O_STREAMING_DEGREE = f"""
WITH e AS ({EDGES_SQL}),
inc AS (
  SELECT src AS vid, 1 AS o, 0 AS i FROM e
  UNION ALL
  SELECT dst AS vid, 0 AS o, 1 AS i FROM e
)
SELECT vid, CAST(SUM(o) AS BIGINT) AS out_deg, CAST(SUM(i) AS BIGINT) AS in_deg
FROM inc GROUP BY vid
"""


O_STREAMING_DEDUP = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
       ROUND(value, 4) AS value
FROM events
"""


O_STREAMING_WINDOW = """
WITH wm AS (
  SELECT (epoch_us(max(ts)) // 1000) * 1000 - 3600000000 AS watermark_us
  FROM events
),
agg AS (
  SELECT epoch_us(date_trunc('day', ts)) AS start_us,
         epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY) AS end_us,
         event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
  FROM events GROUP BY 1, 2, 3
)
SELECT start_us, end_us, event_type, n_events, sum_value
FROM agg, wm WHERE end_us <= watermark_us
"""


# --------------------------------------------------------------------------
# events: windows + sessionization (streaming builders, batch-verified)
# --------------------------------------------------------------------------


def q_streaming_join(spark, sf_dir):
    """Real stream-stream interval join (streaming/events.py
    join_streams_interval): purchases attributed to the same user's views
    within 30 minutes, both sides watermarked readStreams over the events
    parquet, memory sink.  A bounded source processed by availableNow
    keeps every match in state, so the batch interval join is the exact
    oracle."""
    import tempfile

    setup(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="pgq_sjoin_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    views = ev.stream_from_parquet(spark, src).where("event_type = 'view'")
    purchases = ev.stream_from_parquet(spark, src).where("event_type = 'purchase'")
    joined = ev.join_streams_interval(
        views, purchases, key="user_id", bound="30 minutes"
    ).select(
        "user_id",
        F.col("l_event_id").alias("view_id"),
        F.col("r_event_id").alias("purchase_id"),
        (ev.epoch_us(F.col("r_ts")) - ev.epoch_us(F.col("l_ts"))).alias("gap_us"),
    )
    q = ev.run_stream_to_memory(joined, "bench_sjoin_out")
    q.stop()
    return spark.table("bench_sjoin_out")


O_STREAMING_JOIN = """
SELECT v.user_id AS user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
"""


def q_events_json(spark, sf_dir):
    """JSON property extraction from the events.props column."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k")
        )
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"))
    )


O_EVENTS_JSON = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


def q_events_daily(spark, sf_dir):
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            ev.epoch_us(F.col("day")).alias("day_us"), "event_type", "n", "sum_value"
        )
    )


O_EVENTS_DAILY = """
SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sessionize(spark, sf_dir):
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    s = ev.session_stats(events, gap_minutes=60)
    return s.select(
        "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        ev.epoch_us(F.col("session_start")).alias("start_us"),
        ev.epoch_us(F.col("session_end")).alias("end_us"),
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


O_SESSIONIZE = """
WITH flagged AS (
  SELECT *,
         CASE WHEN COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER w, 3600000001)
                   > 3600000000 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT *, SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM sessions GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# text analysis (portable formulas; see functions/text.py)
# --------------------------------------------------------------------------

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_MD5L = "('0x' || substr(md5({X}), 1, 15))::BIGINT"


def _lang_sql() -> str:
    score_cols = []
    for lang, words in TX.LANG_MARKERS.items():
        terms = " + ".join(
            f"CAST(list_contains(t, '{w}') AS INT)" for w in words
        )
        score_cols.append(f"({terms}) AS s_{lang}")
    langs = list(TX.LANG_MARKERS)
    m = "GREATEST(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = "CASE WHEN " + m + " = 0 THEN 'und' "
    for lg in langs:
        case += f"WHEN s_{lg} = {m} THEN '{lg}' "
    case += "END"
    return (
        f"WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents), "
        f"scores AS (SELECT doc_id, {', '.join(score_cols)} FROM toks) "
        f"SELECT doc_id, {case} AS lang FROM scores"
    )


def q_lang_id(spark, sf_dir):
    setup(spark, sf_dir)
    # tokens pre-projected once; CollapseProject keeps the non-cheap,
    # multiply-referenced alias as its own projection, so the regex split
    # runs once per row and the scoring stage stays inside codegen
    docs = spark.table("documents").withColumn("__toks", TX.tokens(F.col("text")))
    return docs.select(
        "doc_id", TX.lang_id(F.col("text"), toks=F.col("__toks")).alias("lang")
    )


O_LANG_ID = _lang_sql()


def q_text_stats(spark, sf_dir):
    setup(spark, sf_dir)
    docs = spark.table("documents").withColumn("__toks", TX.tokens(F.col("text")))
    t = F.col("__toks")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text"), toks=t).cast("bigint").alias("n_tok"),
        TX.quality_score(F.col("text"), toks=t).alias("quality"),
        TX.repetition_ratio(F.col("text"), 2, toks=t).alias("rep_ratio"),
        TX.doc_fingerprint(F.col("text"), 5, toks=t).alias("fingerprint"),
    )


O_TEXT_STATS = f"""
WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
feat AS (
  SELECT doc_id, text, t,
         CAST(len(t) AS BIGINT) AS n_tok,
         (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
           / GREATEST(length(text), 1) AS punct_ratio,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
           / GREATEST(length(text), 1) AS digit_ratio,
         ({" + ".join(f"CAST(list_contains(t, '{w}') AS INT)" for w in TX.LANG_MARKERS["en"])})
           / {len(TX.LANG_MARKERS["en"])}.0 AS stop_ratio,
         CASE WHEN len(t) < 5 THEN NULL
              ELSE list_aggregate(list_transform(
                     list_transform(generate_series(1, len(t) - 4),
                                    i -> array_to_string(t[i:i+4], ' ')),
                     g -> {_MD5L.format(X='g')}), 'min')
         END AS min_sh,
         CASE WHEN len(t) < 2 THEN 0.0
              ELSE ROUND(1.0 - CAST(len(list_distinct(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1]))) AS DOUBLE)
                     / (len(t) - 1), 6)
         END AS rep_ratio
  FROM toks
)
SELECT doc_id, n_tok,
       ROUND(0.4 * LEAST(CAST(n_tok AS DOUBLE) / 50.0, 1.0)
           + 0.3 * GREATEST(0.0, 1.0 - 5.0 * (punct_ratio + digit_ratio))
           + 0.3 * LEAST(1.0, stop_ratio * 2.0), 6) AS quality,
       rep_ratio,
       COALESCE(min_sh, {_MD5L.format(X='text')}) AS fingerprint
FROM feat
"""


def q_quality_repetition(spark, sf_dir):
    """Gopher-style repetition filters (dup-line fraction, dup-line char
    fraction, top-2-gram char coverage + the standard flag thresholds) —
    operators/corpus.repetition_stats over the documents table.  Explode +
    (doc, line/gram)-keyed aggregation: linear and skew-safe at corpus
    scale (the doc id in the shuffle key spreads globally hot grams)."""
    setup(spark, sf_dir)
    return corpus.repetition_stats(spark.table("documents"), "doc_id", "text")


O_QUALITY_REPETITION = f"""
WITH base AS (
  SELECT doc_id, text, CAST(length(text) AS DOUBLE) AS n_chars FROM documents
),
lines AS (
  SELECT doc_id, l AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM base)
  WHERE l <> ''
),
lc AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY doc_id, line),
lagg AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
           / sum(c) AS dlf,
         CAST(sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS DOUBLE)
           / nullif(sum(c * length(line)), 0) AS dcf
  FROM lc GROUP BY doc_id
),
toks AS (SELECT doc_id, {_TOKS} AS t FROM base),
gi AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
  FROM toks WHERE len(t) >= 2
),
gc AS (
  SELECT doc_id, (t[i] || ' ' || t[i + 1]) AS g, count(*) AS c
  FROM gi GROUP BY doc_id, g
),
gagg AS (
  SELECT doc_id, CAST(max(c * length(g)) AS DOUBLE) AS cover FROM gc
  GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(ROUND(l.dlf, 6), 0.0) AS dup_line_frac,
       COALESCE(ROUND(l.dcf, 6), 0.0) AS dup_line_char_frac,
       COALESCE(ROUND(g.cover / b.n_chars, 6), 0.0) AS top_2gram_char_frac,
       (COALESCE(ROUND(l.dlf, 6), 0.0) > 0.30
        OR COALESCE(ROUND(l.dcf, 6), 0.0) > 0.30
        OR COALESCE(ROUND(g.cover / b.n_chars, 6), 0.0) > 0.20) AS flagged
FROM base b
LEFT JOIN lagg l USING (doc_id)
LEFT JOIN gagg g USING (doc_id)
"""


def q_corpus_clean(spark, sf_dir):
    """End-to-end training-data cleaning pipeline in one plan: language
    filter (en) -> quality filter (rounded score >= 0.5, rounded on BOTH
    engines so the boundary agrees bit-exactly) -> exact dedup keeping the
    lowest doc_id per distinct text -> corpus totals.  Composes lang_id,
    quality_score, token_count and deduplicate_exact; everything stays one
    JVM-side plan with two shuffles (dedup window + final agg)."""
    setup(spark, sf_dir)
    docs = spark.table("documents").withColumn("__toks", TX.tokens(F.col("text")))
    t = F.col("__toks")
    scored = docs.select(
        "doc_id",
        "text",
        TX.lang_id(F.col("text"), toks=t).alias("lang"),
        F.round(TX.quality_score(F.col("text"), toks=t), 6).alias("q"),
        TX.token_count(F.col("text"), toks=t).cast("bigint").alias("n_tok"),
    )
    kept = scored.where((F.col("lang") == "en") & (F.col("q") >= 0.5))
    deduped = dedup.deduplicate_exact(kept, "doc_id", "text")
    # avg_quality is emitted as a 1e-4 fixed-point BIGINT so the driver's
    # value hash is integer-exact on both engines (a raw ROUND(avg,4) DOUBLE
    # can differ in the last ULP between Spark and DuckDB summation orders)
    return deduped.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.avg("q") * 10000, 0).cast("bigint").alias("avg_quality_e4"),
    )


_Q_SQL = """ROUND(0.4 * LEAST(CAST(len(t) AS DOUBLE) / 50.0, 1.0)
           + 0.3 * GREATEST(0.0, 1.0 - 5.0 *
               ((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                  / GREATEST(length(text), 1)
              + (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                  / GREATEST(length(text), 1)))
           + 0.3 * LEAST(1.0, ({stops}) / {nstops}.0 * 2.0), 6)"""


def _corpus_clean_oracle() -> str:
    stops = " + ".join(
        f"CAST(list_contains(t, '{w}') AS INT)" for w in TX.LANG_MARKERS["en"]
    )
    q = _Q_SQL.format(stops=stops, nstops=len(TX.LANG_MARKERS["en"]))
    return f"""
WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
scored AS (
  SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_tok, {q} AS q
  FROM toks
  WHERE ({_lang_case_sql()}) = 'en'
),
kept AS (SELECT * FROM scored WHERE q >= 0.5),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1)
SELECT COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(ROUND(AVG(q) * 10000, 0) AS BIGINT) AS avg_quality_e4
FROM deduped
"""


def _lang_case_sql() -> str:
    """The lang_id CASE expression over a token array column `t`."""
    score = {
        lang: "("
        + " + ".join(f"CAST(list_contains(t, '{w}') AS INT)" for w in words)
        + ")"
        for lang, words in TX.LANG_MARKERS.items()
    }
    langs = list(TX.LANG_MARKERS)
    m = "GREATEST(" + ", ".join(score[lg] for lg in langs) + ")"
    case = f"CASE WHEN {m} = 0 THEN 'und' "
    for lg in langs:
        case += f"WHEN {score[lg]} = {m} THEN '{lg}' "
    return case + "END"


O_CORPUS_CLEAN = _corpus_clean_oracle()


# --------------------------------------------------------------------------
# dedup (SURVEY §2C / BASELINE north star)
# --------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return dedup.exact_duplicates(docs, "doc_id", "text")


O_DEDUP_EXACT = f"""
SELECT {_MD5L.format(X='text')} AS content_hash,
       MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""


def q_chunk_docs(spark, sf_dir):
    """Overlapping token-window chunking (operators/corpus.py): window 40,
    overlap 8 — the standard pre-tokenizer step of a training-data
    pipeline, one row per chunk, pure JVM explode."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    out = corpus.chunk_documents(docs, "doc_id", "text", chunk_tokens=40, overlap=8)
    return out.select(
        F.col("id").alias("doc_id"), "chunk_id", "chunk_text", "n_chunk_tok"
    )


O_CHUNK_DOCS = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
starts AS (
  SELECT doc_id, t, unnest(generate_series(1, greatest(len(t), 1), 32)) AS s
  FROM toks WHERE len(t) > 0
)
SELECT doc_id, CAST((s - 1) // 32 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(t, s, s + 39), ' ') AS chunk_text,
       CAST(len(list_slice(t, s, s + 39)) AS BIGINT) AS n_chunk_tok
FROM starts
"""


def q_pack_sequences(spark, sf_dir):
    """Next-fit sequence packing (operators/corpus.py): documents into
    512-token training bins across 8 deterministic hash shards — the
    batch-construction step after chunking/cleaning.  Shards pack in
    parallel (applyInPandas); the oracle replays the same next-fit scan
    with a recursive CTE."""
    setup(spark, sf_dir)
    docs = spark.table("documents").withColumn("__toks", TX.tokens(F.col("text")))
    meta = docs.select(
        "doc_id",
        TX.token_count(F.col("text"), toks=F.col("__toks")).cast("long").alias("n_tok"),
    )
    packed = corpus.pack_sequences(meta, "doc_id", "n_tok", budget=512, num_shards=8)
    return packed.select(F.col("id").alias("doc_id"), "n_tok", "shard", "bin_id")


O_PACK_SEQUENCES = f"""
WITH RECURSIVE ordered AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tok,
         {_MD5L.format(X="CAST(doc_id AS VARCHAR)")} % 8 AS shard,
         row_number() OVER (
           PARTITION BY {_MD5L.format(X="CAST(doc_id AS VARCHAR)")} % 8
           ORDER BY doc_id) AS rn
  FROM documents
),
pack AS (
  SELECT shard, rn, doc_id, n_tok, CAST(0 AS BIGINT) AS bin_id, n_tok AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.n_tok,
         CASE WHEN p.fill + o.n_tok > 512 THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + o.n_tok > 512 THEN o.n_tok ELSE p.fill + o.n_tok END
  FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT doc_id, n_tok, shard, bin_id FROM pack
"""


def q_dataset_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split
    (operators/corpus.split_dataset): md5(doc_id|split) % 1e6 against
    cumulative boundaries — reproducible, leakage-free partitioning;
    reported as per-(split, source) doc and char totals."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    out = corpus.split_dataset(docs, "doc_id")
    return out.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )


O_DATASET_SPLIT = f"""
WITH assigned AS (
  SELECT source, n_chars,
         CASE WHEN {_MD5L.format(X="CAST(doc_id AS VARCHAR) || 'split'")}
                   % 1000000 < 800000 THEN 'train'
              WHEN {_MD5L.format(X="CAST(doc_id AS VARCHAR) || 'split'")}
                   % 1000000 < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM assigned GROUP BY split, source
"""


def q_split_entropy(spark, sf_dir):
    """Split diversity diagnostic (operators/relational.group_entropy
    over corpus.split_dataset): Shannon entropy of the source
    distribution inside each train/val/test split — "did the split keep
    the source mix" in one number per split."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    assigned = corpus.split_dataset(docs, "doc_id")
    out = relational.group_entropy(assigned, "split", "source")
    return out.select(
        F.col("grp").alias("split"), "n", "n_labels", "entropy"
    )


O_SPLIT_ENTROPY = f"""
WITH assigned AS (
  SELECT source,
         CASE WHEN {_MD5L.format(X="CAST(doc_id AS VARCHAR) || 'split'")}
                   % 1000000 < 800000 THEN 'train'
              WHEN {_MD5L.format(X="CAST(doc_id AS VARCHAR) || 'split'")}
                   % 1000000 < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
counts AS (
  SELECT split, source, COUNT(*) AS c FROM assigned GROUP BY split, source
),
withp AS (
  SELECT split, c,
         CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY split) AS p
  FROM counts
)
SELECT split, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_labels,
       ROUND(SUM(-p * ln(p)), 6) AS entropy
FROM withp GROUP BY split
"""


def q_avg_path_length(spark, sf_dir):
    """Average finite shortest-path length from the seed set
    (small-world diagnostic): one batched multi-source BFS from
    customers 0-7 (the closeness kernel), folded to a single
    (n_pairs, avg_dist) row — the companion number to diameter/
    eccentricity in every graph report."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") < 8).select(
        F.col("c_custkey").cast("long")
    )
    dists = pathops.bfs_distances(
        edges.select("src", "dst"), sources=seeds.toDF("vid")
    )
    pos = dists.where(F.col("dist") > 0)
    return pos.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("dist"), 6).alias("avg_dist"),
    )


O_AVG_PATH_LENGTH = _with_e(
    # d < 60 is a runaway guard, not a semantic bound: UNION dedups the
    # frontier so the recursion stops at saturation (graph diameter,
    # measured < 10 on every test tier) long before the cap; the Spark
    # side is unbounded, so the cap must exceed any seed eccentricity —
    # 60 leaves 6x margin where the previous 30 left 3x
    """, bfs(src, dst, d) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 8
  UNION
  SELECT b.src, e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.dst WHERE b.d < 60),
mind AS (SELECT src, dst, MIN(d) AS d FROM bfs GROUP BY src, dst)
SELECT COUNT(*) AS n_pairs, ROUND(AVG(d), 6) AS avg_dist
FROM mind WHERE d > 0""",
    recursive=True,
)


def q_burstiness(spark, sf_dir):
    """Per-user inter-event burstiness (Goh-Barabasi
    B = (sigma - mu)/(sigma + mu) over inter-event gaps): B -> -1 for
    periodic activity, 0 for Poisson, +1 for extreme bursts — the
    standard temporal-behavior fingerprint.  One lag window for the
    gaps + one per-user aggregate; users need >= 3 events (two gaps)."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(ev.epoch_us(F.col("ts")), "event_id")
    ts_us = ev.epoch_us(F.col("ts"))
    gaps = (
        events.withColumn("__gap", ts_us - F.lag(ts_us).over(w))
        .where(F.col("__gap").isNotNull())
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.avg("__gap").alias("__mu"),
        F.stddev_samp("__gap").alias("__sd"),
    )
    return stats.where(
        (F.col("n_gaps") >= 2) & ((F.col("__sd") + F.col("__mu")) > 0)
    ).select(
        "user_id",
        "n_gaps",
        F.round(
            (F.col("__sd") - F.col("__mu")) / (F.col("__sd") + F.col("__mu")), 4
        ).alias("burstiness"),
    )


O_BURSTINESS = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
  FROM events
),
stats AS (
  SELECT user_id, COUNT(*) AS n_gaps, AVG(gap) AS mu, stddev_samp(gap) AS sd
  FROM gaps WHERE gap IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_gaps, ROUND((sd - mu) / (sd + mu), 4) AS burstiness
FROM stats WHERE n_gaps >= 2 AND (sd + mu) > 0
"""


def q_degree_powerlaw(spark, sf_dir):
    """Degree power-law exponent (algorithms.degree_powerlaw_alpha,
    beyond-reference): Clauset-Shalizi-Newman discrete MLE over the
    undirected degree tail deg >= 2 — the one-number heavy-tail
    diagnostic."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    return algorithms.degree_powerlaw_alpha(edges, kmin=2)


O_DEGREE_POWERLAW = _with_e(
    """, und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e WHERE src <> dst
    UNION ALL SELECT dst, src FROM e WHERE src <> dst)),
deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
tail AS (SELECT deg FROM deg WHERE deg >= 2)
SELECT 2 AS kmin, COUNT(*) AS n_tail,
       ROUND(1.0 + COUNT(*) / SUM(ln(CAST(deg AS DOUBLE) / 1.5)), 6) AS alpha
FROM tail""",
)


def q_materialize_packs(spark, sf_dir):
    """Pack materialization (operators/corpus.materialize_packs): the
    512-token/8-shard next-fit assignment concatenated into actual
    training sequences (id-ordered members around <eos>) — one row per
    bin with the verbatim packed text; the oracle replays the recursive
    next-fit scan plus string_agg ORDER BY."""
    setup(spark, sf_dir)
    docs = spark.table("documents").withColumn("__toks", TX.tokens(F.col("text")))
    base = docs.select(
        "doc_id",
        "text",
        TX.token_count(F.col("text"), toks=F.col("__toks")).cast("long").alias("n_tok"),
    )
    out = corpus.materialize_packs(
        base, "doc_id", "text", "n_tok", budget=512, num_shards=8
    )
    return out.select(
        "shard", "bin_id", "n_docs",
        F.col("n_tokens").cast("bigint").alias("n_tokens"), "packed_text",
    )


O_MATERIALIZE_PACKS = f"""
WITH RECURSIVE ordered AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tok,
         {_MD5L.format(X="CAST(doc_id AS VARCHAR)")} % 8 AS shard,
         row_number() OVER (
           PARTITION BY {_MD5L.format(X="CAST(doc_id AS VARCHAR)")} % 8
           ORDER BY doc_id) AS rn
  FROM documents
),
pack AS (
  SELECT shard, rn, doc_id, n_tok, CAST(0 AS BIGINT) AS bin_id, n_tok AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.n_tok,
         CASE WHEN p.fill + o.n_tok > 512 THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + o.n_tok > 512 THEN o.n_tok ELSE p.fill + o.n_tok END
  FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT p.shard, p.bin_id, COUNT(*) AS n_docs,
       CAST(SUM(p.n_tok) AS BIGINT) AS n_tokens,
       string_agg(d.text, '<eos>' ORDER BY p.doc_id) AS packed_text
FROM pack p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY p.shard, p.bin_id
"""


def q_det_sample(spark, sf_dir):
    """Deterministic content-hash Bernoulli sample (operators/corpus.py):
    the same rows are kept on every engine/run — reproducible corpus
    slicing, expressed as a pushdown-able filter."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return corpus.deterministic_sample(docs, "doc_id", 0.25, salt="s1").select(
        "doc_id"
    )


O_DET_SAMPLE = f"""
SELECT doc_id FROM documents
WHERE {_MD5L.format(X="CAST(doc_id AS VARCHAR) || 's1'")} % 1000000 < 250000
"""


def q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic sampling (operators/corpus.py):
    reweight the corpus by language — keep 80% en, 50% de, 0% zh, 25%
    of everything else — with a pure content-hash draw (reproducible,
    nested by rate, pushdown-able filter; no join, no shuffle)."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return corpus.stratified_sample(
        docs, "doc_id", "lang",
        {"en": 0.8, "de": 0.5, "zh": 0.0}, default_rate=0.25, salt="s1",
    ).select("doc_id", "lang")


def q_mixture_sample(spark, sf_dir):
    """Token-budget mixture sampling (operators/corpus.mixture_sample):
    draw a deterministic subcorpus targeting 5000 tokens split
    50% en / 30% zh / 20% fr — per-group keep-rates derived from the
    group token totals, applied as the shared content-hash Bernoulli
    draw (reproducible; corpus side is scan + broadcast join + filter,
    no shuffle)."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return corpus.mixture_sample(
        docs, "doc_id", "text", "lang",
        {"en": 0.5, "zh": 0.3, "fr": 0.2}, token_budget=5000, salt="m1",
    )


def _mixture_oracle() -> str:
    # identical driver-side numerator folding as mixture_sample: ONE
    # double literal per group, leaving a single runtime division
    weights = {"en": 0.5, "zh": 0.3, "fr": 0.2}
    budget, buckets = 5000, 1_000_000
    sumw = float(sum(weights.values()))
    arms = " ".join(
        f"WHEN '{g}' THEN {float(budget) * (float(w) / sumw) * buckets!r}"
        for g, w in weights.items()
    )
    return f"""
WITH toks AS (SELECT doc_id, lang, len({_TOKS}) AS ntok FROM documents),
tg AS (SELECT lang, SUM(ntok) AS tg FROM toks GROUP BY lang),
thr AS (SELECT lang, LEAST(1000000, COALESCE(CAST(FLOOR(
          (CASE lang {arms} ELSE 0.0 END) / CAST(NULLIF(tg, 0) AS DOUBLE))
        AS BIGINT), 0)) AS thr FROM tg)
SELECT t.doc_id, t.lang, CAST(t.ntok AS BIGINT) AS n_tok
FROM toks t JOIN thr USING (lang)
WHERE {_MD5L.format(X="CAST(doc_id AS VARCHAR) || 'm1'")} % 1000000 < thr
"""


O_MIXTURE_SAMPLE = _mixture_oracle()


O_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE {_MD5L.format(X="CAST(doc_id AS VARCHAR) || 's1'")} % 1000000 <
      CASE lang WHEN 'zh' THEN 0 WHEN 'de' THEN 500000
                WHEN 'en' THEN 800000 ELSE 250000 END
"""


def q_vocab_stats(spark, sf_dir):
    """Corpus vocabulary table (operators/corpus.vocab_stats): per token,
    total occurrences + document frequency via the two-phase (token,doc)
    -> token aggregation (map-side combine collapses per-doc repeats
    before the only shuffle)."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return corpus.vocab_stats(docs, "doc_id", "text")


O_VOCAB_STATS = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, u.token FROM toks, UNNEST(t) AS u(token)),
per_doc AS (SELECT token, doc_id, COUNT(*) AS n FROM tok GROUP BY 1, 2)
SELECT token, CAST(SUM(n) AS BIGINT) AS occurrences, COUNT(*) AS doc_freq
FROM per_doc GROUP BY token
"""


def q_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document (operators/corpus.tfidf):
    tf * ln(N/df) over whitespace tokens, WindowGroupLimit top-n,
    deterministic token tie-break; scores rounded to 6 for the
    cross-engine hash."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    out = corpus.tfidf(docs, "doc_id", "text", top_n=3)
    return out.select("doc_id", "token", "tf", F.round("tfidf", 6).alias("tfidf"))


O_TFIDF = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, u.token FROM toks, UNNEST(t) AS u(token)),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT token, COUNT(*) AS dfreq FROM tf GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
sc AS (
  SELECT tf.doc_id, tf.token, tf.tf, tf.tf * ln(n.n / dfq.dfreq) AS score
  FROM tf CROSS JOIN n JOIN dfq USING (token)
),
r AS (
  SELECT doc_id, token, tf, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token ASC) AS rk
  FROM sc
)
SELECT doc_id, token, tf, ROUND(score, 6) AS tfidf FROM r WHERE rk <= 3
"""


def q_dedup_fingerprint(spark, sf_dir):
    setup(spark, sf_dir)
    docs = spark.table("documents").withColumn("__toks", TX.tokens(F.col("text")))
    fp = docs.select(
        "doc_id", TX.doc_fingerprint(F.col("text"), 5, toks=F.col("__toks")).alias("fp")
    )
    return (
        fp.groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


O_DEDUP_FINGERPRINT = f"""
WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
fp AS (
  SELECT doc_id,
         COALESCE(
           CASE WHEN len(t) < 5 THEN NULL
                ELSE list_aggregate(list_transform(
                       list_transform(generate_series(1, len(t) - 4),
                                      i -> array_to_string(t[i:i+4], ' ')),
                       g -> {_MD5L.format(X='g')}), 'min')
           END, {_MD5L.format(X='text')}) AS fp
  FROM toks
)
SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
FROM fp GROUP BY fp HAVING COUNT(*) > 1
"""


def q_dedup_jaccard(spark, sf_dir):
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


O_DEDUP_JACCARD = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, g FROM toks,
  UNNEST(CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(generate_series(1, len(t) - 2),
                             i -> array_to_string(t[i:i+2], ' ')) END) AS u(g)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
shared AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, COUNT(*) AS shared
  FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5
"""


def q_containment_dedup(spark, sf_dir):
    """Asymmetric shingle containment (dedup.containment_pairs): ordered
    pairs where >= 60% of a's trigram-shingle set sits inside b — the
    doc-embedded-in-doc case symmetric Jaccard misses.  Candidates are
    prefix-filtered (lossless, Bayardo-style adapted to the asymmetric
    bound); the oracle replays the unfiltered all-pairs definition.

    Shingle width is 3 (r8): on this small-vocabulary synthetic corpus
    bigrams are so dense the prefix filter cannot prune (11.77M of
    12.5M candidate pairs survive — the recorded worst case, 27 s at
    sf0.1), while trigrams restore the sparsity the filter exploits
    (3.5 s, same exact-containment semantics, near-identical pair set:
    512 vs 537 pairs)."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return dedup.containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6).select(
        "id_a", "id_b", "containment",
        F.col("sz_a").cast("bigint").alias("sz_a"),
        F.col("sz_b").cast("bigint").alias("sz_b"),
    )


O_CONTAINMENT_DEDUP = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, g FROM toks,
  UNNEST(CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(generate_series(1, len(t) - 2),
                             i -> array_to_string(t[i:i+2], ' ')) END) AS u(g)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
shared AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, COUNT(*) AS shared
  FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id <> r.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(CAST(shared AS DOUBLE) / sa.sz, 6) AS containment,
       sa.sz AS sz_a, sb.sz AS sz_b
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(CAST(shared AS DOUBLE) / sa.sz, 6) >= 0.6
"""


def q_dedup_minhash(spark, sf_dir):
    setup(spark, sf_dir)
    docs = spark.table("documents")
    sig = dedup.minhash_signatures(docs, "doc_id", "text", n=2, num_perm=8)
    return sig.select(
        F.col("id").alias("doc_id"),
        F.posexplode("sig"),
    ).select("doc_id", F.col("pos").cast("bigint").alias("perm"), F.col("col").alias("minhash"))


def _minhash_oracle(num_perm: int = 8) -> str:
    selects = []
    for i, (a, b) in enumerate(minhash_params(num_perm)):
        selects.append(
            f"SELECT doc_id, {i} AS perm, "
            f"MIN(({a} * h31 + {b}) % {MINHASH_PRIME}) AS minhash FROM hashes GROUP BY doc_id"
        )
    body = " UNION ALL ".join(selects)
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, g FROM toks,
  UNNEST(CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(generate_series(1, len(t) - 1),
                             i -> array_to_string(t[i:i+1], ' ')) END) AS u(g)
),
hashes AS (SELECT doc_id, {_MD5L.format(X='g')} % {MINHASH_PRIME} AS h31 FROM sh)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(perm AS BIGINT) AS perm, minhash
FROM ({body})
"""


O_DEDUP_MINHASH = _minhash_oracle(8)


def q_simhash(spark, sf_dir):
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return dedup.simhash(docs, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "simhash"
    )


def _simhash_oracle(bits: int = 32) -> str:
    sums = ", ".join(
        f"SUM(2 * ((h >> {b}) & 1) - 1) AS b{b}" for b in range(bits)
    )
    val = " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(bits)
    )
    return f"""
WITH toks AS (SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents),
hashes AS (SELECT doc_id, {_MD5L.format(X='tok')} AS h FROM toks),
bitsums AS (SELECT doc_id, {sums} FROM hashes GROUP BY doc_id)
SELECT doc_id, {val} AS simhash FROM bitsums
"""


O_SIMHASH = _simhash_oracle(32)


def q_minhash_lsh_pairs(spark, sf_dir):
    """LSH banding with fixed permutation constants (dedup.minhash_params)
    is fully deterministic, so the DuckDB oracle replays the identical
    signature -> band -> candidate -> estimate pipeline in SQL."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=2, num_perm=16, bands=8, threshold=0.5
    )


def _minhash_lsh_parts(
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    src: str = "documents",
    p: str = "",
) -> list[str]:
    """The MinHash+LSH pipeline as reusable CTE parts ending in
    `{p}scored` (id_a, id_b, est_jaccard >= threshold).  `src` is any
    table/CTE exposing (doc_id, text); `p` prefixes every CTE name so
    the parts can be embedded in a larger WITH without collisions
    (used by O_MINHASH_LSH_PAIRS and O_PIPELINE_CORPUS)."""
    rows = num_perm // bands
    mins = ", ".join(
        f"MIN(({a} * h31 + {b}) % {MINHASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(minhash_params(num_perm))
    )
    sig_list = "[" + ", ".join(f"m{i}" for i in range(num_perm)) + "]"
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {h} AS bh FROM {p}sig".format(
            b=b,
            p=p,
            h=_MD5L.format(
                X=" || '-' || ".join(
                    f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows)
                )
            ),
        )
        for b in range(bands)
    )
    return [
        f"{p}toks AS (SELECT doc_id, {_TOKS} AS t FROM {src})",
        f"""{p}sh AS (
  SELECT DISTINCT doc_id, g FROM {p}toks,
  UNNEST(CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(generate_series(1, len(t) - 1),
                             i -> array_to_string(t[i:i+1], ' ')) END) AS u(g)
)""",
        f"{p}hashes AS (SELECT doc_id, {_MD5L.format(X='g')} % {MINHASH_PRIME} AS h31 FROM {p}sh)",
        f"{p}sig0 AS (SELECT doc_id, {mins} FROM {p}hashes GROUP BY doc_id)",
        f"{p}sig AS MATERIALIZED (SELECT doc_id, {sig_list} AS sig FROM {p}sig0)",
        f"{p}banded AS MATERIALIZED ({band_rows})",
        f"""{p}cands AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM {p}banded l JOIN {p}banded r ON l.band = r.band AND l.bh = r.bh
  WHERE l.doc_id < r.doc_id
)""",
        f"""{p}scored AS (
  SELECT c.id_a, c.id_b,
         ROUND(len(list_filter(generate_series(1, {num_perm}),
                               i -> sa.sig[i] = sb.sig[i])) / {num_perm}.0,
               6) AS est_jaccard
  FROM {p}cands c
  JOIN {p}sig sa ON sa.doc_id = c.id_a
  JOIN {p}sig sb ON sb.doc_id = c.id_b
)""",
    ]


def _minhash_lsh_oracle(num_perm: int = 16, bands: int = 8, threshold: float = 0.5) -> str:
    body = ",\n".join(_minhash_lsh_parts(num_perm, bands, threshold))
    return f"""
WITH {body}
SELECT id_a, id_b, est_jaccard FROM scored WHERE est_jaccard >= {threshold}
"""


O_MINHASH_LSH_PAIRS = _minhash_lsh_oracle(16, 8, 0.5)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clusters over the LSH pair graph: transitive closure ->
    canonical min-id representative (operators/dedup.dedup_clusters).
    Same fixed LSH params as minhash_lsh_pairs, so the DuckDB oracle
    closes over the identical pair set with a recursive CTE."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return dedup.dedup_clusters(
        docs, "doc_id", "text", n=2, num_perm=16, bands=8, threshold=0.5
    )


O_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({_minhash_lsh_oracle(16, 8, 0.5)}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id FROM reach GROUP BY a)
SELECT c.doc_id, c.canonical_id, s.cluster_size
FROM comp c
JOIN (SELECT canonical_id, COUNT(*) AS cluster_size FROM comp GROUP BY canonical_id) s
  USING (canonical_id)
"""


def q_contamination(spark, sf_dir):
    """Eval-decontamination check (operators/corpus.ngram_contamination):
    distinct word-3-gram overlap of each corpus document against a
    pseudo-benchmark slice (doc_id % 50 == 0); flag docs sharing >= 2
    distinct 3-grams."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corp = docs.where(F.col("doc_id") % 50 != 0)
    return corpus.ngram_contamination(
        corp, bench, "doc_id", "text", n=3, min_overlap=2
    )


O_CONTAMINATION = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id, g FROM toks,
  UNNEST(CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(generate_series(1, len(t) - 2),
                             i -> array_to_string(t[i:i+2], ' ')) END) AS u(g)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
corp AS (SELECT doc_id, g FROM grams WHERE doc_id % 50 != 0)
SELECT c.doc_id, COUNT(*) AS overlap_ngrams
FROM corp c JOIN bench b USING (g)
GROUP BY c.doc_id
HAVING COUNT(*) >= 2
"""


# --------------------------------------------------------------------------
# similarity search (SURVEY §2C)
# --------------------------------------------------------------------------


def _emb_double(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def q_similarity_topk(spark, sf_dir):
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10)
    top = similarity.brute_force_topk(emb, queries, k=5)
    return top.select(
        "query_id", "vec_id", "cosine_sim", F.col("rank").cast("bigint").alias("rank")
    )


O_SIMILARITY_TOPK = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         ROUND(list_dot_product(q.v, c.v) /
               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
           AS cosine_sim
  FROM (SELECT * FROM emb WHERE vec_id < 10) q
  JOIN emb c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT query_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


def q_embedding_near_dup(spark, sf_dir):
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir).where(F.col("vec_id") < 300)
    return similarity.exact_near_duplicates(emb, threshold=0.3)


O_EMBEDDING_NEAR_DUP = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings WHERE vec_id < 300),
sims AS (
  SELECT l.vec_id AS id_a, r.vec_id AS id_b,
         ROUND(list_dot_product(l.v, r.v) /
               (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v))), 6)
           AS cosine_sim
  FROM emb l JOIN emb r ON l.vec_id < r.vec_id
)
SELECT id_a, id_b, cosine_sim FROM sims WHERE cosine_sim >= 0.3
"""


def q_ann_lsh(spark, sf_dir):
    """Approximate by construction but fully deterministic: the LCG
    hyperplanes (similarity.hyperplanes) are fixed literals, so the DuckDB
    oracle recomputes the identical sign-bucket blocking + in-bucket exact
    cosine ranking."""
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.lsh_topk(emb, queries, k=5, num_planes=4).select(
        "query_id", "vec_id", "cosine_sim", F.col("rank").cast("bigint").alias("rank")
    )


def _ann_lsh_oracle(num_planes: int = 4, dim: int = 64, k: int = 5) -> str:
    planes = similarity.hyperplanes(num_planes, dim)
    bucket = " + ".join(
        "(CASE WHEN list_dot_product(v, [{vals}]) > 0 THEN {bit} ELSE 0 END)".format(
            vals=", ".join(repr(x) for x in plane), bit=1 << p
        )
        for p, plane in enumerate(planes)
    )
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bkt AS (SELECT vec_id, v, {bucket} AS bucket FROM emb),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         ROUND(list_dot_product(q.v, c.v) /
               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
           AS cosine_sim
  FROM (SELECT * FROM bkt WHERE vec_id < 10) q
  JOIN bkt c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT query_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


O_ANN_LSH = _ann_lsh_oracle(4, 64, 5)


def q_ann_ivf(spark, sf_dir):
    """IVF-Flat ANN (similarity.ivf_topk): nlist inverted lists from
    deterministic seed centroids (the nlist lowest vec_ids, iterations=0
    so the oracle can rebuild the identical centroid set in SQL), nprobe
    lists searched exactly per query."""
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, k=5, nlist=8, nprobe=2).select(
        "query_id", "vec_id", "cosine_sim", F.col("rank").cast("bigint").alias("rank")
    )


O_ANN_IVF = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM emb ORDER BY vec_id LIMIT 8),
csim AS (
  SELECT e.vec_id, e.v, c.cid,
         list_dot_product(e.v, c.cv) /
           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS sim
  FROM emb e CROSS JOIN cent c),
asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
    FROM csim) WHERE rn = 1),
probe AS (
  SELECT vec_id AS query_id, v AS qv, cid FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
    FROM csim WHERE vec_id < 10) WHERE rn <= 2),
sims AS (
  SELECT p.query_id, a.vec_id,
         ROUND(list_dot_product(p.qv, a.v) /
               (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))), 6)
           AS cosine_sim
  FROM probe p JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC) AS rank
  FROM sims)
SELECT query_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


def q_ann_ivf_index(spark, sf_dir):
    """Standing-index IVF route (similarity.write_ivf_index +
    ivf_topk_from_index): the inverted-list assignment is paid ONCE at
    index build (cached per sf tier on local scratch — at 100 TB this is
    the bucketed/partitioned standing table) and the query batch reads
    only its probed list directories via static partition pruning
    (PartitionFilters plan-pinned in test_similarity).  Same
    (nlist, nprobe, k) as ann_ivf, so the top-k is hash-identical; this
    gate times the amortized query plan where ann_ivf times
    build+query per run."""
    import os

    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    path = os.path.join(
        "/tmp/duckpgq_ivf_index", os.path.basename(os.path.normpath(sf_dir))
    )
    if not os.path.exists(os.path.join(path, "corpus", "_SUCCESS")):
        similarity.write_ivf_index(emb, path, nlist=8)
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.ivf_topk_from_index(
        spark, path, queries, k=5, nprobe=2
    ).select(
        "query_id", "vec_id", "cosine_sim", F.col("rank").cast("bigint").alias("rank")
    )


# identical semantics to the in-memory route — the index is a layout, not
# a different algorithm — so the oracle is shared
O_ANN_IVF_INDEX = O_ANN_IVF


def q_ann_ivfpq(spark, sf_dir):
    """IVF-PQ ANN (similarity.ivfpq_topk): the corpus compressed to m=8
    one-byte codes per vector (32x smaller than dim-64 float64), coarse
    IVF routing (nlist=8, nprobe=2), ADC scoring via fixed-point integer
    sums so the score is hash-stable across engines.  iterations=0 so the
    oracle rebuilds the identical codebooks (slot-s subvectors of the 16
    lowest-id normalized vectors) in SQL."""
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.ivfpq_topk(
        emb, queries, k=5, nlist=8, nprobe=2, m=8, ksub=16
    ).select(
        "query_id", "vec_id", "adc_score", F.col("rank").cast("bigint").alias("rank")
    )


def q_ann_ivfpq_index(spark, sf_dir):
    """Standing-index IVF-PQ route (similarity.write_pq_index +
    ivfpq_topk_from_index): codebooks/centroids and the exploded
    (vec_id, s, code) table — 32x smaller than the vectors — are built
    ONCE per tier (cached on scratch); the timed query reads only its
    probed list partitions and never touches a vector.  Same
    (nlist, nprobe, m, ksub, k) as ann_ivfpq, so the ADC top-k is
    hash-identical (shared oracle)."""
    import os

    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    path = os.path.join(
        "/tmp/duckpgq_pq_index", os.path.basename(os.path.normpath(sf_dir))
    )
    if not os.path.exists(os.path.join(path, "codes", "_SUCCESS")):
        similarity.write_pq_index(emb, path, nlist=8, m=8, ksub=16)
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.ivfpq_topk_from_index(
        spark, path, queries, k=5, nprobe=2
    ).select(
        "query_id", "vec_id", "adc_score", F.col("rank").cast("bigint").alias("rank")
    )


O_ANN_IVFPQ = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nrm AS (
  SELECT vec_id, v,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
  FROM emb),
cent AS (SELECT vec_id AS cid, v AS cv FROM emb ORDER BY vec_id LIMIT 8),
-- coarse assignment: raw-vector cosine (scale-invariant, mirrors Spark)
csim AS (
  SELECT e.vec_id, c.cid,
         list_dot_product(e.v, c.cv) /
           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS sim
  FROM emb e CROSS JOIN cent c),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
    FROM csim) WHERE rn = 1),
-- PQ codebooks: slot s codewords = slot-s slices of the 16 lowest-id
-- NORMALIZED vectors (iterations=0 seeding, bit-identical to Spark)
seeds AS (
  SELECT nv, row_number() OVER (ORDER BY vec_id) - 1 AS code
  FROM (SELECT vec_id, nv FROM nrm ORDER BY vec_id LIMIT 16)),
slots AS (SELECT UNNEST(range(8)) AS s),
books AS (
  SELECT s.s, d.code, list_slice(d.nv, s.s * 8 + 1, s.s * 8 + 8) AS cw
  FROM seeds d CROSS JOIN slots s),
-- encode: argmin-L2 code per (vector, slot); |x|^2 dropped as constant
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT n.vec_id, b.s, b.code,
           row_number() OVER (PARTITION BY n.vec_id, b.s ORDER BY
             list_dot_product(b.cw, b.cw)
               - 2 * list_dot_product(list_slice(n.nv, b.s * 8 + 1, b.s * 8 + 8), b.cw) ASC,
             b.code ASC) AS rn
    FROM nrm n CROSS JOIN books b) WHERE rn = 1),
-- probe: normalized query vs raw centroid (exactly Spark's expression)
probe AS (
  SELECT vec_id AS query_id, nv AS qv, cid FROM (
    SELECT n.vec_id, n.nv, c.cid,
           row_number() OVER (PARTITION BY n.vec_id ORDER BY
             list_dot_product(n.nv, c.cv) /
               (sqrt(list_dot_product(n.nv, n.nv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             c.cid ASC) AS rn
    FROM nrm n CROSS JOIN cent c WHERE n.vec_id < 10) WHERE rn <= 2),
-- ADC: per-slot <q_slot, codeword> terms in 1e-9 fixed point, integer sum
adc AS (
  SELECT p.query_id, a.vec_id,
         SUM(CAST(ROUND(list_dot_product(
               list_slice(p.qv, c.s * 8 + 1, c.s * 8 + 8), b.cw) * 1e9) AS BIGINT)) AS fp
  FROM probe p
  JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
  JOIN codes c ON c.vec_id = a.vec_id
  JOIN books b ON b.s = c.s AND b.code = c.code
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, vec_id, ROUND(fp / 1e9, 6) AS adc_score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY ROUND(fp / 1e9, 6) DESC, vec_id ASC) AS rank
  FROM adc)
SELECT query_id, vec_id, adc_score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


def q_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection (similarity.
    random_projection): 64 -> 8 dims onto deterministic LCG hyperplanes;
    the oracle rebuilds the identical plane literals, so every projected
    coordinate hash-matches."""
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    proj = similarity.random_projection(emb, 8)
    return proj.select(
        "id", *[F.round(F.element_at("proj", j + 1), 6).alias(f"p{j}") for j in range(8)]
    )


def _random_projection_oracle(out_dim: int = 8, dim: int = 64) -> str:
    planes = similarity.hyperplanes(out_dim, dim)
    cols = ",\n       ".join(
        "ROUND(list_dot_product(v, [{vals}]), 6) AS p{j}".format(
            vals=", ".join(repr(x) for x in p), j=j
        )
        for j, p in enumerate(planes)
    )
    return f"""
WITH emb AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT id,
       {cols}
FROM emb
"""


O_RANDOM_PROJECTION = _random_projection_oracle()


def q_quantize_int8(spark, sf_dir):
    """Scalar int8 quantization (similarity.quantize_int8): per-dimension
    min/max calibration over the corpus, values mapped to [-127, 127];
    exploded to (id, pos, code) for value-level hashing."""
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    q = similarity.quantize_int8(emb)
    return q.select("id", F.posexplode("codes").alias("pos", "code")).select(
        "id", F.col("pos").cast("bigint").alias("pos"), "code"
    )


O_QUANTIZE_INT8 = """
WITH emb AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pe AS (
  SELECT id, CAST(z[2] - 1 AS BIGINT) AS pos, CAST(z[1] AS DOUBLE) AS x
  FROM (SELECT id, UNNEST(list_zip(v, range(1, len(v) + 1))) AS z FROM emb)),
bounds AS (SELECT pos, MIN(x) AS lo, MAX(x) AS hi FROM pe GROUP BY pos)
SELECT p.id, p.pos,
       CAST(CASE WHEN b.hi > b.lo
                 THEN ROUND((p.x - b.lo) / (b.hi - b.lo) * 254.0) - 127
                 ELSE 0 END AS INT) AS code
FROM pe p JOIN bounds b USING (pos)
"""


def q_ann_recall(spark, sf_dir):
    """ANN evaluation (similarity.ann_recall): per-query recall@5 of the
    IVF-Flat result against the exact brute-force baseline — the tuning
    metric for nprobe/nlist/PQ knobs, computed as a DataFrame op so the
    evaluation itself runs at corpus scale."""
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(emb, queries, k=5, nlist=8, nprobe=2)
    return similarity.ann_recall(approx, exact, k=5)


O_ANN_RECALL = f"""
WITH approx AS ({O_ANN_IVF}),
exact AS ({O_SIMILARITY_TOPK}),
hits AS (
  SELECT a.query_id, COUNT(*) AS n_hits
  FROM approx a JOIN exact e
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY 1),
tot AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY 1)
SELECT t.query_id, COALESCE(h.n_hits, 0) AS n_hits, t.n_exact,
       ROUND(COALESCE(h.n_hits, 0) / CAST(t.n_exact AS DOUBLE), 6) AS recall
FROM tot t LEFT JOIN hits h USING (query_id)
"""


# --------------------------------------------------------------------------
# multimodal plumbing (decode dimensions are derivable from byte length)
# --------------------------------------------------------------------------


def q_embedding_clusters(spark, sf_dir):
    """Embedding-space corpus clustering: nearest-centroid assignment over
    deterministic seed centroids (the k-means labeling step / IVF list
    build), aggregated to per-cluster sizes.  Assignment is a pure column
    expression with broadcast centroid literals — one scan + one shuffle."""
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    cents = similarity.ivf_centroids(emb, nlist=8)
    return (
        similarity.assign_clusters(emb, cents)
        .groupBy("cluster")
        .agg(F.count("*").alias("n_members"), F.min("id").alias("min_member"))
    )


O_EMBEDDING_CLUSTERS = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM emb ORDER BY vec_id LIMIT 8),
csim AS (
  SELECT e.vec_id, c.cid,
         list_dot_product(e.v, c.cv) /
           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS sim
  FROM emb e CROSS JOIN cent c),
asg AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
    FROM csim) WHERE rn = 1)
SELECT cluster, COUNT(*) AS n_members, MIN(vec_id) AS min_member
FROM asg GROUP BY cluster
"""


def q_multimodal_decode(spark, sf_dir):
    setup(spark, sf_dir)
    docs = spark.table("documents")
    media = multimodal.attach_media(
        docs.select("doc_id", F.encode("text", "utf-8").alias("b")), "doc_id", "b", "image"
    )
    return multimodal.decode_images(media).select(
        "media_id", F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
    )


O_MULTIMODAL_DECODE = """
SELECT doc_id AS media_id,
       CAST(16 + octet_length(encode(text)) % 64 AS BIGINT) AS width,
       CAST(16 + (octet_length(encode(text)) // 64) % 64 AS BIGINT) AS height
FROM documents
"""


# --------------------------------------------------------------------------
# round-4 beyond-reference graph analytics + PII scrub
# --------------------------------------------------------------------------


def q_hits(spark, sf_dir):
    """HITS hubs & authorities (algorithms.hits, beyond-reference), fixed
    5 iterations so the DuckDB oracle replays them as unrolled CTEs —
    same protocol as the pagerank family."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    scores = algorithms.hits(edges, vertices, max_iter=5)
    return scores.select(
        "vid", F.round("hub", 6).alias("hub"), F.round("authority", 6).alias("authority")
    )


def _hits_oracle(iters: int = 5) -> str:
    # deferred L1 normalization (round 9, mirrors algorithms.hits):
    # rounds are bare contribution sums; both norms applied once at the
    # end — identical vectors, the per-round norm was a positive scalar
    parts = [
        "verts AS (SELECT c_custkey AS vid FROM customer)",
        "h0 AS MATERIALIZED (SELECT vid, 1.0 AS hub FROM verts)",
    ]
    for i in range(1, iters + 1):
        p = f"h{i - 1}"
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS vid, SUM(h.hub) AS araw
  FROM {p} h JOIN e ON e.src = h.vid GROUP BY e.dst)"""
        )
        parts.append(
            f"""a{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(m.araw, 0) AS auth
  FROM verts v LEFT JOIN ar{i} m ON m.vid = v.vid)"""
        )
        parts.append(
            f"""hr{i} AS MATERIALIZED (
  SELECT e.src AS vid, SUM(a.auth) AS hraw
  FROM a{i} a JOIN e ON e.dst = a.vid GROUP BY e.src)"""
        )
        parts.append(
            f"""h{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(m.hraw, 0) AS hub
  FROM verts v LEFT JOIN hr{i} m ON m.vid = v.vid)"""
        )
    body = ",\n".join(parts)
    return (
        f"WITH e AS ({EDGES_SQL}),\n{body},\n"
        f"hn AS (SELECT COALESCE(SUM(hub), 0) AS s FROM h{iters}),\n"
        f"an AS (SELECT COALESCE(SUM(auth), 0) AS s FROM a{iters})\n"
        f"SELECT h.vid, "
        f"ROUND(CASE WHEN hn.s > 0 THEN h.hub / hn.s ELSE 0 END, 6) AS hub, "
        f"ROUND(CASE WHEN an.s > 0 THEN a.auth / an.s ELSE 0 END, 6) AS authority "
        f"FROM h{iters} h JOIN a{iters} a ON a.vid = h.vid, hn, an"
    )


O_HITS = _hits_oracle(5)


def q_scc(spark, sf_dir):
    """Strongly connected components (algorithms
    .strongly_connected_component, beyond-reference — the reference has
    only the weakly variant).  Domain restricted to c_custkey < 750 so
    the oracle's transitive-closure CTE stays bounded (the closure is
    the SPEC here, not the plan — the engine runs the coloring
    algorithm, never a closure)."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges").where((F.col("src") < 750) & (F.col("dst") < 750))
    vertices = (
        spark.table("customer")
        .where(F.col("c_custkey") < 750)
        .select(F.col("c_custkey").cast("long"))
    )
    return algorithms.strongly_connected_component(edges, vertices)


O_SCC = _with_e(
    """, e2 AS MATERIALIZED (
  SELECT src, dst FROM e WHERE src < 750 AND dst < 750 AND src <> dst),
verts AS (SELECT c_custkey AS vid FROM customer WHERE c_custkey < 750),
reach(u, v) AS (
  SELECT src, dst FROM e2
  UNION
  SELECT r.u, e2.dst FROM reach r JOIN e2 ON e2.src = r.v),
mutual AS (
  SELECT r1.u AS a, r1.v AS b
  FROM reach r1 JOIN reach r2 ON r2.u = r1.v AND r2.v = r1.u)
SELECT v.vid, LEAST(v.vid, COALESCE(MIN(m.b), v.vid)) AS scc_id
FROM verts v LEFT JOIN mutual m ON m.a = v.vid
GROUP BY v.vid""",
    recursive=True,
)


def q_global_clustering(spark, sf_dir):
    """Whole-graph transitivity (algorithms.global_clustering): triangle
    and wedge totals plus 3T/W, one row.  The Spark plan is the
    degree-ordered O(m^1.5) half-edge join; the oracle enumerates
    triangles a<b<c directly over the doubled edge set."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    row = algorithms.global_clustering(edges, vertices)
    return row.select(
        "triangles", "wedges", F.round("global_clustering", 6).alias("global_clustering")
    )


O_GLOBAL_CLUSTERING = _with_e(
    """, und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e WHERE src <> dst
    UNION ALL SELECT dst, src FROM e WHERE src <> dst)),
deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
tri AS (
  SELECT COUNT(*) AS t
  FROM und ab
  JOIN und bc ON bc.src = ab.dst AND bc.dst > ab.dst
  JOIN und ac ON ac.src = ab.src AND ac.dst = bc.dst
  WHERE ab.src < ab.dst),
wed AS (SELECT COALESCE(CAST(SUM(deg * (deg - 1) / 2) AS BIGINT), 0) AS w FROM deg)
SELECT CAST(tri.t AS BIGINT) AS triangles, wed.w AS wedges,
       ROUND(CASE WHEN wed.w > 0 THEN 3.0 * tri.t / wed.w ELSE 0 END, 6)
         AS global_clustering
FROM tri CROSS JOIN wed"""
)


def q_random_walks(spark, sf_dir):
    """Deterministic node2vec-style random walks
    (algorithms.random_walks): 4 steps from every 100th customer, md5
    draws — the oracle replays the identical per-step neighbor choice."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").cast("long")
    )
    return algorithms.random_walks(edges, seeds, length=4, salt="rw")


def _walk_oracle(length: int = 4) -> str:
    parts = [
        """nbr AS MATERIALIZED (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rk,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM (SELECT DISTINCT src, dst FROM e))""",
        """s0 AS (SELECT c_custkey AS walk_id, 0 AS step, c_custkey AS vid
  FROM customer WHERE c_custkey % 100 = 0)""",
    ]
    for i in range(1, length + 1):
        p = f"s{i - 1}"
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT f.walk_id, {i} AS step, n.dst AS vid
  FROM {p} f JOIN nbr n ON n.src = f.vid
   AND n.rk = (('0x' || substr(md5(CAST(f.walk_id AS VARCHAR) || '|{i}|' ||
                CAST(f.vid AS VARCHAR) || '|rw'), 1, 15))::BIGINT % n.deg) + 1)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, step, vid FROM s{i}" for i in range(length + 1)
    )
    body = ",\n".join(parts)
    return f"WITH e AS ({EDGES_SQL}),\n{body}\n{union}"


O_RANDOM_WALKS = _walk_oracle(4)


def q_node2vec(spark, sf_dir):
    """Biased node2vec walks (algorithms.node2vec_walks,
    beyond-reference): 3 steps from every 100th customer with return
    parameter p=4 and in-out parameter q=0.25 — the defaults make every
    step weight a multiple of 0.25, so the weighted cumulative-sum draw
    is float-exact and the unrolled SQL oracle replays the walks
    bit-identically."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").cast("long")
    )
    return algorithms.node2vec_walks(edges, seeds, length=3)


def _node2vec_oracle(length: int = 3) -> str:
    # mirrors algorithms.node2vec_walks: w = 0.25 return / 1.0 common /
    # 4.0 explore; draw = md5_long(walk|step|vid|n2v) % 2^20; pick the
    # first rank whose cumw * 2^20 crosses draw * totw
    parts = [
        """nbr AS MATERIALIZED (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rk
  FROM (SELECT DISTINCT src, dst FROM e))""",
        """s0 AS (SELECT c_custkey AS walk_id, 0 AS step, c_custkey AS vid,
  CAST(NULL AS BIGINT) AS prev
  FROM customer WHERE c_custkey % 100 = 0)""",
    ]
    for i in range(1, length + 1):
        f = f"s{i - 1}"
        parts.append(
            f"""c{i} AS (
  SELECT f.walk_id, f.vid, n.dst, n.rk,
         CASE WHEN n.dst = f.prev THEN 0.25
              WHEN a.src IS NOT NULL THEN 1.0
              ELSE 4.0 END AS w,
         ('0x' || substr(md5(CAST(f.walk_id AS VARCHAR) || '|{i}|' ||
          CAST(f.vid AS VARCHAR) || '|n2v'), 1, 15))::BIGINT % 1048576 AS draw
  FROM {f} f
  JOIN nbr n ON n.src = f.vid
  LEFT JOIN (SELECT DISTINCT src, dst FROM e) a
    ON a.src = f.prev AND a.dst = n.dst)"""
        )
        parts.append(
            f"""w{i} AS (
  SELECT *, SUM(w) OVER (PARTITION BY walk_id ORDER BY rk
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
            SUM(w) OVER (PARTITION BY walk_id) AS totw
  FROM c{i})"""
        )
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT walk_id, {i} AS step, dst AS vid, vid AS prev FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY walk_id ORDER BY rk) AS rn
    FROM w{i} WHERE cumw * 1048576 > draw * totw) WHERE rn = 1)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, step, vid FROM s{i}" for i in range(length + 1)
    )
    body = ",\n".join(parts)
    return f"WITH e AS ({EDGES_SQL}),\n{body}\n{union}"


O_NODE2VEC = _node2vec_oracle(3)


def q_rolling_7d(spark, sf_dir):
    """Trailing 7-day per-user rolling mean/count
    (operators/relational.rolling_time_agg): RANGE window frame over
    epoch microseconds — one sliding-accumulator window pass, never a
    self-join over the time span.  The gate feeds integer cents
    (ROUND(value*100)) and compares the windowed SUM + count, which are
    order-exact integers in both engines — the rolling MEAN of
    2-decimal data lands exactly on decimal half-boundaries, where
    Java's BigDecimal rounding and DuckDB's binary-multiply rounding
    legitimately disagree (same class of quirk as the corpus_clean
    fixed-point avg)."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events").withColumn(
        "value", F.round(F.col("value") * 100).cast("bigint")
    )
    out = relational.rolling_time_agg(events, "user_id", "ts", "value", days=7)
    return out.select(
        "user_id",
        "ts_us",
        F.col("sum_7d").cast("bigint").alias("sum_7d_cents"),
        "n_7d",
    )


O_ROLLING_7D = """
WITH ev AS (SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS vc
            FROM events)
SELECT user_id, epoch_us(ts) AS ts_us,
       CAST(SUM(vc) OVER w AS BIGINT) AS sum_7d_cents,
       COUNT(*) OVER w AS n_7d
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
"""


def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS aggregation (DataFrame.groupingSets — the
    reference's grouping-sets surface alongside the rollup/cube
    queries): per-priority totals, per-status totals, and the grand
    total in one pass.  FLOOR before summing keeps the double -> bigint
    conversion identical across engines (Spark casts truncate, DuckDB
    casts round)."""
    setup(spark, sf_dir)
    o = spark.table("orders")
    return (
        o.groupingSets(
            [[F.col("o_orderpriority")], [F.col("o_orderstatus")], []],
            F.col("o_orderpriority"),
            F.col("o_orderstatus"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor("o_totalprice")).cast("bigint").alias("total_floor"),
        )
    )


O_GROUPING_SETS = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
       CAST(SUM(FLOOR(o_totalprice)) AS BIGINT) AS total_floor
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


def q_weighted_sample(spark, sf_dir):
    """Exact-size weighted sampling without replacement
    (operators/corpus.weighted_sample, Efraimidis-Spirakis A-Res):
    top-20 docs per source by priority u^(1/n_chars) with u a
    reproducible md5 fraction — the weight-proportional counterpart of
    det_sample's Bernoulli."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return corpus.weighted_sample(
        docs, "doc_id", "n_chars", k=20, group_col="source"
    )


O_WEIGHTED_SAMPLE = """
WITH pri AS (
  SELECT source, doc_id,
         POW(((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|ws'), 1, 15))::BIGINT
               % 1048576 + 0.5) / 1048576.0),
             1.0 / CAST(n_chars AS DOUBLE)) AS p
  FROM documents WHERE n_chars > 0
),
r AS (
  SELECT source, doc_id, p,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY p DESC, doc_id ASC) AS rk
  FROM pri
)
SELECT source, doc_id, ROUND(p, 6) AS priority FROM r WHERE rk <= 20
"""


def q_winsorize(spark, sf_dir):
    """Per-group winsorization (operators/relational.winsorize): clamp
    l_extendedprice to its return-flag group's p05/p95 PERCENTILE_CONT
    fences — outlier treatment that keeps rows at the fence instead of
    dropping them."""
    setup(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    out = relational.winsorize(li, ["l_returnflag"], "l_extendedprice", 0.05, 0.95)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round("l_extendedprice", 4).alias("price_w"),
    )


O_WINSORIZE = """
WITH fences AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       ROUND(LEAST(GREATEST(l.l_extendedprice, f.lo), f.hi), 4) AS price_w
FROM lineitem l JOIN fences f USING (l_returnflag)
"""


def q_attribution(spark, sf_dir):
    """Last-touch conversion attribution
    (streaming/events.attribute_conversions): every purchase credited to
    the same user's most recent strictly-earlier click/view within 7
    days — one window pass, no inequality self-join."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    return ev.attribute_conversions(
        events, conversion_type="purchase", touch_types=("click", "view"),
        window_days=7,
    )


O_ATTRIBUTION = """
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN event_type IN ('click', 'view') THEN event_id END AS tid,
         CASE WHEN event_type IN ('click', 'view') THEN event_type END AS ttype,
         CASE WHEN event_type IN ('click', 'view') THEN epoch_us(ts) END AS tus
  FROM events
),
carried AS (
  SELECT user_id, event_id, event_type, ts_us,
         last_value(tid IGNORE NULLS) OVER w AS last_tid,
         last_value(ttype IGNORE NULLS) OVER w AS last_ttype,
         last_value(tus IGNORE NULLS) OVER w AS last_tus
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id AS conversion_id, ts_us AS conv_us,
       CASE WHEN last_tus >= ts_us - 604800000000 THEN last_tid END AS touch_id,
       CASE WHEN last_tus >= ts_us - 604800000000 THEN last_ttype END AS touch_type,
       CASE WHEN last_tus >= ts_us - 604800000000 THEN last_tus END AS touch_us
FROM carried WHERE event_type = 'purchase'
"""


def q_anomaly_zscore(spark, sf_dir):
    """Per-user z-score outliers (streaming/events.anomaly_zscore):
    standardize each event value against its user's mean/stddev, keep
    |z| >= 2 — per-entity baselines, one agg + join-back."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    return ev.anomaly_zscore(events, "user_id", "value", z_threshold=2.0)


O_ANOMALY_ZSCORE = """
WITH stats AS (
  SELECT user_id AS key, AVG(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY user_id
)
SELECT e.user_id AS key, e.event_id, e.value,
       ROUND((e.value - s.mu) / s.sd, 4) AS z
FROM events e JOIN stats s ON s.key = e.user_id
WHERE s.sd IS NOT NULL AND s.sd > 0
  AND ABS((e.value - s.mu) / s.sd) >= 2.0
"""


def q_streaming_anomaly(spark, sf_dir):
    """Stream-static anomaly scoring (streaming/events.anomaly_stream):
    per-user baselines trained on the first half of the month
    (events.baseline_stats), second-half events scored with a stateless
    stream-static join — same builder serves batch (this oracle check)
    and readStream (test_relational_streaming drives the memory-sink
    variant)."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    cutoff = "2024-01-16"
    hist = events.where(F.col("ts") < cutoff)
    live = events.where(F.col("ts") >= cutoff)
    base = ev.baseline_stats(hist, "user_id", "value")
    return ev.anomaly_stream(live, base, "user_id", "value", z_threshold=2.0)


O_STREAMING_ANOMALY = """
WITH base AS (
  SELECT user_id AS key, AVG(value) AS mu, stddev_samp(value) AS sd
  FROM events WHERE ts < '2024-01-16' GROUP BY user_id
)
SELECT b.key, e.event_id, e.value,
       ROUND((e.value - b.mu) / b.sd, 4) AS z
FROM events e JOIN base b ON b.key = e.user_id
WHERE e.ts >= '2024-01-16' AND b.sd IS NOT NULL AND b.sd > 0
  AND ABS((e.value - b.mu) / b.sd) >= 2.0
"""


def q_copurchase_pmi(spark, sf_dir):
    """Item co-occurrence + PMI (operators/corpus.cooccurrence_pmi):
    part pairs sharing an order in lineitem, joint count >= 3, pointwise
    mutual information over the order universe — association mining
    whose pair space is quadratic only in basket size."""
    setup(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), (F.col("l_partkey") % 500).alias("item")
    )
    return corpus.cooccurrence_pmi(li, "l_orderkey", "item", min_count=3)


O_COPURCHASE_PMI = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS g, l_partkey % 500 AS item FROM lineitem
),
ng AS (SELECT CAST(COUNT(DISTINCT g) AS DOUBLE) AS n FROM items),
marg AS (SELECT item, COUNT(*) AS c FROM items GROUP BY item),
pairs AS (
  SELECT l.item AS item_a, r.item AS item_b, COUNT(*) AS n_pairs
  FROM items l JOIN items r ON l.g = r.g AND l.item < r.item
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT p.item_a, p.item_b, p.n_pairs,
       ROUND(ln(p.n_pairs * ng.n / (ma.c * mb.c)), 6) AS pmi
FROM pairs p
JOIN marg ma ON ma.item = p.item_a
JOIN marg mb ON mb.item = p.item_b
CROSS JOIN ng
"""


def q_event_transitions(spark, sf_dir):
    """Markov transition matrix over per-user event sequences
    (streaming/events.event_transitions): (current -> next) type counts
    and P(next | current) — one lead() window + a vocabulary-squared
    aggregate."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    return ev.event_transitions(events)


O_EVENT_TRANSITIONS = """
WITH steps AS (
  SELECT event_type AS cur_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events
),
agg AS (
  SELECT cur_type, next_type, COUNT(*) AS n
  FROM steps WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT cur_type, next_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY cur_type), 6) AS p
FROM agg
"""


def q_pipeline_v3(spark, sf_dir):
    """Third end-to-end curation pipeline, composing the 7c stages:
    language filter (en) -> quality gate (q >= 0.5) -> exact dedup ->
    EDIT-DISTANCE near-dup drop (LSH candidates verified with the
    Levenshtein DP at sim >= 0.6; the higher doc_id of each pair is
    dropped) -> A-Res WEIGHTED sample (top 30 per source, weight =
    token count) -> per-source budget report.  Every stage is the same
    operator its standalone driver query verifies."""
    setup(spark, sf_dir)
    docs = spark.table("documents").withColumn("__toks", TX.tokens(F.col("text")))
    t = F.col("__toks")
    scored = docs.select(
        "doc_id",
        "text",
        "source",
        TX.lang_id(F.col("text"), toks=t).alias("lang"),
        F.round(TX.quality_score(F.col("text"), toks=t), 6).alias("q"),
    )
    kept = scored.where((F.col("lang") == "en") & (F.col("q") >= 0.5))
    deduped = dedup.deduplicate_exact(kept, "doc_id", "text").select(
        "doc_id", "text", "source"
    )
    pairs = dedup.edit_distance_pairs(
        deduped, "doc_id", "text", n=2, num_perm=16, bands=8, threshold=0.6
    )
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    surv = deduped.join(drop, "doc_id", "left_anti").withColumn(
        "n_tok", F.size(TX.tokens(F.col("text")))
    ).where(F.col("n_tok") > 0)
    sampled = corpus.weighted_sample(
        surv, "doc_id", "n_tok", k=30, group_col="source"
    )
    return (
        sampled.join(surv.select("doc_id", "n_tok"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
        )
    )


def _pipeline_v3_oracle() -> str:
    stops = " + ".join(
        f"CAST(list_contains(t, '{w}') AS INT)" for w in TX.LANG_MARKERS["en"]
    )
    q = _Q_SQL.format(stops=stops, nstops=len(TX.LANG_MARKERS["en"]))
    lsh = ",\n".join(_minhash_lsh_parts(16, 8, src="deduped", p="m_")[:-1])
    return f"""
WITH toks AS (SELECT doc_id, text, source, {_TOKS} AS t FROM documents),
scored AS (
  SELECT doc_id, text, source, {q} AS q
  FROM toks WHERE ({_lang_case_sql()}) = 'en'),
kept AS (SELECT doc_id, text, source FROM scored WHERE q >= 0.5),
deduped AS (
  SELECT doc_id, text, source FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1),
{lsh},
lev AS (
  SELECT c.id_a, c.id_b
  FROM m_cands c
  JOIN deduped da ON da.doc_id = c.id_a
  JOIN deduped db ON db.doc_id = c.id_b
  WHERE ROUND(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
              / GREATEST(len(da.text), len(db.text), 1), 6) >= 0.6),
surv AS (
  SELECT d.doc_id, d.source, len({_TOKS.replace("text", "d.text")}) AS n_tok
  FROM deduped d
  WHERE d.doc_id NOT IN (SELECT id_b FROM lev)
    AND len({_TOKS.replace("text", "d.text")}) > 0),
pri AS (
  SELECT source, doc_id, n_tok,
         POW(((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|ws'), 1, 15))::BIGINT
               % 1048576 + 0.5) / 1048576.0),
             1.0 / CAST(n_tok AS DOUBLE)) AS p
  FROM surv),
r AS (
  SELECT source, doc_id, n_tok,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY p DESC, doc_id ASC) AS rk
  FROM pri)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM r WHERE rk <= 30 GROUP BY source
"""


O_PIPELINE_V3 = _pipeline_v3_oracle()


_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def q_profile_docs(spark, sf_dir):
    """Dataset profiling gate (operators/relational.profile_table):
    per-column row/NULL/exact-distinct counts and min/max (stringified,
    one schema for all types) over the documents table — the snapshot
    acceptance check pipelines run before training data lands."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return relational.profile_table(docs, _PROFILE_COLS)


O_PROFILE_DOCS = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       (SELECT COUNT(*) FROM documents) AS n_rows,
       (SELECT COUNT(*) FROM documents WHERE {c} IS NULL) AS n_null,
       (SELECT COUNT(DISTINCT {c}) FROM documents) AS n_distinct,
       (SELECT MIN(CAST({c} AS VARCHAR)) FROM documents) AS min_val,
       (SELECT MAX(CAST({c} AS VARCHAR)) FROM documents) AS max_val"""
    for c in _PROFILE_COLS
)


def q_percolation(spark, sf_dir):
    """Bond-percolation reachability (algorithms.percolation_reachability,
    beyond-reference): keep each edge iff md5(eid|perc) % 100 < 60, then
    multi-source BFS from customers 0-7 over the survivors — the
    deterministic robustness probe; the oracle replays the identical
    hash filter + recursive BFS."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") < 8).select(
        F.col("c_custkey").cast("long")
    )
    return algorithms.percolation_reachability(edges, seeds, keep_pct=60)


O_PERCOLATION = _with_e(
    """, act AS (
  SELECT src, dst FROM e
  WHERE ('0x' || substr(md5(CAST(eid AS VARCHAR) || '|perc'), 1, 15))::BIGINT
        % 100 < 60),
bfs(seed, vid, d) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 8
  UNION
  SELECT b.seed, a.dst, b.d + 1 FROM bfs b JOIN act a ON a.src = b.vid
  WHERE b.d < 60)
SELECT seed, vid, CAST(MIN(d) AS BIGINT) AS dist FROM bfs GROUP BY 1, 2""",
    recursive=True,
)


def q_eigenvector(spark, sf_dir):
    """Eigenvector centrality (algorithms.eigenvector_centrality,
    beyond-reference): 10 L1-normalized power-iteration rounds from the
    uniform vector — the undamped member of the pagerank/katz/HITS
    walk-counting family, replayed by an unrolled SQL oracle."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    out = algorithms.eigenvector_centrality(edges, vertices, max_iter=10)
    return out.select("vid", F.round("eigenvector", 6).alias("eigenvector"))


def _eigenvector_oracle(iters: int = 10) -> str:
    # deferred L1 normalization (round 9): each round is the bare
    # contribution sum, the norm applied ONCE at the end — mirrors
    # algorithms.eigenvector_centrality exactly (identical vector: the
    # per-round norm was a positive scalar)
    parts = [
        "verts AS (SELECT c_custkey AS vid FROM customer)",
        """x0 AS MATERIALIZED (
  SELECT vid, 1.0 / (SELECT COUNT(*) FROM customer) AS ev FROM verts)""",
    ]
    for i in range(1, iters + 1):
        p = f"x{i - 1}"
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT e.dst AS vid, SUM(x.ev) AS w
  FROM {p} x JOIN e ON e.src = x.vid GROUP BY e.dst)"""
        )
        parts.append(
            f"""x{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(m.w, 0) AS ev
  FROM verts v LEFT JOIN r{i} m ON m.vid = v.vid)"""
        )
    body = ",\n".join(parts)
    return (
        f"WITH e AS ({EDGES_SQL}),\n{body}\n"
        f"SELECT vid, ROUND(CASE WHEN t.s > 0 THEN ev / t.s ELSE 0 END, 6) "
        f"AS eigenvector FROM x{iters} "
        f"CROSS JOIN (SELECT COALESCE(SUM(ev), 0) AS s FROM x{iters}) t"
    )


O_EIGENVECTOR = _eigenvector_oracle(10)


def q_closeness(spark, sf_dir):
    """Seed-set closeness centrality (algorithms.closeness_centrality):
    one batched BFS from customers 0-7, fold to (reached-1)/sum(dist)."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") < 8).select(
        F.col("c_custkey").cast("long")
    )
    scores = algorithms.closeness_centrality(edges, seeds)
    return scores.select("vid", "reached", F.round("closeness", 6).alias("closeness"))


# the d < 60 cap bounds the recursive CTE on cyclic graphs (dedup is on
# (src, dst, d), so d would otherwise grow forever); the sf0.01 graph's
# diameter is ~5, far under the cap, so min(d) is exact
O_CLOSENESS = _with_e(
    """, bfs(src, dst, d) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 8
  UNION
  SELECT b.src, e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.dst WHERE b.d < 60),
mind AS (SELECT src, dst, MIN(d) AS d FROM bfs GROUP BY src, dst)
SELECT src AS vid, COUNT(*) AS reached,
       ROUND(CASE WHEN SUM(d) > 0
                  THEN CAST(COUNT(*) - 1 AS DOUBLE) / SUM(d)
                  ELSE 0 END, 6) AS closeness
FROM mind GROUP BY src""",
    recursive=True,
)


def q_distance_report(spark, sf_dir):
    """Composed distance profile (algorithms.distance_report): closeness,
    harmonic centrality and eccentricity of customers 0-7 from ONE
    batched multi-source BFS — the standalone closeness / harmonic /
    eccentricity queries each re-pay the identical traversal; sharing
    the distance frame removes the duplicates (r8, measured 3.0 s vs
    7.3 s for the three standalone queries back-to-back at sf0.1).  Values identical to the standalone
    kernels by construction."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") < 8).select(
        F.col("c_custkey").cast("long")
    )
    rep = algorithms.distance_report(edges, seeds)
    return rep.select(
        "vid",
        "reached",
        F.round("closeness", 6).alias("closeness"),
        F.round("harmonic", 6).alias("harmonic"),
        "eccentricity",
    )


O_DISTANCE_REPORT = _with_e(
    """, bfs(src, dst, d) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 8
  UNION
  SELECT b.src, e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.dst WHERE b.d < 60),
mind AS (SELECT src, dst, MIN(d) AS d FROM bfs GROUP BY src, dst)
SELECT src AS vid, COUNT(*) AS reached,
       ROUND(CASE WHEN SUM(d) > 0
                  THEN CAST(COUNT(*) - 1 AS DOUBLE) / SUM(d)
                  ELSE 0 END, 6) AS closeness,
       ROUND(COALESCE(SUM(CASE WHEN d > 0 THEN 1.0 / d END), 0), 6) AS harmonic,
       CAST(MAX(d) AS BIGINT) AS eccentricity
FROM mind GROUP BY src""",
    recursive=True,
)


def q_pii_redact(spark, sf_dir):
    """PII scrub (functions.text.redact_pii / pii_counts / normalize_text,
    beyond-reference): augment each document with a synthetic email, IP
    and phone, then count and redact them and emit md5 digests of the
    redacted and normalized forms.  All JVM regexp expressions — one scan,
    no shuffle; the oracle runs the same RE2-compatible patterns."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit("@mail.example.org or 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".7, tel 555-010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    counts = TX.pii_counts(F.col("t"))
    red = TX.redact_pii(F.col("t"))
    return aug.select(
        "doc_id",
        F.md5(red).alias("red_md5"),
        F.md5(TX.normalize_text(red)).alias("norm_md5"),
        counts["n_emails"].cast("long").alias("n_emails"),
        counts["n_ips"].cast("long").alias("n_ips"),
        counts["n_phones"].cast("long").alias("n_phones"),
    )


O_PII_REDACT = rf"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id % 97 AS VARCHAR) ||
         '@mail.example.org or 10.0.' || CAST(doc_id % 200 AS VARCHAR) ||
         '.7, tel 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents),
red AS (
  SELECT doc_id, t,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{TX.EMAIL_RE}', '<EMAIL>', 'g'),
             '{TX.IPV4_RE}', '<IP>', 'g'),
           '{TX.PHONE_RE}', '<PHONE>', 'g') AS r
  FROM aug)
SELECT doc_id,
       md5(r) AS red_md5,
       md5(trim(regexp_replace(lower(r), '\s+', ' ', 'g'))) AS norm_md5,
       CAST(len(regexp_extract_all(t, '{TX.EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{TX.IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t, '{TX.PHONE_RE}')) AS BIGINT) AS n_phones
FROM red
"""


def q_communities(spark, sf_dir):
    """Deterministic synchronous label propagation
    (algorithms.label_propagation, beyond-reference): 5 rounds on the
    follows graph — the round budget is the spec, so the oracle replays
    each round as an unrolled CTE with the identical count-desc /
    label-asc tie-break."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    return algorithms.label_propagation(edges, vertices, max_iter=5)


def _lpa_oracle(rounds: int = 5) -> str:
    parts = [
        """und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e WHERE src <> dst
    UNION ALL SELECT dst, src FROM e WHERE src <> dst))""",
        "l0 AS (SELECT c_custkey AS vid, c_custkey AS label FROM customer)",
    ]
    for i in range(1, rounds + 1):
        p = f"l{i - 1}"
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT u.dst AS vid, l.label, COUNT(*) AS c
  FROM und u JOIN {p} l ON l.vid = u.src GROUP BY u.dst, l.label)"""
        )
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT vid, label FROM (
    SELECT vid, label,
           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY c DESC, label ASC) AS rn
    FROM c{i}) WHERE rn = 1)"""
        )
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(p.label, v.label) AS label
  FROM {p} v LEFT JOIN p{i} p ON p.vid = v.vid)"""
        )
    body = ",\n".join(parts)
    return f"WITH e AS ({EDGES_SQL}),\n{body}\nSELECT vid, label FROM l{rounds}"


def _lpa_parts(rounds: int = 5) -> str:
    """The _lpa_oracle CTE chain without the WITH/SELECT wrapper — the
    final labels CTE is `l{rounds}`; embed in a larger WITH (used by
    O_MODULARITY so the community assignment can never drift from
    O_COMMUNITIES)."""
    full = _lpa_oracle(rounds)
    head = f"WITH e AS ({EDGES_SQL}),\n"
    tail = f"\nSELECT vid, label FROM l{rounds}"
    assert full.startswith(head) and full.endswith(tail)
    return full[len(head):-len(tail)]


O_COMMUNITIES = _lpa_oracle(5)


def q_modularity(spark, sf_dir):
    """Newman-Girvan modularity of the 5-round LPA communities
    (algorithms.modularity, beyond-reference): per-community
    e_c/2m - (d_c/2m)^2 contributions over the undirected simple graph —
    the standard community-quality score; the oracle replays the
    identical LPA rounds (shared CTE parts with O_COMMUNITIES) then the
    same aggregates."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    labels = algorithms.label_propagation(edges, vertices, max_iter=5)
    return algorithms.modularity(edges, labels)


O_MODULARITY = f"""
WITH e AS ({EDGES_SQL}),
{_lpa_parts(5)},
tm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m2 FROM und),
tagged AS (
  SELECT a.label AS community,
         CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS internal
  FROM und u
  JOIN l5 a ON a.vid = u.src
  JOIN l5 b ON b.vid = u.dst
),
agg AS (
  SELECT community,
         CAST(SUM(internal) AS BIGINT) AS internal_half_edges,
         COUNT(*) AS degree_sum
  FROM tagged GROUP BY community
)
SELECT community, internal_half_edges, degree_sum,
       ROUND(internal_half_edges / tm.m2
             - (degree_sum / tm.m2) * (degree_sum / tm.m2), 6) AS contribution
FROM agg CROSS JOIN tm
"""


def q_communities_refined(spark, sf_dir):
    """Louvain local-move refinement of the LPA communities
    (algorithms.modularity_refine, beyond-reference): one synchronous
    greedy pass where each vertex takes the strictly-positive
    modularity-gain move with the largest gain (ties to the smallest
    target label).  The gain is ranked on the all-integer score
    dQ*2m^2, so the argmax is bit-reproducible in DuckDB; the oracle
    shares the unrolled LPA CTEs with O_COMMUNITIES so the input
    assignment can never drift."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    labels = algorithms.label_propagation(edges, vertices, max_iter=5)
    refined = algorithms.modularity_refine(edges, labels)
    return refined.select(
        F.col("vid").cast("bigint").alias("vid"),
        F.col("label").cast("bigint").alias("label"),
    )


O_COMMUNITIES_REFINED = f"""
WITH e AS ({EDGES_SQL}),
{_lpa_parts(5)},
deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY src),
base AS (
  SELECT l.vid, l.label, COALESCE(d.deg, 0) AS deg
  FROM l5 l LEFT JOIN deg d ON d.vid = l.vid),
tm AS (SELECT COUNT(*) AS m2 FROM und),
sig AS (SELECT label, CAST(SUM(deg) AS BIGINT) AS sig FROM base GROUP BY label),
kvc AS (
  SELECT u.src AS vid, n.label AS cand, COUNT(*) AS kvc
  FROM und u JOIN l5 n ON n.vid = u.dst GROUP BY 1, 2),
own AS (
  SELECT b.vid, b.label, b.deg, COALESCE(k.kvc, 0) AS kown
  FROM base b LEFT JOIN kvc k ON k.vid = b.vid AND k.cand = b.label),
scored AS (
  SELECT k.vid, k.cand,
         tm.m2 * (k.kvc - o.kown) + o.deg * (sa.sig - o.deg - sb.sig) AS score
  FROM kvc k
  JOIN own o ON o.vid = k.vid
  JOIN sig sa ON sa.label = o.label
  JOIN sig sb ON sb.label = k.cand
  CROSS JOIN tm
  WHERE k.cand <> o.label),
pick AS (
  SELECT vid, cand FROM (
    SELECT vid, cand,
           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY score DESC, cand ASC) AS rn
    FROM scored WHERE score > 0) WHERE rn = 1)
SELECT CAST(b.vid AS BIGINT) AS vid,
       CAST(COALESCE(p.cand, b.label) AS BIGINT) AS label
FROM base b LEFT JOIN pick p ON p.vid = b.vid
"""


def q_community_graph(spark, sf_dir):
    """Community-graph contraction of the LPA communities
    (algorithms.contract_communities, beyond-reference — the Louvain
    aggregation phase): weighted community-level edge list, self-edges
    carrying each community's internal edge count.  Oracle shares the
    unrolled LPA CTEs with O_COMMUNITIES."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    labels = algorithms.label_propagation(edges, vertices, max_iter=5)
    cg = algorithms.contract_communities(edges, labels)
    return cg.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
        F.col("weight").cast("bigint").alias("weight"),
    )


O_COMMUNITY_GRAPH = f"""
WITH e AS ({EDGES_SQL}),
{_lpa_parts(5)},
half AS (SELECT src, dst FROM und WHERE src < dst)
SELECT CAST(LEAST(a.label, b.label) AS BIGINT) AS src,
       CAST(GREATEST(a.label, b.label) AS BIGINT) AS dst,
       COUNT(*) AS weight
FROM half u
JOIN l5 a ON a.vid = u.src
JOIN l5 b ON b.vid = u.dst
GROUP BY 1, 2
"""


def q_conductance(spark, sf_dir):
    """Per-community conductance of the LPA communities
    (algorithms.community_conductance, beyond-reference):
    cut / min(vol, 2m - vol) — the boundary-leakage complement of
    modularity, same shared LPA CTE oracle."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    labels = algorithms.label_propagation(edges, vertices, max_iter=5)
    cond = algorithms.community_conductance(edges, labels)
    return cond.select(
        F.col("community").cast("bigint").alias("community"),
        F.col("cut_edges").cast("bigint").alias("cut_edges"),
        F.col("volume").cast("bigint").alias("volume"),
        "conductance",
    )


O_CONDUCTANCE = f"""
WITH e AS ({EDGES_SQL}),
{_lpa_parts(5)},
tm AS (SELECT COUNT(*) AS m2 FROM und),
tagged AS (
  SELECT a.label AS community,
         CASE WHEN a.label <> b.label THEN 1 ELSE 0 END AS cut
  FROM und u
  JOIN l5 a ON a.vid = u.src
  JOIN l5 b ON b.vid = u.dst),
agg AS (
  SELECT community, CAST(SUM(cut) AS BIGINT) AS cut_edges,
         COUNT(*) AS volume
  FROM tagged GROUP BY community)
SELECT community, cut_edges, volume,
       CASE WHEN LEAST(volume, tm.m2 - volume) > 0
            THEN ROUND(CAST(cut_edges AS DOUBLE)
                       / LEAST(volume, tm.m2 - volume), 6)
            END AS conductance
FROM agg CROSS JOIN tm
"""


def q_assortativity(spark, sf_dir):
    """Degree assortativity (algorithms.degree_assortativity,
    beyond-reference): Pearson correlation of endpoint degrees over the
    doubled undirected edge list, one row."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    row = algorithms.degree_assortativity(edges)
    return row.select(F.round("assortativity", 6).alias("assortativity"))


O_ASSORTATIVITY = _with_e(
    """, und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e WHERE src <> dst
    UNION ALL SELECT dst, src FROM e WHERE src <> dst)),
deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src)
SELECT ROUND(corr(ds.deg, dd.deg), 6) AS assortativity
FROM und u
JOIN deg ds ON ds.src = u.src
JOIN deg dd ON dd.src = u.dst"""
)


def q_doc_logprob(spark, sf_dir):
    """Unigram log-probability quality scoring
    (operators/corpus.unigram_logprob): per-document mean ln p(token)
    under the corpus's own MLE unigram model — the perplexity-proxy
    filter of LLM data pipelines."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    out = corpus.unigram_logprob(docs, "doc_id", "text")
    return out.select(
        "doc_id", "n_tokens", F.round("avg_logprob", 6).alias("avg_logprob")
    )


O_DOC_LOGPROB = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, u.token FROM toks, UNNEST(t) AS u(token)),
per_doc AS (SELECT doc_id, token, COUNT(*) AS n FROM tok GROUP BY 1, 2),
model AS MATERIALIZED (SELECT token, SUM(n) AS cf FROM per_doc GROUP BY token),
tot AS (SELECT CAST(SUM(cf) AS DOUBLE) AS t FROM model)
SELECT d.doc_id, CAST(SUM(d.n) AS BIGINT) AS n_tokens,
       ROUND(SUM(d.n * ln(c.cf / tot.t)) / SUM(d.n), 6) AS avg_logprob
FROM per_doc d JOIN model c USING (token) CROSS JOIN tot
GROUP BY d.doc_id
"""


def q_katz(spark, sf_dir):
    """Katz centrality (algorithms.katz_centrality, beyond-reference):
    5 damped-walk iterations, alpha 0.05, beta 1 — unrolled-CTE oracle
    like the pagerank family."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    x = algorithms.katz_centrality(edges, vertices, alpha=0.05, beta=1.0, max_iter=5)
    return x.select("vid", F.round("katz", 6).alias("katz"))


def _katz_oracle(iters: int = 5) -> str:
    parts = [
        "verts AS (SELECT c_custkey AS vid FROM customer)",
        "x0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS katz FROM verts)",
    ]
    for i in range(1, iters + 1):
        p = f"x{i - 1}"
        parts.append(
            f"""x{i} AS MATERIALIZED (
  SELECT v.vid, CAST(1.0 + 0.05 * COALESCE(m.w, 0) AS DOUBLE) AS katz
  FROM verts v
  LEFT JOIN (SELECT e.dst AS vid, SUM(x.katz) AS w
             FROM {p} x JOIN e ON e.src = x.vid GROUP BY e.dst) m
    ON m.vid = v.vid)"""
        )
    body = ",\n".join(parts)
    return (
        f"WITH e AS ({EDGES_SQL}),\n{body}\n"
        f"SELECT vid, ROUND(katz, 6) AS katz FROM x{iters}"
    )


O_KATZ = _katz_oracle(5)


def q_link_pred(spark, sf_dir):
    """Link-prediction candidate scoring (algorithms.link_prediction,
    beyond-reference): common-neighbors / Adamic-Adar / Jaccard for
    non-adjacent pairs sharing >= 3 neighbors, center-degree cap 60,
    output restricted to u, v < 300 to bound the compared set."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    out = algorithms.link_prediction(edges, max_center_degree=60, min_common=3)
    return out.where((F.col("u") < 300) & (F.col("v") < 300)).select(
        "u",
        "v",
        "common_neighbors",
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("jaccard", 6).alias("jaccard"),
    )


O_LINK_PRED = _with_e(
    """, und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e WHERE src <> dst
    UNION ALL SELECT dst, src FROM e WHERE src <> dst)),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
half AS MATERIALIZED (
  SELECT n.src AS w, n.dst AS u, d.deg AS wdeg
  FROM und n JOIN deg d ON d.src = n.src WHERE d.deg <= 60),
pairs AS MATERIALIZED (
  SELECT a.u AS u, b.u AS v, COUNT(*) AS common_neighbors,
         SUM(1.0 / ln(a.wdeg)) AS aa
  FROM half a JOIN half b ON a.w = b.w AND a.u < b.u
  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
nonadj AS (
  SELECT p.* FROM pairs p
  LEFT JOIN und n ON n.src = p.u AND n.dst = p.v
  WHERE n.src IS NULL)
SELECT p.u, p.v, p.common_neighbors, ROUND(p.aa, 6) AS adamic_adar,
       ROUND(CAST(p.common_neighbors AS DOUBLE)
             / (du.deg + dv.deg - p.common_neighbors), 6) AS jaccard
FROM nonadj p
JOIN deg du ON du.src = p.u
JOIN deg dv ON dv.src = p.v
WHERE p.u < 300 AND p.v < 300"""
)


def q_temporal_reach(spark, sf_dir):
    """Time-respecting reachability (operators/paths.temporal_reachability,
    beyond-reference): earliest arrival from customers 0-4 along edges
    whose pseudo-timestamps (eid % 365) never decrease — the
    temporal-graph semantics the oracle replays as a recursive CTE over
    (src, dst, arrival) states."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges").select(
        "src", "dst", (F.col("eid") % 365).alias("ts")
    )
    seeds = spark.table("customer").where(F.col("c_custkey") < 5).select(
        F.col("c_custkey").cast("long")
    )
    return pathops.temporal_reachability(edges, seeds, ts_col="ts")


O_TEMPORAL_REACH = _with_e(
    """, et AS (SELECT src, dst, CAST(eid % 365 AS BIGINT) AS ts FROM e),
walk(src, dst, arrival) AS (
  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey < 5
  UNION
  SELECT w.src, et.dst, et.ts FROM walk w
  JOIN et ON et.src = w.dst AND et.ts >= w.arrival)
SELECT src, dst, MIN(arrival) AS arrival FROM walk GROUP BY src, dst""",
    recursive=True,
)


def q_temporal_reach_index(spark, sf_dir):
    """Standing-index temporal reachability (paths.write_temporal_index +
    temporal_reachability_from_index — VERDICT r10 item 1): the adjacency
    is written ONCE per sf tier as a ts-range-bucketed parquet (at 100 TB
    this is the standing temporal table), and each relaxation round's
    monotone arrival bound prunes whole bucket directories at file level
    (PartitionFilters) instead of row-filtering an in-memory cache.
    Same seeds/edges as temporal_reach, exact pruning — the earliest
    arrivals are hash-identical, so the oracle is shared."""
    import os

    setup(spark, sf_dir)
    edges = spark.table("c_edges").select(
        "src", "dst", (F.col("eid") % 365).alias("ts")
    )
    seeds = spark.table("customer").where(F.col("c_custkey") < 5).select(
        F.col("c_custkey").cast("long")
    )
    path = os.path.join(
        "/tmp/duckpgq_temporal_index", os.path.basename(os.path.normpath(sf_dir))
    )
    if not os.path.exists(os.path.join(path, "edges", "_SUCCESS")):
        pathops.write_temporal_index(edges, path, ts_col="ts", n_buckets=16)
    return pathops.temporal_reachability_from_index(spark, path, seeds)


# identical semantics to the in-memory route — the index is a layout, not
# a different algorithm — so the oracle is shared
O_TEMPORAL_REACH_INDEX = O_TEMPORAL_REACH


def q_temporal_latest(spark, sf_dir):
    """Latest-departure temporal reachability
    (operators/paths.temporal_latest_departure, beyond-reference): the
    deadline-side dual of temporal_reach — latest time each vertex can
    still reach customers 0-4 by horizon 364 along non-decreasing edge
    timestamps, computed on the time-reversed graph with the SAME
    verified earliest-arrival kernel."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges").select(
        "src", "dst", (F.col("eid") % 365).alias("ts")
    )
    targets = spark.table("customer").where(F.col("c_custkey") < 5).select(
        F.col("c_custkey").cast("long")
    )
    out = pathops.temporal_latest_departure(edges, targets, ts_col="ts", horizon=364)
    return out.select(
        "target", "vid", F.col("latest_departure").cast("bigint").alias("latest_departure")
    )


O_TEMPORAL_LATEST = _with_e(
    """, et AS (SELECT dst AS src, src AS dst,
               CAST(364 - (eid % 365) AS BIGINT) AS ts FROM e),
walk(t, v, arr) AS (
  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey < 5
  UNION
  SELECT w.t, et.dst, et.ts FROM walk w
  JOIN et ON et.src = w.v AND et.ts >= w.arr)
SELECT t AS target, v AS vid,
       CAST(364 - MIN(arr) AS BIGINT) AS latest_departure
FROM walk GROUP BY 1, 2""",
    recursive=True,
)


def q_nbr_features(spark, sf_dir):
    """Neighborhood feature aggregation (algorithms.neighbor_agg,
    beyond-reference): mean/max/count of neighbor account balance over
    the undirected neighbor set — the GNN/feature-engineering
    message-passing precompute."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    feats = spark.table("customer").select(
        F.col("c_custkey").cast("long"), F.col("c_acctbal").cast("double")
    )
    out = algorithms.neighbor_agg(
        edges, feats, aggs=["mean", "max", "count"], direction="both"
    )
    return out.select(
        "vid",
        F.round("nbr_mean", 6).alias("nbr_mean"),
        F.round("nbr_max", 6).alias("nbr_max"),
        F.col("nbr_count"),
    )


def q_nbr_features_l2(spark, sf_dir):
    """Two-layer neighborhood aggregation (algorithms.neighbor_agg
    applied twice, beyond-reference): layer 1 = SUM of neighbor account
    balance in integer cents (exact), layer 2 = mean of neighbors'
    layer-1 sums — the 2-hop receptive field of SIGN/GraphSAGE-style
    precomputation.  Integer layer-1 values keep the handoff bit-exact
    across engines (a rounded layer-1 MEAN of 2-decimal data lands
    exactly on decimal half-boundaries, where engine-specific last-ulp
    flips rounding — same quirk class as rolling_7d)."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    feats = spark.table("customer").select(
        F.col("c_custkey").cast("long"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    l1 = algorithms.neighbor_agg(edges, feats, aggs=["sum"], direction="out")
    l1c = l1.select("vid", F.col("nbr_sum").cast("long").alias("s1"))
    l2 = algorithms.neighbor_agg(edges, l1c, aggs=["mean"], direction="out")
    return (
        l2.select("vid", F.round("nbr_mean", 4).alias("m2"))
        .join(l1c, "vid")
        .select("vid", "s1", "m2")
    )


O_NBR_FEATURES_L2 = _with_e(
    """, nbr AS MATERIALIZED (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
f AS (SELECT c_custkey AS vid,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
l1 AS MATERIALIZED (
  SELECT n.src AS vid, CAST(SUM(f.cents) AS BIGINT) AS s1
  FROM nbr n JOIN f ON f.vid = n.dst GROUP BY n.src),
l2 AS (
  SELECT n.src AS vid, ROUND(AVG(l1.s1), 4) AS m2
  FROM nbr n JOIN l1 ON l1.vid = n.dst GROUP BY n.src)
SELECT l2.vid, l1.s1, l2.m2 FROM l2 JOIN l1 ON l1.vid = l2.vid""",
)


O_NBR_FEATURES = _with_e(
    """, und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e WHERE src <> dst
    UNION ALL SELECT dst, src FROM e WHERE src <> dst)),
f AS (SELECT c_custkey AS vid, CAST(c_acctbal AS DOUBLE) AS val FROM customer)
SELECT u.src AS vid, ROUND(AVG(f.val), 6) AS nbr_mean,
       ROUND(MAX(f.val), 6) AS nbr_max, COUNT(*) AS nbr_count
FROM und u JOIN f ON f.vid = u.dst
GROUP BY u.src"""
)


def q_ego_net(spark, sf_dir):
    """Ego-network extraction (algorithms.ego_network, beyond-reference):
    the edge multiset of the subgraph within 2 directed hops of
    customers 0-2."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") < 3).select(
        F.col("c_custkey").cast("long")
    )
    return algorithms.ego_network(edges, seeds, radius=2)


O_EGO_NET = _with_e(
    """, ball(vid, d) AS (
  SELECT c_custkey, 0 FROM customer WHERE c_custkey < 3
  UNION
  SELECT e.dst, b.d + 1 FROM ball b JOIN e ON e.src = b.vid WHERE b.d < 2),
bs AS (SELECT DISTINCT vid FROM ball)
SELECT e.src, e.dst FROM e
JOIN bs s ON s.vid = e.src
JOIN bs t ON t.vid = e.dst""",
    recursive=True,
)


def q_funnel(spark, sf_dir):
    """Conversion-funnel analysis (streaming.events.funnel,
    beyond-reference): earliest strictly-ordered view -> click ->
    purchase completion per user over the events table."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    return ev.funnel(events, ["view", "click", "purchase"])


O_FUNNEL = """
WITH s0 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s1 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
  FROM events e JOIN s0 ON s0.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s0.t0
  GROUP BY e.user_id),
s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t1
  GROUP BY e.user_id)
SELECT s0.user_id,
       CAST(CASE WHEN s2.t2 IS NOT NULL THEN 3
                 WHEN s1.t1 IS NOT NULL THEN 2
                 ELSE 1 END AS BIGINT) AS steps_completed,
       s0.t0 AS first_us,
       COALESCE(s2.t2, s1.t1, s0.t0) AS last_us
FROM s0
LEFT JOIN s1 ON s1.user_id = s0.user_id
LEFT JOIN s2 ON s2.user_id = s0.user_id
"""


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention (streaming.events.cohort_retention,
    beyond-reference): distinct active users per (first-event cohort
    week, week offset)."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    return ev.cohort_retention(events)


O_COHORT_RETENTION = """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
first AS (
  SELECT user_id, MIN(wk) AS cohort FROM act GROUP BY user_id)
SELECT epoch_us(f.cohort) AS cohort_us,
       CAST(date_diff('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM act a JOIN first f ON f.user_id = a.user_id
GROUP BY 1, 2
"""


def q_session_paths(spark, sf_dir):
    """Top user-journey paths (streaming.events.session_paths,
    beyond-reference): most frequent per-session event-type sequences,
    gap 60 min, top 10 — built by sort-free array_agg + in-row
    array_sort, deterministic under timestamp ties via (ts, event_id)."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    return ev.session_paths(events, gap_minutes=60, top_n=10)


O_SESSION_PATHS = """
WITH flagged AS (
  SELECT *,
         CASE WHEN COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER w, 3600000001)
                   > 3600000000 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT *, SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
  FROM sessions GROUP BY user_id, session_id
)
SELECT path, COUNT(*) AS n_sessions, COUNT(DISTINCT user_id) AS n_users
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC LIMIT 10
"""


def q_cheapest_path_vertices(spark, sf_dir):
    """Weighted cheapest path WITH the vertex array (beyond-reference —
    the reference's cheapest_path_length returns only the cost,
    cheapest_path_length.cpp): Bellman-Ford carrying (cost, path) with
    lexicographic tie-break; weights are integral so tie-break equality
    is exact on both engines."""
    setup(spark, sf_dir)
    edges = pathops.edge_frame(spark.table("c_edges"), "src", "dst", weight_col="w")
    sources = spark.table("customer").where("c_custkey < 3").select(
        F.col("c_custkey").cast("long")
    )
    dist = pathops.cheapest_path_distances(edges, sources=sources, track_paths=True)
    # Serialized to a string because the driver's canonicalizer hashes
    # scalars (same convention as q_shortest_path_vertices).
    return dist.select(
        F.col("src").alias("a_key"),
        F.col("dst").alias("b_key"),
        F.col("cost").cast("bigint").alias("cost"),
        F.concat_ws(
            "->", F.transform(F.col("path"), lambda x: x.cast("string"))
        ).alias("path_str"),
    )


def _cpv_oracle(rounds: int = 30) -> str:
    parts = [
        """d0 AS MATERIALIZED (
  SELECT c_custkey AS src, c_custkey AS dst, CAST(0 AS DOUBLE) AS cost,
         [CAST(c_custkey AS BIGINT)] AS path
  FROM customer WHERE c_custkey < 3)"""
    ]
    for r in range(1, rounds + 1):
        p = f"d{r - 1}"
        # two-step min: cheapest cost per pair, then the lexicographically
        # smallest path among the cost-minimal candidates — the (cost,
        # path) relaxation order of cheapest_path_distances(track_paths)
        parts.append(
            f"""c{r} AS (
  SELECT src, dst, cost, path FROM {p}
  UNION ALL
  SELECT d.src, e.dst, d.cost + e.w, list_append(d.path, CAST(e.dst AS BIGINT))
  FROM {p} d JOIN e ON e.src = d.dst)"""
        )
        parts.append(
            f"""mc{r} AS (SELECT src, dst, MIN(cost) AS cost FROM c{r} GROUP BY 1, 2)"""
        )
        parts.append(
            f"""d{r} AS MATERIALIZED (
  SELECT c.src, c.dst, c.cost, MIN(c.path) AS path
  FROM c{r} c JOIN mc{r} m
    ON m.src = c.src AND m.dst = c.dst AND m.cost = c.cost
  GROUP BY 1, 2, 3)"""
        )
    body = ",\n".join(parts)
    return (
        f"WITH e AS ({EDGES_SQL}),\n{body}\n"
        f"SELECT src AS a_key, dst AS b_key, CAST(cost AS BIGINT) AS cost, "
        f"array_to_string(path, '->') AS path_str "
        f"FROM d{rounds}"
    )


O_CHEAPEST_PATH_VERTICES = _cpv_oracle(30)


def q_match_cheapest(spark, sf_dir):
    """ANY CHEAPEST in the MATCH language itself (beyond-reference,
    GQL-style): cheapest weighted walk with COST w, full path functions.
    Tie-break is the lexicographically-smallest INTERLEAVED [v,e,v,...]
    array, so the oracle relaxes the identical (cost, interleaved-path)
    order."""
    pgq = setup(spark, sf_dir)
    return pgq.graph_table(
        """social MATCH p = ANY CHEAPEST (a:Customer WHERE a.c_custkey < 3)-[f:Follows COST w]->*(b:Customer)
           COLUMNS (a.c_custkey AS a_key, b.c_custkey AS b_key,
                    path_cost(p) AS cost, path_length(p) AS hops,
                    vertices(p) AS vpath)"""
    ).select(
        "a_key", "b_key", F.col("cost").cast("bigint").alias("cost"),
        "hops",
        # driver's canonicalizer hashes scalars — serialize the array
        F.concat_ws(
            "->", F.transform(F.col("vpath"), lambda x: x.cast("string"))
        ).alias("vpath_str"),
    )


def _match_cheapest_oracle(rounds: int = 30) -> str:
    parts = [
        """d0 AS MATERIALIZED (
  SELECT c_custkey AS src, c_custkey AS dst, CAST(0 AS DOUBLE) AS cost,
         [CAST(c_custkey AS BIGINT)] AS path
  FROM customer WHERE c_custkey < 3)"""
    ]
    for r in range(1, rounds + 1):
        p = f"d{r - 1}"
        parts.append(
            f"""c{r} AS (
  SELECT src, dst, cost, path FROM {p}
  UNION ALL
  SELECT d.src, e.dst, d.cost + e.w,
         list_append(list_append(d.path, CAST(e.eid AS BIGINT)),
                     CAST(e.dst AS BIGINT))
  FROM {p} d JOIN e ON e.src = d.dst)"""
        )
        parts.append(
            f"mc{r} AS (SELECT src, dst, MIN(cost) AS cost FROM c{r} GROUP BY 1, 2)"
        )
        parts.append(
            f"""d{r} AS MATERIALIZED (
  SELECT c.src, c.dst, c.cost, MIN(c.path) AS path
  FROM c{r} c JOIN mc{r} m
    ON m.src = c.src AND m.dst = c.dst AND m.cost = c.cost
  GROUP BY 1, 2, 3)"""
        )
    body = ",\n".join(parts)
    return (
        f"WITH e AS ({EDGES_SQL}),\n{body}\n"
        f"SELECT src AS a_key, dst AS b_key, CAST(cost AS BIGINT) AS cost,\n"
        f"       CAST(len(path) // 2 AS BIGINT) AS hops,\n"
        f"       array_to_string(list_select(path,"
        f" list_filter(generate_series(1, len(path)),"
        f" i -> i % 2 = 1)), '->') AS vpath_str\n"
        f"FROM d{rounds}"
    )


O_MATCH_CHEAPEST = _match_cheapest_oracle(30)


def q_group_sample(spark, sf_dir):
    """Per-source document cap (operators/corpus.per_group_sample,
    beyond-reference): at most 10 documents per source (sources carry 25
    each, so the cap genuinely cuts) by deterministic content-hash order
    — the corpus-mixing balance step."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    out = corpus.per_group_sample(docs, ["source"], "doc_id", 10, salt="gs")
    return out.select("doc_id", "source")


O_GROUP_SAMPLE = """
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|gs'), 1, 15))::BIGINT ASC,
                    doc_id ASC
         ) AS rk
  FROM documents)
SELECT doc_id, source FROM r WHERE rk <= 10
"""


def q_eccentricity(spark, sf_dir):
    """Seed-set eccentricity (algorithms.eccentricity, beyond-reference):
    max finite BFS distance from customers 100-107 — the sampled
    diameter/radius estimator."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(
        (F.col("c_custkey") >= 100) & (F.col("c_custkey") < 108)
    ).select(F.col("c_custkey").cast("long"))
    return algorithms.eccentricity(edges, seeds)


O_ECCENTRICITY = _with_e(
    """, bfs(src, dst, d) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  WHERE c_custkey >= 100 AND c_custkey < 108
  UNION
  SELECT b.src, e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.dst WHERE b.d < 60),
mind AS (SELECT src, dst, MIN(d) AS d FROM bfs GROUP BY src, dst)
SELECT src AS vid, CAST(MAX(d) AS BIGINT) AS eccentricity,
       COUNT(*) AS reached
FROM mind GROUP BY src""",
    recursive=True,
)


def q_path_counts(spark, sf_dir):
    """Shortest-path counting (algorithms.shortest_path_counts,
    beyond-reference — Brandes' sigma forward pass): distinct geodesic
    multiplicities from customers 0-4, replayed by the oracle as
    unrolled level-synchronous CTEs with the identical
    sum-over-predecessors recurrence."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") < 5).select(
        F.col("c_custkey").cast("long")
    )
    return algorithms.shortest_path_counts(edges, seeds)


def _sigma_oracle(rounds: int = 10) -> str:
    parts = [
        """f0 AS MATERIALIZED (
  SELECT c_custkey AS src, c_custkey AS dst, 0 AS dist,
         CAST(1 AS DOUBLE) AS sigma
  FROM customer WHERE c_custkey < 5)""",
        "vis0 AS MATERIALIZED (SELECT * FROM f0)",
    ]
    for L in range(1, rounds + 1):
        p, v = f"f{L - 1}", f"vis{L - 1}"
        parts.append(
            f"""f{L} AS MATERIALIZED (
  SELECT t.src, t.dst, {L} AS dist, t.sigma FROM (
    SELECT f.src, e.dst, SUM(f.sigma) AS sigma
    FROM {p} f JOIN e ON e.src = f.dst GROUP BY f.src, e.dst) t
  WHERE NOT EXISTS (
    SELECT 1 FROM {v} x WHERE x.src = t.src AND x.dst = t.dst))"""
        )
        parts.append(
            f"""vis{L} AS MATERIALIZED (
  SELECT * FROM {v} UNION ALL SELECT * FROM f{L})"""
        )
    body = ",\n".join(parts)
    return (
        f"WITH e AS ({EDGES_SQL}),\n{body}\n"
        f"SELECT src, dst, dist, CAST(sigma AS BIGINT) AS sigma FROM vis{rounds}"
    )


O_PATH_COUNTS = _sigma_oracle(10)


def q_betweenness(spark, sf_dir):
    """Source-sampled Brandes betweenness (algorithms
    .betweenness_centrality, beyond-reference): dependency accumulation
    from customers 0-4, depth-bounded at 8 so the oracle can replay both
    passes as unrolled level CTEs."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") < 5).select(
        F.col("c_custkey").cast("long")
    )
    bc = algorithms.betweenness_centrality(edges, seeds, max_hops=8)
    return bc.select("vid", F.round("betweenness", 6).alias("betweenness"))


def _betweenness_oracle(depth: int = 8) -> str:
    parts = [
        """f0 AS MATERIALIZED (
  SELECT c_custkey AS src, c_custkey AS dst, CAST(1 AS DOUBLE) AS sigma
  FROM customer WHERE c_custkey < 5)""",
        "vis0 AS MATERIALIZED (SELECT src, dst FROM f0)",
    ]
    for L in range(1, depth + 1):
        p, v = f"f{L - 1}", f"vis{L - 1}"
        parts.append(
            f"""f{L} AS MATERIALIZED (
  SELECT t.src, t.dst, t.sigma FROM (
    SELECT f.src, e.dst, SUM(f.sigma) AS sigma
    FROM {p} f JOIN e ON e.src = f.dst GROUP BY f.src, e.dst) t
  WHERE NOT EXISTS (
    SELECT 1 FROM {v} x WHERE x.src = t.src AND x.dst = t.dst))"""
        )
        parts.append(
            f"""vis{L} AS MATERIALIZED (
  SELECT src, dst FROM {v} UNION ALL SELECT src, dst FROM f{L})"""
        )
    parts.append(
        f"dl{depth} AS MATERIALIZED (SELECT src, dst AS vid, "
        f"CAST(0 AS DOUBLE) AS delta FROM f{depth})"
    )
    for L in range(depth - 1, -1, -1):
        parts.append(
            f"""dl{L} AS MATERIALIZED (
  SELECT v.src, v.dst AS vid, COALESCE(a.acc, 0) AS delta
  FROM f{L} v
  LEFT JOIN (
    SELECT vv.src, vv.dst AS vid,
           SUM(vv.sigma / w.sigma * (1 + d.delta)) AS acc
    FROM f{L} vv
    JOIN e ON e.src = vv.dst
    JOIN f{L + 1} w ON w.src = vv.src AND w.dst = e.dst
    JOIN dl{L + 1} d ON d.src = vv.src AND d.vid = e.dst
    GROUP BY vv.src, vv.dst) a
  ON a.src = v.src AND a.vid = v.dst)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT src, vid, delta FROM dl{L}" for L in range(depth + 1)
    )
    body = ",\n".join(parts)
    return (
        f"WITH e AS ({EDGES_SQL}),\n{body},\n"
        f"alld AS ({union})\n"
        f"SELECT vid, ROUND(SUM(delta), 6) AS betweenness\n"
        f"FROM alld WHERE vid <> src GROUP BY vid"
    )


O_BETWEENNESS = _betweenness_oracle(8)


def q_harmonic(spark, sf_dir):
    """Harmonic centrality over a seed set
    (algorithms.harmonic_centrality, beyond-reference): sum of inverse
    BFS distances from customers 0-7."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    seeds = spark.table("customer").where(F.col("c_custkey") < 8).select(
        F.col("c_custkey").cast("long")
    )
    h = algorithms.harmonic_centrality(edges, seeds)
    return h.select("vid", F.round("harmonic", 6).alias("harmonic"), "reached")


O_HARMONIC = _with_e(
    """, bfs(src, dst, d) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 8
  UNION
  SELECT b.src, e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.dst WHERE b.d < 60),
mind AS (SELECT src, dst, MIN(d) AS d FROM bfs GROUP BY src, dst)
SELECT src AS vid,
       ROUND(COALESCE(SUM(CASE WHEN d > 0 THEN 1.0 / d END), 0), 6) AS harmonic,
       COUNT(*) AS reached
FROM mind GROUP BY src""",
    recursive=True,
)


def q_k_truss(spark, sf_dir):
    """3-truss of the follows graph (algorithms.k_truss,
    beyond-reference): peel edges outside any triangle to the fixpoint
    — the oracle unrolls 12 peel rounds (idempotent past convergence,
    like the k_core oracle's margin)."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    return algorithms.k_truss(edges, k=3)


def _k_truss_oracle(need: int = 1, rounds: int = 12) -> str:
    parts = [
        """c0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM e WHERE src <> dst)"""
    ]
    for r in range(1, rounds + 1):
        p = f"c{r - 1}"
        parts.append(
            f"""adj{r} AS MATERIALIZED (
  SELECT src, dst FROM {p} UNION ALL SELECT dst, src FROM {p})"""
        )
        parts.append(
            f"""sup{r} AS MATERIALIZED (
  SELECT c.src, c.dst, COUNT(*) AS s
  FROM {p} c
  JOIN adj{r} a ON a.src = c.src
  JOIN adj{r} b ON b.src = c.dst AND b.dst = a.dst
  GROUP BY c.src, c.dst)"""
        )
        parts.append(
            f"""c{r} AS MATERIALIZED (
  SELECT c.src, c.dst FROM {p} c
  JOIN sup{r} s ON s.src = c.src AND s.dst = c.dst
  WHERE s.s >= {need})"""
        )
    body = ",\n".join(parts)
    return f"WITH e AS ({EDGES_SQL}),\n{body}\nSELECT src, dst FROM c{rounds}"


O_K_TRUSS = _k_truss_oracle(1, 12)


def q_csr_edges(spark, sf_dir):
    """CSR edge-array debug dump (reference get_csr_e/get_csr_w,
    getpgschema.test:84-98): the Follows edges in (src, dst, edge_id)
    CSR order with position index and weight lane."""
    pgq = setup(spark, sf_dir)
    df = pgq.get_csr_e("social", "Customer", "Follows", weight_col="w")
    return df.select(
        F.col("pos").cast("long").alias("pos"),
        "src", "dst", "edge_id",
        F.col("weight").cast("long").alias("weight"),
    )


O_CSR_EDGES = _with_e(
    """SELECT CAST(row_number() OVER (ORDER BY src, dst, eid) - 1 AS BIGINT)
                AS pos,
              src, dst, eid AS edge_id, CAST(w AS BIGINT) AS weight
       FROM e"""
)


def q_csr_offsets(spark, sf_dir):
    """CSR offsets debug dump (reference get_csr_v/get_csr_ptr,
    getpgschema.test:100-107): per-vertex out-degree and the exclusive
    prefix sum — the reference's v array."""
    pgq = setup(spark, sf_dir)
    df = pgq.get_csr_v("social", "Customer", "Follows")
    return df.select(
        F.col("dense_id").cast("long").alias("dense_id"),
        "vid",
        F.col("out_degree").cast("long").alias("out_degree"),
        F.col("ptr").cast("long").alias("ptr"),
    )


O_CSR_OFFSETS = _with_e(
    """SELECT CAST(row_number() OVER (ORDER BY v.c_custkey) - 1 AS BIGINT)
                AS dense_id,
              CAST(v.c_custkey AS BIGINT) AS vid,
              CAST(COALESCE(d.c, 0) AS BIGINT) AS out_degree,
              CAST(COALESCE(SUM(COALESCE(d.c, 0)) OVER (
                     ORDER BY v.c_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS ptr
       FROM customer v
       LEFT JOIN (SELECT src, count(*) AS c FROM e GROUP BY src) d
         ON d.src = v.c_custkey"""
)


def q_pipeline_corpus(spark, sf_dir):
    """The END-TO-END training-data pipeline — the composition a 100 TB
    corpus job actually runs, stitched from the individually-verified
    stages: language filter (en) -> quality gate (q >= 0.5) -> exact
    dedup (lowest doc_id per text) -> near-dup pair-drop (MinHash+LSH
    banded candidates, estimated Jaccard >= 0.5; the HIGHER id of every
    pair is dropped — greedy and deterministic, no transitive closure)
    -> next-fit packing into 512-token bins across 4 hash shards ->
    per-bin stats.  Catalyst prunes `documents` to (doc_id, text) at
    the scan; only the packing step leaves the JVM (applyInPandas per
    shard).

    The near-dup stage is LSH-banded, NOT the brute 3-gram-Jaccard
    self-join, by measurement: at the 10x tier the scale data's
    near-dup density makes shingle-join candidates grow quadratically
    (the jaccard variant measured 141 s in the candidate join alone vs
    ~14 s end-to-end for LSH) — banding bounds candidate generation to
    bucket-local pairs, which is the property that survives 100 TB."""
    setup(spark, sf_dir)
    docs = spark.table("documents").withColumn("__toks", TX.tokens(F.col("text")))
    t = F.col("__toks")
    scored = docs.select(
        "doc_id",
        "text",
        TX.lang_id(F.col("text"), toks=t).alias("lang"),
        F.round(TX.quality_score(F.col("text"), toks=t), 6).alias("q"),
        TX.token_count(F.col("text"), toks=t).cast("long").alias("n_tok"),
    )
    kept = scored.where((F.col("lang") == "en") & (F.col("q") >= 0.5))
    # Persist + eager populate on the deduped corpus: the Jaccard stage
    # self-joins it and the packing stage reads it again — without the
    # cache the whole scoring+dedup subtree executes once PER READER
    # inside the single action (measured at 10x data: 88.7 s; the
    # subtree alone is ~19 s and ran ~4x).  A lazy persist still let the
    # self-join's two shingle stages race the first materialization
    # (54.7 s), so the count() pays the subtree exactly once up front —
    # the barrier a production pipeline puts after dedup.
    exact = dedup.deduplicate_exact(kept, "doc_id", "text").persist()
    exact.count()
    pairs = dedup.minhash_lsh_pairs(
        exact, "doc_id", "text", n=2, num_perm=16, bands=8, threshold=0.5
    )
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    # Materialize the (small) survivor list and release the cached corpus
    # NOW: leaving `exact` persisted until gc measurably degraded every
    # query that ran after this one in the same session (graph_report
    # 8.6 -> 33 s in the bench tail).  The pipeline's session residue is
    # then two small checkpointed frames, not the full scored corpus.
    surv = pathops.materialize(
        exact.join(drop, "doc_id", "left_anti").select("doc_id", "n_tok")
    )
    exact.unpersist()
    packed = corpus.pack_sequences(
        surv, "doc_id", "n_tok", budget=512, num_shards=4,
    )
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
    )


def _pipeline_corpus_oracle() -> str:
    stops = " + ".join(
        f"CAST(list_contains(t, '{w}') AS INT)" for w in TX.LANG_MARKERS["en"]
    )
    q = _Q_SQL.format(stops=stops, nstops=len(TX.LANG_MARKERS["en"]))
    shard = f"{_MD5L.format(X='CAST(doc_id AS VARCHAR)')} % 4"
    lsh_parts = ",\n".join(_minhash_lsh_parts(16, 8, 0.5, src="exact", p="l_"))
    return f"""
WITH RECURSIVE toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
scored AS MATERIALIZED (
  SELECT doc_id, text, t, CAST(len(t) AS BIGINT) AS n_tok, {q} AS q
  FROM toks WHERE ({_lang_case_sql()}) = 'en'
),
kept AS (SELECT * FROM scored WHERE q >= 0.5),
exact AS MATERIALIZED (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1),
{lsh_parts},
surv AS MATERIALIZED (
  SELECT doc_id, n_tok FROM exact
  WHERE doc_id NOT IN (SELECT id_b FROM l_scored WHERE est_jaccard >= 0.5)),
ordered AS MATERIALIZED (
  SELECT doc_id, n_tok, {shard} AS shard,
         row_number() OVER (PARTITION BY {shard} ORDER BY doc_id) AS rn
  FROM surv),
pack AS (
  SELECT shard, rn, doc_id, n_tok, CAST(0 AS BIGINT) AS bin_id, n_tok AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.n_tok,
         CASE WHEN p.fill + o.n_tok > 512 THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + o.n_tok > 512 THEN o.n_tok ELSE p.fill + o.n_tok END
  FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT shard, bin_id, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
FROM pack GROUP BY 1, 2
"""


O_PIPELINE_CORPUS = _pipeline_corpus_oracle()


def q_substring_dedup(spark, sf_dir):
    """Exact duplicated-passage removal (dedup.exact_substring_dedup,
    the Lee et al. ExactSubstr shape over 8-token windows): every
    8-token span occurring more than once corpus-wide survives only at
    its first (doc_id, pos) occurrence; clean text is rebuilt from the
    surviving tokens."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return dedup.exact_substring_dedup(docs, "doc_id", "text", window=8)


O_SUBSTRING_DEDUP = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t, len({_TOKS}) AS n FROM documents),
pos AS (
  SELECT doc_id, t, n,
         UNNEST(CASE WHEN n >= 8 THEN generate_series(1, n - 7)
                ELSE CAST([] AS BIGINT[]) END) AS pos
  FROM toks),
wins AS (
  SELECT doc_id, pos,
         {_MD5L.format(X="array_to_string(t[pos:pos+7], ' ')")} AS wh
  FROM pos),
wins2 AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY wh) AS occ
  FROM wins),
dropped AS (SELECT doc_id, pos FROM wins2 WHERE occ > 1 AND rn > 1),
covered AS (
  SELECT DISTINCT doc_id, UNNEST(generate_series(pos, pos + 7)) AS cov
  FROM dropped),
allpos AS (
  SELECT doc_id, t, UNNEST(generate_series(1, n)) AS cov FROM toks WHERE n > 0),
kept AS (
  SELECT a.doc_id, a.cov, a.t[a.cov] AS tok
  FROM allpos a
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = a.doc_id AND c.cov = a.cov)),
reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY cov ASC) AS clean_text,
         COUNT(*) AS n_tokens
  FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(COALESCE(r.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(t.n - COALESCE(r.n_tokens, 0) AS BIGINT) AS n_removed
FROM toks t LEFT JOIN reb r USING (doc_id)
"""


def q_pipeline_curation(spark, sf_dir):
    """Second end-to-end curation pipeline, composing the round-7
    stages: language filter (en) -> quality gate (q >= 0.5) -> exact
    dedup (lowest doc_id per text) -> exact duplicated-PASSAGE removal
    (8-token windows, first occurrence wins) -> drop docs left with
    < 10 tokens -> curriculum binning by surviving length -> per-phase
    budget report.  Every stage is the same operator the standalone
    driver queries verify; the composition stays one lazy plan up to
    curriculum's two materialized global ranks."""
    setup(spark, sf_dir)
    docs = spark.table("documents").withColumn("__toks", TX.tokens(F.col("text")))
    t = F.col("__toks")
    scored = docs.select(
        "doc_id",
        "text",
        TX.lang_id(F.col("text"), toks=t).alias("lang"),
        F.round(TX.quality_score(F.col("text"), toks=t), 6).alias("q"),
    )
    kept = scored.where((F.col("lang") == "en") & (F.col("q") >= 0.5))
    deduped = dedup.deduplicate_exact(kept, "doc_id", "text").select("doc_id", "text")
    sub = dedup.exact_substring_dedup(deduped, "doc_id", "text", window=8)
    surv = sub.where(F.col("n_tokens") >= 10).select("doc_id", "n_tokens", "n_removed")
    binned = corpus.curriculum_bins(surv, "doc_id", "n_tokens", n_bins=4)
    return binned.groupBy("phase").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("phase_tokens"),
        F.sum("n_removed").alias("tokens_removed"),
    )


def _pipeline_curation_oracle() -> str:
    stops = " + ".join(
        f"CAST(list_contains(t, '{w}') AS INT)" for w in TX.LANG_MARKERS["en"]
    )
    q = _Q_SQL.format(stops=stops, nstops=len(TX.LANG_MARKERS["en"]))
    return f"""
WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
scored AS (
  SELECT doc_id, text, {q} AS q FROM toks WHERE ({_lang_case_sql()}) = 'en'),
kept AS (SELECT doc_id, text FROM scored WHERE q >= 0.5),
deduped AS (
  SELECT doc_id, text FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1),
t2 AS (SELECT doc_id, {_TOKS} AS t, len({_TOKS}) AS n FROM deduped),
pos AS (
  SELECT doc_id, t,
         UNNEST(CASE WHEN n >= 8 THEN generate_series(1, n - 7)
                ELSE CAST([] AS BIGINT[]) END) AS pos
  FROM t2),
wins AS (
  SELECT doc_id, pos,
         {_MD5L.format(X="array_to_string(t[pos:pos+7], ' ')")} AS wh
  FROM pos),
wins2 AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY wh) AS occ
  FROM wins),
dropped AS (SELECT doc_id, pos FROM wins2 WHERE occ > 1 AND rn > 1),
covered AS (
  SELECT DISTINCT doc_id, UNNEST(generate_series(pos, pos + 7)) AS cov
  FROM dropped),
allpos AS (SELECT doc_id, UNNEST(generate_series(1, n)) AS cov FROM t2 WHERE n > 0),
keptpos AS (
  SELECT a.doc_id, COUNT(*) AS n_tokens
  FROM allpos a
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = a.doc_id AND c.cov = a.cov)
  GROUP BY a.doc_id),
docs2 AS (
  SELECT t2.doc_id, COALESCE(k.n_tokens, 0) AS n_tokens,
         t2.n - COALESCE(k.n_tokens, 0) AS n_removed
  FROM t2 LEFT JOIN keptpos k USING (doc_id)),
surv AS (SELECT * FROM docs2 WHERE n_tokens >= 10),
binned AS (
  SELECT *, CAST(ntile(4) OVER (ORDER BY n_tokens ASC, doc_id ASC) AS BIGINT) AS phase
  FROM surv)
SELECT phase, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS phase_tokens,
       CAST(SUM(n_removed) AS BIGINT) AS tokens_removed
FROM binned GROUP BY phase
"""


O_PIPELINE_CURATION = _pipeline_curation_oracle()


def q_vocab_drift(spark, sf_dir):
    """Corpus drift monitoring (corpus.vocab_drift): top-50 tokens by
    Jensen-Shannon divergence contribution between the src0 and src1
    snapshot slices — the between-crawl check before mixing a new
    snapshot into training data."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    a = docs.where(F.col("source") == "src0")
    b = docs.where(F.col("source") == "src1")
    return corpus.vocab_drift(a, b, top_n=50)


O_VOCAB_DRIFT = f"""
WITH ca AS (
  SELECT u AS token, COUNT(*) AS na
  FROM (SELECT UNNEST({_TOKS}) AS u FROM documents WHERE source = 'src0')
  GROUP BY 1),
cb AS (
  SELECT u AS token, COUNT(*) AS nb
  FROM (SELECT UNNEST({_TOKS}) AS u FROM documents WHERE source = 'src1')
  GROUP BY 1),
ta AS (SELECT CAST(SUM(na) AS DOUBLE) AS ta FROM ca),
tb AS (SELECT CAST(SUM(nb) AS DOUBLE) AS tb FROM cb),
j AS (
  SELECT token, COALESCE(na, 0) / ta AS p, COALESCE(nb, 0) / tb AS q
  FROM ca FULL OUTER JOIN cb USING (token) CROSS JOIN ta CROSS JOIN tb),
s AS (
  SELECT token, ROUND(p, 6) AS p_a, ROUND(q, 6) AS p_b,
         ROUND(
           CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
           + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END,
           9) AS js_contribution
  FROM j)
SELECT token, p_a, p_b, js_contribution FROM (
  SELECT *, row_number() OVER (ORDER BY js_contribution DESC, token ASC) AS rn
  FROM s) WHERE rn <= 50
"""


def q_apply_vocab(spark, sf_dir):
    """Tokenizer application (corpus.apply_vocab): induce a top-50
    vocabulary from the corpus itself (vocab_stats, occurrence-ranked,
    token tie-break), then map every document to (pos, token_id) rows
    with OOV marked as -1.  The vocab ranking window runs over the
    vocabulary relation — bounded by construction, never the corpus."""
    setup(spark, sf_dir)
    from pyspark.sql import Window

    docs = spark.table("documents")
    vs = corpus.vocab_stats(docs, "doc_id", "text")
    w = Window.orderBy(F.col("occurrences").desc(), F.col("token").asc())
    vocab = (
        vs.withColumn("token_id", (F.row_number().over(w) - 1).cast("long"))
        .where(F.col("token_id") < 50)
        .select("token", "token_id")
    )
    return corpus.apply_vocab(docs, vocab, "doc_id", "text", oov_id=-1)


O_APPLY_VOCAB = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (
  SELECT doc_id, CAST(z[2] AS BIGINT) AS pos, CAST(z[1] AS VARCHAR) AS token
  FROM (SELECT doc_id, UNNEST(list_zip(t, range(1, len(t) + 1))) AS z FROM toks)),
vs AS (SELECT token, COUNT(*) AS occurrences FROM tok GROUP BY token),
vocab AS (
  SELECT token, token_id FROM (
    SELECT token,
           CAST(row_number() OVER (ORDER BY occurrences DESC, token ASC) - 1 AS BIGINT)
             AS token_id
    FROM vs) WHERE token_id < 50)
SELECT t.doc_id, t.pos, COALESCE(v.token_id, -1) AS token_id
FROM tok t LEFT JOIN vocab v USING (token)
"""


def q_curriculum(spark, sf_dir):
    """Curriculum binning (corpus.curriculum_bins): 4 equal-budget phases
    by document length quantile + deterministic within-phase shuffle
    position.  The Spark plan is two range-sort + partition-offset global
    ranks (no single-partition window — the plan a 100 TB corpus can
    actually run); the oracle replays the semantics with plain ntile +
    row_number, proving the distributed rank computes exactly SQL's."""
    setup(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "n_chars")
    return corpus.curriculum_bins(docs, "doc_id", "n_chars", n_bins=4).select(
        "doc_id", "phase", "position"
    )


O_CURRICULUM = f"""
WITH phased AS (
  SELECT doc_id,
         CAST(ntile(4) OVER (ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS phase
  FROM documents
)
SELECT doc_id, phase,
       CAST(row_number() OVER (
         PARTITION BY phase
         ORDER BY {_MD5L.format(X="CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC
       ) AS BIGINT) AS position
FROM phased
"""


def q_graph_report(spark, sf_dir):
    """Composed graph-analytics report — algorithm outputs are ordinary
    DataFrames, so pagerank, WCC and out-degree JOIN back to vertex
    attributes in one plan: top-5 customers by pagerank per weakly
    connected component, with name and degree.  The CSR-based reference
    runs each kernel through its own scalar-UDF pipeline into separate
    results; this composition (two iterative kernels + window + joins,
    no materialized temp tables) is the Spark-first payoff."""
    setup(spark, sf_dir)
    edges = pathops.edge_frame(spark.table("c_edges"), "src", "dst")
    vertices = spark.table("customer").select(F.col("c_custkey").cast("long"))
    # the two kernels are independent until the join — run them from two
    # driver threads so each fills the other's per-round barrier gaps
    # (algorithms.run_concurrent; measured 11.2 -> 5.3 s at sf0.1)
    ranks, comp = algorithms.run_concurrent(
        lambda: algorithms.pagerank(edges, vertices, tol=0.0, max_iter=10),
        lambda: algorithms.weakly_connected_component(edges, vertices),
    )
    deg = edges.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("out_deg")
    )
    joined = (
        ranks.select("vid", F.round("pagerank", 6).alias("pr"))
        .join(comp, "vid")
        .join(deg, "vid", "left")
        .fillna(0, subset=["out_deg"])
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("component_id").orderBy(F.col("pr").desc(), F.col("vid"))
    top = joined.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 5)
    cust = spark.table("customer").select(
        F.col("c_custkey").cast("long").alias("vid"), "c_name"
    )
    return top.join(cust, "vid").select(
        "component_id", "vid", F.col("c_name").alias("name"), "pr",
        F.col("out_deg").cast("long").alias("out_deg"),
        F.col("rnk").cast("long").alias("rnk"),
    )


def _graph_report_oracle() -> str:
    parts = _pagerank_parts(10)
    parts += [
        """und AS (SELECT src, dst FROM e WHERE src <> dst
                 UNION SELECT dst, src FROM e WHERE src <> dst)""",
        """reach(a, b) AS (
         SELECT c_custkey, c_custkey FROM customer
         UNION
         SELECT r.a, u.dst FROM reach r JOIN und u ON u.src = r.b)""",
        "comp AS (SELECT a AS vid, MIN(b) AS component_id FROM reach GROUP BY a)",
        "deg AS (SELECT src AS vid, COUNT(*) AS out_deg FROM e GROUP BY src)",
        """j AS (SELECT c.component_id, r.vid, ROUND(r.rank, 6) AS pr,
                       COALESCE(d.out_deg, 0) AS out_deg
                FROM r10 r JOIN comp c ON c.vid = r.vid
                LEFT JOIN deg d ON d.vid = r.vid)""",
        """t AS (SELECT *, row_number() OVER (
                   PARTITION BY component_id ORDER BY pr DESC, vid) AS rnk
                FROM j)""",
    ]
    body = ",\n".join(parts)
    return f"""WITH RECURSIVE e AS ({EDGES_SQL}),
{body}
SELECT t.component_id, t.vid, cu.c_name AS name, t.pr,
       CAST(t.out_deg AS BIGINT) AS out_deg, CAST(t.rnk AS BIGINT) AS rnk
FROM t JOIN customer cu ON cu.c_custkey = t.vid WHERE t.rnk <= 5"""


O_GRAPH_REPORT = _graph_report_oracle()


def q_centrality_report(spark, sf_dir):
    """Composed centrality report (round 8): HITS, eigenvector, Katz and
    personalized PageRank over the same graph, joined into one
    (vid, hub, authority, eigenvector, katz, ppr) frame.  The four
    fixed-iteration kernels are independent until the join, so they run
    from four driver threads (algorithms.run_concurrent — the
    graph_report pattern, measured 2.1x there): each kernel's per-round
    job barriers fill the others' scheduler gaps, so the family costs
    ~the slowest kernel's wall, not the sum.  Values are identical to
    the four standalone queries (hits / eigenvector / katz /
    personalized_pagerank) — same inputs, same iteration budgets."""
    setup(spark, sf_dir)
    edges = spark.table("c_edges")
    cust = spark.table("customer")
    vertices = cust.select(F.col("c_custkey").cast("long"))
    sources = cust.where(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").cast("long")
    )
    pr_edges = pathops.edge_frame(edges, "src", "dst")
    hits_df, ev_df, katz_df, ppr_df = algorithms.run_concurrent(
        lambda: algorithms.hits(edges, vertices, max_iter=5),
        lambda: algorithms.eigenvector_centrality(edges, vertices, max_iter=10),
        lambda: algorithms.katz_centrality(
            edges, vertices, alpha=0.05, beta=1.0, max_iter=5
        ),
        lambda: algorithms.pagerank(
            pr_edges, vertices, tol=0.0, max_iter=10, sources=sources
        ),
    )
    return (
        hits_df.select(
            "vid",
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
        .join(
            ev_df.select(
                "vid", F.round("eigenvector", 6).alias("eigenvector")
            ),
            "vid",
        )
        .join(katz_df.select("vid", F.round("katz", 6).alias("katz")), "vid")
        .join(
            ppr_df.select("vid", F.round("pagerank", 6).alias("ppr")), "vid"
        )
    )


# oracle: the four standalone unrolled-CTE oracles as subqueries joined
# on vid — value-identical to the individual gates by construction
O_CENTRALITY_REPORT = f"""
SELECT h.vid AS vid, h.hub, h.authority, e.eigenvector, k.katz, p.ppr
FROM ({O_HITS}) h
JOIN ({O_EIGENVECTOR}) e ON e.vid = h.vid
JOIN ({O_KATZ}) k ON k.vid = h.vid
JOIN ({O_PERSONALIZED_PAGERANK}) p ON p.vid = h.vid
"""


# --------------------------------------------------------------------------
# corpus curation v2 (round 7): cross-snapshot dedup, paragraph dedup,
# keep-longest canonical selection, DSIR importance resampling, text
# normalization, streaming near-dup (batch-mode oracle entry)
# --------------------------------------------------------------------------


def q_cross_corpus_dedup(spark, sf_dir):
    """Snapshot-increment near-dedup (operators/dedup.cross_corpus_dedup,
    mode='near'): documents NOT in the reference slice (doc_id % 7 == 0)
    survive only if none of their MinHash band buckets collide with the
    reference — both sides' signatures computed in-row (shuffle-free),
    membership one (band, bh) semi-join."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    new = docs.where(F.col("doc_id") % 7 != 0)
    ref = docs.where(F.col("doc_id") % 7 == 0)
    out = dedup.cross_corpus_dedup(
        new, ref, "doc_id", "text", mode="near", n=2, num_perm=16, bands=8
    )
    return out.select("doc_id", "lang")


def _cross_corpus_oracle() -> str:
    nparts = _minhash_lsh_parts(
        16, 8, src="(SELECT * FROM documents WHERE doc_id % 7 != 0)", p="n_"
    )[:6]
    rparts = _minhash_lsh_parts(
        16, 8, src="(SELECT * FROM documents WHERE doc_id % 7 = 0)", p="r_"
    )[:6]
    body = ",\n".join(nparts + rparts)
    return f"""
WITH {body}
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id % 7 != 0 AND d.doc_id NOT IN (
  SELECT DISTINCT nb.doc_id
  FROM n_banded nb JOIN r_banded rb ON nb.band = rb.band AND nb.bh = rb.bh)
"""


O_CROSS_CORPUS_DEDUP = _cross_corpus_oracle()


def q_stream_near_dup(spark, sf_dir):
    """Streaming-safe duplicate filter in batch mode (streaming/events.
    near_dup_stream, mode='exact'): the same builder that filters a
    document stream against a static content-hash index — stateless
    stream-static anti-join, verified here on the batch frame (true
    readStream equivalence is pinned in tests/test_io_stateful.py)."""
    from .streaming import events as SE

    setup(spark, sf_dir)
    docs = spark.table("documents")
    new = docs.where(F.col("doc_id") % 7 != 0)
    ref = docs.where(F.col("doc_id") % 7 == 0)
    idx = SE.content_hash_index(ref, "text")
    return SE.near_dup_stream(new, idx, "doc_id", "text", mode="exact").select(
        "doc_id", "lang"
    )


O_STREAM_NEAR_DUP = f"""
SELECT doc_id, lang FROM documents
WHERE doc_id % 7 != 0 AND {_MD5L.format(X='text')} NOT IN (
  SELECT {_MD5L.format(X='text')} FROM documents WHERE doc_id % 7 = 0)
"""


def q_dedup_paragraphs(spark, sf_dir):
    """Corpus-global paragraph dedup (operators/dedup.dedup_paragraphs):
    pseudo-paragraphs are fixed 8-token windows (the testdata corpus is
    single-line, so the split is synthesized in-query); every repeated
    paragraph survives only at its first (doc, position) occurrence."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    toks = TX.tokens(F.col("text"))
    paras = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(8)),
        lambda s: F.array_join(F.slice(toks, s, 8), " "),
    )
    pre = docs.select("doc_id", paras.alias("paras"))
    return dedup.dedup_paragraphs(pre, "doc_id", "paras", sep="\n")


O_DEDUP_PARAGRAPHS = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
paras AS (
  SELECT doc_id, list_transform(generate_series(1, greatest(len(t), 1), 8),
                                s -> array_to_string(t[s:s+7], ' ')) AS ps
  FROM toks),
inst AS (
  SELECT doc_id, i - 1 AS pos, ps[i] AS para
  FROM paras, UNNEST(generate_series(1, len(ps))) AS u(i)),
flag AS (
  SELECT doc_id, pos, para,
         ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1 AS keep
  FROM inst)
SELECT doc_id,
  COALESCE(string_agg(CASE WHEN keep THEN para END, chr(10) ORDER BY pos), '')
    AS clean_text,
  CAST(COALESCE(SUM(CASE WHEN keep THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept,
  CAST(COUNT(*) - COALESCE(SUM(CASE WHEN keep THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_dropped
FROM flag GROUP BY doc_id
"""


def q_dedup_keep_longest(spark, sf_dir):
    """Near-dup removal keeping the FULLEST cluster member
    (operators/dedup.deduplicate_lsh keep='longest'): same LSH clusters
    as dedup_clusters, representative = max token count, id tie-break."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    clusters = dedup.dedup_clusters(
        docs, "doc_id", "text", n=2, num_perm=16, bands=8, threshold=0.5
    )
    kept = dedup.deduplicate_lsh(
        docs, "doc_id", "text", clusters=clusters, keep="longest"
    )
    return kept.select("doc_id", "lang")


O_DEDUP_KEEP_LONGEST = f"""
WITH RECURSIVE pairs AS ({_minhash_lsh_oracle(16, 8, 0.5)}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id FROM reach GROUP BY a),
lens AS (SELECT doc_id, len({_TOKS}) AS l FROM documents),
ranked AS (
  SELECT c.doc_id,
         ROW_NUMBER() OVER (PARTITION BY c.canonical_id
                            ORDER BY l.l DESC, c.doc_id ASC) AS rn
  FROM comp c JOIN lens l USING (doc_id)),
dropped AS (SELECT doc_id FROM ranked WHERE rn > 1)
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def q_importance_resample(spark, sf_dir):
    """DSIR-style importance resampling (operators/corpus.
    importance_resample): French documents as the target domain; keep
    the top-100 documents by mean hashed-unigram log-likelihood ratio
    (laplace-smoothed, 64 buckets), ties by id."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    target = docs.where(F.col("lang") == "fr")
    return corpus.importance_resample(
        docs, "doc_id", "text", target, k=100, n_buckets=64
    )


O_IMPORTANCE_RESAMPLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, u.tok FROM toks, UNNEST(t) AS u(tok)),
bkt AS (SELECT doc_id, {_MD5L.format(X='tok')} % 64 AS b FROM tok),
tgt AS (SELECT b, COUNT(*) AS tc FROM bkt JOIN documents USING (doc_id)
        WHERE lang = 'fr' GROUP BY b),
raw AS (SELECT b, COUNT(*) AS rc FROM bkt GROUP BY b),
tt AS (SELECT SUM(tc) AS tt FROM tgt),
rt AS (SELECT SUM(rc) AS rt FROM raw),
llr AS (
  SELECT COALESCE(g.b, r.b) AS b,
         ln((COALESCE(tc, 0) + 1.0) / (tt + 64.0))
           - ln((COALESCE(rc, 0) + 1.0) / (rt + 64.0)) AS llr
  FROM tgt g FULL OUTER JOIN raw r ON g.b = r.b, tt, rt),
sc AS (SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(llr), 6) AS score
       FROM bkt JOIN llr USING (b) GROUP BY doc_id)
SELECT doc_id, n_tokens, score FROM sc ORDER BY score DESC, doc_id LIMIT 100
"""


def q_text_normalize(spark, sf_dir):
    """Crawl-cleanup normalization (functions/text.normalize_text with
    strip_punct + ascii_fold): accents folded via the fixed translate
    table, ASCII punctuation stripped, whitespace collapsed — applied
    to a deliberately messy wrapper around each document so the pass is
    exercised (the synthetic corpus is already clean)."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    messy = F.concat(
        F.lit("  ¡Héllo!  "), F.upper(F.col("text")), F.lit("  Café, №1... ")
    )
    return docs.select(
        "doc_id",
        TX.normalize_text(messy, strip_punct=True, ascii_fold=True).alias("norm"),
    )


def _text_normalize_oracle() -> str:
    from .functions.text import ACCENT_FROM, ACCENT_TO

    return f"""
SELECT doc_id,
  trim(regexp_replace(regexp_replace(
    lower(translate('  ¡Héllo!  ' || upper(text) || '  Café, №1... ',
                    '{ACCENT_FROM}', '{ACCENT_TO}')),
    '[!-/:-@\\[-`{{-~]', '', 'g'), '\\s+', ' ', 'g')) AS norm
FROM documents
"""


O_TEXT_NORMALIZE = _text_normalize_oracle()


def q_temperature_sample(spark, sf_dir):
    """Temperature mixture sampling (operators/corpus.temperature_sample):
    per-language token targets proportional to share^0.7 (the
    multilingual up-sampling rule), applied as the shared content-hash
    Bernoulli draw — weights derived in-plan from group totals, no
    driver collect."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return corpus.temperature_sample(
        docs, "doc_id", "text", "lang", token_budget=5000, alpha=0.7, salt="t1"
    )


O_TEMPERATURE_SAMPLE = f"""
WITH toks AS (SELECT doc_id, lang, len({_TOKS}) AS ntok FROM documents),
tg AS (SELECT lang, SUM(ntok) AS tg FROM toks GROUP BY lang),
z AS (SELECT SUM(POWER(CAST(tg AS DOUBLE), 0.7)) AS z FROM tg),
thr AS (SELECT lang, LEAST(1000000, COALESCE(CAST(FLOOR(
          5000.0 * POWER(CAST(tg AS DOUBLE), 0.7) / z
          / CAST(NULLIF(tg, 0) AS DOUBLE) * 1000000)
        AS BIGINT), 0)) AS thr FROM tg, z)
SELECT t.doc_id, t.lang, CAST(t.ntok AS BIGINT) AS n_tok
FROM toks t JOIN thr USING (lang)
WHERE {_MD5L.format(X="CAST(doc_id AS VARCHAR) || 't1'")} % 1000000 < thr
"""


def q_bigram_logprob(spark, sf_dir):
    """Second-order LM quality proxy (operators/corpus.bigram_logprob):
    per-document mean bigram log-probability under the corpus's own MLE
    bigram model — catches in-vocabulary word salad that unigram
    scoring (doc_logprob) cannot."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return corpus.bigram_logprob(docs, "doc_id", "text")


O_BIGRAM_LOGPROB = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2),
perdoc AS (SELECT doc_id, w1, w2, COUNT(*) AS n FROM bg GROUP BY ALL),
model AS (SELECT w1, w2, SUM(n) AS c2 FROM perdoc GROUP BY ALL),
ctx AS (SELECT w1, SUM(c2) AS c1 FROM model GROUP BY w1)
SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
       ROUND(SUM(n * ln(c2 / c1)) / SUM(n), 6) AS avg_logprob
FROM perdoc JOIN model USING (w1, w2) JOIN ctx USING (w1)
GROUP BY doc_id
"""


def q_ref_bigram_logprob(spark, sf_dir):
    """Cross-corpus perplexity filter (corpus.bigram_logprob_vs): the
    CCNet/GPT-3 quality-filter shape — a Laplace-smoothed bigram LM
    trained on the src0 reference slice scores every other document;
    unseen contexts score 1/V, never log(0)."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    ref = docs.where(F.col("source") == "src0")
    tgt = docs.where(F.col("source") != "src0")
    return corpus.bigram_logprob_vs(tgt, ref, "doc_id", "text", alpha=0.5)


O_REF_BIGRAM_LOGPROB = f"""
WITH rf AS (SELECT {_TOKS} AS t FROM documents WHERE source = 'src0'),
rp AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM rf, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2),
model AS (SELECT w1, w2, COUNT(*) AS c2 FROM rp GROUP BY ALL),
ctx AS (SELECT w1, SUM(c2) AS c1 FROM model GROUP BY w1),
vv AS (SELECT COUNT(DISTINCT w2) AS v FROM model),
tg AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE source <> 'src0'),
tp AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM tg, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2),
tpc AS (SELECT doc_id, w1, w2, COUNT(*) AS n FROM tp GROUP BY ALL),
sc AS (
  SELECT doc_id, n,
         ln((COALESCE(c2, 0) + 0.5) / (COALESCE(c1, 0) + 0.5 * v)) AS lp
  FROM tpc LEFT JOIN model USING (w1, w2) LEFT JOIN ctx USING (w1) CROSS JOIN vv)
SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
       ROUND(SUM(n * lp) / SUM(n), 6) AS avg_logprob
FROM sc GROUP BY doc_id
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (operators/similarity.semantic_dedup):
    cluster the embedding space (8 deterministic seed centroids),
    within-cluster cosine pairs >= 0.3 -> connected components -> keep the
    minimum-id representative.  Embedding-side companion to MinHash."""
    setup(spark, sf_dir)
    emb = _emb_double(spark, sf_dir)
    kept = similarity.semantic_dedup(emb, threshold=0.3, nlist=8)
    return kept.select("vec_id")


O_SEMANTIC_DEDUP = """
WITH RECURSIVE emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM emb ORDER BY vec_id LIMIT 8),
csim AS (
  SELECT e.vec_id, c.cid,
         list_dot_product(e.v, c.cv) /
           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS sim
  FROM emb e CROSS JOIN cent c),
asg AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
    FROM csim) WHERE rn = 1),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN emb ea ON ea.vec_id = a.vec_id
  JOIN emb eb ON eb.vec_id = b.vec_id
  WHERE ROUND(list_dot_product(ea.v, eb.v) /
              (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))),
              6) >= 0.3),
edges AS (
  SELECT id_a AS x, id_b AS y FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT x, y FROM edges
  UNION
  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x),
comp AS (SELECT x AS vid, LEAST(x, MIN(y)) AS rep FROM reach GROUP BY x)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vid FROM comp WHERE vid != rep)
"""


def q_dedup_edit(spark, sf_dir):
    """LSH-blocked TRUE-edit-distance verification
    (operators/dedup.edit_distance_pairs): candidates come from the same
    MinHash banding as minhash_lsh_pairs (2-grams, 16 perms, 8 bands);
    each candidate pair is then verified with the Levenshtein DP —
    order-sensitive where MinHash/Jaccard are order-blind.  Keeps
    edit_sim >= 0.4.  The oracle replays the identical banding (shared
    CTE parts) and DuckDB's levenshtein()."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    return dedup.edit_distance_pairs(
        docs, "doc_id", "text", n=2, num_perm=16, bands=8, threshold=0.4
    )


O_DEDUP_EDIT = (
    "WITH "
    + ",\n".join(_minhash_lsh_parts(16, 8, 0.5)[:-1])
    + """
, lev AS (
  SELECT c.id_a, c.id_b,
         ROUND(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
               / GREATEST(len(da.text), len(db.text), 1), 6) AS edit_sim
  FROM cands c
  JOIN documents da ON da.doc_id = c.id_a
  JOIN documents db ON db.doc_id = c.id_b
)
SELECT id_a, id_b, edit_sim FROM lev WHERE edit_sim >= 0.4
"""
)


_BM25_QUERY_TERMS = [
    (0, "hash"), (0, "table"), (0, "scan"),
    (1, "sort"), (1, "merge"), (1, "window"),
    (2, "spark"), (2, "row"), (2, "value"),
]


def q_bm25(spark, sf_dir):
    """Okapi BM25 retrieval scoring (operators/corpus.bm25_scores,
    beyond-reference): three term queries against the documents corpus,
    Lucene idf variant, k1=1.2 b=0.75, top-20 docs per query (rounded
    score desc, doc_id tie-break)."""
    setup(spark, sf_dir)
    docs = spark.table("documents")
    qdf = spark.createDataFrame(_BM25_QUERY_TERMS, "qid long, term string")
    return corpus.bm25_scores(docs, "doc_id", "text", qdf, top_k=20)


# BM25 pipeline as reusable CTE parts ending in `sc` (qid, doc_id, score)
# — shared by O_BM25 and O_HYBRID_RETRIEVAL so the lexical leg can never
# drift between the two oracles
_BM25_PARTS = f"""q(qid, term) AS (
  VALUES {", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERY_TERMS)}
),
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tok AS (SELECT doc_id, u.token FROM toks, UNNEST(t) AS u(token)),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
dfq AS (SELECT token, COUNT(*) AS dfreq FROM tf GROUP BY token),
terms AS (
  SELECT q.qid, tf.doc_id,
         ln(1.0 + (st.n - dfq.dfreq + 0.5) / (dfq.dfreq + 0.5))
         * (tf.tf * 2.2)
         / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS s
  FROM q
  JOIN tf ON tf.token = q.term
  JOIN dfq ON dfq.token = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN st
),
sc AS (SELECT qid, doc_id, ROUND(SUM(s), 6) AS score FROM terms GROUP BY 1, 2)"""

O_BM25 = f"""
WITH {_BM25_PARTS},
r AS (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rk
  FROM sc
)
SELECT qid, doc_id, score FROM r WHERE rk <= 20
"""


def q_resample_fill(spark, sf_dir):
    """Time-series resample + gap fill (operators/relational.resample_fill,
    beyond-reference): per-user daily mean event value on a dense daily
    grid from each user's first to last active day, gaps forward-filled —
    the resample/locf shape DuckDB scripts with generate_series + window
    IGNORE NULLS."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    out = relational.resample_fill(events, "user_id", "ts", "value", unit="day")
    return out.select(
        F.col("key").alias("user_id"),
        ev.epoch_us(F.col("bucket")).alias("day_us"),
        F.round("value_ffill", 4).alias("value_ffill"),
    )


O_RESAMPLE_FILL = """
WITH per AS (
  SELECT user_id, date_trunc('day', ts) AS bucket, AVG(value) AS v
  FROM events GROUP BY 1, 2
),
b AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM per GROUP BY 1),
grid AS (
  SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket
  FROM b
),
j AS (
  SELECT g.user_id, g.bucket, per.v
  FROM grid g
  LEFT JOIN per ON per.user_id = g.user_id AND per.bucket = g.bucket
)
SELECT user_id, epoch_us(bucket) AS day_us,
       ROUND(ROUND(last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6), 4)
       AS value_ffill
FROM j
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(spark, sf_dir):
    """Long-to-wide pivot (operators/relational.pivot_counts): per-user
    event-type count matrix over the declared category set (explicit
    values — no distinct-discovery job), absent cells 0; DuckDB's PIVOT
    statement replayed as conditional aggregates in the oracle."""
    setup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    out = relational.pivot_counts(events, "user_id", "event_type", _EVENT_TYPES)
    return out.select(F.col("key").alias("user_id"), *_EVENT_TYPES)


O_PIVOT_EVENTS = (
    "SELECT user_id, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {t}"
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY user_id"
)


def q_group_quantiles(spark, sf_dir):
    """Exact interpolated per-group quantiles
    (operators/relational.group_quantiles): p25/p50/p75 of
    l_extendedprice per l_returnflag — SQL PERCENTILE_CONT semantics,
    DuckDB's quantile_cont in the oracle."""
    setup(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    return relational.group_quantiles(
        li, ["l_returnflag"], "l_extendedprice", (0.25, 0.5, 0.75)
    )


O_GROUP_QUANTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75
FROM lineitem GROUP BY l_returnflag
"""


def q_hybrid_retrieval(spark, sf_dir):
    """Hybrid retrieval (operators/similarity.rrf_fusion,
    beyond-reference): reciprocal-rank fusion of a BM25 lexical leg
    (same 3 term queries as q_bm25, top-20) with an embedding cosine
    leg (query vectors = embeddings 0-2, corpus vectors mapped to docs
    by vec_id % |documents|, best cosine per doc, top-20) — the
    standard two-tower curation/retrieval merge, no score calibration.
    rrf(q,d) = sum of 1/(60 + rank) over the lists that retrieved d."""
    setup(spark, sf_dir)
    from pyspark.sql import Window as W

    docs = spark.table("documents")
    n_docs = docs.count()
    qdf = spark.createDataFrame(_BM25_QUERY_TERMS, "qid long, term string")
    lex_rank = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())

    def _lex():
        return corpus.bm25_scores(docs, "doc_id", "text", qdf, top_k=20).withColumn(
            "rank", F.row_number().over(lex_rank)
        )

    def _sem():
        emb = _emb_double(spark, sf_dir)
        qvec = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        sims = (
            emb.crossJoin(F.broadcast(qvec))
            .select(
                "qid",
                (F.col("vec_id") % n_docs).alias("doc_id"),
                F.round(
                    similarity.cosine(F.col("qv"), F.col("embedding")), 6
                ).alias("cos"),
            )
            .groupBy("qid", "doc_id")
            .agg(F.max("cos").alias("cos"))
        )
        sem_rank = W.partitionBy("qid").orderBy(
            F.col("cos").desc(), F.col("doc_id").asc()
        )
        return (
            sims.withColumn("rank", F.row_number().over(sem_rank))
            .where(F.col("rank") <= 20)
            .localCheckpoint(eager=True)
        )

    # the legs are independent until the fusion — materialize them from
    # two driver threads (algorithms.run_concurrent pattern)
    lex, sem = algorithms.run_concurrent(_lex, _sem)
    fused = similarity.rrf_fusion(
        [lex, sem], query_col="qid", item_col="doc_id", rank_col="rank", k=60
    )
    return fused.select(
        F.col("query").alias("qid"),
        F.col("item").alias("doc_id"),
        "rrf_score",
        F.col("n_lists").cast("bigint").alias("n_lists"),
    )


O_HYBRID_RETRIEVAL = f"""
WITH {_BM25_PARTS},
lexr AS (
  SELECT qid, doc_id,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM sc
),
lex AS (SELECT qid, doc_id, rank FROM lexr WHERE rank <= 20),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nd AS (SELECT COUNT(*) AS n FROM documents),
sims AS (
  SELECT qv.vec_id AS qid, cv.vec_id % nd.n AS doc_id,
         MAX(ROUND(list_dot_product(qv.v, cv.v)
             / (sqrt(list_dot_product(qv.v, qv.v))
                * sqrt(list_dot_product(cv.v, cv.v))), 6)) AS cos
  FROM (SELECT * FROM emb WHERE vec_id < 3) qv
  CROSS JOIN emb cv
  CROSS JOIN nd
  GROUP BY 1, 2
),
semr AS (
  SELECT qid, doc_id,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos DESC, doc_id ASC) AS rank
  FROM sims
),
sem AS (SELECT qid, doc_id, rank FROM semr WHERE rank <= 20),
un AS (
  SELECT qid, doc_id, 1.0 / (60.0 + rank) AS c FROM lex
  UNION ALL
  SELECT qid, doc_id, 1.0 / (60.0 + rank) AS c FROM sem
)
SELECT qid, doc_id, ROUND(SUM(c), 6) AS rrf_score,
       CAST(COUNT(*) AS BIGINT) AS n_lists
FROM un GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES = {
    "match_1hop": q_match_1hop,
    "match_2hop": q_match_2hop,
    "match_undirected": q_match_undirected,
    "match_reverse": q_match_reverse,
    "match_bidirected": q_match_bidirected,
    "match_triangle": q_match_triangle,
    "match_inheritance": q_match_inheritance,
    "match_composite_key": q_match_composite_key,
    "shortest_composite": q_shortest_composite,
    "shortest_string": q_shortest_string,
    "var_length_1_2": q_var_length_1_2,
    "shortest_len": q_shortest_len,
    "reachability": q_reachability,
    "shortest_path_vertices": q_shortest_path_vertices,
    "topk_paths": q_topk_paths,
    "cheapest_path": q_cheapest_path,
    "pagerank": q_pagerank,
    "personalized_pagerank": q_personalized_pagerank,
    "neighbor_sample": q_neighbor_sample,
    "k_core": q_k_core,
    "sampled_neighborhood": q_sampled_neighborhood,
    "weighted_pagerank": q_weighted_pagerank,
    "wcc": q_wcc,
    "lcc": q_lcc,
    "summarize": q_summarize,
    "create_vertex_table": q_create_vertex_table,
    "tpch_q1": q_tpch_q1,
    "topk_per_group": q_topk_per_group,
    "asof_join": q_asof_join,
    "acyclic_paths": q_acyclic_paths,
    "all_shortest_paths": q_all_shortest_paths,
    "trail_paths": q_trail_paths,
    "chunk_docs": q_chunk_docs,
    "det_sample": q_det_sample,
    "stratified_sample": q_stratified_sample,
    "vocab_stats": q_vocab_stats,
    "tfidf": q_tfidf,
    "pack_sequences": q_pack_sequences,
    "interval_join": q_interval_join,
    "window_running_sum": q_window_running_sum,
    "rollup_orders": q_rollup_orders,
    "cube_lineitem": q_cube_lineitem,
    "semi_anti_join": q_semi_anti_join,
    "streaming_window": q_streaming_window,
    "streaming_dedup": q_streaming_dedup,
    "streaming_degree": q_streaming_degree,
    "streaming_join": q_streaming_join,
    "events_json": q_events_json,
    "events_daily": q_events_daily,
    "sessionize": q_sessionize,
    "lang_id": q_lang_id,
    "text_stats": q_text_stats,
    "quality_repetition": q_quality_repetition,
    "mixture_sample": q_mixture_sample,
    "corpus_clean": q_corpus_clean,
    "dedup_exact": q_dedup_exact,
    "dedup_fingerprint": q_dedup_fingerprint,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "simhash": q_simhash,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "dedup_clusters": q_dedup_clusters,
    "contamination": q_contamination,
    "similarity_topk": q_similarity_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "embedding_clusters": q_embedding_clusters,
    "multimodal_decode": q_multimodal_decode,
    "hits": q_hits,
    "scc": q_scc,
    "global_clustering": q_global_clustering,
    "random_walks": q_random_walks,
    "closeness": q_closeness,
    "distance_report": q_distance_report,
    "pii_redact": q_pii_redact,
    "communities": q_communities,
    "assortativity": q_assortativity,
    "doc_logprob": q_doc_logprob,
    "katz": q_katz,
    "link_pred": q_link_pred,
    "temporal_reach": q_temporal_reach,
    "temporal_reach_index": q_temporal_reach_index,
    "nbr_features": q_nbr_features,
    "ego_net": q_ego_net,
    "funnel": q_funnel,
    "cohort_retention": q_cohort_retention,
    "session_paths": q_session_paths,
    "cheapest_path_vertices": q_cheapest_path_vertices,
    "match_cheapest": q_match_cheapest,
    "group_sample": q_group_sample,
    "eccentricity": q_eccentricity,
    "path_counts": q_path_counts,
    "betweenness": q_betweenness,
    "harmonic": q_harmonic,
    "k_truss": q_k_truss,
    "csr_edges": q_csr_edges,
    "csr_offsets": q_csr_offsets,
    "pipeline_corpus": q_pipeline_corpus,
    "graph_report": q_graph_report,
    "centrality_report": q_centrality_report,
    "dedup_edit": q_dedup_edit,
    "bm25": q_bm25,
    "resample_fill": q_resample_fill,
    "pivot_events": q_pivot_events,
    "group_quantiles": q_group_quantiles,
    "hybrid_retrieval": q_hybrid_retrieval,
    "node2vec": q_node2vec,
    "rolling_7d": q_rolling_7d,
    "grouping_sets": q_grouping_sets,
    "weighted_sample": q_weighted_sample,
    "winsorize": q_winsorize,
    "attribution": q_attribution,
    "anomaly_zscore": q_anomaly_zscore,
    "copurchase_pmi": q_copurchase_pmi,
    "event_transitions": q_event_transitions,
    "eigenvector": q_eigenvector,
    "modularity": q_modularity,
    "communities_refined": q_communities_refined,
    "community_graph": q_community_graph,
    "conductance": q_conductance,
    "pipeline_v3": q_pipeline_v3,
    "streaming_anomaly": q_streaming_anomaly,
    "percolation": q_percolation,
    "profile_docs": q_profile_docs,
    "materialize_packs": q_materialize_packs,
    "dataset_split": q_dataset_split,
    "temporal_latest": q_temporal_latest,
    "nbr_features_l2": q_nbr_features_l2,
    "split_entropy": q_split_entropy,
    "degree_powerlaw": q_degree_powerlaw,
    "avg_path_length": q_avg_path_length,
    "burstiness": q_burstiness,
}

ORACLES = {
    "match_1hop": O_MATCH_1HOP,
    "match_2hop": O_MATCH_2HOP,
    "match_undirected": O_MATCH_UNDIRECTED,
    "match_reverse": O_MATCH_REVERSE,
    "match_bidirected": O_MATCH_BIDIRECTED,
    "match_triangle": O_MATCH_TRIANGLE,
    "match_inheritance": O_MATCH_INHERITANCE,
    "match_composite_key": O_MATCH_COMPOSITE_KEY,
    "shortest_composite": O_SHORTEST_COMPOSITE,
    "shortest_string": O_SHORTEST_STRING,
    "var_length_1_2": O_VAR_LENGTH_1_2,
    "shortest_len": O_SHORTEST_LEN,
    "reachability": O_REACHABILITY,
    "shortest_path_vertices": O_SHORTEST_PATH_VERTICES,
    "topk_paths": O_TOPK_PATHS,
    "cheapest_path": O_CHEAPEST_PATH,
    "pagerank": O_PAGERANK,
    "personalized_pagerank": O_PERSONALIZED_PAGERANK,
    "neighbor_sample": O_NEIGHBOR_SAMPLE,
    "k_core": O_K_CORE,
    "sampled_neighborhood": O_SAMPLED_NEIGHBORHOOD,
    "weighted_pagerank": O_WEIGHTED_PAGERANK,
    "wcc": O_WCC,
    "lcc": O_LCC,
    "summarize": O_SUMMARIZE,
    "create_vertex_table": O_CREATE_VERTEX_TABLE,
    "tpch_q1": O_TPCH_Q1,
    "topk_per_group": O_TOPK_PER_GROUP,
    "asof_join": O_ASOF_JOIN,
    "acyclic_paths": O_ACYCLIC_PATHS,
    "all_shortest_paths": O_ALL_SHORTEST_PATHS,
    "trail_paths": O_TRAIL_PATHS,
    "chunk_docs": O_CHUNK_DOCS,
    "det_sample": O_DET_SAMPLE,
    "stratified_sample": O_STRATIFIED_SAMPLE,
    "vocab_stats": O_VOCAB_STATS,
    "tfidf": O_TFIDF,
    "pack_sequences": O_PACK_SEQUENCES,
    "interval_join": O_INTERVAL_JOIN,
    "window_running_sum": O_WINDOW_RUNNING_SUM,
    "rollup_orders": O_ROLLUP_ORDERS,
    "cube_lineitem": O_CUBE_LINEITEM,
    "semi_anti_join": O_SEMI_ANTI_JOIN,
    "events_json": O_EVENTS_JSON,
    "events_daily": O_EVENTS_DAILY,
    "sessionize": O_SESSIONIZE,
    "lang_id": O_LANG_ID,
    "text_stats": O_TEXT_STATS,
    "quality_repetition": O_QUALITY_REPETITION,
    "mixture_sample": O_MIXTURE_SAMPLE,
    "corpus_clean": O_CORPUS_CLEAN,
    "dedup_exact": O_DEDUP_EXACT,
    "dedup_fingerprint": O_DEDUP_FINGERPRINT,
    "dedup_jaccard": O_DEDUP_JACCARD,
    "dedup_minhash": O_DEDUP_MINHASH,
    "simhash": O_SIMHASH,
    "similarity_topk": O_SIMILARITY_TOPK,
    "embedding_near_dup": O_EMBEDDING_NEAR_DUP,
    "multimodal_decode": O_MULTIMODAL_DECODE,
    "streaming_window": O_STREAMING_WINDOW,
    "streaming_dedup": O_STREAMING_DEDUP,
    "streaming_degree": O_STREAMING_DEGREE,
    "streaming_join": O_STREAMING_JOIN,
    "minhash_lsh_pairs": O_MINHASH_LSH_PAIRS,
    "dedup_clusters": O_DEDUP_CLUSTERS,
    "contamination": O_CONTAMINATION,
    "ann_lsh": O_ANN_LSH,
    "ann_ivf": O_ANN_IVF,
    "embedding_clusters": O_EMBEDDING_CLUSTERS,
    "hits": O_HITS,
    "scc": O_SCC,
    "global_clustering": O_GLOBAL_CLUSTERING,
    "random_walks": O_RANDOM_WALKS,
    "closeness": O_CLOSENESS,
    "distance_report": O_DISTANCE_REPORT,
    "pii_redact": O_PII_REDACT,
    "communities": O_COMMUNITIES,
    "assortativity": O_ASSORTATIVITY,
    "doc_logprob": O_DOC_LOGPROB,
    "katz": O_KATZ,
    "link_pred": O_LINK_PRED,
    "temporal_reach": O_TEMPORAL_REACH,
    "temporal_reach_index": O_TEMPORAL_REACH_INDEX,
    "nbr_features": O_NBR_FEATURES,
    "ego_net": O_EGO_NET,
    "funnel": O_FUNNEL,
    "cohort_retention": O_COHORT_RETENTION,
    "session_paths": O_SESSION_PATHS,
    "cheapest_path_vertices": O_CHEAPEST_PATH_VERTICES,
    "match_cheapest": O_MATCH_CHEAPEST,
    "group_sample": O_GROUP_SAMPLE,
    "eccentricity": O_ECCENTRICITY,
    "path_counts": O_PATH_COUNTS,
    "betweenness": O_BETWEENNESS,
    "harmonic": O_HARMONIC,
    "k_truss": O_K_TRUSS,
    "csr_edges": O_CSR_EDGES,
    "csr_offsets": O_CSR_OFFSETS,
    "pipeline_corpus": O_PIPELINE_CORPUS,
    "graph_report": O_GRAPH_REPORT,
    "centrality_report": O_CENTRALITY_REPORT,
    "dedup_edit": O_DEDUP_EDIT,
    "bm25": O_BM25,
    "resample_fill": O_RESAMPLE_FILL,
    "pivot_events": O_PIVOT_EVENTS,
    "group_quantiles": O_GROUP_QUANTILES,
    "hybrid_retrieval": O_HYBRID_RETRIEVAL,
    "node2vec": O_NODE2VEC,
    "rolling_7d": O_ROLLING_7D,
    "grouping_sets": O_GROUPING_SETS,
    "weighted_sample": O_WEIGHTED_SAMPLE,
    "winsorize": O_WINSORIZE,
    "attribution": O_ATTRIBUTION,
    "anomaly_zscore": O_ANOMALY_ZSCORE,
    "copurchase_pmi": O_COPURCHASE_PMI,
    "event_transitions": O_EVENT_TRANSITIONS,
    "eigenvector": O_EIGENVECTOR,
    "modularity": O_MODULARITY,
    "communities_refined": O_COMMUNITIES_REFINED,
    "community_graph": O_COMMUNITY_GRAPH,
    "conductance": O_CONDUCTANCE,
    "pipeline_v3": O_PIPELINE_V3,
    "streaming_anomaly": O_STREAMING_ANOMALY,
    "percolation": O_PERCOLATION,
    "profile_docs": O_PROFILE_DOCS,
    "materialize_packs": O_MATERIALIZE_PACKS,
    "dataset_split": O_DATASET_SPLIT,
    "temporal_latest": O_TEMPORAL_LATEST,
    "nbr_features_l2": O_NBR_FEATURES_L2,
    "split_entropy": O_SPLIT_ENTROPY,
    "degree_powerlaw": O_DEGREE_POWERLAW,
    "avg_path_length": O_AVG_PATH_LENGTH,
    "burstiness": O_BURSTINESS,
}


# --------------------------------------------------------------------------
# driver-window ordering (round 6)
# --------------------------------------------------------------------------
# The driver's CORRECTNESS gate verifies only the first 50 ``queries()``
# entries in insertion order.  Round 5's window covered the 42 operators
# added in rounds 3-4 plus 8 sentinels (48/50 green; the 2 failures were
# array-column canonicalization, fixed by serializing paths to strings).
# Rotate for round 6: lead with the two fixed queries so their repair is
# driver-recorded, then the 46 keys OUTSIDE round 5's window (last
# driver-verified in round 4, on older code), then two heavy sentinels
# from the round-5-green set.  All 96 keys remain present in queries();
# only the order changes round to round, so across consecutive rounds
# every operator keeps a recent driver-recorded correctness row.

# corpus curation v2 (round 7) — registered after the round-7 window so
# they don't displace never-yet-verified keys; pre-verified via
# tools/check_oracle.py and rotated into the driver window next round
QUERIES.update({
    "cross_corpus_dedup": q_cross_corpus_dedup,
    "stream_near_dup": q_stream_near_dup,
    "dedup_paragraphs": q_dedup_paragraphs,
    "dedup_keep_longest": q_dedup_keep_longest,
    "importance_resample": q_importance_resample,
    "text_normalize": q_text_normalize,
    "semantic_dedup": q_semantic_dedup,
    "temperature_sample": q_temperature_sample,
    "bigram_logprob": q_bigram_logprob,
    "ann_ivfpq": q_ann_ivfpq,
    "containment_dedup": q_containment_dedup,
    "curriculum": q_curriculum,
    "random_projection": q_random_projection,
    "quantize_int8": q_quantize_int8,
    "substring_dedup": q_substring_dedup,
    "ref_bigram_logprob": q_ref_bigram_logprob,
    "pipeline_curation": q_pipeline_curation,
    "apply_vocab": q_apply_vocab,
    "vocab_drift": q_vocab_drift,
    "ann_recall": q_ann_recall,
})
ORACLES.update({
    "cross_corpus_dedup": O_CROSS_CORPUS_DEDUP,
    "stream_near_dup": O_STREAM_NEAR_DUP,
    "dedup_paragraphs": O_DEDUP_PARAGRAPHS,
    "dedup_keep_longest": O_DEDUP_KEEP_LONGEST,
    "importance_resample": O_IMPORTANCE_RESAMPLE,
    "text_normalize": O_TEXT_NORMALIZE,
    "semantic_dedup": O_SEMANTIC_DEDUP,
    "temperature_sample": O_TEMPERATURE_SAMPLE,
    "bigram_logprob": O_BIGRAM_LOGPROB,
    "ann_ivfpq": O_ANN_IVFPQ,
    "containment_dedup": O_CONTAINMENT_DEDUP,
    "curriculum": O_CURRICULUM,
    "random_projection": O_RANDOM_PROJECTION,
    "quantize_int8": O_QUANTIZE_INT8,
    "substring_dedup": O_SUBSTRING_DEDUP,
    "ref_bigram_logprob": O_REF_BIGRAM_LOGPROB,
    "pipeline_curation": O_PIPELINE_CURATION,
    "apply_vocab": O_APPLY_VOCAB,
    "vocab_drift": O_VOCAB_DRIFT,
    "ann_recall": O_ANN_RECALL,
})

# round 9 additions
QUERIES.update({
    "var_length_hetero": q_var_length_hetero,
    "ann_ivf_index": q_ann_ivf_index,
    "ann_ivfpq_index": q_ann_ivfpq_index,
})
ORACLES.update({
    "var_length_hetero": O_VAR_LENGTH_HETERO,
    "ann_ivf_index": O_ANN_IVF_INDEX,
    # identical semantics to the in-memory PQ route — shared oracle
    "ann_ivfpq_index": O_ANN_IVFPQ,
})


# Round 7 rotation: mixture_sample (added late in round 6, never
# driver-verified — and its zero-token-group NULL threshold was fixed this
# round, so the fix must be driver-recorded) leads; then the 47 keys whose
# last driver row is round 5 (everything round 6's window displaced); then
# 2 sentinels from the round-6-green set.  All 98 keys stay registered —
# only insertion order changes.
_R7_FRONT = [
    # the queries that have never appeared in a driver CORRECTNESS
    # window (every round-7 addition): they lead so CORRECTNESS_r07
    # records their first hard rows
    "dedup_edit", "bm25", "resample_fill", "pivot_events",
    "group_quantiles", "hybrid_retrieval", "node2vec",
    "rolling_7d", "grouping_sets", "weighted_sample",
    "winsorize", "attribution", "anomaly_zscore",
    "copurchase_pmi", "event_transitions", "eigenvector",
    "modularity", "pipeline_v3", "streaming_anomaly",
    "percolation", "profile_docs", "materialize_packs",
    "dataset_split", "temporal_latest", "nbr_features_l2",
    "split_entropy", "degree_powerlaw", "avg_path_length",
    "burstiness",
    "mixture_sample", "cross_corpus_dedup", "stream_near_dup",
    "dedup_paragraphs", "dedup_keep_longest", "importance_resample",
    "text_normalize", "semantic_dedup", "temperature_sample",
    "bigram_logprob",
    "ann_ivfpq", "containment_dedup", "curriculum",
    "random_projection", "quantize_int8", "substring_dedup",
    "ref_bigram_logprob", "pipeline_curation", "apply_vocab",
    "vocab_drift", "ann_recall",
    # 31 keys last driver-verified in round 5 (the 16 dropped to make
    # room — lang_id, text_stats, pii_redact, dedup_exact,
    # dedup_fingerprint, simhash, contamination, random_walks,
    # assortativity, similarity_topk, embedding_clusters, doc_logprob,
    # funnel, cohort_retention, session_paths, group_sample — are the
    # simplest deterministic ops of that set, all r5-green and re-gated
    # locally every round)
    "match_2hop", "var_length_1_2", "shortest_len", "cheapest_path",
    "pagerank", "wcc", "streaming_window",
    "corpus_clean", "dedup_jaccard",
    "dedup_minhash", "minhash_lsh_pairs", "dedup_clusters",
    "embedding_near_dup", "ann_lsh",
    "ann_ivf", "multimodal_decode", "hits", "scc",
    "global_clustering", "closeness",
    "communities",
    "eccentricity", "path_counts",
    "betweenness", "harmonic", "k_truss", "pipeline_corpus",
    # 2 sentinels from the round-6-green window
    "graph_report", "quality_repetition",
]

_R6_FRONT = [
    # the 2 repaired queries (failed r5 on array hashing, now string paths)
    "cheapest_path_vertices", "match_cheapest",
    # 46 keys outside round 5's window, families interleaved as authored
    "match_1hop", "match_undirected", "match_reverse", "match_bidirected",
    "match_triangle", "match_inheritance", "match_composite_key",
    "shortest_composite", "shortest_string", "reachability",
    "shortest_path_vertices", "topk_paths", "personalized_pagerank",
    "neighbor_sample", "k_core", "sampled_neighborhood",
    "weighted_pagerank", "lcc", "summarize", "create_vertex_table",
    "tpch_q1", "topk_per_group", "asof_join", "acyclic_paths",
    "all_shortest_paths", "trail_paths", "chunk_docs", "det_sample",
    "stratified_sample", "vocab_stats", "tfidf", "pack_sequences",
    "interval_join", "window_running_sum", "rollup_orders",
    "cube_lineitem", "semi_anti_join", "streaming_dedup",
    "streaming_degree", "streaming_join", "events_json", "events_daily",
    "sessionize", "csr_edges", "csr_offsets", "graph_report",
    # round-6 addition (needs its first driver-recorded row) + one
    # sentinel from the round-5-green heavy set
    "quality_repetition", "temporal_reach",
]

# Round 8 rotation: queries CHANGED this round lead (centrality_report
# is new; containment_dedup moved to trigram shingles; avg_path_length
# and percolation raised their oracle recursion guard; modularity and
# communities sit on the re-cadenced LPA kernel), then every key whose
# newest driver CORRECTNESS row is round 5 — exactly the staleness set
# VERDICT r7 item 6 names.  All keys stay registered; only insertion
# order changes.
_R8_FRONT = [
    # changed or added this round — their r08 rows record the change
    "centrality_report", "distance_report", "containment_dedup", "avg_path_length",
    "percolation", "modularity", "communities_refined",
    "community_graph", "conductance",
    # the 47 keys last driver-verified in round 5 (r06/r07 windows
    # displaced them); heavy graph core first, simple deterministic
    # ops last so a window cut below 52 drops the cheapest-to-lose
    "match_2hop", "var_length_1_2", "shortest_len", "cheapest_path",
    "pagerank", "wcc", "communities", "hits", "katz", "betweenness",
    "path_counts", "k_truss", "scc", "closeness", "harmonic",
    "eccentricity", "global_clustering", "assortativity",
    "link_pred", "nbr_features", "ego_net", "random_walks",
    "streaming_window", "pipeline_corpus", "corpus_clean",
    "dedup_jaccard", "dedup_minhash", "minhash_lsh_pairs",
    "dedup_clusters", "dedup_exact", "dedup_fingerprint", "simhash",
    "contamination", "embedding_near_dup", "ann_lsh", "ann_ivf",
    "similarity_topk", "embedding_clusters", "multimodal_decode",
    "lang_id", "text_stats", "pii_redact", "doc_logprob", "funnel",
    "cohort_retention", "session_paths", "group_sample",
]

QUERIES = {
    **{k: QUERIES[k] for k in _R8_FRONT},
    **{k: v for k, v in QUERIES.items() if k not in set(_R8_FRONT)},
}
ORACLES = {
    **{k: ORACLES[k] for k in _R8_FRONT if k in ORACLES},
    **{k: v for k, v in ORACLES.items() if k not in set(_R8_FRONT)},
}

# Round 9 rotation (window = first ~50 keys).  Leads: the two queries
# added this round (never driver-verified), the three whose oracle
# recursion guard changed (d<30 -> d<60), the three whose kernels
# changed this round (keep-longest rewrite; shared-adjacency routing),
# then the six keys whose newest driver row is still r05 (VERDICT r8
# item 2), then 36 of the 50 r06-stale keys — graph/match core first.
# The 14 r06 keys that don't fit (simple deterministic relational/
# streaming ops, all pytest-covered) are queued immediately after the
# window cut for round 10.  All 154 keys stay registered; only
# insertion order changes.
_R9_FRONT = [
    # new this round
    "var_length_hetero", "ann_ivf_index", "ann_ivfpq_index",
    # oracle guard raised this round (re-record under the new SQL)
    "closeness", "harmonic", "eccentricity",
    # kernels touched this round (hashes proven unchanged locally;
    # driver row records it) — hits/eigenvector moved to deferred L1
    # normalization with the oracle updated in lockstep, and
    # centrality_report composes both
    "dedup_keep_longest", "path_counts", "betweenness",
    "hits", "eigenvector", "centrality_report",
    # newest row still r05
    "pii_redact", "doc_logprob", "funnel", "cohort_retention",
    "session_paths", "group_sample",
    # r06-stale graph/match core
    "match_1hop", "match_undirected", "match_reverse", "match_bidirected",
    "match_triangle", "match_inheritance", "match_composite_key",
    "shortest_composite", "shortest_string", "reachability",
    "shortest_path_vertices", "topk_paths", "acyclic_paths",
    "all_shortest_paths", "trail_paths", "cheapest_path_vertices",
    "match_cheapest", "personalized_pagerank", "weighted_pagerank",
    "lcc", "k_core", "neighbor_sample", "sampled_neighborhood",
    "temporal_reach", "csr_edges", "csr_offsets", "graph_report",
    "summarize", "create_vertex_table",
    # r06-stale relational core
    "tpch_q1", "topk_per_group", "asof_join", "interval_join",
    "window_running_sum", "rollup_orders", "cube_lineitem",
    # --- expected window cut (~50) ---
    # remaining r06-stale simple ops, first in line for round 10
    "semi_anti_join", "streaming_dedup", "streaming_degree",
    "streaming_join", "events_json", "events_daily", "sessionize",
    "quality_repetition", "chunk_docs", "det_sample",
    "stratified_sample", "vocab_stats", "tfidf", "pack_sequences",
]

QUERIES = {
    **{k: QUERIES[k] for k in _R9_FRONT},
    **{k: v for k, v in QUERIES.items() if k not in set(_R9_FRONT)},
}
ORACLES = {
    **{k: ORACLES[k] for k in _R9_FRONT if k in ORACLES},
    **{k: v for k, v in ORACLES.items() if k not in set(_R9_FRONT)},
}

# Round 10 rotation (window = first ~50 keys).  Leads: every key whose
# kernel or plan-construction path changed this round (temporal fixpoint
# hops=4 default, dedup_paragraphs no-text-shuffle rewrite, sparse
# hits/eigenvector, betweenness sigma-fold, keep-longest min_by, the
# ANN-family array-literal rework) so the driver re-records them under
# the new code; then ALL 18 keys whose newest CORRECTNESS row is r06
# (VERDICT r9 item 3 — after this window no key is older than r07);
# then 13 of the 44 r07-stale keys (heaviest first).  The remaining
# r07 keys queue immediately after the cut for round 11.  All keys stay
# registered; only insertion order changes.
_R10_FRONT = [
    # kernels/plan construction changed this round
    "temporal_reach", "temporal_latest", "dedup_paragraphs",
    "dedup_keep_longest", "eigenvector", "hits", "centrality_report",
    "betweenness", "path_counts",
    "ann_ivf", "ann_ivf_index", "ann_ivfpq", "ann_ivfpq_index",
    "ann_lsh", "ann_recall", "semantic_dedup", "embedding_near_dup",
    "random_projection", "embedding_clusters",
    # the full r06-stale set
    "chunk_docs", "cube_lineitem", "det_sample", "events_daily",
    "events_json", "interval_join", "pack_sequences",
    "quality_repetition", "rollup_orders", "semi_anti_join",
    "sessionize", "stratified_sample", "streaming_dedup",
    "streaming_degree", "streaming_join", "tfidf", "vocab_stats",
    "window_running_sum",
    # oldest (r07) keys, heaviest first
    "hybrid_retrieval", "dedup_edit", "substring_dedup",
    "cross_corpus_dedup", "materialize_packs", "pipeline_v3",
    "pipeline_curation", "bm25", "node2vec", "anomaly_zscore",
    "stream_near_dup", "streaming_anomaly", "winsorize",
    # --- expected window cut (~50) ---
    # remaining r07-stale keys, first in line for round 11
    "group_quantiles", "grouping_sets", "apply_vocab", "attribution",
    "bigram_logprob", "ref_bigram_logprob", "burstiness",
    "copurchase_pmi", "curriculum", "dataset_split", "degree_powerlaw",
    "event_transitions", "importance_resample", "mixture_sample",
    "nbr_features_l2", "pivot_events", "profile_docs", "quantize_int8",
    "resample_fill", "rolling_7d", "split_entropy",
    "temperature_sample", "text_normalize", "vocab_drift",
    "weighted_sample",
]

QUERIES = {
    **{k: QUERIES[k] for k in _R10_FRONT},
    **{k: v for k, v in QUERIES.items() if k not in set(_R10_FRONT)},
}
ORACLES = {
    **{k: ORACLES[k] for k in _R10_FRONT if k in ORACLES},
    **{k: v for k, v in ORACLES.items() if k not in set(_R10_FRONT)},
}

# Round 11 rotation (window = first ~50 keys).  Leads: the one query
# added this round (temporal_reach_index, the gated standing-index
# route — never driver-verified), then every key whose kernel or
# plan-construction path changed this round (temporal standing index,
# Bellman-Ford union-merge, betweenness estimator default, the
# SQL-rendered centrality/WCC loop bodies + pagerank dangling probe)
# so the driver re-records them under the new code; then the full
# 25-key r07-stale set queued at _R10_FRONT's cut (VERDICT r10 item
# 10); then 5 of the oldest (r08) keys.  All keys stay registered;
# only insertion order changes.
_R11_FRONT = [
    # new this round
    "temporal_reach_index",
    # kernels/plan construction changed this round
    "temporal_reach", "temporal_latest",
    "cheapest_path", "cheapest_path_vertices", "match_cheapest",
    "betweenness", "path_counts",
    "pagerank", "personalized_pagerank", "weighted_pagerank",
    "hits", "eigenvector", "katz", "centrality_report",
    "graph_report", "wcc", "dedup_clusters", "semantic_dedup",
    "communities", "communities_refined", "community_graph",
    # the full r07-stale set queued last round
    "group_quantiles", "grouping_sets", "apply_vocab", "attribution",
    "bigram_logprob", "ref_bigram_logprob", "burstiness",
    "copurchase_pmi", "curriculum", "dataset_split", "degree_powerlaw",
    "event_transitions", "importance_resample", "mixture_sample",
    "nbr_features_l2", "pivot_events", "profile_docs", "quantize_int8",
    "resample_fill", "rolling_7d", "split_entropy",
    "temperature_sample", "text_normalize", "vocab_drift",
    "weighted_sample",
    # oldest remaining (r08) keys (modularity/conductance are also
    # LPA-derived, so their r11 rows record the changed kernel)
    "distance_report", "modularity", "conductance",
    # --- expected window cut (~50) ---
    # remaining r08 keys, first in line for round 12
    "avg_path_length", "percolation", "containment_dedup",
]

QUERIES = {
    **{k: QUERIES[k] for k in _R11_FRONT},
    **{k: v for k, v in QUERIES.items() if k not in set(_R11_FRONT)},
}
ORACLES = {
    **{k: ORACLES[k] for k in _R11_FRONT if k in ORACLES},
    **{k: v for k, v in ORACLES.items() if k not in set(_R11_FRONT)},
}
