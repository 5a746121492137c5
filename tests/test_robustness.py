"""Randomized cross-checks + schema-evolution behavior."""

import numpy as np
import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQSession
from duckpgq_extension_spark.operators import paths as pathops


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_bfs_matches_floyd_warshall(spark, seed):
    """Batched BFS distances equal a numpy Floyd-Warshall oracle on random
    directed graphs (deterministic seeds)."""
    rng = np.random.default_rng(seed)
    n = 25
    density = 0.12
    adj = rng.random((n, n)) < density
    np.fill_diagonal(adj, False)
    edges = [(int(i), int(j)) for i in range(n) for j in range(n) if adj[i, j]]
    if not edges:
        pytest.skip("empty random graph")
    edf = spark.createDataFrame(edges, "src long, dst long")
    dist = pathops.bfs_distances(edf)
    got = {(r["src"], r["dst"]): r["dist"] for r in dist.collect()}

    INF = 10**9
    d = np.full((n, n), INF)
    np.fill_diagonal(d, 0)
    for i, j in edges:
        d[i, j] = 1
    for k in range(n):
        d = np.minimum(d, d[:, k][:, None] + d[k, :][None, :])
    # BFS only reports vertices that appear in the edge list as sources
    vs = {v for e in edges for v in e}
    for i in vs:
        for j in range(n):
            expect = None if d[i, j] >= INF else int(d[i, j])
            assert got.get((i, j)) == expect, (seed, i, j)


@pytest.mark.parametrize("seed", [5, 42])
def test_cheapest_matches_numpy(spark, seed):
    rng = np.random.default_rng(seed)
    n = 15
    adj = rng.random((n, n)) < 0.2
    np.fill_diagonal(adj, False)
    w = rng.integers(1, 9, (n, n)).astype(float)
    edges = [(int(i), int(j), float(w[i, j])) for i in range(n) for j in range(n) if adj[i, j]]
    if not edges:
        pytest.skip("empty random graph")
    edf = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = {
        (r["src"], r["dst"]): r["cost"]
        for r in pathops.cheapest_path_distances(edf).collect()
    }
    INF = 1e18
    d = np.full((n, n), INF)
    np.fill_diagonal(d, 0.0)
    for i, j, ww in edges:
        d[i, j] = min(d[i, j], ww)
    for k in range(n):
        d = np.minimum(d, d[:, k][:, None] + d[k, :][None, :])
    vs = {v for i, j, _ in edges for v in (i, j)}
    for i in vs:
        for j in range(n):
            if d[i, j] < INF:
                assert got.get((i, j)) == pytest.approx(d[i, j]), (seed, i, j)
            else:
                assert (i, j) not in got


def test_match_plan_has_no_cartesian_product(pgq):
    """Plan-shape guard: connected patterns must compile to equi-joins
    (hash/merge), never CartesianProduct/BroadcastNestedLoop — the property
    that makes the compiler viable at cluster scale (SURVEY §4)."""
    df = pgq.graph_table(
        """pg MATCH (a:Person)-[k:Knows]->(b:Person)-[k2:Knows]->(c:Person)
           WHERE a.id = 0 COLUMNS (a.name AS an, c.name AS cn)"""
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_match_filter_pushdown(pgq, spark):
    """Vertex predicates must reach the scan (PushedFilters), not sit above
    the joins."""
    import os

    path = "/tmp/pgq_pushdown_test"
    spark.table("Student").write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("student_pq")
    from duckpgq_extension_spark import PGQSession

    s = PGQSession(spark)
    s.execute(
        """CREATE OR REPLACE PROPERTY GRAPH push_pg
           VERTEX TABLES ( student_pq LABEL P )"""
    )
    df = s.graph_table("push_pg MATCH (a:P) WHERE a.id = 3 COLUMNS (a.name AS n)")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters")[1][:80]


def test_graph_over_replaced_view(spark):
    """altering_table.test analog: the graph reads the CURRENT state of its
    backing view (metadata holds names, not snapshots)."""
    spark.createDataFrame([Row(id=1, name="x")], "id long, name string").createOrReplaceTempView(
        "alt_v"
    )
    spark.createDataFrame([Row(a=1, b=1)], "a long, b long").createOrReplaceTempView("alt_e")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH altg
           VERTEX TABLES ( alt_v PROPERTIES ARE ALL COLUMNS LABEL V )
           EDGE TABLES ( alt_e SOURCE KEY (a) REFERENCES alt_v (id)
                         DESTINATION KEY (b) REFERENCES alt_v (id) LABEL E )"""
    )
    assert s.graph_table("altg MATCH (v:V) COLUMNS (v.name AS n)").count() == 1
    # replace the view with more rows; the graph sees them immediately
    spark.createDataFrame(
        [Row(id=1, name="x"), Row(id=2, name="y")], "id long, name string"
    ).createOrReplaceTempView("alt_v")
    assert s.graph_table("altg MATCH (v:V) COLUMNS (v.name AS n)").count() == 2


def test_text_pipeline_degenerate_documents(spark):
    """NULL text, empty text, whitespace-only, single token, unicode, and
    a repeated-token document flow through every text-pipeline operator
    without crashing, and basic invariants hold."""
    from pyspark.sql import functions as F
    from duckpgq_extension_spark.operators import corpus as C, dedup as D
    from duckpgq_extension_spark.functions import text as TX

    docs = spark.createDataFrame(
        [
            (0, None),
            (1, ""),
            (2, "   "),
            (3, "solo"),
            (4, "héllo wörld héllo wörld héllo"),
            (5, "a a a a a a a a"),
        ],
        "doc_id long, text string",
    )

    # scalar text functions evaluate for every row (None in -> None/0 out)
    stats = docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tok"),
        TX.lang_id(F.col("text")).alias("lang"),
        TX.quality_score(F.col("text")).alias("q"),
    ).collect()
    assert len(stats) == 6

    # chunking drops nothing it can't window; no exceptions
    C.chunk_documents(docs, "doc_id", "text", chunk_tokens=3, overlap=1).collect()

    # vocab stats ignore NULL-text rows, count unicode tokens
    vocab = {r["token"]: r["occurrences"]
             for r in C.vocab_stats(docs, "doc_id", "text").collect()}
    assert vocab.get("héllo") == 3 and vocab.get("a") == 8

    # tfidf and fingerprint/minhash/simhash paths survive the degenerates
    C.tfidf(docs, "doc_id", "text", top_n=2).collect()
    D.minhash_lsh_pairs(docs, "doc_id", "text", n=2, num_perm=16, bands=8).collect()
    D.simhash(docs, "doc_id", "text").collect()
    D.dedup_clusters(docs, "doc_id", "text", n=2, num_perm=16, bands=8).collect()

    # contamination against a degenerate benchmark
    bench = spark.createDataFrame([(9, None), (10, "a a a")], "doc_id long, text string")
    C.ngram_contamination(docs, bench, "doc_id", "text", n=2).collect()

    # exact dedup treats identical NULLs/empties consistently
    dups = D.exact_duplicates(
        docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 100)),
        "doc_id", "text",
    ).collect()
    assert all(r["n_copies"] == 2 for r in dups)
