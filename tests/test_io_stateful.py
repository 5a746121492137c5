import pytest
from pyspark.sql import functions as F

from duckpgq_extension_spark.sources import io
from duckpgq_extension_spark.sources.tables import load_table
from duckpgq_extension_spark.streaming import events as ev

SF = "/root/testdata/sf0.001"


def test_io_roundtrip_formats(spark, tmp_path):
    df = spark.read.parquet(f"{SF}/nation.parquet")
    schema = df.schema.simpleString().replace("struct<", "").rstrip(">").replace(":", " ")
    for fmt in ("parquet", "orc", "csv", "json"):
        p = str(tmp_path / fmt)
        io.write(df, p, fmt=fmt)
        back = io.read(
            spark, p, fmt=fmt, schema=None if fmt in ("parquet", "orc") else schema
        )
        assert back.count() == df.count(), fmt
    with pytest.raises(ValueError):
        io.read(spark, "/nope", fmt="avro")
    with pytest.raises(ValueError):
        io.read(spark, "/nope", fmt="csv")  # schema required
    with pytest.raises(NotImplementedError):
        io.read_delta(spark, "/nope")


def test_partitioned_write_prunes(spark, tmp_path):
    df = load_table(spark, SF, "events")
    out = str(tmp_path / "part")
    io.write(df, out, fmt="parquet", partition_by=["event_type"])
    back = io.read(spark, out).where(F.col("event_type") == "click")
    # partition pruning: only the click directory is scanned
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == df.where("event_type = 'click'").count()


def test_stateful_streaming_running_totals(spark, tmp_path):
    src = str(tmp_path / "stateful_src")
    events = load_table(spark, SF, "events").limit(300)
    events.write.parquet(src)
    stream = ev.stream_from_parquet(spark, src)
    q = ev.run_stream_to_memory(
        ev.running_user_totals_stream(stream), "stateful_out", output_mode="update"
    )
    try:
        got = {r["user_id"]: r for r in spark.table("stateful_out").collect()}
        batch = (
            spark.read.parquet(src)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        )
        for r in batch.collect():
            assert got[r["user_id"]]["n_events"] == r["n"]
            assert got[r["user_id"]]["total_value"] == pytest.approx(r["v"])
    finally:
        q.stop()


def test_write_bucketed_edges_no_edge_side_shuffle(spark):
    """Bucketed adjacency joins against a key-partitioned frontier without
    an Exchange on the edge side (the 100 TB BFS layout)."""
    from pyspark.sql import functions as F

    from duckpgq_extension_spark.sources import io as pgio

    edges = spark.range(1000).select(
        (F.col("id") % 100).alias("src"), ((F.col("id") * 7) % 100).alias("dst")
    )
    pgio.write_bucketed_edges(edges, "bkt_edges", buckets=4)
    try:
        back = spark.table("bkt_edges")
        assert back.count() == 1000
        frontier = spark.range(50).select(F.col("id").alias("dst"))
        plan = (
            frontier.repartition(4, "dst")
            .hint("merge")  # forbid broadcast so the layout is observable
            .join(back, frontier["dst"] == back["src"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # edge side must carry NO Exchange: the bucketed scan satisfies the
        # join's HashPartitioning requirement, so the only shuffle in the
        # whole plan is the frontier's own repartition
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_edges")


def test_bfs_trusts_prepartitioned_edges(spark):
    """num_partitions=0 skips the adjacency repartition for inputs already
    laid out by src (bucketed tables); results are identical."""
    from pyspark.sql import functions as F

    from duckpgq_extension_spark.operators import paths as pathops

    edges = spark.range(200).select(
        (F.col("id") % 40).alias("src"), ((F.col("id") * 3 + 1) % 40).alias("dst")
    )
    srcs = spark.range(3).select(F.col("id").alias("src"))
    base = {(r["src"], r["dst"], r["dist"]) for r in
            pathops.bfs_distances(edges, sources=srcs).collect()}
    trusted = {(r["src"], r["dst"], r["dist"]) for r in
               pathops.bfs_distances(edges.repartition(4, "src"), sources=srcs,
                                     num_partitions=0).collect()}
    assert base == trusted and base

def test_stateful_streaming_running_totals_v2(spark, tmp_path):
    """transformWithStateInPandas variant: same totals as the
    applyInPandasWithState operator and as a batch aggregation.  The v2
    state protocol needs google.protobuf; without it the operator must
    raise the documented gate error instead of crashing the stream."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        from duckpgq_extension_spark.errors import PGQNotImplementedError

        with pytest.raises(PGQNotImplementedError, match="protobuf"):
            ev.running_user_totals_stream_v2(
                ev.stream_from_parquet(spark, str(tmp_path))
            )
        return
    src = str(tmp_path / "stateful_v2_src")
    events = load_table(spark, SF, "events").limit(300)
    events.write.parquet(src)
    stream = ev.stream_from_parquet(spark, src)
    q = ev.run_stream_to_memory(
        ev.running_user_totals_stream_v2(stream), "stateful_v2_out",
        output_mode="update",
    )
    try:
        got = {r["user_id"]: r for r in spark.table("stateful_v2_out").collect()}
        batch = (
            spark.read.parquet(src)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        )
        for r in batch.collect():
            assert got[r["user_id"]]["n_events"] == r["n"]
            assert got[r["user_id"]]["total_value"] == pytest.approx(r["v"])
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    """join_streams_interval on a real two-stream pipeline equals the
    batch interval join on the same data (bounded source, one state
    epoch), and the same builder runs unchanged on batch frames."""
    src = str(tmp_path / "sjoin_src")
    events = load_table(spark, SF, "events").limit(600)
    events.write.parquet(src)
    views_s = ev.stream_from_parquet(spark, src).where("event_type = 'view'")
    buys_s = ev.stream_from_parquet(spark, src).where("event_type = 'purchase'")
    q = ev.run_stream_to_memory(
        ev.join_streams_interval(views_s, buys_s, bound="30 minutes"),
        "sjoin_out",
    )
    q.stop()
    got = {
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in spark.table("sjoin_out").collect()
    }
    views_b = events.where("event_type = 'view'")
    buys_b = events.where("event_type = 'purchase'")
    want = {
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in ev.join_streams_interval(views_b, buys_b, bound="30 minutes").collect()
    }
    assert got == want and len(want) > 0


def test_graph_export_import_roundtrip(spark, tmp_path):
    """Export a graph (parquet tables + graph.json), import it under a new
    name in a fresh session, and get identical MATCH results — the
    Spark-idiomatic analog of DuckDB's `import database` + CREATE
    PROPERTY GRAPH bootstrap (snb.test:9-53) and attach_pg resolution."""
    from pyspark.sql import Row
    from duckpgq_extension_spark import PGQSession
    from duckpgq_extension_spark.errors import PGQBinderError
    from duckpgq_extension_spark.sources.graph_io import (
        export_property_graph,
        import_property_graph,
    )

    spark.createDataFrame(
        [Row(id=i, name=f"v{i}") for i in range(5)], "id long, name string"
    ).createOrReplaceTempView("gio_v")
    spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=1, dst=2), Row(src=2, dst=0), Row(src=3, dst=4)],
        "src long, dst long",
    ).createOrReplaceTempView("gio_e")
    s = PGQSession(spark)
    s.execute("DROP PROPERTY GRAPH IF EXISTS gio")
    s.execute(
        """CREATE PROPERTY GRAPH gio
           VERTEX TABLES (gio_v LABEL V)
           EDGE TABLES (gio_e SOURCE KEY (src) REFERENCES gio_v (id)
                        DESTINATION KEY (dst) REFERENCES gio_v (id) LABEL E)"""
    )
    q = ("SELECT * FROM GRAPH_TABLE ({g} MATCH (a:V)-[e:E]->(b:V) "
         "COLUMNS (a.id AS aid, b.id AS bid)) t")
    want = sorted(map(tuple, s.sql(q.format(g="gio")).collect()))

    out = str(tmp_path / "gio_export")
    meta = export_property_graph(s, "gio", out)
    assert set(meta["table_dirs"]) == {"gio_v", "gio_e"}

    # fresh session; drop the views to prove import re-registers them
    s2 = PGQSession(spark)
    spark.catalog.dropTempView("gio_v")
    spark.catalog.dropTempView("gio_e")
    import_property_graph(s2, out, name="gio2")
    got = sorted(map(tuple, s2.sql(q.format(g="gio2")).collect()))
    assert got == want

    # missing path and double-create both fail loudly
    with pytest.raises(PGQBinderError, match="graph.json"):
        import_property_graph(s2, str(tmp_path / "nope"))
    with pytest.raises(PGQBinderError, match="already exists"):
        import_property_graph(s2, out, name="gio2")
    import_property_graph(s2, out, name="gio2", or_replace=True)


def test_graph_import_rejects_flattened_name_collision(spark, tmp_path):
    """Two qualified tables sharing a final identifier would silently
    shadow each other as temp views — import must refuse."""
    import json
    from duckpgq_extension_spark import PGQSession
    from duckpgq_extension_spark.errors import PGQBinderError
    from duckpgq_extension_spark.sources.graph_io import import_property_graph

    d = tmp_path / "collide"
    d.mkdir()
    meta = {
        "format_version": 1,
        "name": "g",
        "vertex_tables": [],
        "edge_tables": [],
        "table_dirs": {"cat1.db.t": "tables/t1", "cat2.db.t": "tables/t2"},
    }
    (d / "graph.json").write_text(json.dumps(meta))
    with pytest.raises(PGQBinderError, match="flatten"):
        import_property_graph(PGQSession(spark), str(d))


def test_near_dup_stream_matches_batch(spark, tmp_path):
    """near_dup_stream on a REAL readStream emits exactly the batch
    survivors: stateless in-row signatures + chained stream-static anti
    joins, no watermark, append mode."""
    from duckpgq_extension_spark.operators.dedup import cross_corpus_dedup
    from duckpgq_extension_spark.streaming import events as ev

    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, "unique fresh content here"),
         (12, "alpha beta gamma delta epsilon"), (13, "solo"),
         (14, "another brand new document entirely")],
        "doc_id long, text string")
    ref = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "other old page")],
        "doc_id long, text string")
    src = str(tmp_path / "docs")
    new.write.parquet(src)
    idx = ev.band_index(ref, "doc_id", "text").persist()
    try:
        stream = ev.stream_from_parquet(spark, src, "doc_id long, text string")
        out = ev.near_dup_stream(stream, idx, "doc_id", "text")
        assert out.isStreaming
        q = ev.run_stream_to_memory(out, "near_dup_stream_t")
        try:
            got = sorted(
                r.doc_id
                for r in spark.sql("SELECT doc_id FROM near_dup_stream_t").collect()
            )
        finally:
            q.stop()
        want = sorted(
            r.doc_id
            for r in cross_corpus_dedup(new, ref, "doc_id", "text", mode="near").collect()
        )
        assert got == want and 11 in got and 10 not in got
    finally:
        idx.unpersist()


def test_near_dup_stream_exact_streaming(spark, tmp_path):
    from duckpgq_extension_spark.streaming import events as ev

    new = spark.createDataFrame(
        [(10, "same old text"), (11, "fresh text")], "doc_id long, text string")
    ref = spark.createDataFrame([(1, "same old text")], "doc_id long, text string")
    src = str(tmp_path / "docs2")
    new.write.parquet(src)
    idx = ev.content_hash_index(ref, "text")
    stream = ev.stream_from_parquet(spark, src, "doc_id long, text string")
    q = ev.run_stream_to_memory(
        ev.near_dup_stream(stream, idx, "doc_id", "text", mode="exact"),
        "near_dup_exact_t",
    )
    try:
        got = [r.doc_id for r in spark.sql("SELECT doc_id FROM near_dup_exact_t").collect()]
    finally:
        q.stop()
    assert got == [11]


def test_write_bucketed_corpus_shuffle_free_dedup(spark, tmp_path):
    """A content-hash-bucketed corpus table satisfies the exact-dedup
    aggregation's partitioning: the groupBy(content_hash) plan over the
    bucketed table has NO Exchange."""
    from duckpgq_extension_spark.sources.io import write_bucketed_corpus
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "dup text"), (2, "dup text"), (3, "unique text")],
        "doc_id long, text string")
    write_bucketed_corpus(docs, "bucketed_corpus_t", buckets=4)
    try:
        t = spark.table("bucketed_corpus_t")
        agg = t.groupBy("content_hash").agg(
            F.min("doc_id").alias("keep_id"), F.count("*").alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = {(r.keep_id, r.n) for r in agg.collect()}
        assert got == {(1, 2), (3, 1)}
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_corpus_t")
