import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from duckpgq_extension_spark.operators import multimodal, relational
from duckpgq_extension_spark.sources.tables import load_table
from duckpgq_extension_spark.streaming import events as ev

SF = "/root/testdata/sf0.001"


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_as_of_join(spark):
    trades = spark.createDataFrame(
        [
            Row(sym="A", t=ts("2024-01-01T10:00:05"), px=10.0),
            Row(sym="A", t=ts("2024-01-01T10:00:20"), px=11.0),
            Row(sym="B", t=ts("2024-01-01T10:00:10"), px=99.0),
        ]
    )
    quotes = spark.createDataFrame(
        [
            Row(sym="A", qt=ts("2024-01-01T10:00:00"), bid=9.5),
            Row(sym="A", qt=ts("2024-01-01T10:00:10"), bid=10.5),
            Row(sym="B", qt=ts("2024-01-01T10:00:30"), bid=98.0),  # after the trade
        ]
    )
    out = relational.as_of_join(trades, quotes, "sym", "t", "qt", ["bid"])
    got = {(r["sym"], r["t"]): r["bid_r"] for r in out.collect()}
    assert got[("A", ts("2024-01-01T10:00:05"))] == 9.5
    assert got[("A", ts("2024-01-01T10:00:20"))] == 10.5
    assert got[("B", ts("2024-01-01T10:00:10"))] is None  # no quote yet


def test_as_of_join_matches_duckdb(spark):
    """Oracle cross-check: same as-of semantics as DuckDB's native ASOF JOIN."""
    import duckdb

    events = load_table(spark, SF, "events").where(F.col("user_id") < 30)
    orders = spark.read.parquet(f"{SF}/orders.parquet").where(F.col("o_custkey") < 30)
    out = relational.as_of_join(
        events.withColumnRenamed("user_id", "k"),
        orders.withColumnRenamed("o_custkey", "k"),
        "k",
        "ts",
        "o_orderdate",
        ["o_orderkey", "o_totalprice"],
    )
    got = {
        (r["k"], r["event_id"]): (r["o_orderkey_r"], r["o_totalprice_r"])
        for r in out.collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet' WHERE user_id < 30"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet' WHERE o_custkey < 30"
    )
    oracle = con.execute(
        """
        SELECT e.user_id, e.event_id, o.o_orderkey, o.o_totalprice
        FROM events e ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """
    ).fetchall()
    exp = {(r[0], r[1]): (r[2], r[3]) for r in oracle}
    assert got == exp


def test_top_k_per_group(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    top = relational.top_k_per_group(
        li, ["l_returnflag"], "l_extendedprice", 3, tie_breaker="l_orderkey"
    )
    rows = top.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    for g, vals in by_g.items():
        assert len(vals) == 3


def test_tumbling_counts_batch(spark):
    events = load_table(spark, SF, "events")
    agg = ev.tumbling_counts(events, "1 day")
    total = agg.agg(F.sum("n_events")).first()[0]
    assert total == events.count()


def test_sessionize(spark):
    events = load_table(spark, SF, "events")
    s = ev.session_stats(events, gap_minutes=60)
    row = s.first()
    assert row["n_events"] >= 1
    # sessions are disjoint per user and ordered
    per_user = ev.sessionize(events, 60).where(F.col("user_id") == row["user_id"])
    sess = per_user.select("session_id").distinct().count()
    assert sess >= 1


def test_streaming_windowed_memory_sink(spark, tmp_path):
    # bounded file-source stream over the real events parquet
    src = str(tmp_path / "stream_src")
    load_table(spark, SF, "events").limit(200).write.parquet(src)
    stream = ev.stream_from_parquet(spark, src)
    assert stream.isStreaming
    q = ev.run_stream_to_memory(ev.windowed_stream(stream, "6 hours", "1 hour"), "win_out")
    try:
        batch = ev.tumbling_counts(spark.read.parquet(src), "6 hours")
        got = spark.sql("SELECT sum(n_events) FROM win_out").first()[0]
        # append mode only emits windows closed by the watermark; all rows
        # arrive in one batch so late windows may be withheld — check bounds
        assert got is None or got <= batch.agg(F.sum("n_events")).first()[0]
    finally:
        q.stop()


def test_streaming_session_window(spark, tmp_path):
    src = str(tmp_path / "stream_src2")
    load_table(spark, SF, "events").limit(100).write.parquet(src)
    stream = ev.stream_from_parquet(spark, src)
    q = ev.run_stream_to_memory(ev.sessionize_stream(stream, "30 minutes"), "sess_out")
    try:
        assert spark.table("sess_out").columns == [
            "session_start",
            "session_end",
            "user_id",
            "n_events",
            "sum_value",
        ]
    finally:
        q.stop()


def test_multimodal_decode(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"fakeimagebytes" * 10)), (2, bytearray(b""))],
        "id long, data binary",
    )
    media = multimodal.attach_media(df, "id", "data", "image")
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "media_type",
        "content",
        "metadata",
    ]
    decoded = {r["media_id"]: r for r in multimodal.decode_images(media).collect()}
    assert decoded[1]["decoder"] in ("fake", "pil")
    assert len(decoded[1]["features"]) == 8
    # deterministic: same bytes -> same features
    again = {r["media_id"]: r for r in multimodal.decode_images(media).collect()}
    assert decoded[1]["features"] == again[1]["features"]


def test_multimodal_frames(spark):
    df = spark.createDataFrame([(1, bytearray(b"x" * 3000))], "id long, data binary")
    media = multimodal.attach_media(df, "id", "data", "video")
    frames = multimodal.sample_frames(media, every_n_bytes=1024).collect()
    assert [r["frame_index"] for r in sorted(frames, key=lambda r: r["frame_index"])] == [0, 1]


def test_dedup_stream_bounded_source(spark, tmp_path):
    """dedup_stream keeps one row per duplicated key and matches the batch
    row-number-1 equivalent on an in-order bounded source."""
    src = str(tmp_path / "dedup_src")
    ev_df = load_table(spark, SF, "events").limit(500)
    # duplicate every event's content key on purpose
    ev_df.select("event_id", "ts", "user_id", "event_type", "value", "props") \
        .union(ev_df.select("event_id", "ts", "user_id", "event_type", "value", "props")) \
        .coalesce(1).write.parquet(src)
    stream = ev.stream_from_parquet(spark, src)
    q = ev.run_stream_to_memory(
        ev.dedup_stream(stream, ["event_id"], watermark="1 hour"), "dedup_out"
    )
    try:
        got = spark.sql("SELECT count(*) FROM dedup_out").first()[0]
        assert got == 500
        dup = spark.sql(
            "SELECT count(*) FROM (SELECT event_id FROM dedup_out GROUP BY event_id HAVING count(*) > 1)"
        ).first()[0]
        assert dup == 0
        batch = ev.dedup_stream_batch_equivalent(spark.read.parquet(src), ["event_id"])
        assert batch.count() == 500
    finally:
        q.stop()


def test_multimodal_resize_and_features(spark):
    from duckpgq_extension_spark.operators import multimodal as mm
    from duckpgq_extension_spark.operators import similarity as sim

    docs = load_table(spark, SF, "documents").limit(50)
    media = mm.attach_media(
        docs.select("doc_id", F.encode("text", "utf-8").alias("b")), "doc_id", "b", "image"
    )
    rs = mm.resize_images(media, width=8, height=8)
    rows = rs.collect()
    assert len(rows) == 50
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    assert all(len(r["content"]) == 64 for r in rows)

    feats = mm.extract_features(media, dim=8)
    frows = feats.collect()
    assert len(frows) == 50
    assert all(len(r["embedding"]) == 8 for r in frows)
    assert all(abs(sum(r["embedding"]) - 1.0) < 1e-9 for r in frows)
    # embeddings flow straight into the similarity operators
    emb = feats.select(F.col("media_id").alias("vec_id"), "embedding")
    top = sim.brute_force_topk(emb, emb.limit(3), k=2)
    assert top.count() == 6


def test_salted_join_equals_plain_join(spark):
    from duckpgq_extension_spark.operators.relational import salted_join

    # pathological skew: 90% of left rows share one key
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(7, "hot"), (950, "cold"), (999, "cold")], "k long, tag string"
    )
    plain = {(r["k"], r["payload"], r["tag"]) for r in
             left.join(right, "k").collect()}
    salted = {(r["k"], r["payload"], r["tag"]) for r in
              salted_join(left, right, "k", salt=8).collect()}
    assert salted == plain and len(plain) == 902
    # left join keeps unmatched rows exactly once
    lp = left.join(right, "k", "left").count()
    ls = salted_join(left, right, "k", salt=8, how="left").count()
    assert lp == ls == 1000


def test_salted_join_rejects_right_and_full(spark):
    import pytest as _pytest
    from duckpgq_extension_spark.operators.relational import salted_join

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    for how in ("right", "full", "right_outer", "full_outer", "outer"):
        with _pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(left, right, "k", salt=4, how=how)


def test_streaming_degree_matches_batch(spark, tmp_path):
    """degree_stream's final complete-mode state equals the batch degree
    aggregation (addition commutes across micro-batches)."""
    from pyspark.sql import functions as F
    from duckpgq_extension_spark.streaming import events as ev

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (2, 0)], "src long, dst long"
    )
    src = str(tmp_path / "deg_stream")
    edges.write.mode("overwrite").parquet(src)
    stream = ev.stream_from_parquet(spark, src, schema="src long, dst long")
    q = ev.run_stream_to_memory(
        ev.degree_stream(stream), "t_degree_out", output_mode="complete"
    )
    q.stop()
    got = {r["vid"]: (r["out_deg"], r["in_deg"])
           for r in spark.table("t_degree_out").collect()}
    assert got == {0: (2, 2), 1: (1, 1), 2: (2, 2)}


def test_streaming_text_pipeline_matches_batch(spark, tmp_path):
    """The text-analysis expressions (quality, lang-id, PII scrub) are
    stateless column expressions, so the SAME code runs under Structured
    Streaming: a file-source stream filtered+redacted must equal the
    batch run row for row."""
    from duckpgq_extension_spark.functions import text as TX

    src = str(tmp_path / "docs_src")
    docs = load_table(spark, SF, "documents").limit(200).select("doc_id", "text")
    docs.coalesce(1).write.parquet(src)

    def pipeline(df):
        toks = TX.tokens(F.col("text"))
        return (
            df.withColumn("__toks", toks)
            .select(
                "doc_id",
                TX.lang_id(F.col("text"), F.col("__toks")).alias("lang"),
                F.round(TX.quality_score(F.col("text"), F.col("__toks")), 6).alias("q"),
                F.md5(TX.redact_pii(F.col("text"))).alias("red"),
            )
            .where(F.col("q") > 0.2)
        )

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = ev.run_stream_to_memory(pipeline(stream), "text_stream_out")
    try:
        got = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM text_stream_out").collect()
        )
        want = sorted(tuple(r) for r in pipeline(spark.read.parquet(src)).collect())
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_funnel_golden(spark):
    from datetime import datetime

    from duckpgq_extension_spark.streaming.events import funnel

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2: click BEFORE view never counts; stops at depth 1
        (2, t(5), "click"), (2, t(6), "view"),
        # user 3: view then purchase without click -> depth 1
        (3, t(1), "view"), (3, t(2), "purchase"),
        # user 4 never views -> absent
        (4, t(1), "purchase"),
        # user 5: two views; funnel starts at the EARLIEST view
        (5, t(4), "view"), (5, t(1), "view"), (5, t(2), "click"),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: (r.steps_completed, r.first_us, r.last_us)
           for r in funnel(events, ["view", "click", "purchase"]).collect()}
    base = 1704067200000000
    assert set(got) == {1, 2, 3, 5}
    assert got[1] == (3, base + 1_000_000, base + 3_000_000)
    assert got[2][0] == 1 and got[3][0] == 1
    assert got[5] == (2, base + 1_000_000, base + 2_000_000)
    # within: user 1 capped at 1us window completes only step 1
    tight = {r.user_id: r.steps_completed
             for r in funnel(events, ["view", "click", "purchase"], within_us=500_000).collect()}
    assert tight[1] == 1


def test_cohort_retention_golden(spark):
    from datetime import datetime

    from duckpgq_extension_spark.streaming.events import cohort_retention

    rows = [
        (1, datetime(2024, 1, 1)), (1, datetime(2024, 1, 9)),   # wk0, wk1
        (2, datetime(2024, 1, 2)), (2, datetime(2024, 1, 16)),  # wk0, wk2
        (3, datetime(2024, 1, 10)),                              # cohort wk1
        (1, datetime(2024, 1, 3)),                               # same wk0, dedup
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort_us, r.week_offset): r.n_users for r in cohort_retention(events).collect()}
    wk0 = 1704067200000000  # Mon 2024-01-01
    wk1 = wk0 + 7 * 86400 * 1000000
    assert got[(wk0, 0)] == 2
    assert got[(wk0, 1)] == 1
    assert got[(wk0, 2)] == 1
    assert got[(wk1, 0)] == 1
    assert len(got) == 4


def test_session_paths_golden(spark):
    from datetime import datetime

    from duckpgq_extension_spark.streaming.events import session_paths

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    rows = [
        (1, 1, t(0), "view"), (1, 2, t(1), "click"),          # session A
        (1, 3, t(50), "view"), (1, 4, t(51), "click"),        # >30m gap: B
        (2, 5, t(0), "view"), (2, 6, t(1), "click"),          # same path
        (3, 7, t(0), "error"),                                 # singleton
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = [(r.path, r.n_sessions, r.n_users)
           for r in session_paths(events, gap_minutes=30, top_n=5).collect()]
    assert got[0] == ("view>click", 3, 2)
    assert ("error", 1, 1) in got
