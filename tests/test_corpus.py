"""operators/corpus.py: chunking + deterministic sampling."""

import pytest
from pyspark.sql import functions as F

from duckpgq_extension_spark.operators.corpus import (
    chunk_documents,
    deterministic_sample,
)


def test_chunk_windows_and_tail(spark):
    # 10 tokens, window 4, overlap 1 (step 3): starts 1,4,7,10 ->
    # sizes 4,4,4,1; consecutive chunks share exactly one token
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r.chunk_id, r.chunk_text, r.n_chunk_tok)
        for r in chunk_documents(df, "doc_id", "text", 4, 1).collect()
    )
    assert [g[2] for g in got] == [4, 4, 4, 1]
    assert got[0][1] == "w0 w1 w2 w3"
    assert got[1][1] == "w3 w4 w5 w6"
    assert got[3][1] == "w9"


def test_chunk_empty_and_validation(spark):
    df = spark.createDataFrame([(1, ""), (2, "a b")], "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", 4, 0).collect()
    # the empty text tokenizes to [''] (one empty token) like the oracle's
    # string_split_regex; the 2-token doc yields one short chunk
    ids = {r.id for r in out}
    assert 2 in ids
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 4, 4)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 0, 0)


def test_deterministic_sample_reproducible(spark):
    df = spark.range(0, 10_000).select(F.col("id").alias("k"))
    s1 = {r.k for r in deterministic_sample(df, "k", 0.2, salt="x").collect()}
    s2 = {r.k for r in deterministic_sample(df, "k", 0.2, salt="x").collect()}
    assert s1 == s2
    assert 0.17 < len(s1) / 10_000 < 0.23  # hash-uniform around the rate
    other = {r.k for r in deterministic_sample(df, "k", 0.2, salt="y").collect()}
    assert other != s1  # independent draw under a different salt
    assert deterministic_sample(df, "k", 0.0).count() == 0
    assert deterministic_sample(df, "k", 1.0).count() == 10_000
    with pytest.raises(ValueError):
        deterministic_sample(df, "k", 1.5)


def test_deterministic_sample_is_nested_by_rate(spark):
    # a row kept at rate r is kept at every r' > r (bucket < threshold)
    df = spark.range(0, 5_000).select(F.col("id").alias("k"))
    small = {r.k for r in deterministic_sample(df, "k", 0.1).collect()}
    big = {r.k for r in deterministic_sample(df, "k", 0.3).collect()}
    assert small <= big
