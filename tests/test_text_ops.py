"""Text functions + portability of the md5-prefix hash against DuckDB."""

import duckdb
import pytest
from pyspark.sql import functions as F

from duckpgq_extension_spark.functions import text as TX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_md5_long_matches_duckdb(spark):
    samples = ["hello", "the cat sat", "", "über café 北京"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r[0]: r[1] for r in df.select("s", TX.md5_long(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for s in samples:
        expected = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got[s] == expected, s


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("one",)], "s string")
    got = [r[0] for r in df.select(TX.token_count(F.col("s"))).collect()]
    assert got == [3, 1]


def test_lang_id_deterministic(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of war",),
            ("der hund und die katze ist",),
            ("le chat et la vie des gens",),
            ("xyzzy qwerty",),
        ],
        "s string",
    )
    got = [r[0] for r in df.select(TX.lang_id(F.col("s"))).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_quality_score_range(docs):
    stats = docs.select(
        F.min(TX.quality_score(F.col("text"))).alias("lo"),
        F.max(TX.quality_score(F.col("text"))).alias("hi"),
    ).first()
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_word_ngrams_and_fingerprint(spark):
    df = spark.createDataFrame([("a b c d",), ("a",)], "s string")
    grams = [r[0] for r in df.select(TX.word_ngrams(F.col("s"), 3)).collect()]
    assert grams[0] == ["a b c", "b c d"]
    assert grams[1] == []
    fps = [r[0] for r in df.select(TX.doc_fingerprint(F.col("s"), 3)).collect()]
    assert all(isinstance(x, int) for x in fps)


def test_fingerprint_detects_shared_prefix(spark):
    # identical 5-gram content -> identical fingerprint
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon eta")],
        "id long, s string",
    )
    fps = [r[0] for r in df.select(TX.doc_fingerprint(F.col("s"), 5)).collect()]
    # both share the shingle "alpha beta gamma delta epsilon"; min-hash may
    # or may not pick it, but equal inputs must hash equally:
    df2 = spark.createDataFrame([(1, "x y z"), (2, "x y z")], "id long, s string")
    fps2 = [r[0] for r in df2.select(TX.doc_fingerprint(F.col("s"), 3)).collect()]
    assert fps2[0] == fps2[1]
    assert len(fps) == 2


def test_text_pipeline_plan_compactness(spark):
    """Regression guard for the r2 Janino 64 KB codegen fallback: tokens
    are pre-projected once (one split() in the lang_id/text_stats plans)
    and the language-score CASE stays linear (the old running-max fold
    plus inline tokenization produced >100 KB plans that dropped the
    whole stage out of codegen)."""
    from duckpgq_extension_spark import entry_queries as EQ

    sf = "/root/testdata/sf0.001"
    for name, max_len, max_split in (
        ("lang_id", 10_000, 2),
        ("text_stats", 10_000, 2),
        ("corpus_clean", 25_000, 60),
    ):
        plan = EQ.QUERIES[name](spark, sf)._jdf.queryExecution().optimizedPlan().toString()
        assert len(plan) < max_len, f"{name} plan grew to {len(plan)} chars"
        assert plan.count("split(") <= max_split, name


def test_repetition_ratio(spark):
    from duckpgq_extension_spark.functions.text import repetition_ratio
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: ab ba ab ba ab -> 2 distinct / 5
            (2, "all words unique here"),
            (3, "x"),                # fewer than 2 tokens -> 0.0
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.r for r in df.select("doc_id", repetition_ratio(F.col("text")).alias("r")).collect()}
    assert got[1] == pytest.approx(1 - 2 / 5)
    assert got[2] == 0.0
    assert got[3] == 0.0


# --- round 4: normalization + PII scrub ------------------------------------


def test_normalize_text(spark):
    from duckpgq_extension_spark.functions import text as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("  Hello\t WORLD\n\nfoo  ",)], "t string")
    assert df.select(T.normalize_text(F.col("t")).alias("n")).first().n == "hello world foo"


def test_redact_pii_and_counts(spark):
    from duckpgq_extension_spark.functions import text as T
    from pyspark.sql import functions as F

    raw = (
        "mail a.b-c_d@sub.example.co.uk and bob@x.io, "
        "server 192.168.0.1 backup 10.0.200.7, call 555-010-1234 now"
    )
    df = spark.createDataFrame([(raw,)], "t string")
    row = df.select(
        T.redact_pii(F.col("t")).alias("r"),
        *[v.alias(k) for k, v in T.pii_counts(F.col("t")).items()],
    ).first()
    assert row.n_emails == 2 and row.n_ips == 2 and row.n_phones == 1
    assert "<EMAIL>" in row.r and "<IP>" in row.r and "<PHONE>" in row.r
    assert "@" not in row.r and "192.168" not in row.r and "555-010" not in row.r


def test_redact_pii_clean_text_unchanged(spark):
    from duckpgq_extension_spark.functions import text as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("no pii here, just words and 42 numbers",)], "t string")
    row = df.select(
        T.redact_pii(F.col("t")).alias("r"),
        *[v.alias(k) for k, v in T.pii_counts(F.col("t")).items()],
    ).first()
    assert row.r == "no pii here, just words and 42 numbers"
    assert (row.n_emails, row.n_ips, row.n_phones) == (0, 0, 0)


def test_normalize_text_options(spark):
    from pyspark.sql import functions as F

    from duckpgq_extension_spark.functions.text import normalize_text

    df = spark.createDataFrame([("  Héllo,   Wörld! (Café) #1  ",)], "t string")
    got = df.select(
        normalize_text(F.col("t")).alias("basic"),
        normalize_text(F.col("t"), strip_punct=True).alias("nopunct"),
        normalize_text(
            F.col("t"), strip_punct=True, ascii_fold=True
        ).alias("folded"),
        normalize_text(
            F.col("t"), lower=False, collapse_ws=False
        ).alias("noop"),
    ).first()
    assert got.basic == "héllo, wörld! (café) #1"
    assert got.nopunct == "héllo wörld café 1"
    assert got.folded == "hello world cafe 1"
    assert got.noop == "  Héllo,   Wörld! (Café) #1  "
