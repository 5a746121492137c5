"""Generic source/sink helpers: one entry point per supported format.

Parquet is the primary path (columnar, predicate pushdown, the format the
whole engine is benchmarked on).  CSV/JSON/ORC ride the same reader with
explicit schemas (never inferSchema in production paths).  Table formats
needing extra jars (Delta/Iceberg) are import-gated — the v1 container
doesn't ship them, so they raise a clear error instead of a classpath
crash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMATS = ("parquet", "orc", "csv", "json")


def read(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    if fmt == "delta":
        return read_delta(spark, path)
    if fmt not in FORMATS:
        raise ValueError(f"Unsupported format {fmt!r} (use one of {FORMATS} or 'delta')")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} requires an explicit schema (no inference in the engine path)")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"Unsupported format {fmt!r}")
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake reader, gated: the delta-spark jars are not in this
    container; raises a clear NotImplementedError until they are."""
    try:
        import delta  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Delta Lake support requires the delta-spark package + jars on "
            "the classpath (not present in this environment)"
        ) from exc
    return spark.read.format("delta").load(path)  # pragma: no cover


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    src_col: str = "src",
    buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist an edge table bucketed by its source key.

    At cluster scale this is the difference between shuffling the
    adjacency once per session and never shuffling it at all: a bucketed
    table is already hash-partitioned on disk, so every per-level BFS /
    Bellman-Ford join against a frontier bucketed the same way is
    shuffle-free on the edge side (Spark recognizes the bucketing as a
    satisfied HashPartitioning requirement).  Pair with
    `spark.conf.set("spark.sql.sources.bucketing.enabled", "true")`
    (default on) and read back via `spark.table(table)`.

    buckets defaults to the session's shuffle partition count so bucket
    and shuffle layouts line up.
    """
    spark = edges.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        edges.write.mode(mode)
        .bucketBy(buckets, src_col)
        .sortBy(src_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_bucketed_corpus(
    df: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a document corpus bucketed by its CONTENT HASH — the
    standing-corpus layout for repeated dedup passes.

    Exact dedup, exact_duplicates, and cross-snapshot exact anti-joins
    all key on md5_long(text); a corpus bucketed on that hash is already
    hash-partitioned on disk, so every such pass over the standing table
    is shuffle-free on the corpus side (the bucketing satisfies the
    aggregation/join's HashPartitioning requirement — same mechanism as
    write_bucketed_edges for BFS).  At 100 TB that converts the daily
    dedup job's dominant shuffle into a co-located scan.

    The hash is persisted as a `content_hash` column (computing it at
    write time is what makes the bucketing usable; readers get it for
    free and new snapshots bucket identically because md5_long is
    engine-stable).
    """
    from ..functions.text import md5_long

    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.withColumn("content_hash", md5_long(F.col(text_col)))
        .write.mode(mode)
        .bucketBy(buckets, "content_hash")
        .sortBy("content_hash", id_col)
        .format("parquet")
        .saveAsTable(table)
    )
