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
