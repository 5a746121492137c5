"""Canonical loaders for the testdata star schema (TESTDATA.md).

The one wrinkle: `events.ts` is written as parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]).  With
spark.sql.legacy.parquet.nanosAsLong=true (set in session.get_spark) the
column arrives as a long of nanoseconds; `load_table` converts it back to
a proper timestamp by integer-dividing to microseconds — the same
truncation DuckDB applies when it reads ns parquet, so oracle comparisons
agree to the microsecond.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division, not `/` — float division rounds 19-digit nanos
        # and can land 1us off DuckDB's exact truncation
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Create temp views for every testdata table (matching the names the
    driver's DuckDB oracle pre-registers)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
