"""Relational operators Spark lacks natively, composed from built-ins.

These round out the engine surface for pipelines (SURVEY.md §2B/§2C):
as-of joins (DuckDB has ASOF JOIN; Spark does not) and top-k per group.
Both are single-shuffle window formulations — no applyInPandas, no
per-group driver loops — so they scale with the shuffle, not the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts for the same key (ASOF JOIN ... ON l.k = r.k AND
    l.ts >= r.ts semantics; left rows with no match keep NULLs).

    Single-shuffle implementation: union both sides tagged, sort within
    key by (ts, side), carry the last seen right values forward with a
    running last_value(ignorenulls) window, keep the left rows.  This
    avoids the naive range-join + groupBy-max double shuffle and never
    materializes the quadratic inequality join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in right_cols
        ],
    ).where(F.col("__side") == 1)
    return carried.select(
        F.col("__lrow.*"),
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_breaker: str | None = None,
) -> DataFrame:
    """Top-k rows per group via a rank window — the canonical Spark top-k
    (map-side partial sort, single shuffle on the group key)."""
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    orders = [order] + ([F.col(tie_breaker).asc()] if tie_breaker else [])
    w = Window.partitionBy(*group_cols).orderBy(*orders)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
