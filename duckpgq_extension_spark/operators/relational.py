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


_DUR_UNITS = {
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
}


def _duration_us(text: str) -> int:
    """'15 minutes' -> microseconds (the subset of interval syntax the
    blocking grid needs)."""
    parts = text.strip().lower().split()
    if len(parts) != 2 or parts[1] not in _DUR_UNITS or not parts[0].isdigit():
        raise ValueError(f"Unsupported bucket duration {text!r} (use 'N second|minute|hour|day[s]')")
    return int(parts[0]) * _DUR_UNITS[parts[1]]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_ts: str,
    bucket: str = "1 hour",
    on: str | list[str] | None = None,
) -> DataFrame:
    """Interval join: pair every left interval [start, end] with the right
    rows whose timestamp falls inside it (optionally also matching key
    columns).

    The naive plan is a pure inequality join — a broadcast-nested-loop /
    cartesian that dies at scale.  This implementation blocks both sides
    by a time bucket first: an interval joins only the buckets it
    overlaps (explode over the covered bucket sequence), the point side
    joins on its single bucket, and the exact containment predicate then
    filters within the bucket — so the join is an equi-join on
    (bucket [, keys]) that shuffles and prunes like any other.  Choose
    `bucket` near the typical interval length: much smaller multiplies
    the explode fan-out, much larger packs unrelated rows into one block.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    b_us = _duration_us(bucket)

    def bidx(c):
        # bucket ordinal on a shared epoch grid; works for TIMESTAMP and
        # TIMESTAMP_NTZ alike (cast normalizes, session tz pinned UTC)
        return F.floor(F.unix_micros(F.col(c).cast("timestamp")) / F.lit(b_us))

    lb = left.withColumn(
        "__b", F.explode(F.sequence(bidx(left_start), bidx(left_end)))
    )
    rb = right.withColumn("__b", bidx(right_ts))
    cond = [lb["__b"] == rb["__b"]] + [lb[k] == rb[k] for k in keys]
    out = (
        lb.join(rb, cond)
        .where(
            (rb[right_ts] >= lb[left_start]) & (rb[right_ts] <= lb[left_end])
        )
        .drop(lb["__b"])
        .drop(rb["__b"])
    )
    if keys:
        for k in keys:
            out = out.drop(rb[k])
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: hot keys on the (large, skewed) left side
    are spread across `salt` sub-partitions and the right side is
    replicated `salt` ways, so no single reducer owns a whole hot key.

    AQE's skew-join handles most cases at runtime; use this when the skew
    is known up front (power-law graph degrees, stop-shingle blocks) or
    when AQE is unavailable (bucketed sort-merge paths).  The salt is a
    deterministic hash of the full left row — same data, same plan.
    Result is exactly the plain join's (the salt column never leaks).

    Only inner/left-side joins are supported: the right side is replicated
    `salt` ways, so right/full outer joins would emit every unmatched
    right row once per replica — a different result from the plain join.
    To spread skew in a right/full join, swap the sides (salt the side
    whose keys are hot) or fall back to AQE's skew-join handling.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the right side is "
            "replicated per salt, which duplicates unmatched right rows in "
            "right/full outer joins; swap the join sides instead"
        )
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(r, keys + ["__salt"], how)
    return out.drop("__salt")


def resample_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
) -> DataFrame:
    """Regular time-series resampling with gap filling: per key, a dense
    grid of `unit` buckets from its first to its last observation, the
    per-bucket mean where data exists, and forward-fill (last observed
    value carries over) across empty buckets — the resample + ffill every
    metrics/feature pipeline needs before windowed models see the series
    (DuckDB/Timescale expose it as time_bucket + gapfill/locf).

    Returns (key, bucket, value_ffill).  Leading buckets before a key's
    first observation cannot occur (the grid starts at its min), so
    value_ffill is never NULL.

    Scale design: aggregation and the window partition on the same key —
    AQE reuses one shuffle; the grid is generated per key with
    `sequence()` (no driver-side calendar, no cross join against a global
    spine, which would explode on sparse keys).  Grid size is bounded by
    each key's own span.
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    per = df.groupBy(
        F.col(key_col).alias("key"), bucket.alias("bucket")
    ).agg(F.avg(value_col).alias("__v"))
    bounds = per.groupBy("key").agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    grid = bounds.select(
        "key",
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"interval 1 {unit}"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per, ["key", "bucket"], "left")
        .select(
            "key",
            "bucket",
            F.round(F.last("__v", ignorenulls=True).over(w), 6).alias(
                "value_ffill"
            ),
        )
    )


def pivot_counts(
    df: DataFrame,
    key_col: str,
    pivot_col: str,
    values: list[str],
    value_col: str | None = None,
) -> DataFrame:
    """Long-to-wide pivot: one row per key, one column per pivot value,
    cells = row counts (or sums of `value_col`), absent combinations 0 —
    the feature-vector shape classifiers want (DuckDB's PIVOT statement).

    `values` is REQUIRED, deliberately: Spark's pivot can discover the
    distinct values itself, but that is an extra blocking job over the
    full table before the plan can even build — at 100 TB the caller
    states the (small, known) category set instead.  The pivot itself is
    a single hash aggregate (one shuffle on key); each cell compiles to
    a conditional aggregate, not a join per category.
    """
    agg = F.sum(value_col) if value_col else F.count(F.lit(1))
    wide = df.groupBy(F.col(key_col).alias("key")).pivot(pivot_col, values).agg(agg)
    # empty cells surface as NULL (no rows aggregated); expose 0 like the
    # conditional-aggregate formulation would
    return wide.select(
        "key",
        *[
            (F.round(F.coalesce(F.col(f"`{v}`"), F.lit(0.0)), 6) if value_col
             else F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long")).alias(v)
            for v in values
        ],
    )


def group_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact interpolated quantiles per group (SQL's continuous
    PERCENTILE_CONT / DuckDB's quantile_cont): one sort-based aggregate,
    all requested quantiles computed in a single pass over each group's
    sorted values.

    For percentile sketches at 100 TB scale prefer approx_percentile
    (t-digest, mergeable, no full sort); this operator is the EXACT
    variant for group counts that fit a sort — reconciliation jobs,
    per-partition data-quality gates, oracle checks.
    """
    exprs = [
        F.round(F.percentile(F.col(col), F.lit(q)), 6).alias(
            f"p{int(round(q * 100)):02d}"
        )
        for q in qs
    ]
    return df.groupBy(*[F.col(k) for k in keys]).agg(*exprs)


def rolling_time_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    days: int = 7,
) -> DataFrame:
    """Per-row trailing time-window aggregate: for every event, the mean
    and count of `value_col` over the SAME key's events in the previous
    `days` days (inclusive) — a RANGE window frame over epoch
    microseconds, the rolling-feature shape ML feature stores compute
    ("user's 7-day average") that a rows-based frame gets wrong whenever
    event density varies.

    Returns (key, ts_us, avg_{days}d, sum_{days}d, n_{days}d) — the
    aggregate column names are parameterized by the window width, e.g.
    avg_7d / sum_7d / n_7d for the default.

    Scale design: one shuffle on the key; the RANGE frame is evaluated
    in a single sort-based window pass with a sliding accumulator (no
    self-join against the window span, which is the quadratic
    formulation).  Epoch-microsecond ordering keeps the frame boundary
    integer-exact (timestamp-vs-interval arithmetic varies by engine;
    integers do not).
    """
    span = days * 86400 * 1_000_000
    # NTZ-safe epoch micros (pyspark 4.1 reads parquet TIMESTAMP(NANOS)
    # as TIMESTAMP_NTZ, which bare unix_micros rejects; UTC session tz
    # makes the cast a reinterpretation, not a shift)
    order = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(order)
        .rangeBetween(-span, 0)
    )
    return df.select(
        F.col(key_col),
        order.alias("ts_us"),
        F.round(F.avg(value_col).over(w), 4).alias(f"avg_{days}d"),
        F.sum(value_col).over(w).alias(f"sum_{days}d"),
        F.count(F.lit(1)).over(w).alias(f"n_{days}d"),
    )


def winsorize(
    df: DataFrame,
    keys: list[str],
    col: str,
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clamp `col` to its group's
    [lower, upper] PERCENTILE_CONT quantiles — the standard outlier
    treatment before scaling/featurizing numeric columns (trim would
    drop the rows; winsorize keeps them at the fence).

    Returns the input columns with `col` replaced by the clamped value
    plus the fences (`__lo`, `__hi` are not exposed).

    Scale design: one sort-based quantile aggregate per group (tiny
    output) joined back — Catalyst broadcasts the fences when the group
    count is small; the clamp itself is a pure projection.
    """
    fences = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.percentile(F.col(col), F.lit(lower)).alias("__lo"),
        F.percentile(F.col(col), F.lit(upper)).alias("__hi"),
    )
    out_cols = [
        F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi")).alias(col)
        if c == col
        else F.col(c)
        for c in df.columns
    ]
    return df.join(fences, keys).select(*out_cols)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column data-quality profile: row count, NULL count, exact
    distinct count, and min/max (as strings, so one schema fits every
    column type) — the profiling gate data pipelines run before
    accepting a new snapshot.

    Returns (col_name, n_rows, n_null, n_distinct, min_val, max_val),
    one row per profiled column.

    Scale design: ONE aggregation pass computes every per-column
    aggregate except distinct counts (count/min/max are map-side
    combined in a single job); exact distincts run as one grouped
    count per column — swap in approx_count_distinct upstream when
    billions of distincts make exactness pointless.  No collect of data
    rows; the profile is column-count sized.
    """
    cols = columns if columns is not None else df.columns
    base = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            a
            for c in cols
            for a in (
                F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
                F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
            )
        ],
    )
    # the 1-row aggregate is referenced once per column branch of the
    # union below — materialize it so the combined pass runs ONCE instead
    # of once per column (Catalyst does not cache repeated subtrees)
    base = base.localCheckpoint(eager=True)
    rows = None
    for c in cols:
        d = df.select(c).where(F.col(c).isNotNull()).distinct().agg(
            F.count(F.lit(1)).alias("__nd")
        )
        piece = base.crossJoin(d).select(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col("__nd").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_val"),
            F.col(f"__max_{c}").alias("max_val"),
        )
        rows = piece if rows is None else rows.unionByName(piece)
    return rows


def group_entropy(
    df: DataFrame, group_col: str, label_col: str
) -> DataFrame:
    """Shannon entropy of a label distribution per group,
    H = -sum(p * ln p) — the diversity diagnostic corpus pipelines
    report per split/phase ("did the test split keep the source mix?").

    Returns (group, n, n_labels, entropy).  One (group, label) count
    aggregate, then a group-sized aggregate — both map-side combined.
    """
    counts = df.groupBy(
        F.col(group_col).alias("grp"), F.col(label_col).alias("lbl")
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = Window.partitionBy("grp")
    p = F.col("c") / F.sum("c").over(tot)
    return (
        counts.withColumn("__plp", -p * F.log(p))
        .groupBy("grp")
        .agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_labels"),
            F.round(F.sum("__plp"), 6).alias("entropy"),
        )
    )
