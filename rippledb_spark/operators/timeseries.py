"""Time-series reshaping operators: resampling with gap-fill (the
hypertable-rollup family). The reference has no time-series surface
(SURVEY §2.4); this is engine-tier capability for the events stream.

Scale notes: the spine (dimension keys × time buckets) is generated with
``sequence`` + ``explode`` — pure expressions, no driver loop; the join to
actual aggregates shuffles once on (key, bucket); forward fill is a window
over the already-shuffled partitioning (no extra exchange: the window
partitions by the same key)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def resample_fill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    step: str = "1 hour",
    agg: str = "avg",
) -> DataFrame:
    """Resample ``value`` per ``key`` into fixed ``step`` buckets over the
    GLOBAL [min, max] time span, forward-filling empty buckets with the
    last seen aggregate (NULL until a key's first observation).

    Returns (key, bucket_start, value_filled, is_gap). ``step`` must be a
    single-unit interval ("1 hour", "1 day", ...) — the truncation unit is
    derived from it, so a multi-count step like "15 minutes" would silently
    bucket actuals per minute while the spine strides 15; reject it.
    """
    parts = step.split()
    if len(parts) != 2 or parts[0] != "1":
        raise ValueError(
            f"resample_fill step must be a count-1 interval like '1 hour', got {step!r}"
        )
    unit = parts[-1].rstrip("s")
    bucket = F.date_trunc(unit, F.col(ts)).alias("__b")
    agg_fn = getattr(F, agg)
    actual = df.groupBy(F.col(key).alias("__k"), bucket).agg(
        agg_fn(value).alias("__v")
    )
    # global span: 1 row, broadcast; spine = keys × sequence(buckets)
    span = df.agg(
        F.date_trunc(unit, F.min(ts)).alias("__lo"),
        F.date_trunc(unit, F.max(ts)).alias("__hi"),
    )
    keys = df.select(F.col(key).alias("__k")).distinct()
    spine = (
        keys.crossJoin(F.broadcast(span))
        .select(
            "__k",
            F.explode(
                F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
            ).alias("__b"),
        )
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(actual, ["__k", "__b"], "left_outer")
        .select(
            F.col("__k").alias(key),
            F.col("__b").alias("bucket_start"),
            F.last("__v", ignorenulls=True).over(w).alias("value_filled"),
            F.col("__v").isNull().alias("is_gap"),
        )
    )
