"""Rolling z-score anomaly detection over per-key daily counts — the
monitoring fold a pipeline runs over its event stream (r10 batch form;
r11 factors it here so the STREAMING twin shares the exact arithmetic).

Each (key, day) count is scored against the TRAILING ``window`` days'
mean and population std — the window excludes the current day, so a
spike can't mask itself — and |z| > threshold flags the anomaly. Only
days with a full history score (no partial-window false alarms). The
window folds run over date-sorted frames, so engines reduce in the same
order and the 6dp rounds replay exactly.

100 TB shape: one (key, day) count agg (map-side combinable) + one
key-partitioned ordered window pass — nothing global. The daily-count
state is tiny (keys × days) and MERGEABLE by plain addition, which is
what makes the incremental streaming form (streaming/sinks.
start_daily_count_sink) equal the batch fold.

Reference comparison: n/a (no window/streaming surface in the
reference).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def daily_counts(
    events: DataFrame, ts_col: str = "ts", key_col: str = "event_type"
) -> DataFrame:
    """events → (key_col, d, n): per-key UTC-calendar daily counts.
    The day bucket is pinned to UTC regardless of
    spark.sql.session.timeZone (to_utc_timestamp(ts, current_timezone())
    recovers the UTC wall time on any host — the r11 ADVICE fix)."""
    utc_day = F.to_date(
        F.to_utc_timestamp(F.col(ts_col), F.current_timezone())
    )
    return events.groupBy(key_col, utc_day.alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def rolling_zscores(
    daily: DataFrame,
    key_col: str = "event_type",
    window: int = 7,
    threshold: float = 2.0,
) -> DataFrame:
    """(key, d, n) → (key, d, n, mean7, std7, z, is_anomaly): trailing-
    ``window``-day z-scores, full-history days only. Column names keep
    the r10 registered query's shape (mean7/std7 regardless of window
    size — the certified public schema)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy("d")
        .rowsBetween(-window, -1)
    )
    nd = F.col("n").cast("double")
    roll = daily.select(
        key_col,
        "d",
        "n",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.avg(nd).over(w).alias("mu"),
        F.avg(nd * nd).over(w).alias("m2"),
    ).where(F.col("n_prev") == window)
    std = F.sqrt(
        F.greatest(F.col("m2") - F.col("mu") * F.col("mu"), F.lit(0.0))
    )
    z = F.when(std > 0, (nd - F.col("mu")) / std).otherwise(F.lit(0.0))
    return roll.select(
        key_col,
        "d",
        "n",
        F.round("mu", 6).alias("mean7"),
        F.round(std, 6).alias("std7"),
        F.round(z, 6).alias("z"),
        ((std > 0) & (F.abs(z) > threshold)).alias("is_anomaly"),
    )
