"""As-of join: for each left row, the most recent right row with the same
key and right_ts <= left_ts (backward-looking temporal join).

Spark has no native ASOF JOIN (DuckDB does). The naive formulation —
range-condition join then per-left-row max — explodes to O(|L|·|R|) pairs
per key before pruning. This implementation is the scale-correct one:

    union(tag L/R) → ONE shuffle on the key → per-key sort by (ts, tag) →
    last(struct-of-right-attrs, ignorenulls) over rows-unbounded-preceding →
    keep L rows, project the matched struct's fields.

Cost is a single hash partition + per-partition sort — identical shape to
any windowed aggregation, no pair blow-up, no skew amplification beyond
what the key distribution already has. This mirrors how streaming systems
implement temporal joins (sorted merge per key).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Backward as-of join (right_ts <= left_ts, latest wins).

    Returns every LEFT row with ``{col}{suffix}`` columns holding the
    matched right row's values (null when no right row precedes it).
    Ties on timestamp resolve to the right row (tag order sorts right
    rows first at equal ts, so an equal-ts right row IS visible to the
    left row — the conventional `<=` asof semantics).

    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)`` parity)
    nulls out matches further than the given gap. Units are whatever a
    ``double`` cast of the ts column yields — seconds (with fraction)
    for timestamps, the raw value for numeric ts columns. Same plan
    either way: the matched row's ts travels inside the backfill
    struct, so tolerance is a post-window filter, not a second join.

    ``direction="forward"`` (merge_asof parity) matches the EARLIEST
    right row with right_ts >= left_ts instead — the identical plan
    with the per-key sort reversed (ts DESC), so cost is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    lt = left.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # All right attributes travel as ONE struct so the window backfill picks
    # the whole matched row atomically. Filling each column independently
    # with last(ignorenulls) would stitch values from DIFFERENT right rows
    # whenever the matched row holds a NULL in one column (the older row's
    # value would bleed through) — the struct is NULL-or-whole-row.
    rt_aligned = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(
            *[F.col(c) for c in right_cols],
            F.col(right_ts).alias("__mts"),  # matched ts, for tolerance
        ).alias("__r"),
    )
    r_struct_type = rt_aligned.schema["__r"].dataType
    left_cols = [c for c in left.columns]
    lt_aligned = lt.select(
        F.col(on),
        "__ts",
        "__tag",
        F.lit(None).cast(r_struct_type).alias("__r"),
        *[F.col(c) for c in left_cols if c != on],
    )
    # pad right side with null left columns
    for c in left_cols:
        if c == on:
            continue
        rt_aligned = rt_aligned.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))

    unioned = lt_aligned.unionByName(rt_aligned)
    # backward: ascending ts — the last right row at-or-before each left
    # row. forward: descending ts — the "last preceding" row in DESC order
    # is the earliest right row at-or-after. Tag asc keeps the equal-ts
    # right row visible to the left row in both directions.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__match")
    )
    match = F.col("__match")
    if tolerance_seconds is not None:
        # TIMESTAMP_NTZ refuses a direct double cast (Spark 4); routing
        # through TIMESTAMP first works for every temporal type and is a
        # no-op for numeric ts columns (session tz is pinned UTC, and the
        # same interpretation applies to both sides, so gaps are exact).
        ts_type = filled.schema["__ts"].dataType.typeName()
        def _secs(c):
            return (
                c.cast("timestamp").cast("double")
                if ts_type.startswith("timestamp")
                else c.cast("double")
            )
        gap = _secs(F.col("__ts")) - _secs(match["__mts"])
        if direction == "forward":
            gap = -gap
        match = F.when(gap <= F.lit(float(tolerance_seconds)), match)
    return filled.filter(F.col("__tag") == 1).select(
        *left_cols,
        *[match[c].alias(f"{c}{suffix}") for c in right_cols],
    )
