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
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
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
    ``direction="nearest"`` takes whichever of the backward/forward
    candidates is closer in absolute gap (ties prefer backward); both
    fills share one shuffle (two sorts over the same Exchange).

    ``allow_exact_matches=False`` (merge_asof parity) makes the
    comparison strict (< / >): an equal-ts right row is invisible.
    Implemented purely in the tie-break order — at equal ts the left
    row sorts BEFORE the right row, so the backfill can't see it.

    ``on`` may be a list of key columns (merge_asof ``by=[...]``); the
    single shuffle then partitions on the composite key.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward', or 'nearest', got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]

    lt = left.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # All right attributes travel as ONE struct so the window backfill picks
    # the whole matched row atomically. Filling each column independently
    # with last(ignorenulls) would stitch values from DIFFERENT right rows
    # whenever the matched row holds a NULL in one column (the older row's
    # value would bleed through) — the struct is NULL-or-whole-row.
    rt_aligned = right.select(
        *[F.col(k) for k in keys],
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
        *[F.col(k) for k in keys],
        "__ts",
        "__tag",
        F.lit(None).cast(r_struct_type).alias("__r"),
        *[F.col(c) for c in left_cols if c not in keys],
    )
    # pad right side with null left columns
    for c in left_cols:
        if c in keys:
            continue
        rt_aligned = rt_aligned.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))

    unioned = lt_aligned.unionByName(rt_aligned)
    # backward: ascending ts — the last right row at-or-before each left
    # row. forward: descending ts — the "last preceding" row in DESC order
    # is the earliest right row at-or-after. Tag asc (right=0 first) keeps
    # the equal-ts right row visible; tag desc hides it (strict < / >).
    tag_order = F.col("__tag").asc() if allow_exact_matches else F.col("__tag").desc()
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").desc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    ts_type = unioned.schema["__ts"].dataType.typeName()

    def _secs(c):
        # TIMESTAMP_NTZ refuses a direct double cast (Spark 4); routing
        # through TIMESTAMP first works for every temporal type and is a
        # no-op for numeric ts columns (session tz is pinned UTC, and the
        # same interpretation applies to both sides, so gaps are exact).
        return (
            c.cast("timestamp").cast("double")
            if ts_type.startswith("timestamp")
            else c.cast("double")
        )

    def _gated(match, forward: bool):
        """Null out a match beyond the tolerance gap (directional)."""
        if tolerance_seconds is None:
            return match
        gap = _secs(F.col("__ts")) - _secs(match["__mts"])
        if forward:
            gap = -gap
        return F.when(gap <= F.lit(float(tolerance_seconds)), match)

    if direction == "nearest":
        # Both fills share the Exchange on `on` (two sorts, one shuffle);
        # per row the smaller absolute gap wins, ties prefer backward
        # (merge_asof convention).
        filled = unioned.select(
            "*",
            F.last("__r", ignorenulls=True).over(wb).alias("__mb"),
            F.last("__r", ignorenulls=True).over(wf).alias("__mf"),
        )
        mb = _gated(F.col("__mb"), forward=False)
        mf = _gated(F.col("__mf"), forward=True)
        gb = _secs(F.col("__ts")) - _secs(mb["__mts"])
        gf = _secs(mf["__mts"]) - _secs(F.col("__ts"))
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(gb <= gf, mb)
            .otherwise(mf)
        )
    else:
        w = wb if direction == "backward" else wf
        filled = unioned.select(
            "*", F.last("__r", ignorenulls=True).over(w).alias("__match")
        )
        match = _gated(F.col("__match"), forward=direction == "forward")
    return filled.filter(F.col("__tag") == 1).select(
        *left_cols,
        *[match[c].alias(f"{c}{suffix}") for c in right_cols],
    )
