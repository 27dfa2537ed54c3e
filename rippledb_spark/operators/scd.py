"""Slowly-changing-dimension Type 2 construction (Kimball's SCD2 — the
classic warehouse pattern): turn a change-event stream (key, ts, value)
into validity-interval rows (key, value, valid_from, valid_to,
is_current), collapsing consecutive events that did not change the
value.

Determinism contract: events order by (ts, value NULLS FIRST) within a
key — the value tiebreak makes equal-timestamp events deterministic in
both engines (NULLS FIRST pinned explicitly: Spark's ASC default is
nulls-first, DuckDB's is nulls-last); the collapse keeps an event iff
it is the key's FIRST event (row_number = 1) or its value is
null-safely different from the previous event's (Spark ``eqNullSafe`` ≡
DuckDB ``IS DISTINCT FROM`` — a plain ``!=`` would evaluate to NULL
against a NULL value and silently drop the row, collapsing a
non-NULL→NULL→non-NULL history); valid_to is the NEXT kept event's ts
(lead), NULL for the current row. Pure window arithmetic — the DuckDB
oracle replays it exactly.

Scale shape: two windows over the same (key → ts, value) ordering —
one shuffle on the key, per-partition work bounded by the busiest
single key's history (dimension keys, not fact volume).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_from_changes(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """→ DataFrame(key, value, valid_from, valid_to, is_current)."""
    ev = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    w = Window.partitionBy("key").orderBy(
        "ts", F.col("value").asc_nulls_first()
    )
    changed = (
        ev.withColumn("__prev", F.lag("value").over(w))
        .withColumn("__rn", F.row_number().over(w))
        .where(
            (F.col("__rn") == 1)
            | ~F.col("value").eqNullSafe(F.col("__prev"))
        )
    )
    w2 = Window.partitionBy("key").orderBy(
        "ts", F.col("value").asc_nulls_first()
    )
    return changed.select(
        "key",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


def scd2_from_changes_sql(
    table: str, key_col: str, ts_col: str, value_col: str
) -> str:
    """DuckDB CTE twin; yields ``scd2`` with the same five columns."""
    return f"""scd2_ev AS (
      SELECT {key_col} AS key, {ts_col} AS ts, {value_col} AS value
      FROM {table}
    ),
    scd2_changed AS (
      SELECT key, ts, value FROM (
        SELECT *,
               lag(value) OVER (
                 PARTITION BY key ORDER BY ts, value NULLS FIRST) AS prev,
               row_number() OVER (
                 PARTITION BY key ORDER BY ts, value NULLS FIRST) AS rn
        FROM scd2_ev
      ) WHERE rn = 1 OR value IS DISTINCT FROM prev
    ),
    scd2 AS (
      SELECT key, value, ts AS valid_from,
             lead(ts) OVER (PARTITION BY key ORDER BY ts, value NULLS FIRST)
               AS valid_to,
             lead(ts) OVER (PARTITION BY key ORDER BY ts, value NULLS FIRST)
               IS NULL AS is_current
      FROM scd2_changed
    )"""
