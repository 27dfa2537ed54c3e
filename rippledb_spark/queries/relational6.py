"""CDC / slowly-changing-dimension queries (operators.cdc) — the ordered-
change-feed tier on top of the snapshot DML the engine already has
(operators.merge; the reference's DML is single-triple insert/remove,
src/datastore/graph.rs:414-629)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.operators.cdc import apply_changes, scd2, _latest
from rippledb_spark.registry import query
from rippledb_spark.tables import load

# Mid-range cutoff splitting the events feed into "snapshot so far" and
# "incoming changes" (events span 2024-01-01..2024-01-30).
_CUT = "2024-01-16 00:00:00"


@query(
    "cdc_latest_user_state",
    oracle=f"""
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           value AS last_value
    FROM (SELECT user_id, event_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
)
def cdc_latest_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC fold: the pre-cutoff feed collapses into a snapshot,
    then the post-cutoff feed applies as changes (op = event_type, 'error'
    acting as the delete op). The two-phase fold is associative, so the
    oracle is the single global latest-per-key QUALIFY — exactly the
    invariant that makes incremental CDC application safe: applying a
    day's changes to yesterday's snapshot must equal re-folding history.
    One shuffle per phase on user_id; the snapshot join is key-equi."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    before = e.filter(F.col("ts") < F.lit(_CUT))
    after = e.filter(F.col("ts") >= F.lit(_CUT))
    snapshot = (
        _latest(before, ["user_id"], ["ts", "event_id"])
        .filter(F.col("event_type") != "error")
        .drop("ts")
    )
    folded = apply_changes(
        snapshot,
        after.withColumnRenamed("ts", "__seq_ts").withColumn(
            "op", F.col("event_type")
        ),
        keys=["user_id"],
        sequence_cols=["__seq_ts", "event_id"],
        op_col="op",
        delete_op="error",
    )
    return folded.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    ).orderBy("user_id")


@query(
    "scd2_purchase_history",
    oracle="""
    SELECT user_id, event_id, value, valid_from,
           valid_to, version, is_current
    FROM (SELECT user_id, event_id, value,
                 ts AS valid_from,
                 LEAD(ts) OVER w AS valid_to,
                 ROW_NUMBER() OVER w AS version,
                 LEAD(ts) OVER w IS NULL AS is_current
          FROM events
          WHERE event_type = 'purchase'
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    ORDER BY user_id, version
    """,
)
def scd2_purchase_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 expansion of the purchase feed: per user, every purchase
    becomes a version row with a half-open [valid_from, valid_to) validity
    interval and an is_current flag — the standard warehouse dimension-
    history shape, as one window pass (one shuffle on user_id)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    hist = scd2(
        e.select("user_id", "event_id", "value", "ts"),
        keys=["user_id"],
        sequence_col="ts",
        tiebreakers=["event_id"],
    )
    return hist.select(
        "user_id", "event_id", "value", "valid_from", "valid_to", "version",
        "is_current",
    ).orderBy("user_id", "version")
