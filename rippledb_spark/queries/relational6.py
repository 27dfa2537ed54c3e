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


_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "asof_nearest_error_to_click",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id,
           e.user_id,
           strftime(e.ts, '{_FMT_DUCK}') AS error_ts,
           CASE WHEN b.event_id IS NOT NULL AND (
                  f.event_id IS NULL
                  OR epoch_us(e.ts) - epoch_us(b.ts) <= epoch_us(f.ts) - epoch_us(e.ts)
                ) THEN b.event_id ELSE f.event_id
           END AS near_click_id_asof
    FROM errors e
    LEFT JOIN LATERAL (
      SELECT event_id, ts FROM clicks c
      WHERE c.user_id = e.user_id AND c.ts <= e.ts
      ORDER BY c.ts DESC LIMIT 1
    ) b ON TRUE
    LEFT JOIN LATERAL (
      SELECT event_id, ts FROM clicks c
      WHERE c.user_id = e.user_id AND c.ts >= e.ts
      ORDER BY c.ts ASC LIMIT 1
    ) f ON TRUE
    ORDER BY e.event_id
    """,
)
def asof_nearest_error_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (merge_asof direction='nearest'): each error
    matched to the user's click with the smallest absolute time gap,
    ties preferring the earlier (backward) click. One shuffle carries
    both the backward and forward fills (two sorts over the same
    Exchange — operators/asof.py); the oracle reconstructs the same
    choice from two LATERAL probes and a gap comparison."""
    from pyspark.sql import Window

    from rippledb_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("near_click_id")
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("near_click_id"))
    clicks = (
        clicks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["near_click_id"], direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT_SPARK).alias("error_ts"),
        F.col("near_click_id_asof"),
    ).orderBy("event_id")


@query(
    "asof_strict_error_to_click",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id,
           e.user_id,
           strftime(e.ts, '{_FMT_DUCK}') AS error_ts,
           b.event_id AS prev_click_id_asof
    FROM errors e
    LEFT JOIN LATERAL (
      SELECT event_id FROM clicks c
      WHERE c.user_id = e.user_id AND c.ts < e.ts
      ORDER BY c.ts DESC LIMIT 1
    ) b ON TRUE
    ORDER BY e.event_id
    """,
)
def asof_strict_error_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT backward as-of (merge_asof allow_exact_matches=False): the
    latest click strictly BEFORE each error — an equal-timestamp click is
    invisible. Same single-shuffle plan; strictness lives entirely in the
    union's tie-break sort order (operators/asof.py), so the oracle's
    '<' LATERAL probe is the exact twin."""
    from pyspark.sql import Window

    from rippledb_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("prev_click_id")
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("prev_click_id"))
    clicks = (
        clicks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["prev_click_id"], allow_exact_matches=False,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT_SPARK).alias("error_ts"),
        F.col("prev_click_id_asof"),
    ).orderBy("event_id")
