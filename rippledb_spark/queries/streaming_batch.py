"""Batch-equivalent forms of the streaming operators, oracle-checked.

Structured Streaming plans can't run under the driver's DuckDB comparison,
so each streaming operator in rippledb_spark.streaming has a batch twin here
computing the IDENTICAL result on the static events table: tumbling window,
sliding window, session windows (gap-based), stream dedup. The live
streaming forms of the same operators are exercised in
tests/test_streaming.py with a file-source → memory-sink harness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from rippledb_spark.registry import query
from rippledb_spark.tables import load

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "window_tumbling_events",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{_FMT_DUCK}') AS window_start,
           event_type,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def window_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type (streaming twin:
    streaming.windows.tumbling_counts with a watermark)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "window_sliding_events",
    oracle=f"""
    WITH starts AS (
      SELECT TIMESTAMP '1970-01-01 00:00:00'
               + (FLOOR(epoch(ts) / 1800) * 1800)::BIGINT * INTERVAL 1 SECOND AS w0,
             ts, value
      FROM events
    ),
    expanded AS (
      SELECT w0 AS wstart, value FROM starts
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTE, value FROM starts
    )
    SELECT strftime(wstart, '{_FMT_DUCK}') AS window_start,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM expanded
    GROUP BY 1
    ORDER BY 1
    """,
)
def window_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min — each event lands in 2 windows.
    (DuckDB twin expands the two covering windows explicitly.)"""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


@query(
    "sessionize_events",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    tagged AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM ordered
    )
    SELECT user_id,
           CAST(MAX(session_seq) AS BIGINT) AS n_sessions,
           COUNT(*)                         AS n_events
    FROM tagged
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) via lag + running
    sum — the batch twin of streaming session_window aggregation."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (NTZ can't cast to double; timestampdiff at
    # MICROSECOND keeps the strict >30min test aligned with DuckDB's
    # INTERVAL comparison on sub-second timestamps)
    with_prev = e.withColumn("prev_ts", F.lag("ts").over(w))
    new_session = F.when(
        F.col("prev_ts").isNull()
        | (F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    tagged = with_prev.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        tagged.groupBy("user_id")
        .agg(
            F.max("session_seq").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "stream_dedup_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_first_per_minute
    FROM (
      SELECT event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type, date_trunc('minute', ts)
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of dropDuplicatesWithinWatermark-style dedup: first event
    per (user, type, minute) bucket."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("minute", "ts")
    ).orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_first_per_minute"))
        .orderBy("event_type")
    )


@query(
    "interval_join_error_clicks",
    oracle=f"""
    SELECT e.event_id AS error_id,
           c.event_id AS click_id,
           e.user_id,
           strftime(e.ts, '{_FMT_DUCK}') AS error_ts,
           strftime(c.ts, '{_FMT_DUCK}') AS click_ts
    FROM events e
    JOIN events c
      ON e.user_id = c.user_id
     AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error' AND c.event_type = 'click'
    ORDER BY error_id, click_id
    """,
)
def interval_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAM-STREAM interval join
    (streaming.windows.error_click_followups): per error, the same user's
    clicks within the following 10 minutes. The equi key (user_id) drives a
    hash/SMJ join with the time bounds as residual — NOT a broadcast nested
    loop; in the streaming form the same bounds are what expire join
    state."""
    e = load(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        errors.join(
            clicks,
            (F.col("e_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("e_ts"))
            & (F.col("c_ts") <= F.col("e_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            "error_id",
            "click_id",
            F.col("e_user").alias("user_id"),
            F.date_format("e_ts", _FMT_SPARK).alias("error_ts"),
            F.date_format("c_ts", _FMT_SPARK).alias("click_ts"),
        )
        .orderBy("error_id", "click_id")
    )


@query(
    "window_topk_users",
    oracle=f"""
    WITH totals AS (
      SELECT strftime(date_trunc('hour', ts), '{_FMT_DUCK}') AS window_start,
             user_id,
             ROUND(SUM(value), 2) AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, user_id, total_value, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT window_start, user_id, total_value,
             ROW_NUMBER() OVER (PARTITION BY window_start
                                ORDER BY total_value DESC, user_id) AS rnk
      FROM totals
    ) WHERE rnk <= 3
    ORDER BY window_start, rnk
    """,
)
def window_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by value per 1-hour tumbling window — the batch twin of
    streaming.windows.start_windowed_topk_sink (watermarked update-mode
    aggregation + foreachBatch merge-and-rank; live form in
    tests/test_streaming.py). The rank window partitions by the same key
    the aggregation shuffled on, so no extra exchange."""
    e = load(spark, sf_dir, "events")
    totals = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "user_id",
            "total_value",
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return (
        totals.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .orderBy("window_start", "rnk")
    )


@query(
    "event_transition_shortest_paths",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
             date_diff('microsecond',
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events
    ),
    edges AS (
      SELECT prev_type AS src, event_type AS dst,
             CAST(MIN(gap_us) AS DOUBLE) AS w
      FROM ordered
      WHERE prev_type IS NOT NULL AND event_type <> prev_type
      GROUP BY 1, 2
    ),
    walk AS (
      SELECT 'signup' AS node, CAST(0 AS DOUBLE) AS dist, 0 AS iter
      UNION ALL
      SELECT e.dst, d.dist + e.w, d.iter + 1
      FROM walk d JOIN edges e ON e.src = d.node
      WHERE d.iter < 6
    )
    SELECT node, MIN(dist) AS dist_us
    FROM walk GROUP BY node ORDER BY node
    """,
)
def event_transition_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths (graph.shortest_paths, r6) over the
    event-type TRANSITION graph: per-user lag derives (prev_type →
    event_type) transitions with their microsecond gap, the corpus-scale
    pass aggregates the MIN gap per ordered type pair (one window + one
    hash-agg over all events), and Bellman-Ford relaxation then finds the
    minimal cumulative transition time from 'signup' to every event type.
    The oracle recomputes the same edges and walks all ≤6-hop paths in a
    recursive CTE (5 node types → shortest simple paths fit). Frontier
    relaxation quits at the exact fixpoint; the closure runs on the tiny
    derived graph while the heavy derivation stays one scan-shaped pass."""
    from rippledb_spark.operators.graph import shortest_paths

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("event_type") != F.col("prev_type"))
        )
        .groupBy(
            F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
        )
        .agg(
            F.min(F.expr("timestampdiff(MICROSECOND, prev_ts, ts)"))
            .cast("double")
            .alias("w")
        )
    )
    return (
        shortest_paths(trans, ["signup"])
        .select("node", F.col("dist").alias("dist_us"))
        .orderBy("node")
    )
