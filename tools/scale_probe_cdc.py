"""Scaling probe for apply_changes (perf tooling).

Claim in operators/cdc.py: the latest-change winner is a map-side-
combinable max_by aggregation, so a HOT KEY contributes one candidate row
per task to the shuffle rather than its whole history. The probe builds a
change feed where ONE key owns 95% of all changes, folds it with (a) the
max_by aggregation and (b) the row_number-window formulation it replaced,
and prints each plan's total shuffled RECORDS (Spark UI REST; bytes are
compression-dominated on synthetic data) and wall time.

Measured finding (local[32], 2M rows): BOTH ship ~100k records — Spark
4's WindowGroupLimit rewrite map-side-prunes a rank()==1 filter before
the shuffle, so the window form is no longer the naive full-history
shuffle. The aggregation keeps a modest wall-time edge by skipping the
per-key sort, and degrades more gracefully where WindowGroupLimit cannot
apply (e.g. filters the rewrite does not recognize).
Run: python tools/scale_probe_cdc.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from rippledb_spark.operators.cdc import _latest
from rippledb_spark.session import get_spark


def shuffle_write_records(ui_port: int = 4040) -> int:
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10))
    return sum(s.get("shuffleWriteRecords", 0) for s in stages)


def window_latest(changes, keys, sequence_cols):
    """The formulation _latest replaced — for comparison only."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in sequence_cols])
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(
        app_name="scale_probe_cdc", extra_conf={"spark.ui.enabled": "true"}
    )
    # 95% of changes hit key 0; the rest spread over 100k keys.
    feed = spark.range(n).select(
        F.when(F.rand(seed=7) < 0.95, F.lit(0))
        .otherwise((F.pmod(F.col("id"), F.lit(100_000)) + 1))
        .alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") * 3).alias("payload"),
    ).persist()
    feed.count()

    for name, fn in (("max_by agg", _latest), ("row_number window", window_latest)):
        before = shuffle_write_records()
        t0 = time.perf_counter()
        out = fn(feed, ["k"], ["seq"])
        rows = out.count()
        wall = time.perf_counter() - t0
        delta = shuffle_write_records() - before
        print(f"{name:18s}: {rows} winners, {wall:6.2f}s, shuffled {delta:>10,} records")

    feed.unpersist()


if __name__ == "__main__":
    main()
