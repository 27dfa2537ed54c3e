"""Skew and co-location utilities for the 100 TB tier.

AQE (`spark.sql.adaptive.skewJoin.enabled`, on in our session factory)
splits oversized sort-merge partitions automatically at runtime — that is
the first line of defense and needs no code. The helpers here cover what
AQE does not:

- ``salted_join``: explicit N-way salt for a shuffle join whose hot keys
  are known to dwarf everything (AQE splits a partition, but a single
  monster KEY still lands in one task per split boundary);
- ``two_phase_agg``: pre-aggregate under a salt before the final combine,
  for aggregations whose group count is tiny but per-group volume is huge
  (partial aggregation already handles the map side; this also spreads the
  REDUCE side);
- ``bucketed_table``: persist with ``bucketBy`` so later equi-joins on the
  bucket key are exchange-free (co-located) — the storage-level analogue of
  the reference's per-predicate partitioning.

Salting never changes results — only placement — so these wrappers are
drop-in equivalents of the unsalted plans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def spread_for_compute(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition a small-bytes / CPU-heavy frame across the
    session's cores before iterative or per-row-expensive consumption
    (r15, guide §2.5).

    Bytes are the wrong proxy for work when per-row compute dominates:
    a sub-MiB corpus frame is one scan split (and AQE's byte-based
    coalescing collapses tiny shuffle outputs back to one partition),
    so every map pass over it — interpreted array-fold distances in a
    Lloyd round, Arrow decode kernels — serializes onto one core while
    the rest idle. An explicit keyed repartition at the frame's
    materialization boundary pins real parallelism: AQE respects
    user-specified partition counts, the exchange moves only the small
    frame itself, and placement is deterministic (hash on ``keys``).
    Scale-adaptive: ``defaultParallelism`` is the session's total core
    count under any master, so the driver's reduced-core bench run and
    a real cluster each get their own right number.

    Keyless call → round-robin ``repartition(n)``: safe here because
    (a) the input is a deterministic scan/checkpoint and Spark's
    sort-before-repartition (on by default, SPARK-23207) makes the
    row→partition assignment reproducible under task retry, and (b)
    every consumer below a keyless spread is an order-insensitive
    keyed aggregation, so placement cannot change values either way.
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    rows = _estimated_rows(df)
    if rows is not None:
        n = min(n, max(1, rows // _MIN_ROWS_PER_TASK))
    if n <= 1:
        return df
    if not keys:
        return df.repartition(n)
    return df.repartition(n, *[F.col(k) for k in keys])


# Measured on the fixture id projections (r16): the optimizer's
# sizeInBytes for a projected long-id frame runs ~23 stat-bytes/row.
_ID_STAT_BYTES_PER_ROW = 23
# Below this many estimated rows per task the exchange + per-task Python
# chain setup outweighs any kernel parallelism (≈ one light-kernel
# task's work; heavy kernels hit the same wall-clock floor ~50× earlier,
# so one shared conservative constant serves both). The r16 width sweep
# (multimodal.spread_media_ids docstring) pins the sf0.1 widths as
# already optimal — this gate exists to SKIP provably-pointless
# exchanges on sub-task inputs, not to retune widths.
_MIN_ROWS_PER_TASK = 48


def _estimated_rows(df: DataFrame) -> int | None:
    """Optimizer row estimate for a small keyed frame — metadata only,
    no job. None when the plan has no usable size estimate (the huge
    defaults LogicalRDD / checkpoint leaves report are treated as
    unknown, which keeps the full spread width)."""
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None
    if size <= 0 or size >= (1 << 40):
        return None
    return size // _ID_STAT_BYTES_PER_ROW


def _salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts) from a full-row hash —
    no RNG state, stable across retries (important for task re-execution)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side salted N ways and the RIGHT side
    replicated N times, shuffling on (key, salt): a hot key spreads across
    N tasks instead of one. Use when `right` is too big to broadcast and
    `left`'s key histogram has monster keys."""
    l_salted = left.withColumn("__salt", _salt(left, n_salts))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_salted.join(r_replicated, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase sum/count: groupBy(keys+salt) partial → groupBy(keys)
    final. ``sums`` maps value column → output alias; a __count phase pair
    rides along as ``n_rows``."""
    salt = _salt(df, n_salts)
    partial = df.groupBy(*keys, salt.alias("__salt")).agg(
        *[F.sum(c).alias(f"__p_{c}") for c in sums],
        F.count(F.lit(1)).alias("__p_n"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{c}").alias(alias) for c, alias in sums.items()],
        F.sum("__p_n").alias("n_rows"),
    )


def bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and optionally sorted) table and return
    the re-read handle. Joins/aggregations between tables bucketed the same
    way on the same key are EXCHANGE-FREE — the shuffle happened once at
    write time and is amortized over every later query."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
    return df.sparkSession.table(table_name)
