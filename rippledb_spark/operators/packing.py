"""Sequence packing: assign rows to fixed token-budget packs.

Engine-tier operator (SURVEY §2.4 — the reference, a Rust triple store
at graph.rs:1-1027, has no pipeline tier). This is the pretraining
batch-construction op: greedy streaming bin packing where pack id =
floor(exclusive-running-token-total / budget), computed as ONE window
pass — no UDFs, no driver loop.

Scale shape: `n_shards > 1` sub-partitions each group by a hash of the
order column, bounding every window partition at ~1/n_shards of a
group. Partitioning by the group alone puts a dominant group (English
is routinely >40% of a pretraining mix) on ONE task at 100 TB; the
sharded form trades at most one under-filled pack per shard boundary —
the standard packing trade. `n_shards <= 1` keeps the classic
single-stream-per-group form for small/balanced groups.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def hash_shard(col: Column, n_shards: int) -> Column:
    """Deterministic shard in [0, n_shards) from the md5 prefix of a
    column's string form. md5 (not Spark's murmur3 ``hash``) so external
    engines (the DuckDB oracle twins) can compute the identical
    assignment; uniform regardless of key distribution, unlike `id % n`
    on clustered id ranges."""
    hex4 = F.substring(F.md5(col.cast("string")), 1, 4)
    return F.conv(hex4, 16, 10).cast("bigint") % n_shards


def pack_by_token_budget(
    df: DataFrame,
    token_col: str,
    order_col: str,
    group_cols: Sequence[str],
    budget: int,
    n_shards: int = 0,
) -> DataFrame:
    """Add `shard` and `pack_id` columns assigning each row to a pack of
    at most ~`budget` tokens within its group (pack boundaries fall on
    the running total crossing multiples of the budget).

    With n_shards <= 1 the shard column is constant 0 and each group is
    one stream (exact greedy packing, serial per group). With
    n_shards > 1 packing is per (group, shard) — bounded parallelism at
    the cost of ≤1 under-filled pack per shard.
    """
    if n_shards > 1:
        shard = hash_shard(F.col(order_col), n_shards)
    else:
        shard = F.lit(0).cast("bigint")
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy(*group_cols, "shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return out.withColumn(
        "pack_id", F.floor(cum_before / float(budget)).cast("bigint")
    )


def epoch_shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic epoch shuffle into shards (r9 — the global-shuffle
    step between mixture materialization and sequence packing: every
    epoch the corpus is re-ordered with a new seed so batches don't
    repeat, but the order must be REPRODUCIBLE across reruns, engines,
    and cluster sizes, so it is a pure hash order, not an RNG):
    shard = hash(seed, id) mod n_shards, position within the shard by
    (hash, id) order. → DataFrame(id, shard, pos). Changing ``seed``
    re-deals both assignments; identical inputs always re-shuffle
    identically.

    Scale shape: one projection + one shard-keyed window — each window
    partition is ~corpus/n_shards (pick n_shards ≥ cluster parallelism;
    the production writer emits one output file per shard). No global
    ordering anywhere: position is PER SHARD, which is all a shard-file
    writer needs."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(str(seed)), F.col(id_col).cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("__h")
    )
    base = df.select(F.col(id_col).alias("id"), h)
    w = Window.partitionBy("shard").orderBy("__h", "id")
    return (
        base.withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("id", "shard", "pos")
    )


def epoch_shuffle_sql(
    table: str, id_col: str, n_shards: int, seed: int = 0
) -> str:
    """DuckDB CTE twin of :func:`epoch_shuffle_shards`; yields
    ``epoch_shuffle`` with the same three columns."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = (
        f"CAST(('0x' || substr(md5('{seed}' || '|' ||"
        f" CAST({id_col} AS VARCHAR)), 1, 12)) AS BIGINT)"
    )
    return f"""es_h AS (
      SELECT {id_col} AS id, {h} AS h FROM {table}
    ),
    epoch_shuffle AS (
      SELECT id,
             CAST(h % {n_shards} AS INT) AS shard,
             CAST(row_number() OVER (
               PARTITION BY h % {n_shards} ORDER BY h, id) AS BIGINT)
               AS pos
      FROM es_h
    )"""
