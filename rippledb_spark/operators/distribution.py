"""Distribution window functions at scale: percent_rank / cume_dist
without a global single-partition window.

`Window.orderBy(...)` with no partitionBy moves every row to ONE task
(Spark warns "moving all data to a single partition") — fine on a
100-row dimension, a scale-killer on a fact table. This operator ships
the standard composition instead:

    1. approx-percentile cut-points on the order column (tiny driver
       scalar, becomes a literal in the plan — same pattern as IVF
       centroids in operators/similarity.py);
    2. bucket each row by cut-point (pure codegen comparison chain);
    3. one count per bucket → cumulative offsets (≤ n_buckets rows,
       computed on the driver, re-entering the plan as a literal map);
    4. row_number within each bucket's window + the bucket offset
       = the EXACT global rank; percent_rank/cume_dist are arithmetic.

Every bucket windows independently (parallelism = n_buckets, each
~1/n_buckets of the data regardless of value skew because the cuts are
quantiles), and the result is exact, not approximate — cut accuracy
only affects balance. Requires (value, *tiebreaks) to be a total order
(unique), which is also what makes the exact form deterministic.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_BUCKET = "__prb_bucket"


def bucketed_percent_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    n_buckets: int = 32,
    rank_col: str = "pct_rank",
    cume_col: str = "cume_dist",
) -> DataFrame:
    """Add exact ``percent_rank`` and ``cume_dist`` over the total order
    (value_col, *tiebreak_cols) without any single-partition window.

    Rows equal to a cut-point all land in the same (lower) bucket, so
    bucket assignment respects the value order even with duplicates of
    value_col; the tiebreaks only order within a bucket.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = df.select(
        F.percentile_approx(value_col, probs, 10000).alias("c")
    ).first()
    cuts = sorted(set(cuts_row["c"] or []))

    v = F.col(value_col)
    bucket = reduce(
        lambda acc, c: acc + F.when(v > F.lit(c), 1).otherwise(0),
        cuts,
        F.lit(0),
    ).cast("int")

    with_bucket = df.withColumn(_BUCKET, bucket)
    counts = {
        r[_BUCKET]: r["n"]
        for r in with_bucket.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_expr = (
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            ),
            F.col(_BUCKET),
        )
        if offsets
        else F.lit(0)
    )

    w = Window.partitionBy(_BUCKET).orderBy(value_col, *tiebreak_cols)
    rank = (F.row_number().over(w) + offset_expr).cast("bigint")
    denom = max(n_total - 1, 1)
    return (
        with_bucket.withColumn(rank_col, (rank - F.lit(1)) / F.lit(float(denom)))
        .withColumn(cume_col, rank / F.lit(float(n_total)))
        .drop(_BUCKET)
    )


def banded_range_count(
    df: DataFrame,
    value_col: str,
    radius: float,
    out_col: str = "n_in_band",
) -> DataFrame:
    """Count, for each row, the rows whose ``value_col`` lies within
    ``±radius`` — the numeric RANGE-frame window (`RANGE BETWEEN r
    PRECEDING AND r FOLLOWING`) without its global single-partition sort.

    Composition: band id = floor(value / radius); a value's ±radius
    neighborhood can only contain rows from its own band or the two
    adjacent bands, so each row joins exactly 3 band partitions of
    band-level COUNTS plus an in-band refinement. Implemented as an
    aggregate-then-join: per-band row multiset (value, count) is tiny
    relative to the data when values cluster (band cardinality =
    distinct values per band), and the join key is the band id — an
    equi-join Spark hash-partitions; nothing ever sorts globally.
    Exact for any distribution; skew in one band only grows that band's
    dictionary, not a single window partition.

    The final per-row regroup keys on ALL of ``df``'s columns, so the
    input must be row-unique (carry an id column); duplicate rows would
    collapse.
    """
    band = F.floor(F.col(value_col) / F.lit(float(radius))).cast("bigint")
    with_band = df.withColumn("__band", band)
    # distinct-value dictionary per band: (band, value) → count
    dict_df = (
        with_band.groupBy("__band", F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # each dictionary entry is probed by its own and both adjacent bands
    exploded = dict_df.select(
        F.explode(
            F.array(
                F.col("__band") - 1, F.col("__band"), F.col("__band") + 1
            )
        ).alias("__probe_band"),
        "__v",
        "__c",
    )
    joined = with_band.join(
        exploded, with_band["__band"] == exploded["__probe_band"], "left"
    )
    in_range = (
        (F.col("__v") >= F.col(value_col) - F.lit(float(radius)))
        & (F.col("__v") <= F.col(value_col) + F.lit(float(radius)))
    )
    group_cols = [F.col(c) for c in df.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.sum(F.when(in_range, F.col("__c")).otherwise(0))
            .cast("bigint")
            .alias(out_col)
        )
    )
