"""Fractional-epoch mixture application: materialize a data-mix weight
as row REPETITION, the upsampling half of the mixture loop.

Published practice (e.g. GPT-3's dataset table, Brown et al. 2020 §2.2,
and the LLaMA pre-training mix, Touvron et al. 2023 Table 1): each source
gets a target number of EPOCHS — possibly fractional, possibly > 1 — and
the loader repeats or subsamples the source to hit it. This operator is
the batch form: a row with weight w is emitted floor(w) times, plus one
extra copy when a deterministic hash fraction of its id falls below
frac(w). Weights < 1 degenerate to the keep-test (floor = 0), so one
formula covers downsampling AND upsampling; the md5-fraction convention
is the same as rebalance_sample_applied / train_test_split (no RNG —
membership is a pure function of id and weight, reproducible across
runs, engines, and cluster sizes).

Scale shape (100 TB): a pure projection + explode — no shuffle, no UDF,
no driver state. Output inflation per task is bounded by the mix's max
epoch count (published mixes stay under ~4); the explode preserves the
input partitioning, so downstream shuffles see the repeated rows as
ordinary data. Nothing collects.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# md5-hex first 6 digits as a fraction of 16^6 — the shared convention
_HASH_DEN = 16777216.0


def _hash_frac(id_col: str):
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        / F.lit(_HASH_DEN)
    )


def apply_mixture_epochs(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    copy_col: str = "epoch_idx",
) -> DataFrame:
    """Repeat every row ``floor(w)`` times plus one extra copy when the
    id's md5 fraction < ``frac(w)``; ``copy_col`` numbers the copies
    0..n-1. Rows whose copy count is 0 vanish (the downsample case)."""
    w = F.col(weight_col)
    n = (
        F.floor(w).cast("int")
        + F.when(_hash_frac(id_col) < (w - F.floor(w)), 1).otherwise(0)
    )
    # sequence(0, -1) would generate a DESCENDING [0, -1] — gate on n > 0
    # and emit an empty array so the explode drops the row instead.
    copies = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(copies))


def temperature_mixture_weights(
    df: DataFrame,
    count_col: str,
    key_col: str,
    alpha: float = 0.7,
    budget: float = 1.0,
    round_dp: int = 6,
) -> DataFrame:
    """Temperature-based mixture weights — the multilingual-LM sampling
    recipe (Conneau et al. 2020 §3.1 / the mC4 mixing rule): source i
    with ``n_i`` rows gets sampling probability p_i ∝ n_i^α, and the
    per-source EPOCH weight that realizes p under a ``budget``-row total
    is budget·p_i / n_i. α < 1 flattens the head (big sources downweight
    per-row, small languages upsample) — exactly the knob the published
    mixes turn. → DataFrame(source, n_rows, p, epochs); p and epochs
    round to ``round_dp`` so downstream hash-gate comparisons
    (apply_mixture_epochs) see bit-identical weights in both engines.

    Scale shape: input is the per-source count table (tiny by nature —
    one row per source); one broadcast of the 1-row normalizer."""
    if alpha < 0:
        raise ValueError("alpha must be non-negative")
    t = df.select(
        F.col(key_col).alias("source"),
        F.col(count_col).cast("double").alias("n"),
    ).withColumn("__x", F.pow("n", F.lit(float(alpha))))
    tot = t.agg(F.sum("__x").alias("__t"))
    return t.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("__x") / F.col("__t"), round_dp).alias("p"),
        F.round(
            F.lit(float(budget)) * (F.col("__x") / F.col("__t")) / F.col("n"),
            round_dp,
        ).alias("epochs"),
    )


def temperature_mixture_sql(
    counts_rel: str,
    count_col: str,
    key_col: str,
    alpha: float = 0.7,
    budget: float = 1.0,
    round_dp: int = 6,
) -> str:
    """DuckDB CTE twin of :func:`temperature_mixture_weights`; yields
    ``temp_mix`` with the same four columns."""
    if alpha < 0:
        raise ValueError("alpha must be non-negative")
    return f"""tm_x AS (
      SELECT {key_col} AS source,
             CAST({count_col} AS DOUBLE) AS n,
             POW(CAST({count_col} AS DOUBLE), {float(alpha)}) AS x
      FROM {counts_rel}
    ),
    tm_t AS (SELECT SUM(x) AS t FROM tm_x),
    temp_mix AS (
      SELECT source,
             CAST(n AS BIGINT) AS n_rows,
             ROUND(x / t, {round_dp}) AS p,
             ROUND({float(budget)} * (x / t) / n, {round_dp}) AS epochs
      FROM tm_x, tm_t
    )"""


def mixture_epochs_sql(
    weight_expr: str, id_expr: str, n_alias: str = "n_copies"
) -> str:
    """DuckDB twin of the copy-count expression (generate_series(1, n)
    replays the explode; series of an empty range emits no rows)."""
    frac = (
        f"(CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 6))"
        f" AS BIGINT) / {_HASH_DEN})"
    )
    return (
        f"(CAST(FLOOR({weight_expr}) AS INT) + CASE WHEN {frac} <"
        f" ({weight_expr} - FLOOR({weight_expr})) THEN 1 ELSE 0 END)"
        f" AS {n_alias}"
    )
