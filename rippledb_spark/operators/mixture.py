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
