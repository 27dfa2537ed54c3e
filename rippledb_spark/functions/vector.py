"""Embedding/vector math over ``array<float>`` columns — JVM-side.

Dot products and cosine use ``zip_with`` + ``aggregate`` (sequential
left-to-right double accumulation), with elements cast to double FIRST so
both engines do the same double-precision arithmetic (float32-accumulated
sums would diverge from the DuckDB oracle in the 7th digit).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product — matches DuckDB's list_dot_product
    evaluation order so results round-trip bit-close (round at 6dp)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin: same formula shape (dot / (sqrt·sqrt)), double inputs."""
    da, db = f"CAST({a} AS DOUBLE[])", f"CAST({b} AS DOUBLE[])"
    return (
        f"(list_dot_product({da}, {db}) / "
        f"(sqrt(list_dot_product({da}, {da})) * sqrt(list_dot_product({db}, {db}))))"
    )
