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


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization — the 8× storage shrink a
    100 TB embedding store applies before PQ/ANN: scale = max|x|/127,
    q_i = HALF_UP-round(x_i/scale) ∈ [−127, 127]; a zero vector (scale
    0) quantizes to all zeros. Returns struct(scale double,
    q array<int>). Deterministic across engines: max, divide, and
    HALF_UP round are the same double arithmetic DuckDB's list_max /
    ROUND perform (the module's usual twin contract)."""
    v = vec
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(scale == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round(x / scale, 0).cast("int"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def quantize_int8_sql(vec: str) -> str:
    """DuckDB twin of :func:`quantize_int8`: yields columns ``scale``
    and ``q`` when SELECTed as ``{expr} AS s`` then ``s.scale, s.q`` —
    emitted here as the two expressions (scale_expr, q_expr)."""
    dv = f"CAST({vec} AS DOUBLE[])"
    scale = f"(list_max(list_transform({dv}, x -> abs(x))) / 127.0)"
    q = (
        f"CASE WHEN {scale} = 0"
        f" THEN list_transform({dv}, x -> 0)"
        f" ELSE list_transform({dv}, x -> CAST(ROUND(x / {scale}, 0) AS INT))"
        f" END"
    )
    return f"{scale} AS scale, {q} AS q"
