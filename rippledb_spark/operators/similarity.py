"""Similarity search over embedding columns (``array<float>``).

Two tiers per the scale brief:

- brute-force cosine top-k — the exactness baseline; a broadcast of the
  query vector(s) against a full scan. Fine up to millions of vectors per
  executor-core-second; the oracle-checkable tier.
- LSH (signed random projections) — deterministic hyperplanes from a seeded
  RNG, bucket by sign bits, search only within the probe's bucket(s). The
  scale path: the self-join meets only within buckets.

All vector math goes through functions.vector (JVM expressions, double
precision); hyperplanes are embedded as literal arrays — broadcast with the
plan, no driver-side state.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from rippledb_spark.functions import vector as V


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine against a single query vector (1-row DataFrame with
    ``q`` array column). Returns (vec_id, cos_sim) rounded 6dp, ties broken
    by id. The crossJoin broadcasts the single-row side."""
    e = embeddings.select(
        F.col(id_col), V.as_double_array(vec_col).alias("__e")
    ).crossJoin(F.broadcast(query_vec.select(V.as_double_array("q").alias("__q"))))
    return (
        e.select(
            id_col,
            F.round(V.cosine(F.col("__e"), F.col("__q")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from literal hyperplanes (no shuffle, no UDF)."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(V.dot(vec_col, lit_plane) >= 0, F.lit(2**i)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("bigint")
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    At 100 TB the bucketing column is precomputed and the table is
    partitioned/bucketed by it, so a probe touches one partition; here the
    bucket expression evaluates inline in one scan.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    e = embeddings.select(
        F.col(id_col),
        V.as_double_array(vec_col).alias("__e"),
    ).withColumn("__bucket", lsh_bucket(F.col("__e"), planes))
    q = query_vec.select(V.as_double_array("q").alias("__q")).withColumn(
        "__bucket", lsh_bucket(F.col("__q"), planes)
    )
    return (
        e.join(F.broadcast(q), on="__bucket")
        .select(
            id_col,
            F.round(V.cosine(F.col("__e"), F.col("__q")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def blocked_top1_pairs(
    embeddings: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For every vector: its nearest neighbor WITHIN its block (embedding
    near-dup shape). The self-join meets only within blocks — the same
    candidate-limiting idea as LSH, using a semantic blocking key."""
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col), F.col(block_col).alias("__block"), V.as_double_array(vec_col).alias("__e")
    )
    a = base.toDF("id_a", "__block", "e_a")
    b = base.toDF("id_b", "__block", "e_b")
    pairs = (
        a.join(b, "__block")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(V.cosine(F.col("e_a"), F.col("e_b")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos_sim"), F.asc("id_b"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id_a", "id_b", "cos_sim")
    )
