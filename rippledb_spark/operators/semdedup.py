"""SemDeDup-style semantic deduplication over embedding columns.

Published method (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): k-means
cluster the corpus embeddings, then mark as near-duplicates the pairs
INSIDE each cluster whose cosine similarity clears a threshold — the
clustering bounds the candidate space so the quadratic all-pairs step never
runs corpus-wide. The engine tier has no reference analogue (the reference
has no vector surface at all); this composes the deterministic Lloyd
trainer (operators/clustering.py) with the JVM-side cosine kernel
(functions/vector.py).

Determinism contract (what makes the DuckDB oracle possible):

- clustering: operators/clustering.kmeans_assignments — lowest-id init,
  expanded-dot-product distances, 6dp centroid rounding per round, fixed
  iteration count (its module docstring is the full contract);
- pair gate: each row's L2 norm is computed ONCE and carried as a
  column, so the per-pair cosine dot(a,b)/(nrm_a·nrm_b) costs a single
  sequential-fold dot product — one fold per pair instead of three, the
  identical arithmetic (same formula shape both engines); the result is
  ROUNDED to 6dp before the threshold comparison, so a 1-ulp engine
  difference cannot flip membership;
- keep policy: within a duplicate pair the LOWER id survives — a vector is
  "removed" iff some lower-id same-cluster vector sits within the
  threshold (the same min-id convention as operators/dedup.exact_dedup).
  The paper keeps the point farthest from the centroid; that tie-breaks on
  float distance ordering, which is not stable across engines, so the
  id convention is the deterministic stand-in.

Scale shape (100 TB): the clustering pass is the scale lever — production
picks k proportional to corpus size (the paper uses ~10k-100k clusters for
LAION-scale data) so the EXPECTED cluster size, and therefore the per-key
join fan-out of the within-cluster self-join, stays constant as the corpus
grows. The self-join shuffles (pid, cid, v) once on cid; AQE skew-join
splitting handles an oversized cluster. Nothing here is corpus-wide
all-pairs, and nothing collects to the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rippledb_spark.functions.vector import as_double_array, dot, norm
from rippledb_spark.operators.clustering import (
    kmeans_assignments,
    kmeans_assignments_sql,
)

COS_DP = 6


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 4,
    iterations: int = 2,
    threshold: float = 0.35,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """→ DataFrame(cid, id_a, id_b, cos_sim): within-cluster near-duplicate
    pairs (id_a < id_b, 6dp-rounded cosine ≥ threshold).

    ``assigned`` lets a caller reuse one clustering pass (typically a
    cached ``kmeans_assignments`` result) across the pairs and flags
    views instead of re-training per view.
    """
    pts = df.select(
        F.col(id_col).alias("pid"), as_double_array(vec_col).alias("v")
    ).select("pid", "v", norm(F.col("v")).alias("nrm"))
    if assigned is None:
        assigned = kmeans_assignments(
            df, vec_col, id_col, k=k, iterations=iterations
        )
    tagged = assigned.select("pid", "cid").join(pts, "pid")
    a = tagged.select(
        F.col("cid"),
        F.col("pid").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = tagged.select(
        F.col("cid"),
        F.col("pid").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "cid",
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                COS_DP,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= F.lit(threshold))
    )


def semantic_dedup_flags(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 4,
    iterations: int = 2,
    threshold: float = 0.35,
    assigned: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """→ DataFrame(pid, cid, is_dup): every input vector with its cluster
    and whether the keep-lowest-id policy removes it. ``assigned`` /
    ``pairs`` reuse an already-built clustering / pair view."""
    if assigned is None:
        assigned = kmeans_assignments(
            df, vec_col, id_col, k=k, iterations=iterations
        )
    if pairs is None:
        pairs = semantic_dedup_pairs(
            df,
            vec_col,
            id_col,
            k=k,
            iterations=iterations,
            threshold=threshold,
            assigned=assigned,
        )
    removed = (
        pairs.select(F.col("id_b").alias("pid"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        assigned.select("pid", "cid")
        .join(removed, "pid", "left")
        .select("pid", "cid", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
    )


def semantic_dedup_sql(
    table: str,
    vec_col: str,
    id_col: str,
    dims: int,
    k: int = 4,
    iterations: int = 2,
    threshold: float = 0.35,
) -> str:
    """DuckDB CTE chain twin; yields relations ``sd_pairs`` (cid, id_a,
    id_b, cos_sim) and ``sd_flags`` (pid, cid, is_dup)."""
    km = kmeans_assignments_sql(
        table, vec_col, id_col, dims=dims, k=k, iterations=iterations
    )
    cos = "(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm))"
    return f"""{km},
    sd_nrm AS (
      SELECT pid, v, sqrt(list_dot_product(v, v)) AS nrm FROM km_pts
    ),
    sd_pairs AS (
      SELECT cid, id_a, id_b, cos_sim FROM (
        SELECT a.cid, a.pid AS id_a, b.pid AS id_b,
               ROUND({cos}, {COS_DP}) AS cos_sim
        FROM km_final a
        JOIN km_final b ON a.cid = b.cid AND a.pid < b.pid
        JOIN sd_nrm va ON va.pid = a.pid
        JOIN sd_nrm vb ON vb.pid = b.pid
      ) WHERE cos_sim >= {threshold}
    ),
    sd_flags AS (
      SELECT f.pid, f.cid,
             (f.pid IN (SELECT id_b FROM sd_pairs)) AS is_dup
      FROM km_final f
    )"""
