"""Distributed Lloyd k-means over embedding columns (engine tier, §2.4 —
the full-corpus trainer complementing similarity.ivf_topk's bounded-sample
quantizer fit; the reference has no vector surface at all).

Determinism contract (what makes the DuckDB oracle possible):

- init: the k lowest-id vectors, cluster ids 0..k-1 in id order — no RNG;
- assignment: squared L2 expanded as ``v·v − 2·v·c + c·c`` with every dot
  product a sequential left-to-right double fold (functions/vector.dot ≡
  DuckDB ``list_dot_product``), argmin tie-broken by cluster id;
- update: per-dimension mean ROUNDED to 6dp each round, so both engines
  re-enter the next round from bit-identical centroids (the same
  convention as the certified embedding_centroids query); an emptied
  cluster drops out (its id yields no further rows) rather than being
  re-seeded — re-seeding needs RNG, which would break the twin.
- iteration count is FIXED (no convergence test): the oracle is the same
  computation unrolled, and a data-dependent round count cannot unroll.

Scale shape: centroids are k×dims — always broadcast; one Lloyd round is
one broadcast-join assignment (no shuffle of the points), one
(cid, dim)-keyed mean (uniform: ≤ k×dims groups), and one k-row rollup.
The corpus is scanned once per round; a production loop would cache the
points DataFrame — left out here so the registered query stays a pure
plan (the driver re-runs it cold).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rippledb_spark.functions.vector import as_double_array, dot

ROUND_DP = 6


def _dist2(v, c):
    # v·v − 2·v·c + c·c, NOT Σ(x−y)²: DuckDB has no zip_with, so the twin
    # needs a list_dot_product-only expansion — Spark mirrors it exactly.
    return dot(v, v) - F.lit(2.0) * dot(v, c) + dot(c, c)


def kmeans_assignments(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """→ DataFrame(pid, cid, d2): final cluster assignment and squared
    distance for every input vector after ``iterations`` Lloyd rounds."""
    if k <= 0 or iterations <= 0:
        raise ValueError("k and iterations must be positive")
    pts = df.select(
        F.col(id_col).alias("pid"), as_double_array(vec_col).alias("v")
    )
    cents = (
        pts.orderBy("pid")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("pid")) - 1)
            .cast("bigint")
            .alias("cid"),
            F.col("v").alias("c"),
        )
    )

    def assign(cs: DataFrame) -> DataFrame:
        a = pts.crossJoin(F.broadcast(cs)).select(
            "pid",
            "v",
            "cid",
            _dist2(F.col("v"), F.col("c")).alias("d2"),
        )
        best = a.groupBy("pid").agg(
            F.min(F.struct("d2", "cid")).alias("m"), F.first("v").alias("v")
        )
        return best.select(
            "pid", "v", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2")
        )

    for _ in range(iterations - 1):
        assigned = assign(cents)
        cents = (
            assigned.select("cid", F.posexplode("v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.round(F.avg("x"), ROUND_DP).alias("x"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "x"))),
                    lambda s: s["x"],
                ).alias("c")
            )
        )
    return assign(cents).select("pid", "cid", "d2")


def kmeans_assignments_sql(
    table: str,
    vec_col: str,
    id_col: str,
    dims: int,
    k: int = 4,
    iterations: int = 2,
) -> str:
    """DuckDB CTE chain unrolling the identical Lloyd rounds; yields a
    relation ``km_final`` with columns (pid, cid, d2)."""
    if k <= 0 or iterations <= 0:
        raise ValueError("k and iterations must be positive")
    d2 = (
        "(list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.c)"
        " + list_dot_product(c.c, c.c))"
    )
    parts = [
        f"km_pts AS (SELECT {id_col} AS pid, CAST({vec_col} AS DOUBLE[]) AS v"
        f" FROM {table})",
        f"""km_c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY pid) - 1 AS BIGINT) AS cid,
             v AS c
      FROM (SELECT * FROM km_pts ORDER BY pid LIMIT {k})
    )""",
    ]
    prev_c = "km_c0"
    for r in range(1, iterations + 1):
        parts.append(
            f"""km_a{r} AS (
      SELECT pid, v, cid, d2 FROM (
        SELECT p.pid, p.v, c.cid, {d2} AS d2,
               row_number() OVER (PARTITION BY p.pid ORDER BY {d2}, c.cid)
                 AS rn
        FROM km_pts p, {prev_c} c
      ) WHERE rn = 1
    )"""
        )
        if r < iterations:
            parts.append(
                f"""km_c{r} AS (
      SELECT cid, list(x ORDER BY i) AS c FROM (
        SELECT cid, i, ROUND(AVG(v[i]), {ROUND_DP}) AS x
        FROM km_a{r}, generate_series(1, {dims}) AS s(i)
        GROUP BY cid, i
      ) GROUP BY cid
    )"""
            )
            prev_c = f"km_c{r}"
    parts.append(
        f"km_final AS (SELECT pid, cid, d2 FROM km_a{iterations})"
    )
    return ",\n    ".join(parts)
