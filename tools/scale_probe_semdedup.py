"""Scaling probe for SemDeDup semantic dedup (operators/semdedup.py).

Claims for docs/SCALING.md:

1. **The quadratic path is closed** — with k chosen so the expected
   cluster size stays ~constant (k ∝ N, the paper's operating point),
   the candidate space Σ c_i·(c_i−1)/2 grows LINEARLY in N while the
   corpus-wide all-pairs space grows as N²/2: the printed collapse
   ratio should widen ~linearly with the sweep multiplier.
2. **Blocking keeps recall** — planted near-identical twins (cosine
   ≈ 1) land in the same cluster (they are ε-close in the metric the
   clustering partitions by), so the within-cluster gate still finds
   them: planted-pair recall must be ≥ 99% at every scale.

Run: python tools/scale_probe_semdedup.py [base_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.clustering import kmeans_assignments
from rippledb_spark.operators.semdedup import semantic_dedup_pairs, unit_vectors
from rippledb_spark.session import get_spark

DIMS = 8
CLUSTER_SIZE = 125  # held constant: k = ceil(N / CLUSTER_SIZE)


def corpus(spark, n: int):
    """n deterministic base vectors (ids 0..n-1) + one ε-perturbed twin of
    every 10th base vector (ids n..n+n/10-1, twin of (id-n)*10)."""
    base = spark.range(n).selectExpr("id AS vid", "id AS base")
    twins = spark.range(n // 10).selectExpr(
        f"id + {n} AS vid", "id * 10 AS base"
    )
    pts = base.unionByName(twins).selectExpr(
        "vid",
        "transform(sequence(0, %d), d -> CAST(cos(base * 1.7 + d * 0.9)"
        " + (CASE WHEN vid >= %d AND d = 0 THEN 0.0005 ELSE 0.0 END)"
        " AS FLOAT)) AS vec" % (DIMS - 1, n),
    )
    return pts


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    if base_n < 10:
        raise SystemExit("base_n must be >= 10 (one twin per 10 base vectors)")
    spark = get_spark(app_name="scale_probe_semdedup")

    for mult in (1, 4):
        n = base_n * mult
        k = -(-n // CLUSTER_SIZE)
        pts = corpus(spark, n).persist()
        total = pts.count()
        t0 = time.perf_counter()
        # cluster the UNIT vectors — the shipped configuration (spherical
        # blocking); clustering raw vectors here would certify a blocking
        # the operator no longer uses
        unit = unit_vectors(pts, "vec", "vid").persist()
        assigned = kmeans_assignments(unit, "v", "pid", k=k, iterations=2)
        assigned = assigned.persist()
        sizes = assigned.groupBy("cid").count()
        cand = sizes.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c")
        ).collect()[0]["c"]
        pairs = semantic_dedup_pairs(
            pts, "vec", "vid", k=k, threshold=0.999, assigned=assigned, pts=unit
        )
        found = {
            (r["id_a"], r["id_b"])
            for r in pairs.select("id_a", "id_b").collect()
        }
        wall = time.perf_counter() - t0
        planted = {(i * 10, n + i) for i in range(n // 10)}
        recall = len(planted & found) / len(planted)
        all_pairs = total * (total - 1) / 2
        print(
            f"  n={total:6d} k={k:3d}: candidates={int(cand)}"
            f" (all-pairs {int(all_pairs)}, collapse {all_pairs / cand:.0f}x)"
            f" planted-recall={recall:.3f} wall={wall:.2f}s"
        )
        assert recall >= 0.99, recall
        assert cand < all_pairs / 10, (cand, all_pairs)
        pts.unpersist(blocking=False)
        unit.unpersist(blocking=False)
        assigned.unpersist(blocking=False)


if __name__ == "__main__":
    main()
