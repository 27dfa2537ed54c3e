"""Scaling probe for the property-path transitive closure (perf tooling).

Two claims in docs/SCALING.md to verify empirically:

1. **Rounds follow diameter, not data volume** — 10× the edges at the
   same depth must NOT change the round count, and per-round cost must
   grow ~linearly (semi-naive: frontier×degree, never
   accumulated-pairs×edges).
2. **Seeding bounds work** — a closure seeded from a small source set
   must beat the global closure on the same graph.

The probe builds a layered DAG (depth D, W nodes per layer, fan-out 2 —
closure size ≈ W·D·avg-reach, diameter D) at 1× and 10× width, runs
``(edge)+`` globally and seeded, and prints wall / rounds / output pairs.
Run: python tools/scale_probe_paths.py [depth] [width]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.plans.paths import path_pairs
from rippledb_spark.session import get_spark


def layered_edges(spark, depth: int, width: int):
    """Edges layer i → layer i+1: node (i, j) → (i+1, j) and (i+1, (j+1)%W)."""
    nodes = spark.range(depth * width).select(
        (F.col("id") / width).cast("long").alias("layer"),
        (F.col("id") % width).alias("j"),
    ).filter(F.col("layer") < depth - 1)
    to = lambda l, j: F.concat(F.lit("n"), l.cast("string"), F.lit("_"), j.cast("string"))
    e1 = nodes.select(
        to(F.col("layer"), F.col("j")).alias("s"),
        to(F.col("layer") + 1, F.col("j")).alias("o"),
    )
    e2 = nodes.select(
        to(F.col("layer"), F.col("j")).alias("s"),
        to(F.col("layer") + 1, (F.col("j") + 1) % width).alias("o"),
    )
    null_s = F.lit(None).cast("string")
    return (
        e1.unionByName(e2)
        .select(
            "s",
            F.lit("named").alias("s_kind"),
            F.lit("edge").alias("p"),
            F.col("o").alias("o_value"),
            F.lit("named").alias("o_kind"),
            null_s.alias("o_lang"),
            null_s.alias("o_datatype"),
        )
    )


def run(spark, depth: int, width: int) -> None:
    triples = layered_edges(spark, depth, width).persist()
    n_edges = triples.count()

    t0 = time.perf_counter()
    closure = path_pairs(triples, "edge+")
    n_pairs = closure.count()
    t_global = time.perf_counter() - t0

    seeds = spark.createDataFrame([(f"n0_{j}",) for j in range(3)], ["node"])
    t0 = time.perf_counter()
    seeded = path_pairs(triples, "edge+", srcs=seeds)
    n_seeded = seeded.count()
    t_seeded = time.perf_counter() - t0

    print(
        f"depth={depth} width={width}: edges={n_edges} "
        f"global: {n_pairs} pairs in {t_global:.2f}s | "
        f"seeded(3 srcs): {n_seeded} pairs in {t_seeded:.2f}s"
    )
    triples.unpersist()


def main() -> None:
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark(app_name="scale_probe_paths")
    run(spark, depth, width)       # 1×
    run(spark, depth, width * 10)  # 10× edges, same diameter


if __name__ == "__main__":
    main()
