"""Scaling probe for k_core and shortest_paths (r6 iterative operators).

Claims for docs/SCALING.md:

1. **k_core rounds are peeling DEPTH, not graph size** — a corpus of R
   rings (each survives the 2-core) with length-4 tails (each peels one
   layer per round) needs the SAME ~5 rounds at 1×/4×/16× the rings,
   with survivors exactly 8×R: per-round work scales linearly, the
   round COUNT is a structural property.
2. **shortest_paths rounds are weighted-diameter hops** — a chain of C
   equal-weight links from the source needs ~C relaxation rounds
   regardless of how many disjoint chains run in parallel; widening the
   graph 16× leaves rounds and wall flat.

Run: python tools/scale_probe_kcore.py [base_rings]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.graph import k_core, shortest_paths
from rippledb_spark.session import get_spark


def ring_tail_graph(spark, rings: int):
    """R rings of 8 nodes + a 4-node tail hanging off each ring."""
    r = spark.range(rings)
    ring_edges = r.selectExpr(
        "explode(transform(sequence(0, 7), "
        "i -> struct(concat('r', id, '_', i) as src, "
        "concat('r', id, '_', (i + 1) % 8) as dst))) as e"
    ).select("e.src", "e.dst")
    tail_edges = r.selectExpr(
        "explode(transform(sequence(0, 3), "
        "i -> struct(CASE WHEN i = 0 THEN concat('r', id, '_0') "
        "ELSE concat('t', id, '_', i - 1) END as src, "
        "concat('t', id, '_', i) as dst))) as e"
    ).select("e.src", "e.dst")
    return ring_edges.unionByName(tail_edges)


def chains_graph(spark, chains: int, length: int = 10):
    return spark.range(chains).selectExpr(
        f"explode(transform(sequence(0, {length - 1}), "
        "i -> struct(CASE WHEN i = 0 THEN 'origin' "
        "ELSE concat('c', id, '_', i - 1) END as src, "
        "concat('c', id, '_', i) as dst, CAST(1.0 AS DOUBLE) as w))) as e"
    ).select("e.src", "e.dst", "e.w")


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    spark = get_spark(app_name="scale_probe_kcore")

    print("k_core (2-core of rings+tails): rounds must stay flat")
    for mult in (1, 4, 16):
        rings = base * mult
        edges = ring_tail_graph(spark, rings).persist()
        edges.count()
        t0 = time.perf_counter()
        n = k_core(edges, 2).count()
        wall = time.perf_counter() - t0
        assert n == 8 * rings, (n, rings)
        print(f"  rings={rings:6d}: survivors={n} (exact 8x) wall={wall:.2f}s")
        edges.unpersist(blocking=False)

    print("shortest_paths (parallel chains from one origin): rounds = depth")
    for mult in (1, 4, 16):
        chains = base * mult
        edges = chains_graph(spark, chains).persist()
        edges.count()
        t0 = time.perf_counter()
        out = shortest_paths(edges, ["origin"])
        far = out.agg(F.max("dist")).collect()[0][0]
        n = out.count()
        wall = time.perf_counter() - t0
        assert far == 10.0 and n == chains * 10 + 1, (far, n)
        print(f"  chains={chains:6d}: nodes={n} max_dist={far} wall={wall:.2f}s")
        edges.unpersist(blocking=False)


if __name__ == "__main__":
    main()
