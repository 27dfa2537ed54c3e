"""Scaling probe for per-graph closures under GRAPH ?var (perf tooling).

The claim in docs/SCALING.md: paths inside GRAPH ?var run ONE semi-naive
fixpoint over the graph-tagged node space (plans/graphs.py), so the cost
of evaluating G graphs' closures together is the cost of a single run
over the union of their edges — NOT G separate job waves — and the round
count follows the MAX per-graph diameter, not the graph count.

The probe builds G disjoint chains (depth D) as G named graphs, runs
``GRAPH ?g { ?x (edge)+ ?y }`` at 1× and 8× the graph count, and checks:

1. output pairs grow ~linearly with graph count (each graph's closure is
   the same chain closure: D·(D-1)/2 pairs);
2. wall time is FLAT-ish per graph-count multiple (one fixpoint, shared
   rounds — the per-graph-loop alternative would multiply job waves by G);
3. no pair crosses graphs (tagging invariant).

Run: python tools/scale_probe_graphvar_paths.py [graphs] [depth]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.plans.sparql import Sparql
from rippledb_spark.plans.graphs import select_dataset
from rippledb_spark.session import get_spark


def chain_quads(spark, n_graphs: int, depth: int):
    """G disjoint chains: graph g holds n{g}_0 -> n{g}_1 -> ... edges."""
    rows = spark.range(n_graphs * (depth - 1)).select(
        (F.col("id") / (depth - 1)).cast("long").alias("gi"),
        (F.col("id") % (depth - 1)).alias("step"),
    )
    node = lambda gi, s: F.concat(  # noqa: E731
        F.lit("n"), gi.cast("string"), F.lit("_"), s.cast("string")
    )
    null_s = F.lit(None).cast("string")
    return rows.select(
        F.concat(F.lit("graph:"), F.col("gi").cast("string")).alias("g"),
        node(F.col("gi"), F.col("step")).alias("s"),
        F.lit("named").alias("s_kind"),
        F.lit("edge").alias("p"),
        node(F.col("gi"), F.col("step") + 1).alias("o_value"),
        F.lit("named").alias("o_kind"),
        null_s.alias("o_lang"),
        null_s.alias("o_datatype"),
    )


def run(spark, n_graphs: int, depth: int) -> tuple[float, int]:
    quads = chain_quads(spark, n_graphs, depth).persist()
    quads.count()
    q = Sparql()
    g = Sparql()
    g.path("$x", "edge+", "$y")
    q.graph("$g", g)
    q.select(["$g", "$x", "$y"])
    t0 = time.perf_counter()
    out = select_dataset(quads, q)
    n = out.count()
    wall = time.perf_counter() - t0
    # tagging invariant: every pair stays inside its graph
    crossed = out.filter(
        ~F.col("x").startswith(F.concat(F.lit("n"), F.expr("substring(g, 7)"), F.lit("_")))
    ).count()
    assert crossed == 0, f"{crossed} cross-graph pairs!"
    quads.unpersist()
    return wall, n


def main() -> None:
    n_graphs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark(app_name="scale_probe_graphvar_paths")
    expect = depth * (depth - 1) // 2

    w1, n1 = run(spark, n_graphs, depth)
    w8, n8 = run(spark, n_graphs * 8, depth)
    print(f"graphs={n_graphs}:   wall={w1:.1f}s pairs={n1} (expect {n_graphs * expect})")
    print(f"graphs={n_graphs*8}: wall={w8:.1f}s pairs={n8} (expect {n_graphs * 8 * expect})")
    assert n1 == n_graphs * expect and n8 == n_graphs * 8 * expect
    ratio = w8 / max(w1, 1e-9)
    print(f"wall ratio at 8x graphs: {ratio:.2f}x (per-graph-loop would be ~8x)")


if __name__ == "__main__":
    main()
