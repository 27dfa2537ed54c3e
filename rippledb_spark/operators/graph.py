"""Graph analytics over the triples DataFrame (engine tier).

The reference is a triple STORE with no analytics (SURVEY §2.4); these are
the batch graph operators a Spark-native engine adds on the same data:
degree centrality (pure aggregation) and PageRank (iterative DataFrame
loop — the canonical non-SQL-expressible operator class).

PySpark has no GraphX bindings; DataFrame iteration with persist/checkpoint
discipline IS the idiomatic PySpark formulation for bounded-iteration
graph algorithms.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def degrees(triples: DataFrame) -> DataFrame:
    """Per-node out/in degree over named→named edges (entity graph only —
    literal objects are attributes, not edges)."""
    edges = triples.filter(F.col("o_kind") == "named").select("s", "o_value")
    out_deg = edges.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_deg = edges.groupBy(F.col("o_value").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_deg.join(in_deg, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank via iterative joins (ranks initialized to 1.0).

    Each iteration: contribution = rank/out_degree shuffled along edges,
    rank' = (1-d) + d·Σ contributions. Dangling nodes keep the teleport
    term. Every iteration ends in ``localCheckpoint`` — persisting alone is
    NOT enough for iterative DataFrames: the logical plan doubles each
    round and Catalyst analysis time grows superlinearly (measured 4s→40s
    from 3→6 iterations before truncation). Checkpointing makes each
    iteration's plan a leaf, keeping per-iteration cost flat.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))

    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_degree")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left_outer")
            .select(
                "node",
                (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("csum", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )

    return ranks
