"""Scaling probe for triangle_count's degree-ordered wedge orientation.

Two claims for docs/SCALING.md to verify empirically:

1. **Degree orientation removes the hub foot-gun** — plant a hub of
   degree d whose id sorts LOW: id-ordered orientation gives the hub d
   out-edges, so the wedge join emits C(d,2) rows from the hub alone
   (quadratic). Degree ordering points every hub edge INTO the hub
   (spokes have lower degree), so the hub contributes ~zero wedges and
   total wedge volume is bounded by O(m^1.5).
2. **Result equivalence** — both orientations count the same triangles
   (each triangle has exactly one minimal node under EITHER total
   order), verified on the hub graph and the real part-cooccurrence
   edges at the given sf.

Run: python tools/scale_probe_triangles.py [hub_degree] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.graph import triangle_count
from rippledb_spark.session import get_spark


def hub_graph(spark, d: int):
    """Hub 'a0' (sorts first) connected to d spokes; spokes i,i+1 also
    connected so triangles exist through the hub."""
    spokes = spark.range(d).select(F.concat(F.lit("s"), F.col("id")).alias("n"))
    hub_edges = spokes.select(F.lit("a0").alias("src"), F.col("n").alias("dst"))
    ring = spark.range(d - 1).select(
        F.concat(F.lit("s"), F.col("id")).alias("src"),
        F.concat(F.lit("s"), F.col("id") + 1).alias("dst"),
    )
    return hub_edges.unionByName(ring)


def wedge_volume(edges, degree_orient: bool) -> int:
    """Count the wedge-join output rows (the quantity orientation is
    supposed to bound) — same plan as triangle_count up to the closing
    semi-join."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if degree_orient:
        deg = (
            e.select(F.col("a").alias("n"))
            .unionByName(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        ranked = (
            e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
            .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
        )
        ra = F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
        rb = F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
        oriented = ranked.select(
            F.when(ra < rb, ra).otherwise(rb).alias("u"),
            F.when(ra < rb, rb).otherwise(ra).alias("v"),
        )
    else:
        oriented = e.select(
            F.struct(F.lit(0).alias("d"), F.col("a").alias("n")).alias("u"),
            F.struct(F.lit(0).alias("d"), F.col("b").alias("n")).alias("v"),
        )
    return (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .count()
    )


def main() -> None:
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = get_spark(app_name="scale_probe_triangles")

    edges = hub_graph(spark, d).persist()
    edges.count()

    w_id = wedge_volume(edges, degree_orient=False)
    w_deg = wedge_volume(edges, degree_orient=True)
    print(f"hub d={d}: wedges id-order={w_id} degree-order={w_deg} "
          f"(collapse {w_id / max(w_deg, 1):.0f}x; C(d,2)={d*(d-1)//2})")

    t_id = triangle_count(edges, degree_orient=False).collect()[0]
    t_deg = triangle_count(edges).collect()[0]
    assert tuple(t_id) == tuple(t_deg), (t_id, t_deg)
    print(f"hub graph counts EQUAL under both orientations: {tuple(t_deg)}")

    # real corpus: part co-occurrence edges (the registered query's input)
    from rippledb_spark.queries.triples import _store
    from rippledb_spark.operators.graph import cooccurrence_edges

    st = _store(spark, sf_dir)
    pairs = st.pattern(None, "contains_part", None).select(
        F.col("s").alias("g"), F.col("o_value").alias("i")
    )
    real = cooccurrence_edges(pairs, "g", "i", max_group_size=64).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).persist()
    real.count()
    t0 = time.perf_counter()
    r_deg = tuple(triangle_count(real).collect()[0])
    t_deg_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    r_id = tuple(triangle_count(real, degree_orient=False).collect()[0])
    t_id_s = time.perf_counter() - t0
    assert r_deg == r_id, (r_deg, r_id)
    print(f"real corpus ({sf_dir}) counts EQUAL: {r_deg} "
          f"(degree-order {t_deg_s:.2f}s, id-order {t_id_s:.2f}s)")


if __name__ == "__main__":
    main()
