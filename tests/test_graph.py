"""Graph analytics operators: degrees + PageRank."""

from __future__ import annotations

import pytest

from rippledb_spark import TripleStore
from rippledb_spark.operators.graph import degrees, pagerank


def test_degrees_counts_named_edges_only(spark):
    st = TripleStore.from_rows(
        spark,
        [
            ("a", "knows", "b"),
            ("a", "knows", "c"),
            ("b", "knows", "c"),
            ("a", "named", "label", "a-literal", "literal", None, None),  # not an edge
        ],
    )
    d = {r["node"]: (r["out_degree"], r["in_degree"]) for r in degrees(st.df).collect()}
    assert d["a"] == (2, 0)
    assert d["b"] == (1, 1)
    assert d["c"] == (0, 2)


def test_pagerank_chain_values(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    r = {x["node"]: x["rank"] for x in pagerank(edges, iterations=30).collect()}
    # closed form for a chain with d=0.85: r(a)=0.15, r(b)=0.15+0.85*0.15,
    # r(c)=0.15+0.85*r(b)
    assert r["a"] == pytest.approx(0.15, abs=1e-9)
    assert r["b"] == pytest.approx(0.15 + 0.85 * 0.15, abs=1e-9)
    assert r["c"] == pytest.approx(0.15 + 0.85 * (0.15 + 0.85 * 0.15), abs=1e-9)


def test_pagerank_sink_and_hub(spark):
    # star: hub -> s1..s3; sinks split the hub's rank
    edges = spark.createDataFrame(
        [("hub", "s1"), ("hub", "s2"), ("hub", "s3")], ["src", "dst"]
    )
    r = {x["node"]: x["rank"] for x in pagerank(edges, iterations=10).collect()}
    assert r["s1"] == r["s2"] == r["s3"]
    assert r["s1"] == pytest.approx(0.15 + 0.85 * (0.15 / 3), abs=1e-9)


def test_ivf_topk_contains_self(spark):
    import pyspark.sql.functions as F

    from rippledb_spark.operators.similarity import ivf_topk
    from rippledb_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    got = [(r["vec_id"], r["cos_sim"]) for r in ivf_topk(e, qv, k=5, n_clusters=4).collect()]
    # the query vector's own cluster is always probed → self is rank 1
    assert got[0][0] == 0 and got[0][1] == 1.0


def test_connected_components_two_islands(spark):
    from rippledb_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    comp = {r["node"]: r["comp"] for r in connected_components(edges, iterations=4).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
