"""Repeated-pass timing harness for the iterative graph operators (perf
tooling, not part of the engine). Verifies steady-state latency stays flat
across calls — the regression this guards against is block-manager garbage
accumulating between iterative runs (see operators/graph.py)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.graph import pagerank
from rippledb_spark.queries.triples import _store
from rippledb_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile_pagerank")
spark.range(100).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
    lambda pdf: pdf[["id"]].head(1), schema="id long"
).collect()

st = _store(spark, sf_dir)  # build+cache the triple store (not counted)
st.df.count()
edges = st.pattern(None, "contains_part", None).select(
    F.col("s").alias("src"), F.col("o_value").alias("dst")
)

for i in range(6):
    t0 = time.perf_counter()
    out = (
        pagerank(edges, iterations=6)
        .select("node", F.round("rank", 4).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(100)
    )
    out.write.format("noop").mode("overwrite").save()
    print(f"pass {i}: {round(time.perf_counter() - t0, 3)}s")

spark.stop()
