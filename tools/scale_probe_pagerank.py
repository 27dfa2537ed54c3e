"""Scaling probe for the iterative pagerank operator (perf tooling).

Question (VERDICT r02 item 7): is pagerank's ~6-20 s at sf0.1 loop
OVERHEAD (per-job scheduling, fixed per iteration) or DATA cost (would
grow linearly at 100 TB)? No sf1 testdata exists, so the probe derives a
10× graph from sf0.1 itself: ten disjoint prefixed copies of the
order→part edge list (same degree distribution, 10× nodes and edges).
If iteration cost were data-bound, 10× edges → ≥10× wall time; the
scale-safe claim in docs/SCALING.md predicts far-sublinear growth at this
size because per-iteration shuffle volume is still tiny relative to
per-job fixed cost.

Prints wall time and total shuffle write bytes (from the Spark UI REST
API) per scale. Run: python tools/scale_probe_pagerank.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.graph import pagerank
from rippledb_spark.queries.triples import _store
from rippledb_spark.session import get_spark


def shuffle_write_bytes(ui_port: int = 4040) -> int:
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="scale_probe_pagerank", extra_conf={"spark.ui.enabled": "true"}
    )
    st = _store(spark, sf_dir)
    st.df.count()
    edges1 = (
        st.pattern(None, "contains_part", None)
        .select(F.col("s").alias("src"), F.col("o_value").alias("dst"))
        .persist()
    )
    n1 = edges1.count()

    copies = [
        edges1.select(
            F.concat(F.lit(f"c{i}:"), F.col("src")).alias("src"),
            F.concat(F.lit(f"c{i}:"), F.col("dst")).alias("dst"),
        )
        for i in range(10)
    ]
    edges10 = copies[0]
    for c in copies[1:]:
        edges10 = edges10.unionByName(c)
    edges10 = edges10.persist()
    n10 = edges10.count()

    for label, edges, n in (("1x", edges1, n1), ("10x", edges10, n10)):
        sw0 = shuffle_write_bytes()
        t0 = time.perf_counter()
        out = pagerank(edges, iterations=6)
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sw = shuffle_write_bytes() - sw0
        print(
            f"{label}: edges={n:,} wall={dt:.2f}s "
            f"shuffle_write={sw / 1e6:.1f} MB",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
