"""Bulk-load throughput vs the reference's only published numbers.

GGabi/RippleDB publishes exactly one family of performance figures: bulk
`Graph::from_rdf` wall-times for two of its bundled corpora
(`benches/graph_bench.rs:47-51`, `--release`, author's dev machine):

    www-2011-complete.rdf  (1.5 MB)  7.40 s old -> 4.55 s new
    lrec-2008-complete.rdf (3.0 MB) 31.85 s old -> 34.94 s new

This harness times `TripleStore.from_rdf` on the same files (read-only from
/root/reference/models/). A single RDF/XML file parses on one task — same
single-node basis as the reference's measurement. Session startup and the
first-call JVM/Arrow warm-up are excluded (warm-up pass on the smallest
corpus file), matching criterion's warm-up discipline in the reference bench.

Usage:  python tools/bench_bulkload.py
Prints one JSON line: {"bulk_load": {file: {"triples": n, "sec": s, "ref_sec": r}}}
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rippledb_spark.session import get_spark
from rippledb_spark.store import TripleStore

REF_MODELS = "/root/reference/models"
# Published wall-times from benches/graph_bench.rs:47-51 ("new" = the
# reference's final multi-threaded tree build).
PUBLISHED = {
    "www-2011-complete.rdf": 4.55,
    "lrec-2008-complete.rdf": 34.94,
}


def main() -> None:
    spark = get_spark(app_name="bench_bulkload")
    smallest = min(glob.glob(f"{REF_MODELS}/*.rdf"), key=os.path.getsize)
    TripleStore.from_rdf(spark, smallest).df.count()  # warm-up, not timed

    out = {}
    for name, ref_sec in PUBLISHED.items():
        path = f"{REF_MODELS}/{name}"
        if not os.path.exists(path):
            continue
        t0 = time.perf_counter()
        n = TripleStore.from_rdf(spark, path).df.count()
        sec = round(time.perf_counter() - t0, 3)
        out[name] = {"triples": n, "sec": sec, "ref_sec": ref_sec}
        print(f"# {name}: {n} triples in {sec}s (reference: {ref_sec}s)", file=sys.stderr)

    print(json.dumps({"bulk_load": out}))
    spark.stop()


if __name__ == "__main__":
    main()
