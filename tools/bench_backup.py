"""Backup/restore + compression bench over the reference's models corpus.

Mirrors the reference's remaining (print-only) bench surfaces that
tools/bench_bulkload.py doesn't cover:

- persist/rebuild speed   (graph.rs:1163-1195 time_test loops;
                           criterion persist_to/from_backup,
                           benches/graph_bench.rs:17-42)
- compression ratio        (graph.rs:1131-1143: file kB vs footprint kB)
- backup size ratios       (graph.rs:1209-1241: footprint vs backup dir
                           size; rdf file vs backup size)

Reference's published claim for its JSON backup: "order of milliseconds
per megabyte", FS-I/O bound (COOKBOOK.md:138). Ours is parquet
(persist_to) — compare MB/s below.

Usage: python tools/bench_backup.py [n_models]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rippledb_spark.session import get_spark
from rippledb_spark.store import TripleStore


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(app_name="bench_backup")
    models = sorted(
        glob.glob("/root/reference/models/*.rdf"), key=os.path.getsize, reverse=True
    )[:n]
    out_root = "/tmp/rippledb_backup_bench"
    shutil.rmtree(out_root, ignore_errors=True)

    print(f"{'model':36} {'file_kb':>8} {'fp_kb':>8} {'bak_kb':>8} "
          f"{'persist_s':>9} {'restore_s':>9} {'MB/s':>6}")
    for path in models:
        name = os.path.basename(path)
        st = TripleStore.from_rdf(spark, path)
        st.df.persist().count()
        file_kb = os.path.getsize(path) / 1024
        fp_kb = st.footprint_bytes() / 1024

        bdir = os.path.join(out_root, name)
        t0 = time.perf_counter()
        st.persist_to(bdir)
        persist_s = time.perf_counter() - t0
        bak_kb = dir_bytes(bdir) / 1024

        t0 = time.perf_counter()
        n_back = TripleStore.from_backup(spark, bdir).df.count()
        restore_s = time.perf_counter() - t0
        assert n_back == st.df.count()

        mbs = (file_kb / 1024) / max(persist_s, 1e-9)
        print(f"{name:36} {file_kb:8.0f} {fp_kb:8.0f} {bak_kb:8.0f} "
              f"{persist_s:9.3f} {restore_s:9.3f} {mbs:6.1f}")
        st.df.unpersist(blocking=False)

    shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
