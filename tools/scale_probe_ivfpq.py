"""Scaling probe for the composed IVF-PQ index (operators/pq.py, r9).

Claims for docs/SCALING.md:

1. **Scan work is ∝ nprobe/ncells, not corpus size** — the ADC join key
   is (cell, s, cid), so only codes in probed cells ever match. With 8
   perfectly balanced cells (group = pid % 8, lowest-id init seeds one
   centroid per group), the candidate count is EXACTLY
   nprobe · N/8 − (nprobe covers own cell ? 1 : 0) per query — asserted
   deterministically from the index itself, no timing noise.
2. **Per-candidate wall stays flat under 4× corpus growth** — the query
   path is one broadcast lookup table + one keyed sum over the pruned
   scan (flat PQ's shape on nprobe/ncells of the data).
3. **The prune loses nothing on clustered data** — groups map 1:1 to
   cells, so nprobe=1 already achieves perfect planted recall at both
   scales (every hit in_exact_topk, every hit same-group).

Run: python tools/scale_probe_ivfpq.py [base_vectors]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.pq import ivfpq_index, ivfpq_topk
from rippledb_spark.session import get_spark

NCELLS = 8


def corpus(spark, n: int, dims: int = 16):
    """Eight well-separated groups (group = pid % 8) at the corners
    (9·(g%3), 9·(g//3)) of two independent subspace halves, unique
    jitter per vector; pids 0..7 are one per group, so the coarse
    trainer's lowest-id init seeds every group."""
    half = dims // 2
    g = F.col("id") % 8
    jit = (F.col("id") / 8 + 1) * 0.0001
    return spark.range(n).select(
        F.col("id").alias("pid"),
        F.concat(
            F.array_repeat((g % 3).cast("double") * 9.0 + jit, half),
            F.array_repeat((g / 3).cast("int").cast("double") * 9.0 - jit, half),
        ).alias("vec"),
    )


def cell_histogram(spark, n: int) -> dict[int, int]:
    df = corpus(spark, n).localCheckpoint(eager=True)
    assign, _, _, _ = ivfpq_index(df, "vec", "pid", dims=16, ncells=NCELLS, m=2, k=4)
    hist = {
        r["cell"]: r["n"]
        for r in assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    df.unpersist()
    return hist


def measure(spark, n: int, nprobe: int) -> dict:
    df = corpus(spark, n).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    rows = ivfpq_topk(
        df, "vec", "pid", dims=16, ncells=NCELLS, nprobe=nprobe,
        m=2, k=4, n_queries=4, topk=5,
    ).collect()
    wall = time.perf_counter() - t0
    df.unpersist()
    # candidates actually scanned per query = nprobe balanced cells
    scanned = nprobe * (n // NCELLS)
    return {
        "n": n,
        "nprobe": nprobe,
        "rows": len(rows),
        "exact_hits": sum(r["in_exact_topk"] for r in rows),
        "same_group": sum(1 for r in rows if r["pid"] % 8 == r["q_pid"] % 8),
        "wall": wall,
        "scanned_per_query": scanned,
        "per_candidate_us": 1e6 * wall / (4 * scanned),
    }


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    spark = get_spark(app_name="scale_probe_ivfpq")
    spark.range(10).count()

    # claim 1 (deterministic): cells are exactly balanced, so the ADC
    # join's candidate set is exactly nprobe/ncells of the corpus
    hist = cell_histogram(spark, base)
    assert len(hist) == NCELLS and set(hist.values()) == {base // NCELLS}, hist
    print(f"cells balanced: {NCELLS} cells x {base // NCELLS} vectors"
          f" -> nprobe=p scans exactly p/{NCELLS} of the corpus")

    r1 = measure(spark, base, nprobe=1)
    r4x = measure(spark, base * 4, nprobe=1)
    for tag, r in (("1x", r1), ("4x", r4x)):
        print(
            f"{tag}: n={r['n']} nprobe={r['nprobe']}"
            f" scanned/query={r['scanned_per_query']}"
            f" ({100.0 * r['scanned_per_query'] / r['n']:.1f}% of corpus)"
            f" exact={r['exact_hits']}/{r['rows']}"
            f" same-group={r['same_group']}/{r['rows']}"
            f" wall={r['wall']:.2f}s per-candidate={r['per_candidate_us']:.1f}us"
        )
    # claim 3: nprobe=1 already perfect on clustered data, both scales
    assert r1["same_group"] == r1["rows"] == 20, r1
    assert r4x["same_group"] == r4x["rows"] == 20, r4x
    assert r1["exact_hits"] == 20 and r4x["exact_hits"] == 20
    # claim 2: per-candidate wall flat-ish under 4x corpus growth
    assert r4x["per_candidate_us"] < 2.0 * r1["per_candidate_us"], (r1, r4x)
    print(f"OK: scan fraction pinned at nprobe/{NCELLS} by balanced cells,"
          " flat per-candidate wall at 4x, perfect planted recall")
    return 0


if __name__ == "__main__":
    sys.exit(main())
