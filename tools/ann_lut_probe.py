"""r16 experiment (VERDICT r15 #7): mapInPandas LUT-distance ANN serving.

Prototypes a 'genuinely different shape' for the frozen-index serving
pass: instead of codes ⋈ broadcast(LUT) → groupBy(q_pid, pid) sum →
window top-k (two exchanges over nq-replicated code rows), one Arrow
kernel scans the code table once, accumulates per-(query, pid) ADC sums
from a driver-collected LUT (nq·m·k doubles — bounded), emits each
batch's partial top candidates, and a final tiny aggregation merges
them. Measures wall + Spark-job count for both shapes on the identical
frozen index, plus value agreement.

Run: SPARK_GRAFT_SF_DIR=... python tools/ann_lut_probe.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Window

from rippledb_spark.functions.vector import as_double_array
from rippledb_spark.operators import pq as PQ
from rippledb_spark.operators.pq import ADC_DP, _dist2
from rippledb_spark.session import get_spark
from rippledb_spark.tables import load


def pq_query_topk_lut(spark, queries, books, codes, dims, m, topk=5):
    """The experimental shape: driver LUT + one mapInPandas scan of the
    code table + one final merge of per-batch partials."""
    import pandas as pd

    d0 = dims // m
    # driver-side LUT: nq·m·k rows (bounded by the query set, never the
    # corpus) — same lt_d2 arithmetic as pq_query_topk (JVM fold)
    lt_rows = (
        queries.crossJoin(F.broadcast(books))
        .select(
            "q_pid", "s", "cid",
            _dist2(
                F.slice(F.col("qv"), F.col("s") * d0 + 1, d0), F.col("c")
            ).alias("lt_d2"),
        )
        .collect()
    )
    qids = sorted({r["q_pid"] for r in lt_rows})
    qidx = {q: i for i, q in enumerate(qids)}
    kmax = max(r["cid"] for r in lt_rows) + 1
    lut = np.zeros((len(qids), m, kmax), dtype=np.float64)
    for r in lt_rows:
        lut[qidx[r["q_pid"]], r["s"], r["cid"]] = r["lt_d2"]
    qid_arr = np.array(qids, dtype=np.int64)

    def batch_fn(batches):
        for pdf in batches:
            pid = pdf["pid"].to_numpy()
            s = pdf["s"].to_numpy()
            cid = pdf["cid"].to_numpy()
            # per-row contribution per query: (nq, rows)
            contrib = lut[:, s, cid]
            # group by pid within the batch: one partial sum per
            # (query, pid) — codes for one pid may span batches, so
            # these stay PARTIAL sums merged downstream
            order = np.argsort(pid, kind="stable")
            pid_o = pid[order]
            cut = np.flatnonzero(np.diff(pid_o)) + 1
            groups = np.split(np.arange(len(pid_o)), cut)
            upids = pid_o[np.concatenate([[0], cut])] if len(pid_o) else []
            rows = []
            for g, up in zip(groups, upids):
                idx = order[g]
                sums = contrib[:, idx].sum(axis=1)
                for qi in range(len(qids)):
                    rows.append((int(qid_arr[qi]), int(up), float(sums[qi])))
            yield pd.DataFrame(
                rows, columns=["q_pid", "pid", "part"]
            )

    partials = codes.mapInPandas(
        batch_fn, schema="q_pid long, pid long, part double"
    )
    est = (
        partials.groupBy("q_pid", "pid")
        .agg(F.round(F.sum("part"), ADC_DP).alias("adc_d2"))
        .where(F.col("pid") != F.col("q_pid"))
    )
    w = Window.partitionBy("q_pid").orderBy("adc_d2", "pid")
    return (
        est.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("q_pid", "rank", "pid", "adc_d2")
    )


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ann_lut_probe")
    sc = spark.sparkContext
    spark.range(100).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf[["id"]].head(1), schema="id long"
    ).collect()

    e = load(spark, sf_dir, "embeddings")
    queries = (
        e.select(F.col("vec_id").alias("q_pid"), as_double_array("embedding").alias("qv"))
        .orderBy("q_pid").limit(3).localCheckpoint(eager=True)
    )
    codes, books = PQ.pq_codes(e, "embedding", "vec_id", dims=64, m=8, k=16)
    codes = codes.localCheckpoint(eager=True)
    books = books.localCheckpoint(eager=True)

    for name, fn in (
        ("current pq_query_topk", lambda: PQ.pq_query_topk(
            queries, books, codes, dims=64, m=8, topk=5)),
        ("lut mapInPandas", lambda: pq_query_topk_lut(
            spark, queries, books, codes, dims=64, m=8, topk=5)),
    ):
        walls = []
        n_jobs = None
        for i in range(runs):
            group = f"{name}#{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
        print(f"{name}: runs {walls} min {min(walls)} jobs {n_jobs}")

    a = sorted(map(tuple, PQ.pq_query_topk(
        queries, books, codes, dims=64, m=8, topk=5).collect()))
    b = sorted(map(tuple, pq_query_topk_lut(
        spark, queries, books, codes, dims=64, m=8, topk=5).collect()))
    print("values equal:", a == b)


if __name__ == "__main__":
    main()
