"""Round-15 optimization measurement harness.

For each named query (default: the bench HEADLINE set), runs the
registered form solo with the noop sink (guide §1.4 — full evaluation of
every output column, no driver collect in the timed region), reports
per-query wall seconds over N warm runs, and optionally dumps
``explain("formatted")`` to plans/r15/<query>_<tag>.txt.

Usage:
  python tools/opt_measure.py [--runs N] [--tag before|after|''] [query ...]

Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py. Applies the
same per-query block sweep as bench.py so checkpoint blocks from one
query never tax the next.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators._itergc import persistent_rdd_ids, unpersist_rdd_ids
from rippledb_spark.registry import HEADLINE, all_queries
from rippledb_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="")
    ap.add_argument("--plans-dir", default="plans/r15")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="opt_measure")
    queries = dict(all_queries())
    try:
        from bench import BENCH_OVERRIDES

        queries.update(BENCH_OVERRIDES)
    except Exception:
        pass
    names = args.queries or list(HEADLINE)

    # session warmup identical in spirit to bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(100).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf[["id"]].head(1), schema="id long"
    ).collect()

    if args.tag:
        os.makedirs(args.plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = queries[name]
        if args.tag:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        samples = []
        n_jobs = None
        for i in range(args.runs):
            base = persistent_rdd_ids(spark)
            group = f"{name}#{i}"
            spark.sparkContext.setJobGroup(group, f"{name} run {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            # Spark-job count per run: a weather-independent structural
            # metric (scheduler round-trips) alongside wall seconds
            n_jobs = len(
                spark.sparkContext.statusTracker().getJobIdsForGroup(group)
            )
            spark.sparkContext.setJobGroup(None, None)
            unpersist_rdd_ids(spark, persistent_rdd_ids(spark) - base)
        s = sorted(samples)
        if not s:
            continue
        out[name] = {
            "median": s[len(s) // 2],
            "min": s[0],
            "runs": samples,
            "jobs": n_jobs,
        }
        print(
            f"{name}: median {s[len(s)//2]:.3f}s min {s[0]:.3f}s"
            f" jobs {n_jobs} runs {samples}"
        )
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
