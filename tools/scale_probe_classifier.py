"""Scaling probe for the trained quality classifier
(operators/classifier.py, r11).

Claims for docs/SCALING.md:

1. **Per-iteration cost is one corpus pass with d-key reduce state** —
   training wall grows ~linearly with n at fixed d and iteration count
   (the gradient is a 12-key map-side-combinable integer agg; the
   iterate is a broadcast 1-row d-vector).
2. **Serving is corpus-linear and shuffle-free** — logistic_predict is
   one broadcast projection; its wall at 4× the corpus stays ~linear
   (no pairwise term, no shuffle).
3. **The fit recovers the planted rule at both scales** — accuracy on
   margin-separated planted labels stays ≥ 0.95 as n grows (the
   gradient arithmetic doesn't degrade with corpus size).

Run: python tools/scale_probe_classifier.py [base_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.classifier import (
    logistic_metrics,
    logistic_predict,
    logistic_train,
)
from rippledb_spark.session import get_spark

DIMS = 4


def corpus(spark, n: int):
    """Planted separable labels: y = 1 iff x1 + x2 − 1 > 0.2 margin
    (deterministic id arithmetic, dead band excluded)."""
    x1 = (F.col("id") % 97).cast("double") / 97.0
    x2 = (F.col("id") % 53).cast("double") / 53.0
    s = x1 + x2 - 1.0
    return (
        spark.range(n)
        .select(
            F.array(F.lit(1.0), x1, x2,
                    ((F.col("id") % 11).cast("double") / 11.0)).alias("x"),
            s.alias("s"),
        )
        .where(F.abs("s") > 0.2)
        .select("x", F.when(F.col("s") > 0, 1.0).otherwise(0.0).alias("y"))
    )


def measure(spark, n: int) -> dict:
    df = corpus(spark, n).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    w = logistic_train(df, "x", "y", DIMS, iterations=6, lr=2.0)
    train_wall = time.perf_counter() - t0
    ids = df.select(F.monotonically_increasing_id().alias("id"), "x")
    t0 = time.perf_counter()
    logistic_predict(ids, "x", "id", w, DIMS).write.format("noop").mode(
        "overwrite"
    ).save()
    serve_wall = time.perf_counter() - t0
    acc = logistic_metrics(df, "x", "y", w, DIMS).collect()[0]["accuracy"]
    df.unpersist()
    return {"n": n, "train": train_wall, "serve": serve_wall, "acc": acc}


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="scale_probe_classifier")
    spark.range(10).count()
    r1 = measure(spark, base)
    r4 = measure(spark, base * 4)
    for tag, r in (("1x", r1), ("4x", r4)):
        print(f"{tag}: n={r['n']} train={r['train']:.2f}s"
              f" serve={r['serve']:.2f}s acc={r['acc']}")
    # claim 1: ~linear training (4x data within ~6x wall; far below any
    # superlinear blowup — the per-round reduce state is d keys)
    assert r4["train"] < 6.0 * max(r1["train"], 0.5), (r1, r4)
    # claim 2: serving ~linear too
    assert r4["serve"] < 6.0 * max(r1["serve"], 0.5), (r1, r4)
    # claim 3: planted rule recovered at both scales
    for r in (r1, r4):
        assert r["acc"] >= 0.95, r
    print("OK: train/serve ~linear in n, d-key reduce state, planted-rule"
          " accuracy holds at 4x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
