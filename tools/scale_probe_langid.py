"""Scaling probe for the trained multiclass language-ID classifier
(operators/langid.py, r12).

Claims for docs/SCALING.md:

1. **Per-round cost is one corpus pass with K·d-key reduce state** —
   softmax training wall grows ~linearly with n at fixed (K, d,
   rounds): the gradient is a K·d-key map-side-combinable integer agg
   over a checkpointed feature frame; the iterate is one broadcast
   flat K·d vector.
2. **Featurization + serving are corpus-linear and shuffle-light** —
   char_ngram_hash_features is one explode + one (id, cell) map-side
   sum; softmax_predict is a broadcast argmax projection. The combined
   featurize+serve wall at 4× the corpus stays ~linear.
3. **The fit recovers the planted languages at both scales** —
   accuracy on the disjoint-alphabet planted corpus stays ≥ 0.9 as n
   grows (the grid arithmetic doesn't degrade with corpus size).

Run: python tools/scale_probe_langid.py [base_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.langid import (
    char_ngram_hash_features,
    softmax_metrics,
    softmax_predict,
    softmax_train,
)
from rippledb_spark.session import get_spark

K = 4
DIMS = 16
WORDS = [
    "".join(chr(97 + 6 * k + (v + i) % 6) for i in range(3))
    for k in range(K)
    for v in range(6)
]


def corpus(spark, n: int):
    """The planted-language corpus (the certified query's fixture
    shape), scaled by row id instead of doc_id."""
    words = F.array(*[F.lit(w) for w in WORDS])
    lang = (F.col("id") % K).cast("int")
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        lang.alias("y"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.lit(11) + F.col("id") % 5).cast("int")),
                lambda i: F.element_at(
                    words,
                    (
                        (F.col("id") % K) * 6
                        + (F.lit(7) * F.col("id") + F.lit(13) * i) % 6
                        + 1
                    ).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
    )


def measure(spark, n: int) -> dict:
    d = corpus(spark, n)
    t0 = time.perf_counter()
    feats = (
        char_ngram_hash_features(d, "text", "doc_id", dims=DIMS)
        .join(d.select("doc_id", "y"), "doc_id")
        .localCheckpoint(eager=True)
    )
    feat_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    w = softmax_train(feats, "x", "y", DIMS, K, iterations=4, lr=2.0)
    train_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    softmax_predict(feats, "x", "doc_id", w, DIMS, K).write.format(
        "noop"
    ).mode("overwrite").save()
    serve_wall = time.perf_counter() - t0
    acc = softmax_metrics(feats, "x", "y", w, DIMS, K).collect()[0][
        "accuracy"
    ]
    feats.unpersist()
    return {
        "n": n,
        "feat": feat_wall,
        "train": train_wall,
        "serve": serve_wall,
        "acc": acc,
    }


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="scale_probe_langid")
    spark.range(10).count()
    r1 = measure(spark, base)
    r4 = measure(spark, base * 4)
    for tag, r in (("1x", r1), ("4x", r4)):
        print(
            f"{tag}: n={r['n']} feat={r['feat']:.2f}s train={r['train']:.2f}s"
            f" serve={r['serve']:.2f}s acc={r['acc']}"
        )
    # claim 1: ~linear training (4x data within ~6x wall — K·d reduce keys)
    assert r4["train"] < 6.0 * max(r1["train"], 0.5), (r1, r4)
    # claim 2: featurization + serving ~linear
    assert r4["feat"] + r4["serve"] < 6.0 * max(
        r1["feat"] + r1["serve"], 0.5
    ), (r1, r4)
    # claim 3: planted languages recovered at both scales
    for r in (r1, r4):
        assert r["acc"] >= 0.9, r
    print(
        "OK: featurize/train/serve ~linear in n, K*d reduce state,"
        " planted-language accuracy holds at 4x"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
