"""Scaling probe for the unigram-LM tokenizer (operators/unigram.py,
r11).

Claims for docs/SCALING.md:

1. **Training state is the DISTINCT-word table, not the corpus** — with
   the vocabulary held fixed, growing the corpus 4× (more occurrences
   of the same words) leaves the per-round E-step wall ~flat: the
   Viterbi folds run once per DISTINCT word, and only the initial
   word-count aggregation touches the corpus.
2. **Counts scale exactly** — the 4× corpus yields exactly 4× the
   total_tokens (the fold is weighted by word counts, not re-run per
   occurrence), and the segmentation hash is IDENTICAL (frequencies
   scale uniformly, so probabilities — ratios — are unchanged).

Run: python tools/scale_probe_unigram.py [base_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.unigram import unigram_train
from rippledb_spark.session import get_spark

WORDS = ["the", "fast", "window", "fastest", "slow", "faster", "windows",
         "winter", "thew", "toast"]


def corpus(spark, n_docs: int):
    """Fixed 10-word vocabulary, id-deterministic 12-word documents —
    corpus size scales, DISTINCT words do not."""
    return spark.range(n_docs).select(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda i: F.element_at(
                    F.array(*[F.lit(w) for w in WORDS]),
                    (F.pmod(F.col("id") * 7 + i * 3, F.lit(len(WORDS))) + 1)
                    .cast("int"),
                ),
            ),
            " ",
        ).alias("text")
    )


def measure(spark, n_docs: int) -> dict:
    df = corpus(spark, n_docs).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    _, stats = unigram_train(df, "text", rounds=2)
    rows = {r["round"]: r for r in stats.collect()}
    wall = time.perf_counter() - t0
    df.unpersist()
    return {
        "n_docs": n_docs,
        "wall": wall,
        "tokens": rows[2]["total_tokens"],
        "seg_md5": rows[2]["seg_md5"],
        "vocab": rows[2]["vocab_size"],
    }


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app_name="scale_probe_unigram")
    spark.range(10).count()
    r1 = measure(spark, base)
    r4 = measure(spark, base * 4)
    for tag, r in (("1x", r1), ("4x", r4)):
        print(f"{tag}: docs={r['n_docs']} wall={r['wall']:.2f}s"
              f" tokens={r['tokens']} vocab={r['vocab']}"
              f" seg={r['seg_md5'][:12]}")
    # claim 1: wall ~flat under 4x corpus (distinct-word state; only the
    # word-count agg is corpus-sized — generous 2.5x for that agg +
    # scheduling noise, far below 4x-proportional)
    assert r4["wall"] < 2.5 * max(r1["wall"], 1.0), (r1, r4)
    # claim 2: exact 4x token scaling, identical segmentations
    assert r4["tokens"] == 4 * r1["tokens"], (r1, r4)
    assert r4["seg_md5"] == r1["seg_md5"], (r1, r4)
    assert r4["vocab"] == r1["vocab"], (r1, r4)
    print("OK: distinct-word state (flat wall at 4x corpus), exact count"
          " scaling, identical segmentations")
    return 0


if __name__ == "__main__":
    sys.exit(main())
