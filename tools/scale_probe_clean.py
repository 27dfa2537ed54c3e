"""Scaling probe for remove_frequent_ngram_spans (operators/cleaning.py).

Two claims for docs/SCALING.md to verify empirically:

1. **The frequent set stays small and the plan stays linear** — scaling a
   corpus with a universal boilerplate span 1×→4×→16× grows every
   intermediate (starts, covered positions) LINEARLY with the corpus;
   the frequent-shingle set stays constant-sized (the boilerplate spans
   themselves), so no stage is quadratic and wall time tracks data, not
   pairs.
2. **Coverage correctness at every scale** — every copied document loses
   exactly the boilerplate token span and keeps its unique tail, so
   kept-token counts are an exact function of the corpus and identical
   across scales.

Run: python tools/scale_probe_clean.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.cleaning import remove_frequent_ngram_spans
from rippledb_spark.session import get_spark


def corpus(spark, n_docs: int):
    """Every doc: a 4-token boilerplate prefix shared by ALL docs + a
    3-token unique tail."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("terms of service apply unique tail "),
            F.col("id").cast("string"),
        ).alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark(app_name="scale_probe_clean")
    spark.range(10).count()  # warm

    for scale in (1, 4, 16):
        docs = corpus(spark, n_docs * scale)
        t0 = time.perf_counter()
        out = remove_frequent_ngram_spans(docs, "text", "doc_id", n=3, max_df=100)
        agg = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("n_kept").alias("kept"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        # 7 tokens per doc; trigram starts 0..4 — the all-docs trigrams are
        # starts 0,1 ('terms of service', 'of service apply'); 'service
        # apply unique' and 'apply unique tail' are also universal →
        # starts 0-3 frequent → covered 0..5 → kept = 1 ('<id>')
        expect_kept = agg["docs"] * 1
        print(
            f"scale {scale:>2}×: docs={agg['docs']:>7} tokens={agg['tokens']:>8} "
            f"kept={agg['kept']:>7} (expect {expect_kept}) wall={wall:.2f}s "
            f"{'OK' if agg['kept'] == expect_kept else 'MISMATCH'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
