"""Scaling probe for the ngram_jaccard_pairs frequent-shingle guard.

Two claims for docs/SCALING.md to verify empirically:

1. **The guard removes the quadratic foot-gun** — a corpus where every doc
   shares one boilerplate shingle makes the uncapped inverted-index join
   produce ~n²/2 candidate rows from that shingle alone; with the DF cap
   the boilerplate shingle is dropped and candidate volume collapses to the
   real-overlap pairs.
2. **Result equivalence below the cap** — on the real test corpus, where
   the max shingle DF (25 at sf0.1) is far under the default cap of 1024,
   capped and uncapped output are IDENTICAL row sets.

Run: python tools/scale_probe_ngram.py [n_docs] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators import dedup as DD
from rippledb_spark.session import get_spark
from rippledb_spark.tables import load


def boilerplate_corpus(spark, n_docs: int):
    """Every doc: a shared 3-token boilerplate prefix + a unique tail, plus
    doc i and i+1 sharing real overlap (so true near-dup pairs exist)."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("terms of service apply "),  # boilerplate shingle in ALL docs
            F.lit("payload chunk "),
            (F.col("id") / 2).cast("long").cast("string"),  # i, i+1 overlap
            F.lit(" tail token "),
            F.col("id").cast("string"),
        ).alias("text"),
    )


def candidate_rows(docs, max_df):
    """Count the candidate rows the inverted-index self-join produces —
    the quantity the guard is supposed to bound."""
    base = DD.shingled_base(docs, "text", "doc_id", 3)
    inv = base.select("__id", F.explode("__sh").alias("__shingle"))
    if max_df is not None:
        frequent = (
            inv.groupBy("__shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("__shingle")
        )
        inv = inv.join(F.broadcast(frequent), "__shingle", "left_anti").select(
            "__id", "__shingle"
        )
    ia, ib = inv.toDF("id_a", "sh"), inv.toDF("id_b", "sh")
    return ia.join(ib, "sh").filter(F.col("id_a") < F.col("id_b")).count()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="scale_probe_ngram")

    docs = boilerplate_corpus(spark, n_docs).persist()
    docs.count()
    for max_df, label in ((None, "uncapped"), (64, "capped(64)")):
        t0 = time.perf_counter()
        n_cand = candidate_rows(docs, max_df)
        n_pairs = DD.ngram_jaccard_pairs(
            docs, "text", "doc_id", 3, 0.1, max_df=max_df
        ).count()
        print(
            f"boilerplate n={n_docs} {label}: candidates={n_cand} "
            f"pairs={n_pairs} wall={time.perf_counter() - t0:.2f}s"
        )
    docs.unpersist()

    d = load(spark, sf_dir, "documents")
    capped = DD.ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.1, max_df=1024)
    uncapped = DD.ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.1, max_df=None)
    diff = capped.exceptAll(uncapped).count() + uncapped.exceptAll(capped).count()
    print(f"real corpus {sf_dir}: capped-vs-uncapped row diff = {diff} (expect 0)")


if __name__ == "__main__":
    main()
