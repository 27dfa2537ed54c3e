"""Scaling probe for the Gopher repetition gate (operators/quality.py).

The gram explode is the heaviest scan shape in the quality tier; two
claims for docs/SCALING.md to verify empirically:

1. **Per-doc cost is flat** — scaling the corpus 1×→4×→16× grows the
   exploded gram table LINEARLY with the corpus (grams per doc is a
   function of the doc, not the corpus), and both aggregates are keyed
   (doc, gram) then (doc) — doc-scoped keys, so a corpus-frequent gram
   ("buy now" in a million docs) never concentrates on one reducer.
   Wall time must therefore track data, not pairs: flat-ish per-doc
   cost across scales.
2. **Keep decisions are scale-invariant** — the rules read only
   per-document evidence, so the same document must get the same
   verdict in a 16× corpus: kept counts are an exact multiple of the
   1× kept counts, and a spot-check set of (doc → keep) pairs is
   identical across scales.

Run: python tools/scale_probe_gopher.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.quality import repetition_metrics
from rippledb_spark.session import get_spark

# Three fixed document shapes per id — pass, fail-repetition, fail-short —
# so the expected keep fraction is exactly 1/3 at every scale.
PROSE = (
    "the morning light settles over a quiet harbor while weathered"
    " fishermen haul heavy nets across wooden decks and hungry gulls wheel"
    " above the stone breakwater waiting for scraps of herring that spill"
    " from every crate as the tide turns slowly toward evening when"
    " lanterns begin to glow along the crooked pier where children count"
    " returning sails before supper and trade stories about distant storms"
)


def corpus(spark, n_docs: int):
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 3 == 0,
            # unique tail keeps docs distinct without changing the verdict
            F.concat(F.lit(PROSE + " chapter "), F.col("id").cast("string")),
        )
        .when(
            F.col("id") % 3 == 1,
            # corpus-frequent AND doc-frequent gram: the hot-key shape
            F.concat(
                F.expr("repeat('buy now from our store today ', 20)"),
                F.col("id").cast("string"),
            ),
        )
        .otherwise(F.concat(F.lit("too short "), F.col("id").cast("string")))
        .alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    spark = get_spark(app_name="scale_probe_gopher")
    spark.range(10).count()  # warm

    base_keeps: dict[int, bool] | None = None
    spot_ids = list(range(30))
    for scale in (1, 4, 16):
        docs = corpus(spark, n_docs * scale)
        t0 = time.perf_counter()
        m = repetition_metrics(docs, "text", "doc_id")
        agg = m.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        expect_kept = (n_docs * scale + 2) // 3  # ids ≡ 0 (mod 3)
        per_doc_us = wall / agg["docs"] * 1e6
        spot = {
            r["id"]: r["keep"]
            for r in m.filter(F.col("id").isin(spot_ids)).collect()
        }
        if base_keeps is None:
            base_keeps = spot
        ok = agg["kept"] == expect_kept and spot == base_keeps
        print(
            f"scale {scale:>2}×: docs={agg['docs']:>7} kept={agg['kept']:>7}"
            f" (expect {expect_kept}) wall={wall:.2f}s"
            f" per-doc={per_doc_us:.1f}µs {'OK' if ok else 'MISMATCH'}"
        )
        if not ok:
            raise SystemExit(1)
    spark.stop()


if __name__ == "__main__":
    main()
