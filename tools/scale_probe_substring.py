"""Scaling probe for duplicated_substring_runs (Lee et al. 2021 class).

Three claims for docs/SCALING.md to verify empirically:

1. **A corpus-frequent gram cannot go quadratic** — a boilerplate 5-gram
   planted in EVERY doc makes any pairwise design produce ~n²/2 rows; the
   window-seed design concentrates it into ONE fingerprint counter and the
   duplicated-position volume stays EXACTLY linear in docs (measured).
2. **Per-doc wall time is flat** as the corpus grows 4× (same plan, keys
   are fingerprints/doc ids — no stage sees the corpus crosswise).
3. **Planted cross-doc duplicates are found at every scale** (the planted
   9-token substring reports as a 9-token run in each carrier).

Run: python tools/scale_probe_substring.py [base_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.dedup import duplicated_substring_runs
from rippledb_spark.session import get_spark

BOILER = "all rights reserved contact us"  # 5 tokens, in EVERY doc
SHARED = "the quick brown fox jumps over the lazy dog"  # 9 tokens, in 2% of docs


def corpus(spark, n_docs: int):
    """Every doc: boilerplate 5-gram + unique filler; every 50th pair of
    docs also carries the 9-token SHARED substring (cross-doc planted)."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(BOILER + " "),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(19)),
                    lambda i: F.concat(
                        F.lit("u"), F.col("id").cast("string"), F.lit("x"),
                        i.cast("string"),
                    ),
                ),
            ),
            F.when(F.col("id") % 50 < 2, F.lit(" " + SHARED)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )


def measure(spark, n_docs: int) -> dict:
    docs = corpus(spark, n_docs).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    out = duplicated_substring_runs(docs, "text", "doc_id", n=5)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dup_tokens").alias("dup_tokens"),
        F.sum(F.when(F.col("max_run_tokens") >= 9, 1).otherwise(0)).alias(
            "carriers_with_9run"
        ),
    ).collect()[0]
    wall = time.perf_counter() - t0
    docs.unpersist()
    return {
        "n_docs": agg["n_docs"],
        "dup_tokens": agg["dup_tokens"],
        "carriers": agg["carriers_with_9run"],
        "wall": wall,
        "per_doc_us": 1e6 * wall / n_docs,
    }


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    spark = get_spark(app_name="scale_probe_substring")
    spark.range(10).count()  # warm

    r1 = measure(spark, base)
    r4 = measure(spark, base * 4)
    for tag, r in (("1x", r1), ("4x", r4)):
        print(
            f"{tag}: {r['n_docs']} docs, dup_tokens={r['dup_tokens']},"
            f" 9-run carriers={r['carriers']}, wall={r['wall']:.2f}s,"
            f" per-doc={r['per_doc_us']:.1f}us"
        )

    # claim 1: the planted boilerplate contributes exactly 5 dup tokens per
    # doc (one run) — LINEAR, so total dup volume scales 4x, never n²
    expected_1 = 5 * r1["n_docs"] + 9 * r1["carriers"]
    expected_4 = 5 * r4["n_docs"] + 9 * r4["carriers"]
    assert r1["dup_tokens"] == expected_1, (r1, expected_1)
    assert r4["dup_tokens"] == expected_4, (r4, expected_4)
    assert r4["dup_tokens"] == 4 * r1["dup_tokens"]
    # claim 3: every planted carrier reports its 9-token cross-doc run
    assert r1["carriers"] == 2 * (r1["n_docs"] // 50)
    assert r4["carriers"] == 2 * (r4["n_docs"] // 50)
    # claim 2: per-doc wall flat-ish (allow 2x for fixed overheads/noise)
    assert r4["per_doc_us"] < 2.0 * r1["per_doc_us"], (r1, r4)
    print("OK: linear dup volume under a corpus-wide hot gram, flat per-doc"
          " wall, planted cross-doc runs found at both scales")
    return 0


if __name__ == "__main__":
    sys.exit(main())
