"""Scale probe: batched BPE merge learning (r13, VERDICT missing #1).

Asserts its own invariants on the sf0.01 documents corpus:

1. EXACTNESS at depth: a 64-merge batched run equals the sequential
   trajectory merge-for-merge, count-for-count (the production claim is
   32k merges; 64 exercises dozens of batch boundaries, conflict caps,
   and created-symbol collisions on real text).
2. JOB REDUCTION: the batched learner uses strictly fewer pair-count
   jobs than merges learned (the whole point), and reports the ratio —
   the number that scales to a 32k-merge vocabulary's driver-trip
   count.
3. MONOTONE DEGRADATION: with scan=2 (the worst useful horizon) the
   batched learner still equals sequential, at worst one job per merge.

Run: python tools/scale_probe_bpe_batched.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from rippledb_spark.operators.bpe import (  # noqa: E402
    learn_bpe_merges,
    learn_bpe_merges_batched,
)
from rippledb_spark.session import get_spark  # noqa: E402
from rippledb_spark.tables import load  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="scale_probe_bpe_batched")
    d = load(spark, sf_dir, "documents")

    t0 = time.perf_counter()
    seq, _ = learn_bpe_merges(d, "text", n_merges=64, min_pair_count=2)
    seq_sec = time.perf_counter() - t0
    print(f"sequential: {len(seq)} merges, {len(seq)}+1 jobs, {seq_sec:.1f}s")

    t0 = time.perf_counter()
    bat, _, rounds = learn_bpe_merges_batched(
        d, "text", n_merges=64, min_pair_count=2, scan=32
    )
    bat_sec = time.perf_counter() - t0
    assert bat == seq, "batched trajectory diverged from sequential"
    assert rounds < len(bat), (
        f"no job reduction: {rounds} jobs for {len(bat)} merges"
    )
    print(
        f"batched(scan=32): {len(bat)} merges in {rounds} jobs "
        f"(mean batch {len(bat) / rounds:.2f}), {bat_sec:.1f}s "
        f"({seq_sec / max(bat_sec, 1e-9):.2f}x)"
    )
    print(
        f"32k-vocab projection: sequential 32000 jobs -> batched "
        f"~{int(32000 / (len(bat) / rounds))} jobs at this corpus' batch rate"
    )

    t0 = time.perf_counter()
    worst, _, worst_rounds = learn_bpe_merges_batched(
        d, "text", n_merges=16, min_pair_count=2, scan=2
    )
    assert worst == seq[:16], "scan=2 trajectory diverged"
    assert worst_rounds <= 17
    print(
        f"batched(scan=2, 16 merges): exact, {worst_rounds} jobs, "
        f"{time.perf_counter() - t0:.1f}s"
    )

    # greedy mode (exact=False): the production 32k-vocab path — batches
    # near the scan width; trajectory may reorder interacting merges
    t0 = time.perf_counter()
    greedy, _, greedy_rounds = learn_bpe_merges_batched(
        d, "text", n_merges=64, min_pair_count=2, scan=32, exact=False
    )
    greedy_sec = time.perf_counter() - t0
    assert len(greedy) == 64
    assert greedy_rounds * 4 <= len(greedy), (
        f"greedy mode failed to batch: {greedy_rounds} jobs for 64 merges"
    )
    overlap = len({(m[1], m[2]) for m in greedy} & {(m[1], m[2]) for m in seq})
    print(
        f"greedy(scan=32): 64 merges in {greedy_rounds} jobs "
        f"(mean batch {64 / greedy_rounds:.1f}), {greedy_sec:.1f}s "
        f"({seq_sec / max(greedy_sec, 1e-9):.2f}x vs sequential); "
        f"{overlap}/64 merges shared with the exact trajectory"
    )
    print(
        f"32k-vocab projection (greedy): ~{int(32000 / (64 / greedy_rounds))}"
        " jobs"
    )
    print("PROBE OK")


if __name__ == "__main__":
    main()
