"""Block-manager garbage release for iterative DataFrame loops.

Every iterative trainer in this engine ends each round with a
``localCheckpoint`` — the idiomatic lineage-truncation step for a
DataFrame loop. Each checkpoint caches an RDD with no public unpersist
handle; the context cleaner only reclaims them after a *driver* GC, and
Python holds the references until collection. Left alone, a long
analytics session that runs several iterative operators accumulates dead
blocks and per-call latency drifts up 2-3× (measured first on the graph
loops; BENCH_r12 showed the same signature on the trainer keys —
``quality_classifier_accounting``'s warm runs were SLOWER than its cold
run, the tell that session garbage, not the plan, owned the number).

Shared here so *every* iterative operator (graph loops, logistic /
softmax GD, unigram hard-EM, OPQ alternation, PCA power iteration,
Lloyd's k-means, HyperBall) releases its own garbage on the way out —
one explicit collection costs ~100 ms and keeps steady-state flat for
whatever runs next in the session.
"""

from __future__ import annotations

import gc

from pyspark.sql import DataFrame


def release_iteration_garbage(df: DataFrame) -> None:
    """Free the block-manager garbage an iterative loop leaves behind.

    One driver ``gc.collect()`` drops the Python-side references to the
    superseded per-iteration checkpoints, then a JVM ``System.gc()`` lets
    the context cleaner unpersist their blocks immediately instead of at
    the next periodic GC. The DataFrame argument is only used to reach
    the live session; the *returned* checkpoint stays referenced and is
    untouched.
    """
    gc.collect()
    try:
        df.sparkSession._jvm.System.gc()
    except Exception:
        pass  # non-JVM-backed session (e.g. Spark Connect): cleaner handles it
