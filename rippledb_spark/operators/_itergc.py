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
import time

from pyspark.sql import DataFrame

# Minimum spacing between the System.gc() calls WE trigger. The Python
# collect below is cheap (~10-50 ms) and is the load-bearing step: it
# drops the Py4J proxies so the JVM side becomes weakly reachable — after
# that, EITHER our next System.gc() or the session's periodic cleaner GC
# (spark.cleaner.periodicGC.interval = 2min, session.py) reclaims the
# blocks. A full System.gc() on a busy multi-GB heap costs 0.5-2 s, and
# r13 measured that paying it on EVERY trainer exit added ~45 s to a
# 57-query bench pass — so the JVM side is rate-limited; staleness is
# bounded by max(this interval, the periodic cleaner) either way.
_JVM_GC_MIN_INTERVAL_S = 60.0
_last_jvm_gc = 0.0


def release_iteration_garbage(df: DataFrame) -> None:
    """Free the block-manager garbage an iterative loop leaves behind.

    One driver ``gc.collect()`` drops the Python-side references to the
    superseded per-iteration checkpoints (without this, even the JVM's
    periodic GC cannot reclaim them — the proxies pin the JVM objects);
    a rate-limited JVM ``System.gc()`` then lets the context cleaner
    unpersist promptly. The DataFrame argument is only used to reach the
    live session; the *returned* checkpoint stays referenced and is
    untouched.
    """
    global _last_jvm_gc
    gc.collect()
    now = time.monotonic()
    if now - _last_jvm_gc < _JVM_GC_MIN_INTERVAL_S:
        return
    try:
        df.sparkSession._jvm.System.gc()
        _last_jvm_gc = now
    except Exception:
        pass  # non-JVM-backed session (e.g. Spark Connect): cleaner handles it
