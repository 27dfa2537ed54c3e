"""Streaming sinks beyond the built-ins: foreachBatch patterns.

Structured Streaming's file sinks are append-only; the upsert sink here is
the canonical foreachBatch pattern for exactly-once-BY-KEY delivery into a
queryable snapshot: each micro-batch MERGEs into the target on the key, so
a replayed batch (failure/retry re-runs the same batch id) lands on the
same keys and the result is unchanged — idempotence replaces transactional
sinks. This is how Spark users target stores without native streaming
transactions (JDBC upserts, Delta MERGE, parquet snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.operators.cdc import apply_changes_guarded
from rippledb_spark.operators.merge import merge_upsert


def snapshot_ready(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds a COMPLETE parquet snapshot.

    Completeness = the committer's ``_SUCCESS`` marker exists, not bare
    directory existence: a crash mid-``mode('overwrite')`` leaves a
    directory that exists yet fails ``spark.read.parquet``, which would
    make every retry of the batch fail permanently. A torn snapshot is
    treated as absent, so the replayed batch rebuilds it (foreachBatch
    re-runs the same batch id — the sink's idempotence contract).

    Probes via the JVM Hadoop FileSystem (any scheme the session can
    read); under Spark Connect (no ``_jvm``) falls back to a local-path
    check.
    """
    try:
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
    except Exception:  # Spark Connect session: no JVM gateway
        import os

        return os.path.exists(os.path.join(path, "_SUCCESS"))
    marker = jvm.org.apache.hadoop.fs.Path(path, "_SUCCESS")
    fs = marker.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.exists(marker))


def start_upsert_parquet_sink(
    stream_df: DataFrame,
    path: str,
    key: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start a foreachBatch query upserting each micro-batch into a parquet
    snapshot at ``path`` keyed by ``key``. Returns the StreamingQuery.

    The read-merge-overwrite cycle materializes the merged batch (eager
    localCheckpoint) BEFORE overwriting, so the write never reads the files
    it is replacing. Single-writer per path, like any snapshot sink.
    """

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Only a COMPLETE snapshot means "merge"; an absent or torn target
        # (see snapshot_ready) means "first/rebuilt batch". A transient
        # read error past the probe must still propagate — swallowing it
        # would overwrite the snapshot with just the current micro-batch
        # (silent data loss).
        if snapshot_ready(spark, path):
            target = spark.read.parquet(path)
            merged = merge_upsert(target, batch_df.select(*target.columns), key)
        else:
            merged = batch_df
        # cut lineage to the files we're about to replace, then overwrite
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)

    writer = (
        stream_df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_cdc_parquet_sink(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    sequence_cols: list[str],
    op_col: str,
    checkpoint_dir: str,
    delete_op: str = "delete",
    trigger_available_now: bool = True,
):
    """Stream a CHANGE FEED (upserts + deletes, ordered by
    ``sequence_cols``) into a parquet snapshot: each micro-batch folds via
    :func:`operators.cdc.apply_changes` — latest change per key wins,
    winning deletes remove the key. Returns the StreamingQuery.

    Exactly-once by key under the foreachBatch replay contract: batches
    replay in order and only the last uncommitted batch re-runs, and
    re-folding a batch into the already-folded snapshot is a no-op
    (upserts rewrite the same rows, deletes re-drop absent keys — the
    incremental-equals-refold property tested in test_cdc). The snapshot
    schema is the change schema minus ``op_col``; torn overwrites read as
    absent via :func:`snapshot_ready` and the replayed batch rebuilds.

    Out-of-order across batches is safe: the fold is
    :func:`operators.cdc.apply_changes_guarded`, which keeps the stored
    row when its sequence beats a late straggler's — "latest change per
    key wins" holds across the whole feed, not just within a micro-batch.
    """

    def _fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if snapshot_ready(spark, path):
            target = spark.read.parquet(path)
        else:
            target = batch_df.drop(op_col).limit(0)
        folded = apply_changes_guarded(
            target,
            batch_df,
            keys=keys,
            sequence_cols=sequence_cols,
            op_col=op_col,
            delete_op=delete_op,
        )
        folded.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)

    writer = (
        stream_df.writeStream.foreachBatch(_fold_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
