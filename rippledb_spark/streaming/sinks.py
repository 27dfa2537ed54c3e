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

from pyspark.sql import DataFrame

from rippledb_spark.operators.merge import merge_upsert


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
        # Probe for the target via the JVM Hadoop FileSystem (works for any
        # scheme the session can read, not just local paths). Only a truly
        # absent target means "first batch"; a transient read error must
        # propagate — swallowing it here would overwrite the snapshot with
        # just the current micro-batch (silent data loss).
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(hpath):
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
