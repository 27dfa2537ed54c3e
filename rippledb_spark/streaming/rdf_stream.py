"""Streaming RDF ingest: N-Triples as a Structured Streaming source.

Bridges the parity tier (the reference's bulk `Graph::from_rdf`,
graph.rs:223-330, is batch-only) with the engine's streaming tier: new
`.nt` files landing in a directory stream straight into the partitioned
parquet layout `TripleStore` queries, so a BGP query can run over a
store that is continuously fed.

Scale shape: the file source lists new files per micro-batch and
line-splits them across tasks (N-Triples is line-delimited — exactly why
it is the scale-path format, unlike RDF/XML/Turtle which need one task
per file); parsing runs in the same Arrow-batched mapInPandas kernel the
batch reader uses (stateless → streaming-safe). The sink appends parquet
partitioned by predicate, preserving the store's partition-pruning
contract for bound-predicate patterns.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from rippledb_spark import model
from rippledb_spark.sources.rdfio import parse_ntriples_line


def read_ntriples_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming triples DataFrame from a directory of N-Triples files.

    Malformed lines are skipped (same contract as the batch reader —
    parse_ntriples_line returns None for comments/blank/bad lines).
    """
    import pandas as pd

    lines = spark.readStream.text(path)

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in model.TRIPLES_SCHEMA.fields]
        for pdf in batches:
            out = [
                row
                for row in (parse_ntriples_line(v) for v in pdf["value"])
                if row is not None
            ]
            yield pd.DataFrame(out, columns=cols)

    return lines.mapInPandas(parse_batch, schema=model.TRIPLES_SCHEMA)


def read_nquads_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming QUADS DataFrame from a directory of N-Quads files — the
    dataset-tier twin of :func:`read_ntriples_stream`: the SAME stateless
    Arrow kernel as the batch reader (sources/nquads.nquads_parse_batch),
    applied to a file-source stream, so a continuously-fed QuadStore
    layout can serve GRAPH queries between micro-batches."""
    from rippledb_spark.sources.nquads import nquads_parse_batch

    lines = spark.readStream.text(path)
    return lines.mapInPandas(nquads_parse_batch, schema=model.QUADS_SCHEMA)


def start_store_append_sink(
    triples_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Append a streaming triples DataFrame into a TripleStore-compatible
    parquet layout (partitioned by predicate, like
    ``TripleStore.persist_to``). Exactly-once per file via the file
    source + checkpoint; the store stays queryable between batches
    (parquet readers see committed files only). Returns the
    StreamingQuery."""
    writer = (
        triples_stream.writeStream.format("parquet")
        .option("path", store_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("p")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
