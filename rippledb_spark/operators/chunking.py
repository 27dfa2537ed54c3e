"""Document chunking: split texts into fixed-token-window chunks.

Engine-tier LLM-pipeline operator (the reference, a Rust triple store,
has no pipeline tier): the context-window preparation step between raw
documents and sequence packing — every document becomes ⌈(n−overlap)/
stride⌉ overlapping windows of ``chunk_tokens`` whitespace tokens.

Scale shape: pure column expressions end to end — tokenize once
(``split``), derive the chunk-count per row arithmetically, 1→N expand
with ``posexplode(sequence(...))`` (inside the task, never a driver
loop), and slice the token array per chunk. No UDF, no shuffle: chunking
is a flatMap-shaped projection, so a 100 TB corpus chunks at scan speed
and the output inherits the input's partitioning (feed it straight into
operators.packing.pack_by_token_budget for batch construction).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def chunk_by_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Explode each row into (id, chunk_no, n_chunk_tokens, chunk_text)
    rows: chunk k covers whitespace tokens [k·stride, k·stride +
    chunk_tokens) with stride = chunk_tokens − overlap; the final chunk
    may be shorter, and a document shorter than one window yields exactly
    one chunk. Deterministic and engine-reproducible (the DuckDB oracle
    twin recomputes identical windows with list_slice)."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride))
    ).cast("int")
    rows = df.select(
        F.col(id_col).alias("id"),
        toks.alias("__toks"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no", "__i"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_no") * stride + 1, F.lit(chunk_tokens)
    )
    return rows.select(
        F.col("id").alias(id_col),
        "chunk_no",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
