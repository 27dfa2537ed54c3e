"""Document chunking: fixed-token windows AND content-defined chunks.

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


def content_defined_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    w: int = 3,
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking at token granularity (the LBFS/FastCDC
    idea — Muthitacharoen et al. 2001 "A Low-Bandwidth Network File
    System"; Xia et al. 2016 — applied to token streams): a chunk
    boundary falls AFTER token j whenever the hash of the w-token window
    ENDING at j ≡ 0 (mod ``divisor``). Boundaries depend only on local
    CONTENT, so a passage shared between documents re-synchronizes to
    IDENTICAL chunks regardless of where it starts in each document —
    the shift-resilience fixed windows (chunk_by_tokens) lack, and the
    reason storage/transfer dedup systems chunk this way. Expected chunk
    length ≈ ``divisor`` tokens.

    → DataFrame(id, chunk_no, n_chunk_tokens, chunk_hash, chunk_text):
    chunk_hash = md5 of the chunk text, the corpus-wide dedup key.
    Deterministic (md5 boundaries, no RNG) and engine-reproducible.

    Scale shape: all per-document window functions (the gram via w−1
    lags, the boundary flag, one running-sum chunk counter) plus one
    (id, chunk)-keyed ordered reassembly — keyed by doc id throughout,
    uniform at any corpus size; the cross-document dedup the caller runs
    on chunk_hash is one hash-keyed agg."""
    from pyspark.sql import Window

    if w < 1:
        raise ValueError("w must be >= 1")
    if divisor < 2:
        raise ValueError("divisor must be >= 2")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "j", "tok"
        ),
    ).where(F.col("tok") != "")
    ws = Window.partitionBy("id").orderBy("j")
    gram = F.concat_ws(
        " ", *[F.lag("tok", w - 1 - k).over(ws) for k in range(w)]
    )
    cut = (
        (F.col("j") >= w - 1)
        & (
            F.pmod(
                F.conv(F.substring(F.md5(gram), 1, 12), 16, 10).cast(
                    "bigint"
                ),
                F.lit(divisor),
            )
            == 0
        )
    ).cast("int")
    cum = F.sum(F.col("__cut")).over(
        ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = (
        toks.withColumn("__cut", cut)
        .withColumn("chunk_no", (cum - F.col("__cut")).cast("int"))
    )
    return (
        numbered.groupBy("id", "chunk_no")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_chunk_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_no",
            "n_chunk_tokens",
            F.md5("chunk_text").alias("chunk_hash"),
            "chunk_text",
        )
    )


def content_defined_chunks_sql(
    table: str,
    text_col: str,
    id_col: str,
    w: int = 3,
    divisor: int = 16,
) -> str:
    """DuckDB CTE twin; yields ``cdc_chunks`` with the same columns."""
    if w < 1:
        raise ValueError("w must be >= 1")
    if divisor < 2:
        raise ValueError("divisor must be >= 2")
    gram = " || ' ' || ".join(
        f"lag(tok, {w - 1 - k}) OVER (PARTITION BY id ORDER BY j)"
        if w - 1 - k > 0
        else "tok"
        for k in range(w)
    )
    return f"""cdc_toks AS (
      SELECT id, j, tok FROM (
        SELECT {id_col} AS id, u.j - 1 AS j, t[u.j] AS tok
        FROM (SELECT {id_col},
                     string_split(trim(regexp_replace({text_col},
                       '\\s+', ' ', 'g')), ' ') AS t
              FROM {table}),
             UNNEST(range(1, len(t) + 1)) AS u(j)
      ) WHERE tok <> ''
    ),
    cdc_cut AS (
      SELECT id, j, tok,
             CASE WHEN j >= {w - 1}
                  AND CAST(('0x' || substr(md5({gram}), 1, 12)) AS BIGINT)
                      % {divisor} = 0
                  THEN 1 ELSE 0 END AS cut
      FROM cdc_toks
    ),
    cdc_num AS (
      SELECT id, j, tok,
             CAST(SUM(cut) OVER (PARTITION BY id ORDER BY j
                    ROWS UNBOUNDED PRECEDING) - cut AS INT) AS chunk_no
      FROM cdc_cut
    ),
    cdc_chunks AS (
      SELECT id AS {id_col}, chunk_no,
             CAST(COUNT(*) AS INT) AS n_chunk_tokens,
             md5(string_agg(tok, ' ' ORDER BY j)) AS chunk_hash,
             string_agg(tok, ' ' ORDER BY j) AS chunk_text
      FROM cdc_num GROUP BY id, chunk_no
    )"""
