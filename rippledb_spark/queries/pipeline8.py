"""Pipeline query batch 8 (r10), each oracle-checked end to end:

- two-stage ANN retrieval (IVF-PQ ADC shortlist → exact re-rank —
  FAISS's refine step, operators/pq.ivfpq_rerank_topk);
- paragraph-level dedup, TIFF LZW decode, crawl-frontier redirect
  composition (added below as the round progresses).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.operators import pq as PQ
from rippledb_spark.registry import query
from rippledb_spark.tables import load

# same index params as ivfpq_ann_topk (pipeline7) so the two rows are
# directly comparable; shortlist R=15 » topk=5 is where the re-rank
# effect shows (the ADC ordering's 6-15 band gets a second chance)
_RERANK_CTE = PQ.ivfpq_rerank_sql(
    "embeddings", "embedding", "vec_id", dims=64, ncells=4, nprobe=2,
    m=8, k=16, shortlist=15,
)


@query(
    "ivfpq_rerank_topk",
    oracle=f"""
    WITH {_RERANK_CTE.strip()}
    SELECT q_pid, rank, pid, cell, adc_rank, exact_d2, in_exact_topk
    FROM ivfpq_rerank ORDER BY q_pid, rank
    """,
)
def ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN retrieval (operators/pq.ivfpq_rerank_topk, r10 —
    FAISS's refine step on top of the r9 IVF-PQ index): ADC ranks a
    shortlist of R=15 candidates per query from the probed cells, those
    R·nq full vectors are fetched by pid (broadcast semi-join — the
    exact arithmetic runs on R·nq rows, never corpus×queries), and the
    top-5 is the exact full-dimension re-rank of the shortlist. Recall
    is tunable via R instead of fixed by ADC quantization error, and
    provably ≥ plain ADC's on the same corpus (true neighbors beat all
    non-neighbors on exact distance, so every true-top-k member the
    shortlist caught survives the re-rank — pinned by
    tests/test_pq.py). The oracle replays the whole chain — coarse
    routing, residual codebooks, ADC shortlist, exact re-rank, and the
    certification twin — in one DuckDB CTE chain."""
    e = load(spark, sf_dir, "embeddings")
    return PQ.ivfpq_rerank_topk(
        e, "embedding", "vec_id", dims=64, ncells=4, nprobe=2, m=8,
        k=16, shortlist=15,
    )


from rippledb_spark.operators import multimodal as MM  # noqa: E402


@query(
    "tiff_lzw_pixel_accounting",
    oracle="""
    WITH shp AS (
      SELECT doc_id,
             CAST(5 + doc_id % 6 AS BIGINT) AS w,
             CAST(3 + doc_id % 4 AS BIGINT) AS h,
             CASE WHEN doc_id % 4 IN (0, 3) THEN 5 ELSE 0 END AS xc
      FROM documents
    ),
    px AS (
      SELECT doc_id,
             k,
             (7 * doc_id + 3 * (k // w) + xc * (k % w)) % 256 AS p
      FROM shp, UNNEST(range(0, w * h)) AS u(k)
    )
    SELECT s.doc_id AS media_id,
           CAST(MIN(s.w) AS INT) AS width,
           CAST(MIN(s.h) AS INT) AS height,
           (MIN(s.doc_id) % 2 = 1) AS predictor2,
           CAST(SUM(x.p) AS BIGINT) AS pixel_sum,
           CAST(SUM((x.k + 1) * x.p) AS BIGINT) AS pixel_wsum
    FROM shp s JOIN px x ON x.doc_id = s.doc_id
    GROUP BY s.doc_id ORDER BY media_id
    """,
)
def tiff_lzw_pixel_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL LZW-TIFF decode (operators/multimodal.tiff_lzw_decode, r10 —
    TIFF 6.0 §13, the other common scanned-corpus compression, with the
    §14 horizontal-differencing Predictor=2): synthesize LZW TIFFs
    cycling Predictor 1/2 × little/big endian × one/two strips with
    id-arithmetic pixel content (xc=0 rows are constant — long LZW runs;
    xc=5 rows vary — fresh table entries), decode every payload back
    (MSB-first variable-width codes, EARLY 9→10→11→12 width changes at
    510/1022/2046, table reset on ClearCode, per-row cumulative-sum
    undifferencing), and report raw + position-weighted pixel digests.
    TIFF LZW is lossless, so the oracle recomputes every decoded pixel
    in closed form: a width-schedule slip, a missed reset, a strip
    misassembled, or an undifferencing error changes a sum, and any
    pixel REORDERING changes pixel_wsum. Distinct from GIF's LZW
    (decode_gif_lzw) in bit order, width schedule, and framing — a
    sibling decoder, not a reuse. The coprime id moduli (2/3/4) hit
    every predictor×endian×strip corner by construction (the r8 ADVICE
    lesson). Reference comparison: n/a (no binary surface).

    100 TB shape: one Arrow mapInPandas where the payloads live; one
    row per image; no shuffle before the final sort."""
    d = load(spark, sf_dir, "documents")
    media = MM.synthesize_tiffs_lzw(d, "doc_id")
    return MM.tiff_lzw_pixel_stats(media).orderBy("media_id")
