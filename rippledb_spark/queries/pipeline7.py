"""Pipeline query batch 7 (r9), each oracle-checked end to end:

- IVF-PQ approximate nearest neighbor (Jégou et al. 2011 §V — the
  coarse-quantizer + residual product quantization composition that
  production 100 TB vector search actually runs, operators/pq.py);
- ADPCM / G.711 audio decode (operators/multimodal.py);
- forward-backward strongly connected components (operators/graph.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.operators import pq as PQ
from rippledb_spark.registry import query
from rippledb_spark.tables import load

# ncells=4/nprobe=2: the probed half of the corpus is where the prune
# shows; m=8/k=16 matches the flat-PQ registered query so the two rows
# are comparable — the in_exact_topk column reports measured recall
_IVFPQ_CTE = PQ.ivfpq_sql(
    "embeddings", "embedding", "vec_id", dims=64, ncells=4, nprobe=2,
    m=8, k=16,
)


@query(
    "ivfpq_ann_topk",
    oracle=f"""
    WITH {_IVFPQ_CTE.strip()}
    SELECT q_pid, rank, pid, cell, adc_d2, in_exact_topk
    FROM ivfpq_topk ORDER BY q_pid, rank
    """,
)
def ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (operators/pq.ivfpq_topk, r9 — the FAISS IndexIVFPQ
    composition, Jégou et al. 2011 §V): a deterministic coarse k-means
    quantizer routes every vector to a cell, product quantization
    encodes the RESIDUAL v − centroid(cell) with 8 shared codebooks, and
    the 3 lowest-id queries answer their top-5 by probing only their 2
    nearest cells — ADC never touches codes outside the probed cells,
    so scan work is ∝ nprobe/ncells of the corpus, not its size
    (probe receipt: tools/scale_probe_ivfpq.py). The in_exact_topk
    column is the self-verifying recall flag (true full-dimension top-5
    recomputed for the query set). The oracle replays the coarse chain,
    the residual subtraction, all 8 residual Lloyd chains, the probe
    routing, lookup tables, 6dp-rounded ADC sums, and the pid-tiebroken
    ranking in one DuckDB CTE chain — a green row certifies the entire
    route → compress → prune → search composition."""
    e = load(spark, sf_dir, "embeddings")
    return PQ.ivfpq_topk(
        e, "embedding", "vec_id", dims=64, ncells=4, nprobe=2, m=8, k=16
    )
