"""BM25 document ranking (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond") — the retrieval scorer data
pipelines run for corpus search, near-duplicate triage, and
contamination lookups.

Okapi BM25 with the standard +1 idf smoothing (the Lucene form, always
non-negative):

    idf(t)     = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    score(d)   = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))

Determinism contract: tokenization is the module-standard single-space
split; |d| is the token count; avgdl is the corpus mean as a plain
double division; scores ROUND to 6dp before ranking and ties break on
doc id — so the DuckDB oracle replays every factor bit-for-bit (ln and
division are IEEE-identical given identical inputs; the one
order-sensitive sum is over ≤|query| terms, absorbed by the rounding
like the other 6dp contracts).

Scale shape: ONE corpus scan builds (doc, term, tf) for query terms
only (filter before explode aggregation), df and avgdl are tiny
aggregates broadcast back, and the score is one doc-keyed sum — no
shuffle carries more than |matching docs| rows; top-k is
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

SCORE_DP = 6


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """→ DataFrame(rank, doc_id, n_query_terms_hit, score): the corpus
    top-``topk`` for ``query_terms`` under BM25 (6dp-rounded score,
    doc-id tiebreak). Documents matching no term never rank."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__t"),
    ).select("doc_id", "__t", F.size("__t").cast("double").alias("dl"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select(
            "doc_id", "dl", F.explode("__t").alias("term")
        )
        .where(F.col("term").isin(*terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_query_terms_hit"),
        F.round(F.sum("part"), SCORE_DP).alias("score"),
    )
    # top-k FIRST via orderBy().limit() — plans as TakeOrderedAndProject
    # (per-partition heap heads, driver merge of ≤ topk·partitions rows),
    # so no partition ever holds more than topk candidate rows. The rank
    # window then runs over ≤ topk rows, which is why its unpartitioned
    # frame is safe. (r8 ADVICE: the old rank-then-filter window shuffled
    # EVERY matching doc through one partition unless the
    # InferWindowGroupLimit rule happened to rescue it.) The ordering is
    # total (doc_id is unique), so the limit is deterministic.
    top = agg.orderBy(F.col("score").desc(), F.col("doc_id")).limit(topk)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "n_query_terms_hit", "score"
    )


def bm25_topk_batch(
    df: DataFrame,
    text_col: str,
    id_col: str,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Batched BM25 (r9 — the production retrieval shape: MANY queries
    against one corpus in one pass, not one scan per query): ``queries``
    is DataFrame(query_id, term), one row per (query, term); duplicate
    terms within a query dedupe (set semantics, like the single-query
    form). → DataFrame(query_id, rank, doc_id, n_query_terms_hit,
    score): each query's corpus top-``topk`` under the same scoring,
    rounding, and tiebreak contract as :func:`bm25_topk`.

    Scale shape: ONE corpus scan builds (doc, term, tf) for the UNION
    of all query terms (broadcast semi-join gate before the explode
    aggregation); df/avgdl broadcast; scores are one (query, doc)-keyed
    sum after a broadcast join against the (query, term) table. Top-k
    is a query-partitioned rank window — the WindowGroupLimit case
    (per-partition top-k pre-filter; no single partition sees the
    world), which is the correct shape where the single-query form's
    orderBy().limit() cannot apply (docs/PLANS.md, trigram-profile
    note)."""
    q = queries.select(
        F.col("query_id"), F.col("term")
    ).distinct()
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__t"),
    ).select("doc_id", "__t", F.size("__t").cast("double").alias("dl"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    terms = q.select("term").distinct()
    tf = (
        base.select("doc_id", "dl", F.explode("__t").alias("term"))
        .join(F.broadcast(terms), "term", "left_semi")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_query_terms_hit"),
        F.round(F.sum("part"), SCORE_DP).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", "doc_id", "n_query_terms_hit", "score")
    )


def bm25_topk_batch_sql(
    table: str,
    text_col: str,
    id_col: str,
    queries_rel: str,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> str:
    """DuckDB CTE twin of :func:`bm25_topk_batch`; ``queries_rel`` is a
    relation with (query_id, term). Yields ``bm25_batch`` with the same
    five columns."""
    return f"""bb_q AS (
      SELECT DISTINCT query_id, term FROM {queries_rel}
    ),
    bb_base AS (
      SELECT {id_col} AS doc_id,
             string_split({text_col}, ' ') AS t,
             CAST(len(string_split({text_col}, ' ')) AS DOUBLE) AS dl
      FROM {table}
    ),
    bb_stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM bb_base
    ),
    bb_tf AS (
      SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, dl, UNNEST(t) AS term FROM bb_base)
      WHERE term IN (SELECT term FROM bb_q)
      GROUP BY doc_id, dl, term
    ),
    bb_df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM bb_tf GROUP BY term
    ),
    bb_scored AS (
      SELECT q.query_id, t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_query_terms_hit,
             ROUND(SUM(
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * ({k1} + 1.0))
               / (t.tf + {k1} * (1.0 - {b} + {b} * t.dl / s.avgdl))
             ), {SCORE_DP}) AS score
      FROM bb_tf t
      JOIN bb_q q USING (term)
      JOIN bb_df d USING (term), bb_stats s
      GROUP BY q.query_id, t.doc_id
    ),
    bm25_batch AS (
      SELECT query_id, rank, doc_id, n_query_terms_hit, score FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        FROM bb_scored
      ) WHERE rank <= {topk}
    )"""


def bm25_topk_sql(
    table: str,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> str:
    """DuckDB CTE twin; yields ``bm25_topk`` with the same columns."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in sorted(set(query_terms))
    )
    return f"""bm_base AS (
      SELECT {id_col} AS doc_id,
             string_split({text_col}, ' ') AS t,
             CAST(len(string_split({text_col}, ' ')) AS DOUBLE) AS dl
      FROM {table}
    ),
    bm_stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM bm_base
    ),
    bm_tf AS (
      SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, dl, UNNEST(t) AS term FROM bm_base)
      WHERE term IN ({terms})
      GROUP BY doc_id, dl, term
    ),
    bm_df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM bm_tf GROUP BY term
    ),
    bm_scored AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_query_terms_hit,
             ROUND(SUM(
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * ({k1} + 1.0))
               / (t.tf + {k1} * (1.0 - {b} + {b} * t.dl / s.avgdl))
             ), {SCORE_DP}) AS score
      FROM bm_tf t JOIN bm_df d USING (term), bm_stats s
      GROUP BY t.doc_id
    ),
    bm25_topk AS (
      SELECT rank, doc_id, n_query_terms_hit, score FROM (
        SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM bm_scored
      ) WHERE rank <= {topk}
    )"""
