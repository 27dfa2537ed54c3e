"""Self-trained bigram language-model scoring (engine tier — the
model-based quality filter of LLM data pipelines, à la CCNet's LM
perplexity gate, trained on the corpus itself instead of shipping an
external model).

Train + score in one job, all relational:

1. TRAIN — corpus token-bigram counts C(a,b) and context counts
   C(a·) = Σ_b C(a,b) (one explode + two hash-aggs), vocabulary size V;
2. MODEL — add-k smoothing: P(b|a) = (C(a,b) + k) / (C(a·) + k·V);
3. SCORE — each document's bigrams join the probability table and fold
   to the per-doc cross-entropy H = avg(-log2 P) (bits per bigram).
   Low H = repetitive/templated text, high H = unusual token sequences
   — both tails are the filter's catch.

Scale shape: the bigram model is one row per DISTINCT corpus bigram —
Zipf-bounded, usually broadcastable; scoring is one equi-join of the
exploded corpus against it plus a per-doc aggregate. No UDFs anywhere;
the DuckDB oracle replays the identical arithmetic, with per-doc 4dp
rounding absorbing float summation-order noise (the char-entropy
convention).

When scoring a HELD-OUT set against a model trained elsewhere, unseen
bigrams take the smoothed unseen mass k / (C(a·) + k·V) via the outer
join's null branch; on train==score data (this module's registered use)
every scored bigram exists in the model by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, a, b) per token-bigram OCCURRENCE (not distinct)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
    )
    return toks.select(
        "id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) < 2 THEN array() "
                "ELSE transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i - 1] as a, t[i] as b)) END"
            )
        ).alias("p"),
    ).select("id", "p.a", "p.b")


def bigram_lm_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    add_k: float = 0.5,
    train_df: DataFrame | None = None,
    train_text_col: str | None = None,
) -> DataFrame:
    """→ DataFrame(id, n_bigrams, h_bits): per-document bigram
    cross-entropy under the add-k model trained on ``train_df``
    (default: the scored corpus itself — the registered-query form).
    Documents with fewer than two tokens are absent (they have no
    bigrams to score).

    With a separate training corpus, scored bigrams the model never saw
    take the smoothed unseen mass k / (C(a·) + k·V) via the left join's
    null branch (a wholly-unseen context a scores k / (k·V) = 1/V); on
    train==score data the branch is provably dead (every scored bigram
    exists in the model)."""
    t_df = df if train_df is None else train_df
    t_col = text_col if train_text_col is None else train_text_col
    bg = _doc_bigrams(df, text_col, id_col)
    train_bg = bg if train_df is None else _doc_bigrams(t_df, t_col, id_col)
    counts = train_bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    context = counts.groupBy("a").agg(F.sum("cab").alias("ctx_ca")).withColumnRenamed(
        "a", "ctx_a"
    )
    vocab = t_df.select(
        F.explode(F.split(F.trim(F.col(t_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "").agg(F.count_distinct("tok").alias("v"))
    # one uniform formula covers all three cases: seen bigram (cab, ca
    # both present), unseen bigram under a seen context (cab null), and
    # wholly-unseen context (both null → k / (k·V) = 1/V)
    scored = (
        bg.join(counts, ["a", "b"], "left")
        .join(context, bg["a"] == F.col("ctx_a"), "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            (
                (F.coalesce("cab", F.lit(0.0)) + F.lit(add_k))
                / (F.coalesce("ctx_ca", F.lit(0.0)) + F.lit(add_k) * F.col("v"))
            ).alias("p"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log2("p")), 4).alias("h_bits"),
        )
    )


def bigram_lm_sql(table: str, text_col: str, id_col: str, add_k: float = 0.5) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` (same arithmetic, same
    4dp round)."""
    return f"""
    WITH bg AS (
      SELECT {id_col} AS id, t[u.i] AS a, t[u.i + 1] AS b
      FROM (SELECT {id_col}, string_split_regex(trim({text_col}), '\\s+') AS t
            FROM {table}),
           UNNEST(range(1, len(t))) AS u(i)
    ),
    counts AS (SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY a, b),
    context AS (SELECT a, SUM(cab) AS ca FROM counts GROUP BY a),
    vocab AS (
      SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT UNNEST(string_split_regex(trim({text_col}), '\\s+')) AS tok
            FROM {table})
      WHERE tok <> ''
    ),
    model AS (
      SELECT c.a, c.b,
             (c.cab + {add_k}) / (x.ca + {add_k} * vocab.v) AS p
      FROM counts c JOIN context x USING (a), vocab
    )
    SELECT bg.id, COUNT(*) AS n_bigrams,
           ROUND(AVG(-LOG2(m.p)), 4) AS h_bits
    FROM bg JOIN model m ON bg.a = m.a AND bg.b = m.b
    GROUP BY bg.id
    """
