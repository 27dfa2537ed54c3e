"""LLM training-data pipeline queries, part 3: embedding near-dup pairs,
language-ID confusion, corpus histograms, funnel/retention analytics,
n-gram profiles, and cross-source duplicate detection.

Engine-tier surface (the reference has no scalar/pipeline tier at all —
SURVEY §2.4); every query here is pure JVM expression trees (no Python in
the loop) with a DuckDB oracle twin built from the same shared constants
(functions/text.py, functions/vector.py, operators/dedup.py).

Scale notes inline. Common theme: self-joins are always blocked (label
buckets, shingle buckets) — never global all-pairs; histograms aggregate
to fixed-cardinality keys; timestamps only feed comparisons/bucketing, so
micro-vs-nano representation differences between engines cannot leak into
output values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from rippledb_spark.functions import text as TX
from rippledb_spark.functions import vector as V
from rippledb_spark.operators.dedup import shingles, shingles_sql
from rippledb_spark.registry import query
from rippledb_spark.tables import load


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    SELECT id_a, id_b, cos_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({V.cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.3
    ORDER BY id_a, id_b
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs above a cosine threshold, blocked by label.

    The threshold-pair complement of knn_blocked_top1: near-dup CANDIDATE
    LISTS rather than per-vector argmax. The self-join is label-blocked —
    cost is Σ n_label², never n² globally; at 100 TB the label column is
    any cheap blocking key (LSH bucket, shard, language). Threshold is
    applied to the 6dp-rounded value on both engines so a last-ulp
    difference cannot flip a boundary pair."""
    e = load(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("label").alias("__bl"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__va"),
    )
    b = e.select(
        F.col("label").alias("__bl2"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__vb"),
    )
    cos = F.round(
        V.cosine(V.as_double_array("__va"), V.as_double_array("__vb")), 6
    )
    return (
        a.join(b, (a.__bl == b.__bl2) & (a.id_a < b.id_b))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.3)
        .orderBy("id_a", "id_b")
    )


@query(
    "lang_confusion_matrix",
    oracle=f"""
    SELECT lang AS claimed, {TX.lang_guess_sql('text')} AS guessed,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY claimed, guessed
    ORDER BY claimed, guessed
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the corpus's claimed language label vs the
    heuristic language ID — the standard audit before trusting either
    side as a training-data filter. One scan, one agg on a tiny
    (lang × lang) key space; the classifier is a pure codegen'd CASE
    expression (functions/text.py builds both engines from one marker
    table)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("claimed"),
            TX.lang_guess("text").alias("guessed"),
        )
        .groupBy("claimed", "guessed")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("claimed", "guessed")
    )


@query(
    "doc_length_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(n_chars / 50) * 50 AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(ROUND(AVG({TX.token_count_sql('text')}), 4) AS DOUBLE)
             AS avg_tokens
    FROM documents
    GROUP BY bucket_lo ORDER BY bucket_lo
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length histogram (50-char buckets) with mean token count per
    bucket — the first plot of any data-quality pass. Integer bucket
    arithmetic (no fp boundaries), fixed-cardinality agg key."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            (F.floor(F.col("n_chars") / 50) * 50).cast("bigint").alias("bucket_lo"),
            TX.token_count("text").alias("__tok"),
        )
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__tok"), 4).cast("double").alias("avg_tokens"),
        )
        .orderBy("bucket_lo")
    )


@query(
    "stopword_density_deciles",
    oracle=f"""
    SELECT CAST(LEAST(FLOOR(10.0 * (CAST({TX.stopword_count_sql('text')} AS DOUBLE)
                                    / {TX.token_count_sql('text')})), 9) AS BIGINT)
             AS decile,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY decile ORDER BY decile
    """,
)
def stopword_density_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document counts per stopword-density decile — the quality-filter
    calibration histogram (which decile cut keeps how much data). Both
    engines compute the identical double expression 10.0·(stop/tok), so
    the floor is taken on bit-identical values; decile 10 (ratio exactly
    1.0) folds into 9."""
    d = load(spark, sf_dir, "documents")
    ratio = TX.stopword_count("text").cast("double") / TX.token_count("text")
    decile = F.least(F.floor(F.lit(10.0) * ratio), F.lit(9)).cast("bigint")
    return (
        d.select(decile.alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("decile")
    )


@query(
    "event_funnel_conversion",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    )
    SELECT '1_view' AS stage, CAST(COUNT(t_view) AS BIGINT) AS users FROM u
    UNION ALL
    SELECT '2_view_click' AS stage,
           CAST(SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT)
             AS users FROM u
    UNION ALL
    SELECT '3_view_click_buy' AS stage,
           CAST(SUM(CASE WHEN t_view < t_click AND t_click < t_buy
                    THEN 1 ELSE 0 END) AS BIGINT) AS users FROM u
    ORDER BY stage
    """,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: users whose FIRST view
    precedes their first click precedes their first purchase. One shuffle
    on user_id folds the three first-touch timestamps in a single
    conditional-MIN pass; the three funnel stages then reduce to one row
    each (stack, no second scan of events). Timestamps feed only MIN and
    <, so they never appear in the output."""
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    stages = u.agg(
        F.count("t_view").alias("s1"),
        F.sum(F.when(F.col("t_view") < F.col("t_click"), 1).otherwise(0)).alias("s2"),
        F.sum(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_buy")),
                1,
            ).otherwise(0)
        ).alias("s3"),
    )
    return stages.select(
        F.expr(
            "stack(3, '1_view', s1, '2_view_click', s2, '3_view_click_buy', s3) "
            "AS (stage, users)"
        )
    ).orderBy("stage")


@query(
    "user_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0 FROM events GROUP BY user_id
    )
    SELECT CAST(date_trunc('month', f.d0) AS DATE) AS cohort_month,
           CAST(FLOOR(date_diff('day', f.d0, CAST(e.ts AS DATE)) / 7)
                AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY cohort_month, week_offset
    ORDER BY cohort_month, week_offset
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-seen month,
    counted distinct in each 7-day offset window from their own day-0.
    The firsts relation is per-user (one agg on the same user_id key the
    join reuses — AQE sees one exchange family); week arithmetic is pure
    integer day-diff, immune to engine week-start conventions."""
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(F.min("ts").cast("date").alias("d0"))
    return (
        e.join(firsts, "user_id")
        .select(
            F.date_trunc("month", F.col("d0")).cast("date").alias("cohort_month"),
            F.floor(F.datediff(F.col("ts").cast("date"), F.col("d0")) / 7)
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_month", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_month", "week_offset")
    )


@query(
    "embedding_norm_extremes",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
    FROM embeddings
    ORDER BY l2_norm DESC, vec_id LIMIT 10
    """,
)
def embedding_norm_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 embeddings by L2 norm — the outlier screen run before
    cosine-based dedup (norm outliers distort every similarity score).
    Pure expression norm + TakeOrderedAndProject: no shuffle at all, each
    partition ships only its local top-10."""
    e = load(spark, sf_dir, "embeddings")
    norm = F.round(V.norm(V.as_double_array("embedding")), 6)
    return (
        e.select("vec_id", "label", norm.alias("l2_norm"))
        .orderBy(F.desc("l2_norm"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "token_bigram_doc_frequency",
    oracle=f"""
    SELECT bigram, COUNT(*) AS doc_freq
    FROM (SELECT unnest({shingles_sql('text', 2)}) AS bigram FROM documents)
    GROUP BY bigram
    ORDER BY doc_freq DESC, bigram LIMIT 20
    """,
)
def token_bigram_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token bigrams by DOCUMENT frequency (each doc counts a
    bigram once — shingles() emits distinct shingles per doc), the raw
    input to collocation scoring and tokenizer-merge audits. Explode →
    one hash-agg with map-side partials; top-k via TakeOrdered, no global
    sort."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(shingles("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "char_trigram_lang_profile",
    oracle="""
    SELECT lang, trigram, n FROM (
      SELECT lang, trigram, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, trigram) AS rn
      FROM (
        SELECT lang, trigram, COUNT(*) AS n
        FROM (
          SELECT lang, unnest(list_transform(
                   range(1, GREATEST(LENGTH(lower(text)) - 1, 1)),
                   i -> substring(lower(text), i, 3))) AS trigram
          FROM documents
        )
        GROUP BY lang, trigram
      )
    ) WHERE rn <= 5
    ORDER BY lang, n DESC, trigram
    """,
)
def char_trigram_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 character trigrams per language — the classic n-gram
    language-ID profile (Cavnar-Trenkle) built corpus-side. Trigram
    explode is a generated sequence over codegen'd substring (no UDF);
    counts aggregate on (lang, trigram) with map-side combine, then one
    tiny per-lang window takes rank ≤ 5. DuckDB's range(a,b) is
    end-exclusive = Spark's sequence(1, len-2) inclusive."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    # the >=3 filter guards the sequence bound: Spark's sequence(1, 0)
    # DESCENDS instead of returning empty (DuckDB's range(1, 1) is empty)
    tri = F.expr(
        "explode(transform(sequence(1, length(lower(text)) - 2), "
        "i -> substring(lower(text), i, 3)))"
    )
    counts = (
        d.select("lang", tri.alias("trigram"))
        .groupBy("lang", "trigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("trigram"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "trigram", "n")
        .orderBy("lang", F.desc("n"), "trigram")
    )


@query(
    "boilerplate_prefix_groups",
    oracle="""
    SELECT md5(substring(text, 1, 30)) AS fp,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           MIN(doc_id) AS first_doc_id
    FROM documents
    GROUP BY fp
    HAVING COUNT(*) >= 2
    ORDER BY n_docs DESC, fp LIMIT 20
    """,
)
def boilerplate_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents sharing a 30-char prefix — the boilerplate/template
    detector of a corpus-cleaning pass (shared headers, scraped nav
    text), with provenance: n_sources separates cross-site mirrors from
    within-crawl repeats. The fingerprint is md5 of the prefix (md5 is
    bit-identical across engines); one fp-keyed agg shuffle, HAVING
    prunes the unique long tail before the top-k."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            F.md5(F.substring("text", 1, 30)).alias("fp"), "source", "doc_id"
        )
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.asc("fp"))
        .limit(20)
    )
