"""Round-13 pipeline queries: batched BPE merge learning, perceptual
image near-dup (aHash/dHash + banded Hamming), and audio fingerprint
dedup — the r12 VERDICT's three ranked gaps, each oracle-certified."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.operators import audiohash as AH
from rippledb_spark.operators import imagehash as IH
from rippledb_spark.operators.bpe import bpe_oracle_sql
from rippledb_spark.registry import query
from rippledb_spark.tables import load


@query(
    "bpe_batched_merge_learning",
    oracle=bpe_oracle_sql(8, 2),
)
def bpe_batched_merge_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED BPE merge learning (operators/bpe.py, r13 — VERDICT
    missing #1: the sequential learner's one-job-per-merge loop makes a
    32k-merge production vocabulary 32k driver round-trips). Each round
    scans the top-32 ranked pairs and accepts a provably-independent
    prefix (input-disjoint, collision-free, strict count cap), applying
    several merges per corpus pass. The ORACLE is the SEQUENTIAL
    learner's unrolled SQL — the acceptance rule guarantees the batched
    trajectory is byte-identical to sequential, so a green row certifies
    both the batching theorem and its implementation: any over-eager
    batch (a merge accepted out of true sequential order, a count taken
    at the wrong table state) changes some row's pair or count."""
    from rippledb_spark.operators.bpe import learn_bpe_merges_batched

    d = load(spark, sf_dir, "documents")
    merges, _, _rounds = learn_bpe_merges_batched(
        d, "text", n_merges=8, min_pair_count=2, scan=32
    )
    return spark.createDataFrame(
        merges, "round int, left_sym string, right_sym string, pair_count long"
    ).orderBy("round")


@query(
    "image_phash_accounting",
    oracle=f"""
    WITH {IH.ahash_sql()},
    {IH.dhash_sql()}
    SELECT a.media_id,
           a.hash_hi AS ahash_hi, a.hash_lo AS ahash_lo,
           d.hash_hi AS dhash_hi, d.hash_lo AS dhash_lo
    FROM ih_ahash a JOIN ih_dhash d ON d.media_id = a.media_id
    ORDER BY a.media_id
    """,
)
def image_phash_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashes over REAL decoded pixels (r13, VERDICT
    missing #2): synthesize group-keyed grayscale PNGs with planted
    near-duplicate structure, run the full decode pipeline (chunk walk →
    zlib inflate → unfilter → nearest resample) inside Arrow
    mapInPandas, and compute aHash (8×8, bit = pix·64 ≥ Σpix) and dHash
    (9×8, bit = left > right) as pure column expressions. The oracle
    recomputes every resampled pixel in closed form and repacks both
    64-bit hashes bit for bit — a single mis-decoded pixel, resample
    index, threshold tie, or packing-order slip flips a hash value."""
    d = load(spark, sf_dir, "documents")
    media = IH.synthesize_group_pngs(d, "doc_id")
    ah = IH.ahash_images(media).select(
        "media_id",
        F.col("hash_hi").alias("ahash_hi"),
        F.col("hash_lo").alias("ahash_lo"),
    )
    dh = IH.dhash_images(media).select(
        "media_id",
        F.col("hash_hi").alias("dhash_hi"),
        F.col("hash_lo").alias("dhash_lo"),
    )
    return ah.join(dh, "media_id").orderBy("media_id")


@query(
    "image_phash_dedup_accounting",
    oracle=f"""
    WITH {IH.ahash_sql()},
    {IH.hamming_pairs_sql("ih_ahash")}
    SELECT CAST(id_a % 50 AS BIGINT) AS grp,
           COUNT(*) AS n_pairs,
           CAST(SUM(hamming) AS BIGINT) AS hamming_total,
           CAST(SUM(CASE WHEN hamming = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN id_b % 50 <> id_a % 50 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cross_group
    FROM ih_pairs GROUP BY id_a % 50 ORDER BY grp
    """,
)
def image_phash_dedup_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup PAIR detection via banded Hamming blocking
    (r13): aHash the planted-group PNG corpus, split each 64-bit hash
    into 4×16-bit bands, bucket-join on any equal band, and gate on
    exact Hamming ≤ 3 (pigeonhole: the blocking is EXHAUSTIVE at that
    radius — no missed pair, unlike probabilistic LSH). Accounting is
    per planted group: pair count, Hamming mass, exact-duplicate count,
    and cross-group leakage (a non-zero n_cross_group for a group means
    two different gradients collided — possible, certified, counted).
    The oracle replays synthesis → hash → banding → pairs → accounting
    entirely in SQL."""
    d = load(spark, sf_dir, "documents")
    media = IH.synthesize_group_pngs(d, "doc_id")
    pairs = IH.hamming_pairs(IH.ahash_images(media))
    return (
        pairs.groupBy((F.col("id_a") % 50).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("hamming").cast("bigint").alias("hamming_total"),
            F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.sum(
                F.when(F.col("id_b") % 50 != F.col("id_a") % 50, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_cross_group"),
        )
        .orderBy("grp")
    )


@query(
    "image_phash_survivors_accounting",
    oracle=f"""
    WITH {IH.ahash_sql()},
    ih_reps AS (
      SELECT hash_hi, hash_lo, MIN(media_id) AS media_id
      FROM ih_ahash GROUP BY hash_hi, hash_lo
    ),
    {IH.hamming_pairs_sql("ih_reps")},
    ih_drops AS (
      SELECT media_id FROM ih_ahash a
      WHERE media_id <> (SELECT MIN(media_id) FROM ih_ahash r
                         WHERE r.hash_hi = a.hash_hi
                           AND r.hash_lo = a.hash_lo)
      UNION
      SELECT id_b AS media_id FROM ih_pairs
    )
    SELECT CAST(a.media_id % 50 AS BIGINT) AS grp,
           COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN d.media_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN d.media_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_survivors
    FROM ih_ahash a LEFT JOIN ih_drops d ON d.media_id = a.media_id
    GROUP BY a.media_id % 50 ORDER BY grp
    """,
)
def image_phash_survivors_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The production DEDUP DECISION over perceptual hashes (r13):
    exact-hash clusters collapse to a min-id representative FIRST (the
    scale guard — an m-way exact cluster costs one banding row, not
    C(m,2) bucket pairs), then banded Hamming pairs over representatives
    only, then the greedy min-id-keeps drop rule. Accounting per planted
    group: items, dropped, survivors. The oracle replays collapse →
    banding → drops in SQL — an over- or under-dropped item anywhere
    shifts a group's survivor count."""
    d = load(spark, sf_dir, "documents")
    media = IH.synthesize_group_pngs(d, "doc_id")
    hashes = IH.ahash_images(media)
    drops = IH.near_dup_drops(hashes).withColumn("dropped", F.lit(1))
    return (
        hashes.join(drops, "media_id", "left")
        .groupBy((F.col("media_id") % 50).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.when(F.col("dropped").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.sum(F.when(F.col("dropped").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_survivors"),
        )
        .orderBy("grp")
    )


@query(
    "video_phash_dedup_accounting",
    oracle=f"""
    WITH {IH.video_ahash_sql()},
    {IH.hamming_pairs_sql("vh_ahash")}
    SELECT CAST(id_a % 50 AS BIGINT) AS grp,
           COUNT(*) AS n_pairs,
           CAST(SUM(hamming) AS BIGINT) AS hamming_total,
           CAST(SUM(CASE WHEN hamming = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN id_b % 50 <> id_a % 50 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cross_group
    FROM ih_pairs GROUP BY id_a % 50 ORDER BY grp
    """,
)
def video_phash_dedup_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO perceptual near-dup (r13 — the third modality on the same
    blocking operator): synthesize group-keyed AVIs (DIB and RLE8 paths
    both exercised), decode every frame for real, aHash each frame, and
    fingerprint the video as the TEMPORAL MAJORITY of its per-frame bit
    vectors (2·Σ b ≥ n_frames), then banded-Hamming pairs + per-group
    accounting exactly as the image and audio tiers. The oracle replays
    frame synthesis → resample → per-frame bits → majority → packing →
    banding → pairs in SQL — a single mis-decoded RLE8 run in any frame
    of any video shifts some group's row."""
    d = load(spark, sf_dir, "documents")
    media = IH.synthesize_group_avis(d, "doc_id")
    pairs = IH.hamming_pairs(IH.video_ahash(media))
    return (
        pairs.groupBy((F.col("id_a") % 50).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("hamming").cast("bigint").alias("hamming_total"),
            F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.sum(
                F.when(F.col("id_b") % 50 != F.col("id_a") % 50, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_cross_group"),
        )
        .orderBy("grp")
    )


@query(
    "audio_fingerprint_dedup_accounting",
    oracle=f"""
    WITH {AH.audio_fingerprint_sql()},
    {IH.hamming_pairs_sql("ah_fp")}
    SELECT CAST(id_a % 50 AS BIGINT) AS grp,
           COUNT(*) AS n_pairs,
           CAST(SUM(hamming) AS BIGINT) AS hamming_total,
           CAST(SUM(CASE WHEN hamming = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN id_b % 50 <> id_a % 50 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cross_group
    FROM ih_pairs GROUP BY id_a % 50 ORDER BY grp
    """,
)
def audio_fingerprint_dedup_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio fingerprint near-dup detection (r13, VERDICT missing #3):
    synthesize group-keyed mono PCM WAVs with planted near-duplicate
    structure, decode REAL samples in Arrow mapInPandas, fingerprint by
    64 frame-energy delta bits (the Haitsma-Kalker shape with integer
    Σ s² energies so both engines compare exact integers), and find
    pairs with the SAME banded-Hamming operator the image tier uses —
    one blocking implementation, two modalities. Accounting per planted
    group, as in image_phash_dedup_accounting."""
    d = load(spark, sf_dir, "documents")
    media = AH.synthesize_group_wavs(d, "doc_id")
    pairs = IH.hamming_pairs(AH.audio_fingerprints(media))
    return (
        pairs.groupBy((F.col("id_a") % 50).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("hamming").cast("bigint").alias("hamming_total"),
            F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.sum(
                F.when(F.col("id_b") % 50 != F.col("id_a") % 50, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_cross_group"),
        )
        .orderBy("grp")
    )
