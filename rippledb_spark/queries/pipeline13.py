"""Round-15 pipeline queries: GIF compositing (offset partial frames,
local color tables, disposal methods) through the one video-fingerprint
pipeline, progressive JPEG through the one image pipeline, and the
strengthened sink dedup gates — the r14 VERDICT's ranked asks, each
oracle-certified."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.operators import imagehash as IH
from rippledb_spark.queries.pipeline12 import _per_group_pair_accounting
from rippledb_spark.registry import query
from rippledb_spark.tables import load


@query(
    "progressive_jpeg_phash_accounting",
    oracle=f"""
    WITH {IH.mixed_ahash_sql()},
    {IH.hamming_pairs_sql("mx_ahash")}
    SELECT LEAST((id_a // 100) % 2, (id_b // 100) % 2) AS fmt_lo,
           GREATEST((id_a // 100) % 2, (id_b // 100) % 2) AS fmt_hi,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN hamming = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN id_a % 100 = id_b % 100 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_same_gv,
           CAST(SUM(CASE WHEN id_a % 100 = id_b % 100 AND hamming = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_same_gv_exact,
           CAST(SUM(hamming) AS BIGINT) AS hamming_total
    FROM ih_pairs
    GROUP BY fmt_lo, fmt_hi ORDER BY fmt_lo, fmt_hi
    """,
)
def progressive_jpeg_phash_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROGRESSIVE JPEG through the one image-fingerprint pipeline
    (r15, VERDICT #1 — the top-ranked ask: a large share of real web
    JPEGs are progressive and previously fell out as decode_ok = false,
    invisible to both features and dedup): the SAME block-constant
    pixel field ships as a BASELINE encode and a PROGRESSIVE encode
    (SOF2 — DC first/refine + two AC spectral bands first/refine, all
    four Annex G scan types on the wire), both decode through the
    format-dispatched decoder, aHash, banded pairs. Accounting per
    unordered STREAM-SHAPE pair class: the (0,1) row's n_same_gv ==
    n_same_gv_exact certifies every baseline-vs-progressive re-encode
    of one field paired at Hamming 0 — which only happens if the
    multi-scan entropy decode (spectral bands, successive-approximation
    refinement, EOBn runs) reproduces the exact coefficients the
    sequential scan carries. The oracle replays the closed-form field →
    hash → banding → pairs; the stream shape never enters the formula —
    that IS the planted claim."""
    d = load(spark, sf_dir, "documents")
    media = IH.synthesize_progressive_jpeg_pairs(d, "doc_id")
    pairs = IH.hamming_pairs(IH.ahash_images(media))
    fa = F.expr("(id_a div 100) % 2")
    fb = F.expr("(id_b div 100) % 2")
    same_gv = F.col("id_a") % 100 == F.col("id_b") % 100
    return (
        pairs.select(
            F.least(fa, fb).alias("fmt_lo"),
            F.greatest(fa, fb).alias("fmt_hi"),
            "hamming",
            same_gv.alias("same_gv"),
        )
        .groupBy("fmt_lo", "fmt_hi")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.sum(F.when(F.col("same_gv"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_same_gv"),
            F.sum(
                F.when(F.col("same_gv") & (F.col("hamming") == 0), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_same_gv_exact"),
            F.sum("hamming").cast("bigint").alias("hamming_total"),
        )
        .orderBy("fmt_lo", "fmt_hi")
    )


@query(
    "gif_composite_phash_accounting",
    oracle=f"""
    WITH {IH.composite_gif_ahash_sql()},
    {IH.hamming_pairs_sql("cg_ahash")}
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
def gif_composite_phash_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSITED animated-GIF perceptual near-dup (r15, VERDICT #4:
    real web GIFs ship offset partial-frame updates, local color
    tables, and disposal methods — the r14 path refused them, dropping
    the web's most common short-loop container from the dedup screen):
    synthesize group-keyed GIFs whose frames 1..nf-1 are 8×8 TILES at
    planted offsets — odd tiles through a ROTATED identity-gray LOCAL
    palette with disposal 3 (restore previous), even tiles through the
    global table with disposal 1 — composite every displayed frame for
    real (imagehash.composite_gif_luma_frames), temporal-majority aHash
    (the SAME video_ahash every container rides), banded pairs,
    per-group accounting. The oracle replays the composited closed form
    — which tile is visible in which displayed frame under the disposal
    pattern, and the local-table rotation cancelling against the
    pre-rotated indices — so one ignored offset, palette, or restore
    flips a fingerprint and the row goes red."""
    d = load(spark, sf_dir, "documents")
    media = IH.synthesize_composited_gifs(d, "doc_id")
    pairs = IH.hamming_pairs(IH.video_ahash(media))
    return _per_group_pair_accounting(pairs, 50)
