"""Pipeline query batch 6 (r8), each oracle-checked end to end:

- real video frame extraction — AVI RIFF container with uncompressed
  DIB, BI_RLE8, and MJPEG (baseline-JPEG entropy coding) frame decode
  (operators/multimodal.py, operators/jpeg.py);
- color JPEG stills (4:4:4 / 4:2:2 / 4:2:0 with restart markers) and
  color PNG (truecolor/palette/RGBA) decode;
- PCM audio analysis (exact integer energy/peak/zero-crossing digests);
- cross-document exact-substring dedup (Lee et al. 2021,
  arXiv:2107.06499);
- product-quantization ANN (Jégou et al. 2011) and symmetric int8
  embedding quantization;
- robots.txt crawl gating (RFC 9309) as pure window/LIKE expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.operators import multimodal as MM
from rippledb_spark.registry import query
from rippledb_spark.tables import load


@query(
    "avi_frame_accounting",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 4 IN (1, 2)),
    dims AS (
      SELECT doc_id,
             CAST(4 + doc_id % 5 AS BIGINT) AS w,
             CAST(3 + doc_id % 3 AS BIGINT) AS h,
             CAST(1 + doc_id % 4 AS BIGINT) AS nf
      FROM ids
    ),
    fr AS (SELECT doc_id, w, h, f FROM dims, UNNEST(range(0, nf, 2)) AS u(f)),
    raw AS (
      SELECT doc_id, f, COUNT(*) AS n_pixels,
             SUM((31 * doc_id + 11 * f + 7 * (p // 3)) % 256) AS pixel_sum
      FROM fr, UNNEST(range(0, w * h)) AS q(p)
      GROUP BY doc_id, f
    ),
    res AS (
      SELECT doc_id, f,
             SUM((i * 4 + j + 1)
                 * ((31 * doc_id + 11 * f
                     + 7 * ((((i * h) // 4) * w + (j * w) // 4) // 3)) % 256))
               AS resized_wsum
      FROM fr, generate_series(0, 3) AS gi(i), generate_series(0, 3) AS gj(j)
      GROUP BY doc_id, f
    )
    SELECT r.doc_id AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames_sampled,
           CAST(MIN(40000 + 100 * (r.doc_id % 7)) AS BIGINT) AS us_per_frame,
           CAST(SUM(r.n_pixels) AS BIGINT) AS total_pixels,
           CAST(SUM(r.pixel_sum) AS BIGINT) AS pixel_sum,
           CAST(SUM(s.resized_wsum) AS BIGINT) AS resized_wsum
    FROM raw r JOIN res s ON r.doc_id = s.doc_id AND r.f = s.f
    GROUP BY r.doc_id ORDER BY media_id
    """,
)
def avi_frame_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame extraction (r8 — the video tier's first real
    codec path): synthesize id-deterministic AVI videos
    (operators.multimodal.encode_avi — RIFF/hdrl/strl/movi walk, the WAV
    decoder's container sibling; even ids uncompressed '00db' DIB frames,
    odd ids BI_RLE8 '00dc'), RIFF-walk them back (decode_avi_frames),
    decode every 2nd frame's pixel field (bottom-up padded DIB rows or
    the full RLE8 spec — runs, absolute, end-of-line/bitmap, delta),
    resize 4×4 via the SAME resize_nearest as the PNG/GIF paths, and
    report closed-form pixel digests per video. The oracle recomputes
    every sampled frame's every pixel — raw AND position-weighted
    resized — plus the avih frame interval from id arithmetic alone, so
    a green row certifies the container writer, both frame codecs, and
    the resample end to end: a run mis-reassembled, a DIB row pad
    miscounted, or a bottom-up flip skipped changes pixel_sum, and any
    pixel REORDERING changes resized_wsum. The id filter keeps BOTH
    parities (doc_id % 4 ∈ {1, 2}) because synthesize_avis keys the
    codec on parity — odd ids RLE8, even ids DIB — so the certified
    corpus really does exercise both frame codecs (r8 ADVICE fix: the
    old % 4 == 2 filter silently pinned the corpus to DIB-only).
    Reference comparison: n/a (the reference has no binary/vector
    surface; video is engine-tier).

    100 TB shape: one Arrow mapInPandas where the payload bytes live —
    per-partition batches, 1→n_frames row expansion inside the kernel,
    no driver loop, no per-row Python UDF; the rollup is one
    media_id-keyed hash-agg."""
    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 4).isin(1, 2)
    )
    media = MM.synthesize_avis(d, "doc_id")
    stats = MM.avi_frame_pixel_stats(media, every_n=2, out_w=4, out_h=4)
    return (
        stats.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.min("us_per_frame").alias("us_per_frame"),
            F.sum("n_pixels").alias("total_pixels"),
            F.sum("pixel_sum").alias("pixel_sum"),
            F.sum("resized_wsum").alias("resized_wsum"),
        )
        .orderBy("media_id")
    )


from rippledb_spark.operators import dedup as DD  # noqa: E402

_DSR_CTE = DD.duplicated_substring_runs_sql("documents", "text", "doc_id", n=5)


@query(
    "dedup_exact_substring_runs",
    oracle=f"""
    WITH {_DSR_CTE.strip()}
    SELECT doc_id, n_tokens, n_dup_runs, dup_tokens, max_run_tokens, dup_frac
    FROM dsr ORDER BY doc_id
    """,
)
def dedup_exact_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring dedup (Lee et al. 2021 class,
    operators/dedup.duplicated_substring_runs): every maximal token span
    whose 5-token windows all occur ≥ 2 times corpus-wide, reported per
    document as run count, duplicated-token total, longest run, and
    duplicated fraction — the numbers a removal pass would act on. The
    oracle replays the identical window fingerprints, ≥2 gate, and
    gaps-and-islands stitching in DuckDB, so a green row certifies seed
    detection AND run stitching arithmetic for all 500 docs (zeros
    included). Reference comparison: n/a (no text surface in the
    reference); the suffix-array original is the paper's single-node
    form — the window-seed + stitch form is the distributed equivalent
    (one fp-keyed count, one semi-join, one doc-keyed window)."""
    d = load(spark, sf_dir, "documents")
    return DD.duplicated_substring_runs(d, "text", "doc_id", n=5).orderBy(
        "doc_id"
    )


@query(
    "mjpeg_frame_accounting",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 3),
    dims AS (
      SELECT doc_id,
             CAST(8 * (1 + doc_id % 3) AS BIGINT) AS w,
             CAST(8 * (1 + doc_id % 2) AS BIGINT) AS h,
             CAST(1 + doc_id % 3 AS BIGINT) AS bw,
             CAST(1 + doc_id % 3 AS BIGINT) AS nf
      FROM ids
    ),
    fr AS (SELECT doc_id, w, h, bw, f FROM dims, UNNEST(range(0, nf, 2)) AS u(f)),
    raw AS (
      SELECT doc_id, f, w * h AS n_pixels,
             64 * SUM((37 * doc_id + 17 * f + 11 * b) % 256) AS pixel_sum
      FROM fr, UNNEST(range(0, bw * (h // 8))) AS q(b)
      GROUP BY doc_id, f, w, h
    ),
    res AS (
      SELECT doc_id, f,
             SUM((i * 4 + j + 1)
                 * ((37 * doc_id + 17 * f
                     + 11 * ((((i * h) // 4) // 8) * bw
                             + ((j * w) // 4) // 8)) % 256))
               AS resized_wsum
      FROM fr, generate_series(0, 3) AS gi(i), generate_series(0, 3) AS gj(j)
      GROUP BY doc_id, f
    )
    SELECT r.doc_id AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames_sampled,
           CAST(MIN(33000 + 100 * (r.doc_id % 5)) AS BIGINT) AS us_per_frame,
           CAST(SUM(r.n_pixels) AS BIGINT) AS total_pixels,
           CAST(SUM(r.pixel_sum) AS BIGINT) AS pixel_sum,
           CAST(SUM(s.resized_wsum) AS BIGINT) AS resized_wsum
    FROM raw r JOIN res s ON r.doc_id = s.doc_id AND r.f = s.f
    GROUP BY r.doc_id ORDER BY media_id
    """,
)
def mjpeg_frame_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-video decode (r8 — MJPEG: the first AVI codec
    here with actual entropy coding): synthesize MJPEG videos whose
    frames are baseline JPEGs (operators/jpeg.py — Annex K Huffman
    tables, DC differential + AC run/size entropy coding, byte stuffing,
    orthonormal 8×8 DCT), RIFF-walk them back, Huffman-decode +
    dequantize + IDCT every 2nd frame, resize 4×4 via the shared
    resize_nearest, and report closed-form pixel digests. JPEG is lossy
    in general, so the fixture frames are BLOCK-CONSTANT with a unit
    quant table — the content class where baseline JPEG is numerically
    exact (only the DC coefficient survives and it is an exact integer;
    jpeg.py module docstring) — which is precisely what lets a SQL
    oracle recompute every decoded pixel from id arithmetic. A Huffman
    table off by one code, a mis-signed amplitude, a zigzag slot
    swapped, or an IDCT scaling error changes pixel_sum; any pixel
    REORDERING changes the position-weighted resized_wsum. Arbitrary
    (non-block-constant) content is covered by pytest round-trip
    tolerance tests instead. Reference comparison: n/a (no binary
    surface in the reference).

    100 TB shape: identical to avi_frame_accounting — one Arrow
    mapInPandas where the payload bytes live, 1→n_frames expansion in
    the kernel, one media-keyed hash-agg."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 3)
    media = MM.synthesize_mjpeg_avis(d, "doc_id")
    stats = MM.avi_frame_pixel_stats(media, every_n=2, out_w=4, out_h=4)
    return (
        stats.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.min("us_per_frame").alias("us_per_frame"),
            F.sum("n_pixels").alias("total_pixels"),
            F.sum("pixel_sum").alias("pixel_sum"),
            F.sum("resized_wsum").alias("resized_wsum"),
        )
        .orderBy("media_id")
    )


@query(
    "jpeg_color_accounting",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1),
    shp AS (
      SELECT doc_id,
             CAST(16 * (1 + doc_id % 2) AS BIGINT) AS w,
             CAST(16 * (1 + doc_id % 3) AS BIGINT) AS h,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS INT) AS hy,
             CAST(CASE WHEN doc_id % 3 = 2 THEN 2 ELSE 1 END AS INT) AS vy
      FROM ids
    ),
    ysum AS (
      SELECT doc_id,
             64 * SUM((41 * doc_id + 13 * b) % 256) AS y_sum
      FROM shp, UNNEST(range(0, (w // 8) * (h // 8))) AS q(b)
      GROUP BY doc_id
    ),
    csum AS (
      SELECT doc_id,
             64 * SUM((23 * doc_id + 7 * b) % 256) AS cb_sum,
             64 * SUM((29 * doc_id + 5 * b) % 256) AS cr_sum
      FROM shp, UNNEST(range(0, ((w // hy) // 8) * ((h // vy) // 8))) AS q(b)
      GROUP BY doc_id
    ),
    res AS (
      SELECT doc_id,
             SUM((i * 4 + j + 1)
                 * ((41 * doc_id
                     + 13 * ((((i * h) // 4) // 8) * (w // 8)
                             + ((j * w) // 4) // 8)) % 256))
               AS resized_y_wsum
      FROM shp, generate_series(0, 3) AS gi(i), generate_series(0, 3) AS gj(j)
      GROUP BY doc_id
    )
    SELECT s.doc_id AS media_id,
           CAST(s.w AS INT) AS width,
           CAST(s.h AS INT) AS height,
           s.hy AS luma_h,
           s.vy AS luma_v,
           CAST(y.y_sum AS BIGINT) AS y_sum,
           CAST(c.cb_sum AS BIGINT) AS cb_sum,
           CAST(c.cr_sum AS BIGINT) AS cr_sum,
           CAST(r.resized_y_wsum AS BIGINT) AS resized_y_wsum
    FROM shp s
    JOIN ysum y ON y.doc_id = s.doc_id
    JOIN csum c ON c.doc_id = s.doc_id
    JOIN res r ON r.doc_id = s.doc_id
    ORDER BY media_id
    """,
)
def jpeg_color_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL color-JPEG decode (r8 — the web's image format, in color):
    synthesize baseline YCbCr JPEGs cycling 4:4:4 / 4:2:2 / 4:2:0 with
    restart markers every 1–3 MCUs (operators/jpeg.py — interleaved
    MCUs, per-component DC predictors, Annex K Huffman tables, byte
    stuffing), decode every plane back (marker walk → entropy decode
    with RSTn predictor resets → dequantize → IDCT), resize the luma
    plane 4×4 via the shared resize_nearest, and report closed-form
    digests. The planes are block-constant with unit quant tables — the
    content class where baseline JPEG is numerically exact — so the
    oracle recomputes every decoded pixel of every plane from id
    arithmetic: a restart predictor not reset, an MCU block mis-ordered,
    a chroma table mixed up, or an IDCT scale error changes a plane sum,
    and any luma reordering changes the position-weighted resample.
    Arbitrary content and the RGB conversion are covered by pytest
    tolerance tests. The id filter is doc_id % 4 == 1 — coprime to the
    sampling/restart modulus 3 — so the certified ids (1, 5, 9, …)
    really do cycle through all three samplings and all three restart
    intervals (r8 ADVICE fix: the old % 3 == 1 filter pinned every
    certified image to 4:2:2 with restart_interval 2). Reference
    comparison: n/a (no binary surface).

    100 TB shape: one Arrow mapInPandas where the payloads live; one row
    per image out; no shuffle before the final sort."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 1)
    media = MM.synthesize_color_jpegs(d, "doc_id")
    return MM.jpeg_plane_stats(media, out_w=4, out_h=4).orderBy("media_id")


@query(
    "wav_audio_accounting",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
    shp AS (
      SELECT doc_id,
             CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
             CAST(16 + doc_id % 49 AS BIGINT) AS n
      FROM ids
    ),
    smp AS (
      SELECT doc_id, i,
             ((17 * doc_id + 3 * i) % 4001) - 2000 AS s
      FROM shp, UNNEST(range(0, n)) AS u(i)
    ),
    base AS (
      SELECT doc_id,
             CAST(SUM(s * s) AS BIGINT) AS total_energy,
             CAST(MAX(ABS(s)) AS BIGINT) AS max_abs
      FROM smp GROUP BY doc_id
    ),
    zc AS (
      SELECT a.doc_id,
             CAST(SUM(CASE WHEN a.s * b.s < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_crossings
      FROM smp a JOIN smp b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      GROUP BY a.doc_id
    ),
    loud AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN wsum > 2000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_loud_windows
      FROM (
        SELECT doc_id, i // 16 AS w, SUM(s * s) AS wsum
        FROM smp GROUP BY doc_id, i // 16
      ) GROUP BY doc_id
    )
    SELECT s.doc_id AS media_id,
           s.sample_rate,
           s.n AS n_samples,
           b.total_energy,
           b.max_abs,
           COALESCE(z.n_zero_crossings, 0) AS n_zero_crossings,
           l.n_loud_windows
    FROM shp s
    JOIN base b ON b.doc_id = s.doc_id
    LEFT JOIN zc z ON z.doc_id = s.doc_id
    JOIN loud l ON l.doc_id = s.doc_id
    ORDER BY media_id
    """,
)
def wav_audio_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM audio analysis (r8 — closes the audio half of the
    sample-level tier, beside the pixel decoders): synthesize mono
    16-bit PCM WAVs whose samples are id-arithmetic
    (operators/multimodal.synth_pcm_samples), decode the data chunk
    back (decode_wav_samples), and compute the integer statistics a
    100 TB audio pipeline gates on — total energy Σs², peak |s|,
    zero-crossing count, and loud-window count (16-sample windows over
    a 2e6 energy threshold). Everything is exact integer arithmetic on
    int16, so the oracle recomputes every statistic bit-exactly from id
    arithmetic — a sample lost, an endianness flip, or an off-by-one
    window boundary changes a number. Reference comparison: n/a (no
    binary surface).

    100 TB shape: one Arrow mapInPandas where the payload bytes live;
    one row per clip; no shuffle before the final sort."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    media = MM.synthesize_pcm_wavs(d, "doc_id")
    return MM.wav_audio_stats(media, window=16, loud_energy=2_000_000).orderBy(
        "media_id"
    )


@query(
    "png_color_accounting",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
    shp AS (
      SELECT doc_id,
             CAST(4 + doc_id % 9 AS BIGINT) AS w,
             CAST(3 + doc_id % 5 AS BIGINT) AS h,
             doc_id % 3 AS m
      FROM ids
    ),
    px AS (
      SELECT doc_id, m, w, h, k,
             CASE WHEN m = 1
                  THEN (61 * doc_id + 5 * ((31 * doc_id + 7 * k) % 16)) % 256
                  ELSE (43 * doc_id + 7 * k) % 256 END AS r,
             CASE WHEN m = 1
                  THEN (67 * doc_id + 3 * ((31 * doc_id + 7 * k) % 16)) % 256
                  ELSE (47 * doc_id + 11 * k) % 256 END AS g,
             CASE WHEN m = 1
                  THEN (71 * doc_id + 9 * ((31 * doc_id + 7 * k) % 16)) % 256
                  ELSE (53 * doc_id + 13 * k) % 256 END AS b,
             CASE WHEN m = 2 THEN (59 * doc_id + 17 * k) % 256 ELSE 0 END AS a
      FROM shp, UNNEST(range(0, w * h)) AS q(k)
    )
    SELECT doc_id AS media_id,
           CAST(MIN(w) AS INT) AS width,
           CAST(MIN(h) AS INT) AS height,
           CAST(MIN(CASE m WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 6 END) AS INT)
             AS color_type,
           CAST(MIN(CASE WHEN m = 2 THEN 4 ELSE 3 END) AS INT) AS channels,
           CAST(SUM(r) AS BIGINT) AS r_sum,
           CAST(SUM(g) AS BIGINT) AS g_sum,
           CAST(SUM(b) AS BIGINT) AS b_sum,
           CAST(SUM(a) AS BIGINT) AS a_sum,
           CAST(SUM((k + 1) * (r + g + b)) AS BIGINT) AS rgb_wsum
    FROM px GROUP BY doc_id ORDER BY media_id
    """,
)
def png_color_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL color-PNG decode (r8 — generalizes the r6 grayscale pixel
    path to the color types web PNGs actually use): synthesize PNGs
    cycling truecolor RGB (2) / palette (3, PLTE expansion) / RGBA (6)
    with id-arithmetic pixel content, decode every payload back
    (operators/multimodal.decode_png_any — CRC-checked chunk walk, zlib
    inflate, bytes-per-pixel-aware unfilter, palette expansion with
    range checks), and report per-channel pixel sums plus the
    position-weighted Σ(k+1)·(r+g+b) digest. PNG is lossless, so the
    oracle recomputes every decoded channel of every pixel exactly —
    a stride-blind filter (byte-left instead of pixel-left), a palette
    entry misread, or a channel swap changes a sum, and any pixel
    REORDERING changes rgb_wsum. Reference comparison: n/a (no binary
    surface).

    100 TB shape: one Arrow mapInPandas where the payloads live; one
    row per image; no shuffle before the final sort."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    media = MM.synthesize_color_pngs(d, "doc_id")
    return MM.png_color_stats(media).orderBy("media_id")


from rippledb_spark.operators import pq as PQ  # noqa: E402

# m=8/k=16: 8 codebooks of 16 centroids -> 32-bit codes; on this corpus
# of mostly-random vectors (near-equidistant neighbors, the hard case)
# that lands rank-1 recall ~3/5 with planted near-dups found first --
# the in_exact_topk column reports measured recall per row either way
_PQ_CTE = PQ.pq_adc_sql("embeddings", "embedding", "vec_id", dims=64, m=8, k=16)


@query(
    "pq_ann_topk",
    oracle=f"""
    WITH {_PQ_CTE.strip()}
    SELECT q_pid, rank, pid, adc_d2, in_exact_topk
    FROM pq_topk ORDER BY q_pid, rank
    """,
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py, Jégou et al. 2011 —
    the codebook compression production vector search runs at 100 TB):
    train 4 independent deterministic k-means codebooks over 16-dim
    subspaces of the embeddings, encode every vector as 4 codes, and
    answer the 3 lowest-id queries' top-5 via asymmetric distance
    computation — one broadcast lookup table per query, one
    (query, pid)-keyed sum over the exploded code table, never a
    full-vector distance against the corpus. The in_exact_topk column
    is the self-verifying recall flag (true full-dimension top-5
    recomputed for the query set — the minhash-twin certification
    pattern). The oracle replays all 4 Lloyd chains, the codebooks,
    codes, lookup tables, 6dp-rounded ADC sums, and the pid-tiebroken
    ranking in one DuckDB CTE chain, so a green row certifies the
    entire compression + search composition."""
    e = load(spark, sf_dir, "embeddings")
    return PQ.pq_adc_topk(e, "embedding", "vec_id", dims=64, m=8, k=16)


from rippledb_spark.functions import vector as VEC  # noqa: E402


@query(
    "embedding_int8_accounting",
    oracle=f"""
    WITH qz AS (
      SELECT vec_id, {VEC.quantize_int8_sql("embedding")}
      FROM embeddings
    ),
    flat AS (
      SELECT q1.vec_id, q1.scale,
             q1.q[CAST(u.i AS INT)] AS qv,
             CAST(e2.embedding[CAST(u.i AS INT)] AS DOUBLE) AS xv
      FROM qz q1
      JOIN embeddings e2 ON e2.vec_id = q1.vec_id,
      UNNEST(range(1, len(q1.q) + 1)) AS u(i)
    )
    SELECT vec_id, scale,
           CAST(SUM(qv) AS BIGINT) AS q_sum,
           CAST(MIN(qv) AS INT) AS q_min,
           CAST(MAX(qv) AS INT) AS q_max,
           ROUND(MAX(ABS(xv - qv * scale)), 6) AS recon_err_max
    FROM flat GROUP BY vec_id, scale ORDER BY vec_id
    """,
)
def embedding_int8_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (functions/vector.quantize_int8 — the
    8× storage shrink production embedding stores apply): per vector,
    the symmetric scale (max|x|/127), quantized-component sum and range
    (certifying every q_i), and the 6dp-rounded maximum reconstruction
    error |x_i − q_i·scale| — which also proves the quantizer's error
    bound (≤ scale/2) holds on real data. The oracle replays scale,
    HALF_UP rounding, and reconstruction per component in DuckDB, so a
    green row certifies the full quantize→dequantize loop bit-for-bit.

    100 TB shape: one pure-expression projection plus one explode-free
    aggregate per vector (the explode here is certification detail; the
    production path stores struct(scale, q) straight back to parquet)."""
    e = load(spark, sf_dir, "embeddings")
    qz = e.select(
        F.col("vec_id"),
        VEC.as_double_array("embedding").alias("x"),
        VEC.quantize_int8(VEC.as_double_array("embedding")).alias("s"),
    )
    comp = qz.select(
        "vec_id",
        F.col("s.scale").alias("scale"),
        F.posexplode(F.col("s.q")).alias("i", "qv"),
        F.col("x"),
    ).select(
        "vec_id",
        "scale",
        "qv",
        F.element_at("x", F.col("i") + 1).alias("xv"),
    )
    return (
        comp.groupBy("vec_id", "scale")
        .agg(
            F.sum("qv").cast("bigint").alias("q_sum"),
            F.min("qv").cast("int").alias("q_min"),
            F.max("qv").cast("int").alias("q_max"),
            F.round(F.max(F.abs(F.col("xv") - F.col("qv") * F.col("scale"))), 6)
            .alias("recon_err_max"),
        )
        .select("vec_id", "scale", "q_sum", "q_min", "q_max", "recon_err_max")
        .orderBy("vec_id")
    )


from rippledb_spark.functions import robots as RB  # noqa: E402

_RB_HOSTS_SQL = """rb_hosts AS (
      SELECT hid,
             'h' || hid AS host,
             '# robots for h' || hid || chr(10) ||
             'User-agent: googlebot' || chr(10) ||
             'Disallow: /secret' || chr(10) ||
             chr(10) ||
             'User-agent: *' || chr(10) ||
             'Allow: /pub' || hid || '/open*' || chr(10) ||
             'Disallow: /pub' || hid || '/' || chr(10) ||
             'Disallow: /tmp' || hid || '$' ||
             CASE WHEN hid % 2 = 0
                  THEN chr(10) || 'Disallow: /x' || hid || '_*'
                  ELSE '' END AS robots
      FROM (SELECT DISTINCT doc_id % 20 AS hid FROM documents)
    )"""

_RB_URLS_SQL = """rb_urls AS (
      SELECT 'h' || (doc_id % 20) AS host,
             CASE doc_id % 5
               WHEN 0 THEN '/pub' || (doc_id % 20) || '/open' || doc_id
               WHEN 1 THEN '/pub' || (doc_id % 20) || '/page' || doc_id
               WHEN 2 THEN '/tmp' || (doc_id % 20)
               WHEN 3 THEN '/tmp' || (doc_id % 20) || '/f' || doc_id
               ELSE '/x' || (doc_id % 20) || '_' || doc_id
             END AS path
      FROM documents
    )"""


@query(
    "robots_gate_accounting",
    oracle=f"""
    WITH {_RB_HOSTS_SQL.strip()},
    {_RB_URLS_SQL.strip()},
    {RB.robots_rules_sql("rb_hosts", "host", "robots").strip()},
    {RB.robots_decisions_sql("rb_urls").strip()}
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_allowed,
           CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked,
           CAST(SUM(CASE WHEN allowed AND matched_rule IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_default_allowed,
           MIN(CASE WHEN NOT allowed THEN path END) AS sample_blocked
    FROM rb_decisions GROUP BY host ORDER BY host
    """,
)
def robots_gate_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt crawl gate (functions/robots.py, RFC 9309): synthesize
    id-deterministic robots files (a decoy googlebot group that must NOT
    apply, a `*` group with Allow/Disallow prefixes, a `*` wildcard
    rule, a `$`-anchored rule, and a host-conditional extra rule) plus a
    URL table, parse the rules with pure window expressions, gate every
    URL with the LIKE-compiled longest-match/Allow-wins precedence, and
    account per host. Spark and the DuckDB oracle each build the SAME
    robots text from id arithmetic and run their own parse+match, so a
    green row certifies group segmentation, comment/empty-value
    handling, wildcard/anchor compilation, and RFC precedence end to
    end — no UDF anywhere in the plan.

    100 TB shape: parsing is one explode + two host-keyed windows over
    robots FILES (small by nature); decisions join per-host rule sets
    (broadcast) against the URL table with one row_number window."""
    d = load(spark, sf_dir, "documents")
    hid = (F.col("doc_id") % 20).cast("bigint")
    hosts = (
        d.select(hid.alias("hid"))
        .distinct()
        .select(
            F.concat(F.lit("h"), F.col("hid")).alias("host"),
            F.concat(
                F.lit("# robots for h"), F.col("hid"), F.lit("\n"),
                F.lit("User-agent: googlebot\n"),
                F.lit("Disallow: /secret\n"),
                F.lit("\n"),
                F.lit("User-agent: *\n"),
                F.lit("Allow: /pub"), F.col("hid"), F.lit("/open*\n"),
                F.lit("Disallow: /pub"), F.col("hid"), F.lit("/\n"),
                F.lit("Disallow: /tmp"), F.col("hid"), F.lit("$"),
                F.when(
                    F.col("hid") % 2 == 0,
                    F.concat(
                        F.lit("\nDisallow: /x"), F.col("hid"), F.lit("_*")
                    ),
                ).otherwise(F.lit("")),
            ).alias("robots"),
        )
    )
    urls = d.select(
        F.concat(F.lit("h"), hid).alias("host"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("/pub"), hid, F.lit("/open"), F.col("doc_id")),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("/pub"), hid, F.lit("/page"), F.col("doc_id")),
        )
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/tmp"), hid))
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.lit("/tmp"), hid, F.lit("/f"), F.col("doc_id")),
        )
        .otherwise(F.concat(F.lit("/x"), hid, F.lit("_"), F.col("doc_id")))
        .alias("path"),
    )
    dec = RB.robots_decisions(urls, RB.robots_rules(hosts, "host", "robots"))
    return (
        dec.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.when(F.col("allowed"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_allowed"),
            F.sum(F.when(~F.col("allowed"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_blocked"),
            F.sum(
                F.when(
                    F.col("allowed") & F.col("matched_rule").isNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_default_allowed"),
            F.min(F.when(~F.col("allowed"), F.col("path"))).alias(
                "sample_blocked"
            ),
        )
        .orderBy("host")
    )


from rippledb_spark.functions import html as HTML6  # noqa: E402
from rippledb_spark.functions import url as URL6  # noqa: E402
from rippledb_spark.operators.frontier import (  # noqa: E402
    resolve_link as FR6_resolve_link,
    resolve_link_sql as FR6_resolve_link_sql,
)


@query(
    "crawl_frontier_accounting",
    oracle=f"""
    WITH {_RB_HOSTS_SQL.strip()},
    pages AS (
      SELECT 'h' || (doc_id % 20) AS host,
             '<html><body><a href="https://h' || (doc_id % 20) ||
             '/pub' || (doc_id % 20) || '/open' || (doc_id + 1) ||
             '">a</a><p>text</p><a href=''/tmp' || (doc_id % 20) ||
             '''>b</a><a target="_b" HREF="https://h' ||
             ((doc_id + 1) % 20) || '/x' || ((doc_id + 1) % 20) || '_' ||
             (doc_id % 7) || '">c</a></body></html>' AS html
      FROM documents
    ),
    raw_links AS (
      SELECT host AS src_host, UNNEST({HTML6.extract_links_sql("html")}) AS link
      FROM pages
    ),
    absu AS (
      SELECT {FR6_resolve_link_sql("link", "src_host")} AS u
      FROM raw_links
    ),
    canon AS (
      SELECT {URL6.url_host_sql("u")} AS host,
             {URL6.url_normalize_sql("u")} AS url
      FROM absu
    ),
    occ AS (
      SELECT host, url,
             regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1) AS path,
             COUNT(*) AS n_occ
      FROM canon WHERE url IS NOT NULL
      GROUP BY host, url
    ),
    {RB.robots_rules_sql("rb_hosts", "host", "robots").strip()},
    {RB.robots_decisions_sql("(SELECT host, path FROM occ)").strip()}
    SELECT o.host,
           CAST(SUM(o.n_occ) AS BIGINT) AS n_link_occurrences,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_urls,
           CAST(SUM(CASE WHEN d.allowed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_allowed,
           CAST(SUM(CASE WHEN NOT d.allowed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked,
           MIN(CASE WHEN NOT d.allowed THEN o.url END) AS sample_blocked
    FROM occ o JOIN rb_decisions d ON d.host = o.host AND d.path = o.path
    GROUP BY o.host ORDER BY o.host
    """,
)
def crawl_frontier_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl FRONTIER planning — the top of the crawl loop, composed
    end to end (r8): extract every ``<a href>`` from the pages
    (functions/html.extract_links, codegen regexp), resolve relative
    links against the page host, canonicalize
    (functions/url.url_normalize), collapse duplicate targets with
    occurrence counts (frontier dedup), gate each distinct URL against
    its host's robots.txt (functions/robots.py, RFC 9309), and account
    per target host. Both engines build identical id-deterministic
    pages and robots files and run their OWN extract → resolve →
    canonicalize → dedup → gate chain, so a green row certifies the
    whole frontier composition — link extraction, relative resolution,
    normalization, and politeness — with zero UDFs.

    100 TB shape: extraction is a codegen projection; the dedup is one
    (host, url)-keyed agg; the gate broadcasts per-host rule sets; one
    short-key rollup."""
    d = load(spark, sf_dir, "documents")
    hid = (F.col("doc_id") % 20).cast("bigint")
    hid2 = ((F.col("doc_id") + 1) % 20).cast("bigint")
    pages = d.select(
        F.concat(F.lit("h"), hid).alias("host"),
        F.concat(
            F.lit('<html><body><a href="https://h'), hid,
            F.lit("/pub"), hid, F.lit("/open"),
            (F.col("doc_id") + 1).cast("bigint"),
            F.lit('">a</a><p>text</p><a href=\'/tmp'), hid,
            F.lit("'>b</a>"),
            F.lit('<a target="_b" HREF="https://h'), hid2,
            F.lit("/x"), hid2, F.lit("_"),
            (F.col("doc_id") % 7).cast("bigint"),
            F.lit('">c</a></body></html>'),
        ).alias("html"),
    )
    links = pages.select(
        F.col("host").alias("src_host"),
        F.explode(HTML6.extract_links("html")).alias("link"),
    )
    absu = links.select(FR6_resolve_link("link", "src_host").alias("u"))
    canon = absu.select(
        URL6.url_host("u").alias("host"), URL6.url_normalize("u").alias("url")
    ).where(F.col("url").isNotNull())
    occ = canon.groupBy("host", "url").agg(F.count(F.lit(1)).alias("n_occ"))
    occ = occ.withColumn(
        "path", F.regexp_extract("url", "^[a-z]+://[^/]+(/.*)$", 1)
    )
    hosts = (
        d.select(hid.alias("hid"))
        .distinct()
        .select(
            F.concat(F.lit("h"), F.col("hid")).alias("host"),
            F.concat(
                F.lit("# robots for h"), F.col("hid"), F.lit("\n"),
                F.lit("User-agent: googlebot\n"),
                F.lit("Disallow: /secret\n"),
                F.lit("\n"),
                F.lit("User-agent: *\n"),
                F.lit("Allow: /pub"), F.col("hid"), F.lit("/open*\n"),
                F.lit("Disallow: /pub"), F.col("hid"), F.lit("/\n"),
                F.lit("Disallow: /tmp"), F.col("hid"), F.lit("$"),
                F.when(
                    F.col("hid") % 2 == 0,
                    F.concat(
                        F.lit("\nDisallow: /x"), F.col("hid"), F.lit("_*")
                    ),
                ).otherwise(F.lit("")),
            ).alias("robots"),
        )
    )
    dec = RB.robots_decisions(
        occ.select("host", "path"), RB.robots_rules(hosts, "host", "robots")
    )
    return (
        occ.join(dec, ["host", "path"])
        .groupBy("host")
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_link_occurrences"),
            F.count(F.lit(1)).alias("n_distinct_urls"),
            F.sum(F.when(F.col("allowed"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_allowed"),
            F.sum(F.when(~F.col("allowed"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_blocked"),
            F.min(F.when(~F.col("allowed"), F.col("url"))).alias(
                "sample_blocked"
            ),
        )
        .orderBy("host")
    )


from rippledb_spark.operators import retrieval as RET  # noqa: E402

_BM25_TERMS = ["shuffle", "broadcast", "filter", "quantile"]


@query(
    "bm25_top_documents",
    oracle=f"""
    WITH {RET.bm25_topk_sql("documents", "text", "doc_id",
                            _BM25_TERMS, topk=20).strip()}
    SELECT rank, doc_id, n_query_terms_hit, score FROM bm25_topk
    ORDER BY rank
    """,
)
def bm25_top_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 corpus retrieval (operators/retrieval.py, Robertson &
    Zaragoza 2009, the Lucene idf form): rank the documents table for a
    fixed 4-term query, top-20 by 6dp-rounded score with doc-id
    tiebreak. The oracle replays tokenization, per-term tf, document
    frequency, the corpus avgdl, every idf/tf saturation factor, and
    the ranking in DuckDB — so a green row certifies the full scoring
    pipeline, not just row counts.

    100 TB shape: one corpus scan filtered to query terms BEFORE the
    (doc, term) aggregation, two broadcast side-tables (df + corpus
    stats), one doc-keyed sum; top-k never global-sorts."""
    d = load(spark, sf_dir, "documents")
    return RET.bm25_topk(
        d, "text", "doc_id", _BM25_TERMS, topk=20
    ).orderBy("rank")


from rippledb_spark.operators import scd as SCD  # noqa: E402


@query(
    "scd2_customer_priority",
    oracle=f"""
    WITH ev AS (
      SELECT o_custkey, o_orderdate, o_orderpriority
      FROM orders WHERE o_custkey % 50 = 0
    ),
    {SCD.scd2_from_changes_sql("ev", "o_custkey", "o_orderdate",
                               "o_orderpriority").strip()}
    SELECT key AS custkey, value AS priority, valid_from, valid_to,
           is_current
    FROM scd2 ORDER BY custkey, valid_from, priority
    """,
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 (operators/scd.py, the Kimball
    warehouse pattern): each sampled customer's order-priority history
    becomes validity intervals — consecutive same-priority orders
    collapse, valid_to is the next change's timestamp, the last state
    is current. The oracle replays the (ts, value)-ordered windows
    (the value tiebreak makes equal-date events deterministic) in
    DuckDB, so a green row certifies collapse + interval arithmetic
    including NULL open intervals. One shuffle on the dimension key;
    per-partition work is one customer's history."""
    ev = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 50 == 0)
        .select("o_custkey", "o_orderdate", "o_orderpriority")
    )
    return (
        SCD.scd2_from_changes(ev, "o_custkey", "o_orderdate", "o_orderpriority")
        .select(
            F.col("key").alias("custkey"),
            F.col("value").alias("priority"),
            "valid_from",
            "valid_to",
            "is_current",
        )
        .orderBy("custkey", "valid_from", "priority")
    )


from rippledb_spark.functions import html as _H  # noqa: E402
from rippledb_spark.operators import quality as Q6  # noqa: E402


@query(
    "crawl_gate_accounting",
    oracle=f"""
    WITH cg_fetch AS (
      SELECT 'https://crawl.example/p' || (doc_id % 400) ||
             CASE WHEN doc_id % 2 = 0
                  THEN '?utm_source=x&b=2&a=1' ELSE '' END AS raw_uri,
             '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
               || 'T00:00:00Z' AS warc_date,
             '<html><body><h1>Page</h1><p>' || text ||
               '</p></body></html>' AS html
      FROM documents
    ),
    canon AS (
      SELECT {URL6.url_normalize_sql("raw_uri")} AS uri, warc_date,
             {_H.strip_html_sql("html")} AS text
      FROM cg_fetch
    ),
    collapsed AS (
      SELECT uri, warc_date, text FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY uri ORDER BY warc_date DESC, text DESC) AS rn
        FROM canon WHERE uri IS NOT NULL
      ) WHERE rn = 1
    ),
    {Q6.repetition_metrics_sql("collapsed", "text", "uri").strip()}
    SELECT c.uri, c.warc_date, g.n_words, g.mean_word_len,
           g.top2_frac, g.dup5_frac, g.keep
    FROM collapsed c JOIN gopher g ON g.id = c.uri
    ORDER BY c.uri
    """,
)
def crawl_gate_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH TWIN of the streaming crawl gate, driver-certified (r8 —
    until now the crawl pipeline's only gate was pytest's live
    batch-twin equivalence; this row puts the SAME composition under
    the DuckDB oracle): synthesize warc-shaped fetches from documents
    (duplicate URIs, tracking-parameter variants, HTML-wrapped text),
    run the production gate_crawl_records (streaming/crawl.py —
    canonicalize → strip markup → latest-fetch-wins struct-max collapse
    → Gopher metrics), and emit per-URI corpus rows. The oracle replays
    URL normalization, the HTML strip chain, the (warc_date, text)-
    lexicographic collapse, and every Gopher rule in SQL, so a green
    row certifies the full gate composition — and, via the pinned
    streaming equivalence tests, transitively the streaming path."""
    from rippledb_spark.streaming.crawl import gate_crawl_records

    d = load(spark, sf_dir, "documents")
    fetch = d.select(
        F.concat(
            F.lit("https://crawl.example/p"),
            (F.col("doc_id") % 400).cast("bigint"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("?utm_source=x&b=2&a=1")
            ).otherwise(F.lit("")),
        ).alias("target_uri"),
        F.concat(
            F.lit("2024-01-"),
            F.lpad((1 + F.col("doc_id") % 28).cast("string"), 2, "0"),
            F.lit("T00:00:00Z"),
        ).alias("warc_date"),
        F.concat(
            F.lit("<html><body><h1>Page</h1><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("payload"),
    )
    return gate_crawl_records(fetch).select(
        "uri", "warc_date", "n_words", "mean_word_len",
        "top2_frac", "dup5_frac", "keep",
    ).orderBy("uri")


from pyspark.sql import Window as _W  # noqa: E402


@query(
    "graph_scc_event_transitions",
    oracle="""
    WITH RECURSIVE
    tr AS (
      SELECT event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS b
      FROM events
    ),
    cnt AS (SELECT a, b, COUNT(*) AS c FROM tr WHERE b IS NOT NULL
            GROUP BY a, b),
    tot AS (SELECT SUM(c) AS total, COUNT(*) AS n_pairs FROM cnt),
    sedges AS (
      SELECT a, b FROM cnt, tot
      WHERE 100 * c * n_pairs >= 101 * total AND a <> b
    ),
    snodes AS (SELECT a AS node FROM sedges UNION SELECT b FROM sedges),
    cl AS (
      SELECT a, b FROM sedges
      UNION
      SELECT cl.a, e.b FROM cl JOIN sedges e ON cl.b = e.a
    ),
    mut AS (
      SELECT c1.a AS u, c1.b AS v FROM cl c1
      JOIN cl c2 ON c1.a = c2.b AND c1.b = c2.a
    ),
    scc AS (
      SELECT n.node,
             LEAST(n.node, COALESCE(MIN(m.u), n.node)) AS scc
      FROM snodes n LEFT JOIN mut m ON m.v = n.node
      GROUP BY n.node
    )
    SELECT s.node, s.scc,
           CAST(COUNT(*) OVER (PARTITION BY s.scc) AS BIGINT) AS n_members
    FROM scc s ORDER BY s.node
    """,
)
def graph_scc_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (operators/graph.py, r8 — the
    directed-cycle complement of the undirected CC operator) over the
    ABOVE-AVERAGE event-transition graph: per user, consecutive events
    (ts then event_id tiebreak) form directed type→type transitions;
    only transitions at least 1% above the mean pair count become edges
    (the relative threshold keeps the graph shape scale-dependent, not
    hardcoded), so the graph has real non-trivial SCC structure. The
    Spark side runs the semi-naive closure + mutual-reachability
    min-label; the oracle recomputes the identical graph and SCC ids
    with a recursive CTE — node sets, scc assignment, and member counts
    all hash-checked. Deterministic: labels are the node strings
    (lexicographic min), no id allocation anywhere."""
    from rippledb_spark.operators.graph import strongly_connected_components

    ev = load(spark, sf_dir, "events")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("a"), F.lead("event_type").over(w).alias("b")
    ).where(F.col("b").isNotNull())
    cnt = tr.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    edges = (
        cnt.crossJoin(F.broadcast(tot))
        .where(
            (100 * F.col("c") * F.col("n_pairs") >= 101 * F.col("total"))
            & (F.col("a") != F.col("b"))
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    scc = strongly_connected_components(edges, max_iterations=8)
    return scc.select(
        "node",
        "scc",
        F.count(F.lit(1)).over(_W.partitionBy("scc")).cast("bigint").alias(
            "n_members"
        ),
    ).orderBy("node")


@query(
    "dag_layer_scheduling",
    oracle="""
    WITH RECURSIVE
    ids AS (SELECT doc_id AS d FROM documents WHERE doc_id >= 1),
    mx AS (SELECT MAX(d) AS m FROM ids),
    dedges AS (
      SELECT d AS a, 2 * d AS b FROM ids, mx WHERE 2 * d <= m
      UNION ALL
      SELECT d, 3 * d FROM ids, mx WHERE 3 * d <= m
    ),
    dnodes AS (SELECT a AS node FROM dedges UNION SELECT b FROM dedges),
    walk AS (
      SELECT node, 0 AS l FROM dnodes n
      WHERE NOT EXISTS (SELECT 1 FROM dedges e WHERE e.b = n.node)
      UNION ALL
      SELECT e.b, w.l + 1 FROM walk w JOIN dedges e ON e.a = w.node
    )
    SELECT node, CAST(MAX(l) AS BIGINT) AS layer
    FROM walk GROUP BY node ORDER BY node
    """,
)
def dag_layer_scheduling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAG longest-path layering (operators/graph.py, r8 — the schedule
    depth dependency resolution assigns): over the doubling/tripling
    divisor DAG on document ids (d → 2d, d → 3d while in range — depth
    ~log₂(max id), multiple converging paths per node), relax every
    node to 1 + the max layer of its predecessors until the exact
    fixpoint. The oracle walks all source-rooted paths with a recursive
    CTE and takes each node's maximum depth — the same quantity — so a
    green row certifies the relaxation, the convergence exit, and the
    source handling per node. A cycle raises instead of returning a
    partial layering (certified by unit test; SCC finds the cycles)."""
    from rippledb_spark.operators.graph import dag_longest_path_layers

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("d")
    ).where(F.col("d") >= 1)
    mx = d.agg(F.max("d").alias("m"))
    ids = d.crossJoin(F.broadcast(mx))
    edges = (
        ids.where(2 * F.col("d") <= F.col("m"))
        .select(F.col("d").alias("src"), (2 * F.col("d")).alias("dst"))
        .unionByName(
            ids.where(3 * F.col("d") <= F.col("m")).select(
                F.col("d").alias("src"), (3 * F.col("d")).alias("dst")
            )
        )
    )
    return (
        dag_longest_path_layers(edges, max_iterations=16)
        .select("node", "layer")
        .orderBy("node")
    )
