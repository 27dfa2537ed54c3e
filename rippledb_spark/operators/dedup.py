"""Deduplication operators for large-scale corpus pipelines.

Four tiers, all shuffle-conscious (the 100 TB framing: dedup is usually the
single most expensive stage of a training-data pipeline):

- exact          — hash-groupBy on a content fingerprint; one shuffle on the
                   md5 key, deterministic keep-first-by-id.
- minhash LSH    — shingle → K minhashes → B bands; candidate pairs come from
                   a band-bucket self-join (only docs sharing a band bucket
                   ever meet — no O(n²) pair blow-up), then exact-Jaccard
                   verify on the candidates.
- simhash        — 64-bit majority-vote signature; near-dups = small Hamming
                   distance within blocking buckets.
- n-gram Jaccard — exact shingle-overlap join for modest candidate sets /
                   verification; the oracle-checkable tier.

Hash choice: ``xxhash64`` (JVM, codegen'd, seedable by prepending a literal
column) for minhash/simhash internals; ``md5`` where the DuckDB oracle must
reproduce values bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def shingles(col: str, n: int = 3) -> Column:
    """Token n-gram shingles (distinct), tokenized on single spaces.

    1-based element_at on both sides of the fence; returns [] for texts
    shorter than n tokens.
    """
    toks = f"split({col}, ' ')"
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def shingles_sql(col: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (list_slice is 1-based inclusive)."""
    toks = f"string_split({col}, ' ')"
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))) "
        f"ELSE [] END"
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content match (md5 fingerprint).

    Deterministic — unlike ``dropDuplicates``, which keeps an arbitrary row
    per key and would flunk any reproducibility gate. One shuffle on the
    fingerprint; group state is one (min_id) per key, so executors never
    hold a group's rows.
    """
    fp = F.md5(F.col(content_col)).alias("__fp")
    keep = (
        df.select(fp, F.col(id_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .drop("__fp")
    )
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """K minhash values: min over shingles of xxhash64(seed_i, shingle).

    Prepending the literal seed column makes xxhash64 a distinct hash per
    row of the signature — no UDF, fully codegen'd.
    """
    def seeded_min(seed: int) -> Column:
        return F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(F.lit(seed), s)))

    return F.array(*[seeded_min(i) for i in range(num_hashes)])


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash with exact-Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded 4dp.

    Scale shape: docs → (bands) rows each → shuffle on (band, band_hash)
    buckets → pairs only within buckets → verified by a shingle-overlap
    join restricted to candidate pairs. Nothing is ever O(n²) globally.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("__id"),
        shingles(content_col, shingle_n).alias("__sh"),
    ).filter(F.size("__sh") > 0)
    sig = base.select(
        "__id", minhash_signature(F.col("__sh"), num_hashes).alias("__sig")
    )

    band_rows = sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("__sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")

    left = band_rows.toDF("id_a", "band", "bucket")
    right = band_rows.toDF("id_b", "band", "bucket")
    candidates = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sh_a = base.toDF("id_a", "sh_a")
    sh_b = base.toDF("id_b", "sh_b")
    verified = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(token_col: Column) -> Column:
    """64-bit SimHash: per-bit majority vote over xxhash64(token).

    Pure expression tree (64 bit-tests folded over the token array) — stays
    in codegen; no explode, no shuffle: signature computes per-row.
    """
    hashed = F.transform(token_col, lambda t: F.xxhash64(t))

    def bit_vote(j: int) -> Column:
        return F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_votes = [bit_vote(j) for j in range(64)]
    out = F.lit(0).cast("bigint")
    for j, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(1).cast("bigint") * (2**j if j < 63 else -(2**63))).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def simhash_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    max_hamming: int = 8,
    block_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on the top
    ``block_bits`` bits so the self-join only meets within blocks.

    Returns (id_a, id_b, hamming). A production variant uses multiple
    rotated blockings to avoid near-misses across block boundaries; one
    blocking keeps the demo honest about the shuffle shape.
    """
    sigs = df.select(
        F.col(id_col).alias("__id"),
        simhash64(F.split(F.col(content_col), " ")).alias("__sim"),
    ).withColumn("__block", F.shiftrightunsigned("__sim", 64 - block_bits))
    a = sigs.toDF("id_a", "sim_a", "block")
    b = sigs.toDF("id_b", "sim_b", "block")
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard (oracle-checkable tier)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact Jaccard pairs via an inverted shingle index (explode + self-join
    on shingle, count shared, |A∪B| = |A|+|B|−shared).

    The shingle join is the scale-limiting step — at 100 TB you'd put the
    minhash bands in front (``minhash_lsh_pairs``); this exact form is the
    verifier and the DuckDB-oracle-checkable tier.
    """
    base = df.select(
        F.col(id_col).alias("__id"), shingles(content_col, shingle_n).alias("__sh")
    ).filter(F.size("__sh") > 0)
    sizes = base.select("__id", F.size("__sh").alias("__n"))
    inv = base.select("__id", F.explode("__sh").alias("__shingle"))
    ia = inv.toDF("id_a", "sh")
    ib = inv.toDF("id_b", "sh")
    shared = (
        ia.join(ib, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.toDF("id_a", "n_a")
    nb = sizes.toDF("id_b", "n_b")
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
