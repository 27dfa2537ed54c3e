"""Span-level corpus cleaning: frequent n-gram/line removal (C4-style)
and first-occurrence paragraph dedup (CCNet-style).

Engine-tier LLM-pipeline operator: the boilerplate-span scrub between
raw documents and dedup/packing — any n-token span that occurs in more
than ``max_df`` documents (navigation chrome, license headers, cookie
banners at corpus scale) is cut from every document, keeping the
surrounding text. This is the span-removal generalization of
dedup.ngram_jaccard's document-frequency CAP: there frequent shingles
are ignored for pairing; here they are physically removed from the text.

Scale shape — all equi-joins and aggregations, no UDF:

1. one flatMap-shaped projection enumerates (doc, start, shingle) via
   posexplode + slice (the chunking plan);
2. one hash-agg computes each shingle's document frequency; only
   super-threshold shingles survive the filter, so the frequent set is
   SMALL by construction (a shingle in >max_df docs is rare by Zipf) and
   the back-join is hash-uniform;
3. covered token positions expand per frequent start (bounded ×n) and
   dedup;
4. one LEFT ANTI equi-join keeps uncovered tokens — never a range-join;
5. one groupBy reassembles documents in token order.

The whole pipeline is ~4 shuffles regardless of corpus size, each keyed
by doc id or shingle hash (uniform). Deterministic and SQL-reproducible
— the registered query's DuckDB oracle re-derives identical output.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def remove_frequent_ngram_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    max_df: int = 100,
) -> DataFrame:
    """→ DataFrame(id, n_tokens, n_kept, cleaned_text): every occurrence
    of an n-token span appearing in more than ``max_df`` DISTINCT
    documents is removed (all n positions of every occurrence); the rest
    of each document survives in order. Documents shorter than ``n``
    tokens pass through untouched. EVERY input document yields exactly one
    output row — a document fully covered by frequent spans comes back as
    n_kept=0 with cleaned_text='' (corpus accounting never loses rows)."""
    if n <= 0:
        raise ValueError("n must be positive")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
    )
    toks = toks.withColumn("len", F.size("t"))

    # (id, start, shingle) for every n-gram start position
    starts = (
        toks.filter(F.col("len") >= n)
        .select(
            "id",
            F.posexplode(F.sequence(F.lit(0), F.col("len") - n)).alias("i", "__x"),
            F.col("t"),
        )
        .select(
            "id", "i", F.array_join(F.slice("t", F.col("i") + 1, n), " ").alias("sh")
        )
    )
    frequent = (
        starts.groupBy("sh")
        .agg(F.count_distinct("id").alias("df"))
        .filter(F.col("df") > max_df)
        .select("sh")
    )
    covered = (
        starts.join(frequent, "sh", "left_semi")
        .select(
            "id",
            F.explode(F.sequence(F.col("i"), F.col("i") + n - 1)).alias("j"),
        )
        .dropDuplicates(["id", "j"])
    )
    tok_pos = toks.select(
        "id", F.posexplode("t").alias("j", "tok")
    )
    kept = tok_pos.join(covered, ["id", "j"], "left_anti")
    kept_agg = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    # EVERY document survives to the output — a document whose every token
    # sits inside a frequent span has no `kept` rows, so the aggregate is
    # joined back onto the per-doc base (left outer from the doc side) and
    # fully-covered docs surface as n_kept=0 / cleaned_text='' instead of
    # silently vanishing from corpus accounting. Costs one extra shuffle
    # of the SMALL per-doc aggregate (one row per doc), keyed by doc id.
    return (
        toks.select("id", "len")
        .join(kept_agg, "id", "left_outer")
        .select(
            F.col("id").alias(id_col),
            F.col("len").alias("n_tokens"),
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style paragraph-level dedup (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data",
    §Deduplication — the per-paragraph hash dedup run on Common Crawl
    before any document-level gate): every repeated normalized paragraph
    (trimmed, lowercased) keeps ONLY its first occurrence corpus-wide —
    the lowest (doc id, position) — and later occurrences are removed in
    place; remaining paragraphs rejoin in order with ``sep``. This
    differs from :func:`remove_frequent_lines` (C4's rule), which
    removes EVERY occurrence of super-threshold lines: CCNet keeps one
    canonical copy, so unique content embedded in a boilerplate-heavy
    page survives exactly once. Empty-normalized paragraphs are
    formatting, not content — always kept.

    → DataFrame(id, n_paragraphs, n_kept, cleaned_text), one output row
    per input document (fully-duplicate docs come back n_kept=0 only if
    every paragraph lost to an earlier doc; same survival contract as
    the other scrubs).

    Scale shape: one posexplode; one map-side-combinable min-struct
    hash-agg keyed by normalized paragraph (the first-occurrence table,
    one row per DISTINCT paragraph); one norm-keyed equi-join back (a
    viral paragraph is many probe rows against ONE build row — hash-join
    uniform); one per-doc ordered reassembly. No window over the corpus,
    no all-pairs anything."""
    pars = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "j", "par"
        ),
    ).withColumn("norm", F.lower(F.trim("par")))
    first = (
        pars.where(F.col("norm") != "")
        .groupBy("norm")
        .agg(F.min(F.struct("id", "j")).alias("f"))
    )
    kept = (
        pars.join(first, "norm", "left")
        .where(
            (F.col("norm") == "")
            | ((F.col("id") == F.col("f.id")) & (F.col("j") == F.col("f.j")))
        )
        .select("id", "j", "par")
    )
    kept_agg = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "par"))),
                lambda s: s["par"],
            ),
            sep,
        ).alias("cleaned_text"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), re.escape(sep))).alias(
            "n_paragraphs"
        ),
    )
    return base.join(kept_agg, "id", "left_outer").select(
        F.col("id").alias(id_col),
        "n_paragraphs",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def remove_frequent_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_df: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """→ DataFrame(id, n_lines, n_kept, cleaned_text): every LINE whose
    normalized form (trimmed, lowercased) occurs in more than ``max_df``
    DISTINCT documents is removed from every document — the C4-style
    line-level boilerplate rule ("any line shared across ≥N pages is
    navigation/footer chrome"), the coarser sibling of
    :func:`remove_frequent_ngram_spans`. Remaining lines rejoin in order
    with ``sep``. Same survival contract as the span scrub: EVERY input
    document yields exactly one output row (fully-boilerplate docs come
    back as n_kept=0 / cleaned_text='').

    Scale shape: one posexplode, one distinct-count hash-agg over
    normalized lines (the frequent set is small by Zipf), one left-anti
    equi-join on the normalized form, one per-doc reassembly groupBy and
    the per-doc base join — all keyed by doc id or line hash, uniform at
    any corpus size.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias("j", "line"),
    ).withColumn("norm", F.lower(F.trim("line")))
    frequent = (
        lines.groupBy("norm")
        .agg(F.count_distinct("id").alias("df"))
        .filter(F.col("df") > max_df)
        .select("norm")
    )
    kept = lines.join(frequent, "norm", "left_anti")
    kept_agg = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("cleaned_text"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), re.escape(sep))).alias("n_lines"),
    )
    return base.join(kept_agg, "id", "left_outer").select(
        F.col("id").alias(id_col),
        "n_lines",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )
