"""BPE merge learning over a corpus (engine tier — LLM tokenizer prep).

Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016, ACL —
"Neural Machine Translation of Rare Words with Subword Units"): start
from characters, repeatedly merge the most frequent adjacent symbol
pair. This implements the merge-learning loop as an iterative DataFrame
computation: each round is one corpus-wide pair-count aggregation (the
scan-shaped heavy step), a 1-row argmax collect (the only driver
traffic, K rows total for K merges), and one pure-expression merge
application.

Symbol-boundary trick (what makes the merge a plain string replace that
DuckDB reproduces byte-for-byte): the symbol sequence is stored with
every symbol WRAPPED in a sentinel char, ``␟a␟␟b␟`` style. A pair
pattern ``␟a␟␟b␟`` then cannot match inside another symbol (``␟ba␟``
contains no ``␟a␟``), and adjacent occurrences share no characters, so
non-overlapping left-to-right replacement — the semantics both Spark's
``replace`` and DuckDB's ``replace`` implement — applies the merge
greedily exactly like the reference BPE algorithm.

Scale shape: state is one row per DISTINCT word (with its corpus
count), NOT per token occurrence — the standard BPE-training reduction;
each round shuffles pair counts (bounded by the distinct-pair
vocabulary), never the corpus. The K-round driver loop collects K
single rows; at 100 TB the per-round cost is the distinct-word scan,
embarrassingly parallel.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SEP = "\x1f"  # unit separator — never appears in text tokens


def wrap_word(col):
    """word → wrapped character-symbol sequence: 'ab' → '␟a␟␟b␟'."""
    return F.concat(
        F.lit(SEP),
        F.array_join(F.split(col, ""), SEP + SEP),
        F.lit(SEP),
    )


def _symbols(col):
    """wrapped sequence → array of symbols."""
    return F.split(F.expr(f"trim(BOTH '{SEP}' FROM {col})"), SEP + SEP)


def learn_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 6,
    min_pair_count: int = 2,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, final_words): ``merges`` is a list of
    (round, left_symbol, right_symbol, pair_count) in learned order;
    ``final_words`` is the distinct-word DataFrame (word, n, syms) after
    all merges, ``syms`` being the wrapped symbol string. Ties break
    lexicographically on (left, right) — deterministic across engines.
    Stops early when no pair reaches ``min_pair_count``.
    """
    words = (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        # scrub the sentinel char from input words — a text containing
        # \x1f would otherwise silently corrupt the wrapped-symbol
        # encoding (the oracle twin scrubs identically)
        .withColumn("word", F.translate("word", SEP, ""))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", wrap_word(F.col("word")))
    )
    # One row per distinct word for the whole loop — persist once, fold
    # merges as narrow projections, checkpoint to keep the plan flat.
    words = words.localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        pairs = (
            words.withColumn("__arr", _symbols("syms"))
            .select(
                "n",
                F.explode(
                    # guard: sequence(1, 0) is DESCENDING in Spark, not
                    # empty — single-symbol words must yield no pairs
                    F.expr(
                        "CASE WHEN size(__arr) < 2 THEN array() "
                        "ELSE transform(sequence(1, size(__arr) - 1), "
                        "i -> struct(__arr[i - 1] as a, __arr[i] as b)) END"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((rnd, a, b, cnt))
        pat = f"{SEP}{a}{SEP}{SEP}{b}{SEP}"
        rep = f"{SEP}{a}{b}{SEP}"
        words = words.withColumn(
            "syms", F.replace(F.col("syms"), F.lit(pat), F.lit(rep))
        ).localCheckpoint()
    return merges, words


def apply_bpe_merges(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize text with a FROZEN ordered merge list — the production
    encode path (train once on a sample, tokenize the stream forever;
    the pq_encode of the tokenizer world). → DataFrame(doc_id, n_words,
    n_tokens, syms_md5): per document, every word is sentinel-wrapped
    (wrap_word) and each merge applies in learned order as one plain
    string replace over the whole document (words join with a space,
    which contains no sentinel, so a pair pattern can never span a word
    boundary; the sentinel-wrap argument in the module docstring gives
    exact greedy-left-to-right BPE semantics). n_tokens counts final
    symbols (words + intra-word separators); syms_md5 digests the exact
    final symbol string, so ANY mis-applied merge on any word changes
    it — the certification column.

    Scale shape: one pure-expression projection over the corpus — no
    shuffle at all; ``merges`` is a driver-side list (K entries, the
    trained artifact) folded into the expression tree."""
    words = F.filter(
        F.transform(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda w: F.translate(w, SEP, ""),
        ),
        lambda w: w != "",
    )
    syms = F.array_join(
        F.transform(
            words,
            lambda w: F.concat(
                F.lit(SEP),
                F.array_join(F.split(w, ""), SEP + SEP),
                F.lit(SEP),
            ),
        ),
        " ",
    )
    for a, b in merges:
        syms = F.replace(
            syms,
            F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
            F.lit(f"{SEP}{a}{b}{SEP}"),
        )
    n_words = F.size(words).cast("bigint")
    intra = (
        (F.length(syms) - F.length(F.replace(syms, F.lit(SEP + SEP), F.lit(""))))
        / 2
    ).cast("bigint")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        (n_words + intra).alias("n_tokens"),
        F.md5(syms).alias("syms_md5"),
    )


def bpe_apply_sql(n_merges: int = 6, min_pair_count: int = 2) -> str:
    """DuckDB twin of learn (bpe_oracle_sql's unrolled stages) + APPLY
    (:func:`apply_bpe_merges`) over the ``documents`` view: the learned
    b{r} relations feed per-round scalar-subquery replaces over each
    document's wrapped symbol string. Yields (doc_id, n_words, n_tokens,
    syms_md5) — byte-identical strings, so the md5 matches exactly."""
    sep = SEP
    base = bpe_oracle_sql(n_merges, min_pair_count)
    ctes = base.split("\n    SELECT ")[0]  # learning chain, swap the SELECT
    parts = [
        ctes,
        f"""
    d0 AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             array_to_string(
               list_transform(ws, w ->
                 '{sep}' || array_to_string(
                   list_transform(range(1, LENGTH(w) + 1),
                                  i -> substring(w, i, 1)),
                   '{sep}{sep}') || '{sep}'),
               ' ') AS s
      FROM (
        SELECT doc_id,
               list_filter(
                 list_transform(string_split_regex(trim(text), '\\s+'),
                                w -> replace(w, chr(31), '')),
                 w -> w <> '') AS ws
        FROM documents
      )
    )""",
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""
    d{r} AS (
      SELECT doc_id, n_words,
             CASE WHEN EXISTS (SELECT 1 FROM b{r})
                  THEN replace(s,
                       '{sep}' || (SELECT a FROM b{r}) || '{sep}{sep}'
                               || (SELECT b FROM b{r}) || '{sep}',
                       '{sep}' || (SELECT a FROM b{r})
                               || (SELECT b FROM b{r}) || '{sep}')
                  ELSE s END AS s
      FROM d{r - 1}
    )"""
        )
    return (
        ",".join(parts)
        + f"""
    SELECT doc_id, n_words,
           n_words + (LENGTH(s) - LENGTH(replace(s, '{sep}{sep}', ''))) // 2
             AS n_tokens,
           md5(s) AS syms_md5
    FROM d{n_merges}
    ORDER BY doc_id"""
    )


def bpe_oracle_sql(n_merges: int = 6, min_pair_count: int = 2) -> str:
    """DuckDB twin of :func:`learn_bpe_merges` over the ``documents``
    view: ``n_merges`` unrolled stages, each = pair-count aggregate +
    deterministic argmax + wrapped-string replace — byte-identical merge
    application by the sentinel-wrap argument in the module docstring.
    Returns rows (round, left_sym, right_sym, pair_count)."""
    sep = SEP
    parts = [
        f"""
    w0 AS MATERIALIZED (
      SELECT word, COUNT(*) AS n,
             '{sep}' || array_to_string(
                 list_transform(range(1, LENGTH(word) + 1),
                                i -> substring(word, i, 1)),
                 '{sep}{sep}') || '{sep}' AS syms
      FROM (
        SELECT replace(UNNEST(string_split_regex(trim(text), '\\s+')),
                       chr(31), '') AS word
        FROM documents
      )
      WHERE word <> ''
      GROUP BY word
    )"""
    ]
    selects = []
    for r in range(1, n_merges + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"""
    p{r} AS MATERIALIZED (
      SELECT sy[u.i] AS a, sy[u.i + 1] AS b, SUM(n) AS cnt
      FROM (SELECT n, string_split(trim(BOTH '{sep}' FROM syms),
                                   '{sep}{sep}') AS sy FROM {prev}),
           UNNEST(range(1, len(sy))) AS u(i)
      GROUP BY 1, 2
    ),
    b{r} AS MATERIALIZED (
      SELECT a, b, cnt FROM p{r}
      WHERE cnt >= {min_pair_count}
      ORDER BY cnt DESC, a, b LIMIT 1
    ),
    w{r} AS MATERIALIZED (
      SELECT w.word, w.n,
             CASE WHEN EXISTS (SELECT 1 FROM b{r})
                  THEN replace(w.syms,
                       '{sep}' || (SELECT a FROM b{r}) || '{sep}{sep}'
                               || (SELECT b FROM b{r}) || '{sep}',
                       '{sep}' || (SELECT a FROM b{r})
                               || (SELECT b FROM b{r}) || '{sep}')
                  ELSE w.syms END AS syms
      FROM {prev} w
    )"""
        )
        selects.append(
            f"SELECT {r} AS round, a AS left_sym, b AS right_sym, "
            f"CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        )
    return (
        "WITH " + ",".join(parts) + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY round"
    )


def bpe_vocab_sql(n_merges: int = 6, min_pair_count: int = 2) -> str:
    """Oracle for the POST-merge tokenization state: reuses the unrolled
    stages of :func:`bpe_oracle_sql` and aggregates the final word table
    — distinct words, corpus tokens, weighted symbol count, and a hash
    over every word's exact symbol sequence (any mis-applied merge in
    any round changes it)."""
    base = bpe_oracle_sql(n_merges, min_pair_count)
    ctes = base.split("\n    SELECT ")[0]  # keep the CTE chain, swap the SELECT
    return (
        ctes
        + f"""
    SELECT CAST(COUNT(*) AS BIGINT)  AS n_distinct_words,
           CAST(SUM(n) AS BIGINT)    AS n_corpus_words,
           CAST(SUM(n * len(string_split(trim(BOTH '{SEP}' FROM syms),
                                         '{SEP}{SEP}'))) AS BIGINT)
                                     AS n_corpus_symbols,
           md5(string_agg(md5(syms), '' ORDER BY word)) AS vocab_md5
    FROM w{n_merges}"""
    )
