"""Fractional-epoch mixture application (operators/mixture.py)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from rippledb_spark.operators import mixture as MX


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, w double")


def test_integer_weights_repeat_exactly(spark):
    out = MX.apply_mixture_epochs(
        _df(spark, [(1, 3.0), (2, 1.0)]), "w", "id"
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["id"], []).append(r["epoch_idx"])
    assert sorted(got[1]) == [0, 1, 2]
    assert sorted(got[2]) == [0]


def test_zero_weight_drops_row(spark):
    out = MX.apply_mixture_epochs(_df(spark, [(1, 0.0)]), "w", "id").collect()
    assert out == []


def test_fractional_gate_is_deterministic_and_bounded(spark):
    # weight 2.5: every row gets 2 or 3 copies; across many ids the extra
    # copy lands on ~half (hash-gated, not RNG) and re-running is identical
    rows = [(i, 2.5) for i in range(200)]
    a = MX.apply_mixture_epochs(_df(spark, rows), "w", "id")
    counts = {
        r["id"]: r["n"]
        for r in a.groupBy("id").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts.values()) <= {2, 3}
    n3 = sum(1 for v in counts.values() if v == 3)
    assert 60 <= n3 <= 140  # ~100 expected
    b = MX.apply_mixture_epochs(_df(spark, rows), "w", "id")
    counts_b = {
        r["id"]: r["n"]
        for r in b.groupBy("id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == counts_b


def test_copy_counts_match_duckdb_twin(spark):
    rows = [(i, [0.0, 0.4, 1.0, 1.7, 2.5, 3.0][i % 6]) for i in range(60)]
    sdf = MX.apply_mixture_epochs(_df(spark, rows), "w", "id")
    got = {
        r["id"]: r["n"]
        for r in sdf.groupBy("id").agg(F.count("*").alias("n")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    n_expr = MX.mixture_epochs_sql("w", "id")
    want = dict(
        con.execute(
            f"SELECT id, n_copies FROM (SELECT id, {n_expr} FROM t)"
        ).fetchall()
    )
    for i, w in rows:
        assert got.get(i, 0) == want[i], (i, w)
