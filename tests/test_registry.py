"""Registry / driver-contract integrity."""

from __future__ import annotations

import pytest

from rippledb_spark.registry import all_oracles, all_queries


def test_registry_shape():
    qs, os_ = all_queries(), all_oracles()
    assert len(qs) >= 40
    assert set(os_) <= set(qs)
    # the vast majority must be oracle-checked, not rows-only (rows-only is
    # reserved for Spark-native-hash / iterative / sketch ops by design)
    assert len(os_) >= len(qs) - 8
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.columns == ["c"]
    assert len(df.collect()) >= 1


@pytest.mark.parametrize("name", ["q1_pricing_summary", "bgp_get_building_in_nation0"])
def test_sample_queries_run_at_smoke_sf(spark, sf_dir, name):
    fn = all_queries()[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0


def test_library_order_is_registration_order():
    """all_queries() must be deterministic (registration order), with the
    driver-window rotation living only in the __spark_entry__ adapter."""
    import __spark_entry__ as E
    import rippledb_spark.registry as R

    lib_names = list(R.all_queries())
    assert lib_names == [q.name for q in R.registered_defs()]
    # the adapter reorders but never adds/drops
    assert sorted(lib_names) == sorted(E.queries())


def test_rotation_bands_never_certified_then_stale_headline(monkeypatch):
    """__spark_entry__.queries() order feeds the driver's 50-query
    certification window — three bands (r8 tiering policy): (1) every
    never-certified query first, (2) headline queries ≥2 rounds stale,
    (3) the rest least-recently-certified first (recency rotation)."""
    import __spark_entry__ as R
    from rippledb_spark.registry import tier

    names = list(R.queries())
    last = R._last_green_round()
    cur = max(last.values(), default=0)

    def band(n):
        if n not in last:
            return 0
        if tier(n) == "headline" and cur - last[n] >= 2:
            return 1
        return 2

    bands = [band(n) for n in names]
    assert bands == sorted(bands)
    # within band 3, non-decreasing last-green rounds (stalest first)
    tail = [last[n] for n in names if band(n) == 2]
    assert tail == sorted(tail)
    # the first 50 (the driver window) contain every never-certified query
    # (or are all never-certified, if more than 50 are pending)
    window = set(names[:50])
    pending = [n for n in names if n not in last]
    if len(pending) <= 50:
        assert set(pending) <= window
    # ...and stale-headline band members land in the window right after
    stale_headline = [n for n in names if band(n) == 1]
    if len(pending) + len(stale_headline) <= 50:
        assert set(stale_headline) <= window


def test_resample_fill_rejects_multi_count_step(spark):
    from rippledb_spark.operators.timeseries import resample_fill

    df = spark.range(1).selectExpr(
        "1 as k", "timestamp'2024-01-01' as ts", "1.0 as v"
    )
    with __import__("pytest").raises(ValueError, match="count-1 interval"):
        resample_fill(df, "k", "ts", "v", step="15 minutes")
