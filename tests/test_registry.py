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
