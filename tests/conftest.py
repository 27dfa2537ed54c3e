from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rippledb_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small core/partition counts: correctness tests run on tiny data and
    # 32-way shuffles would just add latency.
    s = get_spark(app_name="rippledb_spark_tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
