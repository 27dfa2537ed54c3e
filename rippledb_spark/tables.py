"""Testdata table access.

One parquet file per table (TESTDATA.md). Reads are plain
``spark.read.parquet`` so Catalyst gets full pushdown/pruning; at cluster
scale the same call reads a partitioned directory tree unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any realistic scale factor
# (region: 5 rows, nation: 25 rows — fixed-size in TPC-H-style generators).
BROADCAST_TABLES = {"region", "nation"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in parquet; with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as long ns since
        # epoch. Truncate to micros (what DuckDB does too) and restore the
        # timestamp type.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer DIV — a double intermediate would lose precision at
            # 1e18-scale nanosecond values (double mantissa is 53 bits)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load(spark, sf_dir, n) for n in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql(...) queries."""
    for n in TABLE_NAMES:
        load(spark, sf_dir, n).createOrReplaceTempView(n)
