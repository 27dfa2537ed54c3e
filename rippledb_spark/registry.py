"""Query registry: the single source of truth wired into ``__spark_entry__.py``.

Each registered query is a named (spark_fn, oracle_sql) pair. The driver runs
the Spark side and the DuckDB oracle side-by-side at sf0.01 and compares
row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically in both;
- floating-point aggregates are rounded identically in both (fp addition is
  not associative — a 32-way partial agg and DuckDB's single-threaded sum
  differ in the last ulps). Identical rounding is still not sufficient when
  a group's sum lands within an ulp of a rounding boundary: ROUND then
  amplifies the ulp to a full unit-in-last-place of the rounded scale
  (q9_product_profit hit this at sf0.001). For NEW queries prefer returning
  the RAW sum — the gate's 1e-9 relative tolerance absorbs ulp noise that
  rounding would amplify;
- DuckDB-specific type quirks (HUGEINT sums) are cast back in the SQL.

Queries with ``oracle=None`` (streaming, iterative, RNG-free approximations)
get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def registered_defs() -> list[QueryDef]:
    """Every registered QueryDef, in registration (import) order —
    deterministic across checkouts and environments. Scheduling concerns
    (the driver's 50-query certification window) live in the driver-facing
    adapter (``__spark_entry__.ordered_defs``), not in the library API."""
    _load_query_modules()
    return list(REGISTRY.values())


def all_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in registered_defs()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in registered_defs() if q.oracle is not None}


_LOADED = False


def _load_query_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Import order = registration order = the tiebreak inside the
    # rotation's least-certified-first sort (__spark_entry__.ordered_defs). Keep the
    # modules whose queries have waited longest for a driver row AHEAD of
    # newly added modules, so a round's new queries never starve the
    # existing certification backlog out of the 50-query window.
    import rippledb_spark.queries.relational  # noqa: F401
    import rippledb_spark.queries.relational2  # noqa: F401
    import rippledb_spark.queries.relational3  # noqa: F401
    import rippledb_spark.queries.triples  # noqa: F401
    import rippledb_spark.queries.pipeline  # noqa: F401
    import rippledb_spark.queries.pipeline2  # noqa: F401
    import rippledb_spark.queries.streaming_batch  # noqa: F401
    import rippledb_spark.queries.relational4  # noqa: F401
    import rippledb_spark.queries.pipeline3  # noqa: F401
    import rippledb_spark.queries.pipeline4  # noqa: F401
    import rippledb_spark.queries.relational5  # noqa: F401
    import rippledb_spark.queries.triples2  # noqa: F401
    import rippledb_spark.queries.relational6  # noqa: F401
    import rippledb_spark.queries.quads  # noqa: F401
    import rippledb_spark.queries.pipeline5  # noqa: F401

    _LOADED = True
