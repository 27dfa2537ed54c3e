"""MERGE INTO (upsert) semantics over immutable DataFrames — the
snapshot-producing DML tier generalized from TripleStore.insert/remove
(D1/D2): source rows update matching target rows (source wins) and insert
otherwise.

Scale shape: one anti-join shuffle on the key (or broadcast when the
source is small — Catalyst/AQE decides; nothing is pinned) + a union.
No driver materialization; the output is a new snapshot lineage exactly
like the triple-store DML."""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(
    target: DataFrame, source: DataFrame, key: str | list[str]
) -> DataFrame:
    """Whole-row upsert: for key collisions the SOURCE row replaces the
    target row; source-only keys insert; target-only keys pass through.
    Columns must match by name (unionByName). ``key`` may be one column
    or a composite key list."""
    keys = [key] if isinstance(key, str) else list(key)
    unchanged = target.join(source.select(*keys), on=keys, how="left_anti")
    return unchanged.unionByName(source.select(*target.columns))
