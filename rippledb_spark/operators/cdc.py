"""Change-data-capture operators: latest-wins apply-changes and SCD type-2
history (engine-tier; the reference's only DML is single-triple insert/
remove, src/datastore/graph.rs:414-629 — ordered change streams are the
relational generalization a warehouse user expects).

Semantics follow the public Debezium/Delta-Lake APPLY CHANGES model:

- :func:`apply_changes` — fold an ordered change feed into a snapshot:
  per key, the change with the highest sequence wins; a winning delete
  removes the key, a winning upsert replaces (or inserts) the row.
- :func:`scd2` — expand a change feed into slowly-changing-dimension
  type-2 history: one row per change with ``valid_from``/``valid_to``
  half-open intervals, a per-key ``version`` ordinal, and ``is_current``.

Scale shape: apply_changes is one map-side-combinable ``max_by``
aggregation on the keys (a hot key reduces to one candidate row per task
before the shuffle) plus one key-equi anti-join; scd2 is one key window
(lead needs every version row, so per-key volume is inherently the key's
history length). No collects, no per-key loops. Ties on the sequence
break deterministically by the supplied
tiebreaker columns — callers must pass enough columns to totalize the
order or the winner is undefined (same contract as any CDC consumer).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _latest(
    changes: DataFrame, keys: list[str], sequence_cols: list[str]
) -> DataFrame:
    """Highest-sequence change per key as ONE aggregation:
    ``max_by(row-struct, sequence-struct)`` partial-aggregates map-side,
    so the shuffle carries one candidate row per key per task and no
    per-key sort runs. (Spark 4's WindowGroupLimit gives the row_number
    formulation the same map-side pruning — tools/scale_probe_cdc.py
    measures both — but the aggregation still skips the sort and does
    not depend on that rewrite firing.)"""
    row = F.struct(*[F.col(c) for c in changes.columns]).alias("__row")
    seq = F.struct(*[F.col(c) for c in sequence_cols])
    return (
        changes.groupBy(*keys)
        .agg(F.max_by(row, seq).alias("__r"))
        .select("__r.*")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sequence_cols: list[str],
    op_col: str,
    delete_op: str = "delete",
) -> DataFrame:
    """New snapshot after folding ``changes`` in: latest change per key
    (by ``sequence_cols`` descending) wins; ``op_col == delete_op`` drops
    the key, anything else upserts the change row (minus ``op_col``).

    ``changes`` must contain ``snapshot``'s columns plus ``op_col``.
    Keys untouched by any change pass through unchanged.
    """
    latest = _latest(changes, keys, sequence_cols)
    # Every changed key leaves the snapshot (one anti-join), then winning
    # upserts re-enter with their new row — a delete is simply a change
    # that never re-enters.
    survivors = snapshot.join(latest.select(*keys), on=keys, how="left_anti")
    # Null-safe: a NULL op is an upsert, not a silent delete — a plain
    # `op != delete_op` evaluates to NULL for NULL ops and the filter would
    # drop the row, turning malformed feeds into data loss.
    upserts = latest.filter(
        F.coalesce(F.col(op_col) != F.lit(delete_op), F.lit(True))
    ).select(*snapshot.columns)
    return survivors.unionByName(upserts)


def apply_changes_guarded(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sequence_cols: list[str],
    op_col: str,
    delete_op: str = "delete",
) -> DataFrame:
    """:func:`apply_changes` plus the cross-batch out-of-order guard: an
    incoming winner applies only when the snapshot has no row for its key
    or the winner's sequence is >= the stored row's (the Delta APPLY
    CHANGES ``WHEN MATCHED AND source.seq >= target.seq`` pattern).

    Plain :func:`apply_changes` assumes the feed is globally ordered by
    batch — a late change arriving in a LATER batch with a LOWER sequence
    would silently overwrite newer state. This form compares against the
    stored sequence, so stale stragglers are discarded; ``>=`` (not ``>``)
    keeps batch replay idempotent (re-applying the already-stored winner
    rewrites the identical row). Requires ``snapshot`` to retain
    ``sequence_cols`` — true for any sink whose snapshot schema is the
    change schema minus ``op_col``.

    Scale shape: adds ONE key-equi left join of the per-key winners
    against the snapshot's (key, sequence) projection — no windows, no
    extra shuffle beyond the join.
    """
    latest = _latest(changes, keys, sequence_cols)
    seq = lambda: F.struct(*[F.col(c) for c in sequence_cols])  # noqa: E731
    stored = snapshot.select(*keys, seq().alias("__stored_seq"))
    admitted = (
        latest.withColumn("__seq", seq())
        .join(stored, on=keys, how="left")
        .filter(F.col("__stored_seq").isNull() | (F.col("__seq") >= F.col("__stored_seq")))
        .drop("__seq", "__stored_seq")
    )
    survivors = snapshot.join(admitted.select(*keys), on=keys, how="left_anti")
    upserts = admitted.filter(
        F.coalesce(F.col(op_col) != F.lit(delete_op), F.lit(True))
    ).select(*snapshot.columns)
    return survivors.unionByName(upserts)


def scd2(
    changes: DataFrame,
    keys: list[str],
    sequence_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """SCD type-2 history: every change becomes a version row with
    ``valid_from`` (its sequence value), ``valid_to`` (the NEXT change's
    sequence value, NULL while current — half-open intervals, so an as-of
    probe is ``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``),
    ``version`` (1-based per key) and ``is_current``."""
    order = [F.col(sequence_col).asc()] + [
        F.col(c).asc() for c in (tiebreakers or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("valid_from", F.col(sequence_col))
        .withColumn("valid_to", F.lead(sequence_col).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
