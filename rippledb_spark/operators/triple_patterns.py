"""Triple-pattern access paths (reference parity: Q3-Q12).

The reference dispatches 8 ways on which of (s, p, o) are bound
(``get_from_triple``, src/datastore/graph.rs:842-853) to pick a physical
access path over per-predicate K2Tree bitmaps (spo/_po/s_o/sp_/__o/_p_/
s__/___, graph.rs:854-1009). In Spark ALL EIGHT collapse into one
declarative filter — Catalyst's predicate pushdown + partition pruning
(triples persisted ``partitionBy("p")``) recover exactly the same access
paths physically:

- bound p         → partition pruning ≡ selecting the one slice
- bound s and/or o → parquet min/max + dictionary row-group skipping
                     ≡ row/column probes on the bitmap
- nothing bound   → full scan (___, graph.rs:993-1009)

Semantics fine print (must-match, SURVEY §2.3 #4): a BOUND value matches
only ``named`` nodes — the reference converts every bound pattern element
with ``to_named_node`` (graph.rs:1031-1033), so literals/blank nodes are
unreachable by value in queries while still appearing in results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from rippledb_spark import model

# pattern position → (value column, kind column or None)
_POS_COLS = {0: ("s", "s_kind"), 1: ("p", None), 2: ("o_value", "o_kind")}


def position_column(pos: int) -> str:
    """Column holding the node value at pattern position 0/1/2."""
    return _POS_COLS[pos][0]


def pattern_condition(s: str | None, p: str | None, o: str | None) -> Column | None:
    """Filter Column for one (s, p, o) pattern; None = unconstrained."""
    conds: list[Column] = []
    for pos, bound in ((0, s), (1, p), (2, o)):
        if bound is None:
            continue
        val_col, kind_col = _POS_COLS[pos]
        c = F.col(val_col) == F.lit(bound)
        if kind_col is not None:
            # Named-only matching (graph.rs:1031-1033).
            c = c & (F.col(kind_col) == F.lit(model.NAMED))
        conds.append(c)
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def pattern_filter(
    triples: DataFrame, s: str | None, p: str | None, o: str | None
) -> DataFrame:
    """All 8 access paths of graph.rs:842-853 as one declarative filter."""
    cond = pattern_condition(s, p, o)
    return triples if cond is None else triples.filter(cond)
