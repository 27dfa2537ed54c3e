"""SPARQL 1.1 Update text forms → TripleStore DML (engine-tier superset).

The reference's mutation surface is programmatic insert/remove only
(src/datastore/graph.rs:420-523); this module gives those operations the
standard text form (W3C SPARQL 1.1 Update subset)::

    PREFIX pname: <iri>              -- prologue, any number
    INSERT DATA { ground triples }   -- idempotent set insert (D1)
    DELETE DATA { ground triples }   -- missing = no-op (D2)
    DELETE WHERE { patterns }        -- delete every matching triple
    DELETE { template } INSERT { template } WHERE { group }
                                     -- the modify form (either clause
                                     -- may be omitted, not both)

Triple statements are ``s p o .`` (the final dot optional before ``}``);
literals take ``"lit"``, ``"lit"@lang``, and ``"lit"^^<datatype>`` forms;
``_:name`` terms are blank nodes. GRAPH/WITH/USING are not supported
(single-graph engine, like the reference) and raise QueryError.

Semantics notes (the engine's flattened-model conventions, shared with
plans.bgp):

- DELETE WHERE removes the ACTUAL matched triples — each pattern's
  matches are semi-joined against the group's solutions, so kinds/lang/
  datatype are exact, and bound values match named nodes only
  (pattern_filter's rule, graph.rs:1031-1033).
- The modify form's DELETE template instantiates per solution and
  removes store rows matching on (s, p, o_value) regardless of object
  kind — solutions carry values, not kinds (the same flattening that
  makes CONSTRUCT lift terms as named nodes). INSERT templates
  instantiate via the CONSTRUCT machinery (named-node lift,
  unbound-template-var rows skipped per spec).

Scale shape: every form is DataFrame algebra end to end — pattern scans,
semi-joins, one anti-join for deletion, union+dedup for insertion. No
driver-side row loops; DATA forms parse on the driver (they are literal
text) into one small local DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rippledb_spark import model
from rippledb_spark.errors import QueryError
from rippledb_spark.operators.triple_patterns import pattern_filter, position_column
from rippledb_spark.plans.sparql import Sparql, Var, parse_unit
from rippledb_spark.plans.text import _Tokens, _is_kw


@dataclass(frozen=True)
class InsertData:
    rows: list[tuple]


@dataclass(frozen=True)
class DeleteData:
    rows: list[tuple]


@dataclass(frozen=True)
class DeleteWhere:
    query: Sparql


@dataclass(frozen=True)
class Modify:
    delete_template: list[list[str]]  # [] = no DELETE clause
    insert_template: list[list[str]]  # [] = no INSERT clause
    query: Sparql


UpdateForm = InsertData | DeleteData | DeleteWhere | Modify

_UNSUPPORTED = ("GRAPH", "WITH", "USING", "LOAD", "CLEAR", "DROP", "CREATE", "MOVE", "COPY", "ADD")


def _parse_prefixes(t: _Tokens) -> dict[str, str]:
    prefixes: dict[str, str] = {}
    while _is_kw(t.peek(), "PREFIX"):
        t.take()
        pname = t.take()
        if not pname.endswith(":"):
            raise QueryError(f"PREFIX name must end with ':', got {pname!r}")
        iri = t.take()
        if not (iri.startswith("<") and iri.endswith(">")):
            raise QueryError(f"PREFIX expansion must be an <iri>, got {iri!r}")
        prefixes[pname[:-1]] = iri[1:-1]
    return prefixes


def _expand(tok: str, prefixes: dict[str, str]) -> str:
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    if ":" in tok:
        pfx, local = tok.split(":", 1)
        if pfx in prefixes:
            return prefixes[pfx] + local
    return tok


def _parse_term(t: _Tokens, prefixes: dict[str, str]) -> tuple:
    """One term → (value, kind, lang, datatype) or ('$var', None, ...)
    for variables (kind None marks a variable)."""
    import re as _re

    tok = t.take()
    if tok.startswith("?") or tok.startswith("$"):
        return ("$" + tok[1:], None, None, None)
    if tok.startswith('"'):
        value = _re.sub(r"\\(.)", r"\1", tok[1:-1])
        nxt = t.peek()
        if isinstance(nxt, str) and nxt.startswith("@") and len(nxt) > 1:
            t.take()
            return (value, model.LANG_LITERAL, nxt[1:], None)
        if isinstance(nxt, str) and nxt.startswith("^^") and len(nxt) > 2:
            t.take()
            return (value, model.TYPED_LITERAL, None, _expand(nxt[2:], prefixes))
        return (value, model.LITERAL, None, None)
    value = _expand(tok, prefixes)
    kind = model.BLANK if value.startswith("_:") else model.NAMED
    return (value, kind, None, None)


def _parse_triple_block(
    t: _Tokens, prefixes: dict[str, str]
) -> list[tuple[tuple, tuple, tuple]]:
    """Parse '{ s p o . ... }' (the opening brace already expected by the
    caller) → list of (s_term, p_term, o_term) term tuples."""
    t.expect("{")
    out: list[tuple[tuple, tuple, tuple]] = []
    while True:
        tok = t.peek()
        if tok is None:
            raise QueryError("unclosed '{' in update triple block")
        if tok == "}":
            t.take()
            return out
        if isinstance(tok, str) and tok.upper() in _UNSUPPORTED:
            raise QueryError(
                f"{tok.upper()} is not supported (single-graph engine)"
            )
        s = _parse_term(t, prefixes)
        p = _parse_term(t, prefixes)
        o = _parse_term(t, prefixes)
        out.append((s, p, o))
        if t.peek() == ".":
            t.take()


def _ground_rows(block: list, what: str) -> list[tuple]:
    rows = []
    for s, p, o in block:
        for term in (s, p, o):
            if term[1] is None:
                raise QueryError(f"{what} takes ground triples; got variable {term[0]}")
        if s[1] not in (model.NAMED, model.BLANK):
            raise QueryError(f"literal subjects are not valid RDF: {s[0]!r}")
        rows.append((s[0], s[1], p[0], o[0], o[1], o[2], o[3]))
    return rows


def _patterns(block: list) -> list[list[str]]:
    """Term tuples → the builder's [s, p, o] string patterns ('$var' or
    plain value — the flattened-model form)."""
    return [[s[0], p[0], o[0]] for s, p, o in block]


def parse_update(text: str) -> UpdateForm:
    """Parse one SPARQL Update request (subset above)."""
    t = _Tokens(text)
    prefixes = _parse_prefixes(t)
    head = t.take().upper()
    if head in _UNSUPPORTED:
        raise QueryError(f"{head} is not supported (single-graph engine)")
    if head == "INSERT" and _is_kw(t.peek(), "DATA"):
        t.take()
        form: UpdateForm = InsertData(
            _ground_rows(_parse_triple_block(t, prefixes), "INSERT DATA")
        )
    elif head == "DELETE" and _is_kw(t.peek(), "DATA"):
        t.take()
        form = DeleteData(
            _ground_rows(_parse_triple_block(t, prefixes), "DELETE DATA")
        )
    elif head == "DELETE" and _is_kw(t.peek(), "WHERE"):
        t.take()
        block = _parse_triple_block(t, prefixes)
        if not block:
            raise QueryError("DELETE WHERE needs at least one pattern")
        q = Sparql()
        q.filter(_patterns(block))
        form = DeleteWhere(q)
    elif head in ("DELETE", "INSERT"):
        delete_tmpl: list[list[str]] = []
        insert_tmpl: list[list[str]] = []
        if head == "DELETE":
            delete_tmpl = _patterns(_parse_triple_block(t, prefixes))
            if _is_kw(t.peek(), "INSERT"):
                t.take()
                insert_tmpl = _patterns(_parse_triple_block(t, prefixes))
        else:
            insert_tmpl = _patterns(_parse_triple_block(t, prefixes))
        t.expect("WHERE")
        block = _parse_triple_block(t, prefixes)
        if not block:
            raise QueryError("the modify form needs a non-empty WHERE group")
        q = Sparql()
        q.filter(_patterns(block))
        form = Modify(delete_tmpl, insert_tmpl, q)
    else:
        raise QueryError(
            f"expected INSERT/DELETE (optionally DATA/WHERE), got {head!r}"
        )
    if t.peek() is not None:
        raise QueryError(f"trailing tokens in update: {t.toks[t.i:]}")
    return form


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def _bound_solutions(triples: DataFrame, q: Sparql) -> DataFrame | None:
    """Solutions of the update's WHERE group projecting every variable;
    None when the group is ground (zero variables)."""
    from rippledb_spark.plans.bgp import select_join

    names: list[str] = []
    for cond in q.conds:
        for u in cond:
            if isinstance(u, Var) and u.name not in names:
                names.append(u.name)
    if not names:
        return None
    q.select([f"${n}" for n in names])
    return select_join(triples, q)


def matched_triples(triples: DataFrame, q: Sparql) -> DataFrame:
    """Every store row matched by some pattern of ``q`` under its
    solutions — full TRIPLE_KEY rows (exact kinds), the DELETE WHERE
    delete set. Each pattern's scan semi-joins the solution bindings on
    its variable positions."""
    sol = _bound_solutions(triples, q)
    parts: list[DataFrame] = []
    for cond in q.conds:
        bounds = tuple(None if isinstance(u, Var) else u.value for u in cond)
        ci = pattern_filter(triples, *bounds)
        vpos = [(i, u.name) for i, u in enumerate(cond) if isinstance(u, Var)]
        if vpos and sol is not None:
            probe = sol.select(
                *[F.col(n).alias(f"__b{i}") for i, n in vpos]
            ).dropDuplicates()
            cond_expr = None
            for i, _ in vpos:
                eq = F.col(position_column(i)) == F.col(f"__b{i}")
                cond_expr = eq if cond_expr is None else (cond_expr & eq)
            ci = ci.join(probe, on=cond_expr, how="left_semi")
        parts.append(ci.select(*model.TRIPLE_KEY))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(model.TRIPLE_KEY)


def instantiated_values(sol: DataFrame | None, spark, template: list[list[str]]) -> DataFrame:
    """Template patterns × solutions → DataFrame(s, p, o_value) of
    instantiated value-triples (the modify form's flattened delete set);
    rows with an unbound template variable are skipped, per spec."""
    from pyspark.sql import types as T

    units = [tuple(parse_unit(x) for x in pat) for pat in template]
    schema = T.StructType([T.StructField(c, T.StringType()) for c in ("s", "p", "o_value")])
    parts = []
    for s_u, p_u, o_u in units:
        if sol is None:
            if any(isinstance(u, Var) for u in (s_u, p_u, o_u)):
                raise QueryError(
                    "template variables need a WHERE group that binds them"
                )
            parts.append(
                spark.createDataFrame([(s_u.value, p_u.value, o_u.value)], schema)
            )
            continue
        term = lambda u: F.col(u.name) if isinstance(u, Var) else F.lit(u.value)  # noqa: E731
        row = sol.select(
            term(s_u).alias("s"), term(p_u).alias("p"), term(o_u).alias("o_value")
        )
        parts.append(
            row.filter(
                F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o_value").isNotNull()
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()
