"""SPARQL 1.1 dataset evaluation: GRAPH groups + FROM/FROM NAMED over a
quads DataFrame (dataset-tier superset — the reference is single-graph,
src/datastore/graph.rs keeps one K2Tree store with no graph dimension).

A dataset (spec §13) is one DEFAULT graph plus zero or more NAMED graphs.
Here it is one DataFrame in model.QUADS_SCHEMA: ``g`` NULL = default
graph, ``g`` = IRI = that named graph. Evaluation semantics:

- plain patterns in the WHERE group match the DEFAULT graph only;
- ``GRAPH <iri> { group }`` matches inside that one named graph — the
  group gets the FULL single-graph machinery (paths, FILTER) because the
  graph scope reduces to a filter + the ordinary triples evaluator;
- ``GRAPH ?g { group }`` matches inside EVERY named graph, binding ?g —
  each triple pattern scans the named-quads frame keeping ``g`` as an
  ordinary join column, so the per-graph iteration the spec describes
  becomes ONE distributed join chain (no driver-side loop over graphs,
  which is the design that survives a store with millions of graphs);
- ``FROM`` / ``FROM NAMED`` (§13.2) REPLACE the store's dataset: default
  = RDF merge (set union) of the FROM graphs, named set = the FROM NAMED
  IRIs; either list empty ⇒ that side of the dataset is empty, per spec.

Scale shape: graph labels are an ordinary string column — GRAPH <iri>
prunes by an equality predicate (partition-prunable when the store is
persisted partitioned by g or bucketed on it), GRAPH ?g joins carry g as
one more equi-join key. Nothing collects; nothing loops per graph.

Limits (refused loudly, never silently narrowed): GRAPH groups do not
nest, and property paths inside GRAPH ?var would need per-graph closure
state (g-keyed frontier) — supported only under GRAPH <iri>, where the
scope is a plain filter.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rippledb_spark import model
from rippledb_spark.errors import QueryError
from rippledb_spark.operators.triple_patterns import pattern_filter, position_column
from rippledb_spark.plans import bgp
from rippledb_spark.plans.sparql import Sparql, Var


def dataset_frames(quads: DataFrame, query: Sparql) -> tuple[DataFrame, DataFrame]:
    """(default_triples, named_quads) for the query's dataset: the store's
    own split when no FROM clauses are present, else the §13.2 replacement
    dataset. The FROM default graph is an RDF merge — set union across the
    listed graphs (one dropDuplicates on the triple identity)."""
    from_graphs = list(getattr(query, "from_graphs", []))
    from_named = list(getattr(query, "from_named", []))
    if not from_graphs and not from_named:
        default = quads.filter(F.col("g").isNull()).select(*model.TRIPLE_KEY)
        named = quads.filter(F.col("g").isNotNull())
        return default, named
    if from_graphs:
        default = (
            quads.filter(F.col("g").isin(from_graphs))
            .select(*model.TRIPLE_KEY)
            .dropDuplicates(model.TRIPLE_KEY)
        )
    else:
        default = quads.select(*model.TRIPLE_KEY).limit(0)
    named = (
        quads.filter(F.col("g").isin(from_named) & F.col("g").isNotNull())
        if from_named
        else quads.limit(0)
    )
    return default, named


def _group_all_vars(group: Sparql) -> list[str]:
    seen: list[str] = []
    for cond in group.conds:
        for u in cond:
            if isinstance(u, Var) and u.name not in seen:
                seen.append(u.name)
    for s_u, _, o_u in group.paths:
        for u in (s_u, o_u):
            if isinstance(u, Var) and u.name not in seen:
                seen.append(u.name)
    return seen


def _named_graph_plan(named_quads: DataFrame, iri: str, group: Sparql) -> DataFrame:
    """GRAPH <iri> { group }: the scope is a filter, then the ordinary
    single-graph evaluator runs the whole group (patterns, paths,
    FILTERs). Variable-free groups lower to a 0/1-row gate."""
    triples = named_quads.filter(F.col("g") == F.lit(iri)).select(*model.TRIPLE_KEY)
    names = _group_all_vars(group)
    if not names:
        # ground group: survives iff every pattern matches in the graph
        gate = None
        for cond in group.conds:
            bounds = tuple(None if isinstance(u, Var) else u.value for u in cond)
            ci = pattern_filter(triples, *bounds).limit(1).select(F.lit(1).alias("__gate"))
            gate = ci if gate is None else gate.intersect(ci)
        if gate is None:
            raise QueryError("GRAPH group is empty")
        return gate
    plan = Sparql()
    plan.conds = list(group.conds)
    plan.paths = list(group.paths)
    plan.filters = list(group.filters)
    plan.select([f"${n}" for n in names])
    return bgp.select_join(triples, plan)


def _var_graph_plan(named_quads: DataFrame, gname: str, group: Sparql) -> DataFrame:
    """GRAPH ?g { group }: one join chain over the named-quads frame with
    ``g`` projected as the graph variable on every pattern — the
    distributed form of the spec's per-named-graph evaluation."""
    if group.paths:
        raise QueryError(
            "property paths inside GRAPH ?var are not supported; "
            "bind the graph with GRAPH <iri> { ... }"
        )
    if not group.conds:
        raise QueryError("GRAPH group is empty")
    plans: list[DataFrame] = []
    for cond in group.conds:
        bounds = tuple(None if isinstance(u, Var) else u.value for u in cond)
        ci = pattern_filter(named_quads, *bounds)
        vpos = [(i, u.name) for i, u in enumerate(cond) if isinstance(u, Var)]
        seen: dict[str, int] = {}
        for i, name in vpos:
            if name == gname:
                # the graph variable also in a pattern position:
                # GRAPH ?g { ?g ?p ?o } constrains value == graph label
                ci = ci.filter(F.col(position_column(i)) == F.col("g"))
            elif name in seen:
                ci = ci.filter(
                    F.col(position_column(seen[name])) == F.col(position_column(i))
                )
            else:
                seen[name] = i
        cols = [F.col("g").alias(gname)]
        cols += [F.col(position_column(i)).alias(n) for n, i in seen.items()]
        plans.append(ci.select(*cols))
    acc = plans[0]
    for nxt in plans[1:]:
        shared = sorted(set(acc.columns) & set(nxt.columns))
        # every pattern carries the graph variable, so shared is never empty
        acc = acc.join(nxt, on=shared, how="inner")
    for fexpr in group.filters:
        from rippledb_spark.plans.filters import filter_vars, to_column

        unbound = sorted(v for v in filter_vars(fexpr) if v not in acc.columns)
        if unbound:
            raise QueryError(f"FILTER references unbound variables {unbound}")
        acc = acc.filter(to_column(fexpr))
    return acc


def select_dataset(
    quads: DataFrame,
    query: Sparql,
    optimize: bool = True,
    stats: dict[str, int] | None = None,
) -> DataFrame:
    """Evaluate a SELECT query with GRAPH groups / dataset clauses over a
    quads frame: lower each GRAPH group to a pre-evaluated plan, then
    delegate to the single-graph evaluator against the dataset's default
    graph — GRAPH solutions join in as ordinary solution sets (the spec's
    join-of-multisets), so OPTIONAL/FILTER/BIND/aggregates/modifiers all
    behave exactly as in select_join."""
    default, named = dataset_frames(quads, query)
    prejoined: list[DataFrame] = []
    for gterm, group in getattr(query, "graph_groups", []):
        if isinstance(gterm, Var):
            prejoined.append(_var_graph_plan(named, gterm.name, group))
        else:
            prejoined.append(_named_graph_plan(named, gterm.value, group))
    query.prejoined = prejoined
    try:
        return bgp.select_join(default, query, optimize=optimize, stats=stats)
    finally:
        query.prejoined = []
