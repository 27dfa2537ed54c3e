"""Property-based check of the GRAPH ?var evaluator (plans/graphs.py)
against a naive per-graph loop: the spec (§13.3) says GRAPH ?g evaluates
the group once per named graph with ?g bound to that graph's IRI; the
engine runs it as ONE distributed join chain (and, for paths, ONE
graph-tagged fixpoint). Random tiny datasets × random groups; the naive
loop — evaluate per graph with the SINGLE-graph machinery, union — is
the spec.

Spark runs per example, so example counts stay small (the same trade as
test_bgp_properties)."""

from __future__ import annotations

import random

import pytest

from rippledb_spark import model
from rippledb_spark.plans import bgp
from rippledb_spark.plans.graphs import select_dataset
from rippledb_spark.plans.sparql import Sparql, parse_unit
from rippledb_spark.quadstore import QuadStore

GRAPHS = ["g:A", "g:B", "g:C"]
NODES = ["a", "b", "c", "d"]
PREDS = ["p", "q"]


def _random_quads(rng: random.Random) -> list[tuple]:
    rows = []
    for _ in range(rng.randint(4, 14)):
        g = rng.choice(GRAPHS + [None])
        rows.append(
            model.quad_row(g, rng.choice(NODES), rng.choice(PREDS), rng.choice(NODES))
        )
    return rows


def _random_group(rng: random.Random) -> list[list[str]]:
    pats = []
    for _ in range(rng.randint(1, 2)):
        pat = []
        for pool in (NODES, PREDS, NODES):
            pat.append(rng.choice(["$x", "$y"]) if rng.random() < 0.5 else rng.choice(pool))
        pats.append(pat)
    return pats


def _naive_graph_var(qs: QuadStore, patterns: list[list[str]]) -> set[tuple]:
    """The spec's per-graph loop: evaluate the group against each named
    graph with select_join, bind ?g to the IRI, union."""
    out: set[tuple] = set()
    for (g,) in qs.graph_names().collect():
        sub = Sparql()
        sub.filter(patterns)
        names = sorted({u.name for cond in sub.conds for u in cond if hasattr(u, "name")})
        if not names:
            if bgp.ask_ground(qs.graph(g).df, sub).count():
                out.add((g,))
            continue
        sub.select([f"${n}" for n in names])
        for row in qs.graph(g).select_join(sub).collect():
            out.add((g, *[row[n] for n in names]))
    return out


@pytest.mark.parametrize("seed", range(12))
def test_graph_var_matches_per_graph_loop(spark, seed):
    rng = random.Random(7000 + seed)
    qs = QuadStore.from_rows(spark, _random_quads(rng))
    patterns = _random_group(rng)
    names = sorted(
        {tok[1:] for pat in patterns for tok in pat if tok.startswith("$")}
    )

    q = Sparql()
    grp = Sparql()
    grp.filter(patterns)
    q.graph_groups.append((parse_unit("$g"), grp))
    q.select(["$g"] + [f"${n}" for n in names])
    got = {tuple(r) for r in select_dataset(qs.df, q).collect()}
    want = _naive_graph_var(qs, patterns)
    assert got == want, f"seed {seed}: {sorted(got)} != {sorted(want)}"


def _naive_graph_path(qs: QuadStore, expr: str) -> set[tuple]:
    from rippledb_spark.plans.paths import path_pairs

    out: set[tuple] = set()
    for (g,) in qs.graph_names().collect():
        for row in path_pairs(qs.graph(g).df, expr).collect():
            out.add((g, row["src"], row["dst"]))
    return out


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("expr", ["p+", "p/q", "(p|q)+"])
def test_graph_var_paths_match_per_graph_loop(spark, seed, expr):
    rng = random.Random(9000 + seed)
    qs = QuadStore.from_rows(spark, _random_quads(rng))
    q = Sparql()
    grp = Sparql()
    grp.path("$x", expr, "$y")
    from rippledb_spark.plans.sparql import parse_unit

    q.graph_groups.append((parse_unit("$g"), grp))
    q.select(["$g", "$x", "$y"])
    got = {tuple(r) for r in select_dataset(qs.df, q).collect()}
    want = _naive_graph_path(qs, expr)
    assert got == want, f"seed {seed} {expr}: {sorted(got)} != {sorted(want)}"
