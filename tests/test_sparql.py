"""Sparql builder (Q1) — parse/validation semantics from src/rdf/query.rs."""

import pytest

from rippledb_spark.plans.sparql import Sparql, Val, Var, parse_unit


def test_parse_unit_var_vs_val():
    assert parse_unit("$x") == Var("x")
    assert parse_unit("x") == Val("x")
    assert parse_unit("http://ex.org/a") == Val("http://ex.org/a")


def test_empty_var_name_rejected():
    with pytest.raises(ValueError):
        parse_unit("$")


def test_select_rejects_non_var():
    with pytest.raises(ValueError):
        Sparql().select(["notavar"])


def test_pattern_arity():
    with pytest.raises(ValueError):
        Sparql().filter([["s", "p"]])


def test_strict_mode_rejects_undeclared_var():
    # Reference panics here (query.rs:50-59); we raise.
    with pytest.raises(ValueError):
        Sparql(strict=True).select(["$x"]).filter([["$x", "p", "$y"]])


def test_permissive_mode_allows_join_vars():
    q = Sparql().select(["$x"]).filter([["$x", "p", "$y"]])
    assert len(q.conds) == 1
    assert q.var_names() == ["x"]


def test_union_builder_and_arm_validation(spark):
    from rippledb_spark import model
    from rippledb_spark.plans.bgp import select_union
    from rippledb_spark.plans.sparql import Sparql

    rows = [
        ("http://e/a", "named", "http://e/p", "x", "literal", None, None),
        ("http://e/b", "named", "http://e/q", "y", "literal", None, None),
        ("http://e/a", "named", "http://e/q", "z", "literal", None, None),
    ]
    df = spark.createDataFrame(rows, model.TRIPLES_SCHEMA)
    arm1 = Sparql().select(["$s", "$v"]).filter([["$s", "http://e/p", "$v"]])
    arm2 = Sparql().select(["$s", "$v"]).filter([["$s", "http://e/q", "$v"]])
    got = sorted(map(tuple, select_union(df, arm1.union(arm2)).collect()))
    assert got == [
        ("http://e/a", "x"),
        ("http://e/a", "z"),
        ("http://e/b", "y"),
    ]

    # mismatched projections rejected
    import pytest

    from rippledb_spark.errors import QueryError

    bad = Sparql().select(["$s"]).filter([["$s", "http://e/p", "$v"]])
    with pytest.raises(QueryError, match="different variables"):
        select_union(df, arm1.union(bad))


def test_union_preserves_duplicates(spark):
    """SPARQL UNION is a bag op: a solution produced by both arms appears
    twice."""
    from rippledb_spark import model
    from rippledb_spark.plans.bgp import select_union
    from rippledb_spark.plans.sparql import Sparql

    rows = [("http://e/a", "named", "http://e/p", "x", "literal", None, None)]
    df = spark.createDataFrame(rows, model.TRIPLES_SCHEMA)
    arm = lambda: Sparql().select(["$s"]).filter([["$s", "http://e/p", "$v"]])
    got = [tuple(r) for r in select_union(df, arm().union(arm())).collect()]
    assert got == [("http://e/a",), ("http://e/a",)]


def test_get_rejects_optionals(spark):
    """get() is graph.rs-parity conjunctive: an OPTIONAL group must raise,
    not be silently dropped."""
    import pytest

    from rippledb_spark import model
    from rippledb_spark.errors import QueryError
    from rippledb_spark.plans.bgp import get
    from rippledb_spark.plans.sparql import Sparql

    df = spark.createDataFrame([], model.TRIPLES_SCHEMA)
    q = (
        Sparql()
        .select(["$v"])
        .filter([["$v", "http://e/p", "x"]])
        .optional([["$v", "http://e/q", "$w"]])
    )
    with pytest.raises(QueryError, match="conjunctive-only"):
        get(df, q)
