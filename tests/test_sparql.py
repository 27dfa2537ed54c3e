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
