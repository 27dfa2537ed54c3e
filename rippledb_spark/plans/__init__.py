"""Logical query plans: the Sparql BGP AST and its DataFrame planner."""

from rippledb_spark.plans.sparql import Sparql, Var, Val, QueryUnit

__all__ = ["Sparql", "Var", "Val", "QueryUnit"]
