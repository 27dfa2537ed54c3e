"""Scalar/vector function library: text analytics and embedding math.

Everything here is built from ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen) — no Python UDFs in these hot paths. Each function has
a DuckDB-SQL twin generated from the same constants so the driver's oracle
can replay the exact formula.
"""
