"""Local replica of the driver's correctness gate.

Runs every registered query at a given sf dir via Spark AND its DuckDB
oracle, compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted, floats compared to 1e-9 rel).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from rippledb_spark.registry import all_oracles, all_queries
from rippledb_spark.session import get_spark
from rippledb_spark.tables import TABLE_NAMES


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(v):
        if v is None:
            return (0, "")
        if isinstance(v, bool):
            return (1, str(v))
        if isinstance(v, (int, float)):
            return (2, float(v))
        return (3, str(v))

    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(key(v) for v in r))


def values_match(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def open_oracle(sf_dir: str):
    """DuckDB connection with the driver's pre-registered table views."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_gate(spark, con, sf_dir: str, names=None):
    """Yield one result dict per query — the driver gate as a library so
    tools/make_cert_receipt.py shares the EXACT comparison main() prints.
    status ∈ {PASS, rows, FAIL}; msg carries the failure detail."""
    queries, oracles = all_queries(), all_oracles()
    for name, fn in queries.items():
        if names is not None and name not in names:
            continue
        t0 = time.time()

        def rec(status, rows, msg=""):
            return {
                "name": name,
                "status": status,
                "rows": rows,
                "sec": round(time.time() - t0, 1),
                "msg": msg,
            }

        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            yield rec("FAIL", None, f"SPARK ERROR {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            yield rec("rows", len(srows))
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception as ex:
            yield rec("FAIL", None, f"ORACLE ERROR {type(ex).__name__}: {ex}")
            continue
        if sorted(scols) != sorted(dcols):
            yield rec(
                "FAIL", None,
                f"columns spark={sorted(scols)} duck={sorted(dcols)}",
            )
            continue
        if len(srows) != len(drows):
            yield rec(
                "FAIL", None, f"rowcount spark={len(srows)} duck={len(drows)}"
            )
            continue
        ns, nd = normalize(srows, scols), normalize(drows, dcols)
        bad = None
        for i, (ra, rb) in enumerate(zip(ns, nd)):
            if not all(values_match(x, y) for x, y in zip(ra, rb)):
                bad = (i, ra, rb)
                break
        if bad:
            yield rec(
                "FAIL", None,
                f"value mismatch at sorted-row {bad[0]}\n"
                f"  spark={bad[1]}\n  duck ={bad[2]}",
            )
        else:
            yield rec("PASS", len(srows))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = open_oracle(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for r in run_gate(spark, con, sf_dir, only):
        if r["status"] == "PASS":
            print(f"PASS  {r['name']}: {r['rows']} rows ({r['sec']}s)")
            n_pass += 1
        elif r["status"] == "rows":
            print(f"rows  {r['name']}: {r['rows']} rows (rows-only, {r['sec']}s)")
            n_rows_only += 1
        else:
            print(f"FAIL  {r['name']}: {r['msg']}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
