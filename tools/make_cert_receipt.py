"""Generate the local full-registry certification receipt (r8, automated).

The driver certifies 50 queries/round over a 200+-query registry, so a
query's driver row can be several rounds stale. This tool closes the
window locally and REPRODUCIBLY (round-7 verdict ask #4 — CERT_LOCAL_r7
was hand-run): it re-runs the driver-gate replica
(tools/check_correctness.run_gate — row count + column names +
order-insensitive value hash vs DuckDB, float tol 1e-9) over every
registered query whose last driver hash-green row is MORE THAN ONE ROUND
OLD (or that never had one), and writes docs/CERT_LOCAL_r{N}.md.

Queries the driver certified this round or last round are listed as
`driver-fresh` without re-running (their hash-green row IS the receipt);
everything else gets a fresh local PASS/FAIL line at HEAD.

Usage:
    python tools/make_cert_receipt.py [sf_dir] [--all] [--round N]

--all re-runs every query regardless of driver freshness.
--round N overrides the receipt's round number (default: latest
  CORRECTNESS_r*.json round + 1 — the receipt certifies the round being
  built).

Exit status 1 if any re-run query fails.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_correctness import open_oracle, run_gate  # noqa: E402

from rippledb_spark.registry import registered_defs, tier  # noqa: E402
from rippledb_spark.session import get_spark  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green_rounds() -> tuple[dict[str, int], int]:
    """(query -> last driver hash-green round, latest receipt round).
    Same green rule as __spark_entry__._last_green_round."""
    oracle_of = {q.name: q.oracle for q in registered_defs()}
    last: dict[str, int] = {}
    cur = 0
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        cur = max(cur, rnd)
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and oracle_of.get(name, "") is None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last, cur


def main() -> int:
    # hand-rolled parsing broke both documented --round forms (r8 ADVICE):
    # `--round 9` leaked the 9 into the positionals (becoming sf_dir) and
    # `--round=9` matched startswith but was never parsed. argparse it.
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true", dest="rerun_all")
    ap.add_argument("--round", type=int, default=None, dest="round_no")
    ns = ap.parse_args()
    sf_dir = ns.sf_dir
    rerun_all = ns.rerun_all
    last, cur = last_green_rounds()
    receipt_round = ns.round_no if ns.round_no is not None else cur + 1

    defs = registered_defs()
    fresh = {
        q.name: last[q.name]
        for q in defs
        if not rerun_all and q.name in last and cur - last[q.name] <= 1
    }
    to_run = [q.name for q in defs if q.name not in fresh]
    print(
        f"# {len(defs)} registered: {len(fresh)} driver-fresh (r{cur - 1}+),"
        f" re-running {len(to_run)} at sf={sf_dir}",
        file=sys.stderr,
    )

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = open_oracle(sf_dir)
    lines: list[str] = []
    n_pass = n_fail = n_rows = 0
    for r in run_gate(spark, con, sf_dir, set(to_run)):
        if r["status"] == "PASS":
            n_pass += 1
            lines.append(f"PASS  {r['name']}: {r['rows']} rows ({r['sec']}s)")
        elif r["status"] == "rows":
            n_rows += 1
            lines.append(
                f"rows  {r['name']}: {r['rows']} rows (rows-only, {r['sec']}s)"
            )
        else:
            n_fail += 1
            lines.append(f"FAIL  {r['name']}: {r['msg']}")
        print(lines[-1], file=sys.stderr)

    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True
        ).stdout.strip()
    except OSError:
        head = "unknown"
    now = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )

    out = os.path.join(ROOT, "docs", f"CERT_LOCAL_r{receipt_round}.md")
    with open(out, "w") as f:
        f.write(f"# Local certification receipt — round {receipt_round}\n\n")
        f.write(
            "Generated by `tools/make_cert_receipt.py` (round-7 verdict ask\n"
            "#4 — the receipt is produced, not hand-run): every registered\n"
            "query whose driver hash-green row is >1 round old was re-run\n"
            "through the driver-gate replica (`tools/check_correctness.py`:\n"
            "row count + column names + order-insensitive value hash vs\n"
            "DuckDB, float tol 1e-9) at the tree state below.\n\n"
        )
        f.write(f"- date: {now}\n")
        f.write(f"- HEAD: {head}\n")
        f.write(f"- command: `python tools/make_cert_receipt.py {sf_dir}"
                + (" --all" if rerun_all else "") + "`\n")
        f.write(
            f"- registry: {len(defs)} queries; {len(fresh)} driver-fresh "
            f"(hash-green in r{max(cur - 1, 0)}/r{cur}, not re-run), "
            f"{len(to_run)} re-run locally\n"
        )
        f.write(f"- result: **{n_pass} pass, {n_rows} rows-only, {n_fail} fail**\n\n")
        f.write("## Re-run results (local gate at HEAD)\n\n```\n")
        f.write("\n".join(lines))
        f.write("\n```\n\n## Driver-fresh queries (receipt = driver row)\n\n```\n")
        for name in sorted(fresh):
            f.write(
                f"driver-green r{fresh[name]}  [{tier(name):<9}]  {name}\n"
            )
        f.write("```\n")
    print(f"# wrote {out}: {n_pass} pass, {n_rows} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
