"""HyperBall — neighborhood-function estimation by iterating HLL
registers along edges (Boldi & Vigna 2013, "In-Core Computation of
Geometric Centralities with HyperBall: A Hundred Billion Nodes and
Beyond"; the HyperANF successor used for the Facebook four-degrees
measurement). Per node v, ball(v, t) = nodes reachable in ≤ t hops;
HyperBall keeps ONE HLL sketch per node instead of the ball set, and
each round merges every out-neighbor's sketch into the node's own —
because HLL union is per-register max, |ball| estimates for ALL nodes
and ALL radii come out of O(rounds) passes with O(V·m) state, where the
exact computation needs the O(V²) transitive closure.

Everything inherits operators/sketches.py's determinism: registers are
md5-derived (hll_idx_rho), merges are exact integer maxes, and the
estimate path has no order-sensitive float sum (the harmonic denominator
is the exact integer Σ 2^{49−M_j}) — so a DuckDB twin replays every
register of every round bit-for-bit. The per-radius SUM of node
estimates is a raw double (the registry's 1e-9-tolerance contract).

Scale shape: each round is ONE key shuffle — the edge list joins the
register table on dst (register rows fan out by in-degree, bounded by
m = 256 per node) and a (node, register)-keyed max folds the union;
state never exceeds V·m rows. This is exactly the PageRank iteration
shape with registers in place of rank mass — the whole point of the
algorithm.

Reference comparison: n/a (the reference has no graph-analytics
surface).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rippledb_spark.operators.graph import _truncate
from rippledb_spark.operators.sketches import (
    HLL_M,
    _HLL_ALPHA,
    hll_idx_rho,
)


def _ball_sum(regs: DataFrame) -> DataFrame:
    """Σ over nodes of the per-node HLL estimate → 1-row (total)."""
    agg = regs.groupBy("node").agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m_j AS INT))")
        ).alias("s_present"),
        F.count(F.lit(1)).cast("bigint").alias("n_registers"),
    )
    zero = F.lit(HLL_M) - F.col("n_registers")
    s_total = (F.col("s_present") + zero * F.lit(1 << 49)).cast("double")
    e_raw = F.lit(_HLL_ALPHA * HLL_M * HLL_M * float(1 << 49)) / s_total
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zero.cast("double")),
    ).otherwise(e_raw)
    return agg.select(F.round(est, 6).alias("est")).agg(
        F.sum("est").alias("total")
    )


def hyperball_neighborhood_function(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """→ DataFrame(t, hyperball_sum), t = 0..rounds: the neighborhood
    function N(t) = Σ_v |ball(v, t)| ESTIMATED — per-node 6dp-rounded
    HLL estimates, summed raw. N(0) estimates V; N(t)/N(∞) is the
    cumulative distance distribution (effective diameter = smallest t
    covering 90%). Balls follow OUT-edges; feed both directions for the
    undirected function."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
        .where(F.col("u").isNotNull() & F.col("w").isNotNull())
        .distinct()
    )
    e = _truncate(e, checkpoint_dir)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("w").alias("node")))
        .distinct()
    )
    idx, rho = hll_idx_rho(F.col("node"))
    regs = _truncate(
        nodes.select("node", idx.alias("idx"), rho.alias("m_j")),
        checkpoint_dir,
    )
    spark = edges.sparkSession
    out = _ball_sum(regs).select(F.lit(0).alias("t"), "total")
    for t in range(1, rounds + 1):
        contrib = e.join(
            regs.withColumnRenamed("node", "w"), "w"
        ).select(F.col("u").alias("node"), "idx", "m_j")
        regs = _truncate(
            regs.unionByName(contrib)
            .groupBy("node", "idx")
            .agg(F.max("m_j").alias("m_j")),
            checkpoint_dir,
        )
        out = out.unionByName(
            _ball_sum(regs).select(F.lit(t).alias("t"), "total")
        )
    return out.select("t", F.col("total").alias("hyperball_sum"))


def hyperball_sql(
    edges_rel: str,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> str:
    """DuckDB CTE twin; yields ``hyperball_nf`` (t, hyperball_sum) AND
    ``hb_exact`` (t, n_pairs_exact — the exact Σ_v |ball(v, t)| via a
    bounded closure, the certification twin). All register CTEs are
    MATERIALIZED (each round re-references the previous)."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    est = (
        f"CASE WHEN {_HLL_ALPHA * HLL_M * HLL_M * float(1 << 49)}"
        f" / CAST(s_present + ({HLL_M} - n_registers)"
        f" * CAST({1 << 49} AS BIGINT) AS DOUBLE) <= {2.5 * HLL_M}"
        f" AND {HLL_M} - n_registers > 0"
        f" THEN {float(HLL_M)} * ln({float(HLL_M)}"
        f" / CAST({HLL_M} - n_registers AS DOUBLE))"
        f" ELSE {_HLL_ALPHA * HLL_M * HLL_M * float(1 << 49)}"
        f" / CAST(s_present + ({HLL_M} - n_registers)"
        f" * CAST({1 << 49} AS BIGINT) AS DOUBLE) END"
    )

    def ball_sum(reg_rel: str, t: int) -> str:
        return f"""hb_sum{t} AS MATERIALIZED (
      SELECT {t} AS t, SUM(est) AS hyperball_sum FROM (
        SELECT ROUND({est}, 6) AS est FROM (
          SELECT node,
                 CAST(SUM(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT)
                   AS s_present,
                 CAST(COUNT(*) AS BIGINT) AS n_registers
          FROM {reg_rel} GROUP BY node
        )
      )
    )"""

    h = "md5(CAST(node AS VARCHAR))"
    parts = [
        f"""hb_e AS MATERIALIZED (
      SELECT DISTINCT {src} AS u, {dst} AS w FROM {edges_rel}
      WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
    )""",
        # DISTINCT over UNION ALL, not bare UNION: under WITH RECURSIVE
        # DuckDB treats any `X UNION Y` CTE body as a recursive
        # base/step pair and skips the dedup (measured: duplicate node
        # rows inflated n_registers 4x at t=0)
        """hb_nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM hb_e UNION ALL SELECT w FROM hb_e
      )
    )""",
        f"""hb_r0 AS MATERIALIZED (
      SELECT node,
             CAST(('0x' || substr({h}, 1, 2)) AS BIGINT) AS idx,
             CASE WHEN CAST(('0x' || substr({h}, 3, 12)) AS BIGINT) = 0
                  THEN 49
                  ELSE 49 - length(bin(
                         CAST(('0x' || substr({h}, 3, 12)) AS BIGINT)))
             END AS m_j
      FROM hb_nodes
    )""",
        ball_sum("hb_r0", 0),
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""hb_r{t} AS MATERIALIZED (
      SELECT node, idx, MAX(m_j) AS m_j FROM (
        SELECT node, idx, m_j FROM hb_r{t - 1}
        UNION ALL
        SELECT e.u AS node, r.idx, r.m_j
        FROM hb_e e JOIN hb_r{t - 1} r ON r.node = e.w
      ) GROUP BY node, idx
    )"""
        )
        parts.append(ball_sum(f"hb_r{t}", t))
    nf_union = "\n      UNION ALL\n      ".join(
        f"SELECT t, hyperball_sum FROM hb_sum{t}" for t in range(rounds + 1)
    )
    parts.append(f"""hyperball_nf AS (
      {nf_union}
    )""")
    # exact twin: bounded closure with hop counts (certification side —
    # O(V²) pairs, so only for small certified graphs; the consuming
    # oracle must open WITH RECURSIVE for hb_reach)
    parts.append(
        f"""hb_reach AS (
      SELECT node AS v, node AS u, 0 AS t FROM hb_nodes
      UNION
      SELECT r.v, e.w, r.t + 1
      FROM hb_reach r JOIN hb_e e ON e.u = r.u
      WHERE r.t < {rounds}
    )"""
    )
    parts.append(
        """hb_mind AS (
      SELECT v, u, MIN(t) AS d FROM hb_reach GROUP BY v, u
    )"""
    )
    parts.append(
        f"""hb_exact AS (
      SELECT ts.t, CAST(COUNT(*) AS BIGINT) AS n_pairs_exact
      FROM (SELECT UNNEST(range(0, {rounds + 1})) AS t) ts
      JOIN hb_mind m ON m.d <= ts.t
      GROUP BY ts.t
    )"""
    )
    return ",\n    ".join(parts)


def exact_neighborhood_function(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """→ DataFrame(t, n_pairs_exact): the EXACT Σ_v |ball(v, t)| by
    bounded closure — the certification twin (O(V²) pair state, the
    closure-form SCC contract: small entity/state graphs only; at
    webgraph scale the whole point is that HyperBall replaces this)."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = (
        edges.select(F.col(src).alias("eu"), F.col(dst).alias("ew"))
        .where(F.col("eu").isNotNull() & F.col("ew").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("eu").alias("node"))
        .unionByName(e.select(F.col("ew").alias("node")))
        .distinct()
    )
    state = nodes.select(
        F.col("node").alias("v"),
        F.col("node").alias("u"),
        F.lit(0).alias("d"),
    ).localCheckpoint(eager=True)
    frontier = state
    for t in range(1, rounds + 1):
        step = (
            frontier.join(e, frontier["u"] == e["eu"])
            .select("v", F.col("ew").alias("u"), F.lit(t).alias("d"))
            .distinct()
        )
        new = step.join(state, ["v", "u"], "left_anti").localCheckpoint(
            eager=True
        )
        state = state.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    per_d = state.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ts = edges.sparkSession.range(rounds + 1).select(
        F.col("id").cast("int").alias("t")
    )
    return (
        ts.join(per_d, per_d["d"] <= ts["t"])
        .groupBy("t")
        .agg(F.sum("n").cast("bigint").alias("n_pairs_exact"))
    )
