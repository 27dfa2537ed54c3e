"""Deterministic cardinality / sampling sketches — the OLAP synopses a
warehouse keeps when exact distinct-counts or uniform samples are too
expensive to recompute per query:

- **KMV** (k minimum values — Bar-Yossef et al. 2002; Beyer et al. 2007
  "On Synopses for Distinct-Value Estimation Under Multiset Operations"):
  keep the k smallest hash values of the distinct set; the kth smallest
  ``u_k`` estimates the cardinality as (k−1)/u_k.
- **HLL-shaped register sketch** (Flajolet, Fusy, Gandouet, Meunier 2007
  "HyperLogLog"): the hash's first b bits route to one of m=2^b
  registers; each register keeps the max leading-zero rank ρ of the
  remaining bits; the harmonic mean of 2^{−M_j} estimates cardinality,
  with the paper's linear-counting fallback for small ranges.
- **Weighted reservoir sampling** (A-Res — Efraimidis & Spirakis 2006):
  each item draws key u^{1/w}; the k largest keys are a weighted sample
  without replacement. Ranked on ln(u)/w (monotone in the key) so the
  arithmetic replays cross-engine.

Everything is DETERMINISTIC — no RNG: the uniform draws come from md5 of
the value (the repo's hash-of-id sampling contract), so the same corpus
always yields the same sketch and the DuckDB oracle replays every
register, minimum, and sample bit-for-bit. Spark's built-in
``approx_count_distinct`` is the production HLL++ path; THIS module
exists for the engine-tier parity story (an explainable, certifiable
sketch) and self-verifies by computing the exact distinct count in the
same job and reporting the relative error.

Determinism contracts shared with the rest of the repo: hash fractions
are 48-bit md5 prefixes over exact integer arithmetic; the one
order-sensitive float reduction (the HLL harmonic sum) is computed as an
EXACT INTEGER (Σ 2^{49−M_j} — every term an integer because M_j ≤ 49)
before the single IEEE division; estimates round to 6dp; sample ranks
tiebreak on id.

Scale shape: every sketch is one explode + one or two map-side-
combinable hash-aggs keyed by (group, register) or (group, hash) — the
whole point of a sketch is that its state is O(m) or O(k) per group, so
the combine is tiny at any corpus size. The KMV/A-Res top-k are
group-partitioned rank windows (the WindowGroupLimit shape).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

EST_DP = 6
_H48 = float(1 << 48)  # 48-bit hash denominator


def _h48(col):
    """First 48 bits of md5(value) as a bigint — the deterministic
    uniform draw (12 hex chars; exact in both engines)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
    ).cast("bigint")


def _h48_sql(col: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 12)) AS BIGINT)"


def kmv_state(
    df: DataFrame, val_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """→ DataFrame(grp, h): the mergeable KMV state — per group, the up
    to ``k`` smallest distinct 48-bit hashes. WindowGroupLimit top-k
    over a (group, hash) dedup."""
    if k < 2:
        raise ValueError("k must be >= 2")
    vals = df.select(
        F.col(group_col).alias("grp"), F.col(val_col).alias("v")
    ).where(F.col("v").isNotNull())
    dh = vals.select("grp", _h48(F.col("v")).alias("h")).groupBy(
        "grp", "h"
    ).agg(F.lit(1))
    w = Window.partitionBy("grp").orderBy("h")
    return (
        dh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("grp", "h")
    )


def kmv_merge_states(k: int, *states: DataFrame) -> DataFrame:
    """Merge KMV states: the k smallest of the deduped union — exactly
    the state a single pass over the concatenated inputs would build
    (hashes are a pure value function, so shared values collide to one
    row). Associative, commutative, idempotent."""
    if not states:
        raise ValueError("need at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    w = Window.partitionBy("grp").orderBy("h")
    return (
        out.distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("grp", "h")
    )


def kmv_estimate_from_state(state: DataFrame, k: int) -> DataFrame:
    """→ DataFrame(grp, n_sketch, kmv_estimate) from a (merged) KMV
    state: (k−1)/u_k, or the exact sketch size when the group never
    filled its sketch."""
    sk = state.groupBy("grp").agg(
        F.max("h").alias("hk"),
        F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("hk").cast("double") / F.lit(_H48))
    )
    return sk.select(
        "grp", "n_sketch", F.round(est, EST_DP).alias("kmv_estimate")
    )


def cms_merge_tables(*tables: DataFrame) -> DataFrame:
    """Merge Count-Min tables ((i, c, n) frames): cell-wise sum —
    exactly the table one pass over the concatenated inputs builds.
    Associative and commutative (NOT idempotent: a CMS counts
    occurrences, so merging a table with itself doubles it — replay
    safety must come from the snapshot protocol, as in the streaming
    sinks' read-merge-overwrite cycle)."""
    if not tables:
        raise ValueError("need at least one table")
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("i", "c").agg(F.sum("n").cast("bigint").alias("n"))


def kmv_distinct_by_group(
    df: DataFrame, val_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """→ DataFrame(group, n_exact, n_sketch, kmv_estimate, rel_error):
    per group, the KMV estimate of |distinct values| beside the exact
    count (self-verifying). Groups with fewer than ``k`` distinct values
    fall back to the exact sketch size (the sketch IS the set there —
    standard KMV behavior). ``n_sketch`` = min(k, distinct)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    vals = df.select(
        F.col(group_col).alias("grp"), F.col(val_col).alias("v")
    ).where(F.col("v").isNotNull())
    dh = vals.select("grp", _h48(F.col("v")).alias("h")).groupBy(
        "grp", "h"
    ).agg(F.lit(1))
    w = Window.partitionBy("grp").orderBy("h")
    sk = (
        dh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("grp")
        .agg(
            F.max("h").alias("hk"),
            F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
        )
    )
    exact = vals.groupBy("grp").agg(
        F.count_distinct("v").alias("n_exact")
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("hk").cast("double") / F.lit(_H48))
    )
    return (
        exact.join(sk, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            "n_sketch",
            F.round(est, EST_DP).alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("n_exact")) / F.col("n_exact"), EST_DP
            ).alias("rel_error"),
        )
    )


def kmv_distinct_by_group_sql(
    table: str, val_col: str, group_col: str, k: int = 64
) -> str:
    """DuckDB CTE twin; yields ``kmv_est`` with the same five columns."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return f"""kmv_vals AS (
      SELECT {group_col} AS grp, {val_col} AS v FROM {table}
      WHERE {val_col} IS NOT NULL
    ),
    kmv_dh AS (
      SELECT DISTINCT grp, {_h48_sql("v")} AS h FROM kmv_vals
    ),
    kmv_sk AS (
      SELECT grp, MAX(h) AS hk, CAST(COUNT(*) AS BIGINT) AS n_sketch
      FROM (
        SELECT grp, h,
               row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM kmv_dh
      ) WHERE rn <= {k}
      GROUP BY grp
    ),
    kmv_exact AS (
      SELECT grp, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_exact
      FROM kmv_vals GROUP BY grp
    ),
    kmv_est AS (
      SELECT e.grp AS {group_col}, e.n_exact, s.n_sketch,
             ROUND(CASE WHEN s.n_sketch < {k}
                        THEN CAST(s.n_sketch AS DOUBLE)
                        ELSE {float(k - 1)}
                             / (CAST(s.hk AS DOUBLE) / {_H48}) END,
                   {EST_DP}) AS kmv_estimate,
             ROUND(ABS(CASE WHEN s.n_sketch < {k}
                            THEN CAST(s.n_sketch AS DOUBLE)
                            ELSE {float(k - 1)}
                                 / (CAST(s.hk AS DOUBLE) / {_H48}) END
                       - e.n_exact) / e.n_exact, {EST_DP}) AS rel_error
      FROM kmv_exact e JOIN kmv_sk s USING (grp)
    )"""


# HLL: m = 256 registers (b = 8 — the first two md5 hex chars), the
# remaining 48 bits feed the leading-zero rank, so ρ ∈ [1, 49].
HLL_M = 256
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


# --- mergeable sketch state --------------------------------------------------
# Every sketch here is MERGEABLE — the property that makes a synopsis
# useful at all in a distributed engine: per-partition (or per-micro-
# batch) states combine into the exact whole-corpus state, so map-side
# partial aggregation, streaming incremental maintenance, and cross-
# datacenter rollups all come for free. Merges: HLL = per-register max,
# KMV = k smallest of the union, CMS = cell-wise sum. All three are
# associative/commutative/idempotent-where-it-matters, pinned equal to
# the single-pass state in tests/test_sketches.py and live in
# tests/test_streaming.py (foreachBatch incremental == batch).


def hll_idx_rho(col):
    """(register index, leading-zero rank) expressions for a value
    column — the per-value HLL contribution, shared with consumers that
    iterate registers through other structures (operators/hyperball.py)."""
    h = F.md5(col.cast("string"))
    idx = F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint")
    w48 = F.conv(F.substring(h, 3, 12), 16, 10).cast("bigint")
    rho = F.when(w48 == 0, F.lit(49)).otherwise(
        F.lit(49) - F.length(F.bin(w48))
    )
    return idx, rho


def hll_registers(df: DataFrame, val_col: str, group_col: str) -> DataFrame:
    """→ DataFrame(grp, idx, m_j): the mergeable HLL state — per group
    and register, the max leading-zero rank seen. One map-side-
    combinable (group, register) hash-agg; ≤ m rows per group."""
    vals = df.select(
        F.col(group_col).alias("grp"), F.col(val_col).alias("v")
    ).where(F.col("v").isNotNull())
    idx, rho = hll_idx_rho(F.col("v"))
    return (
        vals.select("grp", idx.alias("idx"), rho.alias("rho"))
        .groupBy("grp", "idx")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_merge_registers(*states: DataFrame) -> DataFrame:
    """Merge HLL states (hll_registers frames): union + per-register
    max. Associative, commutative, idempotent — merging a state with
    itself is a no-op, which is what makes streaming replays safe."""
    if not states:
        raise ValueError("need at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("grp", "idx").agg(F.max("m_j").alias("m_j"))


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """→ DataFrame(grp, n_registers, n_zero_registers, hll_estimate):
    the Flajolet et al. estimate from a (merged) register state. The
    harmonic denominator is the EXACT integer Σ_j 2^{49−M_j} (zero
    registers contribute 2^49), so there is no order-sensitive float
    sum anywhere — one IEEE division and (for small ranges) one ln."""
    agg = regs.groupBy("grp").agg(
        # the SQL form: pyspark's shiftleft() only takes a literal
        # bit count, but the shift amount is per-register here
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
    return agg.select(
        "grp",
        "n_registers",
        zero.cast("bigint").alias("n_zero_registers"),
        F.round(est, EST_DP).alias("hll_estimate"),
    )


def hll_distinct_by_group(
    df: DataFrame, val_col: str, group_col: str
) -> DataFrame:
    """→ DataFrame(group, n_exact, n_registers, n_zero_registers,
    hll_estimate, rel_error): per group, the 256-register HLL estimate
    beside the exact distinct count (the self-verifying certification
    form; :func:`hll_registers` + :func:`hll_estimate_from_registers`
    are the mergeable production pieces it composes)."""
    vals = df.select(
        F.col(group_col).alias("grp"), F.col(val_col).alias("v")
    ).where(F.col("v").isNotNull())
    est = hll_estimate_from_registers(hll_registers(df, val_col, group_col))
    exact = vals.groupBy("grp").agg(F.count_distinct("v").alias("n_exact"))
    return exact.join(est, "grp").select(
        F.col("grp").alias(group_col),
        "n_exact",
        "n_registers",
        "n_zero_registers",
        "hll_estimate",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            EST_DP,
        ).alias("rel_error"),
    )


def hll_distinct_by_group_sql(
    table: str, val_col: str, group_col: str
) -> str:
    """DuckDB CTE twin; yields ``hll_est`` with the same six columns."""
    h = f"md5(CAST(v AS VARCHAR))"
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
    return f"""hll_vals AS (
      SELECT {group_col} AS grp, {val_col} AS v FROM {table}
      WHERE {val_col} IS NOT NULL
    ),
    hll_rho AS (
      SELECT grp,
             CAST(('0x' || substr({h}, 1, 2)) AS BIGINT) AS idx,
             CASE WHEN CAST(('0x' || substr({h}, 3, 12)) AS BIGINT) = 0
                  THEN 49
                  ELSE 49 - length(bin(
                         CAST(('0x' || substr({h}, 3, 12)) AS BIGINT)))
             END AS rho
      FROM hll_vals
    ),
    hll_regs AS (
      SELECT grp,
             CAST(SUM(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT)
               AS s_present,
             CAST(COUNT(*) AS BIGINT) AS n_registers
      FROM (SELECT grp, idx, MAX(rho) AS m_j FROM hll_rho
            GROUP BY grp, idx)
      GROUP BY grp
    ),
    hll_exact AS (
      SELECT grp, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_exact
      FROM hll_vals GROUP BY grp
    ),
    hll_est AS (
      SELECT e.grp AS {group_col}, e.n_exact, r.n_registers,
             CAST({HLL_M} - r.n_registers AS BIGINT) AS n_zero_registers,
             ROUND({est}, {EST_DP}) AS hll_estimate,
             ROUND(ABS(ROUND({est}, {EST_DP}) - e.n_exact) / e.n_exact,
                   {EST_DP}) AS rel_error
      FROM hll_exact e JOIN hll_regs r USING (grp)
    )"""


def cms_table(
    df: DataFrame, val_col: str, d: int = 3, w: int = 1024
) -> DataFrame:
    """→ DataFrame(i, c, n): the mergeable Count-Min state — d·w exact
    integer counters (row i, column md5(v‖'#'‖i) mod w). ONE map-side-
    combinable groupBy regardless of corpus size."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 rows and w >= 2 columns")
    vals = df.select(F.col(val_col).alias("v")).where(F.col("v").isNotNull())
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i")
    cell = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("v"), F.col("i"))), 1, 12
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(w),
    )
    return (
        vals.select("v", rows)
        .select("i", cell.alias("c"))
        .groupBy("i", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def cms_token_frequency(
    df: DataFrame,
    val_col: str,
    probe: DataFrame,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
    stream summary: the count-min sketch and its applications"): a d×w
    counter table — row i counts occurrences at column
    h_i(v) = md5(v‖'#'‖i) mod w — estimates any value's frequency as the
    MIN over its d counters, guaranteed ≥ the true count (collisions
    only ever add). ``probe`` is a DataFrame with ``val_col`` — the
    values whose frequencies to estimate.

    → DataFrame(value, n_exact, cms_estimate, overestimate): the exact
    count computed in the same job (self-verifying — ``overestimate`` =
    estimate − exact is provably ≥ 0, pinned in pytest). Counters are
    exact integer sums, so the DuckDB twin replays the entire table and
    every min bit-for-bit.

    Scale shape: the sketch is ONE groupBy over (row, column) — d·w
    counter rows total regardless of corpus size (the entire point);
    probing joins the tiny probe set against it broadcast."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 rows and w >= 2 columns")
    vals = df.select(F.col(val_col).alias("v")).where(F.col("v").isNotNull())
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i")
    cell = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("v"), F.col("i"))), 1, 12
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(w),
    )
    table = cms_table(df, val_col, d=d, w=w)
    p = probe.select(F.col(val_col).alias("v")).distinct()
    pcells = p.select("v", rows).select("v", "i", cell.alias("c"))
    est = (
        pcells.join(F.broadcast(table), ["i", "c"], "left")
        .groupBy("v")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cms_estimate"))
    )
    exact = (
        p.join(vals.groupBy("v").agg(F.count(F.lit(1)).alias("cnt")), "v", "left")
        .select("v", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_exact"))
    )
    return exact.join(est, "v").select(
        F.col("v").alias(val_col),
        "n_exact",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n_exact")).alias("overestimate"),
    )


def cms_token_frequency_sql(
    table: str,
    val_col: str,
    probe_rel: str,
    d: int = 3,
    w: int = 1024,
) -> str:
    """DuckDB CTE twin; yields ``cms_est`` with the same four columns.
    ``probe_rel`` is a relation with ``val_col``."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 rows and w >= 2 columns")
    cell = (
        "CAST(('0x' || substr(md5(v || '#' || CAST(i AS VARCHAR)), 1, 12))"
        f" AS BIGINT) % {w}"
    )
    return f"""cms_vals AS (
      SELECT {val_col} AS v FROM {table} WHERE {val_col} IS NOT NULL
    ),
    cms_table AS (
      SELECT i, {cell} AS c, CAST(COUNT(*) AS BIGINT) AS n
      FROM cms_vals, UNNEST(range(0, {d})) AS u(i)
      GROUP BY 1, 2
    ),
    cms_probe AS (
      SELECT DISTINCT {val_col} AS v FROM {probe_rel}
    ),
    cms_cells AS (
      SELECT v, i, {cell} AS c
      FROM cms_probe, UNNEST(range(0, {d})) AS u(i)
    ),
    cms_min AS (
      SELECT p.v, MIN(COALESCE(t.n, 0)) AS cms_estimate
      FROM cms_cells p LEFT JOIN cms_table t ON t.i = p.i AND t.c = p.c
      GROUP BY p.v
    ),
    cms_exact AS (
      SELECT p.v, CAST(COALESCE(x.cnt, 0) AS BIGINT) AS n_exact
      FROM cms_probe p LEFT JOIN (
        SELECT v, COUNT(*) AS cnt FROM cms_vals GROUP BY v
      ) x ON x.v = p.v
    ),
    cms_est AS (
      SELECT e.v AS {val_col}, e.n_exact, m.cms_estimate,
             m.cms_estimate - e.n_exact AS overestimate
      FROM cms_exact e JOIN cms_min m ON m.v = e.v
    )"""


def bloom_membership(
    members: DataFrame,
    candidates: DataFrame,
    val_col: str,
    m_bits: int = 65536,
    j: int = 3,
) -> DataFrame:
    """Deterministic Bloom filter (Bloom 1970): the filter is the
    DISTINCT set of bit positions md5(v‖'#'‖i) mod m_bits, i < j, over
    the ``members`` set; a candidate "hits" iff ALL j of its positions
    are set. No-false-negative guarantee holds by construction; false
    positives are a PURE FUNCTION of md5, so the DuckDB twin replays
    every hit — including the false ones — exactly.

    → DataFrame(value, bloom_hit, exact_member, false_positive): one row
    per distinct candidate, self-verifying (exact membership via a join
    in the same job; ``bloom_hit AND NOT exact_member`` is the FP flag,
    and ``exact_member AND NOT bloom_hit`` is impossible — pinned in
    pytest).

    Scale shape: the filter is ≤ j·|members| positions — the broadcast
    side of one join; candidates stream past it. The classic use is the
    benchmark-contamination gate: the benchmark is small, the corpus is
    not."""
    if m_bits < 2 or j < 1:
        raise ValueError("need m_bits >= 2 and j >= 1")
    rows = F.explode(F.sequence(F.lit(0), F.lit(j - 1))).alias("i")
    pos = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("v"), F.col("i"))), 1, 12
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(m_bits),
    )
    mem = members.select(F.col(val_col).alias("v")).where(
        F.col("v").isNotNull()
    ).distinct()
    bits = mem.select(rows, "v").select(pos.alias("p")).distinct()
    cand = candidates.select(F.col(val_col).alias("v")).where(
        F.col("v").isNotNull()
    ).distinct()
    hits = (
        cand.select("v", rows)
        .select("v", pos.alias("p"))
        .join(F.broadcast(bits), "p", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .where(F.col("n_set") == j)
        .select("v", F.lit(True).alias("bloom_hit"))
    )
    exact = mem.select("v", F.lit(True).alias("exact_member"))
    return (
        cand.join(hits, "v", "left")
        .join(exact, "v", "left")
        .select(
            F.col("v").alias(val_col),
            F.coalesce("bloom_hit", F.lit(False)).alias("bloom_hit"),
            F.coalesce("exact_member", F.lit(False)).alias("exact_member"),
            (
                F.coalesce("bloom_hit", F.lit(False))
                & ~F.coalesce("exact_member", F.lit(False))
            ).alias("false_positive"),
        )
    )


def bloom_membership_sql(
    members_rel: str,
    candidates_rel: str,
    val_col: str,
    m_bits: int = 65536,
    j: int = 3,
) -> str:
    """DuckDB CTE twin; yields ``bloom_res`` with the same columns."""
    if m_bits < 2 or j < 1:
        raise ValueError("need m_bits >= 2 and j >= 1")
    pos = (
        "CAST(('0x' || substr(md5(v || '#' || CAST(i AS VARCHAR)), 1, 12))"
        f" AS BIGINT) % {m_bits}"
    )
    return f"""bl_mem AS (
      SELECT DISTINCT {val_col} AS v FROM {members_rel}
      WHERE {val_col} IS NOT NULL
    ),
    bl_bits AS (
      SELECT DISTINCT {pos} AS p
      FROM bl_mem, UNNEST(range(0, {j})) AS u(i)
    ),
    bl_cand AS (
      SELECT DISTINCT {val_col} AS v FROM {candidates_rel}
      WHERE {val_col} IS NOT NULL
    ),
    bl_hits AS (
      SELECT v, TRUE AS bloom_hit FROM (
        SELECT c.v, COUNT(*) AS n_set
        FROM (SELECT v, {pos} AS p
              FROM bl_cand, UNNEST(range(0, {j})) AS u(i)) c
        SEMI JOIN bl_bits b ON b.p = c.p
        GROUP BY c.v
      ) WHERE n_set = {j}
    ),
    bloom_res AS (
      SELECT c.v AS {val_col},
             COALESCE(h.bloom_hit, FALSE) AS bloom_hit,
             (m.v IS NOT NULL) AS exact_member,
             (COALESCE(h.bloom_hit, FALSE) AND m.v IS NULL)
               AS false_positive
      FROM bl_cand c
      LEFT JOIN bl_hits h ON h.v = c.v
      LEFT JOIN bl_mem m ON m.v = c.v
    )"""


def feature_hash_vectors(
    df: DataFrame, text_col: str, id_col: str, dims: int = 16
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009, "Feature Hashing for
    Large Scale Multitask Learning"): bag-of-words → a FIXED d-dim dense
    vector with no vocabulary table — index = md5(token) mod d, sign =
    ±1 from an independent md5 bit (the signed variant that makes
    collisions cancel in expectation). The representation that lets the
    text tier feed the numeric tier (PCA, k-means, ANN) without an
    embedding model. → DataFrame(id, v array<double>); tokenless
    documents yield the zero vector (corpus accounting never loses
    rows).

    Deterministic like every sketch here — the same corpus always
    hashes identically, and per-cell sums of ±1 are integer-exact in
    doubles, so the DuckDB twin replays every vector bit-for-bit.

    Scale shape: one explode + one (id, index)-keyed map-side-combinable
    sum + one per-doc assembly agg — never a vocabulary join."""
    if dims < 1:
        raise ValueError("dims must be >= 1")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.md5(F.col("tok"))
    idx = F.pmod(
        F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint"), F.lit(dims)
    )
    sign = F.when(
        F.conv(F.substring(h, 13, 1), 16, 10).cast("bigint") % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    cells = (
        toks.select("id", idx.alias("i"), sign.alias("s"))
        .groupBy("id", "i")
        .agg(F.sum("s").alias("x"))
    )
    vecs = cells.groupBy("id").agg(
        F.map_from_arrays(
            F.collect_list("i"), F.collect_list("x")
        ).alias("m")
    ).select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda i: F.coalesce(
                F.element_at("m", i.cast("bigint")), F.lit(0.0)
            ),
        ).alias("v"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(vecs, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(
            "v", F.array_repeat(F.lit(0.0), dims)
        ).alias("v"),
    )


def feature_hash_vectors_sql(
    table: str, text_col: str, id_col: str, dims: int = 16
) -> str:
    """DuckDB CTE twin; yields ``hf_vecs`` (doc id col, v DOUBLE[])."""
    if dims < 1:
        raise ValueError("dims must be >= 1")
    h = "md5(tok)"
    return f"""hf_toks AS (
      SELECT {id_col} AS id, tok FROM (
        SELECT {id_col}, UNNEST(string_split({text_col}, ' ')) AS tok
        FROM {table}
      ) WHERE tok <> ''
    ),
    hf_cells AS (
      SELECT id,
             CAST(('0x' || substr({h}, 1, 12)) AS BIGINT) % {dims} AS i,
             SUM(CASE WHEN CAST(('0x' || substr({h}, 13, 1)) AS BIGINT)
                           % 2 = 0
                      THEN 1.0 ELSE -1.0 END) AS x
      FROM hf_toks GROUP BY id, i
    ),
    hf_agg AS (
      SELECT id, list(i ORDER BY i) AS idxs, list(x ORDER BY i) AS xs
      FROM hf_cells GROUP BY id
    ),
    hf_vecs AS (
      SELECT b.{id_col},
             COALESCE(
               (SELECT list_transform(range(0, {dims}), k ->
                  COALESCE(a.xs[list_position(a.idxs, k)], 0.0))
                FROM hf_agg a WHERE a.id = b.{id_col}),
               list_transform(range(0, {dims}), k -> 0.0)
             ) AS v
      FROM {table} b
    )"""


def weighted_sample_by_group(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    group_col: str,
    k: int = 3,
) -> DataFrame:
    """A-Res weighted sampling without replacement (Efraimidis &
    Spirakis 2006): item i draws key u_i^{1/w_i} with u_i the
    deterministic md5 fraction of its id; the k LARGEST keys per group
    are the sample — inclusion probability proportional to weight, no
    RNG, replayable. Ranked on ln(u)/w (monotone transform of the key —
    larger is better since ln(u) < 0), rounded to 6dp with an id
    tiebreak so the DuckDB twin reproduces the exact sample.

    → DataFrame(group, rank, id, weight, key_ln). Items with
    non-positive weight never sample (A-Res precondition)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("double").alias("wt"),
    ).where(F.col("wt") > 0)
    u = _h48(F.col("id")).cast("double") / F.lit(_H48)
    key_ln = F.round(F.log(u) / F.col("wt"), EST_DP)
    w = Window.partitionBy("grp").orderBy(
        F.col("key_ln").desc(), F.col("id")
    )
    return (
        base.withColumn("key_ln", key_ln)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col),
            "rank",
            F.col("id").alias(id_col),
            F.col("wt").alias(weight_col),
            "key_ln",
        )
    )


def weighted_sample_by_group_sql(
    table: str,
    id_col: str,
    weight_col: str,
    group_col: str,
    k: int = 3,
) -> str:
    """DuckDB CTE twin; yields ``wres_sample`` with the same columns."""
    if k < 1:
        raise ValueError("k must be >= 1")
    h = _h48_sql("id")
    u = f"(CAST({h} AS DOUBLE) / {_H48})"
    return f"""wres_base AS (
      SELECT {group_col} AS grp, {id_col} AS id,
             CAST({weight_col} AS DOUBLE) AS wt
      FROM {table} WHERE {weight_col} > 0
    ),
    wres_keyed AS (
      SELECT grp, id, wt, ROUND(ln({u}) / wt, {EST_DP}) AS key_ln
      FROM wres_base
    ),
    wres_sample AS (
      SELECT grp AS {group_col}, rank, id AS {id_col},
             wt AS {weight_col}, key_ln
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY grp ORDER BY key_ln DESC, id) AS rank
        FROM wres_keyed
      ) WHERE rank <= {k}
    )"""
