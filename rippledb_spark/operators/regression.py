"""Distributed least squares for small feature counts — normal
equations + Cramer's rule (Golub & Van Loan §5; for d ≤ 4 the closed
form beats any iterative solver and, crucially here, REPLAYS): the
calibration primitive a data pipeline runs to fit quality scores,
length predictors, or mixture weights against labels.

Method: one corpus pass aggregates the Gram matrix A = Σ f·fᵀ and
moment vector b = Σ f·y. With INTEGER features and labels both are
EXACT BIGINT sums — no float reduction exists anywhere in the fit, so
determinism needs no rounding contract at all; the weights come out of
closed-form determinant ratios both engines evaluate identically from
identical integers. (Float features would need the 6dp-rounding
contract instead; integer features are the common pipeline case —
counts, lengths, flags.)

Self-verification: the output carries the corpus SSE and R² (computed
with the integer-scaled summation trick — residuals×10⁶ rounded to
bigints before the sum — so they too are order-insensitive and
bit-replayable).

Scale shape: ONE corpus pass for A and b (d² + d map-side-combinable
integer sums — d ≤ 4 keys), one more for the fit metrics; the solve
itself is arithmetic on a handful of scalars. Nothing iterative,
nothing collected beyond the d×d aggregate.

Reference comparison: n/a (no numeric surface in the reference).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _det3(m) -> str:
    """3×3 determinant as SQL text over entries m[i][j] (strings)."""
    return (
        f"({m[0][0]}*({m[1][1]}*{m[2][2]} - {m[1][2]}*{m[2][1]})"
        f" - {m[0][1]}*({m[1][0]}*{m[2][2]} - {m[1][2]}*{m[2][0]})"
        f" + {m[0][2]}*({m[1][0]}*{m[2][1]} - {m[1][1]}*{m[2][0]}))"
    )


def least_squares_3(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
) -> DataFrame:
    """Exact 3-feature least squares (include a literal 1 column for the
    intercept): → DataFrame(feature_idx, weight, sse, r2), one row per
    feature with the fit metrics repeated. ``feature_cols`` and
    ``label_col`` must be INTEGER-valued (counts/lengths/flags — cast
    upstream); that is what makes A and b exact and the whole fit
    replayable without any rounding contract. Singular systems (det 0)
    raise rather than emit garbage."""
    if len(feature_cols) != 3:
        raise ValueError("least_squares_3 takes exactly 3 feature columns")
    f = [F.col(c).cast("bigint") for c in feature_cols]
    y = F.col(label_col).cast("bigint")
    aggs = []
    for i in range(3):
        for j in range(i, 3):
            aggs.append(F.sum(f[i] * f[j]).alias(f"a{i}{j}"))
        aggs.append(F.sum(f[i] * y).alias(f"b{i}"))
    aggs.append(F.sum(y * y).alias("yy"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    aggs.append(F.sum(y).alias("sy"))
    # overflow guard inputs: the largest |feature| / |label| seen, so we
    # can verify n·max|f_i|·max|f_j| < 2^63 AFTER the one pass (Spark's
    # non-ANSI BIGINT sum wraps silently; DuckDB raises — without this
    # check a huge corpus could silently diverge from the oracle).
    for i in range(3):
        aggs.append(F.max(F.abs(f[i])).alias(f"mf{i}"))
    aggs.append(F.max(F.abs(y)).alias("my"))
    try:
        g = df.agg(*aggs).collect()[0]  # bounded: ONE row of d²+d integers
    except Exception as e:  # ANSI mode (Spark 4 default) raises on wrap
        if "ArithmeticException" in type(e).__name__ or "overflow" in str(e).lower():
            raise ValueError(
                "least_squares_3: BIGINT overflow in the Gram/moment sums "
                "— rescale the integer features (the exact-sum contract "
                "requires n·max(|f_i|·|f_j|) < 2^63)"
            ) from e
        raise
    # every aggregate must be non-null: a fully-NULL feature or label
    # column yields NULL sums/maxes for just its own aggregates, so
    # checking only a00/b0/yy/sy misses features 1-2 (ADVICE r11).
    all_aggs = (
        ["a00", "a01", "a02", "a11", "a12", "a22", "b0", "b1", "b2",
         "yy", "sy", "my"] + [f"mf{i}" for i in range(3)]
    )
    if g["n"] == 0 or any(g[k] is None for k in all_aggs):
        raise ValueError(
            "least_squares_3: empty (or fully null) input — nothing to fit"
        )
    mf = [int(g[f"mf{i}"]) for i in range(3)] + [int(g["my"])]
    n_rows = int(g["n"])
    worst = max(mf) * max(mf)
    if worst and n_rows > (2**63 - 1) // worst:
        raise ValueError(
            "least_squares_3: potential BIGINT overflow — "
            f"n({n_rows})·max|f|²({worst}) ≥ 2^63; rescale the integer "
            "features (the exact-sum contract requires "
            "n·max(|f_i|·|f_j|) < 2^63)"
        )
    a = [[float(g[f"a{min(i, j)}{max(i, j)}"]) for j in range(3)] for i in range(3)]
    b = [float(g[f"b{i}"]) for i in range(3)]

    def det(m: list[list[float]]) -> float:
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    d0 = det(a)
    if d0 == 0.0:
        raise ValueError("singular normal equations (det 0) — features "
                         "are linearly dependent on this corpus")
    w = []
    for i in range(3):
        m = [row[:] for row in a]
        for r in range(3):
            m[r][i] = b[r]
        w.append(det(m) / d0)
    # fit metrics with the integer-scaled sum (order-insensitive)
    pred = sum(wi * fi for wi, fi in zip(w, f))
    r6 = F.round((y.cast("double") - pred) * 1e6).cast("bigint")
    m = df.agg(
        (F.sum(r6 * r6) / F.lit(1e12)).alias("sse"),
    ).collect()[0]
    sse = float(m["sse"])
    n, sy, yy = float(g["n"]), float(g["sy"]), float(g["yy"])
    sst = yy - sy * sy / n
    r2 = 1.0 - sse / sst if sst > 0 else 1.0
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, round(w[i], 6), round(sse, 6), round(r2, 6)) for i in range(3)],
        "feature_idx int, weight double, sse double, r2 double",
    )


def least_squares_3_sql(
    table: str,
    feature_exprs: list[str],
    label_expr: str,
) -> str:
    """DuckDB CTE twin of :func:`least_squares_3`; yields ``lsq_fit``
    with the same four columns. The Gram sums are exact BIGINTs, the
    Cramer determinants closed-form arithmetic on them, and the SSE uses
    the same integer-scaled residual sum."""
    if len(feature_exprs) != 3:
        raise ValueError("least_squares_3_sql takes exactly 3 features")
    fe = feature_exprs
    sums = []
    for i in range(3):
        for j in range(i, 3):
            sums.append(
                f"SUM(CAST({fe[i]} AS BIGINT) * CAST({fe[j]} AS BIGINT))"
                f" AS a{i}{j}"
            )
        sums.append(
            f"SUM(CAST({fe[i]} AS BIGINT) * CAST({label_expr} AS BIGINT))"
            f" AS b{i}"
        )
    sums.append(
        f"SUM(CAST({label_expr} AS BIGINT) * CAST({label_expr} AS BIGINT))"
        " AS yy"
    )
    sums.append("COUNT(*) AS n")
    sums.append(f"SUM(CAST({label_expr} AS BIGINT)) AS sy")
    a = [[f"CAST(a{min(i, j)}{max(i, j)} AS DOUBLE)" for j in range(3)]
         for i in range(3)]
    bb = [f"CAST(b{i} AS DOUBLE)" for i in range(3)]
    d0 = _det3(a)
    ws = []
    for i in range(3):
        m = [row[:] for row in a]
        for r in range(3):
            m[r][i] = bb[r]
        ws.append(f"({_det3(m)}) / ({d0})")
    pred = " + ".join(
        f"w{i} * CAST({fe[i]} AS DOUBLE)" for i in range(3)
    )
    return f"""lsq_g AS (
      SELECT {", ".join(sums)} FROM {table}
    ),
    lsq_w AS (
      SELECT {", ".join(f"{w} AS w{i}" for i, w in enumerate(ws))},
             CAST(n AS DOUBLE) AS n, CAST(sy AS DOUBLE) AS sy,
             CAST(yy AS DOUBLE) AS yy
      FROM lsq_g
    ),
    lsq_sse AS (
      SELECT SUM(CAST(ROUND((CAST({label_expr} AS DOUBLE) - ({pred}))
                            * 1000000) AS BIGINT)
                 * CAST(ROUND((CAST({label_expr} AS DOUBLE) - ({pred}))
                              * 1000000) AS BIGINT)) / 1e12 AS sse
      FROM {table}, lsq_w
    ),
    lsq_fit AS (
      SELECT u.i AS feature_idx,
             ROUND(CASE u.i WHEN 0 THEN w.w0 WHEN 1 THEN w.w1
                            ELSE w.w2 END, 6) AS weight,
             ROUND(s.sse, 6) AS sse,
             ROUND(CASE WHEN w.yy - w.sy * w.sy / w.n > 0
                        THEN 1.0 - s.sse / (w.yy - w.sy * w.sy / w.n)
                        ELSE 1.0 END, 6) AS r2
      FROM (SELECT UNNEST(range(0, 3)) AS i) u, lsq_w w, lsq_sse s
    )"""
