"""OPQ-lite: PCA-rotated product quantization (Ge et al. 2013,
"Optimized Product Quantization" — the public intuition: rotate the
space so variance concentrates in few coordinates before splitting into
subspaces; FAISS ships the same recipe as a PCA pre-transform in front
of PQ). Full OPQ alternates rotation and codebook updates; the -lite
form here is the deterministic first step — project onto the top-R
principal components (operators/pca.py, the r10 deflation machinery)
and PQ-encode the R-dim rotated vectors.

When it helps: anisotropic embedding corpora (variance concentrated in
a low-dimensional subspace, dimensions correlated) — there the rotation
packs nearly all the signal into the kept coordinates and recall jumps
(pinned ~6× on the planted anisotropic fixture in pytest and visible in
the registered row's recall pair). When it doesn't: isotropic corpora
(nothing to concentrate) — the truncation then DISCARDS variance and
plain PQ wins; the operator documents this honestly rather than
pretending rotation is free recall.

Replayability: the rotation is pca_top_components' certified 6dp
trajectory; projections are 6dp-rounded index-ordered folds
(pca_project); the PQ stage is the certified pq_codes contract. The
whole chain replays in DuckDB (pq_rotated_sql).

Scale shape: one O(n·d²) covariance pass + R·iterations d-row rounds
(corpus-independent) + one projection pass, then PQ's documented
shape. The EXACT certification twin measures recall against true
neighbors in the ORIGINAL space (bounded nq crossJoin, the house ANN
twin pattern) — production drops it.

Reference comparison: n/a (no vector surface in the reference).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rippledb_spark.functions.vector import as_double_array
from rippledb_spark.operators.pca import (
    pca_project,
    pca_top_components,
    pca_top_components_sql,
)
from rippledb_spark.operators.pca import _dot
from rippledb_spark.operators.pq import ADC_DP, _dist2, pq_adc_sql, pq_codes


def rotate_vectors(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dims: int,
    r: int,
    pca_iterations: int = 6,
    comps: DataFrame | None = None,
) -> DataFrame:
    """→ DataFrame(id, rv array<double>[r]): each vector's 6dp-rounded
    coordinates in the top-``r`` principal-component basis (centered —
    pca_project's contract), component order = decreasing eigenvalue.
    Pass ``comps`` (pca_top_components output) to rotate with an
    ALREADY-TRAINED basis — the single definition of the projection
    assembly, shared with train_rotated_index so training and serving
    can't drift."""
    if comps is None:
        comps = pca_top_components(
            df, vec_col, dims, n_components=r, iterations=pca_iterations
        ).localCheckpoint(eager=True)
    proj = pca_project(df, vec_col, id_col, comps, dims)
    return proj.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("component", "coord"))),
            lambda s: s["coord"],
        ).alias("rv")
    )


def pq_rotated_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dims: int,
    r: int = 8,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    pca_iterations: int = 6,
    n_queries: int = 3,
    topk: int = 5,
) -> DataFrame:
    """Rotated-PQ ANN with the original-space recall twin:
    → DataFrame(q_pid, rank, pid, adc_d2, in_exact_topk) — ADC ranks in
    the R-dim rotated space; ``in_exact_topk`` marks membership in the
    EXACT full-dimension top-``topk`` of the ORIGINAL vectors (not the
    rotated ones — truncation changes distances, so recall must be
    judged against true neighbors)."""
    if r % m:
        raise ValueError(f"r {r} not divisible into {m} subspaces")
    rot = rotate_vectors(df, vec_col, id_col, dims, r, pca_iterations)
    rdf = rot.select(F.col("id").alias("pid"), "rv").localCheckpoint(
        eager=True
    )
    codes, books = pq_codes(rdf, "rv", "pid", r, m=m, k=k, iterations=iterations)
    d0 = r // m
    rqueries = rdf.orderBy("pid").limit(n_queries).select(
        F.col("pid").alias("q_pid"), F.col("rv").alias("qv")
    )
    lt = rqueries.crossJoin(F.broadcast(books)).select(
        "q_pid",
        "s",
        "cid",
        _dist2(
            F.slice(F.col("qv"), F.col("s") * d0 + 1, d0), F.col("c")
        ).alias("lt_d2"),
    )
    est = (
        codes.join(F.broadcast(lt), ["s", "cid"])
        .where(F.col("pid") != F.col("q_pid"))
        .groupBy("q_pid", "pid")
        .agg(F.round(F.sum("lt_d2"), ADC_DP).alias("adc_d2"))
    )
    w = Window.partitionBy("q_pid").orderBy("adc_d2", "pid")
    approx = est.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= topk
    )
    # exact twin in the ORIGINAL space (bounded nq crossJoin)
    full = df.select(
        F.col(id_col).alias("pid"), as_double_array(vec_col).alias("v")
    )
    xqueries = full.orderBy("pid").limit(n_queries).select(
        F.col("pid").alias("q_pid"), F.col("v").alias("qv")
    )
    exact = (
        xqueries.crossJoin(full)
        .where(F.col("pid") != F.col("q_pid"))
        .select(
            "q_pid",
            "pid",
            F.round(_dist2(F.col("qv"), F.col("v")), ADC_DP).alias("x_d2"),
        )
    )
    xw = Window.partitionBy("q_pid").orderBy("x_d2", "pid")
    exact_top = (
        exact.withColumn("xr", F.row_number().over(xw))
        .where(F.col("xr") <= topk)
        .select("q_pid", "pid", F.lit(True).alias("in_exact_topk"))
    )
    return (
        approx.join(exact_top, ["q_pid", "pid"], "left")
        .select(
            "q_pid",
            "rank",
            "pid",
            "adc_d2",
            F.coalesce("in_exact_topk", F.lit(False)).alias("in_exact_topk"),
        )
        .orderBy("q_pid", "rank")
    )


def pq_rotated_sql(
    table: str,
    vec_col: str,
    id_col: str,
    dims: int,
    r: int = 8,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    pca_iterations: int = 6,
    n_queries: int = 3,
    topk: int = 5,
    prefix: str = "rpq",
) -> str:
    """DuckDB CTE twin of :func:`pq_rotated_topk`; yields
    ``{prefix}_topk`` with the same five columns. Composes the certified
    PCA chain (pca_top_components_sql), an id-carrying rotation CTE
    (``{prefix}_rot`` — mirrors pca_project's 6dp ordered folds), and
    pq_adc_sql over the rotated relation with its exact twin pointed at
    the ORIGINAL vectors (``exact_source``)."""
    if r % m:
        raise ValueError(f"r {r} not divisible into {m} subspaces")
    parts = [
        pca_top_components_sql(
            table, vec_col, id_col, dims,
            n_components=r, iterations=pca_iterations,
        ),
        # centered vectors WITH ids (pc_cent drops them), then the
        # projection fold — same ROUND(.., 6) as pca_project
        f"""{prefix}_cent AS (
      SELECT {id_col} AS pid,
             list_transform(range(1, {dims} + 1), kk -> v[kk] - mu[kk]) AS c
      FROM (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
            WHERE len({vec_col}) = {dims}),
           pc_mu_arr
    )""",
        f"""{prefix}_pc AS (
      SELECT component, list(loading ORDER BY dim) AS pc
      FROM pca_components GROUP BY component
    )""",
        f"""{prefix}_rot AS MATERIALIZED (
      SELECT pid, list(coord ORDER BY component) AS rv FROM (
        SELECT ce.pid, p.component,
               ROUND(list_dot_product(ce.c, p.pc), 6) AS coord
        FROM {prefix}_cent ce, {prefix}_pc p
      ) GROUP BY pid
    )""",
        pq_adc_sql(
            f"{prefix}_rot", "rv", "pid", r, m=m, k=k,
            iterations=iterations, n_queries=n_queries, topk=topk,
            prefix=prefix,
            exact_source=(
                f"(SELECT {id_col} AS pid, CAST({vec_col} AS DOUBLE[]) AS v"
                f" FROM {table} WHERE len({vec_col}) = {dims})",
                "v",
                "pid",
            ),
        ),
    ]
    return ",\n    ".join(parts)


# --- frozen-index persistence + serving (the r10 save/load story, for
#     the rotated index: train once, rotate-and-query forever) ----------


def _corpus_means(df: DataFrame, vec_col: str, dims: int) -> DataFrame:
    """(i, mu): the 6dp per-dimension corpus means — the SAME rounding
    pca_project uses, materialized so frozen serving can center new
    queries with the TRAINING means (re-deriving means from the query
    batch would silently shift the rotation origin)."""
    v = df.select(as_double_array(vec_col).alias("v")).where(
        F.size("v") == dims
    )
    return (
        v.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.round(F.avg("x"), 6).alias("mu"))
    )


def train_rotated_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dims: int,
    r: int = 8,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    pca_iterations: int = 6,
):
    """Train the full rotated-PQ index → (means, comps, codes, books):
    the four frames :func:`save_rotated_index` persists. codes/books
    are :func:`pq_codes` over the rotated vectors; means/comps are the
    frozen rotation."""
    means = _corpus_means(df, vec_col, dims).localCheckpoint(eager=True)
    comps = pca_top_components(
        df, vec_col, dims, n_components=r, iterations=pca_iterations
    ).localCheckpoint(eager=True)
    rdf = rotate_vectors(
        df, vec_col, id_col, dims, r, comps=comps
    ).select(F.col("id").alias("pid"), "rv")
    codes, books = pq_codes(rdf, "rv", "pid", r, m=m, k=k, iterations=iterations)
    return means, comps, codes, books


def save_rotated_index(
    path: str,
    means: DataFrame,
    comps: DataFrame,
    codes: DataFrame,
    books: DataFrame,
) -> None:
    """Persist the rotated-PQ index as four parquet tables: ``means/``
    (dims rows), ``rotation/`` (r·dims loading rows), ``books/``
    (m·k rows), ``codes/`` (pid, s, cid — the corpus-sized table, the
    only one that grows). All tiny side tables broadcast at serve
    time; the reference comparison is the same as pq.save_index
    (graph.rs:630-695 serializes driver-side JSON; these are
    distributed parquet writes)."""
    means.write.mode("overwrite").parquet(f"{path}/means")
    comps.write.mode("overwrite").parquet(f"{path}/rotation")
    books.write.mode("overwrite").parquet(f"{path}/books")
    codes.write.mode("overwrite").parquet(f"{path}/codes")


def load_rotated_index(spark, path: str):
    """→ (means, comps, codes, books) ready for
    :func:`rotated_query_topk`."""
    return (
        spark.read.parquet(f"{path}/means"),
        spark.read.parquet(f"{path}/rotation"),
        spark.read.parquet(f"{path}/codes"),
        spark.read.parquet(f"{path}/books"),
    )


def rotated_query_topk(
    queries: DataFrame,
    means: DataFrame,
    comps: DataFrame,
    codes: DataFrame,
    books: DataFrame,
    dims: int,
    r: int,
    m: int,
    topk: int = 5,
) -> DataFrame:
    """Serve ANN queries against a FROZEN rotated-PQ index — the frame
    order matches train_rotated_index/load_rotated_index, so
    ``rotated_query_topk(q, *load_rotated_index(spark, path), ...)``
    is the natural call: center each
    query with the TRAINING means, project onto the stored components
    (the same 6dp index-ordered folds as training), then the flat-PQ
    ADC serving path (pq.pq_query_topk). ``queries`` is
    DataFrame(q_pid, qv in the ORIGINAL space). → (q_pid, rank, pid,
    adc_d2). All rotation state broadcasts; no full corpus vector is
    read."""
    from rippledb_spark.operators.pq import pq_query_topk

    mu = means.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mu"))),
            lambda s: s["mu"],
        ).alias("mu")
    )
    pc = comps.groupBy("component").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "loading"))),
            lambda s: s["loading"],
        ).alias("pc")
    )
    rq = (
        queries.where(F.size("qv") == dims)
        .crossJoin(F.broadcast(mu))
        .select(
            "q_pid", F.zip_with("qv", "mu", lambda a, b: a - b).alias("c")
        )
        .crossJoin(F.broadcast(pc))
        .select(
            "q_pid",
            "component",
            F.round(_dot(F.col("c"), F.col("pc")), 6).alias("coord"),
        )
        .groupBy("q_pid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("component", "coord"))),
                lambda s: s["coord"],
            ).alias("qv")
        )
    )
    return pq_query_topk(rq, books, codes, dims=r, m=m, topk=topk)
