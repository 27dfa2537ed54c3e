"""Pipeline query batch 8 (r10), each oracle-checked end to end:

- two-stage ANN retrieval (IVF-PQ ADC shortlist → exact re-rank —
  FAISS's refine step, operators/pq.ivfpq_rerank_topk);
- paragraph-level dedup, TIFF LZW decode, crawl-frontier redirect
  composition (added below as the round progresses).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.operators import pq as PQ
from rippledb_spark.registry import query
from rippledb_spark.tables import load

# same index params as ivfpq_ann_topk (pipeline7) so the two rows are
# directly comparable; shortlist R=15 » topk=5 is where the re-rank
# effect shows (the ADC ordering's 6-15 band gets a second chance)
_RERANK_CTE = PQ.ivfpq_rerank_sql(
    "embeddings", "embedding", "vec_id", dims=64, ncells=4, nprobe=2,
    m=8, k=16, shortlist=15,
)


@query(
    "ivfpq_rerank_topk",
    oracle=f"""
    WITH {_RERANK_CTE.strip()}
    SELECT q_pid, rank, pid, cell, adc_rank, exact_d2, in_exact_topk
    FROM ivfpq_rerank ORDER BY q_pid, rank
    """,
)
def ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN retrieval (operators/pq.ivfpq_rerank_topk, r10 —
    FAISS's refine step on top of the r9 IVF-PQ index): ADC ranks a
    shortlist of R=15 candidates per query from the probed cells, those
    R·nq full vectors are fetched by pid (broadcast semi-join — the
    exact arithmetic runs on R·nq rows, never corpus×queries), and the
    top-5 is the exact full-dimension re-rank of the shortlist. Recall
    is tunable via R instead of fixed by ADC quantization error, and
    provably ≥ plain ADC's on the same corpus (true neighbors beat all
    non-neighbors on exact distance, so every true-top-k member the
    shortlist caught survives the re-rank — pinned by
    tests/test_pq.py). The oracle replays the whole chain — coarse
    routing, residual codebooks, ADC shortlist, exact re-rank, and the
    certification twin — in one DuckDB CTE chain."""
    e = load(spark, sf_dir, "embeddings")
    return PQ.ivfpq_rerank_topk(
        e, "embedding", "vec_id", dims=64, ncells=4, nprobe=2, m=8,
        k=16, shortlist=15,
    )


from rippledb_spark.operators import multimodal as MM  # noqa: E402


@query(
    "tiff_lzw_pixel_accounting",
    oracle="""
    WITH shp AS (
      SELECT doc_id,
             CAST(5 + doc_id % 6 AS BIGINT) AS w,
             CAST(3 + doc_id % 4 AS BIGINT) AS h,
             CASE WHEN doc_id % 4 IN (0, 3) THEN 5 ELSE 0 END AS xc
      FROM documents
    ),
    px AS (
      SELECT doc_id,
             k,
             (7 * doc_id + 3 * (k // w) + xc * (k % w)) % 256 AS p
      FROM shp, UNNEST(range(0, w * h)) AS u(k)
    )
    SELECT s.doc_id AS media_id,
           CAST(MIN(s.w) AS INT) AS width,
           CAST(MIN(s.h) AS INT) AS height,
           (MIN(s.doc_id) % 2 = 1) AS predictor2,
           CAST(SUM(x.p) AS BIGINT) AS pixel_sum,
           CAST(SUM((x.k + 1) * x.p) AS BIGINT) AS pixel_wsum
    FROM shp s JOIN px x ON x.doc_id = s.doc_id
    GROUP BY s.doc_id ORDER BY media_id
    """,
)
def tiff_lzw_pixel_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL LZW-TIFF decode (operators/multimodal.tiff_lzw_decode, r10 —
    TIFF 6.0 §13, the other common scanned-corpus compression, with the
    §14 horizontal-differencing Predictor=2): synthesize LZW TIFFs
    cycling Predictor 1/2 × little/big endian × one/two strips with
    id-arithmetic pixel content (xc=0 rows are constant — long LZW runs;
    xc=5 rows vary — fresh table entries), decode every payload back
    (MSB-first variable-width codes, EARLY 9→10→11→12 width changes at
    510/1022/2046, table reset on ClearCode, per-row cumulative-sum
    undifferencing), and report raw + position-weighted pixel digests.
    TIFF LZW is lossless, so the oracle recomputes every decoded pixel
    in closed form: a width-schedule slip, a missed reset, a strip
    misassembled, or an undifferencing error changes a sum, and any
    pixel REORDERING changes pixel_wsum. Distinct from GIF's LZW
    (decode_gif_lzw) in bit order, width schedule, and framing — a
    sibling decoder, not a reuse. The coprime id moduli (2/3/4) hit
    every predictor×endian×strip corner by construction (the r8 ADVICE
    lesson). Reference comparison: n/a (no binary surface).

    100 TB shape: one Arrow mapInPandas where the payloads live; one
    row per image; no shuffle before the final sort."""
    d = load(spark, sf_dir, "documents")
    media = MM.synthesize_tiffs_lzw(d, "doc_id")
    return MM.tiff_lzw_pixel_stats(media).orderBy("media_id")


@query(
    "paragraph_dedup_accounting",
    oracle="""
    WITH pard AS (
      SELECT doc_id,
             text || chr(10) || 'viral paragraph ' ||
               CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
             'unique paragraph ' || CAST(doc_id AS VARCHAR) AS text
      FROM documents
    ),
    pars AS (
      SELECT doc_id, u.j, pn[u.j + 1] AS par,
             lower(trim(pn[u.j + 1])) AS norm
      FROM (SELECT doc_id, string_split(text, chr(10)) AS pn FROM pard),
           UNNEST(range(len(pn))) AS u(j)
    ),
    ranked AS (
      SELECT doc_id, j, par, norm,
             row_number() OVER (PARTITION BY norm ORDER BY doc_id, j) AS rn
      FROM pars
    ),
    kept AS (
      SELECT doc_id, j, par FROM ranked WHERE norm = '' OR rn = 1
    ),
    kept_agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(par, chr(10) ORDER BY j) AS cleaned
      FROM kept GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id, len(string_split(text, chr(10))) AS n_pars FROM pard
    )
    SELECT b.doc_id, CAST(b.n_pars AS INT) AS n_paragraphs,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           md5(COALESCE(k.cleaned, '')) AS cleaned_md5
    FROM base b LEFT JOIN kept_agg k USING (doc_id)
    ORDER BY b.doc_id
    """,
)
def paragraph_dedup_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph dedup (operators/cleaning.dedup_paragraphs,
    r10 — Wenzek et al. 2020: repeated normalized paragraphs keep ONLY
    their first corpus-wide occurrence, unlike C4's remove-all rule in
    clean_frequent_line_removal): documents get a planted viral
    paragraph shared by their doc_id%7 cohort plus a unique one; after
    dedup, exactly one member of each cohort keeps the viral paragraph
    and every document keeps its unique one. Per-doc kept counts and the
    md5 of the exact reassembled text are hash-verified against the
    DuckDB twin (its norm-partitioned rank window replays the Spark
    side's min-struct first-occurrence rule exactly)."""
    from rippledb_spark.operators.cleaning import dedup_paragraphs

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nviral paragraph "),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("\nunique paragraph "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    out = dedup_paragraphs(d, "text", "doc_id")
    return out.select(
        "doc_id",
        F.col("n_paragraphs").cast("int").alias("n_paragraphs"),
        "n_kept",
        F.md5("cleaned_text").alias("cleaned_md5"),
    ).orderBy("doc_id")


from rippledb_spark.operators.hyperball import (  # noqa: E402
    exact_neighborhood_function,
    hyperball_neighborhood_function,
    hyperball_sql,
)

_HB_CTE = hyperball_sql("sedges", "a", "b", rounds=4)


@query(
    "hyperball_event_transitions",
    oracle=f"""
    WITH RECURSIVE
    tr AS (
      SELECT event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS b
      FROM events
    ),
    cnt AS (SELECT a, b, COUNT(*) AS c FROM tr WHERE b IS NOT NULL
            GROUP BY a, b),
    tot AS (SELECT SUM(c) AS total, COUNT(*) AS n_pairs FROM cnt),
    sedges AS (
      SELECT a, b FROM cnt, tot
      WHERE 100 * c * n_pairs >= 101 * total AND a <> b
    ),
    {_HB_CTE.strip()}
    SELECT f.t, e.n_pairs_exact,
           ROUND(f.hyperball_sum, 6) AS hyperball_sum,
           ROUND(ABS(ROUND(f.hyperball_sum, 6) - e.n_pairs_exact)
                 / e.n_pairs_exact, 6) AS rel_error
    FROM hyperball_nf f JOIN hb_exact e USING (t)
    ORDER BY f.t
    """,
)
def hyperball_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood function (operators/hyperball.py, r10 —
    Boldi & Vigna 2013, the HLL-per-node algorithm behind the Facebook
    four-degrees measurement) over the SAME above-average
    event-transition graph as the SCC queries: per radius t = 0..4, the
    estimated Σ_v |ball(v, t)| from 256-register sketches merged along
    edges each round (per-register max — one key shuffle per round,
    V·256 state, never the closure), joined with the EXACT bounded-
    closure twin computed in the same job. Every register of every
    round replays in the oracle (the merges are integer maxes, the
    estimate path has no order-sensitive float sum); rel_error is the
    self-verifying accuracy column. At webgraph scale the exact twin is
    the thing HyperBall exists to replace — here it certifies the
    estimator. Reference comparison: n/a (no graph-analytics surface)."""
    ev = load(spark, sf_dir, "events")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    cnt = tr.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    edges = (
        cnt.crossJoin(F.broadcast(tot))
        .where(
            (100 * F.col("c") * F.col("n_pairs") >= 101 * F.col("total"))
            & (F.col("a") != F.col("b"))
        )
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    nf = hyperball_neighborhood_function(edges, "a", "b", rounds=4)
    exact = exact_neighborhood_function(edges, "a", "b", rounds=4)
    # 6dp-round the float outputs: the raw Σ of per-node estimates
    # carries last-ulp noise from partial-agg order that VARIES RUN TO
    # RUN (task scheduling), and the gate sorts rows by every column —
    # two converged radii (identical sums) flipped order between
    # engines and paired mismatched rows. Rounding makes ties exact.
    s6 = F.round(F.col("hyperball_sum"), 6)
    return (
        nf.join(exact, "t")
        .select(
            "t",
            "n_pairs_exact",
            s6.alias("hyperball_sum"),
            F.round(
                F.abs(s6 - F.col("n_pairs_exact")) / F.col("n_pairs_exact"),
                6,
            ).alias("rel_error"),
        )
        .orderBy("t")
    )


from pyspark.sql import Window as _W  # noqa: E402


def _event_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The above-average event-transition graph shared by the SCC and
    HyperBall queries."""
    ev = load(spark, sf_dir, "events")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    cnt = tr.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_pairs")
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .where(
            (100 * F.col("c") * F.col("n_pairs") >= 101 * F.col("total"))
            & (F.col("a") != F.col("b"))
        )
        .select("a", "b")
        .localCheckpoint(eager=True)
    )


_HB_EDGES_SQL = """tr AS (
      SELECT event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS b
      FROM events
    ),
    cnt AS (SELECT a, b, COUNT(*) AS c FROM tr WHERE b IS NOT NULL
            GROUP BY a, b),
    tot AS (SELECT SUM(c) AS total, COUNT(*) AS n_pairs FROM cnt),
    sedges AS (
      SELECT a, b FROM cnt, tot
      WHERE 100 * c * n_pairs >= 101 * total AND a <> b
    )"""


@query(
    "hyperball_harmonic_event_transitions",
    oracle=f"""
    WITH RECURSIVE
    {_HB_EDGES_SQL},
    {hyperball_sql("sedges", "a", "b", rounds=4).strip()}
    SELECT h.node,
           ROUND(COALESCE(e.harmonic_exact, 0.0), 6) AS harmonic_exact,
           ROUND(h.harmonic_est, 6) AS harmonic_est
    FROM hyperball_harmonic h
    LEFT JOIN hb_harm_exact e USING (node)
    ORDER BY h.node
    """,
)
def hyperball_harmonic_event_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Harmonic centrality estimated from HyperBall's per-radius ball
    sizes (operators/hyperball.py, r10 — Boldi & Vigna's flagship
    application: H(v) = Σ 1/d(v,u), the centrality that handles
    disconnected graphs gracefully): per node, Σ_t (B_t − B_{t−1})/t
    over the per-round HLL estimates (negative branch-boundary diffs
    clamp to 0 — the standard correction, identical in both engines),
    beside the EXACT Σ 1/d from the bounded closure computed in the
    same job. Sink nodes (no out-reach) report 0 in both columns.
    Every register of every round replays in the oracle. Reference
    comparison: n/a."""
    from rippledb_spark.operators.hyperball import (
        exact_harmonic_centrality,
        hyperball_harmonic_centrality,
    )

    edges = _event_edges(spark, sf_dir)
    est = hyperball_harmonic_centrality(edges, "a", "b", rounds=4)
    exact = exact_harmonic_centrality(edges, "a", "b", rounds=4)
    # 6dp rounds on BOTH float columns: the raw Σ 1/d and Σ diff/t carry
    # run-varying last-ulp partial-agg noise, and near-tied nodes
    # flipped the gate's row sort between engines (see
    # hyperball_event_transitions' note)
    return (
        est.join(exact, "node", "left")
        .select(
            "node",
            F.round(
                F.coalesce("harmonic_exact", F.lit(0.0)), 6
            ).alias("harmonic_exact"),
            F.round("harmonic_est", 6).alias("harmonic_est"),
        )
        .orderBy("node")
    )


from rippledb_spark.functions import html as HTML8  # noqa: E402
from rippledb_spark.functions import robots as RB8  # noqa: E402
from rippledb_spark.functions import url as URL8  # noqa: E402
from rippledb_spark.operators.frontier import (  # noqa: E402
    resolve_link_sql as FR8_resolve_link_sql,
)
from rippledb_spark.operators.redirects import (  # noqa: E402
    resolve_redirect_chains_sql,
)

_FR_RR_CTE = resolve_redirect_chains_sql("redge", "from_url", "to_url", 8)


@query(
    "crawl_frontier_redirects_accounting",
    oracle=f"""
    WITH RECURSIVE
    hostt AS (SELECT DISTINCT doc_id % 10 AS hid FROM documents),
    pages AS (
      SELECT 'r' || (doc_id % 10) AS host,
             '<html><body><a href="https://r' || (doc_id % 10) ||
             '/old' || (doc_id % 5) || '">x</a>' ||
             CASE WHEN doc_id % 4 = 3
                  THEN '<a href=''/loopa''>y</a>'
                  ELSE '<a href=''/page' || (doc_id % 4) || '''>y</a>'
             END || '</body></html>' AS html
      FROM documents
    ),
    redge AS (
      SELECT 'https://r' || hid || '/old' || j AS from_url,
             'https://r' || hid || '/old' || (j + 1) AS to_url
      FROM hostt, UNNEST(range(0, 4)) AS u(j)
      UNION ALL
      SELECT 'https://r' || hid || '/old4', 'https://r' || hid || '/new'
      FROM hostt
      UNION ALL
      SELECT 'https://r' || hid || '/loopa', 'https://r' || hid || '/loopb'
      FROM hostt
      UNION ALL
      SELECT 'https://r' || hid || '/loopb', 'https://r' || hid || '/loopa'
      FROM hostt
    ),
    raw_links AS (
      SELECT host AS src_host,
             UNNEST({HTML8.extract_links_sql("html")}) AS link
      FROM pages
    ),
    canon AS (
      SELECT src_host, {URL8.url_normalize_sql("u")} AS url
      FROM (SELECT src_host,
                   {FR8_resolve_link_sql("link", "src_host")} AS u
            FROM raw_links)
    ),
    {_FR_RR_CTE.strip()},
    resolved AS (
      SELECT c.src_host, c.url,
             CASE WHEN r.url IS NULL THEN c.url ELSE r.final_url END
               AS final_url,
             (r.url IS NOT NULL) AS redirected,
             COALESCE(r.resolved, TRUE) AS ok
      FROM canon c LEFT JOIN redirects_resolved r ON r.url = c.url
      WHERE c.url IS NOT NULL
    ),
    occ AS (
      SELECT final_url AS url, COUNT(*) AS n_occ
      FROM resolved WHERE ok GROUP BY final_url
    ),
    occp AS (
      SELECT {URL8.url_host_sql("url")} AS host, url,
             regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1) AS path
      FROM occ
    ),
    rb_hosts AS (
      SELECT 'r' || hid AS host,
             CASE WHEN hid % 2 = 1
                  THEN 'User-agent: *' || chr(10) || 'Disallow: /new'
                  ELSE '' END AS robots
      FROM hostt
    ),
    {RB8.robots_rules_sql("rb_hosts", "host", "robots").strip()},
    {RB8.robots_decisions_sql("(SELECT host, path FROM occp)").strip()},
    occ_stats AS (
      SELECT src_host AS host,
             CAST(COUNT(*) AS BIGINT) AS n_link_occurrences,
             CAST(SUM(CASE WHEN redirected THEN 1 ELSE 0 END) AS BIGINT)
               AS n_redirected,
             CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n_loop_dropped
      FROM resolved GROUP BY src_host
    ),
    gate_stats AS (
      SELECT o.host,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_final,
             CAST(SUM(CASE WHEN d.allowed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_allowed,
             CAST(SUM(CASE WHEN NOT d.allowed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_blocked,
             MIN(CASE WHEN NOT d.allowed THEN o.url END) AS sample_blocked
      FROM occp o JOIN rb_decisions d ON d.host = o.host AND d.path = o.path
      GROUP BY o.host
    )
    SELECT s.host, s.n_link_occurrences, s.n_redirected, s.n_loop_dropped,
           g.n_distinct_final, g.n_allowed, g.n_blocked, g.sample_blocked
    FROM occ_stats s JOIN gate_stats g USING (host) ORDER BY s.host
    """,
)
def crawl_frontier_redirects_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Crawl-frontier planning WITH the redirect hop (operators/
    frontier.py, r10 — closes the gap the r8 composition skipped):
    extract links → resolve relative → canonicalize → collapse 301
    chains to terminals (planted per-host /old0→…→/old4→/new chains up
    to 5 hops, plus a /loopa⇄/loopb redirect LOOP whose links must be
    dropped, never fetched) → dedup FINAL urls → robots-gate them (odd
    hosts disallow /new, so a redirect target can be blocked even when
    its source wasn't). Both engines run their own full chain — the
    oracle replays link extraction, normalization, the recursive
    redirect walk with the same min-target dedup and hop cap, the loop
    drop, final-address dedup, and RFC 9309 precedence — so a green row
    certifies the entire composition. Reference comparison: n/a (no
    crawl surface).

    100 TB shape: codegen extraction; ≤ max_hops keyed joins over
    one-row-per-source redirect state; one (host, url) dedup agg; a
    broadcast rules gate; two short-key rollups."""
    from rippledb_spark.operators import frontier as FR

    d = load(spark, sf_dir, "documents")
    hid = (F.col("doc_id") % 10).cast("bigint")
    pages = d.select(
        F.concat(F.lit("r"), hid).alias("host"),
        F.concat(
            F.lit('<html><body><a href="https://r'), hid,
            F.lit("/old"), (F.col("doc_id") % 5).cast("bigint"),
            F.lit('">x</a>'),
            F.when(
                F.col("doc_id") % 4 == 3, F.lit("<a href='/loopa'>y</a>")
            ).otherwise(
                F.concat(
                    F.lit("<a href='/page"),
                    (F.col("doc_id") % 4).cast("bigint"),
                    F.lit("'>y</a>"),
                )
            ),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    hostt = d.select(hid.alias("hid")).distinct()
    base = F.concat(F.lit("https://r"), F.col("hid"))
    chain = hostt.select(
        "hid", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")
    ).select(
        F.concat(base, F.lit("/old"), F.col("j")).alias("from_url"),
        F.concat(base, F.lit("/old"), F.col("j") + 1).alias("to_url"),
    )
    edges = (
        chain.unionByName(
            hostt.select(
                F.concat(base, F.lit("/old4")).alias("from_url"),
                F.concat(base, F.lit("/new")).alias("to_url"),
            )
        )
        .unionByName(
            hostt.select(
                F.concat(base, F.lit("/loopa")).alias("from_url"),
                F.concat(base, F.lit("/loopb")).alias("to_url"),
            )
        )
        .unionByName(
            hostt.select(
                F.concat(base, F.lit("/loopb")).alias("from_url"),
                F.concat(base, F.lit("/loopa")).alias("to_url"),
            )
        )
    )
    robots_hosts = hostt.select(
        F.concat(F.lit("r"), F.col("hid")).alias("host"),
        F.when(
            F.col("hid") % 2 == 1,
            F.lit("User-agent: *\nDisallow: /new"),
        )
        .otherwise(F.lit(""))
        .alias("robots"),
    )
    links = FR.extract_frontier_links(pages, "host", "html")
    resolved = FR.resolve_frontier(links, edges, max_hops=8)
    gated = FR.gate_frontier(resolved, robots_hosts)
    occ_stats = resolved.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("n_link_occurrences"),
        F.sum(F.when(F.col("redirected"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_redirected"),
        F.sum(F.when(~F.col("resolved"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_loop_dropped"),
    )
    gate_stats = gated.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_distinct_final"),
        F.sum(F.when(F.col("allowed"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_allowed"),
        F.sum(F.when(~F.col("allowed"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_blocked"),
        F.min(F.when(~F.col("allowed"), F.col("url"))).alias(
            "sample_blocked"
        ),
    )
    return occ_stats.join(gate_stats, "host").orderBy("host")


from rippledb_spark.operators import sketches as SK  # noqa: E402

_TOKS_CTE = """toks AS (
      SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    tokf AS (SELECT lang, tok FROM toks WHERE tok <> '')"""


def _lang_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")


@query(
    "kmv_distinct_tokens",
    oracle=f"""
    WITH {_TOKS_CTE},
    {SK.kmv_distinct_by_group_sql("tokf", "tok", "lang", k=64).strip()}
    SELECT lang, n_exact, n_sketch, kmv_estimate, rel_error
    FROM kmv_est ORDER BY lang
    """,
)
def kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-value sketch (operators/sketches.py, r10 — Beyer et
    al. 2007): per language, estimate the distinct-token cardinality
    from the 64 smallest md5-derived hash values, beside the EXACT
    count computed in the same job (self-verifying rel_error column —
    the sketch is certified against its own ground truth, the
    minhash-twin pattern). No RNG anywhere: the same corpus always
    yields the same sketch, so the oracle replays every hash, the
    per-group k-th minimum, and the (k−1)/u_k estimate bit-for-bit.
    Groups under k distinct values fall back to the exact sketch size.
    Reference comparison: n/a (no sketch surface).

    100 TB shape: one explode, one (group, hash) dedup agg, one
    group-partitioned rank window (WindowGroupLimit) — sketch state is
    O(k) per group."""
    return SK.kmv_distinct_by_group(
        _lang_tokens(spark, sf_dir), "tok", "lang", k=64
    ).orderBy("lang")


@query(
    "hll_distinct_tokens",
    oracle=f"""
    WITH {_TOKS_CTE},
    {SK.hll_distinct_by_group_sql("tokf", "tok", "lang").strip()}
    SELECT lang, n_exact, n_registers, n_zero_registers, hll_estimate,
           rel_error
    FROM hll_est ORDER BY lang
    """,
)
def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog-shaped register sketch (operators/sketches.py, r10 —
    Flajolet et al. 2007, m=256 registers): per language, the harmonic
    cardinality estimate with the paper's linear-counting small-range
    fallback, beside the exact distinct count (self-verifying
    rel_error). The one order-sensitive float reduction — the harmonic
    denominator — is computed as the EXACT integer Σ 2^(49−M_j), so
    both engines reach the single IEEE division from identical inputs
    and the oracle replays registers, ranks, branch choice, and
    estimate bit-for-bit. (Spark's approx_count_distinct is the
    built-in HLL++ production path; this row certifies an explainable
    sketch the engine can defend end to end.) Reference comparison: n/a.

    100 TB shape: one explode, one (group, register) max-agg (map-side
    combinable — sketch state is 256 rows per group), one group
    rollup."""
    return SK.hll_distinct_by_group(
        _lang_tokens(spark, sf_dir), "tok", "lang"
    ).orderBy("lang")


@query(
    "weighted_reservoir_sample",
    oracle=f"""
    WITH wdocs AS (
      SELECT lang, doc_id,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    {SK.weighted_sample_by_group_sql("wdocs", "doc_id", "n_tok", "lang", k=3).strip()}
    SELECT lang, rank, doc_id, n_tok, key_ln
    FROM wres_sample ORDER BY lang, rank
    """,
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling without replacement (operators/
    sketches.py, r10 — Efraimidis & Spirakis 2006 A-Res): per language,
    the 3 documents with the largest u^(1/w) keys, w = token count and
    u the deterministic md5 fraction of the doc id — inclusion
    probability ∝ weight, zero RNG, fully replayable. Ranked on the
    monotone ln(u)/w (6dp, id tiebreak) so the DuckDB twin reproduces
    the exact sample. The sampling primitive a mixture pipeline uses to
    draw token-weighted eval/inspection sets. Reference comparison: n/a.

    100 TB shape: one projection + one group-partitioned rank window
    (WindowGroupLimit); no global sort."""
    d = load(spark, sf_dir, "documents")
    wdocs = d.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    return SK.weighted_sample_by_group(
        wdocs, "doc_id", "n_tok", "lang", k=3
    ).orderBy("lang", "rank")


from rippledb_spark.operators.pca import (  # noqa: E402
    pca_top_component,
    pca_top_component_sql,
)

_PCA_CTE = pca_top_component_sql("embeddings", "embedding", "vec_id", dims=64)


@query(
    "pca_top_component_embeddings",
    oracle=f"""
    WITH {_PCA_CTE.strip()}
    SELECT dim, mean, loading, eigenvalue, residual
    FROM pca_top ORDER BY dim
    """,
)
def pca_top_component_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distributed PCA: the embedding corpus' dominant principal
    component (operators/pca.py, r10 — power iteration with 6dp-rounded
    iterates, the Lloyd drift-reset trick applied to linear algebra).
    One O(n·d²) covariance pass, then 8 rounds on d-row frames whose
    per-round cost is independent of the corpus; sign fixed
    deterministically; the output's ``residual`` column (‖C·v − λ·v‖)
    is the self-verifying convergence certificate. The oracle replays
    means, the 64×64 covariance, every rounded iterate, the sign fix,
    Rayleigh quotient, and residual in one unrolled CTE chain — a green
    row certifies the entire decomposition trajectory. Reference
    comparison: n/a (no numeric surface)."""
    e = load(spark, sf_dir, "embeddings")
    return pca_top_component(e, "embedding", dims=64).orderBy("dim")


from rippledb_spark.operators.pca import (  # noqa: E402
    pca_project,
    pca_top_components,
    pca_top_components_sql,
)

_PCA2_CTE = pca_top_components_sql(
    "embeddings", "embedding", "vec_id", dims=64, n_components=2,
    iterations=6,
)


@query(
    "pca_top2_projection_embeddings",
    oracle=f"""
    WITH {_PCA2_CTE.strip()}
    SELECT c.component, c.dim, c.loading, c.eigenvalue, c.residual,
           v.coord_variance
    FROM pca_components c JOIN pca_projvar v USING (component)
    ORDER BY c.component, c.dim
    """,
)
def pca_top2_projection_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-2 PCA with deflation AND the projection check (operators/
    pca.py, r10): after the dominant component, C ← round(C − λ·v·vᵀ)
    and the iteration repeats — Hotelling deflation, every deflated
    matrix 6dp-rounded so the twin replays the sequence. The corpus is
    then PROJECTED onto both components (pca_project — the compression
    / whitening transform) and each component's coordinate variance
    rides along: for a converged eigenpair it equals the eigenvalue (up
    to the 6dp rounding of coords — pinned close in pytest), so the row
    certifies the decomposition AND the transform that consumes it. The
    variance is a RAW double (the registry's 1e-9-tolerance guidance);
    everything else replays bit-for-bit. Reference comparison: n/a.

    100 TB shape: one O(n·d²) covariance pass + one projection pass;
    deflation and iteration run on d²-row frames in between."""
    e = load(spark, sf_dir, "embeddings")
    comps = pca_top_components(
        e, "embedding", 64, n_components=2, iterations=6
    ).localCheckpoint(eager=True)
    proj = pca_project(e, "embedding", "vec_id", comps, 64)
    pv = proj.groupBy("component").agg(
        (
            F.avg(F.col("coord") * F.col("coord"))
            - F.avg("coord") * F.avg("coord")
        ).alias("coord_variance")
    )
    return comps.join(pv, "component").orderBy("component", "dim")


from rippledb_spark.operators.pca import (  # noqa: E402
    pca_top_component,
    pca_top_component_sql,
)

_HF_PCA_CTE = (
    SK.feature_hash_vectors_sql("documents", "text", "doc_id", dims=16)
    + ",\n    "
    + pca_top_component_sql("hf_vecs", "v", "doc_id", dims=16)
)


@query(
    "hashed_features_pca_documents",
    oracle=f"""
    WITH {_HF_PCA_CTE.strip()}
    SELECT dim, mean, loading, eigenvalue, residual
    FROM pca_top ORDER BY dim
    """,
)
def hashed_features_pca_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The text tier feeding the numeric tier WITHOUT an embedding
    model (r10 composition): documents → 16-dim signed feature-hash
    vectors (sketches.feature_hash_vectors, Weinberger et al. 2009 —
    index and sign both md5-derived, per-cell ±1 sums integer-exact) →
    the corpus' dominant principal component (operators/pca.py). The
    oracle replays tokenization, every hashed cell, every assembled
    vector, the covariance, and the full 6dp-rounded power-iteration
    trajectory in one CTE chain — a green row certifies the whole
    text→vector→linear-algebra composition, and the residual column is
    its own convergence certificate. Reference comparison: n/a.

    100 TB shape: featurization is one explode + one (doc, index)-keyed
    sum (no vocabulary join); then PCA's documented covariance pass."""
    d = load(spark, sf_dir, "documents")
    vecs = SK.feature_hash_vectors(d, "text", "doc_id", dims=16)
    return pca_top_component(vecs, "v", dims=16).orderBy("dim")


@query(
    "rolling_anomaly_event_counts",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    roll AS (
      SELECT event_type, d, n,
             COUNT(*) OVER w AS n_prev,
             AVG(CAST(n AS DOUBLE)) OVER w AS mu,
             AVG(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) OVER w AS m2
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, d, n,
           ROUND(mu, 6) AS mean7,
           ROUND(sqrt(GREATEST(m2 - mu * mu, 0.0)), 6) AS std7,
           ROUND(CASE WHEN sqrt(GREATEST(m2 - mu * mu, 0.0)) > 0
                      THEN (n - mu) / sqrt(GREATEST(m2 - mu * mu, 0.0))
                      ELSE 0.0 END, 6) AS z,
           (sqrt(GREATEST(m2 - mu * mu, 0.0)) > 0 AND
            ABS(CASE WHEN sqrt(GREATEST(m2 - mu * mu, 0.0)) > 0
                     THEN (n - mu) / sqrt(GREATEST(m2 - mu * mu, 0.0))
                     ELSE 0.0 END) > 2.0) AS is_anomaly
    FROM roll WHERE n_prev = 7
    ORDER BY event_type, d
    """,
)
def rolling_anomaly_event_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling z-score anomaly detection on the event stream (r10 —
    the timeseries family's monitoring composition): per event type,
    each day's count is scored against the TRAILING 7 days' mean and
    population std (the window excludes the current day, so a spike
    can't mask itself), and |z| > 2 flags the anomaly. Only days with a
    full 7-day history score — no partial-window false alarms. The
    window folds run over date-sorted frames, so both engines reduce in
    the same order and the 6dp rounds replay exactly. Reference
    comparison: n/a (no window surface).

    100 TB shape: one (type, day) count agg + one type-keyed ordered
    window pass — nothing global."""
    from rippledb_spark.operators.anomaly import daily_counts, rolling_zscores

    ev = load(spark, sf_dir, "events")
    # Day bucket pinned to the UTC calendar regardless of session
    # timezone (the r11 ADVICE fix — see operators/anomaly.daily_counts);
    # the streaming twin (streaming/sinks.start_daily_count_sink) shares
    # these exact operators, with equality pinned in test_streaming.
    daily = daily_counts(ev, "ts", "event_type")
    return rolling_zscores(daily, "event_type", window=7, threshold=2.0).orderBy(
        "event_type", "d"
    )


from rippledb_spark.operators.chunking import (  # noqa: E402
    content_defined_chunks,
    content_defined_chunks_sql,
)

_CDC_PASSAGES = [
    " ".join(f"c{k}_{c}" for k in range(40)) for c in range(5)
]
_CDC_PASSAGES_SQL = "ARRAY[" + ", ".join(
    f"'{p}'" for p in _CDC_PASSAGES
) + "]"


@query(
    "cdc_chunk_dedup_accounting",
    oracle=f"""
    WITH pard AS (
      SELECT doc_id,
             text || ' ' ||
             ({_CDC_PASSAGES_SQL})[CAST(doc_id % 5 AS INT) + 1] AS text
      FROM documents
    ),
    {content_defined_chunks_sql("pard", "text", "doc_id", w=3, divisor=8).strip()},
    cdc_freq AS (
      SELECT chunk_hash, COUNT(DISTINCT doc_id) AS ndocs
      FROM cdc_chunks GROUP BY chunk_hash
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(c.n_chunk_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks
    FROM cdc_chunks c JOIN cdc_freq f USING (chunk_hash)
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
)
def cdc_chunk_dedup_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level dedup accounting
    (operators/chunking.content_defined_chunks, r10 — the LBFS/FastCDC
    boundary rule on token streams): every document gets a 40-token
    passage shared by its doc_id%5 cohort appended at a DIFFERENT token
    offset per document (each doc's own text precedes it) — fixed
    windows would chunk the copies differently, but content-defined
    boundaries re-synchronize, so the cohort's interior passage chunks
    hash identically and surface in n_shared_chunks. The oracle replays
    tokenization, every md5 boundary decision, the running chunk
    counter, reassembly, chunk hashes, and the cross-document frequency
    join. Reference comparison: n/a (no pipeline surface).

    100 TB shape: per-document windows keyed by doc id; the dedup is
    one chunk-hash-keyed agg — the storage-dedup shape."""
    d = load(spark, sf_dir, "documents")
    passage = F.element_at(
        F.array(*[F.lit(p) for p in _CDC_PASSAGES]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    pard = d.select(
        "doc_id", F.concat("text", F.lit(" "), passage).alias("text")
    )
    chunks = content_defined_chunks(pard, "text", "doc_id", w=3, divisor=8)
    freq = chunks.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").alias("ndocs")
    )
    return (
        chunks.join(freq, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared_chunks"),
        )
        .orderBy("doc_id")
    )


from rippledb_spark.operators.regression import (  # noqa: E402
    least_squares_3,
    least_squares_3_sql,
)

_LSQ_CTE = least_squares_3_sql(
    "(SELECT 1 AS one, length(text) AS n_chars,"
    " length(text) - length(replace(text, ' ', '')) AS n_spaces,"
    " len(string_split(text, ' ')) AS n_tokens FROM documents)",
    ["one", "n_chars", "n_spaces"],
    "n_tokens",
)


@query(
    "least_squares_token_model",
    oracle=f"""
    WITH {_LSQ_CTE.strip()}
    SELECT feature_idx, weight, sse, r2 FROM lsq_fit ORDER BY feature_idx
    """,
)
def least_squares_token_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed least squares (operators/regression.py, r10 —
    normal equations + Cramer's rule, the small-d calibration primitive
    a pipeline fits quality/length predictors with): regress each
    document's token count on (1, n_chars, n_spaces). Single-space
    text satisfies n_tokens = 1·1 + 0·n_chars + 1·n_spaces EXACTLY, so
    the fit must recover weights (1, 0, 1) with SSE 0 and R² 1 — the
    planted ground truth doubles as the convergence certificate. The
    Gram matrix and moment vector are exact BIGINT sums (integer
    features — no float reduction anywhere in the fit), so the oracle
    replays the aggregates, both Cramer determinants, the weights, and
    the integer-scaled SSE bit-for-bit. Reference comparison: n/a.

    100 TB shape: ONE corpus pass for d²+d integer sums (d=3 keys,
    map-side combinable), one more for the fit metrics; the solve is
    scalar arithmetic."""
    d = load(spark, sf_dir, "documents")
    feats = d.select(
        F.lit(1).alias("one"),
        F.length("text").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
        ).alias("n_spaces"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return least_squares_3(
        feats, ["one", "n_chars", "n_spaces"], "n_tokens"
    ).orderBy("feature_idx")


from rippledb_spark.operators.dedup import shingles as _shingles  # noqa: E402
from rippledb_spark.operators.dedup import shingles_sql as _sh_sql  # noqa: E402


@query(
    "cms_token_frequency_accounting",
    oracle=f"""
    WITH cms_grams AS (
      SELECT unnest({_sh_sql("text", 2)}) AS g FROM documents
    ),
    cms_pr AS (
      SELECT DISTINCT g FROM cms_grams
      WHERE CAST(('0x' || substr(md5(g), 1, 6)) AS BIGINT) % 8 = 0
      UNION ALL
      SELECT 'absent_probe_' || CAST(u.k AS VARCHAR)
      FROM UNNEST(range(0, 5)) AS u(k)
    ),
    {SK.cms_token_frequency_sql("cms_grams", "g", "cms_pr", d=3, w=256).strip()}
    SELECT g, n_exact, cms_estimate, overestimate
    FROM cms_est ORDER BY g
    """,
)
def cms_token_frequency_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-Min frequency sketch (operators/sketches.py, r10 — Cormode
    & Muthukrishnan 2005): a 3×256 counter table estimates any token
    BIGRAM's corpus frequency as the min of its 3 counters — provably ≥
    the true count. The domain (~900 distinct bigrams into 256 columns)
    guarantees real collisions, so the overestimate column is exercised,
    not vacuous; probes are a deterministic hash-sample of the bigram
    vocabulary plus five planted ABSENT values (exact count 0 — their
    estimates are pure collision mass). Counters are exact integer sums
    and the cells md5-derived, so the oracle replays the whole table,
    every min, and every collision bit-for-bit; the exact counts in the
    same job make the row self-verifying (overestimate ≥ 0 pinned in
    pytest). Reference comparison: n/a.

    100 TB shape: the sketch is ONE (row, column) groupBy — 768 counter
    rows at any corpus size; probing broadcasts the table."""
    d = load(spark, sf_dir, "documents")
    grams = d.select(F.explode(_shingles("text", 2)).alias("g"))
    sampled = grams.distinct().where(
        F.conv(F.substring(F.md5("g"), 1, 6), 16, 10).cast("bigint") % 8
        == 0
    )
    absent = spark.range(5).select(
        F.concat(F.lit("absent_probe_"), F.col("id")).alias("g")
    )
    probe = sampled.unionByName(absent)
    return SK.cms_token_frequency(grams, "g", probe, d=3, w=256).orderBy("g")


from rippledb_spark.operators.dedup import shingles_sql as _shingles_sql  # noqa: E402


@query(
    "bloom_contamination_gate",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_shingles_sql("text", 4)}) AS g FROM documents
    ),
    bl_members_in AS (SELECT g FROM sh WHERE doc_id % 50 = 0),
    bl_cands_in AS (SELECT g FROM sh),
    {SK.bloom_membership_sql("bl_members_in", "bl_cands_in", "g",
                             m_bits=16384, j=3).strip()}
    SELECT s.doc_id,
           CAST(COUNT(DISTINCT s.g) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN b.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CASE WHEN b.exact_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(CASE WHEN b.false_positive THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_flagged
    FROM (SELECT DISTINCT doc_id, g FROM sh WHERE doc_id % 50 <> 0) s
    JOIN bloom_res b ON b.g = s.g
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
)
def bloom_contamination_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter contamination gate (operators/sketches.py, r10 —
    Bloom 1970, the constant-space form of the exact
    benchmark_contamination_4gram join): the benchmark slice's 4-gram
    positions (3 md5 hashes into 2^14 bits) form the filter; every
    training doc's grams test against it, and the per-doc report carries
    flagged vs EXACT contamination counts side by side — so false
    positives are counted, false negatives are provably zero (pinned in
    pytest), and both are pure md5 functions the oracle replays exactly.
    The m_bits is deliberately small enough that real collisions occur
    in the corpus — the FP accounting is exercised, not vacuous.
    Reference comparison: n/a.

    100 TB shape: the filter is ≤ 3·|benchmark| positions — broadcast;
    the corpus streams past it; per-doc rollup is one doc-keyed agg.
    The production trade: the exact join ships the benchmark's full
    gram STRINGS to every executor, the Bloom gate ships 2^14 bits."""
    from rippledb_spark.operators.dedup import shingles

    d = load(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(shingles("text", 4)).alias("g"))
    members = sh.where(F.col("doc_id") % 50 == 0).select("g")
    bm = SK.bloom_membership(
        members, sh.select("g"), "g", m_bits=16384, j=3
    )
    return (
        sh.where(F.col("doc_id") % 50 != 0)
        .dropDuplicates(["doc_id", "g"])
        .join(bm, "g")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("g").alias("n_grams"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.sum(F.when(F.col("exact_member"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.sum(F.when(F.col("false_positive"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_false_flagged"),
        )
        .orderBy("doc_id")
    )
