"""Reference-parity BGP queries, oracle-checked (SURVEY §2.1-2.3).

A deterministic ``triples`` graph is derived from the relational testdata
(FIXTURES.md §B guidance) identically in Spark and in the DuckDB oracle CTE,
then the reference's query surface (pattern access paths Q3-Q11, conjunctive
``get`` Q2 with its fine-print semantics, the multi-var join superset, DML
D1/D2, stats Q13) runs over it.

Graph shape (node kinds in parens):

    order:{k}    --placed_by-->     customer:{k}      (named→named)
    order:{k}    --has_status-->    "O|F|P"           (literal)
    order:{k}    --has_priority-->  priority:{p}      (named)
    order:{k}    --contains_part--> part:{k}          (named, multi per order)
    customer:{k} --in_nation-->     nation:{k}        (named)
    customer:{k} --in_segment-->    segment:{s}       (named)
    customer:{k} --has_name-->      "Customer#..."    (literal)
    supplier:{k} --in_nation-->     nation:{k}        (named)
    nation:{k}   --in_region-->     region:{k}        (named)
    nation:{k}   --has_name-->      "ASIA..."         (literal)

Predicate frequencies are Zipf-ish (contains_part ≫ in_region), matching the
skew the reference's build path works around (graph.rs:235-305) — here AQE
absorbs it.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.operators._itergc import pin_persisted
from rippledb_spark.registry import query
from rippledb_spark.store import TripleStore
from rippledb_spark.plans.sparql import Sparql
from rippledb_spark.tables import load

# ---------------------------------------------------------------------------
# Derivation — keep the Spark and SQL forms in lock-step
# ---------------------------------------------------------------------------

TRIPLES_CTE = """
triples AS (
  SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS s, 'named' AS s_kind,
         'placed_by' AS p,
         'customer:' || CAST(o_custkey AS VARCHAR) AS o_value, 'named' AS o_kind,
         CAST(NULL AS VARCHAR) AS o_lang, CAST(NULL AS VARCHAR) AS o_datatype
  FROM orders
  UNION ALL
  SELECT 'order:' || CAST(o_orderkey AS VARCHAR), 'named', 'has_status',
         o_orderstatus, 'literal', NULL, NULL
  FROM orders
  UNION ALL
  SELECT 'order:' || CAST(o_orderkey AS VARCHAR), 'named', 'has_priority',
         'priority:' || o_orderpriority, 'named', NULL, NULL
  FROM orders
  UNION ALL
  SELECT DISTINCT 'order:' || CAST(l_orderkey AS VARCHAR), 'named', 'contains_part',
         'part:' || CAST(l_partkey AS VARCHAR), 'named', NULL, NULL
  FROM lineitem
  UNION ALL
  SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 'named', 'in_nation',
         'nation:' || CAST(c_nationkey AS VARCHAR), 'named', NULL, NULL
  FROM customer
  UNION ALL
  SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 'named', 'in_segment',
         'segment:' || c_mktsegment, 'named', NULL, NULL
  FROM customer
  UNION ALL
  SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 'named', 'has_name',
         c_name, 'literal', NULL, NULL
  FROM customer
  UNION ALL
  SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR), 'named', 'in_nation',
         'nation:' || CAST(s_nationkey AS VARCHAR), 'named', NULL, NULL
  FROM supplier
  UNION ALL
  SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'named', 'in_region',
         'region:' || CAST(n_regionkey AS VARCHAR), 'named', NULL, NULL
  FROM nation
  UNION ALL
  SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'named', 'has_name',
         n_name, 'literal', NULL, NULL
  FROM nation
)
"""


def _tagged(prefix: str, col: str):
    return F.concat(F.lit(prefix + ":"), F.col(col).cast("string"))


def _edges(df: DataFrame, subj, edges: list[tuple]) -> DataFrame:
    """ONE scan → N triples per row: inline array of (p, o_value, o_kind)
    structs, exploded. At 100 TB this reads each source table once instead
    of once per predicate (the union-of-scans formulation costs N scans)."""
    structs = [
        F.struct(
            F.lit(pred).alias("p"), oc.alias("o_value"), F.lit(kind).alias("o_kind")
        )
        for pred, oc, kind in edges
    ]
    null_s = F.lit(None).cast("string")
    return df.select(
        subj.alias("s"), F.explode(F.array(*structs)).alias("e")
    ).select(
        "s",
        F.lit("named").alias("s_kind"),
        F.col("e.p").alias("p"),
        F.col("e.o_value").alias("o_value"),
        F.col("e.o_kind").alias("o_kind"),
        null_s.alias("o_lang"),
        null_s.alias("o_datatype"),
    )


def derive_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of TRIPLES_CTE. Rows are unique by construction
    (the one multi-edge source, lineitem, is deduped in-branch)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")

    parts = [
        _edges(
            o,
            _tagged("order", "o_orderkey"),
            [
                ("placed_by", _tagged("customer", "o_custkey"), "named"),
                ("has_status", F.col("o_orderstatus"), "literal"),
                ("has_priority", F.concat(F.lit("priority:"), F.col("o_orderpriority")), "named"),
            ],
        ),
        _edges(
            l,
            _tagged("order", "l_orderkey"),
            [("contains_part", _tagged("part", "l_partkey"), "named")],
        ).distinct(),
        _edges(
            c,
            _tagged("customer", "c_custkey"),
            [
                ("in_nation", _tagged("nation", "c_nationkey"), "named"),
                ("in_segment", F.concat(F.lit("segment:"), F.col("c_mktsegment")), "named"),
                ("has_name", F.col("c_name"), "literal"),
            ],
        ),
        _edges(
            s,
            _tagged("supplier", "s_suppkey"),
            [("in_nation", _tagged("nation", "s_nationkey"), "named")],
        ),
        _edges(
            n,
            _tagged("nation", "n_nationkey"),
            [
                ("in_region", _tagged("region", "n_regionkey"), "named"),
                ("has_name", F.col("n_name"), "literal"),
            ],
        ),
    ]
    acc = parts[0]
    for pdf in parts[1:]:
        acc = acc.unionByName(pdf)
    return acc


_STORE_CACHE: dict[tuple[int, str], DataFrame] = {}


def _store(spark: SparkSession, sf_dir: str) -> TripleStore:
    """Cached, persisted triples graph per (session, sf_dir).

    The reference's query path runs against an already-loaded in-memory
    graph (Graph::get on a built store, graph.rs:333); re-deriving the
    graph inside every query would charge load cost to query time. The
    first query pays derivation + persist; the rest query the cached
    store — the same lifecycle as the reference. Derivation is already
    duplicate-free → plain constructor, no dedup shuffle.
    """
    key = (id(spark), sf_dir)
    if key not in _STORE_CACHE:
        df = derive_triples(spark, sf_dir).persist()
        # Pin against the per-query block sweeps (bench.py/opt_measure):
        # this cache IS reachable across queries by design, and an
        # unpinned sweep would not just drop it but set its storage
        # level to NONE so it never re-caches (r15 measurement: every
        # later store query then re-derives per reference).
        pin_persisted(spark, df)
        _STORE_CACHE[key] = df
    return TripleStore(spark, _STORE_CACHE[key])


# ---------------------------------------------------------------------------
# Q13 analogue: per-predicate stats (≈ one row per reference 'slice')
# ---------------------------------------------------------------------------


@query(
    "triples_stats",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT p, COUNT(*) AS n_triples FROM triples GROUP BY p ORDER BY p
    """,
)
def triples_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-predicate cardinalities — footprint/stat surface (graph.rs:1010-1027)."""
    return _store(spark, sf_dir).stats()


@query(
    "backup_migration_accounting",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT p, COUNT(*) AS n_triples,
           COUNT(DISTINCT s)       AS n_subjects,
           COUNT(DISTINCT o_value) AS n_objects
    FROM triples GROUP BY p ORDER BY p
    """,
)
def backup_migration_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips the WHOLE derived graph through the reference's
    `.ripplebackup` directory format (head.json dicts + trees/{{i}}.json
    K²-Trees, graph.rs:54-222,630-695) and accounts per predicate. The
    oracle derives the same stats from the raw tables, so a green row
    certifies the export (shared dict + dense predicate ids + K²-Tree
    encode) AND the migration reader (per-tree distributed decode + id
    resolution joins) end to end: any bit mis-walked in either direction
    changes a count."""
    from rippledb_spark.sources.ripplebackup import write_ripplebackup
    from rippledb_spark.store import TripleStore
    from rippledb_spark.tables import scratch_dir

    st = _store(spark, sf_dir)
    # scratch_dir handles PID isolation AND atexit removal (the lazy
    # read-back forbids removing it here)
    out_dir = scratch_dir("rippledb_backup_mig", sf_dir)
    write_ripplebackup(st.df, out_dir)
    migrated = TripleStore.from_ripplebackup(spark, out_dir)
    return (
        migrated.df.groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.count_distinct("s").alias("n_subjects"),
            F.count_distinct("o_value").alias("n_objects"),
        )
        .orderBy("p")
    )


@query(
    "jsonld_export_accounting",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT p, COUNT(*) AS n_triples,
           COUNT(DISTINCT s)       AS n_subjects,
           COUNT(DISTINCT o_value) AS n_objects,
           CAST(SUM(CASE WHEN o_kind IN ('named', 'blank') THEN 0 ELSE 1 END)
                AS BIGINT) AS n_literals
    FROM triples GROUP BY p ORDER BY p
    """,
)
def jsonld_export_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips the WHOLE derived graph through flat JSON-LD
    (sources/jsonld.py — the web's most-used RDF serialization; the
    reference is RDF/XML-only, src/rdf/parser.rs:88-122) and accounts per
    predicate. Write is executor-parallel (one {{"@graph": [...]}}
    document per Arrow batch), read is one task per part file. The oracle
    derives the same stats from the raw tables, so a green row certifies
    serializer grouping, @type/@value/@language spelling, AND the reader's
    expansion end to end — a node kind mis-tagged or a literal dropped in
    either direction changes a count."""
    from rippledb_spark.sources.jsonld import read_jsonld, write_jsonld
    from rippledb_spark.tables import scratch_dir

    st = _store(spark, sf_dir)
    out_dir = scratch_dir("rippledb_jsonld", sf_dir)
    write_jsonld(st.df, out_dir)
    back = read_jsonld(spark, out_dir)
    return (
        back.groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.count_distinct("s").alias("n_subjects"),
            F.count_distinct("o_value").alias("n_objects"),
            F.sum(
                F.when(F.col("o_kind").isin("named", "blank"), 0).otherwise(1)
            )
            .cast("bigint")
            .alias("n_literals"),
        )
        .orderBy("p")
    )


# ---------------------------------------------------------------------------
# Access paths (Q5 _po, Q7 sp_, Q10 s__, Q11 ___ shapes)
# ---------------------------------------------------------------------------


@query(
    "bgp_po_subjects",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT s AS sub FROM triples
    WHERE p = 'in_segment' AND o_value = 'segment:BUILDING' AND o_kind = 'named'
    ORDER BY sub
    """,
)
def bgp_po_subjects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(?, p, o) access path (graph.rs:872-891): subjects in one 'slice' row."""
    st = _store(spark, sf_dir)
    return st.pattern(None, "in_segment", "segment:BUILDING").select(
        F.col("s").alias("sub")
    ).orderBy("sub")


@query(
    "bgp_sp_objects",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT o_value FROM triples
    WHERE s = 'customer:1' AND p = 'in_nation'
    ORDER BY o_value
    """,
)
def bgp_sp_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, p, ?) access path (graph.rs:910-929): one subject's objects."""
    st = _store(spark, sf_dir)
    return st.pattern("customer:1", "in_nation", None).select("o_value").orderBy("o_value")


@query(
    "bgp_s_scan",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT p, o_value FROM triples WHERE s = 'customer:1'
    ORDER BY p, o_value
    """,
)
def bgp_s_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, ?, ?) access path (graph.rs:973-992): all edges out of one node."""
    st = _store(spark, sf_dir)
    return st.pattern("customer:1", None, None).select("p", "o_value").orderBy("p", "o_value")


@query(
    "bgp_ask_absent",
    oracle="SELECT TRUE AS ask WHERE EXISTS (SELECT 1 WHERE 1 = 0)",
)
def bgp_ask_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-variable (fully bound) pattern → ASK semantics (SURVEY §2.3 #6);
    this one is necessarily absent → 0 rows."""
    st = _store(spark, sf_dir)
    q = Sparql().filter([["customer:1", "in_nation", "nation:9999"]])
    return st.get(q)


# ---------------------------------------------------------------------------
# Conjunctive get() — reference-exact semantics (Q2)
# ---------------------------------------------------------------------------


@query(
    "bgp_get_building_in_nation0",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT t0.s AS c
    FROM triples t0
    WHERE t0.p = 'in_segment' AND t0.o_value = 'segment:BUILDING' AND t0.o_kind = 'named'
      AND EXISTS (SELECT 1 FROM triples t1
                  WHERE t1.p = 'in_nation' AND t1.o_value = 'nation:0'
                    AND t1.o_kind = 'named' AND t1.s = t0.s)
    ORDER BY c
    """,
)
def bgp_get_building_in_nation0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-condition one-variable conjunction (COOKBOOK.md:83-100 shape):
    pattern₀ candidates pruned by an EXISTS semi-join (graph.rs:369-403)."""
    st = _store(spark, sf_dir)
    q = (
        Sparql()
        .select(["$c"])
        .filter(
            [
                ["$c", "in_segment", "segment:BUILDING"],
                ["$c", "in_nation", "nation:0"],
            ]
        )
    )
    return st.get(q).orderBy("c")


@query(
    "bgp_get_dup_preserving",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT t0.s AS o
    FROM triples t0
    WHERE t0.p = 'contains_part'
      AND EXISTS (SELECT 1 FROM triples t1
                  WHERE t1.p = 'has_priority' AND t1.o_value = 'priority:1-URGENT'
                    AND t1.o_kind = 'named' AND t1.s = t0.s)
    ORDER BY o
    """,
)
def bgp_get_dup_preserving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate preservation (SURVEY §2.3 #3): pattern₀ [$o contains_part $pt]
    emits one candidate per lineitem, so each surviving order appears with its
    lineitem multiplicity — the reference keeps those duplicates
    (graph.rs:389-402) and so do we."""
    st = _store(spark, sf_dir)
    q = (
        Sparql()
        .select(["$o", "$pt"])
        .filter(
            [
                ["$o", "contains_part", "$pt"],
                ["$o", "has_priority", "priority:1-URGENT"],
            ]
        )
    )
    return st.get(q).orderBy("o")


@query(
    "bgp_get_literal_unmatchable",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT t0.s AS c
    FROM triples t0
    WHERE t0.p = 'has_status' AND t0.o_value = 'F' AND t0.o_kind = 'named'
    ORDER BY c
    """,
)
def bgp_get_literal_unmatchable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-only value matching (SURVEY §2.3 #4): 'F' exists only as a
    LITERAL object, and bound values are lifted to Named nodes
    (graph.rs:1031-1033) — so this query returns 0 rows, not the F orders."""
    st = _store(spark, sf_dir)
    q = Sparql().select(["$c"]).filter([["$c", "has_status", "F"]])
    return st.get(q).orderBy("c")


# ---------------------------------------------------------------------------
# Multi-variable superset (select_join, SURVEY §4.2)
# ---------------------------------------------------------------------------


@query(
    "bgp_join_entity_region",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT t0.s AS ent, t1.o_value AS reg
    FROM triples t0
    JOIN triples t1 ON t0.o_value = t1.s
    WHERE t0.p = 'in_nation' AND t1.p = 'in_region'
    ORDER BY ent, reg
    """,
)
def bgp_join_entity_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop path query: [$ent in_nation $n] ⋈ [$n in_region $reg].
    Catches customers AND suppliers — shared subject/object node space,
    the role of the reference's single s/o dictionary (graph.rs:33)."""
    st = _store(spark, sf_dir)
    q = (
        Sparql()
        .select(["$ent", "$reg"])
        .filter(
            [
                ["$ent", "in_nation", "$n"],
                ["$n", "in_region", "$reg"],
            ]
        )
    )
    return st.select_join(q).orderBy("ent", "reg")


@query(
    "bgp_join_urgent_building_orders",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT t0.s AS o, t0.o_value AS c
    FROM triples t0
    JOIN triples t1 ON t1.s = t0.o_value
    JOIN triples t2 ON t2.s = t0.s
    WHERE t0.p = 'placed_by'
      AND t1.p = 'in_segment' AND t1.o_value = 'segment:BUILDING' AND t1.o_kind = 'named'
      AND t2.p = 'has_priority' AND t2.o_value = 'priority:1-URGENT' AND t2.o_kind = 'named'
    ORDER BY o, c
    """,
)
def bgp_join_urgent_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-pattern, two-variable BGP join across both directions."""
    st = _store(spark, sf_dir)
    q = (
        Sparql()
        .select(["$o", "$c"])
        .filter(
            [
                ["$o", "placed_by", "$c"],
                ["$c", "in_segment", "segment:BUILDING"],
                ["$o", "has_priority", "priority:1-URGENT"],
            ]
        )
    )
    return st.select_join(q).orderBy("o", "c")


# ---------------------------------------------------------------------------
# DML through the oracle gate (D1 + D2)
# ---------------------------------------------------------------------------


@query(
    "dml_insert_remove_stats",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()},
    after_remove AS (SELECT * FROM triples WHERE p <> 'in_segment'),
    after_insert AS (
      SELECT * FROM after_remove
      UNION ALL
      SELECT 'meta:engine', 'named', 'meta:name', 'rippledb_spark', 'literal', NULL, NULL
    )
    SELECT p, COUNT(*) AS n_triples FROM after_insert GROUP BY p ORDER BY p
    """,
)
def dml_insert_remove_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot DML: remove every in_segment triple (D2 anti-join,
    graph.rs:510-629 value semantics), insert one new triple (D1 idempotent
    union, graph.rs:414-509), then count per predicate."""
    st = _store(spark, sf_dir)
    seg = st.df.filter(F.col("p") == "in_segment")
    st2 = st.remove(seg)
    st3 = st2.insert(
        [("meta:engine", "named", "meta:name", "rippledb_spark", "literal", None, None)]
    )
    return st3.stats()


@query(
    "bgp_o_scan",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT s, p FROM triples WHERE o_value = 'region:0' AND o_kind = 'named'
    ORDER BY s, p
    """,
)
def bgp_o_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(?, ?, o) access path (graph.rs:930-949): every edge INTO one node —
    a row scan across all predicate 'slices'."""
    st = _store(spark, sf_dir)
    return st.pattern(None, None, "region:0").select("s", "p").orderBy("s", "p")


@query(
    "bgp_s_o_predicates",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT p FROM triples
    WHERE s = 'nation:0' AND o_value = 'region:0' AND o_kind = 'named'
    ORDER BY p
    """,
)
def bgp_s_o_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, ?, o) access path (graph.rs:892-909): which predicates connect
    two given nodes — the reference probes every slice's bit (s_id, o_id).

    Probes nation:0 -> region:0, a pair present at every scale factor, so the
    certification row attests real data rather than a vacuous 0 == 0 match
    (round-4 verdict item 2)."""
    st = _store(spark, sf_dir)
    return st.pattern("nation:0", None, "region:0").select("p").orderBy("p")


@query(
    "bgp_spo_point",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT TRUE AS ask WHERE EXISTS (
      SELECT 1 FROM triples
      WHERE s = 'customer:1' AND p = 'in_nation' AND o_value = 'nation:0'
        AND o_kind = 'named')
    """,
)
def bgp_spo_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, p, o) point lookup (graph.rs:854-871): single bit test →
    ASK-style 0/1 rows."""
    st = _store(spark, sf_dir)
    return st.get(Sparql().filter([["customer:1", "in_nation", "nation:0"]]))


# ---------------------------------------------------------------------------
# Graph analytics (engine tier — absent from the reference, SURVEY §2.4)
# ---------------------------------------------------------------------------


@query(
    "graph_degrees",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()},
    edges AS (SELECT s, o_value FROM triples WHERE o_kind = 'named'),
    outd AS (SELECT s AS node, COUNT(*) AS out_degree FROM edges GROUP BY 1),
    ind  AS (SELECT o_value AS node, COUNT(*) AS in_degree FROM edges GROUP BY 1)
    SELECT COALESCE(outd.node, ind.node) AS node,
           COALESCE(out_degree, 0) AS out_degree,
           COALESCE(in_degree, 0)  AS in_degree
    FROM outd FULL OUTER JOIN ind ON outd.node = ind.node
    ORDER BY node
    """,
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree centrality over the entity graph (named→named edges only)."""
    from rippledb_spark.operators.graph import degrees

    st = _store(spark, sf_dir)
    return degrees(st.df).orderBy("node")


@query(
    "graph_pagerank",
    oracle="""
    WITH RECURSIVE
    edges AS (SELECT DISTINCT 'order:' || CAST(l_orderkey AS VARCHAR) AS src,
                              'part:' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY 1),
    contrib_edges AS (
      SELECT src, dst, 1.0 AS w FROM edges
      UNION ALL
      SELECT node, node, 0.0 FROM nodes
    ),
    pr AS (
      SELECT node, CAST(1.0 AS DOUBLE) AS rank, 0 AS iter FROM nodes
      UNION ALL
      SELECT ce.dst,
             0.15 + 0.85 * SUM(ce.w * p.rank / COALESCE(o.od, 1)),
             ANY_VALUE(p.iter) + 1
      FROM pr p
      JOIN contrib_edges ce ON p.node = ce.src
      LEFT JOIN outd o ON ce.src = o.src
      WHERE p.iter < 6
      GROUP BY ce.dst
    )
    SELECT node, ROUND(rank, 4) AS rank FROM pr WHERE iter = 6
    ORDER BY rank DESC, node LIMIT 100
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (6 iterations, d=0.85) over the order→part containment
    graph — the iterative-DataFrame operator class (SURVEY §2.4 engine
    tier). Oracle: a DuckDB recursive CTE with zero-weight self-edges so
    every node survives each iteration (contribution-less nodes keep the
    teleport term)."""
    from rippledb_spark.operators.graph import pagerank

    st = _store(spark, sf_dir)
    edges = st.pattern(None, "contains_part", None).select(
        F.col("s").alias("src"), F.col("o_value").alias("dst")
    )
    return (
        pagerank(edges, iterations=6)
        .select("node", F.round("rank", 4).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(100)
    )


@query(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE
    raw_edges AS (
      SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS a,
             'nation:' || CAST(c_nationkey AS VARCHAR) AS b FROM customer
      UNION ALL
      SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR),
             'nation:' || CAST(s_nationkey AS VARCHAR) FROM supplier
      UNION ALL
      SELECT 'nation:' || CAST(n_nationkey AS VARCHAR),
             'region:' || CAST(n_regionkey AS VARCHAR) FROM nation
    ),
    und AS (SELECT a, b FROM raw_edges UNION ALL SELECT b, a FROM raw_edges),
    nodes AS (SELECT DISTINCT a AS node FROM und),
    -- self-loops let the recursive term reference cc exactly once while
    -- still folding each node's own label into the min (cf. pagerank CTE)
    edges2 AS (SELECT a, b FROM und UNION ALL SELECT node, node FROM nodes),
    cc AS (
      SELECT node, node AS comp, 0 AS iter FROM nodes
      UNION ALL
      SELECT e.a, MIN(c.comp), ANY_VALUE(c.iter) + 1
      FROM cc c JOIN edges2 e ON c.node = e.b
      WHERE c.iter < 8
      GROUP BY e.a
    )
    SELECT comp, COUNT(*) AS n_nodes FROM cc WHERE iter = 8
    GROUP BY comp ORDER BY comp
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (8 rounds of min-label propagation) over the
    undirected membership graph (customers/suppliers–nations–regions) —
    converges to one component per region."""
    from rippledb_spark.operators.graph import connected_components

    st = _store(spark, sf_dir)
    edges = st.df.filter(
        F.col("p").isin("in_nation", "in_region") & (F.col("o_kind") == "named")
    ).select(F.col("s").alias("src"), F.col("o_value").alias("dst"))
    return (
        connected_components(edges, iterations=8)
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("comp")
    )


# ---------------------------------------------------------------------------
# Distributed export sink accounting — the N-Triples line formatting that
# write_ntriples streams to files, verified value-for-value by the oracle
# ---------------------------------------------------------------------------


_NT_ESC_SQL = (
    "replace(replace(replace(replace(replace(o_value,"
    " '\\', '\\\\'), '\"', '\\\"'), chr(10), '\\n'), chr(13), '\\r'),"
    " chr(9), '\\t')"
)

_NT_LINE_SQL = f"""
    (CASE WHEN s_kind = 'named' THEN '<' || s || '>' ELSE s END)
    || ' <' || p || '> ' ||
    (CASE o_kind
       WHEN 'named' THEN '<' || o_value || '>'
       WHEN 'blank' THEN o_value
       WHEN 'lang_literal' THEN '"' || {_NT_ESC_SQL} || '"@' || o_lang
       WHEN 'typed_literal' THEN '"' || {_NT_ESC_SQL} || '"^^<' || o_datatype || '>'
       ELSE '"' || {_NT_ESC_SQL} || '"' END)
    || ' .'
"""


@query(
    "ntriples_export_accounting",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()},
    lines AS (SELECT p, {_NT_LINE_SQL} AS line FROM triples)
    SELECT p, COUNT(*) AS n_lines,
           CAST(SUM(LENGTH(line)) AS BIGINT) AS total_chars,
           MIN(line) AS first_line
    FROM lines GROUP BY p ORDER BY p
    """,
)
def ntriples_export_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-predicate accounting of the DISTRIBUTED N-Triples sink's output
    (rdfio.write_ntriples): the exact line expression the sink writes,
    aggregated instead of written so the oracle can value-check the
    serialization byte-for-byte. Pure JVM expressions — the sink itself is
    df.write.text, executor-parallel, no driver collect (the scale path
    the reference's in-memory to_rdf bytes contract lacks)."""
    from rippledb_spark.sources.rdfio import ntriples_line_expr

    st = _store(spark, sf_dir)
    return (
        st.df.select("p", ntriples_line_expr().alias("line"))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.length("line")).alias("total_chars"),
            F.min("line").alias("first_line"),
        )
        .orderBy("p")
    )


@query(
    "graph_reachability",
    oracle=f"""
    WITH RECURSIVE {TRIPLES_CTE.strip()},
    redges AS (
      SELECT o_value AS a, s AS b FROM triples WHERE o_kind = 'named'
    ),
    reach AS (
      SELECT 'region:0' AS node, 0 AS dist, 0 AS iter
      UNION ALL
      SELECT e.b, MIN(r.dist) + 1, ANY_VALUE(r.iter) + 1
      FROM reach r JOIN redges e ON r.node = e.a
      WHERE r.iter < 8
      GROUP BY e.b
    )
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
    FROM reach GROUP BY node ORDER BY node
    """,
)
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop reachability (BFS transitive closure) from region:0 over
    the REVERSED entity graph: region → its nations → their customers and
    suppliers → those customers' orders, with exact hop distances — the
    iterative-join tier beside pagerank/connected_components, hash-matched
    against a DuckDB recursive CTE."""
    from rippledb_spark.operators.graph import bfs_reachability

    st = _store(spark, sf_dir)
    redges = st.df.filter(F.col("o_kind") == "named").select(
        F.col("o_value").alias("src"), F.col("s").alias("dst")
    )
    return bfs_reachability(redges, ["region:0"], iterations=8).orderBy("node")


@query(
    "triples_footprint",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT p, COUNT(*) AS n_triples,
           CAST(SUM(strlen(s) + strlen(p) + strlen(o_value)
                    + COALESCE(strlen(o_lang), 0)
                    + COALESCE(strlen(o_datatype), 0)) AS BIGINT) AS payload_bytes
    FROM triples GROUP BY p ORDER BY p
    """,
)
def triples_footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 byte accounting (graph.rs:1010-1027): UTF-8 payload bytes per
    predicate 'slice', oracle-checked — the reference's footprint() is a
    physical-layout byte count; the value-model observable is payload
    bytes, and parquet owns the physical bytes."""
    return _store(spark, sf_dir).footprint()


# ---------------------------------------------------------------------------
# Turtle sink accounting — mirrors ntriples_export_accounting for the third
# export format (sources/turtle.py:write_turtle). The SQL twin reproduces
# the sink's prefix compaction + literal escaping character-for-character.
# ---------------------------------------------------------------------------

_TTL_PREFIXES = {"nat": "nation:", "cust": "customer:"}
_TTL_SAFE_LOCAL = "^[A-Za-z0-9][A-Za-z0-9_-]*$"


def _ttl_compact_sql(col: str) -> str:
    cases = "".join(
        f"WHEN starts_with({col}, '{ns}') AND "
        f"regexp_matches(substr({col}, {len(ns) + 1}), '{_TTL_SAFE_LOCAL}') "
        f"THEN '{pfx}:' || substr({col}, {len(ns) + 1}) "
        for pfx, ns in _TTL_PREFIXES.items()
    )
    return f"(CASE {cases}ELSE '<' || {col} || '>' END)"


_TTL_LINE_SQL = f"""
    (CASE WHEN s_kind = 'named' THEN {_ttl_compact_sql('s')} ELSE s END)
    || ' ' ||
    (CASE WHEN p = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
          THEN 'a' ELSE {_ttl_compact_sql('p')} END)
    || ' ' ||
    (CASE o_kind
       WHEN 'named' THEN {_ttl_compact_sql('o_value')}
       WHEN 'blank' THEN o_value
       WHEN 'lang_literal' THEN '"' || {_NT_ESC_SQL} || '"@' || o_lang
       WHEN 'typed_literal' THEN '"' || {_NT_ESC_SQL} || '"^^'
                                 || {_ttl_compact_sql('o_datatype')}
       ELSE '"' || {_NT_ESC_SQL} || '"' END)
    || ' .'
"""


@query(
    "turtle_export_accounting",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()},
    lines AS (SELECT p, {_TTL_LINE_SQL} AS line FROM triples)
    SELECT p, COUNT(*) AS n_lines,
           CAST(SUM(LENGTH(line)) AS BIGINT) AS total_chars,
           MIN(line) AS first_line
    FROM lines GROUP BY p ORDER BY p
    """,
)
def turtle_export_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-predicate accounting of the distributed Turtle sink's output
    (turtle.write_turtle): the exact statement expression the sink writes
    — prefix compaction into pnames, rdf:type→'a', short-string literal
    escapes — aggregated instead of written so the oracle value-checks
    the serialization byte-for-byte. The sink itself is df.write.text
    with a per-partition @prefix header, executor-parallel."""
    from rippledb_spark.sources.turtle import turtle_line_expr

    st = _store(spark, sf_dir)
    return (
        st.df.select("p", turtle_line_expr(_TTL_PREFIXES).alias("line"))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.length("line")).alias("total_chars"),
            F.min("line").alias("first_line"),
        )
        .orderBy("p")
    )


@query(
    "bgp_optional_order_parts",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()},
    urgent AS (
      SELECT s AS o FROM triples
      WHERE p = 'has_priority' AND o_value = 'priority:1-URGENT'
        AND o_kind = 'named'
    ),
    placed AS (SELECT s AS o, o_value AS c FROM triples WHERE p = 'placed_by'),
    parts AS (SELECT s AS o, o_value AS pt FROM triples WHERE p = 'contains_part')
    SELECT u.o AS o, p.c AS c, pr.pt AS pt
    FROM urgent u JOIN placed p ON u.o = p.o
    LEFT JOIN parts pr ON u.o = pr.o
    ORDER BY o, c, pt
    """,
)
def bgp_optional_order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL OPTIONAL (engine-tier superset — the reference's builder is
    conjunctive-only, query.rs:27-63): urgent orders with their customer,
    left-outer-extended by the parts they contain. Orders with no
    lineitems (a real slice of the synthetic data) come back with pt =
    NULL instead of vanishing — the first feature a SPARQL user misses
    after conjunctive BGP. Plan: the required two-pattern join, then one
    left-outer hash join per OPTIONAL group on the shared variable."""
    st = _store(spark, sf_dir)
    q = (
        Sparql()
        .select(["$o", "$c", "$pt"])
        .filter(
            [
                ["$o", "has_priority", "priority:1-URGENT"],
                ["$o", "placed_by", "$c"],
            ]
        )
        .optional([["$o", "contains_part", "$pt"]])
    )
    return st.select_join(q).orderBy("o", "c", "pt")


@query(
    "bgp_union_priority_orders",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()},
    placed AS (SELECT s AS o, o_value AS c FROM triples WHERE p = 'placed_by'),
    pri AS (
      SELECT s AS o, o_value AS pr FROM triples
      WHERE p = 'has_priority' AND o_kind = 'named'
    )
    SELECT p.o AS o, p.c AS c
    FROM placed p JOIN pri ON p.o = pri.o AND pri.pr = 'priority:1-URGENT'
    UNION ALL
    SELECT p.o AS o, p.c AS c
    FROM placed p JOIN pri ON p.o = pri.o AND pri.pr = 'priority:2-HIGH'
    ORDER BY o, c
    """,
)
def bgp_union_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UNION (engine-tier superset beside OPTIONAL): urgent-order
    solutions bag-unioned with high-priority-order solutions, duplicates
    preserved (UNION ALL semantics — SPARQL union is a bag op). Each arm
    is its own independently-optimized BGP join; the union is a
    zero-shuffle concatenation."""
    st = _store(spark, sf_dir)
    arm = lambda pri: (
        Sparql()
        .select(["$o", "$c"])
        .filter([["$o", "has_priority", pri], ["$o", "placed_by", "$c"]])
    )
    q = arm("priority:1-URGENT").union(arm("priority:2-HIGH"))
    return st.select_union(q).orderBy("o", "c")


@query(
    "bgp_filter_name_pattern",
    oracle=f"""
    WITH {TRIPLES_CTE.strip()}
    SELECT t.s AS c, t.o_value AS name
    FROM triples t
    WHERE t.p = 'has_name' AND t.s LIKE 'customer:%'
      AND regexp_matches(t.o_value, '[13579]$')
    ORDER BY c, name
    """,
)
def bgp_filter_name_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL FILTER (the third superset feature beside OPTIONAL/UNION):
    customer name bindings kept only where the literal matches a regex
    (odd final digit). FILTER needs NO bespoke machinery in this engine —
    select_join returns a DataFrame, so a FILTER clause IS a native
    .filter over the bound-variable columns, fully visible to Catalyst
    (pushed through the join when referencing one side, as here). The
    subject restriction shows the same idea on a var bound to IRIs."""
    st = _store(spark, sf_dir)
    q = Sparql().select(["$c", "$name"]).filter([["$c", "has_name", "$name"]])
    return (
        st.select_join(q)
        .filter(F.col("c").startswith("customer:") & F.col("name").rlike("[13579]$"))
        .orderBy("c", "name")
    )
