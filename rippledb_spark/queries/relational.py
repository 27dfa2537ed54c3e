"""Relational operator tier (SURVEY.md §2.4 "engine tier").

The reference has no relational algebra (SURVEY §2.4: no joins, aggs,
windows, sorts, set ops, scalar functions — absent from
reference src/ entirely); this module supplies that surface as idiomatic
DataFrame plans over the TPC-H-ish testdata.

Scale notes (100 TB design intent, verified locally via .explain):

- Dimension joins (region/nation/supplier/part/customer at their TPC-H
  ratios) are explicitly ``broadcast()`` — no shuffle of the fact table.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  handles skew/coalescing.
- Aggregations are partial (map-side combine) automatically via
  ``groupBy().agg()`` — never ``collect()`` then reduce.
- Filters sit directly on the scan so Catalyst pushes them into parquet
  (PushedFilters) and prunes columns (ReadSchema).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from rippledb_spark.registry import query
from rippledb_spark.tables import load

# ---------------------------------------------------------------------------
# Aggregations (TPC-H-style)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan grouped aggregation with arithmetic expressions.

    Plan: parquet scan (shipdate filter pushed down, only 7 columns read)
    → partial hash agg → single shuffle on (returnflag, linestatus) → final
    agg. 4-ish groups means the shuffle moves only partial-agg rows — this
    is the canonical 100 TB-safe aggregation shape.
    """
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: highly selective scan → scalar aggregate.

    All four predicates push into the parquet reader; ReadSchema is just
    the 4 referenced columns. No shuffle beyond the single-row final agg.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS VARCHAR)                      AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate  > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → broadcast join → fact join → top-k.

    customer (filtered to one segment) is broadcast into orders — the big
    side never shuffles for that join. orders⋈lineitem is the one real
    shuffle, on the orderkey both sides already cluster by. Top-k via
    orderBy+limit is a TakeOrdered physical op: per-partition heaps, no
    full sort at scale.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join; every dimension side is broadcast.

    region→nation→supplier collapse into one tiny broadcast chain; only
    customer⋈orders and orders⋈lineitem move data. Catalyst reorders the
    broadcast joins below the shuffles.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube / distinct
# ---------------------------------------------------------------------------


@query(
    "rollup_lineitem_status",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*)                      AS n_items,
           ROUND(SUM(l_quantity), 2)     AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — Spark expands to a single-pass grouping-sets agg."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "cube_orders_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           COUNT(*)                         AS n_orders,
           ROUND(SUM(o_totalprice), 2)      AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY orderstatus, orderpriority
    """,
)
def cube_orders_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 4 grouping sets in one shuffle."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "sum_price",
        )
        .orderBy("orderstatus", "orderpriority")
    )


@query(
    "distinct_parts_per_brand",
    oracle="""
    SELECT p_brand,
           COUNT(DISTINCT p_type) AS n_types,
           COUNT(DISTINCT p_size) AS n_sizes,
           COUNT(*)               AS n_parts
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def distinct_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT DISTINCT — Spark expands to partial aggs, one shuffle set."""
    p = load(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.countDistinct("p_type").alias("n_types"),
            F.countDistinct("p_size").alias("n_sizes"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


@query(
    "top3_customers_per_nation",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, c_name, c_nationkey,
             ROUND(SUM(o_totalprice), 2) AS total_spent
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name, c_nationkey
    )
    SELECT n_name, c_name, total_spent, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT s.*, n_name,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY total_spent DESC, c_custkey) AS rnk
      FROM spend s JOIN nation ON c_nationkey = n_nationkey
    )
    WHERE rnk <= 3
    ORDER BY n_name, rnk
    """,
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (row_number) for per-group top-k.

    At scale the groupBy and the window share the same hash partitioning on
    the nation key path; the window itself never materializes a global sort.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("total_spent"), F.asc("c_custkey"))
    return (
        spend.join(F.broadcast(n), spend.c_nationkey == n.n_nationkey)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_name", "total_spent", "rnk")
        .orderBy("n_name", "rnk")
    )


@query(
    "running_order_totals",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, order_seq
    """,
)
def running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame window (running sum) — ROWS UNBOUNDED PRECEDING."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
                "running_total"
            ),
            F.row_number().over(w).cast("bigint").alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


@query(
    "supplier_price_lag",
    oracle="""
    SELECT s_suppkey,
           l_orderkey,
           l_linenumber,
           l_extendedprice,
           ROUND(l_extendedprice
                 - COALESCE(LAG(l_extendedprice) OVER (PARTITION BY l_suppkey
                                                       ORDER BY l_shipdate, l_orderkey, l_linenumber),
                            l_extendedprice), 2) AS price_delta
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_suppkey <= 10
    ORDER BY s_suppkey, l_orderkey, l_linenumber
    """,
)
def supplier_price_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG offset window — per-supplier price deltas in shipdate order."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 10)
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.round(
                F.col("l_extendedprice")
                - F.coalesce(F.lag("l_extendedprice").over(w), F.col("l_extendedprice")),
                2,
            ).alias("price_delta"),
        )
        .orderBy("s_suppkey", "l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Semi / anti joins, set operators
# ---------------------------------------------------------------------------


@query(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — the same physical shape as the reference's
    BGP candidate pruning (graph.rs:369-403), expressed natively."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "customers_without_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — also the engine's DELETE primitive (D2).
    (Every customer has some order in this data, so the anti-join is against
    the urgent subset to keep the result non-trivial.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "set_ops_buyer_segments",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big_spenders AS (SELECT o_custkey AS c_custkey FROM orders
                          GROUP BY o_custkey HAVING SUM(o_totalprice) > 300000)
    SELECT 'both' AS bucket, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM big_spenders)
    UNION ALL
    SELECT 'building_only' AS bucket, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM big_spenders)
    ORDER BY bucket, c_custkey
    """,
)
def set_ops_buyer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one plan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spent"))
        .filter(F.col("spent") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    both = building.intersect(big).select(F.lit("both").alias("bucket"), "c_custkey")
    only = building.exceptAll(big.distinct()).distinct().select(
        F.lit("building_only").alias("bucket"), "c_custkey"
    )
    return both.unionAll(only).orderBy("bucket", "c_custkey")


# ---------------------------------------------------------------------------
# Scalar function library / expression showcase
# ---------------------------------------------------------------------------


@query(
    "scalar_expr_showcase",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_upper,
           CAST(LENGTH(p_name) AS INTEGER)                  AS name_len,
           SUBSTRING(p_type, 1, 5)                          AS type_prefix,
           CONCAT(p_brand, ':', CAST(p_size AS VARCHAR))    AS brand_size,
           ROUND(SQRT(p_retailprice), 4)                    AS price_sqrt,
           ROUND(LN(p_retailprice + 1), 4)                  AS price_ln,
           CAST(FLOOR(p_retailprice / 100) AS BIGINT)       AS price_bucket,
           p_size % 7                                       AS size_mod,
           CASE WHEN p_size > 25 THEN 'large'
                WHEN p_size > 10 THEN 'medium'
                ELSE 'small' END                            AS size_class,
           REPLACE(p_brand, 'Brand#', 'B')                  AS brand_short
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey
    """,
)
def scalar_expr_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/conditional scalar functions — all JVM-side, codegen'd."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias("brand_size"),
            F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
            F.round(F.log(F.col("p_retailprice") + 1), 4).alias("price_ln"),
            F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("price_bucket"),
            (F.col("p_size") % 7).alias("size_mod"),
            F.when(F.col("p_size") > 25, "large")
            .when(F.col("p_size") > 10, "medium")
            .otherwise("small")
            .alias("size_class"),
            F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        )
        .orderBy("p_partkey")
    )


@query(
    "date_functions_orders",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)    AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
           COUNT(*)                                           AS n_orders,
           ROUND(SUM(o_totalprice), 2)                        AS revenue
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + aggregation (year/quarter revenue rollup)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("order_year", "order_quarter")
    )


@query(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           COUNT(*)                                                        AS n_events,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON path extraction inside an aggregation."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(F.get_json_object("props", "$.k").cast("double")), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@query(
    "topk_parts_by_revenue",
    oracle="""
    SELECT p_partkey, p_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(SUM(l_quantity) AS DOUBLE)                   AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name
    ORDER BY revenue DESC, p_partkey
    LIMIT 20
    """,
)
def topk_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k after join+agg — TakeOrderedAndProject, not a full sort."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.sum("l_quantity").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(20)
    )
