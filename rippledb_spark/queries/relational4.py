"""TPC-H classic query shapes, part 4 (engine tier): the remaining suite —
Q2 correlated-min join-back, Q8 market share, Q9 profit by nation/year,
Q11 share-of-total HAVING, Q12 lateness buckets, Q13 outer-join histogram,
Q15 argmax-of-aggregate, Q16 count-distinct with NOT IN, Q17 correlated
avg, Q20 nested semi-join chain, Q21 exists/not-exists double correlation.

The driver's schema has no partsupp / l_commitdate / l_receiptdate /
comment columns, so Q2/Q11/Q16/Q20 derive the part↔supplier relation from
DISTINCT (l_partkey, l_suppkey) and Q12/Q21 measure lateness as
l_shipdate − o_orderdate; the operator composition each query exists to
exercise is unchanged.

Scale notes inline; common theme: dimensions broadcast, facts shuffle only
on their aggregation/join key, scalar aggregates (totals, maxima) become
1-row broadcasts rather than driver collects.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.registry import query
from rippledb_spark.tables import load

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal
      FROM part p
      JOIN ps ON ps.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey, p_name, s_name,
           CAST(ROUND(s_acctbal, 2) AS DOUBLE) AS s_acctbal
    FROM cand c
    WHERE s_acctbal = (SELECT MIN(c2.s_acctbal) FROM cand c2
                       WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal, p_partkey, s_name LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin over a correlated subquery.

    Decorrelated the way Catalyst would: the per-part MIN is one hash-agg
    over the candidate set, joined back on (partkey, acctbal) — ties keep
    every argmin row, exactly the correlated-subquery semantics. The
    part↔supplier relation (no partsupp table) is DISTINCT shipping pairs;
    supplier (fixed-size dim) broadcasts, so the only fact shuffle is the
    pair-distinct on partkey."""
    pairs = (
        load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    cand = (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(s), pairs.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("s_acctbal").alias("__min_bal")
    )
    return (
        cand.join(
            F.broadcast(mins),
            (cand.p_partkey == mins.__pk) & (cand.s_acctbal == mins.__min_bal),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("s_acctbal", 2).cast("double").alias("s_acctbal"),
        )
        .orderBy("s_acctbal", "p_partkey", "s_name")
        .limit(20)
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                      / SUM(volume), 6) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             {_REV} AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    ) nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share inside a region, by year.

    Seven-table star: lineitem is the only large input; orders co-shuffles
    with it on orderkey and every other table (customer at driver scale is
    the borderline one; part/supplier/nation/region are unambiguous)
    broadcasts, so the plan is one fact-fact shuffle plus map-side hash
    joins. The conditional-sum ratio folds both numerator and denominator
    into a single aggregation pass."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") <= "1996-12-31")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_nationkey"), F.col("n_name").alias("supp_nation")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == nc.n_nationkey)
        .join(F.broadcast(r), nc.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == ns.ns_nationkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0)
    ) / F.sum("volume")
    return (
        base.groupBy("o_year")
        .agg(F.round(share, 6).cast("double").alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(SUM({_REV} - 0.4 * p.p_retailprice * l.l_quantity)
                AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for a
    part-name family. No partsupp → cost is modeled as 40% of retail price
    per unit (deterministic, same both sides). The p_name LIKE filter
    prunes part before its broadcast; lineitem↔orders is the one shuffle;
    the agg reuses nothing wider than (nation, year) keys."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        # no ROUND: rounding a float sum AMPLIFIES partial-agg ordering
        # noise (an ulp at a .005 boundary becomes a whole cent, seen at
        # sf0.001); the gate's 1e-9 relative tolerance absorbs raw ulps
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q11_part_value_share",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey, SUM({_REV}) AS val
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(ROUND(val, 2) AS DOUBLE) AS total_value
    FROM pv
    WHERE val > (SELECT SUM(val) * 0.002 FROM pv)
    ORDER BY val DESC, l_partkey
    """,
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value HAVING > fraction of the grand
    total (scalar subquery over the same aggregate). The per-part agg is
    computed once and reused for both branches: the grand total is a 1-row
    re-aggregation broadcast into the filter — no second scan, no driver
    collect."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3").select(
        "n_nationkey"
    )
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val"))
    )
    total = pv.agg((F.sum("val") * 0.002).alias("__cut"))
    return (
        pv.join(F.broadcast(total), F.col("val") > F.col("__cut"))
        .select("l_partkey", F.round("val", 2).cast("double").alias("total_value"))
        .orderBy(F.desc("total_value"), F.asc("l_partkey"))
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                THEN 'late' ELSE 'ontime' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY ship_bucket ORDER BY ship_bucket
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority counts split by shipping lateness (no
    commit/receipt dates → lateness is shipdate − orderdate > 60 days).
    One orderkey shuffle joins the two facts; the two conditional sums
    share a single aggregation pass; the shipdate year-range predicate is
    pushed to the parquet scan."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        "late",
    ).otherwise("ontime")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by order count, counting
    zero-order customers via LEFT OUTER with the filter INSIDE the join
    condition (a WHERE would silently drop the NULL-extended rows). Two
    aggs: custkey (co-partitioned with the join shuffle) then the tiny
    c_count histogram."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, on=cond, how="left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — argmax via scalar-subquery equality, which must use EXACT
    decimal sums: a double sum's last-ulp noise could split a true tie.
    The revenue agg happens once; the max is a 1-row re-agg broadcast into
    an equality join; supplier broadcasts onto the result."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("__mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_rev") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 14, 23, 45)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    triple, excluding a supplier denylist via NOT IN → LEFT ANTI join.
    The denylist (negative-balance suppliers) is empty-or-tiny and
    broadcasts; count(DISTINCT) runs as Spark's two-phase expand+agg on
    the already-distinct pair relation."""
    pairs = (
        load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 14, 23, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS DOUBLE)
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG threshold per part. Decorrelated
    to one per-partkey avg agg joined back on partkey — the aggregate runs
    over ALL lineitems of the brand's parts (semi-filtered first so the
    avg input is pruned by the broadcastable part dimension), matching the
    correlated semantics exactly. Returns a single row."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgs = branded.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("__cut")
    )
    return (
        branded.join(
            F.broadcast(avgs),
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("l_quantity") < F.col("__cut")),
        )
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q20_excess_stock_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(l.l_quantity) > 40
    )
    ORDER BY s.s_name
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers who moved more
    than a threshold quantity of any 'red' part in 1996. The inner block
    is agg-then-project (per supplier×part, HAVING on the sum), collapsed
    into the IN via LEFT SEMI; part broadcasts into the fact scan, and the
    outer supplier⋈nation pair is all-broadcast."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    movers = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 40)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "nation")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name ORDER BY numwait DESC, s_name LIMIT 25
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the double-correlated EXISTS / NOT EXISTS —
    suppliers who were the ONLY late supplier on a finished multi-supplier
    order (lateness = shipdate − orderdate > 60d, standing in for
    receipt-past-commit). EXISTS → LEFT SEMI on (orderkey, suppkey≠),
    NOT EXISTS → LEFT ANTI with the lateness predicate folded into the
    join condition; all three lineitem uses shuffle on the same orderkey,
    so AQE coalesces them into one exchange family."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    exists_other = (F.col("l_orderkey") == F.col("l2_orderkey")) & (
        F.col("l_suppkey") != F.col("l2_suppkey")
    )
    other_late = (
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey"))
        & (F.col("l3_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        l1.join(l2, on=exists_other, how="left_semi")
        .join(l3, on=other_late, how="left_anti")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )
