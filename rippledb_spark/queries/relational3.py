"""TPC-H classic query shapes, part 3 (engine tier): correlated EXISTS /
NOT EXISTS, conditional-aggregate ratios, disjunctive multi-predicate
pushdown, having-join-back, and top-k by computed revenue — the remaining
canonical operator compositions from the TPC-H suite the round-1/2 set
didn't exercise, each adapted to the driver's reduced column set.

Scale notes per query are inline; the common theme: dimensions broadcast,
facts never shuffle except for their own aggregation key, and every filter
sits against the parquet scan (PushedFilters) — verified via
tools/show_plans.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rippledb_spark.registry import query
from rippledb_spark.tables import load


@query(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality on the
    correlated column → LEFT SEMI join with a composite condition. The
    semi-join shuffles both sides once on orderkey; no duplicate blow-up
    regardless of lineitems-per-order multiplicity."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(l, on=cond, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q10_returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal
    ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items, top 20 customers.
    customer is the broadcast side; lineitem pre-filters on returnflag at
    the scan, orders prunes the quarter — the fact tables meet on orderkey
    once, then one agg shuffle on custkey. TakeOrderedAndProject caps the
    result driver-side at 20 rows.

    Revenue sums in DECIMAL (exact, order-independent), orders by the exact
    sum, then emits the repo-conventional ROUND(.., 2)::DOUBLE (registry fp
    policy) so the driver's value hasher sees one canonical representation
    instead of engine-specific DECIMAL(38,4) renderings."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(rev).alias("revenue_exact"))
        .orderBy(F.desc("revenue_exact"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("revenue_exact"), 2).cast("double").alias("revenue"),
            "c_acctbal",
        )
    )


@query(
    "q14_promo_revenue_ratio",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share).
    part broadcasts; the month filter reaches the lineitem scan; the whole
    query is ONE broadcast join + a global aggregate — zero wide shuffles."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           ROUND(b.sum_qty, 2) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 50
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a fact aggregate, then join back to the
    dimensions. The lineitem agg is the only wide shuffle; its (small)
    surviving key set then joins orders (shuffle on orderkey) and broadcast
    customer."""
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 150)
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.round("qty_raw", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Expressed as a
    join condition so Catalyst can split the per-side conjuncts it can push
    (brand/size prune the broadcast build side; quantity bounds prune the
    probe scan) while the cross-side residual evaluates inside the join."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    disj = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return l.join(F.broadcast(p), (l.l_partkey == p.p_partkey) & disj).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c.c_nationkey ORDER BY c.c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti-join
    (above-average-balance customers idle since 1999). The average
    broadcasts as a 1-row gate; the anti-join needs only the orders key
    column (column pruning at the scan) and shuffles on custkey once."""
    c = load(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select(F.col("o_custkey"))
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, how="left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "merge_upsert_orders",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    ),
    s AS (
      SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice * 1.1, 2) AS o_totalprice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        AND o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
    ),
    merged AS (
      SELECT * FROM t WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.o_orderkey = t.o_orderkey)
      UNION ALL
      SELECT * FROM s
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (whole-row upsert) semantics: 1996 orders as the target;
    the source re-prices urgent 1996 orders (+10%, the UPDATE arm) and
    brings 1997-Q1 orders (the INSERT arm). Accounting per status proves
    source-wins/insert/pass-through row routing against a pure-SQL twin."""
    from rippledb_spark.operators.merge import merge_upsert

    o = load(spark, sf_dir, "orders")
    t = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = (
        o.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
            & (F.col("o_orderpriority") == "1-URGENT")
        ).select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        )
    )
    inserts = o.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    merged = merge_upsert(t, updates.unionByName(inserts), key="o_orderkey")
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "resample_hourly_fill_users",
    oracle="""
    WITH RECURSIVE span AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    hours AS (
      SELECT (SELECT lo FROM span) AS bucket_start
      UNION ALL
      SELECT bucket_start + INTERVAL 1 HOUR FROM hours
      WHERE bucket_start < (SELECT hi FROM span)
    ),
    spine AS (
      SELECT u.user_id, h.bucket_start
      FROM (SELECT DISTINCT user_id FROM events) u, hours h
    ),
    actual AS (
      SELECT user_id, date_trunc('hour', ts) AS b, AVG(value) AS v
      FROM events GROUP BY user_id, date_trunc('hour', ts)
    ),
    filled AS (
      SELECT s.user_id, s.bucket_start,
             ROUND(last_value(a.v IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bucket_start
               ROWS UNBOUNDED PRECEDING), 6) AS value_filled,
             a.v IS NULL AS is_gap
      FROM spine s LEFT JOIN actual a
        ON a.user_id = s.user_id AND a.b = s.bucket_start
    )
    SELECT user_id,
           COUNT(*) AS n_buckets,
           CAST(SUM(CASE WHEN is_gap THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
           CAST(ROUND(SUM(CAST(value_filled AS DECIMAL(18,6))), 2) AS DOUBLE) AS filled_sum
    FROM filled GROUP BY user_id ORDER BY user_id
    """,
)
def resample_hourly_fill_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill (the hypertable rollup family):
    hourly buckets per user over the global span, forward-filled with the
    last seen hourly average. Summarized per user (bucket count, gap count,
    filled sum) so the oracle hash-checks the whole fill surface. Spine is
    sequence+explode (no driver loop); the fill window rides the join's
    partitioning."""
    from rippledb_spark.operators.timeseries import resample_fill

    e = load(spark, sf_dir, "events")
    hourly = resample_fill(
        e.select("user_id", "ts", F.col("value").alias("v")),
        key="user_id",
        ts="ts",
        value="v",
        step="1 hour",
        agg="avg",
    )
    return (
        hourly.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.col("is_gap").cast("long")).alias("n_gaps"),
            F.round(F.sum(F.col("value_filled").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("filled_sum"),
        )
        .orderBy("user_id")
    )


@query(
    "fuzzy_part_name_pairs",
    oracle="""
    WITH parts AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[1] AS block
      FROM part
    )
    SELECT a.block, COUNT(*) AS n_close_pairs,
           CAST(MIN(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_dist,
           ROUND(AVG(levenshtein(a.p_name, b.p_name)), 4) AS avg_dist
    FROM parts a JOIN parts b
      ON a.block = b.block AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3 AND a.p_name <> b.p_name
    GROUP BY a.block ORDER BY a.block
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching (edit distance ≤ 2) with BLOCKED candidate
    generation: the self-join meets only within first-token blocks — the
    same never-all-pairs discipline as the minhash/simhash dedup tier,
    since levenshtein over the full n² is a non-starter at scale.
    levenshtein is a JVM built-in on both engines."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", F.split("p_name", " ").getItem(0).alias("block")
    )
    a = p.toDF("key_a", "name_a", "block")
    b = p.toDF("key_b", "name_b", "block")
    return (
        a.join(b, "block")
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(F.col("name_a") != F.col("name_b"))
        .select("block", F.levenshtein("name_a", "name_b").cast("bigint").alias("edit_dist"))
        .filter(F.col("edit_dist") <= 3)
        .groupBy("block")
        .agg(
            F.count(F.lit(1)).alias("n_close_pairs"),
            F.min("edit_dist").alias("min_dist"),
            F.round(F.avg("edit_dist"), 4).alias("avg_dist"),
        )
        .orderBy("block")
    )


@query(
    "q7_nation_pair_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_0' AND sn.n_name = 'NATION_1')
        OR (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_0'))
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY cn.n_name, sn.n_name, o_year
    ORDER BY cust_nation, supp_nation, o_year
    """,
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a nation PAIR in both
    directions, by year. Five joins: every dimension (customer, supplier,
    both nation aliases) broadcasts; the two facts meet on orderkey once.
    The pair disjunction evaluates after the nation joins — Catalyst pushes
    the derived n_name IN (...) filters into both broadcast sides."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.toDF("cn_key", "cust_nation")
    sn = n.toDF("sn_key", "supp_nation")
    pair = (
        ((F.col("cust_nation") == "NATION_0") & (F.col("supp_nation") == "NATION_1"))
        | ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_0"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "volume"
            )
        )
        .orderBy("cust_nation", "supp_nation", "o_year")
    )
