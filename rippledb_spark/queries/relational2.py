"""Advanced join / reshaping / UDF-surface queries (engine tier, part 2):
as-of join, range (non-equi) join, outer joins, pivot, pandas-UDAF, approx
distinct. Complements queries/relational.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from rippledb_spark.operators.asof import asof_join
from rippledb_spark.registry import query
from rippledb_spark.tables import load

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "asof_error_to_click",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id,
           e.user_id,
           strftime(e.ts, '{_FMT_DUCK}')  AS error_ts,
           c.event_id                      AS click_id_asof,
           ROUND(c.value, 4)               AS click_value_asof
    FROM errors e
    ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts >= c.ts
    ORDER BY e.event_id
    """,
)
def asof_error_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: for each error event, the user's most recent click at or
    before it. Spark lacks the operator; rippledb_spark.operators.asof
    implements it as union→single-shuffle→window (no pair blow-up) —
    DuckDB's native ASOF JOIN is the oracle."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.round("value", 4).alias("click_value")
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("click_id"))
    clicks = clicks.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    joined = asof_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["click_id", "click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT_SPARK).alias("error_ts"),
        F.col("click_id_asof"),
        F.col("click_value_asof"),
    ).orderBy("event_id")


@query(
    "range_join_quantity_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
      ('tiny', 0.0, 10.0), ('small', 10.0, 20.0), ('medium', 20.0, 35.0), ('large', 35.0, 51.0))
    SELECT band,
           COUNT(*)                      AS n_items,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    ORDER BY band
    """,
)
def range_join_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny in-plan band dimension —
    broadcast nested-loop on 4 rows, i.e. O(|fact|·4) predicate evals with
    zero shuffle of the fact side. (A large band table would instead be
    bucketized to an equi-join on a computed band key.)"""
    l = load(spark, sf_dir, "lineitem")
    bands = F.broadcast(
        load(spark, sf_dir, "region").sparkSession.createDataFrame(
            [("tiny", 0.0, 10.0), ("small", 10.0, 20.0), ("medium", 20.0, 35.0), ("large", 35.0, 51.0)],
            ["band", "lo", "hi"],
        )
    )
    return (
        l.join(bands, (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_items"), F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .orderBy("band")
    )


@query(
    "left_outer_customer_orders_1996",
    oracle="""
    SELECT c_custkey,
           COALESCE(n_orders, 0)        AS n_orders,
           ROUND(COALESCE(spent, 0), 2) AS spent
    FROM customer
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders, SUM(o_totalprice) AS spent
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
    ORDER BY c_custkey
    """,
)
def left_outer_customer_orders_1996(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with no 1996 orders (agg-first:
    the join input is one row per customer, not one per order)."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("spent"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("spent", F.lit(0.0)), 2).alias("spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "full_outer_nation_activity",
    oracle="""
    WITH cust AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         supp AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cust.nk, supp.nk)  AS nationkey,
           COALESCE(n_cust, 0)         AS n_customers,
           COALESCE(n_supp, 0)         AS n_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    ORDER BY nationkey
    """,
)
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (nations may have customers but no
    suppliers or vice versa)."""
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, cust.nk == supp.snk, "full_outer")
        .select(
            F.coalesce("nk", "snk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
            F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (explicit value list → single-pass conditional aggregation;
    an unlisted pivot would need a distinct-values pre-pass)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_F"),
            F.coalesce("O", F.lit(0)).alias("status_O"),
            F.coalesce("P", F.lit(0)).alias("status_P"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "udaf_weighted_avg_price",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface: quantity-weighted average price per return flag as an
    Arrow-batched applyInPandas aggregation (grouped-map, one row out per
    group). The equivalent built-in expression exists — the point is the
    exercised custom-aggregate path for logic Spark can't express."""
    import pandas as pd

    l = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice", "l_quantity")

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        num = (pdf["l_extendedprice"] * pdf["l_quantity"]).sum()
        den = pdf["l_quantity"].sum()
        return pd.DataFrame(
            {"l_returnflag": [pdf["l_returnflag"].iloc[0]], "weighted_avg_price": [round(num / den, 4)]}
        )

    return (
        l.groupBy("l_returnflag")
        .applyInPandas(wavg, schema="l_returnflag string, weighted_avg_price double")
        .orderBy("l_returnflag")
    )


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT p_brand,
           COUNT(DISTINCT p_type)    AS exact_types,
           COUNT(DISTINCT p_partkey) AS exact_parts,
           TRUE AS types_err_ok,
           TRUE AS parts_err_ok
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per brand — the sketch tier for
    100 TB cardinality estimation (exact distinct shuffles every value; the
    sketch shuffles fixed-size registers) — SELF-VERIFYING: the same agg
    computes the exact distinct counts and asserts the sketch lands within
    10% relative error (rsd 0.02, so 10% is a 5-sigma bound; measured max
    error at sf0.01 is 2.1%). The DuckDB oracle recomputes the exact side
    and expects both bounds to hold, so the sketch is hash-certified."""
    p = load(spark, sf_dir, "part")

    def err_ok(col: str) -> F.Column:
        approx = F.approx_count_distinct(col, 0.02)
        exact = F.countDistinct(col)
        return F.abs(approx - exact) / exact <= 0.1

    return (
        p.groupBy("p_brand")
        .agg(
            F.countDistinct("p_type").alias("exact_types"),
            F.countDistinct("p_partkey").alias("exact_parts"),
            err_ok("p_type").alias("types_err_ok"),
            err_ok("p_partkey").alias("parts_err_ok"),
        )
        .orderBy("p_brand")
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY returnflag, linestatus
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not derivable from rollup/cube shapes)."""
    from rippledb_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
        """
    )


@query(
    "unpivot_brand_measures",
    oracle="""
    WITH m AS (
      SELECT p_brand,
             ROUND(CAST(SUM(p_retailprice) AS DOUBLE), 2) AS sum_retail,
             ROUND(AVG(CAST(p_size AS DOUBLE)), 4)        AS avg_size
      FROM part GROUP BY p_brand
    )
    SELECT p_brand, measure, value FROM (
      SELECT p_brand, 'sum_retail' AS measure, sum_retail AS value FROM m
      UNION ALL
      SELECT p_brand, 'avg_size'  AS measure, avg_size  AS value FROM m
    ) ORDER BY p_brand, measure
    """,
)
def unpivot_brand_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-brand measures reshaped to long
    (brand, measure, value) rows via the native `DataFrame.unpivot` —
    a per-row expression expansion (zero shuffle beyond the feeding agg).
    The reference has no reshaping ops (SURVEY §2.4); oracle is the
    portable UNION ALL formulation."""
    p = load(spark, sf_dir, "part")
    m = p.groupBy("p_brand").agg(
        F.round(F.sum("p_retailprice").cast("double"), 2).alias("sum_retail"),
        F.round(F.avg(F.col("p_size").cast("double")), 4).alias("avg_size"),
    )
    return (
        m.unpivot(
            ids=["p_brand"],
            values=["sum_retail", "avg_size"],
            variableColumnName="measure",
            valueColumnName="value",
        )
        .orderBy("p_brand", "measure")
    )


@query(
    "ntile_customer_balance_quartiles",
    oracle="""
    WITH t AS (
      SELECT c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    )
    SELECT quartile,
           COUNT(*)                                  AS n_customers,
           ROUND(CAST(MIN(c_acctbal) AS DOUBLE), 2)  AS min_bal,
           ROUND(CAST(MAX(c_acctbal) AS DOUBLE), 2)  AS max_bal
    FROM t GROUP BY quartile ORDER BY quartile
    """,
)
def ntile_customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing (equi-height quartiles) over a total order.
    Tie-broken by c_custkey so bucket assignment is deterministic — NTILE
    semantics (floor/ceil split with remainder to leading buckets) are
    standard SQL, identical in Spark and DuckDB. A global ORDER BY window
    is single-partition by nature; at 100 TB the scale path is
    approx_percentile cut-points + a broadcast range join instead
    (see events_value_percentiles for the sketch tier)."""
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    t = c.select("c_acctbal", F.ntile(4).over(w).alias("quartile"))
    return (
        t.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal").cast("double"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal").cast("double"), 2).alias("max_bal"),
        )
        .orderBy("quartile")
    )


@query(
    "multiset_ops_priority_years",
    oracle="""
    WITH a AS (SELECT o_orderpriority AS priority FROM orders WHERE YEAR(o_orderdate) = 1996),
         b AS (SELECT o_orderpriority AS priority FROM orders WHERE YEAR(o_orderdate) = 1997)
    SELECT 'except_all' AS op, priority, COUNT(*) AS n
    FROM (SELECT priority FROM a EXCEPT ALL SELECT priority FROM b) GROUP BY priority
    UNION ALL
    SELECT 'intersect_all' AS op, priority, COUNT(*) AS n
    FROM (SELECT priority FROM a INTERSECT ALL SELECT priority FROM b) GROUP BY priority
    ORDER BY op, priority
    """,
)
def multiset_ops_priority_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set ops — EXCEPT ALL / INTERSECT ALL preserve
    duplicate counts, a distinct operator family from the distinct-set ops
    in set_ops_buyer_segments (`exceptAll`/`intersectAll` plan as
    count-differencing aggregations, not semi/anti joins)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_orderpriority").alias("priority"))
    b = o.filter(F.year("o_orderdate") == 1997).select(F.col("o_orderpriority").alias("priority"))
    diff = (
        a.exceptAll(b)
        .groupBy("priority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "priority", "n")
    )
    inter = (
        a.intersectAll(b)
        .groupBy("priority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "priority", "n")
    )
    return diff.unionByName(inter).orderBy("op", "priority")


@query(
    "skew_salted_join_equivalence",
    oracle="""
    SELECT o_orderpriority AS priority,
           ROUND(SUM(l_extendedprice), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY priority
    """,
)
def skew_salted_join_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew toolkit REGISTERED THROUGH THE GATE: salted_join (left side
    salted 8 ways, right replicated) + two_phase_agg (salted partial →
    final combine), with the ORACLE being the plain unsalted join+groupby —
    the driver itself proves salting is result-identical (it changes
    placement, never values)."""
    from rippledb_spark.operators.skew import salted_join, two_phase_agg

    l = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = salted_join(l, o, on="okey", n_salts=8)
    agg = two_phase_agg(
        joined.withColumnRenamed("o_orderpriority", "priority"),
        keys=["priority"],
        sums={"l_extendedprice": "revenue_raw"},
        n_salts=8,
    )
    return agg.select(
        "priority", F.round("revenue_raw", 2).alias("revenue"), "n_rows"
    ).orderBy("priority")


@query(
    "asof_error_to_click_tolerance",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id,
           e.user_id,
           strftime(e.ts, '{_FMT_DUCK}')  AS error_ts,
           c2.event_id                     AS click_id_asof,
           ROUND(c2.value, 4)              AS click_value_asof
    FROM errors e LEFT JOIN LATERAL (
      SELECT event_id, value FROM clicks c
      WHERE c.user_id = e.user_id AND c.ts <= e.ts
        AND e.ts - c.ts <= INTERVAL 15 MINUTE
      ORDER BY c.ts DESC LIMIT 1
    ) c2 ON TRUE
    ORDER BY e.event_id
    """,
)
def asof_error_to_click_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN with a 15-minute tolerance (pandas merge_asof parity):
    a click older than the gap no longer explains the error and the
    match nulls out. Same single-shuffle union→window plan as the plain
    as-of — the matched row's timestamp rides inside the backfill
    struct, so tolerance is a post-window comparison, not a second
    join. Oracle: DuckDB LEFT JOIN LATERAL with the interval predicate
    (its native ASOF JOIN has no tolerance clause)."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.round("value", 4).alias("click_value")
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("click_id"))
    clicks = clicks.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    joined = asof_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["click_id", "click_value"],
        tolerance_seconds=15 * 60,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT_SPARK).alias("error_ts"),
        F.col("click_id_asof"),
        F.col("click_value_asof"),
    ).orderBy("event_id")


@query(
    "asof_forward_error_to_click",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id,
           e.user_id,
           strftime(e.ts, '{_FMT_DUCK}')  AS error_ts,
           c2.event_id                     AS next_click_id_asof,
           ROUND(c2.value, 4)              AS next_click_value_asof
    FROM errors e LEFT JOIN LATERAL (
      SELECT event_id, value FROM clicks c
      WHERE c.user_id = e.user_id AND c.ts >= e.ts
      ORDER BY c.ts ASC LIMIT 1
    ) c2 ON TRUE
    ORDER BY e.event_id
    """,
)
def asof_forward_error_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (merge_asof direction='forward'): for each
    error, the user's EARLIEST click at or after it — "what did the user
    do next". Identical single-shuffle union→window plan with the
    per-key sort reversed; DuckDB LEFT JOIN LATERAL is the oracle (its
    ASOF JOIN is backward-only)."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("next_click_id"),
        F.round("value", 4).alias("next_click_value"),
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("next_click_id"))
    clicks = clicks.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    joined = asof_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["next_click_id", "next_click_value"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT_SPARK).alias("error_ts"),
        F.col("next_click_id_asof"),
        F.col("next_click_value_asof"),
    ).orderBy("event_id")
