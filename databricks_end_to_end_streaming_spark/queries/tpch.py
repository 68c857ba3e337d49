"""Batch operator corpus on the TPC-H-ish star schema (SURVEY §2 / M3).

The reference itself has no joins, sorts, limits, windows, or set ops
(SURVEY §2.5, §2.7) — Spark's built-ins supply them. This module exercises
every one of those operator families against the DuckDB oracle so the
engine's relational surface is checked end-to-end, and it is where the
scale-sensitive plan shapes live (broadcast dims, partial aggs, AQE).

Scale notes (100 TB posture):
* Dimension tables (region/nation/part/supplier/customer at this ratio) are
  broadcast explicitly where Spark's 10 MB autoBroadcast threshold might
  miss them on wide rows; fact-fact joins (orders x lineitem) shuffle on
  the join key and benefit from AQE skew splitting (session.py).
* Aggregates are expressed declaratively so Catalyst plants partial
  (map-side) aggregation before the exchange — verified via .explain in
  tests/test_plans.py.
* All money arithmetic goes through DECIMAL(18,2) for exact,
  engine-independent results (see queries/__init__ docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load_table, spread_small_scan
from . import query


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# --------------------------------------------------------------------------
# TPC-H-shaped analytics
# --------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(18,2))) *
               (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)      AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)      AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)      AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan -> filter -> hash agg (partial+final). The canonical
    'does partial aggregation happen before the shuffle' probe."""
    # r13: the single-row-group sf parquet arrives as one effective scan
    # split, serializing the decimal partial aggregation; spread first
    # (no-op at scale). Decimal sums are exact and associative, so the
    # result is bit-identical. Measured 1.36 s -> 0.76 s at sf0.1.
    li = spread_small_scan(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey"
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc_price * (F.lit(1) + _dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey AS l_orderkey,
      CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      o.o_orderdate AS o_orderdate,
      o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter -> fact joins -> agg -> top-k.
    customer is broadcast (small side); orders x lineitem shuffles on the
    order key. ORDER BY carries l_orderkey so LIMIT is deterministic."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT
      n.n_name AS n_name,
      CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-way join. region/nation/supplier/customer are all
    broadcast dims; only orders x lineitem shuffles."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@query(
    "tpch_q6_revenue_forecast",
    oracle="""
    SELECT
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate must reach the
    parquet scan as a pushed filter (checked in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Operator-family coverage: sort/limit, distinct, set ops, windows,
# semi/anti joins, rollup, having, broadcast-dim agg, date & string scalars
# --------------------------------------------------------------------------


@query(
    "sort_limit_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (no full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@query(
    "distinct_order_dims",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def distinct_order_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 distinct (projection dedup), as the ingestion demux uses to find
    the schema ids present in a batch (ingest.scala:139)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "set_ops_nation_keys",
    oracle="""
    WITH cust_n AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_n AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT nationkey, 'both' AS membership
      FROM (SELECT nationkey FROM cust_n INTERSECT SELECT nationkey FROM supp_n)
    UNION ALL
    SELECT nationkey, 'customer_only' AS membership
      FROM (SELECT nationkey FROM cust_n EXCEPT SELECT nationkey FROM supp_n)
    UNION ALL
    SELECT nationkey, 'supplier_only' AS membership
      FROM (SELECT nationkey FROM supp_n EXCEPT SELECT nationkey FROM cust_n)
    """,
)
def set_ops_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except in one result (SURVEY §2.7 family)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cust.intersect(supp).withColumn("membership", F.lit("both"))
    c_only = cust.exceptAll(supp).withColumn("membership", F.lit("customer_only"))
    s_only = supp.exceptAll(cust).withColumn("membership", F.lit("supplier_only"))
    return both.unionByName(c_only).unionByName(s_only)


@query(
    "window_top3_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rnk <= 3
    """,
)
def window_top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function top-k per group (SURVEY §2.7 family)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "semi_join_customers_with_urgent",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def semi_join_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_acctbal"
    )


@query(
    "rollup_lineitem_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotal aggregation (rollup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@query(
    "having_high_value_customers",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def having_high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "broadcast_join_brand_volume",
    oracle="""
    SELECT p.p_brand AS p_brand,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    GROUP BY p.p_brand
    """,
)
def broadcast_join_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x broadcast-dim join + agg — the bread-and-butter 100 TB shape:
    no shuffle of the fact table for the join, only for the final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("total_qty"),
        )
    )


@query(
    "date_monthly_order_stats",
    oracle="""
    SELECT
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1
    """,
)
def date_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function family: date_trunc bucketing (the typed replacement
    for the reference's string-formatted day filter, SURVEY Q2)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("monthly_total"),
        )
    )


@query(
    "string_funcs_customer",
    oracle="""
    SELECT
      c_custkey,
      upper(c_name)                   AS name_upper,
      substr(c_name, 1, 8)            AS name_prefix,
      CAST(length(c_name) AS INTEGER) AS name_len,
      concat(c_mktsegment, ':', c_name) AS tagged
    FROM customer
    WHERE c_custkey <= 100
    """,
)
def string_funcs_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string family (SURVEY §2.8: substring/length/concat/upper).
    The reference's X1-X5 byte-slicing analogs on binary live in
    functions/binary.py; this covers the string forms."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(F.col("c_custkey") <= 100).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
    )


@query(
    "casewhen_order_status_matrix",
    oracle="""
    SELECT
      o_orderpriority,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
      CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def casewhen_order_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (manual pivot)."""
    o = load_table(spark, sf_dir, "orders")

    def flag(status: str) -> F.Column:
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0))

    return o.groupBy("o_orderpriority").agg(
        flag("F").alias("n_fulfilled"),
        flag("O").alias("n_open"),
        flag("P").alias("n_pending"),
    )
