"""TPC-H queries over the derived ``partsupp`` table (q2/q9/q11/q16/q20).

The driver testdata ships no partsupp, so these five queries — the only
relational-surface gap after round 2 — run over the deterministic
derivation in ``tables.load_partsupp`` (part x 4 arithmetic-chosen
suppliers). The DuckDB oracle replays the identical integer arithmetic as
a CTE (``PARTSUPP_CTE``), so both engines see the same table without any
extra parquet files.

Queries are adapted to the trimmed driver schema (no p_mfgr / p_container
/ comments; 0-based keys; one-word p_type) but keep each query's defining
plan shape:

* q2: per-part min over a region-restricted supplier set (window min, not
  a correlated re-scan).
* q9: five-dimension star join onto lineitem with a fact-fact orders join
  — the one real plan-design item: every dim side (part filtered by name,
  partsupp pre-reduced by that filter, supplier, nation) broadcasts, so
  the ONLY shuffles are the orders join and the final agg.
* q11: grouped value vs a scalar global threshold (two aggregations over
  one cheap derived input).
* q16: count-distinct suppliers per part attribute group with an anti-join
  exclusion.
* q20: semi-join part filter + per-(part,supplier) shipped-quantity
  aggregate gating availqty.

Scale notes: partsupp derivation is shuffle-free (see tables.py); at
100 TB partsupp is dim-sized (4 x |part|), so the broadcasts here hold as
long as part does — the same assumption every TPC-H q2/q9 plan makes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load_partsupp, load_table
from . import query


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# DuckDB twin of tables.load_partsupp — same integer arithmetic, verbatim.
PARTSUPP_CTE = """
    s_cnt AS (SELECT count(*) AS s FROM supplier),
    ps0 AS (
      SELECT CAST(p_partkey AS BIGINT) AS pk,
             (CAST(p_partkey AS BIGINT) + i.i * greatest(s // 4, 1)) % s AS sk
      FROM part, s_cnt, (SELECT unnest([0,1,2,3]) AS i) i
    ),
    partsupp AS (
      SELECT
        CAST(pk AS INTEGER) AS ps_partkey,
        CAST(sk AS INTEGER) AS ps_suppkey,
        CAST(1 + (pk * 7919 + sk * 104729) % 9999 AS INTEGER) AS ps_availqty,
        CAST(concat(CAST((100 + (pk * 104729 + sk * 7919) % 99900) // 100 AS VARCHAR),
                    '.',
                    lpad(CAST((100 + (pk * 104729 + sk * 7919) % 99900) % 100 AS VARCHAR),
                         2, '0'))
             AS DECIMAL(12,2)) AS ps_supplycost
      FROM ps0
    )
"""


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {PARTSUPP_CTE},
    eu AS (
      SELECT ps.ps_partkey, ps.ps_supplycost, s.s_name, s.s_acctbal, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
           CAST(e.ps_supplycost AS DOUBLE) AS ps_supplycost
    FROM eu e
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size = 15
      AND e.ps_supplycost = (SELECT min(e2.ps_supplycost) FROM eu e2
                             WHERE e2.ps_partkey = e.ps_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: cheapest European supplier per size-15 part. The
    correlated min re-scan of the spec is expressed as a window min over
    the region-filtered join — one pass, no self-join. All dims broadcast;
    ORDER BY carries (s_name, p_partkey) so LIMIT is deterministic."""
    ps = load_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    eu = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eu.join(F.broadcast(p), eu.ps_partkey == p.p_partkey)
        .withColumn("min_cost", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2))) -
                    ps.ps_supplycost * CAST(l.l_quantity AS DECIMAL(18,2)))
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit by supplier nation and order year for '%red%'
    parts. Plan: part is filtered FIRST and broadcast; partsupp is
    pre-reduced by joining that filtered part (so the (partkey,suppkey)
    probe side is small) and broadcast too, as are supplier and nation.
    lineitem therefore reaches the orders join having only narrow
    broadcast joins behind it — the orders equi-join and the final group
    are the only shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    ps = load_partsupp(spark, sf_dir).join(
        F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - F.col(
        "ps_supplycost"
    ) * _dec("l_quantity")
    return (
        li.join(
            F.broadcast(ps),
            (li.l_partkey == F.col("ps_partkey"))
            & (li.l_suppkey == F.col("ps_suppkey")),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {PARTSUPP_CTE},
    filtered AS (
      SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, CAST(sum(v) AS DOUBLE) AS value
    FROM filtered
    GROUP BY ps_partkey
    HAVING CAST(sum(v) AS DOUBLE) >
           (SELECT CAST(sum(v) AS DOUBLE) * 0.005 FROM filtered)
    ORDER BY value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value at NATION_7 suppliers exceeds a
    fraction of the national total. Two aggregations over one cheap
    derived input; the scalar total rides in as a broadcast 1-row cross
    join (no driver round-trip). Value arithmetic stays in exact decimals
    until the final double cast, so the threshold compare is one IEEE
    comparison of identically-derived doubles in both engines."""
    ps = load_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    filtered = ps.join(F.broadcast(dim), ps.ps_suppkey == F.col("s_suppkey")).select(
        "ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v")
    )
    total = filtered.agg(
        (F.sum("v").cast("double") * F.lit(0.005)).alias("threshold")
    )
    return (
        filtered.groupBy("ps_partkey")
        .agg(F.sum("v").cast("double").alias("value"))
        .crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("ps_partkey", "value")
        .orderBy(F.desc("value"), "ps_partkey")
    )


@query(
    "tpch_q16_parts_supplier_relationship",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per (brand, type, size),
    excluding negative-balance suppliers (the spec's complaint-comment
    filter, adapted to the trimmed schema). The NOT IN is a broadcast
    anti-join; count-distinct expands to Spark's two-phase distinct
    aggregate, partial-agg'd before the shuffle."""
    ps = load_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_excess_stock_suppliers",
    oracle=f"""
    WITH {PARTSUPP_CTE},
    shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    cand AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND CAST(ps.ps_availqty AS DOUBLE) > 0.5 * CAST(sh.qty AS DOUBLE)
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN cand c ON c.ps_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
    ORDER BY s_name
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: NATION_3 suppliers holding more than half the 1997
    shipped quantity of any 'small%' part they stock. The spec's
    correlated scalar subquery (NULL when no lineitem rows -> row dropped)
    is an inner join against the per-(part,supplier) shipped aggregate —
    identical keep-semantics, one shuffle on the composite key. The part
    name filter rides as a broadcast semi-join on partsupp."""
    ps = load_partsupp(spark, sf_dir)
    small = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
    )
    cand = (
        ps.join(F.broadcast(small), ps.ps_partkey == small.p_partkey, "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(
            F.col("ps_availqty").cast("double")
            > F.lit(0.5) * F.col("qty").cast("double")
        )
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    return (
        s.join(F.broadcast(cand), s.s_suppkey == F.col("ps_suppkey"))
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
