"""Relational operator families beyond the core TPC-H set: outer/cross
joins, scalar subqueries, cube, null handling, scalar math & string
functions, in-lists. All DuckDB-oracled.

Math-function parity notes: sqrt is IEEE-correctly-rounded (identical
everywhere); exp/ln/pow are libm-dependent and deliberately avoided —
squares are written x*x.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load_table
from . import query


@query(
    "full_outer_join_nation_presence",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
               FROM supplier GROUP BY 1)
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def full_outer_join_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    joined = c.join(s, "nationkey", "full_outer")
    return joined.select(
        "nationkey",
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "cross_join_region_matrix",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
)
def cross_join_region_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("from_region"), F.col("r_regionkey").alias("ka"))
    b = r.select(F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("kb"))
    return (
        a.crossJoin(b).where(F.col("ka") != F.col("kb")).select("from_region", "to_region")
    )


@query(
    "scalar_subquery_above_avg_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                      AS DOUBLE) / count(*) * 2
                          FROM orders)
    """,
)
def scalar_subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: compare each row against a global aggregate
    (broadcast of a 1-row frame — no driver round trip)."""
    o = load_table(spark, sf_dir, "orders")
    threshold = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
            * 2
        ).alias("thr")
    )
    return (
        o.crossJoin(F.broadcast(threshold))
        .where(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "cube_order_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@query(
    "null_handling_coalesce_nullif",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           nullif(l_discount, 0.0) AS discount_or_null,
           coalesce(nullif(l_discount, 0.0), -1.0) AS discount_filled,
           CASE WHEN l_tax > 0.05 THEN NULL ELSE l_tax END AS tax_capped,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 400
    """,
)
def null_handling_coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif("l_discount", F.lit(0.0)).alias("discount_or_null"),
        F.coalesce(F.nullif("l_discount", F.lit(0.0)), F.lit(-1.0)).alias(
            "discount_filled"
        ),
        F.when(F.col("l_tax") > 0.05, F.lit(None)).otherwise(F.col("l_tax")).alias(
            "tax_capped"
        ),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - l_quantity * 1000.0) AS abs_diff,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
           sqrt(l_quantity)       AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    WHERE l_orderkey <= 400
    """,
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000.0).alias("abs_diff"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "string_transform_functions",
    oracle="""
    SELECT c_custkey,
           trim(c_name)                        AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           reverse(c_mktsegment)               AS seg_rev,
           replace(c_name, '#', '-')           AS name_dashed,
           CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
           (c_mktsegment LIKE 'B%')            AS is_b_segment,
           split_part(c_name, '#', 1)          AS name_head
    FROM customer
    WHERE c_custkey <= 200
    """,
)
def string_transform_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.trim("c_name").alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.replace("c_name", F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.col("c_mktsegment").like("B%").alias("is_b_segment"),
        F.split_part("c_name", F.lit("#"), F.lit(1)).alias("name_head"),
    )


@query(
    "inlist_and_between_filter",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000 AND 200000
    """,
)
def inlist_and_between_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(100000, 200000)
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@query(
    "array_hof_embedding_features",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
           list_max(list_transform(embedding, x -> abs(x))) AS abs_max,
           embedding[1] AS first_dim,
           embedding[len(embedding)] AS last_dim,
           (len(list_filter(embedding, x -> x > 2.0)) > 0) AS has_outlier
    FROM embeddings
    """,
)
def array_hof_embedding_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter/transform/element access/
    exists) over the embedding column — all JVM-side, no UDF. Outputs are
    scalars chosen to be bit-exact cross-engine (counts, max of abs,
    element reads — no order-dependent folds)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.array_max(F.transform(e, F.abs)).alias("abs_max"),
        e[0].alias("first_dim"),
        F.element_at(e, -1).alias("last_dim"),
        F.exists(e, lambda x: x > 2.0).alias("has_outlier"),
    )


@query(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrame .pivot API (explicit value list so the plan skips
    the distinct-values discovery job — the at-scale form)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )


@query(
    "date_arithmetic_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)  AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER)   AS order_day,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INTEGER) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def date_arithmetic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_epoch_start"),
    )


@query(
    "grouping_sets_order_margins",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_order_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the two one-dimension margins plus the
    grand total, without the full CUBE cross): one Expand + one hash
    aggregate — same single-shuffle cost as a plain group-by at scale."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "total"
        ),
    )


@query(
    "unpivot_lineitem_rates",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
    FROM lineitem WHERE l_orderkey <= 400
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey <= 400
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey <= 400
    """,
)
def unpivot_lineitem_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) of three measure columns — the inverse
    of pivot_status_counts. Spark's native unpivot is a single Expand
    (one scan, no shuffle, no union of three scans like the ANSI oracle
    spelling)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 400)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )


@query(
    "array_agg_order_lines",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
           CAST(len(list(l_linenumber)) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_orderkey <= 400
    GROUP BY l_orderkey
    """,
)
def array_agg_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped list aggregation (collect_list) with a deterministic
    in-array sort, serialized to CSV so the cross-engine hash compares a
    canonical scalar (integer elements — float formatting would
    drift)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 400)
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("l_linenumber"))).alias(
            "line_numbers"
        ),
        F.count("l_linenumber").alias("n_lines"),
    )


@query(
    "window_rank_distributions",
    oracle="""
    SELECT doc_id, lang, n_chars,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM documents
    WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
    """,
)
def window_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per language over document length — the
    two distribution-valued window functions. The (n_chars, doc_id)
    total order makes every rank unique, so both values are a single
    integer division in each engine — IEEE-identical and hash-checkable
    despite being doubles."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_user_type_matrix",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(count(*) AS BIGINT) AS total
    FROM events
    WHERE user_id < 200
    GROUP BY user_id
    """,
)
def pivot_user_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT family: per-user event counts spread into one column per
    event type (the user-feature-matrix shape ML pipelines export).
    Spark's native ``groupBy().pivot(col, values)`` — values listed
    explicitly, so no extra distinct-collection pass runs. Spark plans
    it two-phase: a (user_id, event_type) count, then a pivotfirst
    aggregate spreading the five values into columns — two exchanges,
    BOTH fed by map-side partial aggregates, so what crosses each wire
    is already collapsed.
    The oracle states that desugaring literally. The user_id < 200 cut
    keeps the driver compare small; counts NULL-fill to 0 so the matrix
    is dense, and the row total is the SUM OF THE PIVOT COLUMNS (the
    listed values are the full event_type domain), so no second
    aggregation or join exists — one scan, plan-guarded."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    counts = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    dense = [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
        for t in _EVENT_TYPES
    ]
    total = sum(
        (F.coalesce(F.col(t), F.lit(0)).cast("long") for t in _EVENT_TYPES),
        F.lit(0).cast("long"),
    )
    return counts.select("user_id", *dense, total.alias("total"))


@query(
    "unpivot_profile_metrics",
    oracle="""
    SELECT doc_id, metric, CAST(val AS BIGINT) AS val
    FROM (
      SELECT doc_id, 'n_chars' AS metric, n_chars AS val FROM documents
      UNION ALL
      SELECT doc_id, 'n_tokens_ws',
             len(string_split_regex(trim(text), ' +')) FROM documents
      UNION ALL
      SELECT doc_id, 'n_uppercase',
             length(text) - length(lower(text))
             + len(regexp_extract_all(text, '[A-Z]')) -
               len(regexp_extract_all(lower(text), '[A-Z]'))
      FROM documents
    )
    WHERE doc_id < 100
    """,
)
def unpivot_profile_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt family: wide per-document metrics to long
    (doc_id, metric, val) rows — the shape metric stores and plotting
    layers ingest. Uses Spark's native ``unpivot`` (Expand-based: one
    scan fans out to N rows per input row, no shuffle at all); the
    oracle desugars to the equivalent UNION ALL. The uppercase counter
    is regex-count arithmetic that is dialect-identical (ASCII class)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    wide = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("n_tokens_ws"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Z]"), F.lit(0)))
        .cast("long")
        .alias("n_uppercase"),
    )
    return wide.unpivot(
        ids=["doc_id"],
        values=["n_chars", "n_tokens_ws", "n_uppercase"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "bloom_semi_join_urgent_revenue",
    # The Bloom filter is result-transparent (false positives are removed
    # by the exact semi join, false negatives are impossible), so the
    # oracle is the PLAIN semi join + aggregate — a green hash-match
    # proves the runtime-filter plumbing never changes semantics.
    oracle="""
    SELECT
      l_returnflag,
      count(*) AS n_lines,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag
    """,
)
def bloom_semi_join_urgent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join pruning: discounted revenue per return flag over
    lineitems whose order is URGENT, with the fact side Bloom-pruned
    BEFORE the exact semi join (operators/bloom.py). The bitmap build is
    one partial-agg'd shuffle of <=m/64 word rows (independent of build
    cardinality) and the probe is a map-only broadcast-join stage, so at
    100 TB only ~the matching fraction of lineitem ever reaches the semi
    join's shuffle — the same asymmetry Spark's own InjectRuntimeFilter
    exploits, here as a composable public-API operator."""
    from ..operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    kept = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return kept.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
    )
