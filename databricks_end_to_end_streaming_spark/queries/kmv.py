"""KMV distinct-sketch queries: per-group cardinality estimates and
cross-group set algebra (union / intersection / Jaccard) from k-sized
summaries (operators/kmv.py; Beyer et al. SIGMOD 2007).

Why this exists next to the HLL rollup (``sketch_rollup_daily_users``):
HLL answers "how many distinct" per group but its register buffers are
engine-opaque (rows-only driver check) and give no BETWEEN-group
algebra. KMV gives both: every hash is a deterministic built-in
expression the DuckDB oracle replays bit-for-bit, and two groups'
sketches combine into union/intersection/Jaccard estimates without
touching the raw data again — at 100 TB, cross-source overlap from
k-row summaries instead of a corpus-scale distinct join.

Fixture notes: at sf0.01 every event type has 150 distinct users, so
k=64 SATURATES the user sketches and the estimator path (not the exact
short-circuit) is what the oracle verifies; the token sketches use
k=128 against per-source vocabularies of several hundred distinct
tokens — live estimator there too.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.kmv import (
    bottom_k,
    kmv_estimate,
    kmv_estimate_sql,
    kmv_hash_sql,
    kmv_sketch,
)
from ..tables import load_table
from . import query

K_USERS = 64
K_TOKENS = 128


def kmv_type_report(sketch: DataFrame, k: int = K_USERS) -> DataFrame:
    """Per-event-type report from a (event_type, h) sketch relation —
    shared by the batch query and the streaming fold
    (streaming/kmv_stage.py), so drained == batch by construction."""
    agg = sketch.groupBy("event_type").agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("kth")
    )
    return kmv_estimate(agg, k).select(
        "event_type", "n_sketch", "kth", "est_distinct"
    )


@query(
    "kmv_distinct_users_per_type",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, {kmv_hash_sql("user_id")} AS h FROM events
    ),
    r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ),
    a AS (
      SELECT event_type, count(*) AS n_sketch, max(h) AS kth
      FROM r WHERE rn <= {K_USERS} GROUP BY event_type
    )
    SELECT event_type, n_sketch, kth,
           {kmv_estimate_sql(K_USERS)} AS est_distinct
    FROM a
    """,
)
def kmv_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user cardinality per event type from a k=64 KMV sketch.
    One distinct-keyed partial-agg shuffle + the skew-safe two-level
    bottom-k; every retained hash and the final double estimate replay
    bit-for-bit in the oracle. The same report function folds the
    streaming sketch log (streaming/kmv_stage.py)."""
    ev = load_table(spark, sf_dir, "events")
    return kmv_type_report(kmv_sketch(ev, "user_id", ["event_type"], K_USERS))


@query(
    "kmv_weekly_users_rollup",
    oracle=f"""
    WITH dh AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day,
             {kmv_hash_sql("user_id")} AS h
      FROM events
    ),
    dr AS (
      SELECT day, h,
             row_number() OVER (PARTITION BY day ORDER BY h) AS rn
      FROM dh
    ),
    daily AS (SELECT day, h FROM dr WHERE rn <= {K_USERS}),
    wh AS (
      SELECT DISTINCT date_trunc('week', day) AS week, h FROM daily
    ),
    wr AS (
      SELECT week, h,
             row_number() OVER (PARTITION BY week ORDER BY h) AS rn
      FROM wh
    ),
    a AS (
      SELECT week, count(*) AS n_sketch, max(h) AS kth
      FROM wr WHERE rn <= {K_USERS} GROUP BY week
    ),
    d AS (
      SELECT date_trunc('week', day) AS week, count(DISTINCT day) AS n_days
      FROM daily GROUP BY 1
    )
    SELECT strftime(CAST(a.week AS DATE), '%Y-%m-%d') AS week,
           d.n_days, a.n_sketch, a.kth,
           {kmv_estimate_sql(K_USERS)} AS est_distinct
    FROM a JOIN d ON a.week = d.week
    """,
)
def kmv_weekly_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct over time — the rollup exact
    countDistinct can NOT do: daily per-day KMV sketches (what a
    production pipeline would persist once per day) merge into weekly
    distinct-user estimates WITHOUT rescanning raw events, because
    union-then-truncate loses nothing a single-pass weekly sketch would
    keep (tests/test_kmv.py proves weekly-from-daily == weekly-from-raw
    bit-for-bit). At 100 TB this is the difference between touching one
    day of data per day and rescanning a month per report.

    Shape: the raw scan feeds ONE distinct (day, h) partial-agg; daily
    bottom-k bounds state at k rows/day; everything weekly runs on the
    days-x-k sketch relation."""
    ev = load_table(spark, sf_dir, "events")
    daily = kmv_sketch(
        ev.select(F.to_date("ts").alias("day"), "user_id"),
        "user_id",
        ["day"],
        K_USERS,
    )
    with_week = daily.withColumn(
        "week", F.to_date(F.date_trunc("week", F.col("day")))
    )
    weekly = bottom_k(
        with_week.select("week", "h").distinct(), ["week"], K_USERS
    )
    a = weekly.groupBy("week").agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("kth")
    )
    d = with_week.groupBy("week").agg(
        F.countDistinct("day").alias("n_days")
    )
    return (
        kmv_estimate(a.join(d, "week"), K_USERS)
        # ISO string, not DateType: date keys surface as python objects
        # vs datetime64 across the two engines' pandas conversions
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            "n_days",
            "n_sketch",
            "kth",
            "est_distinct",
        )
    )


_TOKEN_SKETCH_SQL = f"""
    tok AS (
      SELECT DISTINCT source,
             unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ),
    th AS (
      SELECT DISTINCT source, {kmv_hash_sql("token")} AS h FROM tok
    ),
    tr AS (
      SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      FROM th
    ),
    s AS (SELECT source, h FROM tr WHERE rn <= {K_TOKENS})
"""


@query(
    "kmv_source_token_overlap",
    oracle=f"""
    WITH {_TOKEN_SKETCH_SQL},
    pr AS (
      SELECT x.source AS src_a, y.source AS src_b
      FROM (SELECT DISTINCT source FROM s) x
      JOIN (SELECT DISTINCT source FROM s) y ON x.source < y.source
    ),
    tagged AS (
      SELECT pr.src_a, pr.src_b, s.h, 1 AS in_a, 0 AS in_b
      FROM pr JOIN s ON s.source = pr.src_a
      UNION ALL
      SELECT pr.src_a, pr.src_b, s.h, 0 AS in_a, 1 AS in_b
      FROM pr JOIN s ON s.source = pr.src_b
    ),
    uh AS (
      SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b
      FROM tagged GROUP BY src_a, src_b, h
    ),
    ur AS (
      SELECT *, row_number()
               OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
      FROM uh
    ),
    m AS (
      SELECT src_a, src_b,
             count(*) AS n_merged,
             max(h) AS kth,
             CAST(sum(in_a * in_b) AS BIGINT) AS n_common
      FROM ur WHERE rn <= {K_TOKENS} GROUP BY src_a, src_b
    ),
    e AS (
      SELECT src_a, src_b, n_merged, n_common,
             CAST(n_common AS DOUBLE) / CAST(n_merged AS DOUBLE)
               AS est_jaccard,
             {kmv_estimate_sql(K_TOKENS, n_sql="n_merged")} AS est_union
      FROM m
    )
    SELECT src_a, src_b, n_merged, n_common, est_jaccard, est_union,
           est_jaccard * est_union AS est_intersection
    FROM e
    """,
)
def kmv_source_token_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap from per-source KMV token
    sketches (k=128): for every source pair, the merged-sketch Jaccard,
    union-cardinality, and intersection-cardinality estimates (Beyer
    et al.'s multiset-operation synopses — the 'how much do these two
    crawls share' question answered from k-row summaries).

    100 TB shape: the corpus is touched ONCE (token explode -> distinct
    -> skew-safe bottom-k); everything pairwise runs on the k-per-source
    sketch relation — the pair expansion costs |pairs| * 2k tiny rows,
    never a corpus-scale join. Pairwise-over-groups is inherently
    quadratic in the GROUP count, so a deployment with millions of
    groups passes a pair allowlist; the all-pairs form here matches the
    fixture's 20 sources."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(F.trim("text"), " +")).alias("token"),
    )
    sk = kmv_sketch(tok, "token", ["source"], K_TOKENS)

    srcs = sk.select("source").distinct()
    pr = (
        srcs.alias("x")
        .join(srcs.alias("y"), F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b")
        )
    )
    from_a = pr.join(
        sk.withColumnRenamed("source", "src_a"), "src_a"
    ).select(
        "src_a", "src_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    from_b = pr.join(
        sk.withColumnRenamed("source", "src_b"), "src_b"
    ).select(
        "src_a", "src_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    uh = (
        from_a.unionByName(from_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("h")
    merged = uh.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= K_TOKENS
    )
    m = merged.groupBy("src_a", "src_b").agg(
        F.count("*").alias("n_merged"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"),
    )
    e = (
        m.withColumn(
            "est_jaccard",
            F.col("n_common").cast("double") / F.col("n_merged").cast("double"),
        )
        .withColumn(
            "est_union",
            F.when(
                F.col("n_merged") < K_TOKENS,
                F.col("n_merged").cast("double"),
            ).otherwise(
                F.lit(float(K_TOKENS - 1))
                * F.lit(float(2**60))
                / F.col("kth").cast("double")
            ),
        )
    )
    return e.select(
        "src_a",
        "src_b",
        "n_merged",
        "n_common",
        "est_jaccard",
        "est_union",
        (F.col("est_jaccard") * F.col("est_union")).alias("est_intersection"),
    )
