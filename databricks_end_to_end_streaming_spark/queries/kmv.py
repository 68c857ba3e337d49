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
from ..pin import pin
from ..tables import load_table
from . import query

K_USERS = 64
K_TOKENS = 128


def kmv_group_report(
    sketch: DataFrame, group_cols: list[str], k: int = K_USERS
) -> DataFrame:
    """(group..., n_sketch, kth, est_distinct) report from a sketch
    relation — shared by the batch queries and the streaming fold
    (streaming/kmv_stage.py), so drained == batch by construction."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("kth")
    )
    return kmv_estimate(agg, k).select(
        *group_cols, "n_sketch", "kth", "est_distinct"
    )


def kmv_type_report(sketch: DataFrame, k: int = K_USERS) -> DataFrame:
    """Per-event-type instantiation of :func:`kmv_group_report`."""
    return kmv_group_report(sketch, ["event_type"], k)


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
    daily = pin(
        kmv_sketch(
            ev.select(F.to_date("ts").alias("day"), "user_id"),
            "user_id",
            ["day"],
            K_USERS,
        )
    )  # two consumers: the weekly re-rank and the n_days rollup
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


TRAIL_DAYS = 7


@query(
    "kmv_trailing_7day_users",
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
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    contrib AS (
      SELECT DISTINCT daily.day + CAST(x.i AS INTEGER) AS wday, daily.h
      FROM daily
      JOIN (SELECT unnest(range({TRAIL_DAYS})) AS i) x ON TRUE
      JOIN bounds ON daily.day + CAST(x.i AS INTEGER) <= bounds.d1
    ),
    wr AS (
      SELECT wday, h,
             row_number() OVER (PARTITION BY wday ORDER BY h) AS rn
      FROM contrib
    ),
    a AS (
      SELECT wday, count(*) AS n_sketch, max(h) AS kth
      FROM wr WHERE rn <= {K_USERS} GROUP BY wday
    )
    SELECT strftime(wday, '%Y-%m-%d') AS window_end,
           n_sketch, kth, {kmv_estimate_sql(K_USERS)} AS est_distinct
    FROM a
    """,
)
def kmv_trailing_7day_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct — the query that makes sketches earn
    their keep: distinct users over every trailing 7-day
    window, computed ONLY from the persisted per-day sketches (the
    idempotent merge means a window estimate is the merge of its days'
    sketches — no raw rescan per window, the thing exact sliding
    distinct fundamentally requires). The exact twin
    (``rolling_7day_active_users``) shuffles every distinct (user, day)
    pair into every window; this shuffles k rows per day per window —
    bounded, forever.

    Shape: the contribution explode fans each daily-sketch row to at
    most TRAIL_DAYS window keys (same pattern as the exact rolling
    query), then one bottom-k per window over <= TRAIL_DAYS*k rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = pin(
        kmv_sketch(
            ev.select(F.to_date("ts").alias("day"), "user_id"),
            "user_id",
            ["day"],
            K_USERS,
        )
    )  # consumed by the contribution explode AND the d1 bound
    d1 = daily.agg(F.max("day").alias("d1"))
    contrib = (
        daily.crossJoin(F.broadcast(d1))
        .select(
            F.explode(
                F.sequence(F.lit(0), F.lit(TRAIL_DAYS - 1))
            ).alias("i"),
            "day",
            "h",
            "d1",
        )
        .select(F.date_add("day", F.col("i")).alias("wday"), "h", "d1")
        .where(F.col("wday") <= F.col("d1"))
        .select("wday", "h")
        .distinct()
    )
    a = bottom_k(contrib, ["wday"], K_USERS).groupBy("wday").agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("kth")
    )
    return kmv_estimate(a, K_USERS).select(
        F.date_format("wday", "yyyy-MM-dd").alias("window_end"),
        "n_sketch",
        "kth",
        "est_distinct",
    )


K_JOIN = 256


def _join_profile_sql(
    fact: str,
    fact_key: str,
    dim: str,
    dim_key: str,
    name: str,
    include_actual: bool = True,
) -> str:
    """One join's profile as a 1-row SELECT (DuckDB), mirroring
    ``_join_profile`` expression for expression. ``include_actual=False``
    is the production estimator shape: prediction only, the exact join
    never runs."""
    k = K_JOIN
    actual_cte = (
        f""",
    actual AS (
      SELECT CAST(sum(fa.c * di.c) AS BIGINT) AS actual_join_rows
      FROM (SELECT {fact_key} AS jk, count(*) AS c FROM {fact} GROUP BY 1) fa
      JOIN (SELECT {dim_key} AS jk, count(*) AS c FROM {dim} GROUP BY 1) di
      USING (jk)
    )"""
        if include_actual
        else ""
    )
    actual_flat_col = (
        ", actual.actual_join_rows" if include_actual else ""
    )
    actual_flat_from = ", actual" if include_actual else ""
    actual_out_col = ",\n           actual_join_rows" if include_actual else ""
    return f"""
    WITH keys AS (
      SELECT 'a' AS side, {fact_key} AS jk FROM {fact}
      UNION ALL
      SELECT 'b', {dim_key} FROM {dim}
    ),
    rows_per AS (
      SELECT side, count(*) AS n_rows FROM keys GROUP BY side
    ),
    kh AS (
      SELECT DISTINCT side, {kmv_hash_sql("jk")} AS h FROM keys
    ),
    kr AS (
      SELECT side, h,
             row_number() OVER (PARTITION BY side ORDER BY h) AS rn
      FROM kh
    ),
    sk AS (SELECT side, h FROM kr WHERE rn <= {k}),
    side_stats AS (
      SELECT side, count(*) AS n_sk, max(h) AS kth
      FROM sk GROUP BY side
    ),
    est AS (
      SELECT s.side, r.n_rows,
             {kmv_estimate_sql(k, n_sql="n_sk")} AS est_distinct
      FROM side_stats s JOIN rows_per r USING (side)
    ),
    tag AS (
      SELECT h, max(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS in_b
      FROM sk GROUP BY h
    ),
    mr AS (
      SELECT *, row_number() OVER (ORDER BY h) AS rn FROM tag
    ),
    m AS (
      SELECT count(*) AS n_merged, max(h) AS kth,
             CAST(sum(in_a * in_b) AS BIGINT) AS n_common
      FROM mr WHERE rn <= {k}
    ){actual_cte},
    flat AS (
      SELECT
        (SELECT n_rows FROM est WHERE side = 'a') AS rows_a,
        (SELECT n_rows FROM est WHERE side = 'b') AS rows_b,
        (SELECT est_distinct FROM est WHERE side = 'a') AS est_distinct_a,
        (SELECT est_distinct FROM est WHERE side = 'b') AS est_distinct_b,
        m.n_merged, m.kth, m.n_common{actual_flat_col}
      FROM m{actual_flat_from}
    ),
    e AS (
      SELECT *,
        CAST(n_common AS DOUBLE) / CAST(n_merged AS DOUBLE) AS est_jaccard,
        {kmv_estimate_sql(k, n_sql="n_merged")} AS est_union
      FROM flat
    ),
    c AS (
      SELECT *, est_jaccard * est_union AS est_common_keys FROM e
    )
    SELECT '{name}' AS join_name, rows_a, rows_b,
           est_distinct_a, est_distinct_b, est_common_keys,
           est_common_keys * (CAST(rows_a AS DOUBLE) / est_distinct_a)
             * (CAST(rows_b AS DOUBLE) / est_distinct_b) AS est_join_rows{actual_out_col}
    FROM c
    """


@query(
    "kmv_join_size_profile",
    oracle=(
        "SELECT * FROM ("
        + _join_profile_sql("orders", "o_custkey", "customer", "c_custkey", "orders_x_customer")
        + ") UNION ALL SELECT * FROM ("
        + _join_profile_sql("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem_x_orders")
        + ")"
    ),
)
def kmv_join_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from sketches — optimizer statistics without
    running the join: per join side, exact row counts plus KMV
    distinct-key estimates; across sides, the merged-sketch common-key
    estimate; predicted |A JOIN B| = est_common * (rows_a/d_a) *
    (rows_b/d_b) (uniform-frequency model, the textbook cardinality
    estimator). The exact join cardinality rides along as the
    evaluation column — at 100 TB you compute the prediction from
    k-row sketches + two count aggregates and SKIP the join; here the
    oracle hash-verifies the whole profile including the doubles.

    Shape: each side is one distinct partial-agg + bottom-k; the merged
    window touches <= 2k rows; the actual-cardinality evaluation is two
    key-count aggregates joined key-on-key (no row-level join)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return _grouped_join_profiles(
        [
            (orders, "o_custkey", customer, "c_custkey", "orders_x_customer"),
            (lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_x_orders"),
        ],
        include_actual=True,
    )


def join_size_summaries(fact, fact_key, dim, dim_key):
    """The PERSISTABLE sufficient statistics of the join-size estimator:
    (rows_per: side -> exact row count, sk: the two bottom-k KMV
    sketches, <= 2k rows total). This is what a production system
    maintains per table (the kmv_weekly_users_rollup pattern) —
    prediction then never touches the raw tables; the bench's
    kmv_join_predict_persisted extra times exactly that marginal
    cost."""
    keys = fact.select(
        F.lit("a").alias("side"), F.col(fact_key).alias("jk")
    ).unionByName(
        dim.select(F.lit("b").alias("side"), F.col(dim_key).alias("jk"))
    )
    rows_per = keys.groupBy("side").agg(F.count("*").alias("n_rows"))
    # consumed by side_stats AND the merged-sketch tagging
    sk = pin(kmv_sketch(keys, "jk", ["side"], K_JOIN))
    return rows_per, sk


def join_size_predict(rows_per, sk, name, actual=None):
    """Prediction tail over the (possibly persisted) summaries — shared
    bit-for-bit by the scan-inclusive queries and the persisted-sketch
    bench path (tests/test_kmv.py pins the equality). ``actual`` is the
    optional 1-row exact-cardinality evaluation leg (profile query
    only)."""
    k = K_JOIN
    side_stats = sk.groupBy("side").agg(
        F.count("*").alias("n_sk"), F.max("h").alias("kth")
    )
    est = kmv_estimate(
        side_stats, k, n_col="n_sk"
    ).join(rows_per, "side")
    a_row = est.where(F.col("side") == "a").select(
        F.col("n_rows").alias("rows_a"),
        F.col("est_distinct").alias("est_distinct_a"),
    )
    b_row = est.where(F.col("side") == "b").select(
        F.col("n_rows").alias("rows_b"),
        F.col("est_distinct").alias("est_distinct_b"),
    )
    tag = sk.groupBy("h").agg(
        F.max((F.col("side") == "a").cast("int")).alias("in_a"),
        F.max((F.col("side") == "b").cast("int")).alias("in_b"),
    )
    mw = Window.partitionBy(F.lit(0)).orderBy("h")
    m = (
        tag.withColumn("rn", F.row_number().over(mw))
        .where(F.col("rn") <= k)
        .agg(
            F.count("*").alias("n_merged"),
            F.max("h").alias("kth"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"),
        )
    )
    flat = a_row.crossJoin(b_row).crossJoin(m)
    if actual is not None:
        flat = flat.crossJoin(actual)
    return _score_profile(flat, name, k, include_actual=actual is not None)


def _join_profile(fact, fact_key, dim, dim_key, name, include_actual=True):
    """One join's sketch-based size profile (see kmv_join_size_profile).
    ``include_actual=False`` is the production estimator: prediction
    from k-row sketches + two count-aggs only — the exact join NEVER
    runs, which is the whole point of the estimator at 100 TB."""
    rows_per, sk = join_size_summaries(fact, fact_key, dim, dim_key)
    actual = None
    if include_actual:
        fa = fact.groupBy(F.col(fact_key).alias("jk")).agg(
            F.count("*").alias("ca")
        )
        di = dim.groupBy(F.col(dim_key).alias("jk")).agg(
            F.count("*").alias("cb")
        )
        actual = fa.join(di, "jk").agg(
            F.sum(F.col("ca") * F.col("cb")).alias("actual_join_rows")
        )
    return join_size_predict(rows_per, sk, name, actual)


def _grouped_join_profiles(specs, include_actual):
    """ALL requested join profiles in ONE grouped plan (r13, guide §2.1):
    the per-join chains were independent subplans union'd at the end —
    two sketch pins, two bottom-k window chains, two merge windows, two
    actual-cardinality legs. Keying every relation by ``join_name``
    instead runs ONE distinct + bottom-k + merge + (optional) actual
    chain whose per-group results are exactly the per-join ones (every
    aggregate/window partitions by join_name), halving the exchange
    count and leaving a single pinned sketch relation. Arithmetic is
    the same expression tree per group, so the output doubles are
    bit-identical to the per-join build (tests pin the persisted-path
    equality).

    ``specs``: [(fact, fact_key, dim, dim_key, name), ...].
    """
    k = K_JOIN
    legs = []
    for fact, fk, dim, dk, name in specs:
        legs.append(
            fact.select(
                F.lit(name).alias("jn"),
                F.lit("a").alias("side"),
                F.col(fk).alias("jk"),
            )
        )
        legs.append(
            dim.select(
                F.lit(name).alias("jn"),
                F.lit("b").alias("side"),
                F.col(dk).alias("jk"),
            )
        )
    keys = legs[0]
    for leg in legs[1:]:
        keys = keys.unionByName(leg)
    rows_per = keys.groupBy("jn", "side").agg(F.count("*").alias("n_rows"))
    sk = pin(kmv_sketch(keys, "jk", ["jn", "side"], k))
    side_stats = sk.groupBy("jn", "side").agg(
        F.count("*").alias("n_sk"), F.max("h").alias("kth")
    )
    est = kmv_estimate(side_stats, k, n_col="n_sk").join(
        rows_per, ["jn", "side"]
    )
    ab = est.groupBy("jn").agg(
        F.max(F.when(F.col("side") == "a", F.col("n_rows"))).alias("rows_a"),
        F.max(F.when(F.col("side") == "b", F.col("n_rows"))).alias("rows_b"),
        F.max(
            F.when(F.col("side") == "a", F.col("est_distinct"))
        ).alias("est_distinct_a"),
        F.max(
            F.when(F.col("side") == "b", F.col("est_distinct"))
        ).alias("est_distinct_b"),
    )
    tag = sk.groupBy("jn", "h").agg(
        F.max((F.col("side") == "a").cast("int")).alias("in_a"),
        F.max((F.col("side") == "b").cast("int")).alias("in_b"),
    )
    mw = Window.partitionBy("jn").orderBy("h")
    m = (
        tag.withColumn("rn", F.row_number().over(mw))
        .where(F.col("rn") <= k)
        .groupBy("jn")
        .agg(
            F.count("*").alias("n_merged"),
            F.max("h").alias("kth"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"),
        )
    )
    flat = ab.join(m, "jn")
    if include_actual:
        fa_legs = [
            fact.select(
                F.lit(name).alias("jn"), F.col(fk).alias("jk")
            )
            for fact, fk, _dim, _dk, name in specs
        ]
        di_legs = [
            dim.select(F.lit(name).alias("jn"), F.col(dk).alias("jk"))
            for _fact, _fk, dim, dk, name in specs
        ]
        fa = fa_legs[0]
        for leg in fa_legs[1:]:
            fa = fa.unionByName(leg)
        di = di_legs[0]
        for leg in di_legs[1:]:
            di = di.unionByName(leg)
        fa = fa.groupBy("jn", "jk").agg(F.count("*").alias("ca"))
        di = di.groupBy("jn", "jk").agg(F.count("*").alias("cb"))
        actual = (
            fa.join(di, ["jn", "jk"])
            .groupBy("jn")
            .agg(
                F.sum(F.col("ca") * F.col("cb")).alias("actual_join_rows")
            )
        )
        # left join: a join with zero common keys keeps its profile row
        # with a NULL actual, matching the per-join global aggregate's
        # empty-sum semantics
        flat = flat.join(actual, "jn", "left")
    scored = _score_profile(
        flat.withColumnRenamed("jn", "_jn"),
        None,
        k,
        include_actual=include_actual,
    )
    return scored


def _score_profile(flat, name, k, include_actual=False):
    e = flat.withColumn(
        "est_jaccard",
        F.col("n_common").cast("double") / F.col("n_merged").cast("double"),
    ).withColumn(
        "est_union",
        F.when(
            F.col("n_merged") < k, F.col("n_merged").cast("double")
        ).otherwise(
            F.lit(float(k - 1))
            * F.lit(float(2**60))
            / F.col("kth").cast("double")
        ),
    )
    c = e.withColumn(
        "est_common_keys", F.col("est_jaccard") * F.col("est_union")
    )
    cols = [
        # name=None: grouped build — the join name is the _jn column
        (F.lit(name) if name is not None else F.col("_jn")).alias(
            "join_name"
        ),
        F.col("rows_a"),
        F.col("rows_b"),
        F.col("est_distinct_a"),
        F.col("est_distinct_b"),
        F.col("est_common_keys"),
        (
            F.col("est_common_keys")
            * (F.col("rows_a").cast("double") / F.col("est_distinct_a"))
            * (F.col("rows_b").cast("double") / F.col("est_distinct_b"))
        ).alias("est_join_rows"),
    ]
    if include_actual:
        cols.append(F.col("actual_join_rows"))
    return c.select(*cols)


@query(
    "kmv_join_size_estimate",
    oracle=(
        "SELECT * FROM ("
        + _join_profile_sql(
            "orders", "o_custkey", "customer", "c_custkey",
            "orders_x_customer", include_actual=False,
        )
        + ") UNION ALL SELECT * FROM ("
        + _join_profile_sql(
            "lineitem", "l_orderkey", "orders", "o_orderkey",
            "lineitem_x_orders", include_actual=False,
        )
        + ")"
    ),
)
def kmv_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of kmv_join_size_profile: identical
    prediction pipeline, but the exact-cardinality evaluation leg is
    gone — the predicted |A JOIN B| comes from two k-row KMV sketches
    and two count aggregates, and the join itself never executes.
    Registered separately so the bench reports the estimator's true
    cost instead of the evaluation harness's."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return _grouped_join_profiles(
        [
            (orders, "o_custkey", customer, "c_custkey", "orders_x_customer"),
            (lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_x_orders"),
        ],
        include_actual=False,
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
    # The sketch relation feeds the pair dimension AND both tagged
    # legs — unpinned, every consumer re-runs the corpus explode +
    # distinct + bottom-k subplan (12 parquet scans in the observed
    # plan; tests/test_plans.py guards it at exactly one).
    sk = pin(kmv_sketch(tok, "token", ["source"], K_TOKENS))

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
