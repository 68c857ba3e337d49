"""Event-stream analytics: the windowed / ordered / exploded operator
families over the ``events`` table (SURVEY §2.7 notes the reference has
none of these — they come free with the DataFrame API, and a user of a
streaming medallion pipeline needs them over silver/gold tables).

Determinism: every window carries a total order (ts, event_id); time
deltas are integer epoch-second arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load_table
from ..pin import pin
from . import query


@query(
    "window_lag_inter_event_gap",
    oracle="""
    SELECT user_id, event_id,
           CAST(ts AS TIMESTAMP) AS ts,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
             - CAST(floor(epoch(lag(CAST(ts AS TIMESTAMP))
                          OVER (PARTITION BY user_id ORDER BY ts, event_id)))
                    AS BIGINT) AS gap_seconds
    FROM events
    """,
)
def window_lag_inter_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): seconds since the user's previous event (NULL for first)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_seconds"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                       - CAST(floor(epoch(lag(CAST(ts AS TIMESTAMP))
                               OVER (PARTITION BY user_id ORDER BY ts, event_id)))
                              AS BIGINT)
                       > 3600
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ), numbered AS (
      SELECT user_id, event_id, ts,
             sum(is_new_session)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (1h inactivity closes a session):
    lag -> break flag -> running sum -> per-session aggregate. The
    streaming twin is F.session_window; this is the batch/backfill form."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 3600)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new_session"),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "explode_token_counts",
    oracle="""
    SELECT token, count(*) AS n
    FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS token
      FROM documents WHERE doc_id < 50
    )
    WHERE token <> ''
    GROUP BY token
    """,
)
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/UDTF family: explode tokens -> frequency table."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "count_distinct_users_per_type",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def count_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (expand-based two-phase distinct count)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "running_total_per_user",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    """,
)
def running_total_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum window frame (ROWS UNBOUNDED PRECEDING)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@query(
    "median_value_per_type_exact",
    oracle="""
    SELECT event_type, n, value AS median_low
    FROM (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    WHERE rn = (n + 1) // 2
    """,
)
def median_value_per_type_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median by rank (engine-independent, unlike
    interpolating percentile implementations)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    return (
        e.select(
            "event_type",
            "value",
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
        .where(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
        .select("event_type", "n", F.col("value").alias("median_low"))
    )


@query(
    "session_window_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(CAST(ts AS TIMESTAMP))
                     - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w)
                     >= 3600000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS seq
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 1 HOUR AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, seq
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.session_window (1h gap): the built-in form of
    sessionize_events, usable unchanged in Structured Streaming with a
    watermark. The oracle mirrors Spark's exact merge rule — a new
    session starts when the µs gap is >= the gap duration — via
    epoch_us integer arithmetic (second-floored math would misplace
    gaps in [3600, 3601))."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


@query("approx_distinct_users")  # rows-only: HLL sketch is engine-specific
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the at-scale form of the
    distinct count; sketch values differ per engine so the driver records
    rows-only, and pytest bounds the relative error vs the exact count."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@query(
    "asof_last_event_value",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey,
           e.event_id AS asof_event_id
    FROM orders o
    LEFT JOIN LATERAL (
      SELECT event_id
      FROM events e
      WHERE e.user_id = o.o_custkey % 20
        AND CAST(e.ts AS TIMESTAMP) <= o.o_orderdate
      ORDER BY e.ts DESC, e.event_id DESC
      LIMIT 1
    ) e ON true
    WHERE o.o_orderkey <= 2000
    """,
)
def asof_last_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: latest event at-or-before each order date
    for the order's (synthetic) user. Spark lacks a native as-of join;
    the scalable composition is range-join + window-pick-latest."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 20).alias("user_id"),
            F.col("o_orderdate").cast("timestamp_ntz").alias("odate"),
        )
    )
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("ts"), F.desc("event_id"))
    joined = o.join(e, (o.user_id == e.user_id) & (e.ts <= o.odate), "left")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderkey", F.col("event_id").alias("asof_event_id"))
    )


@query("sketch_rollup_daily_users")  # rows-only: sketch bytes are engine-specific
def sketch_rollup_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (the hypertable/OLAP-cube pattern that
    makes distinct counts re-aggregatable at 100 TB): build one HLL
    sketch per (day, hour) — the fine-grained materialization a rollup
    table would persist — then union the hourly sketches into daily
    distinct-user estimates WITHOUT rescanning raw events. Unlike a
    distinct count, sketches compose: day -> week -> month rollups each
    cost O(groups), not O(raw rows). pytest bounds the estimate against
    the exact count; the driver records rows-only (sketch internals are
    engine-specific)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            F.hour("ts").alias("hour"),
            "user_id",
        )
        .groupBy("day", "hour")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    )
    return (
        hourly.groupBy("day")
        .agg(F.hll_union_agg("sketch").alias("day_sketch"))
        .select(
            "day",
            F.hll_sketch_estimate("day_sketch").alias("approx_users"),
        )
        .orderBy("day")
    )


@query(
    "interval_join_order_week_events",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey,
           count(e.event_id) AS n_events_week
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey % 20
     AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
     AND CAST(e.ts AS TIMESTAMP) <  o.o_orderdate + INTERVAL 7 DAY
    WHERE o.o_orderkey <= 2000
    GROUP BY o.o_orderkey
    """,
)
def interval_join_order_week_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: events falling inside a per-order time
    window [orderdate, orderdate+7d), keyed by user. The user_id
    equality makes this a plain shuffled equi-join with the range as a
    residual predicate — the scalable spelling of a range join (a pure
    non-equi join would degenerate to a broadcast nested loop); at
    higher selectivity the next lever is bucketing both sides by
    coarse time bin. Complements asof_last_event_value (point lookup
    backward) with windowed containment forward."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    e = load_table(spark, sf_dir, "events")
    cond = (
        (e.user_id == o.o_custkey % 20)
        & (e.ts >= o.o_orderdate)
        & (e.ts < o.o_orderdate + F.expr("INTERVAL 7 DAY"))
    )
    return (
        o.join(e, cond, "left_outer")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events_week"))
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS users_view,
           (SELECT count(*) FROM c) AS users_view_click,
           (SELECT count(*) FROM p) AS users_full_funnel
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click-after-view ->
    purchase-after-that): each stage is a per-user min-ts aggregate
    joined to the previous stage with a time-order predicate. Every
    shuffle keys on user_id; each stage's output is one row per
    converted user, so the joins shrink monotonically down the funnel."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("users_view"))
        .crossJoin(c.agg(F.count("*").alias("users_view_click")))
        .crossJoin(p.agg(F.count("*").alias("users_full_funnel")))
    )


@query(
    "retention_cohorts_daily",
    oracle="""
    WITH firstday AS (
      SELECT user_id,
             CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS INTEGER)
             AS offset_days,
           count(DISTINCT a.user_id) AS n_users
    FROM act a JOIN firstday f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily retention cohorts: users grouped by first-seen day, counted
    on each subsequent active day (the offset-days triangle). Two
    user_id-keyed aggregations + one join; the distinct-activity
    projection collapses the event stream to (user, day) before anything
    heavy happens."""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("cohort_day"))
    act = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            # ISO string, not DateType: date columns surface as python
            # objects vs datetime64 across engines' pandas conversions
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("offset_days"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "json_props_extract_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER)
             AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER)
             AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads: extract a typed field from the JSON
    ``props`` column (get_json_object — JVM-side JSON path, no Python)
    and aggregate per event type. The extraction is a narrow projection;
    only the small (type, k) pairs reach the agg shuffle."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "event_value_percentiles_exact",
    oracle="""
    WITH ranked AS (
      SELECT value,
             row_number() OVER (ORDER BY value, event_id) AS r,
             count(*) OVER () AS n
      FROM events
    )
    SELECT q.p AS percentile, ranked.value AS value
    FROM ranked
    JOIN (VALUES ('p50', 0.50), ('p90', 0.90), ('p99', 0.99)) AS q(p, f)
      ON ranked.r = CAST(ceil(q.f * ranked.n) AS BIGINT)
    ORDER BY percentile
    """,
)
def event_value_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of event values by nearest-rank selection —
    the deterministic alternative to approx_percentile, computed WITHOUT
    a single-partition global sort: ranks come from the range-partitioned
    machinery in operators/ranking.py (TeraSort shape), and only the
    three selected rows leave the executors. The total count is the one
    scalar action (the corpus itself never moves to the driver); both
    engines derive the target rank as ceil(q * n) over the identical
    (value, event_id) total order, so the selected rows match exactly."""
    import math

    from ..operators.ranking import global_row_number

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    total = ev.count()
    ranked = global_row_number(ev, ["value", "event_id"])
    targets = {p: math.ceil(f * total) for p, f in
               (("p50", 0.50), ("p90", 0.90), ("p99", 0.99))}
    label = F.create_map(
        *[x for p, r in targets.items() for x in (F.lit(r), F.lit(p))]
    )[F.col("rank")]
    return (
        ranked.where(F.col("rank").isin(list(targets.values())))
        .select(label.alias("percentile"), "value")
        .orderBy("percentile")
    )


@query(
    "cusum_level_shift_per_type",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                  AS BIGINT) AS hour,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), dev AS (
      SELECT event_type, hour,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS h,
             CAST(count(*) OVER (PARTITION BY event_type) * cents
                  - sum(cents) OVER (PARTITION BY event_type)
                  AS BIGINT) AS d
      FROM hourly
    ), walk AS (
      SELECT event_type, hour, h,
             CAST(sum(d) OVER w AS BIGINT) AS p
      FROM dev
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS UNBOUNDED PRECEDING)
    ), draw AS (
      SELECT event_type, hour, h, p,
             p - min(p) OVER w AS up,
             max(p) OVER w - p AS down
      FROM walk
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type,
           CAST(max(h) AS BIGINT) AS n_hours,
           CAST(max(up) AS BIGINT) AS cusum_up_scaled,
           CAST(max(down) AS BIGINT) AS cusum_down_scaled,
           CAST(min(CASE WHEN p = mp THEN hour END) AS BIGINT)
             AS changepoint_hour,
           CAST(max(up) AS DOUBLE) / (max(h) * 100.0) AS cusum_up_value
    FROM (SELECT d.*, min(p) OVER (PARTITION BY event_type) AS mp
          FROM draw d)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def cusum_level_shift_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection per event type (Page 1954 — public
    literature): the sequential-detection member of the drift family
    (chi²/PSI/KS say THAT a distribution moved; Spearman says values
    trend; CUSUM says the MEAN level shifted and WHEN). Implemented
    over hourly value sums via the prefix-extremum identity: the
    recurrence S_t = max(0, S_{t-1} + d_t) equals P_t - min_{k<=t} P_k
    for the deviation random walk P, so the whole statistic is two
    cumulative windows + one aggregate — no recursion. The reported
    changepoint is the hour the maximum drawup completes (ties -> the
    earliest such hour).

    Exactness: events carry exact-cent values, so hourly sums are
    int64 cents; deviations are mean-centered WITHOUT division by
    clearing fractions (d_t = H*x_t - total — the kappa/AUC integer
    discipline), making the walk, both extrema, and both CUSUM scores
    exact int64 (headroom: |P| <= H^2 * max_hourly_cents ~ 4e14 at
    testdata shape; DECIMAL-widen past ~1e6 hours). The one double is
    the final unit conversion (scaled / (H*100)), a single identical
    division in both engines. ``changepoint_hour`` is the hour the
    deviation walk bottoms (earliest on ties) — for an upward mean
    shift the walk decreases before the shift and increases after, so
    its minimum IS the last pre-shift hour (the textbook CUSUM
    changepoint estimate).

    Shape at 100 TB: ONE (type, hour) partial-agg'd corpus shuffle
    (hours are bounded — years * 8760 — so everything downstream is
    calendar-sized, not corpus-sized); the windows share the per-type
    partitioning with the final aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_cents(ev)
    return cusum_over_hourly_cents(hourly)


def hourly_cents(ev: DataFrame) -> DataFrame:
    """(event_type, hour, cents) exact-int hourly value sums — the sum
    MONOID shared by the batch query and the streaming stage."""
    return (
        ev.select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 3600000000"
            ).alias("hour"),
            F.col("value")
            .cast("decimal(18,2)")
            .alias("v"),
        )
        .groupBy("event_type", "hour")
        .agg((F.sum("v") * 100).cast("long").alias("cents"))
    )


def cusum_over_hourly_cents(hourly: DataFrame) -> DataFrame:
    """CUSUM scoring core over a (event_type, hour, cents) relation —
    shared by the batch query and the streaming twin
    (streaming/stats_stage.py::cusum_from_log)."""
    wall = Window.partitionBy("event_type")
    dev = hourly.select(
        "event_type",
        "hour",
        F.count("*").over(wall).alias("h"),
        (
            F.count("*").over(wall) * F.col("cents")
            - F.sum("cents").over(wall)
        ).alias("d"),
    ).transform(pin)
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walk = dev.select(
        "event_type", "hour", "h", F.sum("d").over(wcum).alias("p")
    )
    draw = walk.select(
        "event_type",
        "hour",
        "h",
        "p",
        (F.col("p") - F.min("p").over(wcum)).alias("up"),
        (F.max("p").over(wcum) - F.col("p")).alias("down"),
    )
    mp = draw.withColumn("mp", F.min("p").over(wall))
    return (
        mp.groupBy("event_type")
        .agg(
            F.max("h").alias("n_hours"),
            F.max("up").alias("cusum_up_scaled"),
            F.max("down").alias("cusum_down_scaled"),
            F.min(
                F.when(F.col("p") == F.col("mp"), F.col("hour"))
            ).alias("changepoint_hour"),
            (
                F.max("up").cast("double")
                / (F.max("h") * F.lit(100.0))
            ).alias("cusum_up_value"),
        )
        .orderBy("event_type")
    )


@query(
    "durbin_watson_hourly_per_type",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                  AS BIGINT) AS hour,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), dev AS (
      SELECT event_type, hour,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS h,
             CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT)
               * cents
               - sum(CAST(cents AS HUGEINT))
                   OVER (PARTITION BY event_type) AS e
      FROM hourly
    ), lagd AS (
      SELECT event_type, h, e,
             lag(e) OVER (PARTITION BY event_type ORDER BY hour) AS ep
      FROM dev
    ), sums AS (
      SELECT event_type, max(h) AS n_hours,
             sum(e * e) AS see,
             sum(CASE WHEN ep IS NULL THEN CAST(0 AS HUGEINT)
                      ELSE (e - ep) * (e - ep) END)
               AS sdd
      FROM lagd GROUP BY event_type
    )
    SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
           CASE WHEN see > 0 THEN
             round(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE), 9)
           END AS dw
    FROM sums ORDER BY event_type
    """,
)
def durbin_watson_hourly_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the mean-centered hourly value series
    per event type — the standard lag-1 autocorrelation diagnostic
    (DW ~ 2 means no serial correlation, -> 0 strong positive, -> 4
    strong negative): tells a monitoring stack whether the hourly
    residuals CUSUM walks over are independent (Durbin & Watson 1950,
    public literature). Reuses the exact-cent hourly sum monoid
    (``hourly_cents``).

    Exactness: residuals are fraction-cleared (e = H*x - total, the
    CUSUM discipline; the common H scale cancels in the ratio), carried
    in DECIMAL(38,0) since r13 — the int64 form's H*cents product bound
    at ~2.3e4x sf0.1; decimal carries e to ~1e38 and e is internal only,
    so the widening is free (oracle mirrors with HUGEINT). Both
    quadratic sums stay DECIMAL(38,0) (|e| <= ~4.5e10 at testdata shape
    -> products ~2e21, sums ~2e24). The division is one double op, but
    decimal38 -> double casts are conversion-rounded, so the emitted
    ratio takes the PSI round-to-9 rule in both engines rather than
    claiming bit-exact casts.

    Shape at 100 TB: the same ONE (type, hour) shuffle as CUSUM;
    lag + two quadratic sums are calendar-sized window/agg work."""
    return dw_over_hourly_cents(
        hourly_cents(load_table(spark, sf_dir, "events"))
    )


def dw_over_hourly_cents(hourly: DataFrame) -> DataFrame:
    """Durbin-Watson scoring core over a (event_type, hour, cents)
    relation — shared by the batch query and the streaming twin
    (streaming/stats_stage.py::durbin_watson_from_log), which folds the
    SAME hourly-cents log the CUSUM monitor reads."""
    wall = Window.partitionBy("event_type")
    # e = H*x - total in DECIMAL(38,0) (r13 ceiling-band widening): the
    # int64 form bound at ~2.3e4x sf0.1 via the H*cents product; e is
    # internal only (the emitted dw is a rounded double), so the decimal
    # carry is free and the oracle mirrors with HUGEINT.
    dev = hourly.select(
        "event_type",
        "hour",
        F.count("*").over(wall).alias("h"),
        (
            F.count("*").over(wall).cast("decimal(38,0)") * F.col("cents")
            - F.sum(F.col("cents").cast("decimal(38,0)")).over(wall)
        ).alias("e"),
    )
    wlag = Window.partitionBy("event_type").orderBy("hour")
    lagd = dev.select(
        "event_type", "h", "e", F.lag("e").over(wlag).alias("ep")
    )
    d = F.col("e") - F.col("ep")
    sums = lagd.groupBy("event_type").agg(
        F.max("h").alias("n_hours"),
        F.sum(F.col("e") * F.col("e")).alias("see"),
        F.sum(
            F.when(F.col("ep").isNull(), F.lit(0).cast("decimal(38,0)"))
            .otherwise(d * d)
        ).alias("sdd"),
    )
    return sums.select(
        "event_type",
        "n_hours",
        F.when(
            F.col("see") > 0,
            F.round(
                F.col("sdd").cast("double") / F.col("see").cast("double"), 9
            ),
        ).alias("dw"),
    ).orderBy("event_type")


@query(
    "robust_value_stats_per_type",
    oracle="""
    WITH vc AS (
      SELECT event_type, value, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, value, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY value
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM vc
    ), med AS (
      SELECT event_type, min(value) AS median, max(n) AS n
      FROM cum WHERE cum >= (n + 1) // 2 GROUP BY event_type
    ), devc AS (
      SELECT c.event_type, abs(c.value - m.median) AS dev,
             CAST(sum(c.cnt) AS BIGINT) AS cnt
      FROM cum c JOIN med m ON c.event_type = m.event_type
      GROUP BY 1, 2
    ), devcum AS (
      SELECT event_type, dev, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY dev
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM devc
    ), mad AS (
      SELECT event_type, min(dev) AS mad
      FROM devcum WHERE cum >= (n + 1) // 2 GROUP BY event_type
    ), trim AS (
      SELECT event_type,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * greatest(CAST(0 AS BIGINT),
                                 least(cum, n - n // 10)
                                 - greatest(cum - cnt, n // 10)))
                  AS DECIMAL(38,2)) AS tsum,
             CAST(sum(greatest(CAST(0 AS BIGINT),
                               least(cum, n - n // 10)
                               - greatest(cum - cnt, n // 10)))
                  AS BIGINT) AS tcnt
      FROM cum GROUP BY event_type
    )
    SELECT m.event_type, m.n, m.median, mad.mad,
           CAST(t.tsum AS DOUBLE) / t.tcnt AS trimmed_mean_10
    FROM med m
    JOIN mad ON mad.event_type = m.event_type
    JOIN trim t ON t.event_type = m.event_type
    ORDER BY m.event_type
    """,
)
def robust_value_stats_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type value statistics — exact nearest-rank median,
    MAD (median absolute deviation), and the 10%-trimmed mean: the
    outlier-resistant complements of the moment family (mean/stddev
    shift arbitrarily under one corrupt extreme; median/MAD have a 50%
    breakdown point — the standard robust-monitoring trio).

    Everything derives from the (type, value) COUNT RELATION — the KS
    ECDF trick: median = the smallest value whose cumulative count
    reaches ceil(n/2); MAD repeats the selection over |value - median|
    counts (the deviation map just re-collapses the same monoid);
    the trimmed mean keeps, per distinct value, the exact overlap of
    its rank range (cum-cnt, cum] with the kept window (n//10,
    n - n//10] — an integer per row — and sums value*kept as
    DECIMAL(18,2) (event values are exact cents, so the cast is exact
    and the sum order-insensitive), with ONE final double division.
    Every emitted number is either a selected raw value, one abs/sub
    of doubles, or that single division — bit-identical across engines
    with no rounding step.

    Shape at 100 TB: ONE (type, value) partial-agg'd corpus shuffle;
    every window and selection runs over COLLAPSED distinct-value rows
    (bounded by the value domain, not the corpus), so no per-type
    window ever sees corpus-sized input — the trap the global-rank
    percentile query avoids with range partitioning is avoided here by
    collapsing first."""
    ev = load_table(spark, sf_dir, "events")
    vc = ev.groupBy("event_type", "value").agg(F.count("*").alias("cnt"))
    return robust_over_value_counts(vc)


def robust_over_value_counts(vc: DataFrame) -> DataFrame:
    """Robust-stats scoring core over a (event_type, value, cnt) count
    relation — shared by the batch query and the streaming twin
    (streaming/stats_stage.py::robust_stats_from_log, which folds the
    SAME value-count log the KS monitor reads), so drained == batch
    bit-for-bit."""
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = vc.select(
        "event_type",
        "value",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    ).transform(pin)
    med = (
        cum.where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("value").alias("median"), F.max("n").alias("n"))
    )
    devc = (
        cum.join(med.select("event_type", "median"), "event_type")
        .select(
            "event_type",
            F.abs(F.col("value") - F.col("median")).alias("dev"),
            "cnt",
        )
        .groupBy("event_type", "dev")
        .agg(F.sum("cnt").alias("cnt"))
    )
    wdev = (
        Window.partitionBy("event_type")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    devcum = devc.select(
        "event_type",
        "dev",
        F.sum("cnt").over(wdev).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    mad = (
        devcum.where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("dev").alias("mad"))
    )
    lo = F.expr("n div 10")
    hi = F.col("n") - lo
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), hi) - F.greatest(F.col("cum") - F.col("cnt"), lo),
    )
    trim = cum.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)") * kept).alias("tsum"),
        F.sum(kept).alias("tcnt"),
    )
    return (
        med.join(mad, "event_type")
        .join(trim, "event_type")
        .select(
            "event_type",
            "n",
            "median",
            "mad",
            (F.col("tsum").cast("double") / F.col("tcnt")).alias(
                "trimmed_mean_10"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "rolling_7day_active_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           count(DISTINCT daily.user_id) AS active_users_7d
    FROM days JOIN daily ON daily.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    ORDER BY day
    """,
)
def rolling_7day_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day (the canonical
    product-analytics rolling metric). Spark windows can't do exact
    COUNT(DISTINCT) over a RANGE frame, and the naive per-day self-join
    rescans the fact table once per day; the scalable formulation is
    contribution explode: dedup to (user, day) pairs — one shuffle that
    also shrinks the data to its distinct support — then each pair
    contributes to the 7 target days it covers (a narrow 7x explode of
    tiny rows), semi-joined to observed days, and one final distinct-agg
    per day. Nothing corpus-sized is ever rescanned or range-joined."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = daily.select(F.col("d").alias("day")).distinct()
    contrib = daily.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("day"),
    )
    return (
        contrib.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "active_users_7d"
        )
        .orderBy("day")
    )


@query(
    "skew_salted_event_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def skew_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event stats via SALTED two-phase aggregation
    (operators/skew.py): event_type has ~5 distinct values, so at 100 TB
    a direct groupBy lands each type's entire volume on one reducer.
    Phase 1 aggregates on (event_type, hash(event_id) % 16) — 16-way
    parallel per hot key; phase 2 merges 16 tiny partial rows per key.
    The oracle is the plain one-phase GROUP BY: the hash-checked
    equivalence IS the correctness proof that the salted decomposition
    (count/sum-decimal/min/max are algebraic) changes nothing."""
    from ..operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    out = salted_agg(
        ev,
        keys=["event_type"],
        salt_source=F.col("event_id"),
        partial={
            "pn": F.count("*"),
            "psum": F.sum(dec),
            "pmin": F.min("value"),
            "pmax": F.max("value"),
        },
        merge={
            "n": F.sum("pn").cast("long"),
            "sum_value": F.sum("psum").cast("double"),
            "min_value": F.min("pmin"),
            "max_value": F.max("pmax"),
            "avg_value": F.sum("psum").cast("double")
            / F.sum("pn").cast("double"),
        },
        buckets=16,
    )
    return out.orderBy("event_type")


def _pagerank_transitions_oracle(iters: int = 10) -> str:
    """DuckDB replay of ``pagerank_event_transitions``: the fixed
    iteration count unrolls into chained CTEs (r1..rN — no recursive CTE
    needed, and each step may reference its predecessor twice: once for
    the dangling mass, once for the inflow join). Float discipline: edge
    weights stay exact integers-in-doubles; p = w/outw is one IEEE
    division per edge; every iterated reduction is the SAME left fold the
    Spark side runs in deterministic mode — ``list(x ORDER BY key)`` +
    ``list_reduce(.., (a,b) -> a+b)`` mirrors collect_list -> array_sort
    -> F.aggregate, so 10 iterations of non-associative additions land on
    identical bits. Every chained CTE is AS MATERIALIZED: DuckDB inlines
    CTEs by default, and with two references per step the inlined plan
    doubles each level (2^iters blowup — observed as a pegged core on
    the un-hinted version)."""
    base = "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nc)"
    step = """
    r{k} AS MATERIALIZED (
      SELECT nd.node,
             {base}
             + CAST(0.85 AS DOUBLE)
               * (COALESCE(i.inflow, CAST(0.0 AS DOUBLE))
                  + dm.dmass / (SELECT n FROM nc)) AS rank
      FROM nodes nd
      CROSS JOIN (
        SELECT COALESCE(list_reduce(list(r.rank ORDER BY r.node),
                                    (a, b) -> a + b),
                        CAST(0.0 AS DOUBLE)) AS dmass
        FROM r{prev} r ANTI JOIN has_out h ON r.node = h.node
      ) dm
      LEFT JOIN (
        SELECT e.e_dst AS node,
               list_reduce(list(r.rank * e.p ORDER BY e.e_src),
                           (a, b) -> a + b) AS inflow
        FROM r{prev} r JOIN e ON r.node = e.e_src
        GROUP BY e.e_dst
      ) i ON nd.node = i.node
    )"""
    steps = "".join(
        "," + step.format(k=k, prev=k - 1, base=base)
        for k in range(1, iters + 1)
    )
    return f"""
    WITH trans AS (
      SELECT event_type AS src, next_type AS dst, count(*) AS n
      FROM (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
      )
      WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), e0 AS MATERIALIZED (
      SELECT src AS e_src, dst AS e_dst, SUM(CAST(n AS DOUBLE)) AS w
      FROM trans GROUP BY 1, 2
    ), outw AS (
      SELECT e_src, SUM(w) AS outw FROM e0 GROUP BY 1
    ), e AS MATERIALIZED (
      SELECT e0.e_src, e0.e_dst, e0.w / o.outw AS p
      FROM e0 JOIN outw o ON e0.e_src = o.e_src
    ), nodes AS MATERIALIZED (
      SELECT e_src AS node FROM e0 UNION SELECT e_dst FROM e0
    ), nc AS MATERIALIZED (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
    ), has_out AS MATERIALIZED (
      SELECT DISTINCT e_src AS node FROM e0
    ), r0 AS MATERIALIZED (
      SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nc) AS rank
      FROM nodes
    ){steps}
    SELECT node, rank FROM r{iters} ORDER BY rank DESC, node
    """


@query("pagerank_event_transitions", oracle=_pagerank_transitions_oracle())
def pagerank_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (edges = consecutive
    events of one user, weighted by transition count) — the iterative-
    algorithm representative of the corpus, via operators/graph.pagerank
    (10 synchronous power iterations, damping 0.85, dangling mass
    redistributed). Runs in the operator's deterministic mode (ordered
    left folds for every float reduction), which the DuckDB oracle
    replays bit-for-bit as 10 unrolled CTE steps — upgrading this query
    from rows-only to a green hash row (VERDICT r3 item 2). Exactness
    vs a NumPy power iteration is additionally pytest-verified
    (tests/test_pagerank.py)."""
    from ..operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count("*").alias("n"))
    )
    pr = pagerank(trans, src="src", dst="dst", weight="n", iters=10,
                  deterministic=True)
    return pr.orderBy(F.desc("rank"), "node")


@query("event_value_percentiles_approx")  # rows-only: GK sketch is engine-specific
def event_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB scale path for ``event_value_percentiles_exact``:
    ``percentile_approx`` (Greenwald-Khanna sketch, accuracy 10000) is a
    single-pass mergeable aggregate — one map-side sketch per partition,
    one tiny merge, no global rank machinery — with rank error bounded
    by n/accuracy. pytest (tests/test_operators.py) checks the returned
    values sit within that rank bound of the exact nearest-rank answer;
    the sketch internals are engine-specific, so the driver records
    rows-only."""
    ev = load_table(spark, sf_dir, "events")
    one = ev.agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("vals")
    )
    labels = F.array(F.lit("p50"), F.lit("p90"), F.lit("p99"))
    return (
        one.select(
            F.explode(F.arrays_zip(labels.alias("percentile"), F.col("vals").alias("value"))).alias("e")
        )
        .select(F.col("e.percentile").alias("percentile"), F.col("e.value").alias("value"))
        .orderBy("percentile")
    )


@query(
    "zorder_events_row_preservation",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    """,
)
def zorder_events_row_preservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering (operators/layout.py) on (user_id, value) is a
    pure LAYOUT transformation — this query routes the events table
    through the full Morton pipeline (bucketize -> bit-interleave ->
    repartitionByRange on z -> sort-within-partitions) and returns the
    data columns, with the raw table as the oracle: the hash-match
    proves the curve reorders and NEVER drops, duplicates, or mutates a
    row. The clustering quality itself (row-group min/max pruning on
    both dimensions) is measured in tests/test_zorder.py and
    tests/test_compact.py."""
    from ..operators.layout import zorder_by

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return zorder_by(ev, ["user_id", "value"], bits=8)


@query(
    "event_value_histogram",
    oracle="""
    SELECT CAST(floor(value / 50.0) * 50 AS BIGINT) AS bin_lo,
           count(*) AS n,
           CAST(min(value) AS DOUBLE) AS bin_min,
           CAST(max(value) AS DOUBLE) AS bin_max
    FROM events
    GROUP BY 1
    ORDER BY bin_lo
    """,
)
def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (bin width 50, schema-level
    domain — no data-dependent bounds, so the query is scale-factor
    robust). One partial-agg'd shuffle on the bin key; the per-bin
    min/max double as the exactness check that binning assigned every
    row to the right bucket."""
    ev = load_table(spark, sf_dir, "events")
    bin_lo = (F.floor(F.col("value") / 50.0) * 50).cast("long")
    return (
        ev.groupBy(bin_lo.alias("bin_lo"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").cast("double").alias("bin_min"),
            F.max("value").cast("double").alias("bin_max"),
        )
        .orderBy("bin_lo")
    )


@query(
    "profile_orders_columns",
    oracle="""
    WITH one AS (
      SELECT count(*) AS n,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
             count(DISTINCT o_custkey) AS nd_cust,
             sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS null_stat,
             count(DISTINCT o_orderstatus) AS nd_stat,
             sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS null_prio,
             count(DISTINCT o_orderpriority) AS nd_prio
      FROM orders
    )
    SELECT col, n_rows, n_null, n_distinct FROM (
      SELECT 'o_custkey' AS col, CAST(n AS BIGINT) AS n_rows,
             CAST(null_cust AS BIGINT) AS n_null,
             CAST(nd_cust AS BIGINT) AS n_distinct FROM one
      UNION ALL
      SELECT 'o_orderpriority', CAST(n AS BIGINT), CAST(null_prio AS BIGINT),
             CAST(nd_prio AS BIGINT) FROM one
      UNION ALL
      SELECT 'o_orderstatus', CAST(n AS BIGINT), CAST(null_stat AS BIGINT),
             CAST(nd_stat AS BIGINT) FROM one
    )
    ORDER BY col
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling ("describe" for data engineers): row count, null
    count, and exact distinct count for several columns in ONE
    aggregation pass (Spark plans the multi-distinct via a single Expand
    — no per-column rescan), exploded into one report row per column —
    the same one-scan discipline as dq_expectations_lineitem."""
    o = load_table(spark, sf_dir, "orders")
    one = o.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_cust"),
        F.count_distinct("o_custkey").alias("nd_cust"),
        F.sum(F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_stat"),
        F.count_distinct("o_orderstatus").alias("nd_stat"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_prio"),
        F.count_distinct("o_orderpriority").alias("nd_prio"),
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(col).alias("col"),
                F.col(nl).alias("n_null"),
                F.col(nd).alias("n_distinct"),
            )
            for col, nl, nd in (
                ("o_custkey", "null_cust", "nd_cust"),
                ("o_orderpriority", "null_prio", "nd_prio"),
                ("o_orderstatus", "null_stat", "nd_stat"),
            )
        ]
    )
    return (
        one.select(F.col("n"), F.explode(entries).alias("e"))
        .select(
            F.col("e.col").alias("col"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("e.n_null").alias("n_null"),
            F.col("e.n_distinct").alias("n_distinct"),
        )
        .orderBy("col")
    )


@query(
    "corr_value_day_per_type",
    oracle="""
    WITH d0 AS (
      SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0 FROM events
    ), moments AS (
      -- int128 sums/products mirror the Spark side's DECIMAL(38,0):
      -- n*sxx ~ n^2 * cents^2 wraps int64 at ~21x the sf0.1 events
      -- volume (measured 2e16 at sf0.1), far below the 100x bar
      SELECT event_type,
             count(*) AS n,
             sum(CAST(cents AS HUGEINT))         AS sx,
             sum(CAST(day AS HUGEINT))           AS sy,
             sum(CAST(cents AS HUGEINT) * cents) AS sxx,
             sum(CAST(day AS HUGEINT) * day)     AS syy,
             sum(CAST(cents AS HUGEINT) * day)   AS sxy
      FROM (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               CAST(datediff('day', d0,
                             CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT)
                 AS day
        FROM events CROSS JOIN d0
      )
      GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_value_day,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * syy - sy * sy AS DOUBLE) AS slope_cents_per_day,
           sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             / (100.0 * CAST(n AS DOUBLE)) AS stddev_value
    FROM moments
    ORDER BY event_type
    """,
)
def corr_value_day_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate family (corr / regression slope / population
    stddev) per event type, via EXACT integer moments: value goes
    through the corpus-standard DECIMAL(18,2) cast to integer cents, the
    time axis is whole days since the corpus start (one broadcast 1-row
    scalar), and n/sx/sy/sxx/syy/sxy are int64 sums — order-independent
    and partial-agg'd map-side, the same shuffle shape as any groupBy.
    The final corr/slope/stddev are fixed IEEE expressions over those
    exact integers (int64->double conversion is round-to-nearest in both
    engines), so DuckDB reproduces them bit-for-bit — unlike the
    built-in corr()/stddev(), whose streaming float accumulation is
    engine- and order-dependent (the reason this query doesn't use
    them; a plain F.corr is available when parity isn't needed).

    Scale note (widened r12): the n*sxx product is ~n² * cents² — it
    measured 2e16 at sf0.1 and wraps int64 at ~21× that volume, well
    below the brief's 100× bar — so the quadratic moment sums and the
    n*s products run in DECIMAL(38,0) (oracle: HUGEINT), exact to
    ~n ~ 2e13 rows/group. The converted doubles are unchanged: each
    exact integer converts round-to-nearest in both engines."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    day = F.datediff(F.to_date("ts"), F.col("d0")).cast("long")
    base = ev.crossJoin(F.broadcast(d0)).select(
        "event_type", cents.alias("cents"), day.alias("day")
    )
    dec = "decimal(38,0)"
    m = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("sx"),
        F.sum(F.col("day").cast(dec)).alias("sy"),
        F.sum((F.col("cents").cast(dec) * F.col("cents")).cast(dec)).alias(
            "sxx"
        ),
        F.sum((F.col("day").cast(dec) * F.col("day")).cast(dec)).alias(
            "syy"
        ),
        F.sum((F.col("cents").cast(dec) * F.col("day")).cast(dec)).alias(
            "sxy"
        ),
    )
    nn = F.col("n").cast(dec)
    num = (nn * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dxx = (nn * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dyy = (nn * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "event_type",
        "n",
        (num / (F.sqrt(dxx) * F.sqrt(dyy))).alias("corr_value_day"),
        (num / dyy).alias("slope_cents_per_day"),
        (F.sqrt(dxx) / (F.lit(100.0) * F.col("n").cast("double"))).alias(
            "stddev_value"
        ),
    ).orderBy("event_type")


@query(
    "user_event_type_sequences",
    oracle="""
    SELECT user_id,
           array_to_string(list(event_type ORDER BY ts, event_id), '|')
             AS type_seq,
           CAST(len(list(event_type ORDER BY ts, event_id)) AS INTEGER)
             AS seq_len
    FROM events
    WHERE user_id < 100
    GROUP BY user_id
    """,
)
def user_event_type_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type sequences (the behavioral-modeling /
    session-LM preprocessing shape). Deterministic ordered-list
    discipline: collect_list order is undefined under parallel
    aggregation, so the elements are collected as (ts, event_id, type)
    structs and array_sort'd on the unique (ts, event_id) prefix before
    projecting the types — bit-stable across partitionings and engines
    (DuckDB: list(x ORDER BY ...)). One partial-agg'd shuffle; the
    user_id < 100 cut keeps driver-compare rows bounded. The sequence is
    serialized with array_join('|') so the driver's pandas canonicalizer
    (which cannot hash list cells) can compare it against DuckDB's
    array_to_string — the array form stays available to engine callers
    via the same aggregation expression."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 100)
    seq = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ),
        lambda s: s["event_type"],
    )
    return ev.groupBy("user_id").agg(
        F.array_join(seq, "|").alias("type_seq"),
        F.size(seq).alias("seq_len"),
    )


_SCD2_HIST_CTE = """
    ordered AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ), changes AS (
      SELECT user_id, event_type AS state, ts AS valid_from, event_id
      FROM ordered WHERE prev IS NULL OR prev <> event_type
    ), hist AS (
      SELECT user_id, state, valid_from,
             lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id
             ) AS valid_to,
             row_number() OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id
             ) AS version
      FROM changes
    )
"""


def scd2_history(e: DataFrame) -> DataFrame:
    """(user_id, state, valid_from, valid_to, version): the SCD2
    interval build every consumer shares — the history query, the
    temporal-enrichment join, and the boundary tests construct
    intervals from this ONE definition (half-open boundaries, the
    (ts, event_id) total-order tiebreak), so the 'boundaries from the
    same total order' invariant cannot fork. Mirrors _SCD2_HIST_CTE
    expression for expression."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev"),
        )
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


@query(
    "scd2_user_state_history",
    oracle=f"""
    WITH {_SCD2_HIST_CTE}
    SELECT user_id, state, valid_from, valid_to,
           CAST(version AS BIGINT) AS version,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_current
    FROM hist
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event log: collapse
    each user's consecutive identical event_types into versioned validity
    intervals (valid_from, valid_to, is_current) — the standard
    warehouse history-table derivation (Kimball SCD2), as one pass of
    window functions. Deterministic: every window orders on the unique
    (ts, event_id) prefix, so change detection, lead() and row_number()
    are total-order-stable across engines and partitionings.

    Scale shape: both windows partition by user_id — one shuffle on the
    key, then linear per-partition scans; change rows (the second
    window's input) are a collapsed subset. No joins, no driver work.
    The streaming twin of this derivation is ParquetTable.upsert
    (SCD type-1); type-2 needs the full ordered log, hence batch."""
    h = scd2_history(load_table(spark, sf_dir, "events"))
    return h.select(
        "user_id",
        "state",
        "valid_from",
        "valid_to",
        "version",
        F.col("valid_to").isNull().cast("long").alias("is_current"),
    )


@query(
    "forward_fill_event_values",
    oracle="""
    WITH masked AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_type <> 'error' THEN value END AS value_masked
      FROM events
    )
    SELECT user_id, event_id, ts, value_masked,
           last_value(value_masked IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled
    FROM masked
    """,
)
def forward_fill_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation (last-observation-carried-forward): treat
    'error' events' readings as missing and carry each user's most
    recent valid reading forward — the standard time-series gap-repair
    operator. The fill is F.last(ignorenulls=True) over an
    unbounded-preceding row frame on the unique (ts, event_id) order;
    values pass through untouched (no float arithmetic), so results are
    bit-identical across engines. Leading missing rows stay NULL in both.

    Scale shape: one shuffle on user_id, then a linear per-partition
    window scan. No joins, no state beyond the running last value."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    masked = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") != "error", F.col("value")).alias(
            "value_masked"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return masked.withColumn(
        "value_filled", F.last("value_masked", ignorenulls=True).over(w)
    )


@query(
    "hilbert_events_row_preservation",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    """,
)
def hilbert_events_row_preservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering (operators/layout.py, curve="hilbert")
    routed over the events table with the raw table as the identity
    oracle — same contract as ``zorder_events_row_preservation`` for the
    Morton path: the Arrow-batched xy2d rotation recurrence reorders and
    never drops, duplicates, or mutates a row. Curve quality (unit-step
    property, bounding boxes vs Morton) is proven in
    tests/test_zorder.py."""
    from ..operators.layout import zorder_by

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return zorder_by(ev, ["user_id", "value"], bits=8, curve="hilbert")


@query(
    "zscore_event_anomalies",
    oracle="""
    WITH b AS (
      SELECT event_id, event_type, value,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ), m AS (
      -- int128 moments mirror the Spark side's DECIMAL(38,0): n*sxx
      -- and sx*sx wrap int64 at ~21x the sf0.1 events volume
      SELECT event_type, count(*) AS n,
             sum(CAST(cents AS HUGEINT)) AS sx,
             sum(CAST(cents AS HUGEINT) * cents) AS sxx
      FROM b GROUP BY event_type
    )
    SELECT b.event_id, b.event_type, b.value,
           CAST(b.cents * m.n - m.sx AS DOUBLE)
             / sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) AS zscore
    FROM b JOIN m USING (event_type)
    WHERE m.n * m.sxx - m.sx * m.sx > 0
      AND abs(CAST(b.cents * m.n - m.sx AS DOUBLE)
              / sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE))) >= 3.0
    ORDER BY event_id
    """,
)
def zscore_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier detection per event type (|z| >= 3):
    the row-level companion to ``corr_value_day_per_type``'s aggregate
    moments, and the standard first-pass anomaly gate in a feature/DQ
    pipeline.

    Float discipline: z = (x*n - sx) / sqrt(n*sxx - sx^2) — algebra
    keeps everything in exact int64 cents until ONE IEEE division and
    one sqrt, so DuckDB lands on identical bits and the >= 3.0 boundary
    cuts both result sets identically. The naive (x - mean)/stddev form
    would accumulate engine-ordered float error in mean/stddev.

    Shape at 100 TB: the per-type moment relation is 5 rows, so the
    facts are scanned twice but shuffled ZERO times — pass 1 is a
    partial-agg'd groupBy down to 5 rows, pass 2 joins those 5 rows
    back by broadcast, keeping scoring map-side. A window over
    partitionBy(event_type) would instead funnel the whole corpus
    through 5 reducers (the skew worst-case). Moments widened r12: the
    n*sxx and sx² products are ~n² * cents² and wrap int64 at ~21× the
    sf0.1 events volume (below the 100× bar), so they run in
    DECIMAL(38,0) (oracle: HUGEINT), exact to ~2e13 rows/group; the
    per-row numerator cents*n - sx stays int64, which binds only past
    ~1.6e14 rows/group (|cents| <= ~6e4)."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    dec = "decimal(38,0)"
    base = ev.select("event_id", "event_type", "value", cents.alias("cents"))
    m = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("sx"),
        F.sum((F.col("cents").cast(dec) * F.col("cents")).cast(dec)).alias(
            "sxx"
        ),
    )
    # zero-variance types are excluded BEFORE the division: no outliers
    # by definition, and under ANSI mode 0/0 would throw
    var_num = (
        F.col("n").cast(dec) * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    j = base.join(F.broadcast(m), "event_type").where(var_num > 0)
    num = (F.col("cents") * F.col("n") - F.col("sx")).cast("double")
    den = F.sqrt(var_num.cast("double"))
    return (
        j.select(
            "event_id", "event_type", "value", (num / den).alias("zscore")
        )
        .where(F.abs(F.col("zscore")) >= 3.0)
        .orderBy("event_id")
    )


@query(
    "robust_zscore_event_anomalies",
    oracle="""
    WITH b AS (
      SELECT event_id, event_type, value,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ), vc AS (
      SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, cents, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM vc
    ), med AS (
      SELECT event_type, min(cents) AS med
      FROM cum WHERE cum >= (n + 1) // 2 GROUP BY event_type
    ), devc AS (
      SELECT c.event_type, abs(c.cents - m.med) AS dev,
             CAST(sum(c.cnt) AS BIGINT) AS cnt
      FROM cum c JOIN med m ON c.event_type = m.event_type
      GROUP BY 1, 2
    ), devcum AS (
      SELECT event_type, dev, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY dev
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM devc
    ), mad AS (
      SELECT event_type, min(dev) AS mad
      FROM devcum WHERE cum >= (n + 1) // 2 GROUP BY event_type
    )
    SELECT b.event_id, b.event_type, b.value,
           CAST(6745 * (b.cents - m.med) AS DOUBLE)
             / CAST(10000 * d.mad AS DOUBLE) AS modified_z
    FROM b
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE d.mad > 0
      AND 6745 * abs(b.cents - m.med) >= 35000 * d.mad
    ORDER BY event_id
    """,
)
def robust_zscore_event_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MAD-based modified-z outlier detection per event type
    (|0.6745(x - median)/MAD| >= 3.5, Iglewicz & Hoaglin 1993 — public
    literature): the outlier-RESISTANT row-level gate next to
    ``zscore_event_anomalies`` — population mean/stddev are corrupted
    by the very outliers a z-gate hunts (one corrupt extreme shifts
    them arbitrarily), while median/MAD have a 50% breakdown point, so
    this is the gate robust-monitoring practice actually deploys.

    Exactness: values go through the corpus-standard DECIMAL(18,2)
    cents cast, median and MAD are nearest-rank SELECTIONS over the
    collapsed (type, cents) count relation (the robust_value_stats
    ECDF machinery, re-keyed to integer cents), so the threshold
    compare is PURE INT64 — 6745*|cents - med| >= 35000*mad clears the
    0.6745/3.5 constants of fractions entirely (headroom: |dev| <=
    ~1.2e7 cents before the 6745 product nears int64 — five orders
    above the value domain), and both engines cut the identical row
    set with zero float boundary risk. The reported modified_z is ONE
    IEEE division of exact int64 products. Types with MAD = 0 (a
    majority-constant value) are excluded before the division — same
    convention as the zscore query's zero-variance guard.

    Shape at 100 TB: ONE (type, cents) partial-agg'd corpus shuffle
    collapses events; selections run over distinct-cents rows; the
    5-row (type, med, mad) relation broadcasts back onto a second
    map-side scan — the zscore two-pass shape, never a corpus-sized
    window."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    b = ev.select(
        "event_id", "event_type", "value", cents.alias("cents")
    )
    vc = b.groupBy("event_type", "cents").agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = vc.select(
        "event_type",
        "cents",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    med = (
        cum.where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("cents").alias("med"))
    )
    devc = (
        cum.join(med, "event_type")
        .select(
            "event_type",
            F.abs(F.col("cents") - F.col("med")).alias("dev"),
            "cnt",
        )
        .groupBy("event_type", "dev")
        .agg(F.sum("cnt").alias("cnt"))
    )
    wdev = (
        Window.partitionBy("event_type")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    devcum = devc.select(
        "event_type",
        "dev",
        F.sum("cnt").over(wdev).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    mad = (
        devcum.where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("dev").alias("mad"))
    )
    dims = med.join(mad, "event_type").where(F.col("mad") > 0)
    j = b.join(F.broadcast(dims), "event_type")
    dev = F.col("cents") - F.col("med")
    return (
        j.where(F.abs(dev) * 6745 >= F.col("mad") * 35000)
        .select(
            "event_id",
            "event_type",
            "value",
            (
                (dev * 6745).cast("double")
                / (F.col("mad") * 10000).cast("double")
            ).alias("modified_z"),
        )
        .orderBy("event_id")
    )


@query(
    "ewma_event_value_per_user",
    oracle="""
    WITH seq AS (
      SELECT user_id, count(*) AS n_events,
             list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           list_reduce(vals,
                       (a, b) -> CAST(0.5 AS DOUBLE) * b
                                 + CAST(0.5 AS DOUBLE) * a) AS ewma_value,
           vals[len(vals)] AS last_value
    FROM seq ORDER BY user_id
    """,
)
def ewma_event_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event values
    (alpha = 0.5, s_0 = x_0, s_i = a*x_i + (1-a)*s_{i-1}) — the standard
    time-series smoothing / recency feature in a training-data pipeline.

    EWMA is a non-associative left fold, so it cannot be a partial-agg'd
    built-in; the distributed shape is ONE groupBy(user) shuffle
    carrying only (ts, event_id, value) structs, then sort_array +
    F.aggregate fold entirely inside the JVM — per-user state never
    leaves its executor and no per-row Python runs. The same
    sorted-fold discipline as deterministic PageRank makes it
    hash-matchable: DuckDB's list(... ORDER BY ts, event_id) +
    list_reduce replays the identical operand order, and 0.5 scaling is
    a power of two, so every intermediate is bit-exact in both engines.

    Scale caveat (documented, inherent): the per-user array is bounded
    by that user's event count. For unbounded streams use the
    watermarked incremental moments stage (streaming/moments.py) or
    cap the window (e.g. slice to the trailing N events) — the fold
    shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("seq"),
    )
    vals = F.transform("seq", lambda s: s["value"])
    half = F.lit(0.5)
    ewma = F.aggregate(
        F.slice(vals, F.lit(2), F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: half * x + half * acc,
    )
    return seq.select(
        "user_id",
        "n_events",
        ewma.alias("ewma_value"),
        F.element_at(F.col("seq"), -1)["value"].alias("last_value"),
    ).orderBy("user_id")


@query(
    "brand_basket_affinity",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), tot AS (
      SELECT count(DISTINCT ok) AS total_orders FROM ob
    ), marg AS (
      SELECT brand, count(*) AS n_orders FROM ob GROUP BY brand
    ), pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS pair_orders
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT p.brand_a, p.brand_b, p.pair_orders,
           CAST(p.pair_orders AS DOUBLE) / t.total_orders AS support,
           CAST(p.pair_orders * t.total_orders AS DOUBLE)
             / CAST(ma.n_orders * mb.n_orders AS DOUBLE) AS lift
    FROM pairs p
    JOIN marg ma ON p.brand_a = ma.brand
    JOIN marg mb ON p.brand_b = mb.brand
    CROSS JOIN tot t
    ORDER BY pair_orders DESC, brand_a, brand_b
    """,
)
def brand_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: for every pair of part brands,
    how many orders contain both (support) and how much more often than
    independence predicts (lift) — the pairwise-co-occurrence core of
    frequent-itemset mining (the A-priori candidate-pair step).

    Shape at 100 TB: lineitem collapses FIRST to one row per order — a
    sorted brand-set via a partial-agg'd collect_set (the itemset
    relation, <= ~25 brands per basket) — so the ONLY corpus-sized
    shuffle is that single groupBy(order). Each basket then emits, with
    pure JVM array arithmetic (no self-join — a naive alias self-join on
    the order key planned 10 exchanges + a sort-merge join here):
    (a) its pairwise combinations via nested transforms, quadratic only
    per basket, (b) one singleton marker per member brand, and (c) one
    basket marker — so pair counts, per-brand marginals, AND the order
    total all come out of a SINGLE aggregation over <= C(25,2)+25+1 keys
    (one exchange of tiny rows; Spark does not reuse exchanges under
    collect_set subtrees, so separate branch plans would re-shuffle the
    corpus three times). That <= 326-row result is localCheckpoint'ed
    (eager, the pipeline.py discipline) and split three ways without
    recompute. The brand dimension itself (part) broadcasts into the
    initial map-side join. Baskets here are naturally bounded (TPC-H
    orders have <= 7 lines); for heavy-tailed baskets the standard
    mitigation is a per-basket item cap (slice after sort_array), which
    bounds the quadratic term per row.

    Exactness: support and lift are single IEEE divisions over exact
    int64 counts (pair*total and n_a*n_b products stay integer), so
    DuckDB hash-matches bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey")).select(
        F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand")
    )
    # collect_set dedups within the basket; sort_array gives the total
    # order that makes (earlier, later) pairs well-defined
    sets = ob.groupBy("ok").agg(
        F.sort_array(F.collect_set("brand")).alias("brands")
    )
    null_s = F.lit(None).cast("string")
    # (a) pairwise combinations: element i with every later element
    pair_arr = F.flatten(
        F.transform(
            F.col("brands"),
            lambda x, i: F.transform(
                F.slice(F.col("brands"), i + 2, F.size(F.col("brands"))),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    # (b) singleton markers (brand, NULL) and (c) one basket marker
    # (NULL, NULL) — all three families share one struct type so a
    # single explode + aggregation counts them together
    single_arr = F.transform(
        F.col("brands"),
        lambda x: F.struct(x.alias("brand_a"), null_s.alias("brand_b")),
    )
    basket_arr = F.array(
        F.struct(null_s.alias("brand_a"), null_s.alias("brand_b"))
    )
    counts = (
        sets.select(
            F.explode(F.concat(pair_arr, single_arr, basket_arr)).alias("p")
        )
        .groupBy("p.brand_a", "p.brand_b")
        .agg(F.count("*").alias("cnt"))
        .transform(pin)
    )
    pairs = counts.where(
        F.col("brand_a").isNotNull() & F.col("brand_b").isNotNull()
    ).select("brand_a", "brand_b", F.col("cnt").alias("pair_orders"))
    marg = counts.where(
        F.col("brand_a").isNotNull() & F.col("brand_b").isNull()
    ).select(F.col("brand_a").alias("brand"), F.col("cnt").alias("n_orders"))
    tot = counts.where(F.col("brand_a").isNull()).select(
        F.col("cnt").alias("total_orders")
    )
    ma = marg.select(F.col("brand").alias("brand_a"), F.col("n_orders").alias("n_a"))
    mb = marg.select(F.col("brand").alias("brand_b"), F.col("n_orders").alias("n_b"))
    res = (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(tot))
    )
    support = F.col("pair_orders").cast("double") / F.col("total_orders")
    lift = (F.col("pair_orders") * F.col("total_orders")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    ).cast("double")
    return res.select(
        "brand_a",
        "brand_b",
        "pair_orders",
        support.alias("support"),
        lift.alias("lift"),
    ).orderBy(F.desc("pair_orders"), "brand_a", "brand_b")


@query(
    "chi2_value_drift_per_type",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(floor(value / 50.0) * 50 AS BIGINT) AS bin_lo
      FROM events
    ), obs AS (
      SELECT event_type, bin_lo, count(*) AS o FROM b GROUP BY 1, 2
    ), bt AS (
      SELECT bin_lo, CAST(sum(o) AS BIGINT) AS bt FROM obs GROUP BY 1
    ), tt AS (
      SELECT event_type, CAST(sum(o) AS BIGINT) AS tt FROM obs GROUP BY 1
    ), g AS (
      SELECT CAST(sum(o) AS BIGINT) AS g FROM obs
    ), grid AS (
      SELECT t.event_type, bn.bin_lo, t.tt, bn.bt,
             COALESCE(o.o, 0) AS o
      FROM tt t CROSS JOIN bt bn
      LEFT JOIN obs o ON o.event_type = t.event_type AND o.bin_lo = bn.bin_lo
    ), terms AS (
      SELECT event_type, bin_lo, tt,
             num * num / CAST(CAST(bt AS HUGEINT) * tt AS DOUBLE)
                       / CAST(g AS DOUBLE) AS term
      FROM (
        SELECT grid.*, g.g,
               CAST(CAST(o AS HUGEINT) * g.g
                    - CAST(bt AS HUGEINT) * tt AS DOUBLE) AS num
        FROM grid CROSS JOIN g
      )
    )
    SELECT event_type, tt AS n_events,
           COALESCE(list_reduce(list(term ORDER BY bin_lo),
                                (a, x) -> a + x), CAST(0.0 AS DOUBLE))
             AS chi2,
           count(*) AS n_bins
    FROM terms
    GROUP BY event_type, tt
    ORDER BY event_type
    """,
)
def chi2_value_drift_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity test of each event type's value
    distribution against the corpus — the standard drift/segmentation
    check in a data-quality pipeline (is this slice's distribution the
    same as everyone else's?), over the same schema-level 50-unit bins
    as ``event_value_histogram``.

    Shape at 100 TB: ONE corpus shuffle (the partial-agg'd
    (type, bin) contingency groupBy, <= types x bins rows), then the
    tiny contingency table is localCheckpoint'ed and every derived
    relation — bin totals, type totals, grand total, the dense grid
    with zero cells restored (chi-square needs empty cells' expected
    mass) — is arithmetic over <= 50 rows with broadcasts.

    Float discipline: each cell's term is
    (o*g - bt*tt)^2 / (bt*tt) / g with the numerator difference formed
    EXACTLY in int64 (magnitudes < 2^53, so the double conversion is
    exact), then three IEEE ops in fixed order; the per-type sum of
    terms is non-associative, so it runs as the corpus-standard sorted
    fold (sort_array + F.aggregate from +0.0) that DuckDB replays via
    list ORDER BY + list_reduce — bit-identical. The o*g / bt*tt
    products are DECIMAL(38,0) since r13 (they bound int64 at ~3e9
    corpus rows ~ 3e4x sf0.1): exact to g ~ 1e19, far past any
    conceivable row count, with the oracle mirroring in HUGEINT.

    The scoring core lives in ``chi2_over_contingency`` so the
    streaming drift monitor (streaming/drift.py) finalizes its
    accumulated contingency log through the EXACT same expressions —
    drained streaming == this query bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    binc = (F.floor(F.col("value") / 50.0) * 50).cast("long")
    obs = (
        ev.select(F.col("event_type").alias("key"), binc.alias("bin_lo"))
        .groupBy("key", "bin_lo")
        .agg(F.count("*").alias("o"))
        .transform(pin)
    )
    return chi2_over_contingency(obs).select(
        F.col("key").alias("event_type"), "n_events", "chi2", "n_bins"
    ).orderBy("event_type")


def chi2_over_contingency(obs: DataFrame) -> DataFrame:
    """Chi-square homogeneity scores from a (key, bin_lo, o) contingency
    relation — the shared exact-arithmetic core of the batch query above
    and the streaming drift monitor's finalize. ``obs`` must already be
    materialized (checkpointed or read from a table): every derived
    relation below branches from it, and an unmaterialized corpus plan
    would recompute per branch. Returns (key, n_events, chi2, n_bins),
    unordered — callers order."""
    bt = obs.groupBy("bin_lo").agg(F.sum("o").alias("bt"))
    tt = obs.groupBy("key").agg(F.sum("o").alias("tt"))
    g = obs.agg(F.sum("o").alias("g"))
    grid = (
        tt.crossJoin(F.broadcast(bt))
        .join(obs, ["key", "bin_lo"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(g))
    )
    # o*g and bt*tt are <= g² (g = corpus rows): the int64 products bound
    # at ~3e4x sf0.1 (g ~ 3e9). r13 ceiling-band widening computes both
    # in DECIMAL(38,0) — internal only (term is double), so the decimal
    # carry is free; consumer oracles mirror with HUGEINT. The
    # decimal->double conversion rounds to the same double as the old
    # int64->double for every value both forms can represent.
    num = (
        F.col("o").cast("decimal(38,0)") * F.col("g")
        - F.col("bt").cast("decimal(38,0)") * F.col("tt")
    ).cast("double")
    term = (
        num * num
        / (F.col("bt").cast("decimal(38,0)") * F.col("tt")).cast("double")
        / F.col("g").cast("double")
    )
    terms = grid.select("key", "bin_lo", "tt", term.alias("term"))
    return (
        terms.groupBy("key", "tt")
        .agg(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("bin_lo", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("chi2"),
            F.count("*").alias("n_bins"),
        )
        .select("key", F.col("tt").alias("n_events"), "chi2", "n_bins")
    )


@query(
    "range_frame_trailing_stats",
    oracle="""
    SELECT event_id, user_id,
           CAST(coalesce(sum(cents) OVER w, 0) AS BIGINT)
             AS trailing_sum_cents,
           CAST(count(*) OVER w AS BIGINT) AS trailing_n
    FROM (
      SELECT event_id, user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    )
    WINDOW w AS (
      PARTITION BY user_id ORDER BY us
      RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING
    )
    """,
)
def range_frame_trailing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour per-user statistics via a true RANGE window frame
    (value-based bounds, not row counts) — the velocity-check /
    rate-limiting shape (\"how much did this user do in the hour before
    this event\"), and a physical pattern none of the other windows
    exercise: the frame is [ts-1h, ts) in MICROSECOND integer arithmetic,
    with the -1 upper bound excluding the current row AND its exact-ts
    peers identically in both engines (peer inclusion is where RANGE
    frame dialects usually disagree). Money sums use the corpus-standard
    DECIMAL(18,2)->int64 cents, so the sliding sum is exact integer math
    — no float-accumulator order sensitivity.

    Scale shape: ONE user_id exchange + per-user sort; the sliding frame
    is a two-pointer pass over each partition (Spark's window RANGE
    implementation), never a per-row re-scan — O(n) per user after the
    sort."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = e.select(
        "event_id", "user_id", cents.alias("cents"), us.alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, -1)
    )
    return base.select(
        "event_id",
        "user_id",
        F.coalesce(F.sum("cents").over(w), F.lit(0)).cast("long").alias(
            "trailing_sum_cents"
        ),
        F.count("*").over(w).cast("long").alias("trailing_n"),
    )


@query(
    "gapfill_hourly_event_series",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS h0,
             date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS h1
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour,
             et.event_type
      FROM bounds, (SELECT DISTINCT event_type FROM events) AS et
    ), agg AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS sum_cents
      FROM events GROUP BY 1, 2
    )
    SELECT spine.event_type, spine.hour,
           CAST(coalesce(agg.n_events, 0) AS BIGINT) AS n_events,
           CAST(coalesce(agg.sum_cents, 0) AS BIGINT) AS sum_cents
    FROM spine LEFT JOIN agg USING (event_type, hour)
    """,
)
def gapfill_hourly_event_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample to a GAP-FILLED hourly series per event type — the
    time-series resampling shape (dashboards, rate alerting, feature
    windows) that a bare groupBy can't produce: hours with no events must
    exist as explicit zero rows, or downstream window math silently
    skips them. The calendar spine is generated, not scanned: a 1-row
    min/max aggregate -> F.sequence(h0, h1, 1 hour) exploded ->
    cross-joined with the (tiny) distinct type relation, then the hourly
    aggregate LEFT-joins onto it.

    Scale shape: the corpus is touched twice, both as partial-agg'd
    one-pass aggregates (bounds; hourly rollup); the spine is
    hours x types rows — calendar-sized, independent of corpus row
    count — so the gap-fill join is a join of two SMALL relations (AQE
    broadcasts the smaller). Money sums are exact int64 cents."""
    e = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    bounds = e.agg(
        F.date_trunc("hour", F.min(ts)).alias("h0"),
        F.date_trunc("hour", F.max(ts)).alias("h1"),
    )
    types = e.select("event_type").distinct()
    spine = (
        bounds.select(
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hour")
        )
        .crossJoin(types)
    )
    agg = (
        e.select("event_type", F.date_trunc("hour", ts).alias("hour"), cents.alias("cents"))
        .groupBy("event_type", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )
    return spine.join(agg, ["event_type", "hour"], "left").select(
        "event_type",
        F.col("hour").cast("timestamp_ntz").alias("hour"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sum_cents", F.lit(0)).cast("long").alias("sum_cents"),
    )


COPURCHASE_K = 10  # mutual-KNN graph degree bound


def copurchase_mutual_knn_edges(li: DataFrame) -> DataFrame:
    """The mutual top-K co-purchase edge list (a < b) shared by the
    triangle/clustering query and the k-core decomposition: each part
    keeps its K strongest partners (co-order count desc, partner id asc
    — a total order) and an edge survives only if BOTH endpoints
    selected each other, so degree is provably <= COPURCHASE_K at any
    corpus size."""
    a, b = li.alias("a"), li.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("n_orders"))
    )
    # r13 (guide §2.1, evaluate once): both orientations via ONE
    # map-side explode of the aggregated pair relation — the previous
    # self-union evaluated the lineitem self-join + pair aggregate
    # subplan twice
    directed = pair_counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("src"), F.col("pb").alias("dst")
                ),
                F.struct(
                    F.col("pb").alias("src"), F.col("pa").alias("dst")
                ),
            )
        ).alias("e"),
        "n_orders",
    ).select("e.src", "e.dst", "n_orders")
    w = Window.partitionBy("src").orderBy(F.desc("n_orders"), F.asc("dst"))
    sel = (
        directed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= COPURCHASE_K)
        .select("src", "dst")
    )
    # r13: mutuality as a partial-agg'd count over the UNORDERED pair —
    # (src, dst) is unique in sel (one rank row per direction), so a
    # pair appears exactly twice iff BOTH endpoints selected each
    # other. Replaces the sel-with-itself shuffle join (which also
    # evaluated the window chain twice) with one exchange.
    return (
        sel.groupBy(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") == 2)
        .select("a", "b")
    )


@query(
    "copurchase_graph_triangles",
    oracle=f"""
    WITH pair_counts AS (
      SELECT least(a.l_partkey, b.l_partkey) AS pa,
             greatest(a.l_partkey, b.l_partkey) AS pb,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), directed AS (
      SELECT pa AS src, pb AS dst, n_orders FROM pair_counts
      UNION ALL
      SELECT pb AS src, pa AS dst, n_orders FROM pair_counts
    ), ranked AS (
      SELECT src, dst,
             row_number() OVER (
               PARTITION BY src ORDER BY n_orders DESC, dst ASC) AS rn
      FROM directed
    ), sel AS (
      SELECT src, dst FROM ranked WHERE rn <= {COPURCHASE_K}
    ), edges AS (
      SELECT s1.src AS a, s1.dst AS b
      FROM sel s1 JOIN sel s2 ON s1.src = s2.dst AND s1.dst = s2.src
      WHERE s1.src < s1.dst
    ), tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ), tri_nodes AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY node
    ), tcount AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM tri_nodes GROUP BY node
    )
    SELECT deg.node AS l_partkey, deg.degree,
           CAST(coalesce(tcount.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.degree >= 2
                THEN 2.0 * CAST(coalesce(tcount.n_triangles, 0) AS DOUBLE)
                     / (CAST(deg.degree AS DOUBLE) * (deg.degree - 1))
                ELSE 0.0 END AS clustering
    FROM deg LEFT JOIN tcount ON deg.node = tcount.node
    ORDER BY l_partkey
    """,
)
def copurchase_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle count + local clustering coefficient on the
    MUTUAL top-K co-purchase graph — the recommender/market-structure
    analysis (parts whose co-purchase neighborhoods are cliques form
    product bundles). The graph definition is the standard mutual-KNN
    sparsification: each part keeps its K strongest partners (co-order
    count desc, partner id asc — a total order), and an edge survives
    only if BOTH endpoints selected each other, so node degree is
    provably <= K no matter how dense raw co-occurrence gets (a fixed
    part dimension under 100x more orders saturates toward a complete
    graph — the raw pair graph is NOT countable at scale, the mutual-KNN
    graph always is: wedge work is bounded by n*K^2).

    Plan shape: the self-join on l_orderkey groups order-sized row sets;
    pair counts collapse in ONE partial-agg'd shuffle; per-src windows
    run over <= n_parts collapsed rows; triangle enumeration is two
    equi-joins on the degree-bounded edge list with the a < b < c
    orientation so each triangle is produced exactly once."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # consumed by 2 triangle joins + the degree agg
    edges = pin(copurchase_mutual_knn_edges(li))
    tri = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e2.a") == F.col("e1.b"))
        .join(
            edges.alias("e3"),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    # r13 (guide §2.1, evaluate once): corner explode instead of the
    # three-leg self-union — the union evaluated the whole two-join
    # triangle enumeration subplan three times (the pinned edge scan is
    # cheap; the wedge joins are not). Same multiset of corner rows.
    tri_nodes = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    deg = (
        edges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    tcount = tri_nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))
    clustering = F.when(
        F.col("degree") >= 2,
        F.lit(2.0)
        * F.col("n_triangles").cast("double")
        / (F.col("degree").cast("double") * (F.col("degree") - 1)),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tcount, "node", "left")
        .na.fill({"n_triangles": 0})
        .select(
            F.col("node").alias("l_partkey"),
            "degree",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            clustering.alias("clustering"),
        )
        .orderBy("l_partkey")
    )


@query(
    "rfm_customer_scores",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                            (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
               AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY recency_days ASC,  o_custkey) AS rr,
             row_number() OVER (ORDER BY n_orders DESC,      o_custkey) AS fr,
             row_number() OVER (ORDER BY monetary_cents DESC, o_custkey) AS mr,
             count(*) OVER () AS n
      FROM base
    )
    SELECT o_custkey, recency_days, n_orders, monetary_cents,
           CAST(5 - (5 * (rr - 1)) // n AS BIGINT) AS r_score,
           CAST(5 - (5 * (fr - 1)) // n AS BIGINT) AS f_score,
           CAST(5 - (5 * (mr - 1)) // n AS BIGINT) AS m_score,
           CAST((5 - (5 * (rr - 1)) // n) * 100
              + (5 - (5 * (fr - 1)) // n) * 10
              + (5 - (5 * (mr - 1)) // n) AS BIGINT) AS rfm
    FROM ranked
    """,
)
def rfm_customer_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintile scores,
    5 = best) — the classic warehouse customer-value rollup. Quintiles
    are EXACT-INTEGER rank arithmetic (score = 5 - (5*(rank-1)) div n),
    not percentile interpolation, with (metric, custkey) total orders —
    so both engines assign identical scores including at quintile
    boundaries.

    Scale shape: orders collapse to one row per customer in ONE
    partial-agg'd shuffle; the reference date is a 1-row broadcast; all
    THREE global ranks ride ONE range-partitioned global_row_number
    pass (TeraSort shape — NO single-partition window) over a
    metric-tagged union of the customer-sized aggregate: with the
    metric id as the leading sort key, each metric's block is
    contiguous in the global order, so its per-metric rank is exactly
    ``global_rank - metric_id * n`` (r13, guide §2.1: one sampled
    range exchange + one offsets round instead of three)."""
    from ..operators.ranking import global_row_number

    o = load_table(spark, sf_dir, "orders")
    ref = o.agg(F.max(F.to_date("o_orderdate")).alias("ref_date"))
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_date"),
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff("ref_date", "last_date").cast("long").alias(
                "recency_days"
            ),
            "n_orders",
            "monetary_cents",
        )
        .transform(pin)  # three rank passes + the final join read it
    )
    n = base.count()

    # one tagged union, one global rank: descending metrics rank via
    # negated columns (global_row_number sorts ascending); custkey
    # breaks every tie. Each metric's rows are contiguous in the
    # (_m, _k, o_custkey) total order, so the per-metric rank is the
    # global rank minus the block offset _m * n — EXACT int arithmetic,
    # identical ranks (hence scores) to three separate passes.
    tagged = (
        base.select(
            "o_custkey",
            F.lit(0).alias("_m"),
            F.col("recency_days").alias("_k"),
        )
        .unionByName(
            base.select(
                "o_custkey",
                F.lit(1).alias("_m"),
                (-F.col("n_orders")).alias("_k"),
            )
        )
        .unionByName(
            base.select(
                "o_custkey",
                F.lit(2).alias("_m"),
                (-F.col("monetary_cents")).alias("_k"),
            )
        )
    )
    ranked = global_row_number(tagged, ["_m", "_k", "o_custkey"], "_grk")
    scores = (
        ranked.select(
            "o_custkey",
            "_m",
            F.expr(f"5 - (5 * ((_grk - _m * {n}) - 1)) div {n}").alias("_s"),
        )
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("_m") == 0, F.col("_s"))).alias("r_score"),
            F.max(F.when(F.col("_m") == 1, F.col("_s"))).alias("f_score"),
            F.max(F.when(F.col("_m") == 2, F.col("_s"))).alias("m_score"),
        )
    )
    return (
        base.select("o_custkey", "recency_days", "n_orders", "monetary_cents")
        .join(scores, "o_custkey")
        .select(
            "o_custkey",
            "recency_days",
            "n_orders",
            "monetary_cents",
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            ).cast("long").alias("rfm"),
        )
    )


# --------------------------------------------- forecast backtesting

BACKTEST_TEST_DAYS = 7


@query(
    "seasonal_naive_backtest",
    oracle=f"""
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(hour(ts) AS INTEGER) AS hr,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    b AS (SELECT max(d) AS dmax FROM e),
    tr AS (
      SELECT e.* FROM e, b WHERE e.d <= b.dmax - {BACKTEST_TEST_DAYS}
    ),
    te AS (
      SELECT e.* FROM e, b WHERE e.d > b.dmax - {BACKTEST_TEST_DAYS}
    ),
    prof AS (
      SELECT event_type, hr, CAST(sum(cents) AS BIGINT) AS s,
             count(*) AS m
      FROM tr GROUP BY event_type, hr
    ),
    gm AS (
      SELECT event_type, CAST(sum(cents) AS BIGINT) AS t, count(*) AS mg
      FROM tr GROUP BY event_type
    ),
    scored AS (
      SELECT te.event_type, te.hr, prof.s, prof.m, gm.t, gm.mg,
             abs(te.cents * prof.m - prof.s) AS e1,
             abs(te.cents * gm.mg - gm.t) AS e2
      FROM te
      JOIN prof ON te.event_type = prof.event_type AND te.hr = prof.hr
      JOIN gm ON te.event_type = gm.event_type
    )
    SELECT event_type, hr,
           min(m) AS n_train,
           count(*) AS n_test,
           CAST(min(s) AS DOUBLE) / min(m) AS forecast_cents,
           CAST(sum(e1) AS DOUBLE) / (min(m) * count(*)) AS mae_seasonal,
           CAST(sum(e2) AS DOUBLE) / (min(mg) * count(*)) AS mae_global
    FROM scored GROUP BY event_type, hr
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting as a query: hold out the last
    BACKTEST_TEST_DAYS (=7) days, forecast each (event_type, hour-of-day)
    cell with its training-period seasonal mean, and score MAE against
    the held-out events — next to the per-type GLOBAL-mean baseline, so
    the seasonal profile's skill is visible per cell. The whole
    computation stays in exact int64 cents until ONE IEEE division per
    output column per cell (|a*m - S| = m*|a - S/m| scaled — the
    corr/DSIR integer-moment discipline), so every double is
    hash-checkable.

    Shape: two training partial-aggs (cells- and types-sized), the test
    scan joins both tiny relations (broadcast), one cell-keyed rollup.
    Nothing corpus-quadratic; no double is ever summed across rows
    (float addition order would be nondeterministic) — sums are integer,
    divisions are last."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.hour("ts").cast("int").alias("hr"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    bounds = ev.agg(F.max("d").alias("dmax"))
    e = ev.crossJoin(F.broadcast(bounds))
    tr = e.where(F.col("d") <= F.date_sub("dmax", BACKTEST_TEST_DAYS))
    te = e.where(F.col("d") > F.date_sub("dmax", BACKTEST_TEST_DAYS))
    prof = tr.groupBy("event_type", "hr").agg(
        F.sum("cents").alias("s"), F.count("*").alias("m")
    )
    glob = tr.groupBy("event_type").agg(
        F.sum("cents").alias("t"), F.count("*").alias("mg")
    )
    scored = (
        te.join(prof, ["event_type", "hr"])
        .join(glob, "event_type")
        .select(
            "event_type",
            "hr",
            "s",
            "m",
            "t",
            "mg",
            F.abs(F.col("cents") * F.col("m") - F.col("s")).alias("e1"),
            F.abs(F.col("cents") * F.col("mg") - F.col("t")).alias("e2"),
        )
    )
    return scored.groupBy("event_type", "hr").agg(
        F.min("m").alias("n_train"),
        F.count("*").alias("n_test"),
        (F.min("s").cast("double") / F.min("m")).alias("forecast_cents"),
        (F.sum("e1").cast("double") / (F.min("m") * F.count("*"))).alias(
            "mae_seasonal"
        ),
        (F.sum("e2").cast("double") / (F.min("mg") * F.count("*"))).alias(
            "mae_global"
        ),
    )


@query(
    "cdc_net_aggregate_view",
    # Oracle computes the view DIRECTLY over surviving rows; the Spark
    # side computes it through the counting-IVM multiplicity relation
    # (streaming/ivm.py's fold semantics) — hash-equality proves the
    # multiplicity path is exactly the direct path.
    oracle="""
    WITH survive AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_id % 13 <> 0
    )
    SELECT event_type,
           count(*) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           min(cents) AS min_cents,
           max(cents) AS max_cents,
           CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / count(*) AS avg_cents
    FROM survive GROUP BY event_type
    """,
)
def cdc_net_aggregate_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch anchor for the counting-IVM semantics (streaming/ivm.py):
    a deterministic CDC log is derived from events (every row an
    insert; rows with event_id % 13 == 0 also emit a matching delete),
    and the grouped view — count/sum/min/max/avg — is computed through
    the (key, value, net-multiplicity) relation exactly as the
    streaming fold does. The oracle computes the same view DIRECTLY
    over surviving rows, so the driver hash proves
    multiplicity-path == direct-path, deletes included (min/max
    restoration is the non-invertible part naive +/- maintenance gets
    wrong)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    inserts = ev.select(
        "event_type", "cents", F.lit(1).cast("long").alias("s")
    )
    deletes = ev.where(F.col("event_id") % 13 == 0).select(
        "event_type", "cents", F.lit(-1).cast("long").alias("s")
    )
    mult = (
        inserts.unionByName(deletes)
        .groupBy("event_type", "cents")
        .agg(F.sum("s").alias("net"))
        .where(F.col("net") > 0)
    )
    agg = mult.groupBy("event_type").agg(
        F.sum("net").alias("n_rows"),
        F.sum(F.col("net") * F.col("cents")).alias("sum_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )
    return agg.select(
        "event_type",
        "n_rows",
        "sum_cents",
        "min_cents",
        "max_cents",
        (F.col("sum_cents").cast("double") / F.col("n_rows")).alias(
            "avg_cents"
        ),
    )


HIST_BIN_CENTS = 500  # $5-wide bins; ~100 bins over this corpus's range


def hist_hourly_bins(ev: DataFrame) -> DataFrame:
    """(day, hour, bin, cnt): the persisted mergeable summary — one
    partial-agg exchange collapses raw events to <=24h x ~100 bins per
    day. Shared by the batch query and the streaming per-batch partial
    (streaming/histogram_stage.py), so the two can never bin
    differently."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return (
        ev.select(
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("hour"),
            F.call_function("div", cents, F.lit(HIST_BIN_CENTS)).alias("bin"),
        )
        .groupBy("day", "hour", "bin")
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantile_report(bins: DataFrame) -> DataFrame:
    """(day, total_events, p50/p90/p99_lo_cents) from any relation of
    (day, bin, cnt) rows (duplicates per (day,bin) allowed — they merge
    by sum). Bin selection is integer cross-multiplication; no float
    ever picks a bin. Shared batch/streaming report core."""
    daily = bins.groupBy("day", "bin").agg(F.sum("cnt").alias("cnt"))
    w_cum = Window.partitionBy("day").orderBy("bin")
    w_all = Window.partitionBy("day")
    cum = daily.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_all)
    )

    def q_bin(num: int, den: int) -> F.Column:
        return F.min(
            F.when(F.col("cum") * den >= F.col("total") * num, F.col("bin"))
        )

    return cum.groupBy("day").agg(
        F.max("total").alias("total_events"),
        (q_bin(1, 2) * HIST_BIN_CENTS).cast("long").alias("p50_lo_cents"),
        (q_bin(9, 10) * HIST_BIN_CENTS).cast("long").alias("p90_lo_cents"),
        (q_bin(99, 100) * HIST_BIN_CENTS).cast("long").alias("p99_lo_cents"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "total_events",
        "p50_lo_cents",
        "p90_lo_cents",
        "p99_lo_cents",
    )


@query(
    "histogram_quantile_rollup",
    oracle=f"""
    WITH hourly AS (
      -- the persisted mergeable summary: per (day, hour, bin) counts
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             extract(hour FROM CAST(ts AS TIMESTAMP)) AS hour,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               // {HIST_BIN_CENTS} AS bin,
             count(*) AS cnt
      FROM events GROUP BY 1, 2, 3
    ),
    daily AS (
      SELECT day, bin, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM hourly GROUP BY day, bin
    ),
    cum AS (
      SELECT day, bin, cnt,
             CAST(sum(cnt) OVER (PARTITION BY day ORDER BY bin) AS BIGINT)
               AS cum,
             CAST(sum(cnt) OVER (PARTITION BY day) AS BIGINT) AS total
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(max(total) AS BIGINT) AS total_events,
           CAST(min(CASE WHEN cum * 2 >= total * 1 THEN bin END)
                * {HIST_BIN_CENTS} AS BIGINT) AS p50_lo_cents,
           CAST(min(CASE WHEN cum * 10 >= total * 9 THEN bin END)
                * {HIST_BIN_CENTS} AS BIGINT) AS p90_lo_cents,
           CAST(min(CASE WHEN cum * 100 >= total * 99 THEN bin END)
                * {HIST_BIN_CENTS} AS BIGINT) AS p99_lo_cents
    FROM cum GROUP BY day
    """,
)
def histogram_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile summaries — the quantile analog of the KMV
    rollup (kmv_weekly_users_rollup): fixed-width integer-cents
    histogram bins per (day, hour) are the persisted summary a
    production pipeline keeps per micro-batch/hour; daily p50/p90/p99
    come from MERGING bins (count-sum monoid — associative, partial-
    agg'd map-side), never from re-scanning raw events or from
    percentile_approx, whose internal sketch is engine-opaque and not
    hash-replayable. Quantile = lower bound of the first bin whose
    cumulative count reaches ceil(q*total), computed by integer
    cross-multiplication (cum*q_den >= total*q_num) — no float ever
    picks a bin, so DuckDB reproduces every output bit-for-bit.

    100 TB shape: the raw scan collapses to <=24h x ~100 bins per day in
    ONE partial-agg exchange; the merge and the quantile window touch
    only bin rows (bounded per group), so a year of data is ~900k
    summary rows regardless of event volume. Error is bounded by the
    bin width (here {HIST_BIN_CENTS} cents), the standard
    fixed-histogram trade."""
    ev = load_table(spark, sf_dir, "events")
    return hist_quantile_report(hist_hourly_bins(ev))


TS_W = 7  # pattern window length (days)
TS_TOPK = 20


@query(
    "timeseries_pattern_topk",
    oracle=f"""
    WITH d0 AS (
      SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0 FROM events
    ),
    daily AS (
      SELECT user_id,
             CAST(datediff('day', d0,
                           CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT)
               AS day_idx,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events CROSS JOIN d0 GROUP BY 1, 2
    ),
    pat AS (  -- corpus-wide first-{TS_W}-days pattern, gap-filled to
              -- exactly {TS_W} dense entries (zero-event days = 0)
      SELECT list(COALESCE(pc.c, 0) ORDER BY t.i) AS p
      FROM unnest(range(0, {TS_W})) AS t(i)
      LEFT JOIN (
        SELECT day_idx, CAST(sum(cents) AS BIGINT) AS c
        FROM daily WHERE day_idx < {TS_W} GROUP BY day_idx
      ) pc ON pc.day_idx = t.i
    ),
    spans AS (
      SELECT user_id, min(day_idx) AS lo, max(day_idx) AS hi
      FROM daily GROUP BY user_id
    ),
    filled AS (  -- gapfill to a dense per-user series (missing day = 0)
      SELECT s.user_id, s.lo,
             list(COALESCE(d.cents, 0) ORDER BY t.i) AS series
      FROM spans s
      JOIN unnest(range(0, 100000)) AS t(i)
        ON t.i <= s.hi - s.lo
      LEFT JOIN daily d
        ON d.user_id = s.user_id AND d.day_idx = s.lo + t.i
      GROUP BY s.user_id, s.lo
    ),
    wins AS (
      SELECT f.user_id, f.lo + t.i AS start_day,
             f.series[t.i + 1 : t.i + {TS_W}] AS x
      FROM filled f
      JOIN unnest(range(0, 100000)) AS t(i)
        ON t.i + {TS_W} <= len(f.series)
    ),
    m AS (
      -- quadratic moments in HUGEINT (int128): spp = sum(p_i^2) wraps
      -- int64 past a ~3e9-cents corpus-day; linear sums stay BIGINT
      -- (bound ~1.3e18 cents/day, documented)
      SELECT w.user_id, w.start_day,
             CAST(list_reduce(w.x, (a, b) -> a + b) AS BIGINT) AS sx,
             list_reduce(list_transform(w.x, v -> CAST(v AS HUGEINT) * v),
                         (a, b) -> a + b) AS sxx,
             list_reduce(list_transform(range(1, {TS_W} + 1),
                         i -> CAST(w.x[i] AS HUGEINT) * pat.p[i]),
                         (a, b) -> a + b) AS sxp,
             CAST(list_reduce(pat.p, (a, b) -> a + b) AS BIGINT) AS sp,
             list_reduce(list_transform(pat.p, v -> CAST(v AS HUGEINT) * v),
                         (a, b) -> a + b) AS spp
      FROM wins w CROSS JOIN pat
    )
    SELECT user_id, start_day,
           CAST({TS_W} * sxp - CAST(sx AS HUGEINT) * sp AS DOUBLE)
             / (sqrt(CAST({TS_W} * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                * sqrt(CAST({TS_W} * spp - CAST(sp AS HUGEINT) * sp
                            AS DOUBLE))) AS corr
    FROM m
    WHERE {TS_W} * sxx - CAST(sx AS HUGEINT) * sx > 0
      AND {TS_W} * spp - CAST(sp AS HUGEINT) * sp > 0
    ORDER BY corr DESC, user_id, start_day
    LIMIT {TS_TOPK}
    """,
)
def timeseries_pattern_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series pattern search (the streaming-similarity-search
    family, EDBT'19 theme): which user's {TS_W}-day spending window most
    tracks the corpus-wide first-week pattern — z-normalized
    (Pearson) subsequence matching, the UCR-suite-style primitive for
    'find me series that behave like THIS'.

    Bit-exact discipline (the corr_value_day_per_type recipe): daily
    cents are exact int64; every subsequence's (Σx, Σx², Σxp) moments
    are int64 folds over dense gap-filled arrays; the correlation is
    ONE fixed IEEE expression over those exact integers, so the DuckDB
    oracle hash-verifies every score, and zero-variance windows are
    excluded by an INTEGER predicate, not a float epsilon.

    100 TB shape: the raw scan collapses to (user, day) partials in one
    partial-agg exchange; series assembly and window slicing are
    map-side JVM HOFs over per-user arrays (bounded by the corpus's day
    span); the {TS_W}-element pattern is a broadcast 1-row relation;
    the global top-{TS_TOPK} is TakeOrderedAndProject — no global
    sort.

    Numeric headroom (r8): the pattern entries are CORPUS-wide daily
    totals, so the quadratic moments (sxx, sxp, spp and the
    {TS_W}*m2 - m1^2 discriminants) are computed in DECIMAL(38,0)
    (Spark) / HUGEINT (oracle) — sum(p_i^2) wraps int64 past a
    ~3e9-cents (~$30M) corpus-day, which any real 100 TB corpus
    exceeds. The linear sums (sx, sp) stay int64 with a ~1.3e18
    cents/day bound ($13 quadrillion/day — unreachable); the widened
    bound on the discriminants is 1e38. Proven by
    tests/test_timeseries_stage.py's >3e9-cents/day synthetic corpus,
    which the old int64 folds fail under ANSI."""
    ev = load_table(spark, sf_dir, "events")
    return ts_pattern_topk_from_daily(ts_daily_cents(ev))


def ts_daily_cents(ev: DataFrame) -> DataFrame:
    """(user_id, day, cents): per-user daily integer-cents totals — the
    persisted mergeable summary (sum monoid) the pattern search runs
    on. Keyed by CALENDAR DATE, not a corpus-relative index, so
    streaming partials from different batches fold correctly
    (streaming/timeseries_stage.py); the query converts to a dense
    index at read time."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return (
        ev.select("user_id", F.to_date("ts").alias("day"), cents.alias("c"))
        .groupBy("user_id", "day")
        .agg(F.sum("c").alias("cents"))
    )


def ts_pattern_topk_from_daily(daily_by_date: DataFrame) -> DataFrame:
    """Pattern search over any (user_id, day, cents) relation
    (duplicates per (user, day) allowed — they merge by sum), shared by
    the batch query and the streaming fold."""
    daily_by_date = daily_by_date.groupBy("user_id", "day").agg(
        F.sum("cents").alias("cents")
    )
    d0 = daily_by_date.agg(F.min("day").alias("d0"))
    daily = daily_by_date.crossJoin(F.broadcast(d0)).select(
        "user_id",
        F.datediff("day", "d0").cast("long").alias("day_idx"),
        "cents",
    )
    # the pattern is gap-filled to EXACTLY TS_W dense entries (a
    # zero-event calendar day in the corpus's first week would
    # otherwise shorten p, and zip_with's null padding would NULL every
    # correlation downstream — silently, since the WHERE guards are
    # integer-only)
    pat = (
        daily.where(F.col("day_idx") < TS_W)
        .groupBy("day_idx")
        .agg(F.sum("cents").alias("c"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("day_idx", "c"))
            ).alias("by_day")
        )
        .select(
            F.expr(
                f"transform(sequence(0L, {TS_W - 1}L), d ->"
                " coalesce(try_element_at(by_day, d), 0L))"
            ).alias("p")
        )
    )
    # dense per-user series: gapfill missing days to 0 inside the
    # user's own [lo, hi] span — map-side HOF over the collected pairs
    # users whose whole span is shorter than the window yield no
    # subsequence — and MUST be filtered before the window transform:
    # for them sequence(0, size-W) runs DESCENDING into negatives and
    # slice(series, 0, W) throws (the oracle's join condition
    # t.i + W <= len skips them structurally). r13: the guard tests
    # hi - lo + 1 (== size(series) exactly — transform preserves the
    # sequence length) BETWEEN the aggregate and the series projection,
    # NOT size(series) above it: predicate pushdown moved that spelling
    # below the projection and inlined the whole per-user gap-fill
    # transform into the Filter — the series built twice per user
    # (PLANS.md showed the inlined Filter copy; CollapseProject's
    # multi-reference cost guard protects the window stage above, but
    # PushDownPredicates has no such guard).
    filled = (
        daily.groupBy("user_id")
        .agg(
            F.min("day_idx").alias("lo"),
            F.max("day_idx").alias("hi"),
            F.map_from_entries(
                F.collect_list(F.struct("day_idx", "cents"))
            ).alias("by_day"),
        )
        .where(F.col("hi") - F.col("lo") + 1 >= TS_W)
        .select(
            "user_id",
            "lo",
            F.expr(
                "transform(sequence(lo, hi), d ->"
                " coalesce(try_element_at(by_day, d), 0L))"
            ).alias("series"),
        )
    )
    wins = (
        filled
        .select(
            "user_id",
            "lo",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(series) - {TS_W}), i ->"
                    f" slice(series, i + 1, {TS_W}))"
                )
            ).alias("i", "x"),
        )
        .where(F.size("x") == TS_W)
    )
    # quadratic moments fold in DECIMAL(38,0): each int64 x int64
    # product is cast per-factor to DECIMAL(19,0) (product precision 38,
    # never an intermediate int64), the accumulator stays (38,0); the
    # linear sums sx/sp are safe in int64 up to ~1.3e18 cents/day
    m = wins.crossJoin(F.broadcast(pat)).select(
        "user_id",
        (F.col("lo") + F.col("i")).alias("start_day"),
        F.expr("aggregate(x, 0L, (a, b) -> a + b)").alias("sx"),
        F.expr(
            "aggregate(x, CAST(0 AS DECIMAL(38,0)), (a, b) ->"
            " a + CAST(b AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0)))"
        ).alias("sxx"),
        F.expr(
            "aggregate(zip_with(x, p, (v, q) ->"
            " CAST(v AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0))),"
            " CAST(0 AS DECIMAL(38,0)), (a, b) -> a + b)"
        ).alias("sxp"),
        F.expr("aggregate(p, 0L, (a, b) -> a + b)").alias("sp"),
        F.expr(
            "aggregate(p, CAST(0 AS DECIMAL(38,0)), (a, b) ->"
            " a + CAST(b AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0)))"
        ).alias("spp"),
    )
    w = TS_W
    dec19 = "decimal(19,0)"
    wd = F.lit(w).cast("decimal(2,0)")
    disc_x = wd * F.col("sxx") - F.col("sx").cast(dec19) * F.col("sx").cast(
        dec19
    )
    disc_p = wd * F.col("spp") - F.col("sp").cast(dec19) * F.col("sp").cast(
        dec19
    )
    num = wd * F.col("sxp") - F.col("sx").cast(dec19) * F.col("sp").cast(
        dec19
    )
    corr = num.cast("double") / (
        F.sqrt(disc_x.cast("double")) * F.sqrt(disc_p.cast("double"))
    )
    return (
        m.where((disc_x > 0) & (disc_p > 0))
        .select("user_id", "start_day", corr.alias("corr"))
        .orderBy(F.desc("corr"), "user_id", "start_day")
        .limit(TS_TOPK)
    )


@query(
    "scd2_temporal_enrichment",
    oracle=f"""
    WITH {_SCD2_HIST_CTE},
    enriched AS (
      SELECT h.state AS state_at_event, e.user_id,
             CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events e JOIN hist h
        ON h.user_id = e.user_id
       AND CAST(e.ts AS TIMESTAMP) >= h.valid_from
       AND (h.valid_to IS NULL OR CAST(e.ts AS TIMESTAMP) < h.valid_to)
    )
    SELECT state_at_event,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           count(DISTINCT user_id) AS n_users
    FROM enriched
    GROUP BY state_at_event
    """,
)
def scd2_temporal_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (validity-window) join — the standard warehouse
    enrichment an SCD2 history exists FOR: each event joins the state
    version VALID AT ITS TIMESTAMP (``valid_from <= ts < valid_to``,
    open current interval), then rolls up spend per state-at-event.
    Complements ``asof_last_event_value`` (as-of by latest preceding
    event) with the dimension-history form: point-in-time-correct
    attribution that a plain join to the CURRENT dimension row gets
    wrong for every historical event.

    Uniqueness by construction: intervals partition each user's
    timeline (half-open, boundaries from the same total (ts, event_id)
    order the history build uses), so every event matches EXACTLY one
    version — tests/test_stream_joins.py pins join-count == event
    count, including at change boundaries and zero-length intervals
    from equal-timestamp changes.

    Scale shape: the join is equi on user_id with a range residual —
    one key-bound shuffle, per-user sorted intervals; history rows are
    the collapsed change subset (<< events). Spend stays exact int64
    cents until the final sums."""
    e = load_table(spark, sf_dir, "events")
    hist = scd2_history(e).select(
        "user_id", "state", "valid_from", "valid_to"
    )
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    ev = e.select("user_id", "ts", cents.alias("cents"))
    # explicit aliases: both sides derive from the same scan, and an
    # unaliased ev["user_id"] == hist["user_id"] resolves through
    # Spark's ambiguous-self-join machinery (it logs 'trivially true
    # equals predicate') — the aliased form is a plainly-resolved
    # equi-key that can never collapse to literal true
    enriched = ev.alias("e").join(
        hist.alias("h"),
        (F.col("e.user_id") == F.col("h.user_id"))
        & (F.col("e.ts") >= F.col("h.valid_from"))
        & (F.col("h.valid_to").isNull() | (F.col("e.ts") < F.col("h.valid_to"))),
    )
    return enriched.groupBy(
        F.col("h.state").alias("state_at_event")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("total_cents"),
        F.countDistinct(F.col("e.user_id")).alias("n_users"),
    )


@query(
    "psi_value_drift_per_type",
    oracle="""
    WITH e AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(floor(value / 50.0) * 50 AS BIGINT) AS bin_lo
      FROM events
    ), mid AS (
      SELECT (min(us) + max(us)) // 2 AS mid FROM e
    ), obs AS (
      SELECT event_type, bin_lo,
             CASE WHEN us <= mid THEN 0 ELSE 1 END AS half,
             count(*) AS c
      FROM e CROSS JOIN mid GROUP BY 1, 2, 3
    ), binset AS (
      SELECT DISTINCT event_type, bin_lo FROM obs
    ), grid AS (
      SELECT b.event_type, b.bin_lo,
             coalesce(a.c, 0) + 1 AS sa,
             coalesce(x.c, 0) + 1 AS sb
      FROM binset b
      LEFT JOIN obs a ON a.event_type = b.event_type
                     AND a.bin_lo = b.bin_lo AND a.half = 0
      LEFT JOIN obs x ON x.event_type = b.event_type
                     AND x.bin_lo = b.bin_lo AND x.half = 1
    ), tot AS (
      SELECT event_type,
             CAST(sum(sa) AS BIGINT) AS s_base,
             CAST(sum(sb) AS BIGINT) AS s_act,
             CAST(count(*) AS BIGINT) AS n_bins
      FROM grid GROUP BY 1
    ), terms AS (
      SELECT g.event_type, g.bin_lo, t.s_base, t.s_act, t.n_bins,
             (CAST(g.sa AS DOUBLE) / t.s_base
              - CAST(g.sb AS DOUBLE) / t.s_act)
             * ln((CAST(g.sa AS DOUBLE) * t.s_act)
                  / (CAST(g.sb AS DOUBLE) * t.s_base)) AS term
      FROM grid g JOIN tot t USING (event_type)
    ), folded AS (
      SELECT event_type,
             CAST(s_base - n_bins AS BIGINT) AS n_base,
             CAST(s_act - n_bins AS BIGINT) AS n_actual,
             n_bins,
             round(coalesce(list_reduce(list(term ORDER BY bin_lo),
                                        (a, x) -> a + x),
                            CAST(0.0 AS DOUBLE)), 9) AS psi
      FROM terms
      GROUP BY event_type, s_base, s_act, n_bins
    )
    SELECT event_type, n_base, n_actual, n_bins, psi,
           CASE WHEN psi >= 0.25 THEN 'major'
                WHEN psi >= 0.1 THEN 'moderate'
                ELSE 'stable' END AS drift_class
    FROM folded ORDER BY event_type
    """,
)
def psi_value_drift_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type, period over period —
    the model-monitoring industry's standard drift score (the cousin of
    ``chi2_value_drift_per_type``, which tests slice-vs-corpus instead
    of now-vs-before). The corpus time range splits at its exact µs
    midpoint (integer div, both engines); value bins are the shared
    50-unit schema bins with +1 smoothing on the per-type bin union so
    empty cells contribute finite mass (the standard PSI zero-cell
    treatment).

    Float discipline: each bin term is (sa/SA - sb/SB) * ln(sa*SB /
    (sb*SA)) — the ratio's factors are cast to double BEFORE the
    multiply (an int64 product would wrap past ~3e9 events of one type:
    Spark would ln() a negative while DuckDB raises; the double products
    round identically in both engines), two divisions + one ln + one
    multiply in fixed order; ln() carries no cross-engine bit
    guarantee (Java intrinsics vs libm, the bm25 lesson), so the folded
    sum is rounded to 9 decimals — 7 orders above the last-ulp noise,
    5 below any decision threshold. Thresholds (0.1 / 0.25) then
    compare the identical rounded double.

    Shape at 100 TB: ONE corpus shuffle (partial-agg'd
    (type, bin, half) counts); everything after is arithmetic over the
    <= types x bins contingency with broadcast totals."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.floor(F.col("value") / 50.0) * 50).cast("long").alias("bin_lo"),
    )
    mid = e.agg(
        F.expr("(min(us) + max(us)) div 2").alias("mid")
    )
    obs = (
        e.crossJoin(F.broadcast(mid))
        .select(
            "event_type",
            "bin_lo",
            F.when(F.col("us") <= F.col("mid"), 0).otherwise(1).alias("half"),
        )
        .groupBy("event_type", "bin_lo", "half")
        .agg(F.count("*").alias("c"))
        .transform(pin)
    )
    a = obs.where("half = 0").select(
        F.col("event_type").alias("key"), "bin_lo", F.col("c").alias("c")
    )
    x = obs.where("half = 1").select(
        F.col("event_type").alias("key"), "bin_lo", F.col("c").alias("c")
    )
    return psi_from_counts(a, x).withColumnRenamed(
        "key", "event_type"
    ).orderBy("event_type")


def psi_from_counts(base: DataFrame, actual: DataFrame) -> DataFrame:
    """PSI between two (key, bin_lo, c) count relations — the shared
    exact-arithmetic core of the batch query above and the streaming
    drift monitor's PSI finalize (streaming/drift.py::psi_drift), so
    drained streaming == batch bit-for-bit. Returns
    (key, n_base, n_actual, n_bins, psi, drift_class), unordered —
    callers order."""
    a = base.select("key", "bin_lo", F.col("c").alias("ca"))
    x = actual.select("key", "bin_lo", F.col("c").alias("cx"))
    binset = (
        a.select("key", "bin_lo").union(x.select("key", "bin_lo")).distinct()
    )
    grid = (
        binset.join(a, ["key", "bin_lo"], "left")
        .join(x, ["key", "bin_lo"], "left")
        .select(
            "key",
            "bin_lo",
            (F.coalesce("ca", F.lit(0)) + 1).alias("sa"),
            (F.coalesce("cx", F.lit(0)) + 1).alias("sb"),
        )
    )
    tot = grid.groupBy("key").agg(
        F.sum("sa").alias("s_base"),
        F.sum("sb").alias("s_act"),
        F.count("*").alias("n_bins"),
    )
    term = (
        F.col("sa").cast("double") / F.col("s_base")
        - F.col("sb").cast("double") / F.col("s_act")
    ) * F.log(
        (F.col("sa").cast("double") * F.col("s_act"))
        / (F.col("sb").cast("double") * F.col("s_base"))
    )
    terms = grid.join(tot, "key").select(
        "key", "bin_lo", "s_base", "s_act", "n_bins", term.alias("term")
    )
    folded = (
        terms.groupBy("key", "s_base", "s_act", "n_bins")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("bin_lo", "term"))
                        ),
                        lambda s: s["term"],
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                ),
                9,
            ).alias("psi")
        )
    )
    return folded.select(
        "key",
        (F.col("s_base") - F.col("n_bins")).cast("long").alias("n_base"),
        (F.col("s_act") - F.col("n_bins")).cast("long").alias("n_actual"),
        "n_bins",
        "psi",
        F.when(F.col("psi") >= 0.25, "major")
        .when(F.col("psi") >= 0.1, "moderate")
        .otherwise("stable")
        .alias("drift_class"),
    )


@query(
    "attribution_last_touch",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ), touched AS (
      SELECT *,
             last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type,
             last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
                             THEN us END IGNORE NULLS)
               OVER w AS touch_us
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN touch_us IS NOT NULL
                 AND touch_us >= us - 604800000000
                THEN touch_type ELSE 'direct' END AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS revenue
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY channel
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the most
    recent preceding view/click/signup by the same user within a 7-day
    lookback, else 'direct' — the standard BI attribution query (the
    single-relation cousin of ``asof_last_event_value``, which as-of
    joins two relations). The touch type and timestamp come from two
    IGNORE NULLS last_value calls over the SAME frame, so they are
    guaranteed to describe the same touch row (they are null on exactly
    the same rows). Revenue follows the DECIMAL(18,2) exact-sum rule.

    Shape at 100 TB: ONE user-keyed exchange + sort shared by both
    window calls, then a 4-group partial-agg'd rollup. The lookback is
    exact µs integer arithmetic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return attribution_rollup(attributed_purchases(e)).orderBy("channel")


TOUCH_TYPES = ("view", "click", "signup")
ATTRIB_LOOKBACK_US = 604_800_000_000  # 7 days


def attributed_purchases(e: DataFrame) -> DataFrame:
    """(event_id, user_id, us, value, channel) for every purchase row in
    a (event_id, user_id, event_type, value, us) relation — the shared
    expression core of the batch query above and the streaming stage
    (streaming/attribution_stage.py), so drained == batch cannot fork.
    Both IGNORE NULLS last_value calls share one frame, so touch_type
    and touch_us always describe the same touch row."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*TOUCH_TYPES)
    touched = e.select(
        "*",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("us")), ignorenulls=True)
        .over(w)
        .alias("touch_us"),
    )
    channel = F.when(
        F.col("touch_us").isNotNull()
        & (F.col("touch_us") >= F.col("us") - F.lit(ATTRIB_LOOKBACK_US)),
        F.col("touch_type"),
    ).otherwise("direct")
    return touched.where("event_type = 'purchase'").select(
        "event_id", "user_id", "us", "value", channel.alias("channel")
    )


def attribution_rollup(attributed: DataFrame) -> DataFrame:
    """Channel rollup of an attributed-purchase relation (shared by the
    batch query and the streaming log reader)."""
    return attributed.groupBy("channel").agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("revenue"),
    )


HOLT_ALPHA = 0.5  # level smoothing
HOLT_BETA = 0.3  # trend smoothing


@query(
    "holt_linear_backtest",
    # The oracle replays the fold as a RECURSIVE CTE rather than a
    # struct-accumulator list_reduce: DuckDB 1.0.0's struct lambdas
    # evaluate fields with inconsistent pre/post-update visibility
    # (verified with a minimal two-field fold), while the recursive CTE
    # is a well-defined step-by-step join — bit-identical to Spark's
    # F.aggregate left fold.
    oracle=f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                  AS DOUBLE) / count(*) AS v
      FROM events GROUP BY 1, 2
    ), pts AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS i,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM hourly
    ), rec AS (
      SELECT event_type, n, CAST(1 AS BIGINT) AS i, v AS l,
             CAST(0 AS DOUBLE) AS b, v AS prev,
             CAST(0 AS DOUBLE) AS sh, CAST(0 AS DOUBLE) AS sn
      FROM pts WHERE i = 1
      UNION ALL
      SELECT r.event_type, r.n, r.i + 1,
             CAST({HOLT_ALPHA} AS DOUBLE) * p.v
               + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (r.l + r.b),
             CAST({HOLT_BETA} AS DOUBLE)
               * ((CAST({HOLT_ALPHA} AS DOUBLE) * p.v
                   + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (r.l + r.b)) - r.l)
               + CAST({1 - HOLT_BETA} AS DOUBLE) * r.b,
             p.v,
             r.sh + abs(p.v - (r.l + r.b)),
             r.sn + abs(p.v - r.prev)
      FROM rec r JOIN pts p ON p.event_type = r.event_type
                           AND p.i = r.i + 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           sh / (i - 1) AS mae_holt,
           sn / (i - 1) AS mae_naive,
           CAST(sh < sn AS BIGINT) AS holt_beats_naive
    FROM rec WHERE i = n AND n > 1 ORDER BY event_type
    """,
)
def holt_linear_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend exponential smoothing (alpha = 0.5, beta =
    0.3) backtested one-step-ahead against the naive last-value
    forecast, per event type over the hourly mean-value series — the
    double-exponential upgrade of ``ewma_event_value_per_user`` and the
    learned counterpart of ``seasonal_naive_backtest``. Both MAEs come
    from the SAME left fold (level/trend update + both absolute errors
    accumulate in one accumulator struct), so the comparison is
    internally consistent by construction.

    Float discipline: hourly means are DECIMAL-exact sums with one
    division; the fold is the corpus-standard sorted fold (ewma /
    PageRank pattern) — the per-step chain is fixed-order IEEE add/
    mul/abs with identical literal constants in both engines, so no
    rounding is needed. DuckDB's list_reduce starts from the first
    element; Spark replicates by transforming each point into a
    pre-initialized accumulator struct and folding from an n = 0
    sentinel that the first merge replaces.

    Shape at 100 TB: ONE partial-agg'd (type, hour) shuffle collapses
    the corpus; series length is calendar-bounded (hours in the data's
    time range), NOT corpus-bounded, so the per-type fold state stays
    tiny forever."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 3600000000"
            ).alias("hour"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("decimal(18,2)")
                .cast("double")
                / F.count("*")
            ).alias("v")
        )
    )
    pts = F.transform(
        F.transform(
            F.array_sort(F.collect_list(F.struct("hour", "v"))),
            lambda s: s["v"],
        ),
        lambda v: F.struct(
            v.alias("l"),
            F.lit(0.0).alias("b"),
            v.alias("prev"),
            F.lit(0.0).alias("sh"),
            F.lit(0.0).alias("sn"),
            F.lit(1).cast("long").alias("n"),
        ),
    )
    a_, b_ = float(HOLT_ALPHA), float(HOLT_BETA)

    def step(a, x):
        newl = F.lit(a_) * x["l"] + F.lit(1 - a_) * (a["l"] + a["b"])
        return F.struct(
            newl.alias("l"),
            (
                F.lit(b_) * (newl - a["l"]) + F.lit(1 - b_) * a["b"]
            ).alias("b"),
            x["l"].alias("prev"),
            (a["sh"] + F.abs(x["l"] - (a["l"] + a["b"]))).alias("sh"),
            (a["sn"] + F.abs(x["l"] - a["prev"])).alias("sn"),
            (a["n"] + 1).alias("n"),
        )

    zero = F.struct(
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("prev"),
        F.lit(0.0).alias("sh"),
        F.lit(0.0).alias("sn"),
        F.lit(0).cast("long").alias("n"),
    )
    st = F.aggregate(
        pts, zero, lambda a, x: F.when(a["n"] == 0, x).otherwise(step(a, x))
    )
    folded = (
        hourly.groupBy("event_type")
        .agg(st.alias("st"), F.count("*").alias("n_hours"))
        .where(F.col("n_hours") > 1)
    )
    return folded.select(
        "event_type",
        F.col("n_hours").cast("long").alias("n_hours"),
        (F.col("st.sh") / (F.col("st.n") - 1)).alias("mae_holt"),
        (F.col("st.sn") / (F.col("st.n") - 1)).alias("mae_naive"),
        (F.col("st.sh") < F.col("st.sn")).cast("long").alias(
            "holt_beats_naive"
        ),
    ).orderBy("event_type")


# ONE constant feeds BOTH the oracle's unroll depth and the Spark
# operator's max_iters at the registered call site (r11 ADVICE): a
# graph converging in more rounds than the unroll now raises the
# operator's loud RuntimeError on the Spark side instead of passing
# there while the oracle's in-SQL convergence guard yields zero rows
# (a confusing value FAIL). Measured convergence on the testdata
# graphs: 18 / 12 / 10 rounds at sf0.001 / 0.01 / 0.1.
KCORE_ORACLE_ITERS = 24


def _kcore_oracle(iters: int = KCORE_ORACLE_ITERS) -> str:
    """DuckDB replay of ``kcore_decomposition``: the h-index iteration
    unrolled as chained MATERIALIZED CTEs (the PageRank r4 pattern —
    DuckDB inlines CTEs by default and each step references its
    predecessor, so un-hinted unrolling blows up exponentially).
    Convergence measured on the testdata graphs: 18 / 12 / 10 rounds at
    sf0.001 / 0.01 / 0.1; 24 steps is comfortable headroom, and the
    ``conv`` guard ASSERTS convergence inside the SQL — if step N !=
    step N-1 the result is zero rows, which the driver's row-count
    compare flags loudly (mirror of the Spark operator's
    RuntimeError). All-integer arithmetic: bit-exact by construction,
    no float discipline needed."""
    step = """,
    c{k} AS MATERIALIZED (
      SELECT u, max(least(rn, cv)) AS c FROM (
        SELECT und.u, p.c AS cv,
               CAST(row_number() OVER (PARTITION BY und.u
                      ORDER BY p.c DESC, und.v) AS BIGINT) AS rn
        FROM und JOIN c{prev} p ON und.v = p.u
      ) GROUP BY u
    )"""
    steps = "".join(
        step.format(k=k, prev=k - 1) for k in range(1, iters + 1)
    )
    return f"""
    WITH pair_counts AS (
      SELECT least(a.l_partkey, b.l_partkey) AS pa,
             greatest(a.l_partkey, b.l_partkey) AS pb,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), directed AS (
      SELECT pa AS src, pb AS dst, n_orders FROM pair_counts
      UNION ALL
      SELECT pb AS src, pa AS dst, n_orders FROM pair_counts
    ), ranked AS (
      SELECT src, dst,
             row_number() OVER (
               PARTITION BY src ORDER BY n_orders DESC, dst ASC) AS rn
      FROM directed
    ), sel AS (
      SELECT src, dst FROM ranked WHERE rn <= {COPURCHASE_K}
    ), edges AS (
      SELECT s1.src AS a, s1.dst AS b
      FROM sel s1 JOIN sel s2 ON s1.src = s2.dst AND s1.dst = s2.src
      WHERE s1.src < s1.dst
    ), und AS MATERIALIZED (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b AS u, a AS v FROM edges
    ), deg AS MATERIALIZED (
      SELECT u, CAST(count(*) AS BIGINT) AS degree FROM und GROUP BY u
    ), c0 AS MATERIALIZED (
      SELECT u, degree AS c FROM deg
    ){steps}, conv AS (
      SELECT count(*) AS n_unconverged
      FROM c{iters} a JOIN c{iters - 1} b USING (u)
      WHERE a.c <> b.c
    )
    SELECT d.u AS node, d.degree, f.c AS coreness
    FROM deg d JOIN c{iters} f USING (u)
    WHERE (SELECT n_unconverged FROM conv) = 0
    ORDER BY node
    """


@query("kcore_decomposition", oracle=_kcore_oracle())
def kcore_decomposition_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition of the mutual top-K co-purchase graph (the
    triangle query's exact edge relation): coreness per part via the
    h-index iteration — the standard "dense market segment" / graph
    robustness analysis, and the third member of the graph family
    (components, PageRank, triangles). Hash-oracled since r11: the
    iteration is all-integer and converges in a measured <= 18 rounds
    on the testdata graphs, so the oracle unrolls 24 h-index steps as
    MATERIALIZED CTEs (the PageRank fixed-unroll pattern) and asserts
    convergence IN the SQL (zero rows if step 24 != step 23, mirroring
    the Spark operator's loud RuntimeError). tests/test_kcore.py
    additionally pins the result against a sequential textbook-peeling
    twin exactly.

    Scale shape: inherited mutual-KNN degree bound (<= COPURCHASE_K)
    keeps every per-iteration window frame constant-sized; one join +
    one window + one agg per round, 1-row convergence check; coreness
    state is one long per node."""
    from ..operators.graph import kcore_decomposition

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = pin(copurchase_mutual_knn_edges(li))
    # max_iters == the oracle's unroll depth, from ONE constant: past
    # it the Spark side raises loudly rather than diverging from a
    # zero-row oracle (r11 ADVICE)
    return kcore_decomposition(edges, max_iters=KCORE_ORACLE_ITERS).orderBy(
        "node"
    )


def _content_hash60() -> F.Column:
    """60-bit content hash binding doc_id to its text: the first 15 hex
    chars of md5(doc_id || ':' || text) parsed as an exact int64 — the
    largest md5 prefix that fits a signed long without overflow. md5 is
    the one hash both engines share bit-for-bit; DuckDB replays the hex
    parse with a scalar list fold."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), F.col("text")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


@query(
    "corpus_manifest",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id,
           bit_xor(list_reduce(
             list_transform(
               string_split_regex(
                 substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15),
                 ''),
               c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
             (a, x) -> a * 16 + x)) AS content_xor
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable dataset manifest, per source: the
    lakehouse-versioning fingerprint that detects ANY row change —
    added, dropped, edited, or re-keyed documents all flip the
    order-insensitive bit_xor of per-row (doc_id, text) hashes (XOR is
    a group: commutative, associative, self-inverse, no overflow — the
    aggregate the int-sum manifest cannot safely be under ANSI
    arithmetic). Reproducing a snapshot's manifest proves bit-level
    dataset identity without comparing rows; see tests for the
    change-detection matrix.

    Shape at 100 TB: one map-side hash per row + ONE partial-agg'd
    source-keyed shuffle of (source, 6 scalars) partials — manifests of
    corpus slices merge by XOR/sum/min/max, so incremental maintenance
    is free (the moments-log pattern)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.bit_xor(_content_hash60()).alias("content_xor"),
        )
        .orderBy("source")
    )


# train/val/test assignment: bucket 0-89 -> train, 90-94 -> val,
# 95-99 -> test, from an md5-derived uniform 0..99 bucket of the
# (doc_id, text) content hash — the standard reproducible-split recipe.
_SPLIT_TRAIN_END = 90
_SPLIT_VAL_END = 95


@query(
    "corpus_hash_split_manifest",
    oracle=f"""
    WITH h AS (
      SELECT source, n_chars,
             list_reduce(
               list_transform(
                 string_split_regex(
                   substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15),
                   ''),
                 c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
               (a, x) -> a * 16 + x) AS h60
      FROM documents
    ), b AS (
      SELECT source, n_chars, h60, h60 % 100 AS bucket FROM h
    ), s AS (
      SELECT source, n_chars, h60,
             CASE WHEN bucket < {_SPLIT_TRAIN_END} THEN 'train'
                  WHEN bucket < {_SPLIT_VAL_END} THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           bit_xor(h60) AS content_xor
    FROM s GROUP BY source, split
    ORDER BY source, split
    """,
)
def corpus_hash_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test split assignment by CONTENT HASH —
    the standard recipe for deterministic held-out sets over a growing
    corpus (a document's split never depends on arrival order, shard
    layout, or corpus size: md5(doc_id:text) mod 100 buckets, 90/5/5).
    Emits a per-(source, split) manifest (count, chars, XOR content
    fingerprint — the ``corpus_manifest`` group algebra) so a training
    run can PROVE which split snapshot it consumed.

    Exactness: the bucket derives from the same 60-bit md5 prefix as
    corpus_manifest (md5 is the one hash both engines share
    bit-for-bit; the h60 % 100 operands are nonnegative, so both
    engines agree on the remainder); every output column is exact
    int64 / string.

    Shape at 100 TB: one map-side hash + bucket per row, ONE
    (source, split)-keyed partial-agg'd shuffle of 5-scalar partials;
    split manifests of corpus slices merge by sum/XOR, so the
    incremental-maintenance story is corpus_manifest's."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select("source", "n_chars", _content_hash60().alias("h60"))
    split = (
        F.when(F.col("h60") % 100 < _SPLIT_TRAIN_END, F.lit("train"))
        .when(F.col("h60") % 100 < _SPLIT_VAL_END, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        h.withColumn("split", split)
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.bit_xor("h60").alias("content_xor"),
        )
        .orderBy("source", "split")
    )


@query(
    "ks_test_value_drift",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ), mid AS (
      SELECT (min(us) + max(us)) // 2 AS mid FROM e
    ), counts AS (
      SELECT event_type, value,
             CAST(sum(CASE WHEN us <= mid THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN us > mid THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM e CROSS JOIN mid
      GROUP BY event_type, value
    ), cum AS (
      SELECT event_type,
             CAST(sum(c1) OVER w AS BIGINT) AS f1,
             CAST(sum(c2) OVER w AS BIGINT) AS f2,
             CAST(sum(c1) OVER p AS BIGINT) AS n1,
             CAST(sum(c2) OVER p AS BIGINT) AS n2
      FROM counts
      WINDOW w AS (PARTITION BY event_type ORDER BY value
                   ROWS UNBOUNDED PRECEDING),
             p AS (PARTITION BY event_type)
    )
    SELECT event_type,
           CAST(max(n1) AS BIGINT) AS n_base,
           CAST(max(n2) AS BIGINT) AS n_actual,
           CASE WHEN max(n1) > 0 AND max(n2) > 0 THEN
             CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE)
               / (max(n1) * max(n2))
           END AS ks_d
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ks_test_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per event type across
    the corpus's exact µs-midpoint period split — the third member of
    the drift-test trio (chi2: slice-vs-corpus; PSI: smoothed binned
    divergence; KS: the max ECDF gap, the only one sensitive to WHERE
    the distributions diverge rather than how much mass moved).

    Exactness: D = max |F1 - F2| evaluated at the distinct observed
    values with ECDF steps carried as INTEGERS — the maximized quantity
    is |f1*n2 - f2*n1| in int64, and the single division by n1*n2
    happens once, after the max, so the statistic is bit-identical
    across engines with no rounding and no float comparisons inside
    the max.

    Shape at 100 TB: one (type, value) partial-agg'd shuffle collapses
    the corpus; the running ECDF window runs per type over the
    collapsed distinct-value rows; the final max is a per-type
    aggregate; a type with an empty period reports NULL (no drift is
    measurable). int64 headroom: f*n caps at ~3e9 rows per type before
    DECIMAL widening is needed (the PSI bound)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    mid = e.agg(F.expr("(min(us) + max(us)) div 2").alias("mid"))
    counts = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("event_type", "value")
        .agg(
            F.sum(
                F.when(F.col("us") <= F.col("mid"), 1).otherwise(0)
            ).alias("c1"),
            F.sum(
                F.when(F.col("us") > F.col("mid"), 1).otherwise(0)
            ).alias("c2"),
        )
    )
    return ks_over_period_value_counts(counts)


def ks_over_period_value_counts(counts: DataFrame) -> DataFrame:
    """KS scoring core over a (event_type, value, c1, c2) two-period
    value-count relation — shared by the batch query (µs-midpoint
    split) and the streaming twin (streaming/drift.py::ks_drift, which
    folds the SAME value-count monoid from the accumulated log split at
    a reference batch), so drained == batch bit-for-bit."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
        F.sum("c1").over(p).alias("n1"),
        F.sum("c2").over(p).alias("n2"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n1").alias("n_base"),
            F.max("n2").alias("n_actual"),
            F.when(
                (F.max("n1") > 0) & (F.max("n2") > 0),
                F.max(
                    F.abs(
                        F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
                    )
                ).cast("double")
                / (F.max("n1") * F.max("n2")),
            ).alias("ks_d"),
        )
        .orderBy("event_type")
    )


# Benford expected first-digit proportions log10(1 + 1/d), written as
# full-precision double literals so BOTH engines parse the identical
# constant (no runtime ln/log10 — the cross-engine bit hazard).
_BENFORD_P = [
    0.30102999566398120,
    0.17609125905568124,
    0.12493873660829993,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
]


@query(
    "benford_value_audit",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM events WHERE value >= 1
    ), obs AS (
      SELECT event_type, digit, CAST(count(*) AS BIGINT) AS o
      FROM d GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, CAST(sum(o) AS BIGINT) AS n FROM obs GROUP BY 1
    ), expected AS (
      SELECT * FROM (VALUES
        {", ".join(f"({i + 1}, CAST({p!r} AS DOUBLE))" for i, p in enumerate(_BENFORD_P))}
      ) AS t(digit, p)
    ), terms AS (
      SELECT t.event_type, e.digit, t.n,
             (CAST(coalesce(o.o, 0) AS DOUBLE) / t.n - e.p)
             * (CAST(coalesce(o.o, 0) AS DOUBLE) / t.n - e.p) / e.p AS term
      FROM tot t CROSS JOIN expected e
      LEFT JOIN obs o ON o.event_type = t.event_type AND o.digit = e.digit
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_values,
           round(list_reduce(list(term ORDER BY digit), (a, x) -> a + x), 9)
             AS benford_chi2_stat
    FROM terms
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def benford_value_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of event values per type — the
    classic forensic data-quality test (fabricated or unit-mangled
    numeric columns flout the log distribution). The chi-square-style
    statistic sums ((o/n - p_d)^2 / p_d) over digits 1-9 against
    expected proportions embedded as full-precision double LITERALS
    (identical constants in both engines — no runtime log10, the ln
    bit-portability hazard), folded in digit order (the corpus-standard
    sorted fold) and rounded to 9 decimals: the squared-deviation chain
    still landed one ulp apart between engines in practice, so the
    PSI rounding rule applies.

    Shape at 100 TB: digit extraction is map-side string work on the
    integer part; one (type, digit) partial-agg'd shuffle; the 9-digit
    grid and fold are per-type scalar arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.where(F.col("value") >= 1).select(
        "event_type", benford_first_digit().alias("digit")
    )
    obs = d.groupBy("event_type", "digit").agg(F.count("*").alias("o"))
    return benford_over_digit_counts(obs)


def benford_first_digit(value: str = "value") -> F.Column:
    """First significant digit of the integer part — the bin expression
    shared by the batch audit and the streaming stage (the row must
    already satisfy ``value >= 1``)."""
    return F.substring(
        F.floor(value).cast("long").cast("string"), 1, 1
    ).cast("long")


def benford_over_digit_counts(obs: DataFrame) -> DataFrame:
    """Benford scoring core over a (event_type, digit, o) first-digit
    count relation — shared by the batch audit and the streaming twin
    (streaming/stats_stage.py), which folds the same digit-count monoid
    from its accumulated contingency log."""
    tot = obs.groupBy("event_type").agg(F.sum("o").alias("n"))
    expected = obs.sparkSession.createDataFrame(
        [(i + 1, p) for i, p in enumerate(_BENFORD_P)], "digit long, p double"
    )
    grid = (
        tot.crossJoin(F.broadcast(expected))
        .join(obs, ["event_type", "digit"], "left")
        .select(
            "event_type",
            "digit",
            "n",
            F.coalesce("o", F.lit(0)).alias("o"),
            "p",
        )
    )
    dev = F.col("o").cast("double") / F.col("n") - F.col("p")
    terms = grid.select(
        "event_type", "digit", "n", (dev * dev / F.col("p")).alias("term")
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("n").alias("n_values"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("digit", "term"))
                        ),
                        lambda s: s["term"],
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                9,
            ).alias("benford_chi2_stat"),
        )
        .orderBy("event_type")
    )


@query(
    "spearman_trend_per_type",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      FROM events
    ), rx AS (
      SELECT event_type, value,
             2 * row_number() OVER (PARTITION BY event_type
                                    ORDER BY us, value, event_id) AS x2,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, us, event_id) AS vr
      FROM e
    ), ty AS (
      SELECT event_type, value,
             CAST(min(vr) + max(vr) AS BIGINT) AS y2
      FROM rx GROUP BY event_type, value
    ), pts AS (
      SELECT r.event_type, CAST(r.x2 AS BIGINT) AS x2, t.y2
      FROM rx r JOIN ty t ON t.event_type = r.event_type
                         AND t.value = r.value
    ), sums AS (
      -- int128 sums (DuckDB's sum(BIGINT) is HUGEINT; the per-row
      -- products are widened before multiply) mirror the Spark side's
      -- DECIMAL(38,0) sums: both hold the ~4n^3 moments exactly far
      -- past the brief's 100x scale, and both convert the exact
      -- integer to the nearest double before the fixed rho chain.
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x2 AS HUGEINT)) AS sx,
             sum(CAST(y2 AS HUGEINT)) AS sy,
             sum(CAST(x2 AS HUGEINT) * y2) AS sxy,
             sum(CAST(x2 AS HUGEINT) * x2) AS sxx,
             sum(CAST(y2 AS HUGEINT) * y2) AS syy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS spearman_rho
    FROM sums ORDER BY event_type
    """,
)
def spearman_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between arrival order and value, per
    event type — the standard nonparametric monotone-trend test (the
    trend complement of the KS/PSI/chi² drift family: those detect THAT
    a distribution moved; this detects values drifting steadily up or
    down over time). Tied values take their average rank, carried
    exactly as 2*avg_rank = min+max of the tie group's consecutive
    row numbers (the Mann-Whitney trick), with time ranks doubled to
    match the scale — Pearson on ranks is invariant to the common
    scaling.

    The x tie-break is (us, value, event_id) — points sharing (us,
    value) are interchangeable for every rank sum (consecutive x2s
    within the group sum to a closed form; y2 is value-group-level),
    which makes the (type, us, value, cnt) COUNT RELATION an exact
    sufficient statistic: the batch query computes every rank sum in
    closed form from that monoid (``spearman_over_uv_counts``), and
    the streaming twin (streaming/stats_stage.py) folds the identical
    monoid from its accumulated log — drained == batch bit-for-bit by
    construction.

    Exactness: all five moment sums are exact DECIMAL(38,0) —
    sum(x2*y2) <= 4n³ and the x2² closed form peaks at ~(4/3)n³, so
    int64 would wrap silently past ~1.3e6 rows/type (BELOW the brief's
    100× scale-up of sf0.1 events, ~2e6/type); decimal holds them to
    ~2.9e12 rows/type, and the oracle mirrors with HUGEINT (int128)
    sums. The rho chain is fixed doubles + one sqrt, which IEEE 754
    requires to be correctly rounded, so the emitted value is
    bit-identical across engines with no rounding step (each exact
    integer sum converts to the nearest double identically in both
    engines; past-ceiling behavior is pinned by the synthetic 2e6-row
    probe in tests/test_stats_stage.py). The oracle stays window-based
    (row_number ranks with the same tie-break): the closed forms and
    the window sums are the same integers, so hash-equality each round
    also PROVES the closed-form derivation.

    Shape at 100 TB: ONE (type, us, value) partial-agg'd shuffle
    collapses the corpus; both cumulative windows then run over
    collapsed count rows; the moments are one more partial agg of 6
    scalars per type."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            "value",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .groupBy("event_type", "us", "value")
        .agg(F.count("*").alias("m"))
    )
    return spearman_over_uv_counts(counts)


# S2(t) = 1^2 + ... + t^2 = t(t+1)(2t+1)/6, in DECIMAL(38,0): the
# triple product peaks at ~2t³, which wraps int64 at t ~1.6e6 — below
# the brief's 100× scale. The /6 is exact (the product is always
# divisible by 6), but Spark's decimal division lands in DECIMAL(38,6),
# whose 32 integer digits cap the quotient at ~1e32 — i.e. the decimal
# chain is exact to t ~3.7e10 (≈2e4× the sf0.1 per-type group size),
# and past that ANSI mode raises loudly rather than wrapping.
_S2 = (
    "CAST(CAST(({t}) AS DECIMAL(38,0)) * (({t}) + 1) * (2 * ({t}) + 1)"
    " / 6 AS DECIMAL(38,0))"
)


def spearman_over_uv_counts(counts: DataFrame) -> DataFrame:
    """Spearman scoring core over a (event_type, us, value, m) count
    relation — the exact closed-form rank sums shared by the batch
    query and the streaming twin. Per (us, value) group of size m with
    P prior points (in (us, value) order): doubled time ranks are
    2(P+1)..2(P+m), so sum(x2) = m(2P + m + 1) and sum(x2²) =
    4(S2(P+m) − S2(P)); the tie-averaged doubled value rank of value v
    with C_<v smaller points and m_v ties is y2 = 2·C_<=v − m_v + 1,
    constant over the group — so every moment folds from counts
    alone."""
    wg = (
        Window.partitionBy("event_type")
        .orderBy("us", "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # RANGE frames by value replace the (value-level aggregate + join
    # back) a rank formulation would need: C_<=v is the value-peers-
    # inclusive running count, mv the peers-only count — every window
    # shares the per-type partitioning, so the whole core is ONE
    # exchange + two sorts
    wvr = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wvp = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    grp = counts.select(
        "event_type",
        F.col("m").cast("long").alias("m"),
        (F.sum("m").over(wg) - F.col("m")).cast("long").alias("p"),
        (F.sum("m").over(wvr) * 2 - F.sum("m").over(wvp) + 1)
        .cast("long")
        .alias("y2"),
    )
    # Every per-row product and every moment sum runs in DECIMAL(38,0)
    # so nothing wraps below ~2.9e12 rows/type: with int64, x2sum·y2 <=
    # 4n³ and the S2 triple product (~2n³ before /6) both wrap silently
    # past ~1.3e6 rows/type — under the brief's 100× scale-up. m, p, y2
    # themselves stay long (bounded by 2n, safe to n ~4.6e18).
    m, p, y2 = F.col("m"), F.col("p"), F.col("y2")
    dec = "decimal(38,0)"
    x2sum = (m.cast(dec) * (2 * p + m + 1)).cast(dec)
    x2sq = F.expr(
        f"CAST(4 * ({_S2.format(t='p + m')} - {_S2.format(t='p')})"
        f" AS DECIMAL(38,0))"
    )
    pts = grp.select(
        "event_type",
        m.alias("m"),
        x2sum.alias("x2sum"),
        x2sq.alias("x2sq"),
        y2.alias("y2"),
    )
    sums = pts.groupBy("event_type").agg(
        F.sum("m").alias("n"),
        F.sum("x2sum").alias("sx"),
        F.sum((F.col("m").cast(dec) * F.col("y2")).cast(dec)).alias("sy"),
        F.sum((F.col("y2").cast(dec) * F.col("x2sum")).cast(dec)).alias(
            "sxy"
        ),
        F.sum("x2sq").alias("sxx"),
        F.sum(
            (F.col("m").cast(dec) * F.col("y2") * F.col("y2")).cast(dec)
        ).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    rho = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        F.sqrt(
            (nd * F.col("sxx").cast("double") - sxd * sxd)
            * (nd * F.col("syy").cast("double") - syd * syd)
        )
    )
    return sums.select(
        "event_type", "n", rho.alias("spearman_rho")
    ).orderBy("event_type")


@query(
    "cramers_v_type_weekday",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7
                  AS BIGINT) AS dow
      FROM events
    ), obs AS (
      SELECT event_type AS key, dow AS bin_lo, count(*) AS o
      FROM b GROUP BY 1, 2
    ), bt AS (
      SELECT bin_lo, CAST(sum(o) AS BIGINT) AS bt FROM obs GROUP BY 1
    ), tt AS (
      SELECT key, CAST(sum(o) AS BIGINT) AS tt FROM obs GROUP BY 1
    ), g AS (
      SELECT CAST(sum(o) AS BIGINT) AS g FROM obs
    ), grid AS (
      SELECT t.key, bn.bin_lo, t.tt, bn.bt, COALESCE(o.o, 0) AS o
      FROM tt t CROSS JOIN bt bn
      LEFT JOIN obs o ON o.key = t.key AND o.bin_lo = bn.bin_lo
    ), terms AS (
      SELECT key, bin_lo,
             num * num / CAST(CAST(bt AS HUGEINT) * tt AS DOUBLE)
                       / CAST(g AS DOUBLE) AS term
      FROM (
        SELECT grid.*, g.g,
               CAST(CAST(o AS HUGEINT) * g.g
                    - CAST(bt AS HUGEINT) * tt AS DOUBLE) AS num
        FROM grid CROSS JOIN g
      )
    ), perkey AS (
      -- two-level fold mirroring the Spark side exactly: bins fold
      -- within each key first, then the per-key sums fold by key
      -- (IEEE addition is non-associative; a flat (key,bin) fold is a
      -- DIFFERENT chain)
      SELECT key, list_reduce(list(term ORDER BY bin_lo),
                              (a, x) -> a + x) AS kchi2
      FROM terms GROUP BY key
    ), folded AS (
      SELECT list_reduce(list(kchi2 ORDER BY key),
                         (a, x) -> a + x) AS chi2,
             (SELECT CAST(count(DISTINCT key) AS BIGINT) FROM obs) AS r,
             (SELECT CAST(count(DISTINCT bin_lo) AS BIGINT) FROM obs) AS c,
             (SELECT g FROM g) AS n
      FROM perkey
    )
    SELECT n, r, c, chi2,
           sqrt(chi2 / (CAST(n AS DOUBLE) * least(r - 1, c - 1)))
             AS cramers_v
    FROM folded
    """,
)
def cramers_v_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between event type and weekday — the
    normalized-chi² effect size (0 = independent, 1 = fully
    determined), the standard categorical-association report a BI
    layer runs over every dimension pair. Weekday derives from exact
    integer epoch-day arithmetic ((days + 4) % 7 — 1970-01-01 was a
    Thursday), identical in both engines.

    The per-cell terms come from the SAME algebra as the shared chi²
    core ((o*g - bt*tt)² / (bt*tt) / g = (o-e)²/e exactly), summed over
    the WHOLE r x c table in (key, bin) sorted-fold order; V adds one
    division and one correctly-rounded sqrt — no rounding step needed.

    Shape at 100 TB: ONE (type, weekday) partial-agg'd corpus shuffle;
    everything after is arithmetic over the <= r*c contingency."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.select(
            F.col("event_type").alias("key"),
            weekday_bin().alias("bin_lo"),
        )
        .groupBy("key", "bin_lo")
        .agg(F.count("*").alias("o"))
        .transform(pin)
    )
    return cramers_v_over_contingency(obs)


def weekday_bin(ts: str = "ts") -> F.Column:
    """Exact integer epoch-day weekday ((days + 4) % 7; 1970-01-01 was
    a Thursday) — the bin expression shared by the batch query and the
    streaming stage."""
    return F.expr(
        f"(unix_micros(cast({ts} as timestamp)) div 86400000000 + 4) % 7"
    ).cast("long")


def cramers_v_over_contingency(obs: DataFrame) -> DataFrame:
    """Cramér's V core over a (key, bin_lo, o) contingency relation —
    shared by the batch query and the streaming twin
    (streaming/stats_stage.py), which folds the same cell-count monoid
    from its accumulated contingency log."""
    scored = chi2_over_contingency(obs)
    dims = obs.agg(
        F.countDistinct("key").alias("r"),
        F.countDistinct("bin_lo").alias("c"),
        F.sum("o").alias("n"),
    )
    folded = scored.agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("key", "chi2"))),
                lambda s: s["chi2"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("chi2")
    )
    out = folded.crossJoin(F.broadcast(dims))
    v = F.sqrt(
        F.col("chi2")
        / (F.col("n").cast("double") * F.least(F.col("r") - 1, F.col("c") - 1))
    )
    return out.select("n", "r", "c", "chi2", v.alias("cramers_v"))
