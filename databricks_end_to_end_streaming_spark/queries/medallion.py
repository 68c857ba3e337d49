"""Batch-expressible analogs of the reference medallion stages.

The reference pipeline (raw -> bronze -> silver -> gold) is a chain of
Structured Streaming queries; `streaming/medallion.py` reproduces it as
streams. These registrations are the *batch semantics* of each stage on the
driver's ``events`` table so the DuckDB oracle can check them
(events.event_type ↔ product type, event_id ↔ eventId, ts ↔ timestamp,
props ↔ the Avro payload struct — FIXTURES.md §B).

Stage ↔ reference mapping:

* bronze flatten  — `selectExpr("parsedValue.*")` (bronze.py:18, SURVEY P1):
  here the nested payload is the ``props`` JSON string; we parse and unnest.
* silver dedup    — `dropDuplicates(["eventId"])` (silver.py:23, SURVEY A2),
  plus a deterministic keyed-dedup variant (row_number over ts) because
  arbitrary-row dedup is not oracle-checkable when keys repeat.
* gold aggregate  — filter "today onward" + groupBy + counts + last
  (gold.py:24-33, SURVEY F3/A1/P4) with quirks Q2/Q3 fixed: typed-timestamp
  filter instead of the lexicographic string compare, max() instead of the
  nondeterministic last().
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table
from . import query

# Plan-time "today" constant (gold.py:24 evaluates datetime.now() once at
# query start). The driver's events span 2024-01; we pin a mid-range
# constant so the query is deterministic across runs.
GOLD_CUTOFF = "2024-01-15 00:00:00"


@query(
    "medallion_bronze_flatten",
    oracle="""
    SELECT
      event_id,
      CAST(ts AS TIMESTAMP) AS ts,
      user_id,
      event_type,
      value,
      CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS INTEGER) AS k
    FROM events
    """,
)
def bronze_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 struct flatten: parse the nested payload and unnest it to
    top-level columns, as bronze does with `parsedValue.*` (bronze.py:18)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn("parsedValue", F.from_json("props", "k INT"))
    return parsed.select(
        "event_id", "ts", "user_id", "event_type", "value", "parsedValue.*"
    )


@query(
    "medallion_silver_dedup",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM (
      SELECT event_id, ts, user_id, event_type, value,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY ts, user_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def silver_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 dedup-by-key on the event id (silver.py:23), written as a
    deterministic keep-first (earliest ts) so the oracle can mirror it.
    The streaming variant lives in streaming/medallion.py."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "medallion_gold_agg",
    oracle=f"""
    SELECT
      event_type,
      count(event_type) AS count_type,
      count(user_id)    AS count_user,
      count(value)      AS count_value,
      max(CAST(ts AS TIMESTAMP)) AS last
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '{GOLD_CUTOFF}'
    GROUP BY event_type
    """,
)
def gold_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 range filter + A1 grouped agg + P4 aliases (gold.py:24-33).

    Deviations (SURVEY Q2/Q3, deliberate): the filter compares typed
    timestamps, not "dd-MM-yyyy"-formatted strings; `last` is max(ts),
    not the shuffle-nondeterministic F.last. The triple count mirrors
    gold.py:29-32's count(type)/count(color)/count(size) surface.

    The cutoff is applied to the stored epoch-nanos column
    (load_events_since) so it pushes down to the parquet scan —
    row-group pruning instead of a full scan at 100 TB.
    """
    from ..tables import load_events_since

    events = load_events_since(spark, sf_dir, GOLD_CUTOFF)
    return (
        events
        .groupBy("event_type")
        .agg(
            F.count("event_type").alias("count_type"),
            F.count("user_id").alias("count_user"),
            F.count("value").alias("count_value"),
            F.max("ts").alias("last"),
        )
    )


@query(
    "gold_daily_windows",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day_start,
           event_type,
           count(*) AS n_events,
           max(CAST(ts AS TIMESTAMP)) AS last
    FROM events
    GROUP BY 1, 2
    """,
)
def gold_daily_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch analog of the windowed gold stage (streaming/
    medallion.py::gold_windowed_transform): tumbling 1-day F.window
    aggregation — the correct-at-scale replacement for the reference's
    plan-time "today" filter (SURVEY T3)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day").alias("day"), "event_type")
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("last"))
        .select(
            F.col("day.start").cast("timestamp_ntz").alias("day_start"),
            "event_type",
            "n_events",
            "last",
        )
    )


@query(
    "sql_api_status_counts",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def sql_api_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point (SURVEY S4 — `select count(*) from {t}`
    at bronze.py:31): same Catalyst path as the DataFrame API, exercised
    through SQL text over registered views."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders_v GROUP BY o_orderstatus
        """
    )


@query(
    "medallion_end_to_end",
    oracle=f"""
    WITH bronze AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
             CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS INTEGER) AS k
      FROM events
    ), silver AS (
      SELECT * FROM (
        SELECT bronze.*,
               row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
        FROM bronze
      ) WHERE rn = 1
    )
    SELECT event_type,
           count(event_type) AS count_type,
           count(k)          AS count_k,
           max(ts)           AS last
    FROM silver
    WHERE ts >= TIMESTAMP '{GOLD_CUTOFF}'
    GROUP BY event_type
    """,
)
def end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full bronze->silver->gold chain as one logical plan
    (flatten -> dedup -> filter -> grouped agg), i.e. the reference's whole
    relational core (SURVEY §3.2-3.3) fused into a single Catalyst plan."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    bronze = events.withColumn("parsedValue", F.from_json("props", "k INT")).select(
        "event_id", "ts", "user_id", "event_type", "value", "parsedValue.*"
    )
    w = Window.partitionBy("event_id").orderBy("ts")
    silver = (
        bronze.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        silver.where(F.col("ts") >= F.lit(GOLD_CUTOFF).cast("timestamp_ntz"))
        .groupBy("event_type")
        .agg(
            F.count("event_type").alias("count_type"),
            F.count("k").alias("count_k"),
            F.max("ts").alias("last"),
        )
    )
