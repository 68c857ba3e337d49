"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Normalization notes (all chosen so results hash-match the DuckDB oracle):

* ``events.ts`` is TIMESTAMP(NANOS) in the footer. Spark has no nanosecond
  timestamp; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives
  as a raw LongType of epoch-nanos. We truncate to microseconds and re-type
  as TIMESTAMP_NTZ (DuckDB oracles must do the same: ``CAST(ts AS
  TIMESTAMP)`` truncates ns → µs there).
* ``orders.o_orderdate`` / ``lineitem.l_shipdate`` already read as
  TIMESTAMP_NTZ, matching DuckDB's naive TIMESTAMP.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Defensive runtime confs for sessions we didn't build (the driver
    passes its own SparkSession to entry()/queries()): nanos parquet
    readability and UTC timestamp semantics are correctness-critical."""
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            pass  # static conf in this session; get_spark sessions set it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, applying type normalization."""
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # epoch-nanos long -> microsecond TIMESTAMP_NTZ (session tz is UTC,
        # so the tz-cast is a wall-clock no-op; matches DuckDB CAST(ts AS
        # TIMESTAMP)).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_events_since(spark: SparkSession, sf_dir: str, cutoff: str) -> DataFrame:
    """events with ``ts >= cutoff`` where the predicate is applied to the
    STORED epoch-nanos long, so it reaches the parquet scan as a pushed
    filter (row-group/partition pruning at scale). Filtering the derived
    TIMESTAMP column instead would defeat pushdown — Catalyst can't
    invert timestamp_micros(ts div 1000) >= c back to the raw column.
    """
    from datetime import datetime, timezone

    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") != "bigint":
        return load_table(spark, sf_dir, "events").where(
            F.col("ts") >= F.lit(cutoff).cast("timestamp_ntz")
        )
    cutoff_ns = int(
        datetime.strptime(cutoff, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    ) * 1_000_000_000
    return df.where(F.col("ts") >= F.lit(cutoff_ns)).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can reference it."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
