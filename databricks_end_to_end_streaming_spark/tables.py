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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, applying type normalization."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # epoch-nanos long -> microsecond TIMESTAMP_NTZ (session tz is UTC,
        # so the tz-cast is a wall-clock no-op; matches DuckDB CAST(ts AS
        # TIMESTAMP)).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can reference it."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
