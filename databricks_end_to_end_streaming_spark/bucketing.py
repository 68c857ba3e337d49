"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of repeated fact-fact joins (orders x
lineitem every day) is re-shuffling both sides on the join key. Writing
both tables bucketed on that key with the same bucket count makes the
bucketing the physical distribution: Spark's bucketed scan satisfies the
join's required distribution and the Exchange disappears from the plan
(verified in tests/test_bucketing.py). sortBy within buckets also drops
the join's Sort.

This is the batch-table analog of the medallion tables' partitionBy
("type") layout (SURVEY T10): partitioning prunes scans on low-cardinality
dimensions; bucketing co-locates high-cardinality join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted-within-bucket)
    catalog table."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With both
    sides bucketed (same count, same key) this plans a shuffle-free
    sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
