"""Z-order layout: partitions become multi-dimensional blocks (tight on
EVERY clustered column) instead of single-column stripes."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.layout import (
    zorder_by,
    zorder_value,
)


def _grid(spark, side=64):
    return spark.createDataFrame(
        [(x, y) for x in range(side) for y in range(side)], "x long, y long"
    )


def _max_span(df, col, n_parts):
    parted = df.withColumn("pid", F.spark_partition_id())
    spans = (
        parted.groupBy("pid")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .collect()
    )
    assert len(spans) >= n_parts // 2  # range partitioner actually split
    return max(r["span"] for r in spans)


def test_zorder_bounds_both_dimensions(spark):
    df = _grid(spark)
    n = 16
    z = zorder_by(df, ["x", "y"], bits=6, num_partitions=n)
    z = z.localCheckpoint(eager=True)  # pin partition assignment
    stripes = df.repartitionByRange(n, "x").sortWithinPartitions("x")
    stripes = stripes.localCheckpoint(eager=True)

    # stripe layout: x is tight but y spans the whole domain
    assert _max_span(stripes, "y", n) >= 60
    # z-order: BOTH dimensions bounded well below the 64-wide domain
    assert _max_span(z, "x", n) <= 32
    assert _max_span(z, "y", n) <= 32


def test_zorder_preserves_rows(spark):
    df = _grid(spark, side=16)
    z = zorder_by(df, ["x", "y"], bits=4, num_partitions=4)
    assert sorted(map(tuple, z.collect())) == sorted(map(tuple, df.collect()))


def test_zorder_value_interleaves(spark):
    df = spark.createDataFrame([(0, 0), (255, 255)], "x long, y long")
    with_z, zc = zorder_value(df, ["x", "y"], bits=8)
    vals = {(r["x"], r["y"]): r[zc] for r in with_z.collect()}
    assert vals[(0, 0)] == 0
    assert vals[(255, 255)] == (1 << 16) - 1  # all 16 interleaved bits set


def test_constant_column_degenerates(spark):
    df = spark.createDataFrame([(1, 5), (2, 5)], "x long, y long")
    z = zorder_by(df, ["x", "y"], bits=4, num_partitions=2)
    assert sorted(map(tuple, z.collect())) == [(1, 5), (2, 5)]
