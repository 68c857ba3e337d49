"""Incremental moment statistics: cross-batch accumulation equals the
one-shot batch computation bit-for-bit, and replays never double-add."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.moments import (
    finalize_stats,
    moments_stage,
    partial_moments,
    summed_moments,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_type string, cents long, day long")


ROWS = [
    ("a", 100, 0), ("a", 250, 1), ("a", 175, 2), ("a", 300, 3),
    ("b", 50, 0), ("b", 60, 1), ("b", 75, 2),
]


def test_incremental_equals_batch_bitwise(spark, workdir):
    t = ParquetTable(f"{workdir}/moments")
    stage = moments_stage(t, "event_type", F.col("cents"), F.col("day"))
    # three micro-batches
    stage(_events(spark, ROWS[:3]), 0)
    stage(_events(spark, ROWS[3:5]), 1)
    stage(_events(spark, ROWS[5:]), 2)

    inc = {
        r["key"]: r
        for r in finalize_stats(
            summed_moments(spark, t), scale=100.0
        ).collect()
    }
    batch = {
        r["key"]: r
        for r in finalize_stats(
            partial_moments(
                _events(spark, ROWS), "event_type", F.col("cents"), F.col("day")
            ),
            scale=100.0,
        ).collect()
    }
    assert set(inc) == {"a", "b"}
    for k in inc:
        assert inc[k]["n"] == batch[k]["n"]
        # bit-for-bit: moments are exact integers, finalize is the same
        # IEEE expression on both paths
        assert inc[k]["corr_xy"] == batch[k]["corr_xy"], k
        assert inc[k]["slope_x_per_y"] == batch[k]["slope_x_per_y"], k
        assert inc[k]["stddev_x"] == batch[k]["stddev_x"], k


def test_replay_does_not_double_add(spark, workdir):
    t = ParquetTable(f"{workdir}/moments_replay")
    stage = moments_stage(t, "event_type", F.col("cents"), F.col("day"))
    stage(_events(spark, ROWS[:4]), 0)
    before = summed_moments(spark, t).collect()
    stage(_events(spark, ROWS[:4]), 0)  # foreachBatch replay, same id
    after = summed_moments(spark, t).collect()
    assert sorted(map(str, before)) == sorted(map(str, after))
    row = {r["key"]: r for r in after}["a"]
    assert row["n"] == 4
    assert row["sx"] == 100 + 250 + 175 + 300


def test_compaction_preserves_the_fold(spark, workdir):
    """Compacting the partial log (many tiny batch files -> few) must
    not change the summed moments."""
    t = ParquetTable(f"{workdir}/moments_compact")
    stage = moments_stage(t, "event_type", F.col("cents"), F.col("day"))
    for i in range(6):
        stage(_events(spark, [ROWS[i % len(ROWS)]]), i)
    before = sorted(map(str, summed_moments(spark, t).collect()))
    t.compact(spark)
    after = sorted(map(str, summed_moments(spark, t).collect()))
    assert before == after


def test_moments_stage_over_real_stream(spark, workdir):
    """Wired into an actual readStream -> foreachBatch -> availableNow
    query: two drains over a growing directory accumulate to the same
    statistics as one batch pass over everything."""
    data_dir = f"{workdir}/stream_src"
    t = ParquetTable(f"{workdir}/stream_moments")

    def write(rows):
        _events(spark, rows).write.mode("append").parquet(data_dir)

    def drain():
        schema = "event_type string, cents long, day long"
        stream = spark.readStream.schema(schema).parquet(data_dir)
        q = (
            stream.writeStream.foreachBatch(
                moments_stage(t, "event_type", F.col("cents"), F.col("day"))
            )
            .option("checkpointLocation", f"{workdir}/ckpt_moments")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write(ROWS[:4])
    drain()
    write(ROWS[4:])
    drain()

    inc = {
        r["key"]: r
        for r in finalize_stats(
            summed_moments(spark, t), scale=100.0
        ).collect()
    }
    batch = {
        r["key"]: r
        for r in finalize_stats(
            partial_moments(
                _events(spark, ROWS), "event_type", F.col("cents"), F.col("day")
            ),
            scale=100.0,
        ).collect()
    }
    assert set(inc) == set(batch)
    for k in inc:
        assert inc[k]["n"] == batch[k]["n"]
        assert inc[k]["corr_xy"] == batch[k]["corr_xy"], k


def test_histogram_rollup_merge_equals_direct(spark):
    """Mergeability proof (the KMV-rollup analog): daily bins obtained
    by merging the hourly summaries equal daily bins computed straight
    from raw rows, bit-for-bit — the property that lets a production
    pipeline persist hourly summaries and never rescan."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        HIST_BIN_CENTS,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    base = ev.select(
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hour"),
        F.call_function("div", cents, F.lit(HIST_BIN_CENTS)).alias("bin"),
    )
    merged = (
        base.groupBy("day", "hour", "bin")
        .agg(F.count("*").alias("cnt"))
        .groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = base.groupBy("day", "bin").agg(F.count("*").alias("cnt"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_histogram_quantile_within_bin_width_of_exact(spark):
    """The reported p50 lower bound brackets the exact median within
    one bin width — the fixed-histogram error contract."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        HIST_BIN_CENTS,
        histogram_quantile_rollup,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["day"]: r["p50_lo_cents"]
        for r in histogram_quantile_rollup(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    exact = (
        ev.select(F.to_date("ts").alias("day"), cents.alias("cents"))
        .groupBy("day")
        .agg(
            F.expr("percentile(cents, 0.5)").alias("med")
        )
        .collect()
    )
    for r in exact:
        day = r["day"].strftime("%Y-%m-%d")
        lo = got[day]
        assert lo <= r["med"] < lo + 2 * HIST_BIN_CENTS, (day, lo, r["med"])
