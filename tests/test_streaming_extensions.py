"""Windowed gold (append mode + watermark) and custom keyed state
(applyInPandasWithState) — the beyond-reference streaming semantics."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.sources import (
    events_to_wire,
    file_stream,
    generate_events,
    write_topic_files,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.medallion import (
    gold_windowed_stage,
)
from databricks_end_to_end_streaming_spark.streaming.stateful import (
    running_product_stats,
)
from tests.test_medallion import REGISTRY, build_raw

DAY = 86400
BASE = 1704067200  # 2024-01-01T00:00:00Z


def test_approx_distinct_within_rsd(spark):
    """approx_count_distinct stays within ~5x the 2% target rsd of the
    exact count on the driver tables (bounds the HLL sketch sanity)."""
    from databricks_end_to_end_streaming_spark.queries import all_queries

    rows = all_queries()["approx_distinct_users"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel_err < 0.10


def test_gold_windowed_emits_closed_days(spark, workdir):
    """Events spanning 4 days with a 1-day watermark, drained in one
    availableNow batch: final watermark = max_ts - 1d (early day 4), so
    the day-1 and day-2 windows close and emit; days 3-4 stay in state."""
    events = []
    for day in range(4):
        events += generate_events(
            20, seed=20 + day, v1_ratio=0.0, base_ts=BASE + day * DAY
        )
    raw = build_raw(spark, workdir, events)

    # bronze+silver inline (batch equivalents checked elsewhere)
    from databricks_end_to_end_streaming_spark.streaming.medallion import (
        bronze_stage,
        silver_stage,
    )

    bronze = ParquetTable(f"{workdir}/bronze", partition_by=["type"])
    silver = ParquetTable(f"{workdir}/silver", partition_by=["type"])
    bronze_stage(spark, raw, bronze, f"{workdir}/cp/bronze")
    silver_stage(spark, bronze, silver, f"{workdir}/cp/silver")

    gold = ParquetTable(f"{workdir}/gold_windowed")
    gold_windowed_stage(spark, silver, gold, f"{workdir}/cp/goldw")

    out = gold.read(spark)
    days = {r["day_start"].day for r in out.select("day_start").distinct().collect()}
    assert days == {1, 2}  # day 3 window not closed by watermark yet

    # emitted day-1 counts match a batch computation over silver
    silver_df = silver.read(spark)
    expected = (
        silver_df.where(
            (F.col("event_time") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
            & (F.col("event_time") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        )
        .groupBy("type", "color", "size")
        .count()
        .collect()
    )
    got_day1 = {
        (r["type"], r["color"], r["size"]): r["count_type"]
        for r in out.where(F.dayofmonth("day_start") == 1).collect()
    }
    assert got_day1 == {(r["type"], r["color"], r["size"]): r["count"] for r in expected}


def test_running_product_stats_accumulates_across_triggers(spark, workdir):
    """Keyed state survives across two availableNow drains: the second
    batch's stats include the first batch's counts."""
    first = generate_events(30, seed=31, v1_ratio=0.0)
    sink = ParquetTable(f"{workdir}/stats")

    import pandas as pd

    def write_events(events, path):
        pdf = pd.DataFrame(
            [
                {
                    "productId": e["productId"],
                    "type": e["type"],
                    "timestamp": e["timestamp"],
                }
                for e in events
            ]
        )
        spark.createDataFrame(pdf).write.mode("append").parquet(path)

    events_path = f"{workdir}/events"
    write_events(first, events_path)
    schema = "productId string, type string, timestamp long"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(events_path)
        q = (
            running_product_stats(stream)
            .writeStream.foreachBatch(lambda b, _id: sink.append(b))
            .outputMode("update")
            .option("checkpointLocation", f"{workdir}/cp/stats")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    out1 = sink.read(spark)
    totals1 = {
        r["productId"]: r["n_events"]
        for r in out1.groupBy("productId").agg(F.max("n_events").alias("n_events")).collect()
    }
    from collections import Counter

    expected1 = Counter(e["productId"] for e in first)
    assert totals1 == dict(expected1)

    # second drain with more events: counts accumulate (state persisted)
    second = generate_events(25, seed=32, v1_ratio=0.0, base_ts=BASE + DAY)
    write_events(second, events_path)
    run_once()
    out2 = sink.read(spark)
    totals2 = {
        r["productId"]: r["n_events"]
        for r in out2.groupBy("productId").agg(F.max("n_events").alias("n_events")).collect()
    }
    expected2 = expected1 + Counter(e["productId"] for e in second)
    assert totals2 == dict(expected2)

    # per-type breakdown of one product matches
    latest = (
        out2.where(F.col("productId") == list(expected2)[0])
        .orderBy(F.desc("n_events"))
        .first()
    )
    type_counts = json.loads(latest["type_counts_json"])
    all_events = first + second
    expected_types = Counter(
        e["type"] for e in all_events if e["productId"] == latest["productId"]
    )
    assert type_counts == dict(expected_types)


def test_sketch_rollup_matches_exact_daily_distinct(spark):
    """Daily distinct-user estimates produced by unioning hourly HLL
    sketches stay within HLL error bounds of the exact daily count
    (lgConfigK=14 -> ~1% rsd; assert a generous 5%)."""
    from databricks_end_to_end_streaming_spark.queries import all_queries
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["day"]: r["approx_users"]
        for r in all_queries()["sketch_rollup_daily_users"](spark, sf).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in load_table(spark, sf, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for day, est in got.items():
        assert abs(est - exact[day]) / max(exact[day], 1) < 0.05


def test_session_window_stage_emits_closed_sessions(spark, workdir):
    """Three bursts of events per type separated by > gap, with a late
    horizon: sessions whose end+gap precede the final watermark emit
    exactly once, each with the right event count."""
    from databricks_end_to_end_streaming_spark.streaming.medallion import (
        bronze_stage,
        session_window_stage,
        silver_stage,
    )

    events = []
    # two tight bursts (sessions) early on day 1, then a far-future event
    # to push the watermark past both sessions' close
    for burst, t0 in enumerate((BASE, BASE + 2 * 3600)):
        events += generate_events(
            12, seed=40 + burst, v1_ratio=0.0, base_ts=t0
        )
    events += generate_events(2, seed=50, v1_ratio=0.0, base_ts=BASE + 3 * DAY)
    raw = build_raw(spark, workdir, events)
    bronze = ParquetTable(f"{workdir}/bronze", partition_by=["type"])
    silver = ParquetTable(f"{workdir}/silver", partition_by=["type"])
    bronze_stage(spark, raw, bronze, f"{workdir}/cp/bronze")
    silver_stage(spark, bronze, silver, f"{workdir}/cp/silver")

    sessions = ParquetTable(f"{workdir}/sessions")
    session_window_stage(
        spark, silver, sessions, f"{workdir}/cp/sess", gap="30 minutes"
    )
    out = sessions.read(spark).collect()
    assert out  # closed sessions emitted
    # every emitted session closed before the final watermark, and
    # session bounds are consistent
    for r in out:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1
    # emitted counts reconcile with a batch recount over silver within
    # each session's bounds
    silver_df = silver.read(spark)
    for r in out:
        n = (
            silver_df.where(
                (F.col("type") == r["type"])
                & (F.col("event_time") >= r["session_start"])
                & (F.col("event_time") < r["session_end"])
            ).count()
        )
        assert n == r["n_events"], r
