"""Medallion pipeline end-to-end (SURVEY M1, §5): seeded generator ->
topic files -> ingest -> bronze -> silver -> gold, golden-value checks,
trigger re-run idempotence, v1/v2 evolution contract, watermarked
variant."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.registry import InMemorySchemaRegistry
from databricks_end_to_end_streaming_spark.schemas import (
    PRODUCT_V1_JSON,
    PRODUCT_V2_JSON,
)
from databricks_end_to_end_streaming_spark.sources import (
    events_to_wire,
    file_stream,
    generate_events,
    write_topic_files,
)
from databricks_end_to_end_streaming_spark.streaming import (
    ParquetTable,
    ingest_avro_stream,
    run_pipeline,
)
from databricks_end_to_end_streaming_spark.streaming.medallion import (
    bronze_stage,
    gold_transform,
    silver_stage,
)

REGISTRY = InMemorySchemaRegistry({1: PRODUCT_V1_JSON, 2: PRODUCT_V2_JSON})


def build_raw(spark, workdir, events):
    recs = events_to_wire(events)
    write_topic_files(spark, recs, f"{workdir}/topic")
    raw = ParquetTable(f"{workdir}/raw")
    ingest_avro_stream(
        file_stream(spark, f"{workdir}/topic"),
        REGISTRY,
        raw,
        checkpoint=f"{workdir}/cp/ingest",
    )
    return raw


def expected_gold(events, cutoff_ts: int):
    """Pure-Python oracle for the gold aggregate over deduped events."""
    seen = {}
    for ev in events:
        seen.setdefault(ev["eventId"], ev)  # dedup keeps one per eventId
    groups: Counter = Counter()
    nn_color: Counter = Counter()  # count(color) skips NULLs
    nn_size: Counter = Counter()
    last: dict = {}
    for ev in seen.values():
        if ev["timestamp"] < cutoff_ts:
            continue
        key = (ev["type"], ev.get("color"), ev.get("size"))
        groups[key] += 1
        nn_color[key] += ev.get("color") is not None
        nn_size[key] += ev.get("size") is not None
        last[key] = max(last.get(key, 0), ev["timestamp"])
    return groups, nn_color, nn_size, last


def test_full_pipeline_golden_values(spark, workdir):
    events = generate_events(120, seed=11, v1_ratio=0.3, duplicate_ratio=0.15)
    n_unique = len({e["eventId"] for e in events})
    assert n_unique < len(events)  # generator really planted duplicates

    raw = build_raw(spark, workdir, events)
    tables = run_pipeline(spark, workdir, raw, cutoff="2024-01-01 00:30:00")

    bronze = tables["bronze"].read(spark)
    silver = tables["silver"].read(spark)
    gold = tables["gold"].read(spark)

    # bronze: one flat row per raw row, v1 rows null size/color (T9)
    assert bronze.count() == len(events)
    n_v1 = sum(1 for e in events if e["_version"] == 1)
    assert bronze.filter(F.col("size").isNull()).count() == n_v1

    # silver: exactly one row per eventId (A2)
    assert silver.count() == n_unique
    assert silver.select("eventId").distinct().count() == n_unique
    # typed event time + reference-format string both present (Q2)
    assert dict(silver.dtypes)["event_time"] == "timestamp"
    one = silver.select("timestamp", "timestamp_fmt").first()
    assert one["timestamp_fmt"].count("-") == 2

    # gold: golden values from the pure-python oracle. The triple count
    # (Q5) is redundant only where the grouping keys are non-null: v1
    # rows land in NULL-color/size groups where count(color)=0 — exactly
    # the reference's count-of-grouping-column semantics.
    cutoff_ts = 1704067200 + 30 * 60
    groups, nn_color, nn_size, last = expected_gold(events, cutoff_ts)
    got = {
        (r["type"], r["color"], r["size"]): r
        for r in gold.collect()
    }
    assert len(got) == len(groups)
    for key, n in groups.items():
        row = got[key]
        assert row["count_type"] == n
        assert row["count_color"] == nn_color[key]
        assert row["count_size"] == nn_size[key]
        assert int(row["last"].timestamp()) == last[key]


def test_pipeline_rerun_is_idempotent(spark, workdir):
    events = generate_events(40, seed=12, duplicate_ratio=0.1)
    raw = build_raw(spark, workdir, events)
    t1 = run_pipeline(spark, workdir, raw, cutoff="2024-01-01 00:00:00")
    counts1 = {k: t.read(spark).count() for k, t in t1.items()}
    # re-run the whole DAG with the same checkpoints: drained sources
    t2 = run_pipeline(spark, workdir, raw, cutoff="2024-01-01 00:00:00")
    counts2 = {k: t.read(spark).count() for k, t in t2.items()}
    assert counts1 == counts2


def test_incremental_arrival_appends_only_new(spark, workdir):
    """New topic files after the first drain flow through bronze without
    reprocessing old rows (S3 incremental semantics)."""
    first = generate_events(30, seed=13)
    raw = build_raw(spark, workdir, first)
    bronze = ParquetTable(f"{workdir}/bronze", partition_by=["type"])
    bronze_stage(spark, raw, bronze, f"{workdir}/cp/bronze")
    assert bronze.read(spark).count() == 30

    second = generate_events(20, seed=14, base_ts=1704067200 + 86400)
    recs = events_to_wire(second, seed=9)
    write_topic_files(spark, recs, f"{workdir}/topic")
    ingest_avro_stream(
        file_stream(spark, f"{workdir}/topic"),
        REGISTRY,
        raw,
        checkpoint=f"{workdir}/cp/ingest",
    )
    bronze_stage(spark, raw, bronze, f"{workdir}/cp/bronze")
    assert bronze.read(spark).count() == 50


def test_silver_watermarked_dedup(spark, workdir):
    """The bounded-state variant (dropDuplicatesWithinWatermark) also
    removes the planted duplicates (duplicates arrive adjacent, well
    within the watermark)."""
    events = generate_events(60, seed=15, duplicate_ratio=0.2)
    n_unique = len({e["eventId"] for e in events})
    raw = build_raw(spark, workdir, events)
    bronze = ParquetTable(f"{workdir}/bronze", partition_by=["type"])
    silver = ParquetTable(f"{workdir}/silver", partition_by=["type"])
    bronze_stage(spark, raw, bronze, f"{workdir}/cp/bronze")
    silver_stage(
        spark, bronze, silver, f"{workdir}/cp/silver", watermark="2 hours"
    )
    assert silver.read(spark).count() == n_unique


def test_gold_transform_batch_semantics(spark):
    """gold_transform on a batch frame: filter + triple-count + max (A1,
    F3, Q3-fixed) — checked against a hand computation."""
    rows = [
        ("shirt", "red", "m", 1704067200),
        ("shirt", "red", "m", 1704067300),
        ("pants", None, None, 1704067400),
        ("shirt", "blue", "s", 1704000000),  # before cutoff
    ]
    df = spark.createDataFrame(
        rows, "type string, color string, size string, timestamp long"
    ).withColumn("event_time", F.timestamp_seconds("timestamp"))
    out = gold_transform(df, "2024-01-01 00:00:00").collect()
    by_key = {(r["type"], r["color"], r["size"]): r for r in out}
    assert by_key[("shirt", "red", "m")]["count_type"] == 2
    assert int(by_key[("shirt", "red", "m")]["last"].timestamp()) == 1704067300
    # count() on a NULL grouping column is 0 — intentional fidelity to
    # count(color) semantics; the triple counts diverge only here.
    assert by_key[("pants", None, None)]["count_type"] == 1
    assert by_key[("pants", None, None)]["count_color"] == 0
