"""Stream-stream time-bounded join: only right events within the
window match; results checked against a hand-computed pairing."""

from __future__ import annotations

from datetime import datetime, timezone

from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.joins import (
    stream_stream_time_join,
)


def ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 0, minute, tzinfo=timezone.utc)


def test_stream_stream_join_within_window(spark, workdir):
    # left: "requests"; right: "confirmations" — match iff same key and
    # confirmation within [req_ts, req_ts + 30 min)
    left_rows = [
        ("k1", ts(0), "req1"),
        ("k2", ts(10), "req2"),
        ("k3", ts(20), "req3"),
    ]
    right_rows = [
        ("k1", ts(15), "conf-in"),       # +15m -> matches req1
        ("k2", ts(55), "conf-late"),     # +45m -> outside window
        ("k3", ts(20), "conf-exact"),    # +0m  -> matches req3 (inclusive start)
        ("k9", ts(5), "conf-nokey"),     # no left key
    ]
    schema = "key string, event_time timestamp, tag string"
    spark.createDataFrame(left_rows, schema).write.parquet(f"{workdir}/left")
    spark.createDataFrame(right_rows, schema).write.parquet(f"{workdir}/right")

    l_stream = spark.readStream.schema(schema).parquet(f"{workdir}/left")
    r_stream = spark.readStream.schema(schema).parquet(f"{workdir}/right")
    joined = stream_stream_time_join(
        l_stream, r_stream, key="key", within="30 minutes"
    )

    sink = ParquetTable(f"{workdir}/joined")
    (
        joined.writeStream.foreachBatch(lambda b, _i: sink.append(b))
        .option("checkpointLocation", f"{workdir}/cp")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {(r["join_key"], r["l_tag"], r["r_tag"]) for r in sink.read(spark).collect()}
    assert got == {("k1", "req1", "conf-in"), ("k3", "req3", "conf-exact")}


def test_stream_stream_left_outer_emits_unmatched(spark, workdir):
    """Left-outer: unmatched left rows emit null-extended once the
    watermark passes their eviction bound. A late high-ts sentinel on
    each side pushes both watermarks far past the real data so the
    null-extended rows flush before availableNow terminates."""
    far = ts(0).replace(hour=12)
    left_rows = [
        ("k1", ts(0), "req1"),     # matched
        ("k2", ts(10), "req2"),    # right exists but outside window
        ("k4", ts(20), "req4"),    # no right key at all
        ("wm", far, "l-sentinel"),
    ]
    right_rows = [
        ("k1", ts(15), "conf-in"),
        ("k2", ts(55), "conf-late"),
        ("wm2", far, "r-sentinel"),
    ]
    schema = "key string, event_time timestamp, tag string"
    spark.createDataFrame(left_rows, schema).write.parquet(f"{workdir}/l2")
    spark.createDataFrame(right_rows, schema).write.parquet(f"{workdir}/r2")

    l_stream = spark.readStream.schema(schema).parquet(f"{workdir}/l2")
    r_stream = spark.readStream.schema(schema).parquet(f"{workdir}/r2")
    joined = stream_stream_time_join(
        l_stream, r_stream, key="key", within="30 minutes",
        watermark="10 minutes", how="left_outer",
    )

    sink = ParquetTable(f"{workdir}/joined2")
    (
        joined.writeStream.foreachBatch(lambda b, _i: sink.append(b))
        .option("checkpointLocation", f"{workdir}/cp2")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["join_key"], r["l_tag"], r["r_tag"])
        for r in sink.read(spark).collect()
    }
    assert ("k1", "req1", "conf-in") in got           # matched pair
    assert ("k2", "req2", None) in got                # in-key, out-of-window
    assert ("k4", "req4", None) in got                # unmatched key
    assert not any(k == "k2" and t is not None for k, _, t in got)


def test_stream_stream_full_outer_emits_both_sides(spark, workdir):
    """Full-outer: unmatched rows from BOTH sides emit null-extended
    after the watermark passes (same sentinel technique as left-outer)."""
    far = ts(0).replace(hour=12)
    left_rows = [
        ("k1", ts(0), "req1"),      # matched
        ("k4", ts(20), "req4"),     # left-only
        ("wm", far, "l-sentinel"),
    ]
    right_rows = [
        ("k1", ts(15), "conf-in"),
        ("k7", ts(10), "conf-only"),  # right-only
        ("wm2", far, "r-sentinel"),
    ]
    schema = "key string, event_time timestamp, tag string"
    spark.createDataFrame(left_rows, schema).write.parquet(f"{workdir}/l3")
    spark.createDataFrame(right_rows, schema).write.parquet(f"{workdir}/r3")

    joined = stream_stream_time_join(
        spark.readStream.schema(schema).parquet(f"{workdir}/l3"),
        spark.readStream.schema(schema).parquet(f"{workdir}/r3"),
        key="key", within="30 minutes",
        watermark="10 minutes", how="full_outer",
    )
    sink = ParquetTable(f"{workdir}/joined3")
    (
        joined.writeStream.foreachBatch(lambda b, _i: sink.append(b))
        .option("checkpointLocation", f"{workdir}/cp3")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["l_tag"], r["r_tag"]) for r in sink.read(spark).collect()
    }
    assert ("req1", "conf-in") in got       # matched
    assert ("req4", None) in got            # left-only null-extended
    assert (None, "conf-only") in got       # right-only null-extended


def test_scd2_temporal_join_matches_every_event_exactly_once(spark):
    """Validity intervals partition each user's timeline, so the
    temporal join is 1:1 with events — including at change boundaries
    and zero-length intervals from equal-timestamp changes (a planted
    frame exercises both)."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a change at the same ts as an event; two changes at
        # one identical timestamp (zero-length interval)
        (1, t0, 1, "a", 1.0, None),
        (2, t0 + dt.timedelta(minutes=1), 1, "b", 1.0, None),
        (3, t0 + dt.timedelta(minutes=1), 1, "c", 1.0, None),  # same ts
        (4, t0 + dt.timedelta(minutes=2), 1, "c", 1.0, None),
        # user 2: single state
        (5, t0, 2, "a", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # the PRODUCTION interval builder — the pin covers the shared
    # definition both registered scd2 queries consume
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        scd2_history,
    )

    hist = scd2_history(ev).select("user_id", "valid_from", "valid_to")
    joined = ev.alias("e").join(
        hist.alias("h"),
        (F.col("e.user_id") == F.col("h.user_id"))
        & (F.col("e.ts") >= F.col("h.valid_from"))
        & (F.col("h.valid_to").isNull() | (F.col("e.ts") < F.col("h.valid_to"))),
    )
    assert joined.count() == ev.count()  # exactly one version per event
    assert (
        joined.select("e.event_id").distinct().count() == ev.count()
    )
