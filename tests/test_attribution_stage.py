"""Incremental last-touch attribution (streaming/attribution_stage.py):
drained == batch for time-ordered slicing on real testdata, cross-batch
credit and lookback expiry, replay idempotence, readStream drain."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.analytics import (
    attribution_last_touch,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.attribution_stage import (
    attribution_batch,
    attribution_from_log,
    attribution_index_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events_us(spark):
    ev = load_table(spark, SF_DIR, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )


def _rollup(df):
    return sorted(
        (r.channel, r.n_purchases, r.revenue) for r in df.collect()
    )


def test_drained_equals_batch_on_testdata(spark, workdir):
    e = _events_us(spark)
    lo, hi = e.agg(F.min("us"), F.max("us")).first()
    cuts = [lo + (hi - lo) * i // 3 for i in (1, 2)]
    out = ParquetTable(f"{workdir}/attributed")
    touch = ParquetTable(f"{workdir}/touch")
    slices = [
        e.where(F.col("us") <= cuts[0]),
        e.where((F.col("us") > cuts[0]) & (F.col("us") <= cuts[1])),
        e.where(F.col("us") > cuts[1]),
    ]
    for bid, sl in enumerate(slices):
        attribution_batch(sl, out, touch, bid)
    got = _rollup(attribution_from_log(spark, out))
    want = _rollup(attribution_last_touch(spark, SF_DIR))
    assert got == want


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "value double, us long"
    )


US_H = 3_600_000_000  # one hour in µs


def test_cross_batch_credit_and_expiry(spark, workdir):
    t0 = int(datetime(2024, 1, 10).timestamp() * 1e6)
    out = ParquetTable(f"{workdir}/attributed")
    touch = ParquetTable(f"{workdir}/touch")
    # batch 0: user 1 clicks; user 2 views (8 days before their purchase)
    attribution_batch(
        _mk(spark, [
            (1, 1, "click", 0.0, t0),
            (2, 2, "view", 0.0, t0),
        ]), out, touch, 0,
    )
    # batch 1: user 1 purchases an hour later (credited to the batch-0
    # click); user 2 purchases 8 days later (expired -> direct)
    attribution_batch(
        _mk(spark, [
            (3, 1, "purchase", 5.0, t0 + US_H),
            (4, 2, "purchase", 7.0, t0 + 8 * 24 * US_H),
        ]), out, touch, 1,
    )
    got = {
        r.channel: (r.n_purchases, r.revenue)
        for r in attribution_from_log(spark, out).collect()
    }
    assert got == {"click": (1, 5.0), "direct": (1, 7.0)}


def test_newer_batch_touch_beats_state(spark, workdir):
    t0 = int(datetime(2024, 1, 10).timestamp() * 1e6)
    out = ParquetTable(f"{workdir}/attributed")
    touch = ParquetTable(f"{workdir}/touch")
    attribution_batch(_mk(spark, [(1, 1, "view", 0.0, t0)]), out, touch, 0)
    # batch 1 carries its own later click before the purchase
    attribution_batch(
        _mk(spark, [
            (2, 1, "click", 0.0, t0 + US_H),
            (3, 1, "purchase", 9.0, t0 + 2 * US_H),
        ]), out, touch, 1,
    )
    got = {r.channel for r in attribution_from_log(spark, out).collect()}
    assert got == {"click"}


def test_replay_is_idempotent(spark, workdir):
    e = _events_us(spark)
    mid = e.agg(F.expr("(min(us) + max(us)) div 2")).first()[0]
    out = ParquetTable(f"{workdir}/attributed")
    touch = ParquetTable(f"{workdir}/touch")
    attribution_batch(e.where(F.col("us") <= mid), out, touch, 0)
    attribution_batch(e.where(F.col("us") > mid), out, touch, 1)
    before = _rollup(attribution_from_log(spark, out))
    attribution_batch(e.where(F.col("us") > mid), out, touch, 1)  # replay
    assert _rollup(attribution_from_log(spark, out)) == before


def test_readstream_wrapper_drains(spark, workdir):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    src = f"{workdir}/src"
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).parquet(src)
    )
    out = ParquetTable(f"{workdir}/attributed")
    touch = ParquetTable(f"{workdir}/touch")
    attribution_index_stage(stream, out, touch, f"{workdir}/ckpt")
    got = _rollup(attribution_from_log(spark, out))
    want = _rollup(attribution_last_touch(spark, SF_DIR))
    assert got == want
