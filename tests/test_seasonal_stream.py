"""Prequential seasonal monitor (streaming/seasonal.py): the drained
train profile scores the holdout bit-for-bit like the batch backtest's
seasonal columns; scoring is strictly prequential; replays are safe."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.analytics import (
    BACKTEST_TEST_DAYS,
    seasonal_naive_backtest,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.seasonal import (
    profile_from_log,
    score_against_profile,
    seasonal_monitor_stage,
    seasonal_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _split(spark):
    ev = load_table(spark, SF_DIR, "events")
    d1 = ev.agg(F.max(F.to_date("ts"))).first()[0]
    cut = F.date_sub(F.lit(d1), BACKTEST_TEST_DAYS)
    train = ev.where(F.to_date("ts") <= cut)
    test = ev.where(F.to_date("ts") > cut)
    return train, test


def test_drained_profile_scores_holdout_like_batch_backtest(spark, workdir):
    train, test = _split(spark)
    t = ParquetTable(f"{workdir}/prof")
    stage = seasonal_stage(t)
    for i in range(3):  # arbitrary train slicing
        stage(train.where(F.col("event_id") % 3 == i), i)
    prof = profile_from_log(spark, t)
    got = {
        (r.event_type, r.hr): (r.n_train, r.n_scored, r.forecast_cents, r.mae_cents)
        for r in score_against_profile(test, prof).collect()
    }
    want = {
        (r.event_type, r.hr): (r.n_train, r.n_test, r.forecast_cents, r.mae_seasonal)
        for r in seasonal_naive_backtest(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0  # bit-for-bit incl. doubles


def test_scoring_is_strictly_prequential(spark, workdir):
    train, _ = _split(spark)
    t = ParquetTable(f"{workdir}/prof")
    stage = seasonal_stage(t)
    stage(train.where(F.col("event_id") % 2 == 0), 0)
    stage(train.where(F.col("event_id") % 2 == 1), 1)
    # profile "before batch 1" must exclude batch 1's own cells
    p0 = {
        (r.event_type, r.hr): (r.m, r.s)
        for r in profile_from_log(spark, t, before_batch=1).collect()
    }
    only0 = ParquetTable(f"{workdir}/only0")
    seasonal_stage(only0)(train.where(F.col("event_id") % 2 == 0), 0)
    want = {
        (r.event_type, r.hr): (r.m, r.s)
        for r in profile_from_log(spark, only0).collect()
    }
    assert p0 == want


def test_replay_does_not_double_count(spark, workdir):
    train, _ = _split(spark)
    t = ParquetTable(f"{workdir}/prof")
    stage = seasonal_stage(t)
    stage(train.where(F.col("event_id") % 2 == 0), 0)
    stage(train.where(F.col("event_id") % 2 == 1), 1)
    before = {
        (r.event_type, r.hr): (r.m, r.s)
        for r in profile_from_log(spark, t).collect()
    }
    stage(train.where(F.col("event_id") % 2 == 1), 1)  # replay
    after = {
        (r.event_type, r.hr): (r.m, r.s)
        for r in profile_from_log(spark, t).collect()
    }
    assert after == before


def test_streaming_wrapper_writes_reports(spark, workdir):
    train, _ = _split(spark)
    src = f"{workdir}/src"
    train.write.parquet(src)
    source = spark.readStream.schema(train.schema).parquet(src)
    prof_t = ParquetTable(f"{workdir}/prof")
    rep_t = ParquetTable(f"{workdir}/rep")
    seasonal_monitor_stage(source, prof_t, rep_t, f"{workdir}/ckpt")
    # single availableNow batch: profile written; no report (no older
    # profile existed when the first batch was scored)
    assert profile_from_log(spark, prof_t).count() > 0
    assert not rep_t.exists() or rep_t.read(spark).count() == 0
