"""Incremental time-series pattern search (streaming/timeseries_stage.py):
drained == batch bit-for-bit, slicing insensitivity, replay idempotence,
and the calendar-date (not corpus-relative-index) keying that makes the
fold correct when a later batch moves the corpus's first day."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.analytics import (
    timeseries_pattern_topk,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.timeseries_stage import (
    timeseries_stage,
    timeseries_topk_from_log,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_drained_stream_equals_batch(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t = ParquetTable(f"{workdir}/ts")
    stage = timeseries_stage(t)
    for i in range(3):
        stage(ev.where(F.col("event_id") % 3 == i), i)
    got = _rows(timeseries_topk_from_log(spark, t))
    want = _rows(timeseries_pattern_topk(spark, SF_DIR))
    assert got == want and len(got) > 0


def test_slicing_insensitive(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t1, t2 = ParquetTable(f"{workdir}/t1"), ParquetTable(f"{workdir}/t2")
    s1, s2 = timeseries_stage(t1), timeseries_stage(t2)
    for i in range(2):
        s1(ev.where(F.col("event_id") % 2 == i), i)
    for i in range(5):
        s2(ev.where(F.col("user_id") % 5 == i), i)
    assert _rows(timeseries_topk_from_log(spark, t1)) == _rows(
        timeseries_topk_from_log(spark, t2)
    )


def test_replay_is_idempotent(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t = ParquetTable(f"{workdir}/ts")
    stage = timeseries_stage(t)
    stage(ev.where(F.col("event_id") % 2 == 0), 0)
    stage(ev.where(F.col("event_id") % 2 == 1), 1)
    before = _rows(timeseries_topk_from_log(spark, t))
    stage(ev.where(F.col("event_id") % 2 == 1), 1)  # replay
    assert _rows(timeseries_topk_from_log(spark, t)) == before


def test_late_batch_moving_day_zero_folds_correctly(spark, workdir):
    """The corpus's EARLIEST day arrives in the LAST batch: a
    corpus-relative day index computed per batch would mis-anchor every
    earlier partial; calendar-date keying + read-side anchoring must
    reproduce the batch result regardless."""
    ev = load_table(spark, SF_DIR, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("d")).collect()[0]["d"]
    first_day = ev.where(F.to_date("ts") == F.lit(d0))
    rest = ev.where(F.to_date("ts") != F.lit(d0))
    t = ParquetTable(f"{workdir}/ts")
    stage = timeseries_stage(t)
    stage(rest, 0)
    stage(first_day, 1)  # day zero arrives last
    got = _rows(timeseries_topk_from_log(spark, t))
    want = _rows(timeseries_pattern_topk(spark, SF_DIR))
    assert got == want and len(got) > 0


def test_short_span_user_yields_no_window_not_a_crash(spark):
    """A user active fewer than TS_W distinct days must contribute NO
    subsequence — not crash the query (unfiltered, sequence(0, size-W)
    runs descending and slice(series, 0, W) throws). Mixed frame: one
    30-day user, one 3-day user."""
    import datetime as dt

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        TS_W,
        ts_pattern_topk_from_daily,
    )

    rows = [
        (1, dt.date(2024, 1, 1) + dt.timedelta(days=i), 100 + i)
        for i in range(30)
    ] + [(2, dt.date(2024, 1, 1) + dt.timedelta(days=i), 50) for i in range(3)]
    daily = spark.createDataFrame(
        rows, "user_id long, day date, cents long"
    )
    out = ts_pattern_topk_from_daily(daily).collect()
    assert len(out) > 0
    assert all(r["user_id"] == 1 for r in out)  # the 3-day user: no window
    assert all(r["corr"] is not None for r in out)


def test_sparse_first_week_pattern_is_gapfilled(spark):
    """A zero-event calendar day inside the corpus's first week must not
    shorten the pattern (which would NULL every correlation via
    zip_with padding): the pattern gap-fills to TS_W entries."""
    import datetime as dt

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        ts_pattern_topk_from_daily,
    )

    # day 3 of the corpus has no events AT ALL
    rows = [
        (u, dt.date(2024, 1, 1) + dt.timedelta(days=i), 100 * u + i)
        for u in (1, 2)
        for i in range(14)
        if i != 3
    ]
    daily = spark.createDataFrame(
        rows, "user_id long, day date, cents long"
    )
    out = ts_pattern_topk_from_daily(daily).collect()
    assert len(out) > 0
    assert all(r["corr"] is not None for r in out)


def test_corpus_scale_moments_do_not_overflow_int64(spark):
    """>3e9-cents/day synthetic corpus (the r8 headroom fix): the
    corpus-wide pattern's spp = sum(p_i^2) is ~1.1e20 here — past
    int64 — so the old 0L moment folds fail (ANSI overflow) or wrap;
    the DECIMAL(38,0) folds must reproduce the exact-arithmetic
    Pearson scores of a sequential big-int twin."""
    import datetime as dt
    import math

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        TS_W,
        ts_pattern_topk_from_daily,
    )

    base = 2_000_000_000  # 2e9 cents/user/day -> ~4e9 corpus-day
    rows = [
        (
            u,
            dt.date(2024, 1, 1) + dt.timedelta(days=i),
            base + 13_000_000 * ((i * (u + 2)) % 11),
        )
        for u in (1, 2)
        for i in range(14)
    ]
    daily = spark.createDataFrame(rows, "user_id long, day date, cents long")
    out = ts_pattern_topk_from_daily(daily).collect()
    assert len(out) > 0

    # sequential twin over exact Python ints (arbitrary precision)
    by_user: dict[int, dict[int, int]] = {}
    for u, d, c in rows:
        by_user.setdefault(u, {})[(d - dt.date(2024, 1, 1)).days] = c
    p = [sum(by_user[u].get(i, 0) for u in by_user) for i in range(TS_W)]
    assert sum(v * v for v in p) > 2**63 - 1  # the premise: int64 wraps
    expected: dict[tuple[int, int], float] = {}
    for u, days in by_user.items():
        lo, hi = min(days), max(days)
        series = [days.get(i, 0) for i in range(lo, hi + 1)]
        for s in range(len(series) - TS_W + 1):
            x = series[s : s + TS_W]
            sx, sp = sum(x), sum(p)
            sxx = sum(v * v for v in x)
            spp = sum(v * v for v in p)
            sxp = sum(v * q for v, q in zip(x, p))
            dx, dp = TS_W * sxx - sx * sx, TS_W * spp - sp * sp
            if dx > 0 and dp > 0:
                expected[(u, lo + s)] = float(TS_W * sxp - sx * sp) / (
                    math.sqrt(float(dx)) * math.sqrt(float(dp))
                )
    # 16 windows total < TS_TOPK, so the query returns ALL of them
    got = {(r["user_id"], r["start_day"]): r["corr"] for r in out}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert math.isclose(got[k], v, rel_tol=1e-12), (k, got[k], v)
