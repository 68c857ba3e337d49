"""Past-int64-ceiling probes for the r12 DECIMAL(38,0) moment widenings.

The n*sxx-style moment products in corr_value_day_per_type and
zscore_event_anomalies are ~n² * cents², measured 2e16 at sf0.1 — they
crossed int64 at ~21× that events volume, below the brief's 100× bar.
These probes run the PRODUCTION query functions over a synthetic events
table big enough that n*sxx > 2^63 and compare against arbitrary-
precision Python integer moments, proving the widened arithmetic is
exact where the old int64 form would have failed (ANSI throw) or
wrapped (non-ANSI)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

N = 300_000  # one event type; cents up to 56000 -> n*sxx ~ 9e19 > 2^63
OUTLIERS = {13, 141_421, 271_828}  # planted 3-sigma spikes


def _cents(i: int) -> int:
    return 1_000_000 if i in OUTLIERS else (i * 7919) % 56000 + 1


@pytest.fixture(scope="module")
def big_events_dir(spark, tmp_path_factory):
    """Synthetic sf_dir with ONE events.parquet: 300k rows of one type,
    2-decimal values (exact cents round-trip through DECIMAL(18,2)),
    30 distinct days."""
    d = tmp_path_factory.mktemp("bigevents")
    (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            (
                F.to_timestamp(F.lit("2025-01-01 00:00:00"))
                + F.make_interval(days=(F.col("id") % 30).cast("int"))
            )
            .cast("timestamp_ntz")
            .alias("ts"),
            (F.col("id") % 1000).alias("user_id"),
            F.lit("hot").alias("event_type"),
            F.when(
                F.col("id").isin(*OUTLIERS), F.lit(10_000.00)
            )
            .otherwise(((F.col("id") * 7919) % 56000 + 1) / 100.0)
            .alias("value"),
            F.lit("{}").alias("props"),
        )
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(str(d / "events.parquet"))
    )
    return str(d)


def _moments():
    n = N
    sx = sy = sxx = syy = sxy = 0
    for i in range(N):
        c, day = _cents(i), i % 30
        sx += c
        sy += day
        sxx += c * c
        syy += day * day
        sxy += c * day
    assert n * sxx > 2**63 - 1, "probe must cross the int64 ceiling"
    return n, sx, sy, sxx, syy, sxy


def test_corr_value_day_past_int64_ceiling(spark, big_events_dir):
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        corr_value_day_per_type,
    )

    n, sx, sy, sxx, syy, sxy = _moments()
    num = float(n * sxy - sx * sy)
    dxx = float(n * sxx - sx * sx)
    dyy = float(n * syy - sy * sy)
    row = corr_value_day_per_type(spark, big_events_dir).first()
    assert row.n == n
    assert row.corr_value_day == num / (math.sqrt(dxx) * math.sqrt(dyy))
    assert row.slope_cents_per_day == num / dyy
    assert row.stddev_value == math.sqrt(dxx) / (100.0 * float(n))


def test_zscore_past_int64_ceiling(spark, big_events_dir):
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        zscore_event_anomalies,
    )

    n, sx, _, sxx, _, _ = _moments()
    den = math.sqrt(float(n * sxx - sx * sx))
    want = {}
    for i in range(N):
        z = float(_cents(i) * n - sx) / den
        if abs(z) >= 3.0:
            want[i] = z
    got = {
        r.event_id: r.zscore
        for r in zscore_event_anomalies(spark, big_events_dir).collect()
    }
    assert set(want) >= OUTLIERS  # the planted spikes must surface
    assert got == want


def test_robust_zscore_planted_outliers_and_zero_mad(spark, tmp_path):
    """The r12 MAD gate: planted spikes surface with exact modified-z,
    inliers stay out, a majority-constant (MAD = 0) type is excluded
    entirely, and — the reason the robust gate exists — the spike
    magnitudes do NOT drag the center the way they drag mean/stddev."""
    import os

    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        robust_zscore_event_anomalies,
    )

    rows = []
    # type "spread": values 10.00..10.99 cycling -> median 1050 cents,
    # MAD ~ 25 cents; two huge planted spikes
    for i in range(200):
        rows.append((i, "2025-01-01 00:00:00", i % 7, "spread",
                     10.00 + (i % 100) / 100.0, "{}"))
    rows.append((900, "2025-01-01 00:00:00", 1, "spread", 500.00, "{}"))
    rows.append((901, "2025-01-01 00:00:00", 2, "spread", -500.00, "{}"))
    # type "flat": constant value -> MAD 0 -> excluded even though one
    # row differs wildly (population z WOULD have flagged inliers here)
    for i in range(50):
        rows.append((1000 + i, "2025-01-01 00:00:00", 3, "flat", 5.00, "{}"))
    rows.append((1099, "2025-01-01 00:00:00", 4, "flat", 9999.00, "{}"))

    sf = os.path.join(str(tmp_path), "madsf")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
        os.path.join(sf, "events.parquet")
    )

    got = {r.event_id: r for r in
           robust_zscore_event_anomalies(spark, sf).collect()}
    assert all(r.event_type == "spread" for r in got.values())
    assert 900 in got and 901 in got

    # exact reference: median/MAD by nearest-rank over cents
    cents = sorted(round((10.00 + (i % 100) / 100.0) * 100)
                   for i in range(200)) + [50000, -50000]
    cents.sort()
    n = len(cents)
    med = cents[(n + 1) // 2 - 1]
    devs = sorted(abs(c - med) for c in cents)
    mad = devs[(n + 1) // 2 - 1]
    assert got[900].modified_z == (6745 * (50000 - med)) / (10000 * mad)
    assert got[901].modified_z == (6745 * (-50000 - med)) / (10000 * mad)
    # every reported row clears the exact integer threshold
    for r in got.values():
        assert abs(r.modified_z) >= 3.5 - 1e-12
