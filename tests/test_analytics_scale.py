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


def test_durbin_watson_past_int64_ceiling(spark):
    """r13 ceiling-band widening: e = H*x - total in DECIMAL(38,0). The
    probe feeds the shared scoring core a synthetic hourly-cents relation
    whose H*cents product crosses 2^63 (the old int64 form would raise
    under ANSI) and checks the emitted dw against exact Python integers
    + the same round-to-9 rule."""
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        dw_over_hourly_cents,
    )

    cents = [10**18 + i * 7919 * 10**11 for i in range(12)]
    h = len(cents)
    assert h * max(cents) > 2**63 - 1, "probe must cross the int64 ceiling"
    hourly = spark.createDataFrame(
        [("hot", i, c) for i, c in enumerate(cents)],
        "event_type string, hour long, cents long",
    )
    total = sum(cents)
    e = [h * c - total for c in cents]
    see = sum(x * x for x in e)
    sdd = sum((e[i] - e[i - 1]) ** 2 for i in range(1, h))
    want = round(float(sdd) / float(see), 9)
    row = dw_over_hourly_cents(hourly).first()
    assert row.n_hours == h
    assert row.dw == want


def test_chi2_contingency_past_int64_ceiling(spark):
    """r13 ceiling-band widening: o*g and bt*tt in DECIMAL(38,0). The
    core takes the contingency relation directly, so the probe crosses
    2^63 (o*g ~ 1.5e20) with six rows instead of 3e9 events; terms are
    checked against exact Python integer numerators run through the
    identical IEEE fold order."""
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        chi2_over_contingency,
    )

    obs_rows = [
        ("a", 0, 4_000_000_000),
        ("a", 50, 6_000_000_007),
        ("b", 0, 5_500_000_001),
        ("b", 50, 4_499_999_998),
        ("c", 0, 9_999_999_999),
        ("c", 50, 1),
    ]
    g = sum(o for _, _, o in obs_rows)
    assert max(o for _, _, o in obs_rows) * g > 2**63 - 1
    obs = spark.createDataFrame(obs_rows, "key string, bin_lo long, o long")
    bt = {}
    tt = {}
    for k, b, o in obs_rows:
        bt[b] = bt.get(b, 0) + o
        tt[k] = tt.get(k, 0) + o
    want = {}
    for k in sorted(tt):
        chi2 = 0.0
        for b in sorted(bt):
            o = dict(((kk, bb), oo) for kk, bb, oo in obs_rows).get((k, b), 0)
            num = float(o * g - bt[b] * tt[k])  # exact int -> nearest double
            chi2 += num * num / float(bt[b] * tt[k]) / float(g)
        want[k] = chi2
    got = {r.key: r for r in chi2_over_contingency(obs).collect()}
    for k, r in got.items():
        assert r.n_events == tt[k]
        assert r.chi2 == want[k], k


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
