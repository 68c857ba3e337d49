"""Streaming twins of the statistics quartet (streaming/stats_stage.py):
each drained log scores bit-for-bit identical to its registered batch
query (the shared-core guarantee), and replays never double-add."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.stats_stage import (
    benford_audit,
    benford_stage,
    cramers_stage,
    cramers_v_assoc,
    ks_drift,
    ks_value_stage,
    spearman_counts_stage,
    spearman_trend,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "event_type", "value", "ts", "event_id"
    )


def _three_slices(ev):
    return [ev.where(F.col("event_id") % 3 == i) for i in range(3)]


def test_benford_drained_equals_batch_and_replays(spark, workdir):
    ev = _events(spark)
    t = ParquetTable(f"{workdir}/benford")
    stage = benford_stage(t)
    for i, sl in enumerate(_three_slices(ev)):
        stage(sl, i)
    got = sorted(map(tuple, benford_audit(spark, t).collect()))
    want = sorted(
        map(tuple, all_queries()["benford_value_audit"](spark, SF_DIR).collect())
    )
    assert got == want and len(got) > 0
    stage(_three_slices(ev)[1], 1)  # replay
    assert sorted(map(tuple, benford_audit(spark, t).collect())) == want


def test_cramers_drained_equals_batch_and_replays(spark, workdir):
    ev = _events(spark)
    t = ParquetTable(f"{workdir}/cramers")
    stage = cramers_stage(t)
    for i, sl in enumerate(_three_slices(ev)):
        stage(sl, i)
    got = [tuple(r) for r in cramers_v_assoc(spark, t).collect()]
    want = [
        tuple(r)
        for r in all_queries()["cramers_v_type_weekday"](spark, SF_DIR).collect()
    ]
    assert got == want and len(got) == 1
    stage(_three_slices(ev)[0], 0)  # replay
    assert [tuple(r) for r in cramers_v_assoc(spark, t).collect()] == want


def test_ks_drained_on_midpoint_split_equals_batch(spark, workdir):
    """Slice the corpus at the batch query's exact µs midpoint into
    reference (batch 0) and current (batch 1) — ks_drift reproduces
    ks_test_value_drift bit-for-bit; replay is idempotent; the
    prequential as-of view pins."""
    ev = _events(spark)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = ev.agg(F.min(us).alias("a"), F.max(us).alias("b")).first()
    mid = (lo + hi) // 2
    t = ParquetTable(f"{workdir}/ksvalues")
    stage = ks_value_stage(t)
    stage(ev.where(us <= F.lit(mid)), 0)
    stage(ev.where(us > F.lit(mid)), 1)
    got = [tuple(r) for r in ks_drift(spark, t, reference_batch=0).collect()]
    want = [
        tuple(r)
        for r in all_queries()["ks_test_value_drift"](spark, SF_DIR).collect()
    ]
    assert got == want and len(got) > 0
    stage(ev.where(us > F.lit(mid)), 1)  # replay
    got2 = [tuple(r) for r in ks_drift(spark, t, reference_batch=0).collect()]
    assert got2 == want
    # a third batch widens the current window; up_to_batch pins the view
    stage(ev.where(us > F.lit(mid)).limit(40), 2)
    widened = ks_drift(spark, t, reference_batch=0).collect()
    assert sum(r.n_actual for r in widened) == sum(r[2] for r in want) + 40
    got3 = [
        tuple(r)
        for r in ks_drift(spark, t, reference_batch=0, up_to_batch=1).collect()
    ]
    assert got3 == want


def test_robust_stats_share_the_ks_value_log(spark, workdir):
    """The SAME accumulated value log powers KS and the robust trio:
    after three arbitrary slices, robust_stats_from_log reproduces the
    registered robust query bit-for-bit."""
    from databricks_end_to_end_streaming_spark.streaming.stats_stage import (
        robust_stats_from_log,
    )

    ev = _events(spark)
    t = ParquetTable(f"{workdir}/ksvalues_shared")
    stage = ks_value_stage(t)
    for i, sl in enumerate(_three_slices(ev)):
        stage(sl, i)
    got = [tuple(r) for r in robust_stats_from_log(spark, t).collect()]
    want = [
        tuple(r)
        for r in all_queries()["robust_value_stats_per_type"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == want and len(got) > 0
    stage(_three_slices(ev)[2], 2)  # replay
    assert [
        tuple(r) for r in robust_stats_from_log(spark, t).collect()
    ] == want


def test_spearman_drained_equals_batch_and_replays(spark, workdir):
    ev = _events(spark)
    t = ParquetTable(f"{workdir}/uvcounts")
    stage = spearman_counts_stage(t)
    for i, sl in enumerate(_three_slices(ev)):
        stage(sl, i)
    got = [tuple(r) for r in spearman_trend(spark, t).collect()]
    want = [
        tuple(r)
        for r in all_queries()["spearman_trend_per_type"](spark, SF_DIR).collect()
    ]
    assert got == want and len(got) > 0
    stage(_three_slices(ev)[2], 2)  # replay
    assert [tuple(r) for r in spearman_trend(spark, t).collect()] == want


def test_spearman_log_is_a_count_monoid_not_an_event_log(spark, workdir):
    """Rows sharing (type, us, value) collapse to ONE logged partial
    with m = multiplicity — the compression claim in the module
    docstring — and the fold still scores them correctly (hand-computed
    rank sums: the value tie caps rho below +1 on an otherwise rising
    series)."""
    import math

    rows = [
        ("a", 1.0, "2024-01-01T00:00:00.000001", 1),
        ("a", 1.0, "2024-01-01T00:00:00.000001", 2),  # same (us, value)
        ("a", 2.0, "2024-01-01T00:00:00.000002", 3),
        ("a", 3.0, "2024-01-01T00:00:00.000003", 4),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, value double, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t = ParquetTable(f"{workdir}/uvmono")
    spearman_counts_stage(t)(df, 0)
    log = t.read(spark)
    assert log.count() == 3  # 4 events -> 3 partials
    assert log.agg(F.sum("m")).first()[0] == 4
    out = spearman_trend(spark, t).collect()
    assert len(out) == 1 and out[0].n == 4
    # hand ranks: x2 = (2,4,6,8); y2 = (3,3,6,8) ->
    # n*sxy - sx*sy = 72, n*sxx - sx^2 = 80, n*syy - sy^2 = 72
    assert out[0].spearman_rho == 72.0 / math.sqrt(80.0 * 72.0)


def test_spearman_closed_forms_match_rank_reference(spark):
    """Property check of the r11 closed-form rank sums: random small
    datasets heavy with ties (same-us groups, repeated values) through
    spearman_over_uv_counts vs an independent O(n^2)-naive Python
    reference that literally assigns row-number ranks with the
    (us, value) tie-break and averages tied value ranks. Exact
    equality on n and float equality on rho (both sides end in the
    identical double chain over identical int64 sums)."""
    import random

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        spearman_over_uv_counts,
    )

    def ref_rho(points):
        # points: [(us, value)] for ONE key
        pts = sorted(range(len(points)), key=lambda i: (points[i][0],
                                                        points[i][1], i))
        x2 = {}
        for r, i in enumerate(pts, start=1):
            x2[i] = 2 * r
        byval = sorted(range(len(points)), key=lambda i: points[i][1])
        vr = {i: r for r, i in enumerate(byval, start=1)}
        y2 = {}
        for i in range(len(points)):
            grp = [j for j in range(len(points))
                   if points[j][1] == points[i][1]]
            y2[i] = min(vr[j] for j in grp) + max(vr[j] for j in grp)
        n = len(points)
        sx = sum(x2.values()); sy = sum(y2.values())
        sxy = sum(x2[i] * y2[i] for i in range(n))
        sxx = sum(v * v for v in x2.values())
        syy = sum(v * v for v in y2.values())
        num = n * sxy - sx * sy
        den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
        return num / den if den else None

    rng = random.Random(5)
    rows = []
    want = {}
    for key in ("k1", "k2", "k3"):
        pts = [
            (rng.randint(0, 5), float(rng.randint(0, 4)))
            for _ in range(rng.randint(4, 25))
        ]
        want[key] = (len(pts), ref_rho(pts))
        rows += [(key, us, v) for us, v in pts]
    counts = (
        spark.createDataFrame(
            rows, "event_type string, us long, value double"
        )
        .groupBy("event_type", "us", "value")
        .agg(F.count("*").alias("m"))
    )
    got = {
        r["event_type"]: (r["n"], r["spearman_rho"])
        for r in spearman_over_uv_counts(counts).collect()
    }
    for k, (n, rho) in want.items():
        assert got[k][0] == n
        if rho is None:
            assert got[k][1] is None or got[k][1] != got[k][1]
        else:
            assert abs(got[k][1] - rho) < 1e-12, k


def test_spearman_past_int64_ceiling_probe(spark):
    """The r12 scale probe: n = 2e6 rows in ONE event type — past the
    old int64 closed form's ~1.3e6-rows/type ceiling (the brief's 100×
    scale-up of sf0.1 events is ~2e6/type), where sxx = sum(x2²) ≈
    (4/3)n³ ≈ 1.07e19 > 2^63 and the S2 triple product ≈ 2t³ ≈ 1.6e19
    also exceeds int64. The DECIMAL(38,0) rank sums must carry it
    exactly; the reference below brute-sums the literal per-rank
    squares with arbitrary-precision Python ints (no telescoping, so
    it is independent of the production S2 identity) and asserts the
    probe really crosses the ceiling before comparing rho."""
    import math

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        spearman_over_uv_counts,
    )

    K, M = 2000, 1000  # 2000 (us, value) groups x 1000 rows = 2e6 rows
    groups = [
        (us, float((us * 7919 + 13) % 97), M) for us in range(K)
    ]  # non-monotone values, heavy ties (97 distinct values)

    # exact-integer reference: x2 ranks 2·1..2·n in (us, value) order,
    # summed square-by-square; y2 = min+max row_number over each value
    # tie group in value order.
    n = sx = sxx = sy = syy = sxy = 0
    p = 0
    y2_of = {}
    cum = 0
    for v in sorted({v for _, v, _ in groups}):
        mv = sum(m for _, gv, m in groups if gv == v)
        y2_of[v] = (cum + 1) + (cum + mv)  # min rank + max rank
        cum += mv
    for us, v, m in sorted(groups):
        y2 = y2_of[v]
        for j in range(p + 1, p + m + 1):
            x2 = 2 * j
            sx += x2
            sxx += x2 * x2
            sxy += x2 * y2
        sy += m * y2
        syy += m * y2 * y2
        p += m
        n += m
    assert sxx > 2**63 - 1, "probe must cross the int64 ceiling"
    num = n * sxy - sx * sy
    den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    want = float(num) / den

    counts = spark.createDataFrame(
        [("hot", us, v, m) for us, v, m in groups],
        "event_type string, us long, value double, m long",
    )
    row = spearman_over_uv_counts(counts).first()
    assert row.n == n == K * M
    assert row.spearman_rho == row.spearman_rho  # no NaN from a wrap
    assert abs(row.spearman_rho - want) < 1e-9
    assert -1.0 <= row.spearman_rho <= 1.0


def test_cusum_planted_level_shift(spark):
    """Hand-built level shift: hours 0-9 at 1.00/hr, hours 10-19 at
    2.00/hr — the deviation walk bottoms at hour 9 (the last pre-shift
    hour), cusum_up_scaled = H * total drawup = 10000 cent-hours, and a
    FLAT control series scores zero."""
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        cusum_over_hourly_cents,
        hourly_cents,
    )

    rows = []
    for hr in range(20):
        v = 1.0 if hr < 10 else 2.0
        rows.append(("shift", v, f"1970-01-01T{hr:02d}:30:00"))
        rows.append(("flat", 1.5, f"1970-01-01T{hr:02d}:30:00"))
    ev = spark.createDataFrame(
        rows, "event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_type"]: (
            r["n_hours"],
            r["cusum_up_scaled"],
            r["cusum_down_scaled"],
            r["changepoint_hour"],
        )
        for r in cusum_over_hourly_cents(hourly_cents(ev)).collect()
    }
    # shift: d_t = 20*x_t - 3000 = -1000 then +1000; P walks -1000 ..
    # -10000 (hour 9) then recovers to 0 -> max drawup 10000 (hour 19
    # vs the hour-9 trough), max drawdown 9000 (hour-0 peak of -1000
    # down to -10000 — the walk never rises before falling)
    assert got["shift"] == (20, 10000, 9000, 9)
    assert got["flat"] == (20, 0, 0, 0)


def test_cusum_drained_equals_batch_and_replays(spark, workdir):
    from databricks_end_to_end_streaming_spark.streaming.stats_stage import (
        cusum_from_log,
        cusum_stage,
    )

    ev = _events(spark).select("event_type", "value", "ts", "event_id")
    t = ParquetTable(f"{workdir}/hourlycents")
    stage = cusum_stage(t)
    for i, sl in enumerate(_three_slices(ev)):
        stage(sl, i)
    got = [tuple(r) for r in cusum_from_log(spark, t).collect()]
    want = [
        tuple(r)
        for r in all_queries()["cusum_level_shift_per_type"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == want and len(got) > 0
    stage(_three_slices(ev)[0], 0)  # replay
    assert [tuple(r) for r in cusum_from_log(spark, t).collect()] == want


def test_durbin_watson_planted_and_from_log(spark, workdir):
    """Hand-exact DW cases through the shared core: a linear trend
    (residuals -300, 0, 300) gives dw = 1.0; an alternating series
    (residuals ±200) gives dw = 3.0. Then the streaming finalize over
    the CUSUM hourly-cents log reproduces the registered batch query
    bit-for-bit on arbitrary slices."""
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        dw_over_hourly_cents,
        hourly_cents,
    )
    from databricks_end_to_end_streaming_spark.streaming.stats_stage import (
        cusum_stage,
        durbin_watson_from_log,
    )

    rows = []
    for hr, v in enumerate([1.0, 2.0, 3.0]):
        rows.append(("trend", v, f"1970-01-01T{hr:02d}:30:00"))
    for hr, v in enumerate([1.0, 2.0, 1.0, 2.0]):
        rows.append(("alt", v, f"1970-01-01T{hr:02d}:30:00"))
    ev = spark.createDataFrame(
        rows, "event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_type"]: (r["n_hours"], r["dw"])
        for r in dw_over_hourly_cents(hourly_cents(ev)).collect()
    }
    assert got["trend"] == (3, 1.0)  # sdd/see = 180000/180000
    assert got["alt"] == (4, 3.0)  # 480000/160000
    # drained == batch over the shared log
    evs = _events(spark).select("event_type", "value", "ts", "event_id")
    t = ParquetTable(f"{workdir}/hourlycents_dw")
    stage = cusum_stage(t)
    for i, sl in enumerate(_three_slices(evs)):
        stage(sl, i)
    got2 = [tuple(r) for r in durbin_watson_from_log(spark, t).collect()]
    want = [
        tuple(r)
        for r in all_queries()["durbin_watson_hourly_per_type"](
            spark, SF_DIR
        ).collect()
    ]
    assert got2 == want and len(got2) > 0
