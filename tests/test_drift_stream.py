"""Streaming chi-square drift monitor: the drained contingency log
scores identically to the registered batch query, replays never
double-add, and the prequential trajectory is monotone in evidence for
a key whose distribution diverges."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.drift import (
    chi2_drift,
    contingency_stage,
)

SF_DIR = "/root/testdata/sf0.001"


def _bin():
    return (F.floor(F.col("value") / 50.0) * 50).cast("long")


def test_drained_stream_equals_batch_query_bitwise(spark, workdir):
    """Split the events corpus into 3 arbitrary batches; the finalized
    drift scores equal the registered chi2 query value-for-value (the
    contingency monoid is slice-invariant, and the scoring core is
    literally shared)."""
    from databricks_end_to_end_streaming_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_type", "value", "event_id")
    t = ParquetTable(f"{workdir}/contingency")
    stage = contingency_stage(t, "event_type", _bin())
    stage(ev.where(F.col("event_id") % 3 == 0), 0)
    stage(ev.where(F.col("event_id") % 3 == 1), 1)
    stage(ev.where(F.col("event_id") % 3 == 2), 2)
    got = {
        r["key"]: (r["n_events"], r["chi2"], r["n_bins"])
        for r in chi2_drift(spark, t).collect()
    }
    expected = {
        r["event_type"]: (r["n_events"], r["chi2"], r["n_bins"])
        for r in all_queries()["chi2_value_drift_per_type"](spark, SF_DIR).collect()
    }
    assert got == expected and len(got) > 0


def test_replay_does_not_double_add(spark, workdir):
    rows = [("a", float(v), i) for i, v in enumerate([10, 60, 110, 10, 60])] + [
        ("b", 10.0, 9), ("b", 160.0, 10),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double, event_id long")
    t = ParquetTable(f"{workdir}/contingency")
    stage = contingency_stage(t, "event_type", _bin())
    stage(df.where(F.col("event_id") < 3), 0)
    stage(df.where(F.col("event_id") >= 3), 1)
    before = sorted(map(tuple, chi2_drift(spark, t).collect()))
    stage(df.where(F.col("event_id") < 3), 0)  # replay batch 0
    assert sorted(map(tuple, chi2_drift(spark, t).collect())) == before


def test_prequential_trajectory_detects_divergence(spark, workdir):
    """Key 'drift' matches the corpus in batch 0, then sends all its
    mass to one bin in batch 1 — its chi-square must strictly rise
    between the two prequential views."""
    base = [("steady", float(v), i) for i, v in enumerate([10, 60, 110, 160] * 10)]
    match = [("drift", float(v), 100 + i) for i, v in enumerate([10, 60, 110, 160] * 2)]
    skew = [("drift", 10.0, 200 + i) for i in range(20)]
    mk = lambda rows: spark.createDataFrame(
        rows, "event_type string, value double, event_id long"
    )
    t = ParquetTable(f"{workdir}/contingency")
    stage = contingency_stage(t, "event_type", _bin())
    stage(mk(base + match), 0)
    stage(mk(skew), 1)
    c0 = {r["key"]: r["chi2"] for r in chi2_drift(spark, t, up_to_batch=0).collect()}
    c1 = {r["key"]: r["chi2"] for r in chi2_drift(spark, t, up_to_batch=1).collect()}
    assert c1["drift"] > c0["drift"]


def test_psi_drift_matches_batch_query_on_period_split(spark, workdir):
    """psi_drift over a contingency log sliced at the batch query's
    exact µs midpoint reproduces psi_value_drift_per_type bit-for-bit;
    replays are idempotent; an extra batch moves the as-of view."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        psi_value_drift_per_type,
    )
    from databricks_end_to_end_streaming_spark.streaming.drift import (
        contingency_stage,
        psi_drift,
    )
    from databricks_end_to_end_streaming_spark.streaming import ParquetTable
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = ev.agg(
        F.min(us).alias("a"), F.max(us).alias("b")
    ).first()
    mid = (lo + hi) // 2
    binc = (F.floor(F.col("value") / 50.0) * 50).cast("long")
    t = ParquetTable(f"{workdir}/contingency")
    stage = contingency_stage(t, "event_type", binc)
    stage(ev.where(us <= F.lit(mid)), 0)  # reference period
    stage(ev.where(us > F.lit(mid)), 1)   # current period
    got = [
        (r.key, r.n_base, r.n_actual, r.n_bins, r.psi, r.drift_class)
        for r in psi_drift(spark, t, reference_batch=0).collect()
    ]
    want = [
        (r.event_type, r.n_base, r.n_actual, r.n_bins, r.psi, r.drift_class)
        for r in psi_value_drift_per_type(spark, sf_dir).collect()
    ]
    assert got == want
    # replay batch 1: unchanged
    stage(ev.where(us > F.lit(mid)), 1)
    got2 = [
        (r.key, r.n_base, r.n_actual, r.n_bins, r.psi, r.drift_class)
        for r in psi_drift(spark, t, reference_batch=0).collect()
    ]
    assert got2 == want
    # a third batch widens the actual window (as-of view respects it)
    stage(ev.where(us > F.lit(mid)).limit(50), 2)
    n_act_before = sum(r[2] for r in want)
    n_act_after = sum(
        r.n_actual for r in psi_drift(spark, t, reference_batch=0).collect()
    )
    assert n_act_after == n_act_before + 50
    # while pinning up_to_batch reproduces the original
    got3 = [
        (r.key, r.n_base, r.n_actual, r.n_bins, r.psi, r.drift_class)
        for r in psi_drift(spark, t, reference_batch=0, up_to_batch=1).collect()
    ]
    assert got3 == want
