"""Streaming z-score gate: accumulated moments equal the one-shot batch
moments bit-for-bit, full-corpus rescoring equals the registered batch
query, prequential scoring is replay-deterministic, and replays never
double-add."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import (
    ParquetTable,
    anomaly_stage,
    partial_scalar_moments,
    score_zscore,
    summed_scalar_moments,
)

SF_DIR = "/root/testdata/sf0.001"

def CENTS():
    return (F.col("value").cast("decimal(18,2)") * 100).cast("long")


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_type string, value double, event_id long")


ROWS = [
    ("a", 1.0, 1), ("a", 2.0, 2), ("a", 3.0, 3), ("a", 100.0, 4),
    ("a", 1.5, 5), ("a", 2.5, 6), ("a", 2.0, 7), ("a", 1.0, 8),
    ("b", 5.0, 9), ("b", 5.0, 10), ("b", 5.0, 11),
]


def _run_batches(spark, workdir, splits):
    mt = ParquetTable(f"{workdir}/moments")
    ft = ParquetTable(f"{workdir}/flagged")
    stage = anomaly_stage(mt, ft, "event_type", CENTS(), threshold=1.4)
    for i, chunk in enumerate(splits):
        stage(_events(spark, chunk), i)
    return mt, ft, stage


def test_accumulated_moments_equal_batch(spark, workdir):
    mt, _ft, _ = _run_batches(spark, workdir, [ROWS[:4], ROWS[4:9], ROWS[9:]])
    inc = {
        r["key"]: (r["n"], r["sx"], r["sxx"])
        for r in summed_scalar_moments(spark, mt).collect()
    }
    direct = {
        r["key"]: (r["n"], r["sx"], r["sxx"])
        for r in partial_scalar_moments(
            _events(spark, ROWS), "event_type", CENTS()
        ).collect()
    }
    assert inc == direct and set(inc) == {"a", "b"}


def test_full_rescore_matches_registered_batch_query(spark):
    """score_zscore over the full corpus against the drained moment fold
    is the registered zscore_event_anomalies query, value for value."""
    from databricks_end_to_end_streaming_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    moments = partial_scalar_moments(ev, "event_type", CENTS())
    scored = score_zscore(ev, moments, "event_type", CENTS(), threshold=3.0)
    got = {(r["event_id"], r["zscore"]) for r in scored.collect()}
    expected = {
        (r["event_id"], r["zscore"])
        for r in all_queries()["zscore_event_anomalies"](spark, SF_DIR).collect()
    }
    assert got == expected and len(got) > 0


def test_prequential_batch0_sees_only_its_own_history(spark, workdir):
    """Batch 0's flags are computed from batch-0 moments only: the
    outlier 100.0 IS flagged there, and later batches don't rewrite
    batch 0's verdicts."""
    mt, ft, _ = _run_batches(spark, workdir, [ROWS[:4], ROWS[4:9], ROWS[9:]])
    flagged = ft.read(spark)
    b0 = {r["event_id"] for r in flagged.where(F.col("_batch_id") == 0).collect()}
    assert 4 in b0  # the 100.0 spike against batch-0 stats (|z|~1.73, and a 4-row batch bounds |z| at (n-1)/sqrt(n)=1.5, hence the 1.4 gate)
    single_moments = partial_scalar_moments(
        _events(spark, ROWS[:4]), "event_type", CENTS()
    )
    direct = {
        r["event_id"]
        for r in score_zscore(
            _events(spark, ROWS[:4]), single_moments, "event_type", CENTS(), 1.4
        ).collect()
    }
    assert b0 == direct


def test_replay_is_idempotent_and_deterministic(spark, workdir):
    mt, ft, stage = _run_batches(spark, workdir, [ROWS[:4], ROWS[4:9], ROWS[9:]])
    before_m = sorted(map(tuple, mt.read(spark).collect()))
    before_f = sorted(map(tuple, ft.read(spark).collect()))
    # replay the MIDDLE batch after a later batch has landed: the
    # up_to_batch filter must reproduce the original history view
    stage(_events(spark, ROWS[4:9]), 1)
    assert sorted(map(tuple, mt.read(spark).collect())) == before_m
    assert sorted(map(tuple, ft.read(spark).collect())) == before_f
