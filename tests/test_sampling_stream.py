"""Streaming bottom-k-by-hash sampling: split-invariance (streaming ==
one-shot batch), replay idempotence, uniform-sample determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.sampling import (
    _ranked,
    finalize_sample,
    sample_stage,
)

ROWS = [(i, "g1" if i % 3 else "g2") for i in range(60)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string")


def test_streaming_sample_equals_batch_sample(spark, workdir):
    t = ParquetTable(f"{workdir}/samp")
    stage = sample_stage(t, "grp", "id", k=5)
    stage(_df(spark, ROWS[:20]), 0)
    stage(_df(spark, ROWS[20:45]), 1)
    stage(_df(spark, ROWS[45:]), 2)
    inc = sorted(
        (r["grp"], r["id"])
        for r in finalize_sample(spark, t, "grp", "id", k=5).collect()
    )
    batch = sorted(
        (r["grp"], r["id"])
        for r in _ranked(_df(spark, ROWS), "grp", "id", k=5)
        .drop("_h")
        .collect()
    )
    assert inc == batch
    assert len(inc) == 10  # 5 per group


def test_replay_does_not_change_sample(spark, workdir):
    t = ParquetTable(f"{workdir}/samp_replay")
    stage = sample_stage(t, "grp", "id", k=4)
    stage(_df(spark, ROWS[:30]), 0)
    before = sorted(
        map(str, finalize_sample(spark, t, "grp", "id", k=4).collect())
    )
    stage(_df(spark, ROWS[:30]), 0)  # replay
    after = sorted(
        map(str, finalize_sample(spark, t, "grp", "id", k=4).collect())
    )
    assert before == after


def test_sample_is_split_invariant_across_batchings(spark, workdir):
    """Any batching of the same rows yields the identical sample."""
    t1 = ParquetTable(f"{workdir}/samp_a")
    s1 = sample_stage(t1, "grp", "id", k=3)
    s1(_df(spark, ROWS), 0)

    t2 = ParquetTable(f"{workdir}/samp_b")
    s2 = sample_stage(t2, "grp", "id", k=3)
    for i in range(6):
        s2(_df(spark, ROWS[i * 10 : (i + 1) * 10]), i)

    a = sorted(map(str, finalize_sample(spark, t1, "grp", "id", 3).collect()))
    b = sorted(map(str, finalize_sample(spark, t2, "grp", "id", 3).collect()))
    assert a == b


def test_weighted_sample_incremental_equals_batch(spark, workdir):
    """A-ES weighted sampling: cross-batch accumulation equals the
    one-shot batch sample row-for-row, replays are no-ops, and heavy
    rows really are favored."""
    from databricks_end_to_end_streaming_spark.streaming.sampling import (
        _weighted_ranked,
        finalize_weighted_sample,
        weighted_sample_stage,
    )

    rows = [
        ("g1", i, 1000.0 if i % 10 == 0 else 0.1) for i in range(100)
    ] + [("g2", i, float(i + 1)) for i in range(100, 140)]
    df = spark.createDataFrame(rows, "grp string, rid long, w double")

    t = ParquetTable(f"{workdir}/wsample")
    stage = weighted_sample_stage(t, "grp", "rid", "w", k=5)
    stage(df.where("rid < 50"), 0)
    stage(df.where("rid >= 50 and rid < 110"), 1)
    stage(df.where("rid >= 110"), 2)
    stage(df.where("rid >= 110"), 2)  # replay, same id

    inc = sorted(
        (r["grp"], r["rid"])
        for r in finalize_weighted_sample(
            spark, t, "grp", "rid", "w", k=5
        ).collect()
    )
    batch = sorted(
        (r["grp"], r["rid"])
        for r in _weighted_ranked(df, "grp", "rid", "w", 5)
        .drop("_es")
        .collect()
    )
    assert inc == batch
    assert len(inc) == 10  # 5 per group
    # weights bite: in g1 the 1000x-weighted ids (multiples of 10)
    # dominate the sample
    g1 = [rid for grp, rid in inc if grp == "g1"]
    assert sum(1 for rid in g1 if rid % 10 == 0) >= 4
