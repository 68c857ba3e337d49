"""Incremental view maintenance under retractions (streaming/ivm.py):
the multiplicity fold must equal a batch aggregate over the surviving
rows — including MIN/MAX after deletes — and stay exact under replay,
re-slicing, delete-reinsert churn, and the prequential as-of view."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.ivm import (
    ivm_consistency_check,
    ivm_maintenance_stage,
    ivm_stage,
    ivm_view,
)

CDC_SCHEMA = "op string, k string, v long"


def _batch(spark, rows):
    return spark.createDataFrame(rows, CDC_SCHEMA)


def _view(spark, t, up_to=None):
    return sorted(
        (r.k, r.n_rows, r.sum_v, r.min_v, r.max_v, r.avg_v)
        for r in ivm_view(spark, t, up_to).collect()
    )


def _batch_reference(spark, surviving_rows):
    df = _batch(spark, surviving_rows)
    agg = df.groupBy("k").agg(
        F.count("*").alias("n_rows"),
        F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    return sorted(
        (r.k, r.n_rows, r.sum_v, r.min_v, r.max_v, r.sum_v / r.n_rows)
        for r in agg.collect()
    )


def test_deletes_restore_max_exactly(spark, workdir):
    t = ParquetTable(f"{workdir}/ivm")
    stage = ivm_stage(t, "k", "v")
    stage(_batch(spark, [("I", "a", 1), ("I", "a", 9), ("I", "b", 5)]), 0)
    stage(_batch(spark, [("D", "a", 9)]), 1)  # delete the max
    got = _view(spark, t)
    want = _batch_reference(spark, [("I", "a", 1), ("I", "b", 5)])
    assert got == want  # max(a) back to 1 without any history rescan


def test_delete_reinsert_churn_matches_batch(spark, workdir):
    t = ParquetTable(f"{workdir}/ivm")
    stage = ivm_stage(t, "k", "v")
    # churn: duplicates, full deletion of a key, re-insert after delete
    stage(_batch(spark, [("I", "a", 2), ("I", "a", 2), ("I", "c", 7)]), 0)
    stage(_batch(spark, [("D", "a", 2), ("D", "c", 7), ("I", "b", 3)]), 1)
    stage(_batch(spark, [("I", "c", 4), ("D", "b", 3), ("I", "b", 8)]), 2)
    got = _view(spark, t)
    want = _batch_reference(
        spark, [("I", "a", 2), ("I", "c", 4), ("I", "b", 8)]
    )
    assert got == want
    # key fully deleted then re-inserted shows the NEW value only
    assert [r for r in got if r[0] == "c"][0][4] == 4


def test_replay_is_idempotent(spark, workdir):
    t = ParquetTable(f"{workdir}/ivm")
    stage = ivm_stage(t, "k", "v")
    stage(_batch(spark, [("I", "a", 1), ("I", "a", 5)]), 0)
    stage(_batch(spark, [("D", "a", 5)]), 1)
    before = _view(spark, t)
    stage(_batch(spark, [("D", "a", 5)]), 1)  # replayed delete batch
    assert _view(spark, t) == before  # no double-retraction


def test_slicing_insensitive(spark, workdir):
    rows = [("I", f"k{i % 3}", i % 11) for i in range(60)] + [
        ("D", f"k{i % 3}", i % 11) for i in range(0, 60, 4)
    ]
    t1, t2 = ParquetTable(f"{workdir}/a"), ParquetTable(f"{workdir}/b")
    s1, s2 = ivm_stage(t1, "k", "v"), ivm_stage(t2, "k", "v")
    s1(_batch(spark, rows), 0)  # one big batch
    for i in range(5):  # five interleaved slices
        s2(_batch(spark, rows[i::5]), i)
    assert _view(spark, t1) == _view(spark, t2)


def test_prequential_view_and_consistency(spark, workdir):
    t = ParquetTable(f"{workdir}/ivm")
    stage = ivm_stage(t, "k", "v")
    stage(_batch(spark, [("I", "a", 1)]), 0)
    stage(_batch(spark, [("D", "a", 1), ("D", "z", 99)]), 1)  # z never inserted
    asof0 = _view(spark, t, up_to=0)
    assert asof0 == _batch_reference(spark, [("I", "a", 1)])
    bad = ivm_consistency_check(spark, t).collect()
    assert [(r.k, r.v, r.net) for r in bad] == [("z", 99, -1)]


def test_streaming_wrapper(spark, workdir):
    rows = [("I", f"k{i % 2}", i) for i in range(20)] + [
        ("D", "k0", 0),
        ("D", "k1", 19),
    ]
    src = f"{workdir}/src"
    _batch(spark, rows).write.parquet(src)
    source = spark.readStream.schema(CDC_SCHEMA).parquet(src)
    t = ParquetTable(f"{workdir}/ivm")
    ivm_maintenance_stage(source, t, f"{workdir}/ckpt", "k", "v")
    surviving = [("I", f"k{i % 2}", i) for i in range(20) if i not in (0, 19)]
    assert _view(spark, t) == _batch_reference(spark, surviving)
