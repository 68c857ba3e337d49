"""Targeted deletion / GDPR erasure (ParquetTable.delete_where): exact
accounting, survivor preservation, NULL-predicate semantics matching
Delta DELETE, idempotence, partition-layout preservation, and
crash-window healing through the shared swap protocol."""

from __future__ import annotations

import os

from databricks_end_to_end_streaming_spark.streaming import ParquetTable

SCHEMA = "user_id long, type string, v long"


def _table(spark, workdir, rows, partition_by=None):
    t = ParquetTable(f"{workdir}/t", partition_by=partition_by)
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def test_erasure_accounting_and_survivors(spark, workdir):
    rows = [(u, "a" if u % 2 else "b", u * 10) for u in range(20)]
    t = _table(spark, workdir, rows)
    rep = t.delete_where(spark, "user_id % 5 = 0")
    assert rep == {"rows_before": 20, "rows_deleted": 4, "rows_after": 16}
    left = {r.user_id for r in t.read(spark).collect()}
    assert left == {u for u in range(20) if u % 5 != 0}
    # the erased user is gone completely
    assert t.read(spark).where("user_id = 5").count() == 0


def test_null_predicate_rows_survive(spark, workdir):
    # v NULL for user 1: "v > 15" evaluates NULL there -> must survive,
    # matching Delta DELETE semantics (only TRUE rows are removed).
    rows = [(1, "a", None), (2, "a", 10), (3, "a", 20)]
    t = _table(spark, workdir, rows)
    rep = t.delete_where(spark, "v > 15")
    assert rep["rows_deleted"] == 1
    assert {r.user_id for r in t.read(spark).collect()} == {1, 2}


def test_idempotent_rerun_deletes_zero(spark, workdir):
    t = _table(spark, workdir, [(u, "a", u) for u in range(10)])
    t.delete_where(spark, "user_id = 3")
    rep2 = t.delete_where(spark, "user_id = 3")
    assert rep2["rows_deleted"] == 0 and rep2["rows_after"] == 9


def test_partition_layout_preserved(spark, workdir):
    rows = [(u, "a" if u % 2 else "b", u) for u in range(10)]
    t = _table(spark, workdir, rows, partition_by=["type"])
    t.delete_where(spark, "user_id = 4")
    # partition dirs still present; erased row gone; others intact
    dirs = {d for d in os.listdir(t.path) if d.startswith("type=")}
    assert dirs == {"type=a", "type=b"}
    assert t.read(spark).count() == 9


def test_crash_window_heals(spark, workdir):
    t = _table(spark, workdir, [(u, "a", u) for u in range(10)])
    rep = t.delete_where(spark, "user_id >= 8")
    assert rep["rows_after"] == 8
    # simulate a crash that left only the renamed-aside copy
    os.rename(t.path, t.path + "._old")
    assert t.read(spark).count() == 8  # _recover_swap healed on access
