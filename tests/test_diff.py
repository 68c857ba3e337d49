"""operators/diff.py: the snapshot-diff audit primitive — all four
statuses, passthrough semantics, hash-aliasing guard, and the plan
staying JVM-side with a single join."""

from __future__ import annotations

from databricks_end_to_end_streaming_spark.operators.diff import (
    diff_summary,
    table_diff,
)

SCHEMA = "id long, payload string, extra string"


def test_all_four_statuses_and_passthrough(spark):
    old = spark.createDataFrame(
        [
            (1, "same", "o1"),
            (2, "before", "o2"),
            (3, "gone", "o3"),
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (1, "same", "n1"),
            (2, "after", "n2"),
            (4, "fresh", "n4"),
        ],
        SCHEMA,
    )
    d = table_diff(
        old, new, keys=["id"], compare_cols=["payload"], passthrough=["extra"]
    )
    got = {r.id: (r.status, r.extra) for r in d.collect()}
    # old side wins passthrough when both exist (before-image for audit)
    assert got == {
        1: ("unchanged", "o1"),
        2: ("modified", "o2"),
        3: ("dropped", "o3"),
        4: ("added", "n4"),
    }
    s = {r.status: r.n_rows for r in diff_summary(d).collect()}
    assert s == {"unchanged": 1, "modified": 1, "dropped": 1, "added": 1}


def test_multi_column_compare_no_boundary_aliasing(spark):
    # ("ab","c") must differ from ("a","bc") — the 0x1f separator keeps
    # column boundaries out of the hash's reach
    old = spark.createDataFrame([(1, "ab", "c")], SCHEMA)
    new = spark.createDataFrame([(1, "a", "bc")], SCHEMA)
    d = table_diff(old, new, keys=["id"], compare_cols=["payload", "extra"])
    assert d.first().status == "modified"


def test_plan_single_join_no_python(spark):
    old = spark.createDataFrame([(i, f"p{i}", "x") for i in range(8)], SCHEMA)
    new = spark.createDataFrame([(i, f"p{i}", "x") for i in range(8)], SCHEMA)
    d = table_diff(old, new, keys=["id"], compare_cols=["payload"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Join") <= 2  # one logical join (SMJ or shuffled hash)
