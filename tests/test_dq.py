"""Unit behavior of the one-pass expectations report."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.dq import expectations_report


def test_expectations_counts_and_rates(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (2, 7.0), (3, 200.0)], "id long, v double"
    )
    out = {
        r["rule"]: r
        for r in expectations_report(
            df,
            rules={
                "v_nonneg": F.col("v") >= 0,
                "v_under_100": F.col("v") < 100,
            },
            uniqueness="id",
        ).collect()
    }
    assert out["v_nonneg"]["n_violations"] == 1
    assert out["v_under_100"]["n_violations"] == 1
    assert out["unique(id)"]["n_violations"] == 1  # id=2 twice
    for r in out.values():
        assert r["n_checked"] == 4
        assert abs(r["violation_rate"] - r["n_violations"] / 4) < 1e-15


def test_expectations_single_scan_plan(spark):
    # all rules ride ONE aggregate over ONE scan of the input
    df = spark.createDataFrame([(1, 5.0)], "id long, v double")
    rep = expectations_report(
        df, rules={"a": F.col("v") >= 0, "b": F.col("v") < 100}
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1
