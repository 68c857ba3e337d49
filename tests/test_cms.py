"""Count-min sketch (operators/cms.py): one-sided error bound, exact
recovery at low load, and shard-merge equivalence."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def items_df(spark, counts: dict[str, int], seed=3):
    rng = random.Random(seed)
    rows = [(w,) for w, n in counts.items() for _ in range(n)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "item string")


COUNTS = {f"tok{i}": (i + 1) * 3 for i in range(30)}  # 3..90 each, N=1395


def test_cms_never_undercounts_and_bounds_overcount(spark):
    df = items_df(spark, COUNTS)
    sketch = cms_build(df)
    qs = spark.createDataFrame([(w,) for w in COUNTS], "item string")
    est = {r["item"]: r["est_count"] for r in cms_estimate(sketch, qs).collect()}
    n_total = sum(COUNTS.values())
    for w, exact in COUNTS.items():
        assert est[w] >= exact  # one-sided error
        # eps = e/w = e/256; generous 3x slack on the expectation bound
        assert est[w] <= exact + 3 * 2.7183 * n_total / 256


def test_cms_exact_at_low_load(spark):
    # 30 distinct items in 4x256 cells: collisions in ALL 4 rows for one
    # item are vanishingly unlikely, so min-row estimates are exact
    df = items_df(spark, COUNTS)
    sketch = cms_build(df)
    qs = spark.createDataFrame([(w,) for w in COUNTS], "item string")
    est = {r["item"]: r["est_count"] for r in cms_estimate(sketch, qs).collect()}
    exact_hits = sum(1 for w, n in COUNTS.items() if est[w] == n)
    assert exact_hits >= 28  # allow at most 2 collision-inflated cells


def test_cms_merge_equals_whole(spark):
    half_a = {w: n for w, n in COUNTS.items() if int(w[3:]) % 2 == 0}
    half_b = {w: n for w, n in COUNTS.items() if int(w[3:]) % 2 == 1}
    merged = cms_merge(
        cms_build(items_df(spark, half_a)),
        cms_build(items_df(spark, half_b)),
    )
    whole = cms_build(items_df(spark, COUNTS))
    m = {(r["row_id"], r["bucket"]): r["cnt"] for r in merged.collect()}
    w = {(r["row_id"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert m == w


def test_cms_unseen_item_estimates_small(spark):
    df = items_df(spark, COUNTS)
    sketch = cms_build(df)
    qs = spark.createDataFrame([("never-seen",)], "item string")
    est = cms_estimate(sketch, qs).collect()[0]["est_count"]
    assert est <= 3 * 2.7183 * sum(COUNTS.values()) / 256
