"""Bucketed co-located join: the Exchange must disappear.

Joining two tables bucketed on the join key (same bucket count) must
plan a sort-merge join with NO shuffle exchange on either side — the
bucketed layout IS the distribution. This is the plan-shape contract
that makes repeated fact-fact joins affordable at scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from databricks_end_to_end_streaming_spark.bucketing import (
    cobucketed_join,
    write_bucketed,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    write_bucketed(
        load_table(spark, SF, "orders"), "orders_b", "o_orderkey", n_buckets=8
    )
    write_bucketed(
        load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        n_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables):
    # force the join path (both sides small enough to broadcast otherwise)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # correctness: row count matches the plain join
        o = load_table(spark, SF, "orders")
        li = load_table(spark, SF, "lineitem")
        expected = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key also satisfies its distribution from the
    bucketed scan — partial+final agg collapses to one stage."""
    agg = (
        spark.table("lineitem_b")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
