"""Salted join / salted aggregation: identical results to the plain
forms, hot keys spread across salt partitions, and replay-deterministic
salting."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.skew import (
    salted_join,
    salted_two_phase_agg,
    with_salt,
)


def skewed_events(spark, n=5000):
    """90% of rows share key 'hot'; the rest spread over 50 keys."""
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("key"),
        (F.col("id") % 97).cast("double").alias("value"),
    )


def test_salted_join_matches_plain_join(spark):
    big = skewed_events(spark)
    small = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k7", "K7")], "key string, label string"
    )
    plain = big.join(small, "key").select("row_id", "label")
    salted = salted_join(
        big, small, on="key", n_salts=8, big_unique_cols=["row_id"]
    ).select("row_id", "label")
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salt_spreads_hot_key(spark):
    big = skewed_events(spark)
    salted = with_salt(big, ["row_id"], 8)
    per_salt = (
        salted.where(F.col("key") == "hot")
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(per_salt) == 8  # hot key present in every salt bucket
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 2 * min(counts)  # roughly uniform spread


def test_salting_is_replay_deterministic(spark):
    big = skewed_events(spark)
    s1 = {(r["row_id"], r["__salt"]) for r in with_salt(big, ["row_id"], 8).collect()}
    s2 = {(r["row_id"], r["__salt"]) for r in with_salt(big, ["row_id"], 8).collect()}
    assert s1 == s2


def test_salted_two_phase_agg_matches_plain(spark):
    big = skewed_events(spark)
    plain = {
        r["key"]: (r["n"], r["total"])
        for r in big.groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .collect()
    }
    salted = {
        r["key"]: (r["n"], r["total"])
        for r in salted_two_phase_agg(
            big,
            key="key",
            n_salts=8,
            unique_cols=["row_id"],
            partial_aggs=[
                F.count("*").alias("pn"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("pt"),
            ],
            final_aggs=[
                F.sum("pn").alias("n"),
                F.sum("pt").cast("double").alias("total"),
            ],
        ).collect()
    }
    assert plain == salted
