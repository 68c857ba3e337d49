"""Unit equivalence test for the salted two-phase aggregation operator."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct_groupby(spark):
    rows = [(i, "k%d" % (i % 3), float(i) / 7.0) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    direct = (
        df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .orderBy("k")
        .collect()
    )
    salted = (
        salted_agg(
            df,
            keys=["k"],
            salt_source=F.col("id"),
            partial={
                "pn": F.count("*"),
                "ps": F.sum(F.col("v").cast("decimal(18,2)")),
                "pmn": F.min("v"),
                "pmx": F.max("v"),
            },
            merge={
                "n": F.sum("pn").cast("long"),
                "s": F.sum("ps").cast("double"),
                "mn": F.min("pmn"),
                "mx": F.max("pmx"),
            },
            buckets=8,
        )
        .orderBy("k")
        .collect()
    )
    assert [r.asDict() for r in direct] == [r.asDict() for r in salted]


def test_salted_agg_single_bucket_degenerates(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, k string, v double")
    out = salted_agg(
        df,
        keys=["k"],
        salt_source=F.col("id"),
        partial={"pn": F.count("*")},
        merge={"n": F.sum("pn").cast("long")},
        buckets=1,
    ).collect()
    assert out[0]["n"] == 1
