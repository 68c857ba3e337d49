"""CSV/JSON batch sources: schema-pinned reads round-trip the events
table, and each malformed-record mode behaves per contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from databricks_end_to_end_streaming_spark.sources.tabular import (
    CORRUPT_COL,
    read_csv,
    read_json,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _events(spark):
    return load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def test_csv_roundtrip(spark, workdir):
    src = _events(spark)
    src.write.option("header", "true").csv(f"{workdir}/csv")
    back = read_csv(spark, f"{workdir}/csv", SCHEMA)
    assert sorted(map(tuple, back.drop(CORRUPT_COL).collect())) == sorted(
        map(tuple, src.collect())
    )


def test_json_roundtrip(spark, workdir):
    src = _events(spark)
    src.write.json(f"{workdir}/json")
    back = read_json(spark, f"{workdir}/json", SCHEMA)
    assert sorted(map(tuple, back.drop(CORRUPT_COL).collect())) == sorted(
        map(tuple, src.collect())
    )


def _write_mixed_json(workdir: str) -> str:
    p = f"{workdir}/mixed"
    os.makedirs(p, exist_ok=True)
    with open(f"{p}/part-0.json", "w") as f:
        f.write('{"event_id": 1, "user_id": 10, "event_type": "view", "value": 1.5}\n')
        f.write("this is not json\n")
        f.write('{"event_id": 2, "user_id": 20, "event_type": "click", "value": 2.5}\n')
    return p


def test_permissive_quarantines_corrupt(spark, workdir):
    p = _write_mixed_json(workdir)
    df = read_json(spark, p, SCHEMA).cache()
    try:
        assert df.count() == 3
        bad = df.where(f"{CORRUPT_COL} IS NOT NULL").collect()
        assert len(bad) == 1 and bad[0][CORRUPT_COL] == "this is not json"
        good = df.where(f"{CORRUPT_COL} IS NULL")
        assert sorted(r["event_id"] for r in good.collect()) == [1, 2]
    finally:
        df.unpersist()


def test_dropmalformed_drops(spark, workdir):
    p = _write_mixed_json(workdir)
    df = read_json(spark, p, SCHEMA, mode="DROPMALFORMED")
    assert sorted(r["event_id"] for r in df.collect()) == [1, 2]
    assert CORRUPT_COL not in df.columns


def test_failfast_raises(spark, workdir):
    p = _write_mixed_json(workdir)
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_json(spark, p, SCHEMA, mode="FAILFAST").collect()


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError, match="mode must be"):
        read_csv(spark, "/tmp/x", SCHEMA, mode="YOLO")
