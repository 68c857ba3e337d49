"""Observation-API expectations (streaming/observe.py): counters ride
the job itself — batch via Observation.get, streaming via progress."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from databricks_end_to_end_streaming_spark.streaming.observe import (
    assert_expectations,
    observe_batch,
    observe_stream,
    progress_metrics,
)

def _rules():
    return {
        "value_positive": F.col("value") > 0,
        "type_known": F.col("event_type").isin("view", "click"),
    }


def _df(spark):
    return spark.createDataFrame(
        [("view", 10.0), ("click", -1.0), ("weird", 3.0), ("view", 2.0)],
        "event_type string, value double",
    )


def test_batch_observation_counts_all_rules_one_pass(spark):
    df, obs = observe_batch(_df(spark), _rules())
    df.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_rows"] == 4
    assert m["violations_value_positive"] == 1  # the -1.0
    assert m["violations_type_known"] == 1  # the "weird"


def test_gate_raises_with_rule_names(spark):
    df, obs = observe_batch(_df(spark), _rules())
    df.write.format("noop").mode("overwrite").save()
    with pytest.raises(ValueError, match="value_positive"):
        assert_expectations(obs.get)
    # selective gate: only gate on type_known
    with pytest.raises(ValueError, match="type_known"):
        assert_expectations(obs.get, fail_on=["type_known"])


def test_gate_passes_on_clean_data(spark):
    clean = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0)], "event_type string, value double"
    )
    df, obs = observe_batch(clean, _rules())
    df.write.format("noop").mode("overwrite").save()
    assert_expectations(obs.get)  # no raise
    assert obs.get["n_rows"] == 2


def test_streaming_metrics_per_microbatch(spark, workdir):
    src = f"{workdir}/obs_src"
    _df(spark).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "event_type string, value double"
    ).parquet(src)
    observed = observe_stream(stream, "dq", _rules())
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", f"{workdir}/obs_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = progress_metrics(q, "dq")
    assert rows, "expected at least one micro-batch with observed metrics"
    total = sum(r["n_rows"] for r in rows)
    bad_value = sum(r["violations_value_positive"] for r in rows)
    assert total == 4 and bad_value == 1
    with pytest.raises(ValueError):
        assert_expectations(rows[-1] if len(rows) == 1 else {
            k: sum(r[k] for r in rows) for k in rows[0]
        })


def test_medallion_bronze_stage_observed(spark, workdir):
    """The parity pipeline carries its own DQ counters when asked: the
    bronze stage reports per-micro-batch rows/violations through the
    streaming progress, with zero extra scans and unchanged output."""
    from databricks_end_to_end_streaming_spark.streaming import ParquetTable
    from databricks_end_to_end_streaming_spark.streaming.medallion import (
        bronze_stage,
    )

    raw = ParquetTable(f"{workdir}/obs_raw")
    events = spark.createDataFrame(
        [(f"p{i}", f"e{i}", "created" if i % 3 else "", 1704067200 + i)
         for i in range(12)],
        "productId string, eventId string, type string, timestamp long",
    )
    raw.append(events.select(F.struct(*events.columns).alias("parsedValue")))
    bronze = ParquetTable(f"{workdir}/obs_bronze", partition_by=["type"])
    metrics = bronze_stage(
        spark,
        raw,
        bronze,
        f"{workdir}/obs_bronze_ckpt",
        observe_rules={"type_nonempty": F.col("type") != ""},
    )
    assert metrics is not None and sum(m["n_rows"] for m in metrics) == 12
    assert sum(m["violations_type_nonempty"] for m in metrics) == 4
    assert bronze.read(spark).count() == 12  # output unchanged
