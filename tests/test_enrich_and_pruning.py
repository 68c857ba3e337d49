"""Stream-static enrichment + partition-pruning evidence for the
medallion layout (partitionBy('type') — SURVEY T10)."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.schemas import PRODUCT_IDS
from databricks_end_to_end_streaming_spark.sources import generate_events
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.medallion import (
    bronze_stage,
    enrich_transform,
)
from tests.test_medallion import build_raw


def test_stream_static_enrich_broadcasts_dim(spark, workdir):
    events = generate_events(40, seed=41)
    raw = build_raw(spark, workdir, events)
    bronze = ParquetTable(f"{workdir}/bronze", partition_by=["type"])
    bronze_stage(spark, raw, bronze, f"{workdir}/cp/bronze")

    dim = spark.createDataFrame(
        [(p, f"category-{i}") for i, p in enumerate(PRODUCT_IDS)],
        "productId string, category string",
    )
    stream = bronze.stream(spark)
    enriched = enrich_transform(stream, dim)

    out = ParquetTable(f"{workdir}/enriched")
    (
        enriched.writeStream.foreachBatch(lambda b, _i: out.append(b))
        .option("checkpointLocation", f"{workdir}/cp/enrich")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = out.read(spark)
    assert got.count() == len(events)
    assert got.where(F.col("category").isNull()).count() == 0
    cats = {r["category"] for r in got.select("category").distinct().collect()}
    assert cats == {f"category-{i}" for i in range(len(PRODUCT_IDS))}


def test_partitioned_table_prunes_on_type(spark, workdir):
    """A type-filtered read of the partitionBy('type') bronze table must
    prune at the partition level (PartitionFilters), not scan-and-filter."""
    events = generate_events(60, seed=42)
    raw = build_raw(spark, workdir, events)
    bronze = ParquetTable(f"{workdir}/bronze", partition_by=["type"])
    bronze_stage(spark, raw, bronze, f"{workdir}/cp/bronze")

    df = bronze.read(spark).where(F.col("type") == "shirt")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    part_section = plan.split("PartitionFilters")[1][:200]
    assert "type" in part_section  # pruned at partition level
    # and the filter is NOT a post-scan data filter on type
    assert df.count() == sum(1 for e in events if e["type"] == "shirt")
