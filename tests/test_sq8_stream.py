"""Incremental SQ8 calibration (streaming/sq8_stage.py): drained d-row
min/max partials reproduce the batch quantization codes bit-for-bit,
replays never move an extreme, and the prequential view exposes
calibration drift."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import types as T

from databricks_end_to_end_streaming_spark.queries.similarity import (
    EMB_DIM,
    sq8_embedding_quantization,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.sq8_stage import (
    sq8_calibration_stage,
    sq8_quantize_with_log,
    sq8_stats_from_log,
    sq8_stats_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _codes(df):
    return sorted((r.vec_id, tuple(r.codes)) for r in df.collect())


def test_drained_stream_equals_batch_codes(spark, workdir):
    emb = load_table(spark, SF_DIR, "embeddings")
    t = ParquetTable(f"{workdir}/dimstats")
    stage = sq8_stats_stage(t)
    for i in range(3):
        stage(emb.where(F.col("vec_id") % 3 == i), i)
    streamed = sq8_quantize_with_log(emb, spark, t).select("vec_id", "codes")
    batch = sq8_embedding_quantization(spark, SF_DIR).select(
        "vec_id", F.split("codes_csv", ",").cast("array<int>").alias("codes")
    )
    assert _codes(streamed) == _codes(batch)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("label", T.IntegerType()),
            ]
        ),
    )


def test_replay_idempotent_and_drift_view(spark, workdir):
    t = ParquetTable(f"{workdir}/dimstats")
    stage = sq8_stats_stage(t)
    narrow = _emb(spark, [(i, np.full(EMB_DIM, 0.1 * i)) for i in range(4)])
    wide = _emb(spark, [(10, np.full(EMB_DIM, 5.0)), (11, np.full(EMB_DIM, -5.0))])
    stage(narrow, 0)
    stage(wide, 1)
    before = sorted(map(tuple, sq8_stats_from_log(spark, t).collect()))
    stage(wide, 1)  # replay
    assert sorted(map(tuple, sq8_stats_from_log(spark, t).collect())) == before
    # drift: epoch 0 spans [0, 0.3]; epoch 1 widens to [-5, 5]
    s0 = sq8_stats_from_log(spark, t, up_to_batch=0).where(F.col("i") == 0).first()
    s1 = sq8_stats_from_log(spark, t).where(F.col("i") == 0).first()
    assert s0.mn == 0 and s1.mn < s0.mn and s1.mx > s0.mx


def test_streaming_wrapper(spark, workdir):
    emb = load_table(spark, SF_DIR, "embeddings")
    src = f"{workdir}/src"
    emb.write.parquet(src)
    t = ParquetTable(f"{workdir}/dimstats")
    source = spark.readStream.schema(emb.schema).parquet(src)
    sq8_calibration_stage(source, t, f"{workdir}/ckpt")
    streamed = sq8_quantize_with_log(emb, spark, t).select("vec_id", "codes")
    batch = sq8_embedding_quantization(spark, SF_DIR).select(
        "vec_id", F.split("codes_csv", ",").cast("array<int>").alias("codes")
    )
    assert _codes(streamed) == _codes(batch)
