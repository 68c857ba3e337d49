"""Incremental audio near-dup (streaming/audiohash_stage.py): drained
== batch pairing bit-for-bit, replay idempotence, and the
new-batch-vs-corpus probe catching a gain-scaled twin of an EARLIER
batch's clip."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.audiohash import (
    audio_neardup_pairs,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.audiohash_stage import (
    audio_pairs_from_log,
    audio_pairs_with_batch,
    audiohash_stage,
)
from tests.test_audiohash import _clip, _media


def _pairs(df):
    return sorted(
        (r["media_a"], r["media_b"], r["hamming"]) for r in df.collect()
    )


def _corpus(spark):
    rows = [(i, _clip(i)) for i in range(8)]
    # plant twins: 100+i is an exact half-gain copy of i for i in 0..2
    rows += [
        (100 + i, (_clip(i).astype(np.int64) // 2).astype(np.int16))
        for i in range(3)
    ]
    return _media(spark, rows)


def test_drained_log_equals_batch_pairing(spark, workdir):
    media = _corpus(spark)
    t = ParquetTable(f"{workdir}/ah")
    stage = audiohash_stage(t)
    for i in range(3):
        stage(media.where(F.col("media_id") % 3 == i), i)
    stage(media.where(F.col("media_id") % 3 == 1), 1)  # replay
    got = _pairs(audio_pairs_from_log(spark, t))
    want = _pairs(audio_neardup_pairs(media))
    assert got == want and len(got) >= 3  # the three planted twins


def test_new_batch_probe_finds_cross_batch_twin(spark, workdir):
    media = _corpus(spark)
    t = ParquetTable(f"{workdir}/ah")
    stage = audiohash_stage(t)
    stage(media.where(F.col("media_id") < 100), 0)  # originals first
    stage(media.where(F.col("media_id") >= 100), 1)  # twins arrive later
    probe = _pairs(audio_pairs_with_batch(spark, t, batch_id=1))
    # every planted gain twin pairs with its batch-0 original (hamming 0)
    assert {(a, b) for a, b, _ in probe} >= {(i, 100 + i) for i in range(3)}
    # and the probe contains ONLY pairs touching batch 1
    assert all(a >= 100 or b >= 100 for a, b, _ in probe)
    # prequential as-of view at batch 0 has no twins yet
    batch0 = _pairs(audio_pairs_from_log(spark, t, up_to_batch=0))
    assert all(a < 100 and b < 100 for a, b, _ in batch0)
