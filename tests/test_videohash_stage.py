"""Incremental video near-dup (streaming/videohash_stage.py): drained
== batch alignment vote bit-for-bit, replay idempotence, and the
new-batch restriction catching a truncated re-upload of an EARLIER
batch's clip."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.phash import (
    video_neardup_pairs,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.videohash_stage import (
    video_pairs_from_log,
    video_pairs_with_batch,
    videohash_stage,
)
from tests.test_videohash import _clip, _video_rows


def _pairs(df):
    return sorted(
        (r["media_a"], r["media_b"], r["offset"], r["aligned_frames"])
        for r in df.collect()
    )


def _corpus(spark):
    rows = [(i, _clip(i, n=8)) for i in range(5)]
    # 100+i: truncated (first 2 frames dropped) brightness twins of 0..1
    rows += [
        (
            100 + i,
            np.clip(_clip(i, n=8)[2:].astype(np.int16) + 9, 0, 255).astype(
                np.uint8
            ),
        )
        for i in range(2)
    ]
    return _video_rows(spark, rows)


def test_drained_log_equals_batch_vote(spark, workdir):
    media = _corpus(spark)
    t = ParquetTable(f"{workdir}/vh")
    stage = videohash_stage(t)
    for i in range(3):
        stage(media.where(F.col("media_id") % 3 == i), i)
    stage(media.where(F.col("media_id") % 3 == 1), 1)  # replay
    got = _pairs(video_pairs_from_log(spark, t))
    want = _pairs(video_neardup_pairs(media))
    assert got == want and len(got) >= 2  # the two planted twins


def test_new_batch_restriction(spark, workdir):
    media = _corpus(spark)
    t = ParquetTable(f"{workdir}/vh")
    stage = videohash_stage(t)
    stage(media.where(F.col("media_id") < 100), 0)  # originals first
    stage(media.where(F.col("media_id") >= 100), 1)  # twins arrive later
    probe = _pairs(video_pairs_with_batch(spark, t, batch_id=1))
    # both truncated twins align with their originals at offset -2
    assert {(a, b, o) for a, b, o, _ in probe} >= {
        (0, 100, -2),
        (1, 101, -2),
    }
    assert all(a >= 100 or b >= 100 for a, b, _, _ in probe)
    # prequential as-of view at batch 0 has no twin pairs
    batch0 = _pairs(video_pairs_from_log(spark, t, up_to_batch=0))
    assert all(a < 100 and b < 100 for a, b, _, _ in batch0)
