"""Incremental perceptual image near-dup (streaming/phash_stage.py):
drained == batch pairing bit-for-bit, replay idempotence, and the
new-batch-vs-corpus probe catching a twin of an EARLIER batch's
image."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.phash import (
    phash_neardup_pairs,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.phash_stage import (
    pairs_with_batch,
    phash_pairs_from_log,
    phash_stage,
)
from tests.test_phash import _base_image, _media_rows


def _pairs(df):
    return sorted(
        (r["media_a"], r["media_b"], r["hamming"]) for r in df.collect()
    )


def _corpus(spark):
    rows = [(i, _base_image(i)) for i in range(8)]
    # plant twins: 100+i is a brightness twin of i for i in 0..2
    rows += [
        (
            100 + i,
            np.clip(_base_image(i).astype(np.int16) + 9, 0, 255).astype(
                np.uint8
            ),
        )
        for i in range(3)
    ]
    return _media_rows(spark, rows)


def test_drained_log_equals_batch_pairing(spark, workdir):
    media = _corpus(spark)
    t = ParquetTable(f"{workdir}/ph")
    stage = phash_stage(t)
    for i in range(3):
        stage(media.where(F.col("media_id") % 3 == i), i)
    stage(media.where(F.col("media_id") % 3 == 1), 1)  # replay
    got = _pairs(phash_pairs_from_log(spark, t))
    want = _pairs(phash_neardup_pairs(media))
    assert got == want and len(got) >= 3  # the three planted twins


def test_new_batch_probe_finds_cross_batch_twin(spark, workdir):
    media = _corpus(spark)
    t = ParquetTable(f"{workdir}/ph")
    stage = phash_stage(t)
    stage(media.where(F.col("media_id") < 100), 0)  # originals first
    stage(media.where(F.col("media_id") >= 100), 1)  # twins arrive later
    probe = _pairs(pairs_with_batch(spark, t, batch_id=1))
    # every planted twin pairs with its batch-0 original
    assert {(a, b) for a, b, _ in probe} >= {(i, 100 + i) for i in range(3)}
    # and the probe contains ONLY pairs touching batch 1
    assert all(a >= 100 or b >= 100 for a, b, _ in probe)
