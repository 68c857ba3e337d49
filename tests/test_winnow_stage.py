"""Incremental winnowing overlap (streaming/winnow_stage.py): drained
== batch bit-for-bit for any slicing, the per-batch probe finds
cross-batch overlaps without history-vs-history pairs, replays are
idempotent, and the readStream wrapper drains."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.dedup import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_overlap_from_fps,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.winnow_stage import (
    winnow_index_stage,
    winnow_pairs_from_log,
    winnow_pairs_with_batch,
    winnow_stage,
)


def _docs(spark):
    """30 random docs plus three planted overlap groups that straddle
    the batch boundaries used below (batches split at doc_id 10/20)."""
    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(5000)]

    def rand(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    run1 = rand(3 * (WINNOW_W + WINNOW_K))  # long: >= MIN_SHARED fps
    run2 = rand(3 * (WINNOW_W + WINNOW_K))
    rows = [(i, rand(150)) for i in range(30) if i not in (2, 5, 12, 25, 28)]
    rows += [
        (2, rand(40) + " " + run1 + " " + rand(40)),   # batch 0
        (25, rand(70) + " " + run1 + " " + rand(10)),  # batch 2 (cross)
        (5, rand(30) + " " + run2 + " " + rand(50)),   # batch 0
        (12, rand(20) + " " + run2 + " " + rand(60)),  # batch 1 (cross)
        (28, rand(10) + " " + run2 + " " + rand(70)),  # batch 2 (cross)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return sorted(
        (r.doc_a, r.doc_b, r.n_shared, round(r.overlap_score, 12))
        for r in df.collect()
    )


def _drain(spark, docs, workdir, name):
    fp = ParquetTable(f"{workdir}/{name}_fp")
    stage = winnow_stage(fp)
    for bid, cond in enumerate(
        ["doc_id < 10", "doc_id >= 10 and doc_id < 20", "doc_id >= 20"]
    ):
        stage(docs.where(cond), bid)
    return fp


def test_drained_equals_batch(spark, workdir):
    docs = _docs(spark)
    fp = _drain(spark, docs, workdir, "a")
    want = _pairs(winnow_overlap_from_fps(winnow_fingerprints(docs)))
    got = _pairs(winnow_pairs_from_log(spark, fp))
    assert got == want
    assert len(want) >= 2  # the planted groups actually pair


def test_probe_finds_cross_batch_only_pairs_with_batch_docs(spark, workdir):
    docs = _docs(spark)
    fp = _drain(spark, docs, workdir, "b")
    probe2 = _pairs(winnow_pairs_with_batch(spark, fp, 2))
    # every probed pair involves a batch-2 doc (id >= 20)
    assert probe2 and all(a >= 20 or b >= 20 for a, b, *_ in probe2)
    # the cross-batch plants surface: 2-25 and 12-28
    keys = {(a, b) for a, b, *_ in probe2}
    assert (2, 25) in keys and (12, 28) in keys
    # the batch-0-internal view of run2 (5, 12) is history-vs-history
    assert (5, 12) not in keys
    # probe results are a subset of the full drained pairing
    full = {(a, b) for a, b, *_ in _pairs(winnow_pairs_from_log(spark, fp))}
    assert keys <= full


def test_replay_idempotent_and_prequential(spark, workdir):
    docs = _docs(spark)
    fp = _drain(spark, docs, workdir, "c")
    before = _pairs(winnow_pairs_from_log(spark, fp))
    winnow_stage(fp)(docs.where("doc_id >= 20"), 2)  # replay batch 2
    assert _pairs(winnow_pairs_from_log(spark, fp)) == before
    # as-of batch 1: pairs among docs < 20 only
    asof = _pairs(winnow_pairs_from_log(spark, fp, up_to_batch=1))
    assert all(b < 20 for _, b, *_ in asof)
    want_asof = _pairs(
        winnow_overlap_from_fps(
            winnow_fingerprints(docs.where("doc_id < 20"))
        )
    )
    assert asof == want_asof


def test_readstream_wrapper_drains(spark, workdir):
    docs = _docs(spark)
    src = f"{workdir}/src"
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    fp = ParquetTable(f"{workdir}/fp")
    winnow_index_stage(stream, fp, f"{workdir}/ckpt")
    want = _pairs(winnow_overlap_from_fps(winnow_fingerprints(docs)))
    assert _pairs(winnow_pairs_from_log(spark, fp)) == want
