"""Incremental streaming near-dup (streaming/dedup_stage.py): cross-batch
pair discovery through the accumulated band index, within-batch pairs,
replay idempotence, and no signature recomputation for seen docs."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.streaming.dedup_stage import (
    neardup_batch,
    neardup_stage,
)
from databricks_end_to_end_streaming_spark.streaming.sinks import ParquetTable

WORDS = (
    "spark stream batch merge join filter window state store shuffle "
    "column row group agg sort hash scan table query plan"
).split()


def make_doc(rng, n_words=80):
    return " ".join(rng.choice(WORDS) for _ in range(n_words))


def perturb(rng, text, n_changes=1):
    # one word in 80 -> word-shingle jaccard ~0.93, where 8x4 banding
    # miss probability is ~1e-5 (3 changes gives ~0.8, where missing is
    # a few percent — too flaky to pin in a membership assertion)
    toks = text.split()
    for _ in range(n_changes):
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


def _fixture(spark):
    rng = random.Random(5)
    b1 = [(i, make_doc(rng)) for i in range(10)]
    b1.append((10, perturb(rng, b1[2][1])))  # within-batch pair (2, 10)
    b2 = [(i, make_doc(rng)) for i in range(20, 30)]
    b2.append((30, perturb(rng, b1[4][1])))  # cross-batch pair (4, 30)
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(b1, schema),
        spark.createDataFrame(b2, schema),
    )


def _tables(workdir):
    return (
        ParquetTable(f"{workdir}/docs"),
        ParquetTable(f"{workdir}/bands"),
        ParquetTable(f"{workdir}/pairs"),
    )


def pair_set(spark, pairs):
    return {
        (r["doc_a"], r["doc_b"])
        for r in pairs.read(spark).select("doc_a", "doc_b").collect()
    }


def test_incremental_finds_within_and_cross_batch_pairs(spark, workdir):
    df1, df2 = _fixture(spark)
    docs, bands, pairs = _tables(workdir)
    neardup_batch(df1, docs, bands, pairs, batch_id=0)
    assert pair_set(spark, pairs) == {(2, 10)}
    neardup_batch(df2, docs, bands, pairs, batch_id=1)
    assert pair_set(spark, pairs) == {(2, 10), (4, 30)}
    # the index holds band rows for every doc exactly once
    n_docs = docs.read(spark).count()
    assert n_docs == 22
    per_doc = (
        bands.read(spark).groupBy("doc_id").count().select("count").distinct()
    )
    assert [r["count"] for r in per_doc.collect()] == [8]  # N_BANDS rows each


def test_incremental_replay_is_idempotent(spark, workdir):
    df1, df2 = _fixture(spark)
    docs, bands, pairs = _tables(workdir)
    neardup_batch(df1, docs, bands, pairs, batch_id=0)
    neardup_batch(df2, docs, bands, pairs, batch_id=1)
    before_pairs = pair_set(spark, pairs)
    before_docs = docs.read(spark).count()
    # replay batch 1 (crash-after-partial-write scenario): overwrites its
    # own idempotent outputs, matches only strictly-older band rows, and
    # must NOT double-count its own docs in the verification corpus
    neardup_batch(df2, docs, bands, pairs, batch_id=1)
    assert pair_set(spark, pairs) == before_pairs
    # row-level check, not set-level: a duplicated corpus doc would emit
    # the same pair row twice
    assert pairs.read(spark).count() == len(before_pairs)
    assert docs.read(spark).count() == before_docs
    assert bands.read(spark).count() == 22 * 8


def test_streaming_wrapper_drains_file_batches(spark, workdir):
    df1, df2 = _fixture(spark)
    src = f"{workdir}/incoming"
    df1.coalesce(1).write.parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)
    docs, bands, pairs = _tables(workdir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    neardup_stage(stream, docs, bands, pairs, checkpoint=f"{workdir}/cp")
    got = pair_set(spark, pairs)
    assert (2, 10) in got and (4, 30) in got
    # file->batch assignment order isn't pinned, but the union of batches
    # is: every doc indexed once
    assert docs.read(spark).count() == 22
    # re-running the drained stream adds nothing (checkpoint respected)
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    neardup_stage(stream2, docs, bands, pairs, checkpoint=f"{workdir}/cp")
    assert pair_set(spark, pairs) == got
    assert docs.read(spark).count() == 22


def test_no_false_pairs_on_disjoint_batches(spark, workdir):
    rng = random.Random(17)
    a = spark.createDataFrame(
        [(i, make_doc(rng)) for i in range(8)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, make_doc(rng)) for i in range(100, 108)], "doc_id long, text string"
    )
    docs, bands, pairs = _tables(workdir)
    neardup_batch(a, docs, bands, pairs, batch_id=0)
    neardup_batch(b, docs, bands, pairs, batch_id=1)
    assert pair_set(spark, pairs) == set()
