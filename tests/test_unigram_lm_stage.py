"""Streaming unigram-LM twin (streaming/unigram_lm_stage.py): the
drained vocabulary log re-learns to the registered batch query's exact
output, replays never double-add, and the as-of view pins."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.unigram_lm_stage import (
    folded_vocab,
    unigram_piece_stats_from_log,
    vocab_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_drained_equals_batch_query_and_replays(spark, workdir):
    d = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/unigram_vocab")
    stage = vocab_stage(t)
    slices = [d.where(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, sl in enumerate(slices):
        stage(sl, i)
    got = [
        tuple(r) for r in unigram_piece_stats_from_log(spark, t).collect()
    ]
    want = [
        tuple(r)
        for r in all_queries()["unigram_lm_piece_stats"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == want and len(got) > 0
    stage(slices[1], 1)  # replay
    assert [
        tuple(r) for r in unigram_piece_stats_from_log(spark, t).collect()
    ] == want


def test_vocab_log_folds_to_word_frequencies(spark, workdir):
    rows = [("a b a",), ("b c",), ("a",)]
    d = spark.createDataFrame(rows, "text string")
    t = ParquetTable(f"{workdir}/vocmono")
    stage = vocab_stage(t)
    stage(d.limit(2), 0)
    stage(d.subtract(d.limit(2)), 1)
    got = {r["word"]: r["freq"] for r in folded_vocab(spark, t).collect()}
    assert got == {"a": 3, "b": 2, "c": 1}


def test_as_of_view_pins_a_smaller_tokenizer(spark, workdir):
    """Batch 0 alone vs batches 0+1: the as-of view at 0 must equal a
    from-scratch learn on batch 0's corpus (tokenizer-drift audit
    semantics)."""
    from databricks_end_to_end_streaming_spark.operators.unigram_lm import (
        piece_stats,
        word_vocab,
    )

    d0 = spark.createDataFrame([("the cat sat",)], "text string")
    d1 = spark.createDataFrame([("an entirely different corpus slice",)],
                               "text string")
    t = ParquetTable(f"{workdir}/asof")
    stage = vocab_stage(t)
    stage(d0, 0)
    stage(d1, 1)
    got0 = [
        tuple(r)
        for r in unigram_piece_stats_from_log(
            spark, t, up_to_batch=0
        ).collect()
    ]
    want0 = [tuple(r) for r in piece_stats(word_vocab(d0)).collect()]
    assert got0 == want0
    full = unigram_piece_stats_from_log(spark, t).collect()
    assert len(full) > len(got0)  # the wider corpus grew the inventory


def test_frozen_viterbi_drained_equals_batch_query_and_replays(
    spark, workdir
):
    """The r12 frozen-model twin shares the same vocabulary log: the
    drained log scored through frozen_piece_stats equals the registered
    hash-oracled batch query bit-for-bit, and a replayed batch never
    double-adds."""
    from databricks_end_to_end_streaming_spark.streaming.unigram_lm_stage import (  # noqa: E501
        frozen_viterbi_stats_from_log,
    )

    d = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/unigram_vocab_frozen")
    stage = vocab_stage(t)
    slices = [d.where(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, sl in enumerate(slices):
        stage(sl, i)
    got = [
        tuple(r) for r in frozen_viterbi_stats_from_log(spark, t).collect()
    ]
    want = [
        tuple(r)
        for r in all_queries()["unigram_frozen_viterbi_stats"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == want and len(got) > 0
    stage(slices[2], 2)  # replay
    assert [
        tuple(r) for r in frozen_viterbi_stats_from_log(spark, t).collect()
    ] == want
