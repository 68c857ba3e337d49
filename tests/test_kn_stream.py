"""Incremental KN trigram LM (streaming/kn_lm.py): drained logs score
every document identically to the batch lm_kneser_ney_score, replays
never double-count, and the prequential view answers as-of-batch-N."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.kn_lm import (
    kn_lm_index_stage,
    kn_lm_stage,
    kn_scores_from_log,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _tables(workdir):
    return ParquetTable(f"{workdir}/inst"), ParquetTable(f"{workdir}/counts")


def _scores(df):
    return [(r.doc_id, r.n_trigrams, r.mean_kn_prob) for r in df.collect()]


def test_drained_stream_equals_batch_bitwise(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    i_t, c_t = _tables(workdir)
    stage = kn_lm_stage(i_t, c_t)
    for i in range(3):
        stage(docs.where(F.col("doc_id") % 3 == i), i)
    got = _scores(kn_scores_from_log(spark, i_t, c_t))
    want = _scores(all_queries()["lm_kneser_ney_score"](spark, SF_DIR))
    assert got == want and len(got) > 0


def test_replay_is_idempotent(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    i_t, c_t = _tables(workdir)
    stage = kn_lm_stage(i_t, c_t)
    stage(docs.where(F.col("doc_id") % 2 == 0), 0)
    stage(docs.where(F.col("doc_id") % 2 == 1), 1)
    before = _scores(kn_scores_from_log(spark, i_t, c_t))
    stage(docs.where(F.col("doc_id") % 2 == 1), 1)  # replay batch 1
    assert _scores(kn_scores_from_log(spark, i_t, c_t)) == before


def test_prequential_view_scores_as_of_batch(spark, workdir):
    """As-of-batch-0 must equal a batch run on batch 0's corpus slice:
    the model the early documents were scored under, not the final one."""
    from databricks_end_to_end_streaming_spark.queries.text import (
        kn_instances,
        kn_scores_from,
    )

    docs = load_table(spark, SF_DIR, "documents")
    i_t, c_t = _tables(workdir)
    stage = kn_lm_stage(i_t, c_t)
    stage(docs.where(F.col("doc_id") < 100), 0)
    stage(docs.where(F.col("doc_id") >= 100), 1)
    asof0 = kn_scores_from_log(spark, i_t, c_t, up_to_batch=0)
    assert all(r.doc_id < 100 for r in asof0.collect())
    inst = kn_instances(docs.where(F.col("doc_id") < 100))
    tri = inst.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    assert _scores(asof0) == _scores(kn_scores_from(inst, tri))


def test_streaming_wrapper(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    src = f"{workdir}/src"
    docs.write.parquet(src)
    i_t, c_t = _tables(f"{workdir}/t")
    source = spark.readStream.schema(docs.schema).parquet(src)
    kn_lm_index_stage(source, i_t, c_t, f"{workdir}/ckpt")
    got = _scores(kn_scores_from_log(spark, i_t, c_t))
    want = _scores(all_queries()["lm_kneser_ney_score"](spark, SF_DIR))
    assert got == want


def test_drained_ccnet_buckets_equal_batch(spark, workdir):
    """Bucket view over the drained log == the registered
    ccnet_perplexity_buckets bit-for-bit (incremental twin)."""
    from databricks_end_to_end_streaming_spark.streaming.kn_lm import (
        ccnet_buckets_from_log,
    )

    docs = load_table(spark, SF_DIR, "documents")
    i_t, c_t = _tables(workdir)
    stage = kn_lm_stage(i_t, c_t)
    for i in range(3):
        stage(docs.where(F.col("doc_id") % 3 == i), i)
    langs = docs.select("doc_id", "lang")
    got = sorted(
        (r.doc_id, r.lang, r.mean_kn_prob, r.bucket)
        for r in ccnet_buckets_from_log(spark, i_t, c_t, langs).collect()
    )
    want = sorted(
        (r.doc_id, r.lang, r.mean_kn_prob, r.bucket)
        for r in all_queries()["ccnet_perplexity_buckets"](
            spark, SF_DIR
        ).collect()
    )
    assert got == want and len(got) > 0
