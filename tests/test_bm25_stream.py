"""Incremental BM25 index (streaming/bm25.py): drained logs score the
query identically to the batch bm25_keyword_search, replays never
double-count statistics, and the prequential view answers as-of-batch-N."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.text import (
    bm25_keyword_search,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.bm25 import (
    bm25_index_stage,
    bm25_stage,
    bm25_topk_from_log,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _tables(workdir):
    return ParquetTable(f"{workdir}/features"), ParquetTable(f"{workdir}/stats")


def _topk(df):
    return [(r.doc_id, r.doclen, r.bm25) for r in df.collect()]


def test_drained_stream_equals_batch_topk_bitwise(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    f_t, s_t = _tables(workdir)
    stage = bm25_stage(f_t, s_t)
    for i in range(3):
        stage(docs.where(F.col("doc_id") % 3 == i), i)
    got = _topk(bm25_topk_from_log(spark, f_t, s_t))
    want = _topk(bm25_keyword_search(spark, SF_DIR))
    assert got == want and len(got) > 0


def test_replay_is_idempotent(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    f_t, s_t = _tables(workdir)
    stage = bm25_stage(f_t, s_t)
    stage(docs.where(F.col("doc_id") % 2 == 0), 0)
    stage(docs.where(F.col("doc_id") % 2 == 1), 1)
    before = _topk(bm25_topk_from_log(spark, f_t, s_t))
    stage(docs.where(F.col("doc_id") % 2 == 1), 1)  # replay batch 1
    assert _topk(bm25_topk_from_log(spark, f_t, s_t)) == before


def test_prequential_view_scores_as_of_batch(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    f_t, s_t = _tables(workdir)
    stage = bm25_stage(f_t, s_t)
    stage(docs.where(F.col("doc_id") < 100), 0)
    stage(docs.where(F.col("doc_id") >= 100), 1)
    asof0 = bm25_topk_from_log(spark, f_t, s_t, up_to_batch=0)
    # the as-of-batch-0 view must only contain batch-0 documents
    assert all(r.doc_id < 100 for r in asof0.collect())
    # and match a batch run restricted to the same corpus slice
    from databricks_end_to_end_streaming_spark.queries.text import (
        bm25_corpus_stats,
        bm25_doc_features,
        bm25_score_from,
    )

    base = bm25_doc_features(docs.where(F.col("doc_id") < 100))
    want = _topk(bm25_score_from(base, bm25_corpus_stats(base)))
    assert _topk(asof0) == want


def test_streaming_wrapper(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    src = f"{workdir}/src"
    docs.write.parquet(src)
    f_t, s_t = _tables(f"{workdir}/t")
    source = spark.readStream.schema(docs.schema).parquet(src)
    bm25_index_stage(source, f_t, s_t, f"{workdir}/ckpt")
    got = _topk(bm25_topk_from_log(spark, f_t, s_t))
    want = _topk(bm25_keyword_search(spark, SF_DIR))
    assert got == want
