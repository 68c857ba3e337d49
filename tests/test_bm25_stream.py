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


def test_param_bm25_agrees_with_fixed_on_shared_terms(spark, workdir):
    """bm25_param driven with BM25_TERMS must rank exactly like the
    fixed-column query wherever both are defined. The fixed query scores
    EVERY doc (zero included); the param variant returns matching docs
    only — so the corpus plants >top_k docs that match, making both
    top-k lists comparable. Scores differ only by the param variant's
    integer-micro rollup (<= n_terms micro-units)."""
    from databricks_end_to_end_streaming_spark.queries.text import (
        BM25_TERMS,
        bm25_corpus_stats,
        bm25_doc_features,
        bm25_param,
        bm25_score_from,
    )

    import random

    rng = random.Random(99)
    filler = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows = []
    for i in range(60):
        toks = [rng.choice(filler) for _ in range(rng.randint(8, 30))]
        # every doc matches at least one query term, varied frequencies
        for t in BM25_TERMS:
            toks += [t] * rng.randint(0, 4)
        if not any(t in toks for t in BM25_TERMS):
            toks.append(BM25_TERMS[0])
        rng.shuffle(toks)
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    base = bm25_doc_features(docs)
    fixed = bm25_score_from(base, bm25_corpus_stats(base)).collect()
    terms = spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")
    param = bm25_param(docs, terms).collect()

    assert [r.doc_id for r in fixed] == [r.doc_id for r in param]
    for a, b in zip(fixed, param):
        assert abs(a.bm25 - b.bm25) < 1e-4, (a, b)


def test_param_bm25_plan_has_no_corpus_explode(spark, workdir):
    from databricks_end_to_end_streaming_spark.queries.text import bm25_param

    docs = spark.createDataFrame(
        [(1, "spark shuffle"), (2, "join the line")], "doc_id long, text string"
    )
    terms = spark.createDataFrame([("spark",), ("join",)], "term string")
    plan = bm25_param(docs, terms)._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in plan  # corpus is never exploded
    assert "BroadcastNestedLoopJoin" in plan  # terms replicate map-side
