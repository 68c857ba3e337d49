"""Incremental ANN index (streaming/ann_stage.py): drained == the
registered multiprobe batch query bit-for-bit, replay idempotence, and
the as-of view equals a from-scratch answer over the prefix corpus."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.ann_stage import (
    ann_index_stage,
    ann_topk_from_index,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _queries(emb):
    return emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )


def test_drained_index_equals_batch_query_and_replays(spark, workdir):
    emb = load_table(spark, SF_DIR, "embeddings")
    t = ParquetTable(f"{workdir}/ann_index")
    stage = ann_index_stage(t)
    slices = [emb.where(F.col("vec_id") % 3 == i) for i in range(3)]
    for i, sl in enumerate(slices):
        stage(sl, i)
    got = [
        tuple(r)
        for r in ann_topk_from_index(spark, t, _queries(emb))
        .select("query_id", "neighbor_id", "rank")
        .collect()
    ]
    want = [
        tuple(r)
        for r in all_queries()["ann_multiprobe_lsh_topk"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == want and len(got) > 0
    stage(slices[1], 1)  # replay: token overwrite, no duplicate candidates
    assert [
        tuple(r)
        for r in ann_topk_from_index(spark, t, _queries(emb))
        .select("query_id", "neighbor_id", "rank")
        .collect()
    ] == want


def test_as_of_view_is_ann_over_the_prefix_corpus(spark, workdir):
    from databricks_end_to_end_streaming_spark.operators.similarity import (
        ann_multiprobe_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    t = ParquetTable(f"{workdir}/ann_index2")
    stage = ann_index_stage(t)
    early = emb.where(F.col("vec_id") % 2 == 0)
    late = emb.where(F.col("vec_id") % 2 == 1)
    stage(early, 0)
    stage(late, 1)
    q = _queries(emb)
    asof = [
        tuple(r)
        for r in ann_topk_from_index(spark, t, q, up_to_batch=0).collect()
    ]
    scratch = [
        tuple(r) for r in ann_multiprobe_topk(early, q, k=5).collect()
    ]
    assert sorted(asof) == sorted(scratch) and len(asof) > 0
    # and the full index answers differently (late vectors are visible)
    full = [tuple(r) for r in ann_topk_from_index(spark, t, q).collect()]
    assert full != asof
