"""Incremental exact near-dup (streaming/ppjoin_stage.py): drained
pairs equal the batch exact prefix-filter join bit-for-bit, cross-batch
pairs are found, and replays never duplicate pairs."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.dedup import (
    jaccard_prefix_filter_join,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.ppjoin_stage import (
    exact_neardup_batch,
    exact_neardup_stage,
    exact_pairs_from_log,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _tables(workdir):
    return (
        ParquetTable(f"{workdir}/docs"),
        ParquetTable(f"{workdir}/prefix"),
        ParquetTable(f"{workdir}/pairs"),
    )


def _pairs(df):
    return sorted(
        (r.doc_a, r.doc_b, r.n_sh_a, r.n_sh_b, r.overlap, r.jaccard)
        for r in df.collect()
    )


def test_drained_equals_batch_exact_join(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    d_t, x_t, p_t = _tables(workdir)
    for i in range(3):
        exact_neardup_batch(
            docs.where(F.col("doc_id") % 3 == i), d_t, x_t, p_t, i
        )
    got = _pairs(exact_pairs_from_log(spark, p_t))
    want = _pairs(jaccard_prefix_filter_join(spark, SF_DIR))
    assert got == want and len(got) > 0


def test_cross_batch_pair_found(spark, workdir):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows0 = [(1, base, "en", "s", 1), (3, "one two three four five", "en", "s", 1)]
    rows1 = [(2, base + " lambda", "en", "s", 1)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    d_t, x_t, p_t = _tables(workdir)
    exact_neardup_batch(spark.createDataFrame(rows0, schema), d_t, x_t, p_t, 0)
    exact_neardup_batch(spark.createDataFrame(rows1, schema), d_t, x_t, p_t, 1)
    got = _pairs(exact_pairs_from_log(spark, p_t))
    assert [(a, b) for a, b, *_ in got] == [(1, 2)]  # across batches


def test_replay_is_idempotent(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    d_t, x_t, p_t = _tables(workdir)
    exact_neardup_batch(docs.where(F.col("doc_id") % 2 == 0), d_t, x_t, p_t, 0)
    exact_neardup_batch(docs.where(F.col("doc_id") % 2 == 1), d_t, x_t, p_t, 1)
    before = _pairs(exact_pairs_from_log(spark, p_t))
    exact_neardup_batch(docs.where(F.col("doc_id") % 2 == 1), d_t, x_t, p_t, 1)
    assert _pairs(exact_pairs_from_log(spark, p_t)) == before


def test_streaming_wrapper(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    src = f"{workdir}/src"
    docs.write.parquet(src)
    source = spark.readStream.schema(docs.schema).parquet(src)
    d_t, x_t, p_t = _tables(f"{workdir}/t")
    exact_neardup_stage(source, d_t, x_t, p_t, f"{workdir}/ckpt")
    got = _pairs(exact_pairs_from_log(spark, p_t))
    want = _pairs(jaccard_prefix_filter_join(spark, SF_DIR))
    assert got == want
