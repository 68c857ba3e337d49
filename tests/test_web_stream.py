"""Incremental domain accounting (streaming/web_stage.py): drained
(domain, lang) partials reproduce the batch report bit-for-bit, replays
never double-count, and the prequential view tracks per-domain growth."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.web import url_domain_accounting
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.web_stage import (
    domain_accounting_from_log,
    domain_accounting_stage,
    domain_monitor_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.domain, r.reg_domain, r.n_docs, r.n_tokens, r.n_langs, r.n_tracking)
        for r in df.collect()
    )


def test_drained_stream_equals_batch_report(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/domains")
    stage = domain_accounting_stage(t)
    for i in range(3):
        stage(docs.where(F.col("doc_id") % 3 == i), i)
    assert _rows(domain_accounting_from_log(spark, t)) == _rows(
        url_domain_accounting(spark, SF_DIR)
    )


def test_replay_idempotent_and_growth_view(spark, workdir):
    t = ParquetTable(f"{workdir}/domains")
    stage = domain_accounting_stage(t)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = spark.createDataFrame(
        [(3, "alpha beta", "en", "srcX", 10), (6, "gamma", "fr", "srcX", 5)],
        schema,
    )
    b1 = spark.createDataFrame(
        [(9, "delta epsilon zeta", "en", "srcX", 18)], schema
    )
    stage(b0, 0)
    stage(b1, 1)
    before = _rows(domain_accounting_from_log(spark, t))
    stage(b1, 1)  # replay
    assert _rows(domain_accounting_from_log(spark, t)) == before
    # growth: doc_ids 3/6/9 are all %3==0 -> www. stripped by
    # normalization; 6 is even (.com), 3 and 9 odd (.org)
    asof0 = {
        r.domain: r
        for r in domain_accounting_from_log(spark, t, up_to_batch=0).collect()
    }
    assert asof0["srcx.example.org"].n_docs == 1
    assert asof0["srcx.example.com"].n_langs == 1
    now = {r.domain: r for r in domain_accounting_from_log(spark, t).collect()}
    assert now["srcx.example.org"].n_docs == 2
    assert now["srcx.example.org"].n_tokens == 2 + 3


def test_streaming_wrapper(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    src = f"{workdir}/src"
    docs.write.parquet(src)
    t = ParquetTable(f"{workdir}/domains")
    source = spark.readStream.schema(docs.schema).parquet(src)
    domain_monitor_stage(source, t, f"{workdir}/ckpt")
    assert _rows(domain_accounting_from_log(spark, t)) == _rows(
        url_domain_accounting(spark, SF_DIR)
    )
