"""Incremental Zipf monitoring (streaming/zipf_stage.py): drained ==
batch bit-for-bit for any slicing (counts are a sum monoid), replays
are idempotent, the prequential view tracks slope drift, and the
readStream wrapper drains."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.zipf_stage import (
    token_count_stage,
    zipf_from_log,
    zipf_index_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.lang, r.vocab_size, r.total_tokens, r.zipf_slope, r.zipf_intercept)
        for r in df.collect()
    )


def test_drained_equals_batch_any_slicing(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/tokens")
    stage = token_count_stage(t)
    for bid in range(3):  # arbitrary (non-ordered) slicing
        stage(docs.where(F.col("doc_id") % 3 == bid), bid)
    want = _rows(all_queries()["zipf_fit_per_lang"](spark, SF_DIR))
    assert _rows(zipf_from_log(spark, t)) == want
    # replay a batch: unchanged
    stage(docs.where(F.col("doc_id") % 3 == 1), 1)
    assert _rows(zipf_from_log(spark, t)) == want


def test_prequential_view_detects_drift(spark, workdir):
    """Planted drift: batch 0 is Zipfian, batch 1 dumps template spam
    (one token repeated 3000x) — the spammed language's slope moves
    sharply (a dominant head token steepens the log-log line) while the
    untouched language is bit-identical across the as-of views."""
    zipf_words = []
    for r in range(1, 31):
        zipf_words += [f"w{r:03d}"] * max(round(300 / r), 1)
    rows = [(0, " ".join(zipf_words), "en", "s", 1)]
    rows.append((1, " ".join(zipf_words), "de", "s", 1))
    # batch 1: en gets spammed with one hot template token
    rows.append((2, "spamtok " * 3000, "en", "s", 1))
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    t = ParquetTable(f"{workdir}/tokens")
    stage = token_count_stage(t)
    stage(docs.where("doc_id < 2"), 0)
    stage(docs.where("doc_id = 2"), 1)
    asof0 = {r.lang: r.zipf_slope for r in zipf_from_log(spark, t, 0).collect()}
    asof1 = {r.lang: r.zipf_slope for r in zipf_from_log(spark, t, 1).collect()}
    assert abs(asof0["en"] - (-1.0)) < 0.1  # Zipfian before the spam
    assert asof1["de"] == asof0["de"]  # untouched language unchanged
    assert abs(asof1["en"] - asof0["en"]) > 0.1  # spam moves the slope


def test_readstream_wrapper_drains(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    )
    src = f"{workdir}/src"
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    t = ParquetTable(f"{workdir}/tokens")
    zipf_index_stage(stream, t, f"{workdir}/ckpt")
    want = _rows(all_queries()["zipf_fit_per_lang"](spark, SF_DIR))
    assert _rows(zipf_from_log(spark, t)) == want
