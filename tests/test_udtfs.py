"""Python UDTF (functions/udtfs.py): the imperative segmenter agrees
with the expression-based text_chunking scale path."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.functions.udtfs import (
    SegmentText,
    register_udtfs,
)
from databricks_end_to_end_streaming_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def test_udtf_agrees_with_expression_chunking(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    via_udtf = docs.lateralJoin(SegmentText(F.col("text").outer())).select(
        "doc_id",
        F.col("seg_idx").alias("chunk_idx"),
        F.col("n_tokens").cast("long").alias("chunk_tokens"),
    )
    expr_twin = (
        all_queries()["text_chunking"](spark, SF)
        .join(docs.select("doc_id"), "doc_id")
    )
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, expr_twin.collect())
    )


def test_udtf_from_sql_lateral(spark):
    register_udtfs(spark)
    spark.read.parquet(f"{SF}/documents.parquet").limit(5).createOrReplaceTempView(
        "udtf_docs"
    )
    rows = spark.sql(
        "SELECT d.doc_id, s.seg_idx, s.n_tokens "
        "FROM udtf_docs d, LATERAL segment_text(d.text) s"
    ).collect()
    assert rows and all(r["n_tokens"] <= 50 for r in rows)
    # segments reconstruct coverage: first segment starts the doc
    segs = spark.sql(
        "SELECT s.segment FROM udtf_docs d, LATERAL segment_text(d.text) s "
        "WHERE d.doc_id = (SELECT min(doc_id) FROM udtf_docs) AND s.seg_idx = 0"
    ).collect()
    first_doc = spark.sql(
        "SELECT text FROM udtf_docs ORDER BY doc_id LIMIT 1"
    ).collect()[0]["text"]
    assert first_doc.split()[:3] == segs[0]["segment"].split()[:3]


def test_udtf_edge_inputs(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two three")], "id long, text string"
    )
    out = df.lateralJoin(SegmentText(F.col("text").outer())).collect()
    # null/empty docs emit nothing; the short doc emits one segment
    assert [(r["id"], r["seg_idx"], r["n_tokens"]) for r in out] == [
        (3, 0, 3)
    ]
