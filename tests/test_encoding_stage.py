"""Incremental mojibake repair (streaming/encoding_stage.py): drained
== per-row batch repair for any slicing, replay-idempotent, and the
readStream wrapper drains end to end."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.encoding import (
    fix_mojibake_text,
    sloppy_cp1252_decode,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.encoding_stage import (
    encoding_repair_index_stage,
    encoding_repair_stage,
    repaired_from_log,
)


def corrupt(s: str) -> str:
    return sloppy_cp1252_decode(s.encode("utf-8"))


def _docs(spark):
    rows = [
        (i, corrupt(f"doc {i} café — it’s fine") if i % 3 == 0 else f"doc {i} plain")
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def _snapshot(spark, table):
    return sorted(
        (r.doc_id, r.text, r.markers_before, r.markers_after)
        for r in repaired_from_log(spark, table).collect()
    )


def test_drained_equals_batch_for_any_slicing(spark, workdir):
    docs, rows = _docs(spark)
    t = ParquetTable(f"{workdir}/repaired")
    stage = encoding_repair_stage(t)
    for i in range(4):  # uneven slicing
        stage(docs.where(F.col("doc_id") % 4 == i), i)
    got = _snapshot(spark, t)
    assert len(got) == len(rows)
    for doc_id, text, before, after in got:
        want = fix_mojibake_text(dict(rows)[doc_id])
        assert text == want
        assert after == 0  # repair eliminates every hint marker
        if doc_id % 3 == 0:
            assert before > 0


def test_replay_is_idempotent(spark, workdir):
    docs, _ = _docs(spark)
    t = ParquetTable(f"{workdir}/repaired")
    stage = encoding_repair_stage(t)
    stage(docs.where(F.col("doc_id") < 15), 0)
    stage(docs.where(F.col("doc_id") >= 15), 1)
    before = _snapshot(spark, t)
    stage(docs.where(F.col("doc_id") >= 15), 1)  # replay batch 1
    assert _snapshot(spark, t) == before


def test_readstream_wrapper_drains(spark, workdir):
    docs, rows = _docs(spark)
    src = f"{workdir}/src"
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    t = ParquetTable(f"{workdir}/repaired")
    encoding_repair_index_stage(stream, t, f"{workdir}/ckpt")
    got = _snapshot(spark, t)
    assert len(got) == len(rows)
    assert all(after == 0 for _, _, _, after in got)
