"""Content-defined chunking (operators/cdc.py): exactness vs a
sequential Python reference, the boundary-stability property that is
CDC's whole point (edits shift fixed-size blocks but not downstream
content-defined cuts), and the dedup-accounting query's algebra."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.cdc import (
    CDC_MASK,
    CDC_MASK_BITS,
    CDC_MOD,
    CDC_POW,
    CDC_WINDOW,
    cdc_chunks,
)


def ref_chunks(text: str) -> list[tuple[int, int, str]]:
    """Sequential reference: (start, length, md5) per chunk under the
    exact operator semantics (polynomial rolling hash over bytes,
    cut where h % 2^mask_bits == mask, final partial chunk unless a
    cut lands on the last byte)."""
    b = text.encode("ascii")
    n = len(b)
    cuts = []
    for pos in range(CDC_WINDOW - 1, n):
        h = 0
        for j in range(CDC_WINDOW):
            h = (h + b[pos - j] * CDC_POW[j]) % CDC_MOD
        if h % (1 << CDC_MASK_BITS) == CDC_MASK:
            cuts.append(pos)
    ends = cuts if (cuts and cuts[-1] == n - 1) else cuts + [n - 1]
    starts = [0] + [c + 1 for c in cuts]
    out = []
    for s, e in zip(starts, ends):
        chunk = b[s : e + 1]
        out.append((s, e - s + 1, hashlib.md5(chunk).hexdigest()))
    return out


def test_spark_chunks_match_sequential_reference(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(F.length("text") == F.octet_length("text"))
        .limit(40)
        .collect()
    )
    d = spark.createDataFrame(
        [(r.doc_id, r.text) for r in docs], "doc_id long, text string"
    )
    got = {}
    for r in cdc_chunks(d).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_start, r.chunk_len, r.fp)
        )
    assert len(got) == len(docs)
    for r in docs:
        assert sorted(got[r.doc_id]) == sorted(ref_chunks(r.text)), r.doc_id


def test_edit_shifts_do_not_shift_downstream_cuts(spark):
    """Prepend bytes to a document: every fixed-size block shifts, but
    content-defined chunks downstream of the first post-edit cut are
    byte-identical — the two versions share chunk fingerprints. (The
    reference checks the property holds in the sequential semantics
    too, so a Spark/py divergence can't fake it.)"""
    base = "".join(
        f"word{i % 97} sentence {i * 7919 % 1000} " for i in range(200)
    )
    edited = "INSERTED-PREFIX-BYTES " + base
    a, b = ref_chunks(base), ref_chunks(edited)
    shared_ref = {fp for _, _, fp in a} & {fp for _, _, fp in b}
    assert shared_ref  # CDC survives the shift; fixed blocks would not

    d = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    ch = cdc_chunks(d).collect()
    fps = {1: set(), 2: set()}
    for r in ch:
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2] == shared_ref
    # and the shared chunks are the TAIL content, not the edited front
    first_chunk_a = min(
        (r for r in ch if r.doc_id == 1), key=lambda r: r.chunk_start
    )
    assert first_chunk_a.fp not in fps[2] or first_chunk_a.chunk_len >= len(
        "INSERTED-PREFIX-BYTES "
    )


def test_dedup_accounting_counts_exact_twin_chunks(spark):
    """Two byte-identical docs: every chunk occurs >= 2x, and the
    histogram's total/distinct bytes keep the invariant
    total = sum(occ * len) >= distinct = sum(len)."""
    text = "".join(f"tok{i % 53} {i * 31 % 500} " for i in range(300))
    d = spark.createDataFrame(
        [(1, text), (2, text), (3, "short unique doc " * 20)],
        "doc_id long, text string",
    )
    grp = (
        cdc_chunks(d)
        .groupBy("fp")
        .agg(F.max("chunk_len").alias("len"), F.count("*").alias("occ"))
        .collect()
    )
    twin_fps = {r.fp for r in grp if r.occ >= 2}
    solo = {r.fp: r for r in grp if r.occ == 1}
    assert twin_fps  # the identical pair shares every chunk
    n_bytes = sum(r.len * r.occ for r in grp)
    assert n_bytes == len(text) * 2 + len("short unique doc " * 20)
    assert sum(r.len for r in grp) < n_bytes  # dedup actually saves


def test_plan_stays_jvm_side(spark):
    d = spark.createDataFrame([(1, "x" * 400)], "doc_id long, text string")
    plan = cdc_chunks(d)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_streaming_twin_drained_equals_batch_and_replays(spark, workdir):
    """3-way corpus slices through the cdc stage fold to the registered
    batch query bit-for-bit; a replayed batch never double-counts."""
    from databricks_end_to_end_streaming_spark.queries import all_queries
    from databricks_end_to_end_streaming_spark.streaming import ParquetTable
    from databricks_end_to_end_streaming_spark.streaming.cdc_stage import (
        cdc_report_from_log,
        cdc_stage,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    t = ParquetTable(f"{workdir}/cdc_log")
    stage = cdc_stage(t)
    for i in range(3):
        stage(d.where(F.col("doc_id") % 3 == i), i)
    got = [tuple(r) for r in cdc_report_from_log(spark, t).collect()]
    want = [
        tuple(r)
        for r in all_queries()["cdc_chunk_dedup"](spark, sf).collect()
    ]
    assert got == want and len(got) > 0
    stage(d.where(F.col("doc_id") % 3 == 1), 1)  # replay
    assert [
        tuple(r) for r in cdc_report_from_log(spark, t).collect()
    ] == want
