"""Incremental dataset manifests (streaming/manifest_stage.py): folded
partials reproduce both batch manifest queries bit-for-bit on arbitrary
slices, replays are idempotent, and the fingerprint detects change."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.manifest_stage import (
    corpus_manifest_from_log,
    manifest_stage,
    split_manifest_from_log,
    split_manifest_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _slices(d):
    return [d.where(F.col("doc_id") % 3 == i) for i in range(3)]


def test_corpus_manifest_drained_equals_batch_and_replays(spark, workdir):
    d = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/manifest")
    stage = manifest_stage(t)
    for i, sl in enumerate(_slices(d)):
        stage(sl, i)
    got = sorted(map(tuple, corpus_manifest_from_log(spark, t).collect()))
    want = sorted(
        map(tuple, all_queries()["corpus_manifest"](spark, SF_DIR).collect())
    )
    assert got == want and len(got) > 0
    stage(_slices(d)[0], 0)  # replay
    assert (
        sorted(map(tuple, corpus_manifest_from_log(spark, t).collect()))
        == want
    )


def test_split_manifest_drained_equals_batch(spark, workdir):
    d = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/splitmanifest")
    stage = split_manifest_stage(t)
    for i, sl in enumerate(_slices(d)):
        stage(sl, i)
    got = sorted(map(tuple, split_manifest_from_log(spark, t).collect()))
    want = sorted(
        map(
            tuple,
            all_queries()["corpus_hash_split_manifest"](
                spark, SF_DIR
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_fingerprint_detects_an_edited_batch(spark, workdir):
    """Re-appending batch 1 with one document's text edited (same
    token — simulating a corrupted replay) flips content_xor for that
    source while count/chars stay equal: exactly the corruption class
    the fingerprint exists to catch."""
    d = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/edited")
    stage = manifest_stage(t)
    s0, s1, s2 = _slices(d)
    for i, sl in enumerate((s0, s1, s2)):
        stage(sl, i)
    before = {
        r["source"]: (r["n_docs"], r["total_chars"], r["content_xor"])
        for r in corpus_manifest_from_log(spark, t).collect()
    }
    first = s1.orderBy("doc_id").first()
    edited = s1.withColumn(
        "text",
        F.when(
            F.col("doc_id") == first["doc_id"],
            F.concat(F.expr("substring(text, 2)"), F.lit("X")),
        ).otherwise(F.col("text")),
    )
    stage(edited, 1)  # same token: overwrites batch 1's partial
    after = {
        r["source"]: (r["n_docs"], r["total_chars"], r["content_xor"])
        for r in corpus_manifest_from_log(spark, t).collect()
    }
    src = first["source"]
    assert after[src][0] == before[src][0]  # same count
    assert after[src][1] == before[src][1]  # same chars (edit kept length)
    assert after[src][2] != before[src][2]  # fingerprint flipped
    untouched = {k: v for k, v in before.items() if k != src}
    assert all(after[k] == v for k, v in untouched.items())


def test_as_of_view_reproduces_a_prefix_snapshot(spark, workdir):
    d = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/asof")
    stage = manifest_stage(t)
    s0, s1, s2 = _slices(d)
    stage(s0, 0)
    stage(s1, 1)
    stage(s2, 2)
    got01 = sorted(
        map(
            tuple,
            corpus_manifest_from_log(spark, t, up_to_batch=1).collect(),
        )
    )
    # from-scratch manifest of the first two slices' union
    t2 = ParquetTable(f"{workdir}/asof_ref")
    stage2 = manifest_stage(t2)
    stage2(s0.unionByName(s1), 0)
    want01 = sorted(
        map(tuple, corpus_manifest_from_log(spark, t2).collect())
    )
    assert got01 == want01
