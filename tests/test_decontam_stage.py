"""Incremental substring decontamination (streaming/decontam_stage.py):
drained accounting log == the batch query over the union of batches
row-for-row, replay idempotence, and contamination found regardless of
which batch carried the leaking doc."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.dedup import (
    decontam_accounting,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.decontam_stage import (
    contaminated_from_log,
    decontam_stage,
)

DOCS_SCHEMA = "doc_id long, text string"
LEAK = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 toks


def _corpus(spark):
    texts = {
        0: f"intro {LEAK} tail words",
        1: "clean document one nothing shared",
        2: f"{LEAK} opens this one",
        3: "clean document two nothing shared either",
        4: "alpha beta gamma short prefix only here",
        5: "another clean training document entirely",
        6: "",  # zero-token doc: must still get a (0, 0, 0) row
    }
    train = spark.createDataFrame(list(texts.items()), DOCS_SCHEMA)
    bench = spark.createDataFrame(
        [(0, f"prompt {LEAK} answer"), (1, "benchmark only words")],
        DOCS_SCHEMA,
    )
    return train, bench


def _rows(df):
    return sorted(
        (
            r["doc_id"],
            r["max_shared_span"],
            r["n_pos_shared8"],
            r["contaminated"],
        )
        for r in df.collect()
    )


def test_drained_log_equals_batch_accounting(spark, workdir):
    train, bench = _corpus(spark)
    t = ParquetTable(f"{workdir}/dc")
    stage = decontam_stage(t, bench)
    for i in range(3):
        stage(train.where(F.col("doc_id") % 3 == i), i)
    stage(train.where(F.col("doc_id") % 3 == 1), 1)  # replay
    got = _rows(contaminated_from_log(spark, t))
    want = _rows(decontam_accounting(train, bench))
    assert got == want
    by_id = {d: (m, c) for d, m, _, c in got}
    # the leak is found at its exact length in BOTH carrying batches
    assert by_id[0] == (10, 1) and by_id[2] == (10, 1)
    assert by_id[4] == (3, 0)  # partial overlap, below threshold
    assert by_id[1][1] == 0 and by_id[3][1] == 0 and by_id[5][1] == 0
    # START-grain count: the 10-token leak has 3 offsets whose shared
    # suffix is still >= 8 tokens (lengths 10, 9, 8)
    starts = {d: n for d, _, n, _ in got}
    assert starts[0] == 3 and starts[2] == 3
    # the zero-token doc is present, all zeros (every-doc contract)
    assert by_id[6] == (0, 0) and starts[6] == 0


def test_empty_benchmark_path_matches_normal_shape(spark):
    """With an EMPTY benchmark, the accounting must keep the exact
    every-doc/zero shape the normal path produces — one row per train
    doc, all zeros, no sentinel-position leakage."""
    train, bench = _corpus(spark)
    got = _rows(decontam_accounting(train, bench.where("doc_id < 0")))
    assert got == [(d, 0, 0, 0) for d in range(7)]
