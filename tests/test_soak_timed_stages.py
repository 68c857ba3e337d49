"""Timed-trigger soak of the r12 incremental stages (dictscan, unigram
vocabulary): the replay-token protocol under the ALWAYS-ON mode, not
just availableNow drains (VERDICT r12 task 7).

Each soak (1) starts the stage as a processing-time-trigger foreachBatch
query, (2) lands a second corpus wave WHILE the query runs and sees a
later timed trigger pick it up with no restart, (3) proves the folded
report equals the registered batch query bit-for-bit, and (4) replays a
committed batch FOR REAL: the newest checkpoint commit marker is
deleted and the query restarted, so Spark re-runs that batch id through
the same stage body — the idempotent token overwrite must leave the
report unchanged. The existing stage suites replay by calling the batch
body directly; this is the end-to-end checkpoint-protocol version under
timed triggers.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.medallion import (
    await_batches,
    run_continuous_foreach,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _delete_newest_commit(checkpoint: str) -> int:
    """Remove the newest commits/N marker — the crash window between a
    trigger's sink write and its checkpoint commit. On restart Spark
    re-runs batch N with the offsets-pinned input."""
    cdir = os.path.join(checkpoint, "commits")
    ids = [int(f) for f in os.listdir(cdir) if f.isdigit()]
    newest = max(ids)
    os.remove(os.path.join(cdir, str(newest)))
    # the local checkpoint FS is a ChecksumFs: the stale .N.crc sidecar
    # would make the re-commit's rename fail as a concurrent-writer
    crc = os.path.join(cdir, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return newest


def _soak_stage_through_timed_triggers(spark, workdir, stage, name):
    """Drive ``stage`` over the sf0.001 documents corpus in two waves
    under a 300 ms trigger, then replay the newest committed batch via
    checkpoint surgery. Returns nothing; the caller inspects the
    stage's log table."""
    docs = load_table(spark, SF_DIR, "documents")
    src = f"{workdir}/src_{name}"
    cp = f"{workdir}/cp_{name}"
    wave1 = docs.where(F.col("doc_id") % 2 == 0)
    wave2 = docs.where(F.col("doc_id") % 2 == 1)
    n1, n2 = wave1.count(), wave2.count()
    wave1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = run_continuous_foreach(
        stream, stage, cp, f"{name}_soak", processing_time="300 milliseconds"
    )
    try:
        b1, r1 = await_batches(q, min_batches=1, min_rows=n1)
        assert r1 == n1
        # wave 2 lands while the query is RUNNING; a later timed trigger
        # must pick it up without a restart
        wave2.coalesce(1).write.mode("append").parquet(src)
        b2, r2 = await_batches(q, min_batches=b1 + 1, min_rows=n1 + n2)
        assert b2 >= 2 and r2 == n1 + n2
        assert q.isActive and q.exception() is None
    finally:
        q.stop()
        q.awaitTermination()

    # REAL replay: drop the newest commit marker and restart — the same
    # batch id re-runs through the same stage body from the offsets log
    replayed = _delete_newest_commit(cp)
    stream2 = spark.readStream.schema(docs.schema).parquet(src)
    q2 = run_continuous_foreach(
        stream2, stage, cp, f"{name}_replay", processing_time="300 milliseconds"
    )
    try:
        await_batches(q2, min_batches=1)
        assert q2.exception() is None
    finally:
        q2.stop()
        q2.awaitTermination()
    return replayed


def test_dictscan_stage_soaks_and_replays_under_timed_triggers(
    spark, workdir
):
    from databricks_end_to_end_streaming_spark.streaming.dictscan_stage import (
        dictscan_report_from_log,
        dictscan_stage,
    )

    log = ParquetTable(f"{workdir}/dictscan_log")
    replayed = _soak_stage_through_timed_triggers(
        spark, workdir, dictscan_stage(log), "dictscan"
    )
    assert replayed >= 1  # the surgery really removed a committed batch
    got = [tuple(r) for r in dictscan_report_from_log(spark, log).collect()]
    want = [
        tuple(r)
        for r in all_queries()["dictionary_term_scan"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == want and len(got) > 0
    # the replayed batch's token was overwritten, not appended twice
    per_batch = (
        log.read(spark).groupBy("_batch_id").count().collect()
    )
    assert len({r["_batch_id"] for r in per_batch}) == len(per_batch)


def test_unigram_vocab_stage_soaks_and_replays_under_timed_triggers(
    spark, workdir
):
    from databricks_end_to_end_streaming_spark.streaming.unigram_lm_stage import (
        frozen_viterbi_stats_from_log,
        vocab_stage,
    )

    log = ParquetTable(f"{workdir}/vocab_log")
    _soak_stage_through_timed_triggers(
        spark, workdir, vocab_stage(log), "unigram"
    )
    got = [
        tuple(r) for r in frozen_viterbi_stats_from_log(spark, log).collect()
    ]
    want = [
        tuple(r)
        for r in all_queries()["unigram_frozen_viterbi_stats"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == want and len(got) > 0


def test_cdc_stage_soaks_and_replays_under_timed_triggers(spark, workdir):
    """The r13 CDC stage under the same always-on protocol: two waves,
    mid-run pickup, checkpoint-surgery replay, report == batch query."""
    from databricks_end_to_end_streaming_spark.streaming.cdc_stage import (
        cdc_report_from_log,
        cdc_stage,
    )

    log = ParquetTable(f"{workdir}/cdc_log")
    _soak_stage_through_timed_triggers(
        spark, workdir, cdc_stage(log), "cdc"
    )
    got = [tuple(r) for r in cdc_report_from_log(spark, log).collect()]
    want = [
        tuple(r)
        for r in all_queries()["cdc_chunk_dedup"](spark, SF_DIR).collect()
    ]
    assert got == want and len(got) > 0
