"""Bloom-gated incremental exact dedup as a streaming stage.

The incremental exact-dedup problem at 100 TB: each micro-batch of
documents must be checked against EVERY fingerprint ever seen. A naive
anti-join touches the full fingerprint table per trigger; this stage
keeps a Bloom bitmap (operators/bloom.py) as mergeable streaming state
and uses it to split each batch:

* **definitely-new** (filter miss — no false negatives, so provably
  unseen): pass straight through, no join against history at all. On a
  mostly-novel stream this is ~the whole batch.
* **maybe-seen** (filter hit): exact anti-join against the accumulated
  fingerprint table — but only for this (usually small) slice, and the
  join is broadcast from the batch side.

State sizes: the bitmap is <= m/64 64-bit words (a 2^27-bit filter is
16 MiB) REGARDLESS of corpus size; merging a batch into it is a bit_or
aggregate, which is idempotent + commutative, so an at-least-once replay
re-merging the same batch cannot corrupt the filter. A premature bitmap
write (bits set for docs whose fingerprints never landed) only creates
false POSITIVES, which the exact check absorbs — every failure mode
degrades to extra work, never to wrong output.

Fingerprints are xxhash64 of the whitespace-normalized text (the
standard 64-bit content-fingerprint dedup; collision expectation
n^2/2^65 — at 10^10 docs, ~0.003 spurious drops, the usual accepted
trade documented by content-dedup systems).

Same foreachBatch discipline as the other stages (SURVEY K1/T7/T8):
batch cached once and released, idempotent token-gated appends.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..operators.bloom import (
    DEFAULT_SEEDS,
    bloom_build,
    bloom_merge,
    bloom_probe_flag,
)
from .sinks import ParquetTable

BLOOM_M_BITS = 1 << 20


def _fingerprint() -> F.Column:
    return F.xxhash64(F.lower(F.regexp_replace("text", r"\s+", " ")))


def bloom_dedup_batch(
    batch_df: DataFrame,
    out_table: ParquetTable,
    fp_table: ParquetTable,
    bitmap_table: ParquetTable,
    batch_id: int,
    m_bits: int = BLOOM_M_BITS,
) -> dict:
    """One micro-batch through the Bloom-gated dedup. Returns counters
    (pytest introspection): how many rows took the cheap definitely-new
    path vs the exact-check path."""
    spark = batch_df.sparkSession
    batch = (
        batch_df.withColumn("fp", _fingerprint())
        # intra-batch dedup first: keep the lowest doc_id per fingerprint
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    batch.persist()
    try:
        if bitmap_table.exists():
            bitmap = bitmap_table.read(spark)
        elif fp_table.exists():
            # Crash window: fingerprints landed but the bitmap write did
            # not (it is last in the write order). Rebuild the filter
            # from the fingerprint table — a one-time O(corpus) recovery
            # scan instead of a silent dedup hole for non-streaming
            # callers (the streaming checkpoint replays the batch anyway).
            bitmap = bloom_build(
                fp_table.read(spark).where(F.col("batchid") != batch_id),
                "fp",
                m_bits,
            ).localCheckpoint(eager=True)
        else:
            bitmap = None
        if bitmap is not None:
            flagged = bloom_probe_flag(batch, "fp", bitmap, m_bits, flag="_hit")
            flagged.persist()
            try:
                fresh = flagged.where(~F.col("_hit")).drop("_hit")
                maybe = flagged.where(F.col("_hit")).drop("_hit")
                n_fresh = fresh.count()
                n_maybe = maybe.count()
                if n_maybe and fp_table.exists():
                    # Replay-safe: compare against strictly older batches
                    # only, so a replayed batch cannot anti-join away its
                    # own half-written fingerprints.
                    seen = fp_table.read(spark).where(
                        F.col("batchid") != batch_id
                    ).select("fp")
                    survivors = maybe.join(seen, on="fp", how="left_anti")
                else:
                    survivors = maybe
                new_docs = fresh.unionByName(survivors)
                # The cheap path carried no join at all; only `maybe`
                # rows (bloom-hit fraction) touched the history table.
                counters = {"definitely_new": n_fresh, "exact_checked": n_maybe}
            finally:
                flagged.unpersist()
        else:
            new_docs = batch
            counters = {"definitely_new": batch.count(), "exact_checked": 0}

        new_docs = new_docs.localCheckpoint(eager=True)
        out_table.idempotent_append(
            new_docs.drop("fp"), f"batchid={batch_id}/role=docs"
        )
        fp_table.idempotent_append(
            new_docs.select("fp").withColumn("_batch_id", F.lit(batch_id)),
            f"batchid={batch_id}/role=fp",
        )
        batch_words = bloom_build(batch, "fp", m_bits)
        merged = (
            bloom_merge(bitmap, batch_words) if bitmap is not None else batch_words
        )
        bitmap_table.overwrite(merged.localCheckpoint(eager=True))
        counters["emitted"] = new_docs.count()
        return counters
    finally:
        batch.unpersist()


def bloom_dedup_stage(
    source: DataFrame,
    out_table: ParquetTable,
    fp_table: ParquetTable,
    bitmap_table: ParquetTable,
    checkpoint: str,
    m_bits: int = BLOOM_M_BITS,
    query_name: str = "bloom_dedup_incremental",
) -> None:
    """Streaming wrapper: drain available batches through the Bloom-gated
    dedup (Trigger-Once semantics, SURVEY T1)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bloom_dedup_batch(
            batch_df, out_table, fp_table, bitmap_table, batch_id, m_bits
        )

    (
        source.writeStream.foreachBatch(process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
