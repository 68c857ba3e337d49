"""SimHash near-duplicate detection (Charikar 2002, public literature).

60-bit SimHash per document computed ENTIRELY with built-in expressions
— no Python UDF: tokens explode to rows, the 60 bit positions explode
from a sequence, and the per-bit vote / signature assembly are algebraic
aggregates. This is the explode-to-rows + partial-aggregate pattern that
stays inside whole-stage codegen and map-side-combines before the one
(doc_id, bit) shuffle (the earlier Arrow-batched UDF version was the
slow path this replaces). The token hash is the first 15 hex chars of
md5 (60 bits, fits signed int64): deterministic across executors AND
replayable in ANSI SQL ('0x'-cast / conv), which is what gives
``dedup_simhash`` a hash-checkable DuckDB oracle (see
queries/extensions.py).

Scale shape: the signature pass shuffles 60 tiny (doc_id, bit, partial
vote) rows per document after map-side combine; candidate pairing
banding-splits the 60 bits into 4 x 15-bit chunks — two documents within
Hamming distance 3 share at least one chunk (pigeonhole) — so pairing is
a self-join on (chunk_id, chunk_value), never O(n^2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BITS = 60  # 15 md5 hex chars; 60 bits keep the signature positive int64
N_CHUNKS = 4  # 4 x 15-bit chunks -> catches hamming <= 3 exactly
CHUNK_BITS = BITS // N_CHUNKS


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long) via built-in expressions only."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    hashed = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    bits = hashed.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(BITS - 1))).alias("bit")
    )
    votes = bits.groupBy("doc_id", "bit").agg(
        F.sum(
            F.when(F.expr("shiftright(h, bit) & 1") == 1, 1).otherwise(-1)
        ).alias("v")
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0))
        ).alias("simhash")
    )


def _chunk(col: F.Column, i: int) -> F.Column:
    """i-th 15-bit chunk of the signature (shiftrightunsigned + mask)."""
    return F.shiftrightunsigned(col, i * CHUNK_BITS).bitwiseAND(
        F.lit((1 << CHUNK_BITS) - 1)
    )


def simhash_neardup_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Pairs (doc_a, doc_b, hamming) with Hamming(simhash) <= max_hamming.

    Candidates come from the chunk self-join; the exact Hamming distance
    (bit_count of xor) verifies each candidate. max_hamming must be
    < N_CHUNKS for the pigeonhole guarantee.
    """
    if max_hamming >= N_CHUNKS:
        raise ValueError("banding guarantees recall only for hamming < N_CHUNKS")
    sigs = simhash_signatures(docs, text_col)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("chunk_id"), _chunk(F.col("simhash"), i).alias("chunk"))
                    for i in range(N_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_id", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
