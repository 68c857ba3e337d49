"""SimHash near-duplicate detection (Charikar 2002, public literature).

64-bit SimHash per document via an Arrow-batched pandas UDF (token
hashing + bit-voting vectorize poorly into SQL expressions — 64 bit
positions x every token — so this is a legitimate Python-UDF case,
batched through Arrow).

Scale shape: the signature pass is a narrow projection (doc -> int64);
candidate pairing banding-splits the 64 bits into 4 16-bit chunks —
two documents within Hamming distance 3 share at least one chunk
(pigeonhole) — so pairing is a self-join on (chunk_id, chunk_value),
never O(n^2).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

N_CHUNKS = 4  # 4 x 16-bit chunks -> catches hamming <= 3 exactly
CHUNK_BITS = 64 // N_CHUNKS


def _token_hash64(token: str) -> int:
    """Deterministic 64-bit token hash (blake2b; python's hash() is
    per-process salted and unusable across executors)."""
    return int.from_bytes(hashlib.blake2b(token.encode(), digest_size=8).digest(), "big")


@pandas_udf(LongType())  # DataType instance: DDL strings need a live session
def _simhash64(texts: pd.Series) -> pd.Series:
    out = []
    for text in texts:
        votes = [0] * 64
        for tok in text.lower().split():
            h = _token_hash64(tok)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        sig = 0
        for b in range(64):
            if votes[b] > 0:
                sig |= 1 << b
        # to signed 64-bit for LongType
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out)


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long)."""
    return docs.select("doc_id", _simhash64(F.col(text_col)).alias("simhash"))


def _chunk(col: F.Column, i: int) -> F.Column:
    """i-th 16-bit chunk of the signature (shiftrightunsigned + mask)."""
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
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
