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


def _chunk(col: F.Column, i: int, chunk_bits: int = CHUNK_BITS) -> F.Column:
    """i-th chunk of the signature (shiftrightunsigned + mask — correct
    for signatures using bit 63, i.e. negative longs)."""
    return F.shiftrightunsigned(col, i * chunk_bits).bitwiseAND(
        F.lit((1 << chunk_bits) - 1)
    )


def hamming_neardup_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    bits: int = BITS,
    n_chunks: int = N_CHUNKS,
    max_hamming: int = 3,
) -> DataFrame:
    """Generic banded Hamming pairing over any (id, signature) relation:
    pairs (id_a, id_b, hamming) with Hamming(sig) <= max_hamming.
    Candidates come from the chunk self-join (two signatures within
    Hamming distance < n_chunks share at least one of the n_chunks
    equal-width chunks — pigeonhole); exact bit_count(xor) verifies
    each candidate. Shared by the text SimHash and the perceptual image
    hashes (operators/phash.py). Never O(n^2): the self-join keys on
    (chunk_id, chunk_value)."""
    if max_hamming >= n_chunks:
        raise ValueError("banding guarantees recall only for hamming < n_chunks")
    if bits % n_chunks != 0:
        raise ValueError("bits must divide into n_chunks equal chunks")
    chunk_bits = bits // n_chunks
    chunks = _chunk_rows(sigs, id_col, sig_col, n_chunks, chunk_bits)
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias(f"{id_col}_a"),
            F.col("b._id").alias(f"{id_col}_b"),
            F.col("a._sig").alias("sig_a"),
            F.col("b._sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return cand.select(
        f"{id_col}_a", f"{id_col}_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def _chunk_rows(
    sigs: DataFrame, id_col: str, sig_col: str, n_chunks: int, chunk_bits: int
) -> DataFrame:
    """Explode a signature relation into its (chunk_id, chunk) band rows."""
    return sigs.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        _chunk(F.col(sig_col), i, chunk_bits).alias("chunk"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("_id", "_sig", "c.chunk_id", "c.chunk")


def hamming_pairs_probe_index(
    probe: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    bits: int = BITS,
    n_chunks: int = N_CHUNKS,
    max_hamming: int = 3,
) -> DataFrame:
    """Asymmetric banded Hamming pairing: every ``index`` signature
    within ``max_hamming`` of some ``probe`` signature. The incremental
    serving shape — a small new batch probes the accumulated corpus
    index — so candidate generation is |probe-bands| x matching index
    bands, NOT the full index self-join (history never re-pairs against
    itself). Pairs are emitted with id_a < id_b regardless of which side
    they came from; probe-vs-probe pairs are found too (the probe is a
    subset of the index in the dedup use), deduplicated by the final
    ``distinct``. Same recall guarantee as ``hamming_neardup_pairs``
    (pigeonhole over equal-width chunks)."""
    if max_hamming >= n_chunks:
        raise ValueError("banding guarantees recall only for hamming < n_chunks")
    if bits % n_chunks != 0:
        raise ValueError("bits must divide into n_chunks equal chunks")
    chunk_bits = bits // n_chunks
    p = _chunk_rows(probe, id_col, sig_col, n_chunks, chunk_bits).alias("p")
    x = _chunk_rows(index, id_col, sig_col, n_chunks, chunk_bits).alias("x")
    cand = (
        p.join(
            x,
            (F.col("p.chunk_id") == F.col("x.chunk_id"))
            & (F.col("p.chunk") == F.col("x.chunk"))
            & (F.col("p._id") != F.col("x._id")),
        )
        .select(
            F.least("p._id", "x._id").alias(f"{id_col}_a"),
            F.greatest("p._id", "x._id").alias(f"{id_col}_b"),
            # sig ordering follows the ID comparison, so sig_a IS the
            # signature of {id}_a (least/greatest of the sigs alone
            # would decouple them — harmless for the symmetric XOR
            # below, but a trap for any future consumer)
            F.when(F.col("p._id") < F.col("x._id"), F.col("p._sig"))
            .otherwise(F.col("x._sig"))
            .alias("sig_a"),
            F.when(F.col("p._id") < F.col("x._id"), F.col("x._sig"))
            .otherwise(F.col("p._sig"))
            .alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return cand.select(
        f"{id_col}_a", f"{id_col}_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def simhash_neardup_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Pairs (doc_a, doc_b, hamming) with Hamming(simhash) <= max_hamming
    — the text instantiation of ``hamming_neardup_pairs``."""
    if max_hamming >= N_CHUNKS:  # validate before building the plan
        raise ValueError("banding guarantees recall only for hamming < n_chunks")
    return (
        hamming_neardup_pairs(
            simhash_signatures(docs, text_col), max_hamming=max_hamming
        )
        .withColumnRenamed("doc_id_a", "doc_a")
        .withColumnRenamed("doc_id_b", "doc_b")
    )
