"""Distributed Bloom-filter runtime join pruning (semi-join pre-filter).

Spark's own adaptive runtime filters (InjectRuntimeFilter /
``bloom_filter_agg``) are internal and not SQL-registered in this build,
so the engine provides the same capability as a first-class composable
operator, built entirely from public aggregate expressions. The layout
is a BLOCKED Bloom filter (Putze, Sanders & Singler 2007): both probe
bits of a key live in the SAME 64-bit word, so membership needs exactly
ONE word lookup —

* **Build**: ``word_idx = hash0(key) % (m/64)`` picks the block; two bit
  positions are carved from independent halves of ``hash1(key)``. The
  filter materializes as a DataFrame of non-zero words —
  ``(word_idx, word = bit_or(bit1 | bit2))`` — via one partial-agg'd
  shuffle bounded by ``m/64`` rows REGARDLESS of build cardinality, and
  never touches the driver.
* **Probe**: each probe row broadcast-joins its single block word and
  survives iff both bits are set. Inner join is exactly Bloom
  semantics — a missing word row means the block is all-zero, i.e.
  definitely-absent. The probe is a map-only stage (scan -> ONE
  broadcast hash join -> bit test), so pruning happens BEFORE any
  shuffle the downstream exact join needs.

False positives are possible (~(2·n/m)² at low load, slightly worse than
an unblocked filter at equal m — the price of one-lookup probes), false
negatives are not. Callers MUST follow the probe with an exact join; the
filter's job is to shrink that join's shuffle input. Size ``m_bits``
at ~16-32 bits per build key: at 100 TB a 2^27-bit filter is a 16 MiB
broadcast (2M words) no matter how many build rows fed it, while the key
set itself could be tens of GiB — that asymmetry is the whole point of
runtime filtering.

Background: Bloom (1970); blocked layout per Putze et al., "Cache-,
Hash- and Space-Efficient Bloom Filters" (2007); runtime-filter pushdown
as in Spark's InjectRuntimeFilter design (SPARK-32268) — public
literature/API only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_M_BITS = 1 << 23  # 1 MiB of filter -> 128K word rows max
DEFAULT_SEEDS = (0x5EED1, 0x5EED2)


def _with_block_and_mask(
    df: DataFrame, key: str, m_bits: int, seeds: tuple[int, int]
) -> DataFrame:
    """Add ``_bf_widx`` (block word index) and ``_bf_mask`` (two-bit
    word mask) for ``key`` — the only place the hashing scheme lives, so
    build and probe can never disagree."""
    return df.withColumn(
        "_bf_widx",
        F.pmod(F.xxhash64(F.col(key), F.lit(seeds[0])), F.lit(m_bits // 64)),
    ).withColumn(
        "_bf_h", F.xxhash64(F.col(key), F.lit(seeds[1]))
    ).withColumn(
        "_bf_mask",
        F.expr(
            "shiftleft(1L, CAST(pmod(_bf_h, 64) AS INT)) | "
            "shiftleft(1L, CAST(pmod(shiftright(_bf_h, 6), 64) AS INT))"
        ),
    ).drop("_bf_h")


def bloom_build(
    build: DataFrame,
    key: str,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, int] = DEFAULT_SEEDS,
) -> DataFrame:
    """Aggregate the build side's ``key`` column into a blocked-Bloom
    bitmap relation ``(word_idx: long, word: long)`` (non-zero words
    only)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    return (
        _with_block_and_mask(build, key, m_bits, seeds)
        .select(F.col("_bf_widx").alias("word_idx"), F.col("_bf_mask").alias("w"))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(w)").alias("word"))
    )


def bloom_probe(
    probe: DataFrame,
    key: str,
    bitmap: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, int] = DEFAULT_SEEDS,
) -> DataFrame:
    """Keep only probe rows whose ``key`` MIGHT be in the filter (both
    bits of its block set). Map-only: ONE broadcast join + a bit test,
    no shuffle of the probe side. Schema is unchanged."""
    bm = bitmap.select(
        F.col("word_idx").alias("_bf_idx"), F.col("word").alias("_bf_word")
    )
    return (
        _with_block_and_mask(probe, key, m_bits, seeds)
        .join(F.broadcast(bm), F.col("_bf_widx") == F.col("_bf_idx"), "inner")
        .where(F.expr("(_bf_word & _bf_mask) = _bf_mask"))
        .drop("_bf_widx", "_bf_mask", "_bf_idx", "_bf_word")
    )


def bloom_probe_flag(
    probe: DataFrame,
    key: str,
    bitmap: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, int] = DEFAULT_SEEDS,
    flag: str = "might_contain",
) -> DataFrame:
    """Like :func:`bloom_probe`, but keeps EVERY probe row and adds a
    boolean ``flag`` column instead of filtering — the shape callers need
    when definitely-absent rows take a different (cheaper) path than
    maybe-present ones. Left join, so a missing block reads as all-zero."""
    bm = bitmap.select(
        F.col("word_idx").alias("_bf_idx"), F.col("word").alias("_bf_word")
    )
    return (
        _with_block_and_mask(probe, key, m_bits, seeds)
        .join(F.broadcast(bm), F.col("_bf_widx") == F.col("_bf_idx"), "left")
        .withColumn(
            flag,
            F.expr("coalesce((_bf_word & _bf_mask) = _bf_mask, false)"),
        )
        .drop("_bf_widx", "_bf_mask", "_bf_idx", "_bf_word")
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """bit_or-merge two bitmap relations. bit_or is idempotent AND
    commutative, so merging the same batch twice (an at-least-once
    replay) or in any order yields the identical filter — the property
    that makes the bitmap safe as incremental streaming state."""
    return (
        a.unionByName(b).groupBy("word_idx").agg(F.expr("bit_or(word)").alias("word"))
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, int] = DEFAULT_SEEDS,
) -> DataFrame:
    """EXACT left-semi join, runtime-filter accelerated: Bloom-prune the
    probe side first (map-only), then exact ``leftsemi`` on the
    survivors. Result is identical to a plain semi join — the filter only
    shrinks the rows that reach the exact join's shuffle."""
    bitmap = bloom_build(build, build_key, m_bits, seeds)
    pruned = bloom_probe(probe, probe_key, bitmap, m_bits, seeds)
    # leftsemi never duplicates, so the build side needs no distinct.
    return pruned.join(
        build.select(F.col(build_key).alias(probe_key)), on=probe_key, how="leftsemi"
    )
