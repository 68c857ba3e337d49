"""Distributed Bloom-filter runtime join pruning (semi-join pre-filter).

Spark's own adaptive runtime filters (InjectRuntimeFilter /
``bloom_filter_agg``) are internal and not SQL-registered in this build,
so the engine provides the same capability as a first-class composable
operator, built entirely from public aggregate expressions:

* **Build**: the build side's join keys are hashed (``xxhash64``, k
  seeds) to bucket positions in an ``m``-bit filter. The filter is
  materialized as a DataFrame of 64-bit words — ``(word_idx, word)``
  with ``word = bit_or(1 << (bucket & 63))`` grouped by
  ``word_idx = bucket >> 6``. The build is one partial-agg'd shuffle on
  word_idx (at most ``m/64`` tiny rows cross the wire, regardless of
  build-side row count) and never touches the driver.
* **Probe**: each probe row computes its k buckets and broadcast-joins
  the word table on ``word_idx``; a row survives only if ALL k bits are
  set. An inner join is exactly Bloom semantics: a missing word row
  means the bit is 0, i.e. definitely-absent. The probe is a map-only
  stage (scan -> k broadcast hash joins -> filter), so pruning happens
  BEFORE any shuffle the downstream exact join needs.

False positives are possible (rate ~ (1 - e^{-kn/m})^k), false negatives
are not — callers MUST follow the probe with an exact join; the filter's
job is to shrink that join's shuffle input. At 100 TB: a 2^27-bit filter
is 16 MiB broadcast (2M words) no matter how many build rows fed it,
while the key set itself could be tens of GiB — that asymmetry is the
whole point of runtime filtering.

Background: Bloom (1970); runtime filter pushdown as in Spark's
InjectRuntimeFilter design (SPARK-32268) — public literature/API only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_M_BITS = 1 << 20  # 128 KiB of filter -> ~16K word rows
DEFAULT_SEEDS = (0x5EED1, 0x5EED2)


def _bucket(key: F.Column, seed: int, m_bits: int) -> F.Column:
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))


def bloom_build(
    build: DataFrame,
    key: str,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Aggregate the build side's ``key`` column into a Bloom bitmap
    relation ``(word_idx: long, word: long)`` (non-zero words only)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    per_seed = [
        build.select(_bucket(F.col(key), s, m_bits).alias("bucket")) for s in seeds
    ]
    buckets = per_seed[0]
    for other in per_seed[1:]:
        buckets = buckets.unionAll(other)
    return (
        buckets.select(
            F.shiftright("bucket", 6).alias("word_idx"),
            F.expr("shiftleft(1L, CAST(bucket % 64 AS INT))").alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(w)").alias("word"))
    )


def bloom_probe(
    probe: DataFrame,
    key: str,
    bitmap: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Keep only probe rows whose ``key`` MIGHT be in the filter (all k
    bits set). Map-only: k broadcast joins + bit tests, no shuffle of the
    probe side. Schema is unchanged."""
    out = probe
    for i, s in enumerate(seeds):
        bm = bitmap.select(
            F.col("word_idx").alias(f"_bf{i}_idx"), F.col("word").alias(f"_bf{i}_word")
        )
        bkt = f"_bf{i}_bkt"
        out = (
            out.withColumn(bkt, _bucket(F.col(key), s, m_bits))
            .join(
                F.broadcast(bm),
                F.shiftright(F.col(bkt), 6) == F.col(f"_bf{i}_idx"),
                "inner",
            )
            .where(
                F.expr(f"(shiftright(_bf{i}_word, CAST({bkt} % 64 AS INT)) & 1) = 1")
            )
            .drop(bkt, f"_bf{i}_idx", f"_bf{i}_word")
        )
    return out


def bloom_probe_flag(
    probe: DataFrame,
    key: str,
    bitmap: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
    flag: str = "might_contain",
) -> DataFrame:
    """Like :func:`bloom_probe`, but keeps EVERY probe row and adds a
    boolean ``flag`` column instead of filtering — the shape callers need
    when definitely-absent rows take a different (cheaper) path than
    maybe-present ones. Left joins, so a missing word row reads as bit
    unset."""
    out = probe
    hits = []
    for i, s in enumerate(seeds):
        bm = bitmap.select(
            F.col("word_idx").alias(f"_bf{i}_idx"), F.col("word").alias(f"_bf{i}_word")
        )
        bkt = f"_bf{i}_bkt"
        out = out.withColumn(bkt, _bucket(F.col(key), s, m_bits)).join(
            F.broadcast(bm),
            F.shiftright(F.col(bkt), 6) == F.col(f"_bf{i}_idx"),
            "left",
        )
        hits.append(
            F.expr(
                f"coalesce((shiftright(_bf{i}_word, CAST({bkt} % 64 AS INT)) & 1)"
                " = 1, false)"
            )
        )
    all_set = hits[0]
    for h in hits[1:]:
        all_set = all_set & h
    out = out.withColumn(flag, all_set)
    for i in range(len(seeds)):
        out = out.drop(f"_bf{i}_bkt", f"_bf{i}_idx", f"_bf{i}_word")
    return out


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
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
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
