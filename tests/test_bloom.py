"""Distributed Bloom runtime-filter: no false negatives, real pruning,
and result-transparency of the accelerated semi join
(operators/bloom.py; north-star runtime-filter extension)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_semi_join,
)

M_BITS = 1 << 14  # small filter so the FP-rate assertions are meaningful


def test_no_false_negatives(spark):
    build = spark.range(0, 1000).select(F.col("id").alias("k"))
    bitmap = bloom_build(build, "k", m_bits=M_BITS)
    survivors = bloom_probe(build, "k", bitmap, m_bits=M_BITS)
    # Every key that went into the filter MUST survive the probe.
    assert survivors.count() == 1000


def test_bitmap_is_small_and_word_packed(spark):
    build = spark.range(0, 5000).select(F.col("id").alias("k"))
    bitmap = bloom_build(build, "k", m_bits=M_BITS).collect()
    assert len(bitmap) <= M_BITS // 64  # word rows, not per-key rows
    assert all(r.word != 0 for r in bitmap)  # zero words never materialize


def test_probe_prunes_disjoint_keys(spark):
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    bitmap = bloom_build(build, "k", m_bits=M_BITS)
    # Disjoint probe keys: only Bloom false positives survive. Blocked
    # layout, n=500, m=2^14: ~4 bits/word average, FP ~ (4/64)^2 ~ 0.4%.
    probe = spark.range(10_000, 20_000).select(F.col("id").alias("k"))
    n_fp = bloom_probe(probe, "k", bitmap, m_bits=M_BITS).count()
    assert n_fp < 500  # pruned >95% of 10k disjoint keys


def test_semi_join_exactness(spark):
    rng = random.Random(7)
    probe_rows = [(rng.randrange(2000), rng.random()) for _ in range(3000)]
    build_keys = [(k,) for k in rng.sample(range(2000), 400)]
    probe = spark.createDataFrame(probe_rows, ["k", "v"])
    build = spark.createDataFrame(build_keys, ["bk"])
    got = sorted(
        (r.k, r.v)
        for r in bloom_semi_join(probe, build, "k", "bk", m_bits=M_BITS).collect()
    )
    keys = {k for (k,) in build_keys}
    want = sorted((k, v) for (k, v) in probe_rows if k in keys)
    assert got == want  # identical to a plain semi join, FPs and all


def test_probe_stage_is_broadcast_joined(spark):
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    bitmap = bloom_build(build, "k", m_bits=M_BITS)
    plan = (
        bloom_probe(spark.range(0, 1000).select(F.col("id").alias("k")), "k", bitmap, m_bits=M_BITS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The bitmap must reach the probe side via broadcast: the probe scan
    # itself is never shuffled for the bit tests.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
