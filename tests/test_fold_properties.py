"""Property-based tests (hypothesis) for the two round-6 sequential
folds that the driver hash-checks cross-engine: the next-fit packing
state encoding and the KMV bottom-k + estimator. Both have pure-Python
reference implementations here; hypothesis drives adversarial inputs
(empty-ish, boundary-budget, duplicate-heavy) through the SPARK
expressions via small DataFrames."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from databricks_end_to_end_streaming_spark.operators.kmv import (
    bottom_k,
    kmv_hash,
)
from databricks_end_to_end_streaming_spark.queries.text import (
    PACK_BUDGET,
    _PACK_ENC,
)


def _pack_ref(lens):
    bins, running = 0, 0
    for l in lens:
        if running + l > PACK_BUDGET:
            bins, running = bins + 1, l
        else:
            running += l
    return bins + (1 if running > 0 else 0)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=PACK_BUDGET), min_size=1, max_size=40
    )
)
def test_pack_fold_expression_matches_reference(spark, lens):
    """The int64-encoded aggregate() fold == the sequential packer for
    arbitrary length sequences (applied in the given order — ordering
    is the caller's concern)."""
    arr = F.array(*[F.lit(l).cast("long") for l in lens])
    state = spark.range(1).select(
        F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, x: F.when(
                acc % _PACK_ENC + x > PACK_BUDGET,
                acc - (acc % _PACK_ENC) + _PACK_ENC + x,
            ).otherwise(acc + x),
        ).alias("s")
    ).first().s
    n_bins = state // _PACK_ENC + (1 if state % _PACK_ENC > 0 else 0)
    assert n_bins == _pack_ref(lens)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_bottom_k_matches_sequential(spark, rows, k):
    """bottom_k over arbitrary duplicate-heavy grouped hashes == the
    sequential k-smallest of the distinct hash set per group."""
    df = spark.createDataFrame(rows, "g string, v long").select(
        "g", kmv_hash(F.col("v")).alias("h")
    ).distinct()
    got = {(r.g, r.h) for r in bottom_k(df, ["g"], k).collect()}
    ref: dict[str, set[int]] = {}
    for g, v in rows:
        ref.setdefault(g, set()).add(
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        )
    want = {(g, h) for g, hs in ref.items() for h in sorted(hs)[:k]}
    assert got == want
