"""Salted two-phase aggregation for skewed group keys.

A ``groupBy(k)`` over a column with few distinct values (the reference's
``count_type`` gold aggregation groups ~5 event types —
``/root/reference/notebooks/confluent/python/silver_to_gold.py``-style)
concentrates each key's entire data on ONE reducer: at 100 TB a single
hot key becomes one straggling task no matter how many executors exist.

The classic fix computed here: append a deterministic salt with ``B``
buckets, aggregate partially on ``(key, salt)`` — B-way parallel, and
map-side combine still applies — then merge the B partial rows per key
in a second (tiny) aggregation. Correct for any algebraic aggregate
(count/sum/min/max, and avg as sum/count at the end). The second
shuffle moves only ``keys × B`` rows, so the cost is ~zero while the
heavy phase parallelizes B-wide.

Spark's AQE can split skewed *join* partitions, but skewed *aggregation*
keys still need salting — partial aggregation alone helps only as much
as map-side distinctness allows.

The salt is derived from a high-cardinality column (not ``rand()``) so
reruns are bit-reproducible — same discipline as the deterministic
md5-bucket sampling in ``queries/text.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_source: Column,
    partial: dict[str, Column],
    merge: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial`` maps intermediate column name -> aggregate over the raw
    rows (phase 1, grouped by keys + salt); ``merge`` maps final column
    name -> aggregate over those intermediates (phase 2, grouped by
    keys only). The caller guarantees the pair is algebraic
    (merge ∘ partial == direct aggregate).
    """
    salt = (F.abs(F.hash(salt_source)) % F.lit(buckets)).alias("_salt")
    phase1 = df.groupBy(*keys, salt).agg(
        *[c.alias(n) for n, c in partial.items()]
    )
    return phase1.groupBy(*keys).agg(*[c.alias(n) for n, c in merge.items()])
