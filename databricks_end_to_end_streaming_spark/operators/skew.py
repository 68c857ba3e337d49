"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles moderate skew
at runtime, but a pathologically hot key (one customer with 10% of all
events) still serializes into few tasks. Salting fixes the partition
function itself:

* salted_join: the skewed (big) side gets a deterministic pseudo-random
  salt in [0, n); the small side is replicated n times with every salt;
  the join key becomes (key, salt), spreading each hot key over n tasks.
* salted_two_phase_agg: aggregate by (key, salt) first (partial spread),
  then re-aggregate by key — the manual form of partial aggregation for
  non-algebraic combinations of aggregates.

The salt is xxhash64(row-unique columns) % n — deterministic (replay-safe
in foreachBatch) yet uniform, unlike rand() which breaks retry idempotence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


def with_salt(df: DataFrame, unique_cols: list[str], n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a hash of row-identifying
    columns (NOT rand(): replays must salt identically)."""
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in unique_cols]), F.lit(n_salts)).cast(
            "int"
        ),
    )


def replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Cross the (small) side with every salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    big_unique_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join where `big` has hot values of `on`: spread each key over
    n_salts partitions. `small` grows n_salts-fold — keep it the
    dimension side."""
    unique = big_unique_cols or big.columns
    b = with_salt(big, unique, n_salts)
    s = replicate_salts(small, n_salts)
    return b.join(s, [on, SALT_COL], how).drop(SALT_COL)


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    n_salts: int,
    unique_cols: list[str],
    partial_aggs: list[F.Column],
    final_aggs: list[F.Column],
) -> DataFrame:
    """Aggregate a skewed key in two phases: (key, salt) then key."""
    return (
        with_salt(df, unique_cols, n_salts)
        .groupBy(key, SALT_COL)
        .agg(*partial_aggs)
        .groupBy(key)
        .agg(*final_aggs)
    )
