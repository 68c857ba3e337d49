"""KMV (k-minimum-values) distinct sketch with set algebra.

Bar-Yossef et al., "Counting distinct elements in a data stream"
(RANDOM 2002) and Beyer et al., "On synopses for distinct-value
estimation under multiset operations" (SIGMOD 2007) — public
literature. The distinct-cardinality twin of the CMS frequency sketch
(operators/cms.py), and the piece the HLL rollup can't give us: KMV
sketches support SET ALGEBRA — union, intersection, and Jaccard
estimates BETWEEN groups from k-sized summaries alone — and, unlike
Spark's opaque HLL buffers, the whole construction is deterministic
built-in expression work, so the driver's DuckDB oracle replays every
hash bit-for-bit (no rows-only fallback).

Sketch: per group, the k smallest values of a uniform 60-bit hash
h(key) = int(md5(key)[:15 hex], 16) over DISTINCT keys. Estimator:
if the sketch holds fewer than k hashes the count is exact; else
E = (k-1) * 2^60 / kth_smallest (the classic KMV estimator — the kth
order statistic of n uniform draws concentrates at k/n of the range).

Merge rule (Beyer et al. §4): the union sketch of two KMV sketches is
the k smallest of the UNION of their hash sets; Jaccard is estimated
by |A-sketch ∩ B-sketch ∩ merged| / |merged|, and intersection
cardinality by jaccard * union_estimate. Union-then-truncate is a
commutative, associative, IDEMPOTENT monoid — re-merging the same
sketch is a no-op — which is what makes the streaming twin
(streaming/kmv_stage.py) insensitive to batch slicing AND to replay.

100 TB shape: building is one distinct-keyed partial-agg shuffle plus
a per-group bottom-k. The bottom-k runs in two levels — first within
(group, salt) buckets, then over the <= k*SALTS survivors per group —
so no single task ever sorts a whole group's distinct set (a skewed
group at corpus scale would otherwise serialize on one task). All
downstream set algebra touches only k-sized relations per group.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_K = 64
HASH_SPACE = float(2**60)  # 15 hex chars; exact in int64 AND in double
_SALTS = 32


def kmv_hash(key: F.Column) -> F.Column:
    """Uniform 60-bit hash, identical in Spark and DuckDB:
    Spark  conv(substring(md5(CAST(key AS STRING)), 1, 15), 16, 10)
    DuckDB CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15) AS BIGINT)
    """
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_hash_sql(key_sql: str) -> str:
    """The DuckDB-side twin of :func:`kmv_hash` (see its docstring)."""
    return (
        f"CAST('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15)"
        " AS BIGINT)"
    )


def bottom_k(
    hashes: DataFrame, group_cols: list[str], k: int, h: str = "h"
) -> DataFrame:
    """k smallest DISTINCT hashes per group, skew-safe: rank within
    (group, h % SALTS) first — every window partition is bounded by the
    bucket's share of the group — then rank the <= k*SALTS survivors.
    Both windows shuffle key-bound relations; nothing global."""
    salted = Window.partitionBy(
        *group_cols, F.pmod(F.col(h), F.lit(_SALTS))
    ).orderBy(h)
    pruned = (
        hashes.withColumn("_rn", F.row_number().over(salted))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    final = Window.partitionBy(*group_cols).orderBy(h)
    return (
        pruned.withColumn("_rn", F.row_number().over(final))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = DEFAULT_K,
) -> DataFrame:
    """(group..., h) sketch relation: bottom-k 60-bit hashes of the
    distinct ``key_col`` values per group. <= k rows per group."""
    hashes = df.select(
        *group_cols, kmv_hash(F.col(key_col)).alias("h")
    ).distinct()
    return bottom_k(hashes, group_cols, k)


def kmv_merge(
    sketches: list[DataFrame], group_cols: list[str], k: int
) -> DataFrame:
    """Union-then-truncate merge of same-schema sketch relations — the
    idempotent monoid (re-merging the same sketch is a no-op, so the
    streaming fold tolerates replay even before the token layer). Input
    sketches may be per-shard, per-day, or per-micro-batch partials."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return bottom_k(u.distinct(), group_cols, k)


def kmv_estimate(
    sketch_agg: DataFrame, k: int, n_col: str = "n_sketch", kth_col: str = "kth"
) -> DataFrame:
    """Append ``est_distinct`` to a per-group aggregate carrying the
    sketch size and the largest retained hash. Exact below k; the KMV
    estimator once the sketch saturates. The expression shape (one
    double multiply, one double divide, left-to-right) is mirrored
    verbatim in the oracle SQL so the doubles are bit-identical."""
    return sketch_agg.withColumn(
        "est_distinct",
        F.when(
            F.col(n_col) < k, F.col(n_col).cast("double")
        ).otherwise(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col(kth_col).cast("double")
        ),
    )


def kmv_estimate_sql(k: int, n_sql: str = "n_sketch", kth_sql: str = "kth") -> str:
    """DuckDB twin of :func:`kmv_estimate`'s expression."""
    return (
        f"CASE WHEN {n_sql} < {k} THEN CAST({n_sql} AS DOUBLE) "
        f"ELSE CAST({k - 1} AS DOUBLE) * {HASH_SPACE!r} "
        f"/ CAST({kth_sql} AS DOUBLE) END"
    )
