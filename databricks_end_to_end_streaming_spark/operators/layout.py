"""Z-order (Morton curve) clustering for multi-dimensional data skipping.

A table sorted by one column prunes scans filtering on THAT column only;
at 100 TB, queries filter on several (e.g. date AND customer). Z-order
interleaves the bits of per-column bucket numbers so rows close in the
multi-dimensional key space land in the same files — parquet min/max
row-group stats then prune scans on ANY prefix-free subset of the
clustered columns. This is the published design behind Delta/Databricks
``OPTIMIZE ZORDER BY`` and space-filling-curve layouts generally
(Morton 1966; public literature).

Everything is JVM expressions: equal-width bucketing via min/max (two
driver scalars per column — one bounded agg), bit interleave as a sum of
shift/mask terms, then ``repartitionByRange`` + ``sortWithinPartitions``
on the z-value — the same TeraSort shape as ``operators/ranking.py``, so
no single-partition sort anywhere.

Cost note: the min/max stats agg is a SEPARATE full scan before the
rewrite — two scans per OPTIMIZE, the same shape Delta's own ZORDER
uses. A deployment that maintains per-column table statistics (Delta
log stats, a catalog, or cached results of a prior profile query such
as ``profile_orders_columns``) can pass them in via precomputed
min/max and skip the first scan; at 100 TB the rewrite dominates
either way, so this stays a documented optimization, not a default.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

Z_COL = "_z"


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    col_ranges: dict[str, tuple[float, float]] | None = None,
) -> tuple[DataFrame, str]:
    """Append the interleaved z-value column; returns (df, colname).

    ``col_ranges`` supplies precomputed per-column (min, max) — from
    table statistics or a prior profiling pass — skipping the stats
    scan entirely; columns absent from it fall back to the agg."""
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("bits * len(cols) must fit a signed int64")
    col_ranges = col_ranges or {}
    missing = [c for c in cols if c not in col_ranges]
    if missing:
        row = df.agg(
            *[F.min(c).cast("double").alias(f"mn_{c}") for c in missing],
            *[F.max(c).cast("double").alias(f"mx_{c}") for c in missing],
        ).collect()[0]
        stats = {
            **{f"mn_{c}": row[f"mn_{c}"] for c in missing},
            **{f"mx_{c}": row[f"mx_{c}"] for c in missing},
        }
    else:
        stats = {}
    for c, (mn, mx) in col_ranges.items():
        stats[f"mn_{c}"], stats[f"mx_{c}"] = mn, mx
    n_buckets = 1 << bits

    bucket_cols = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mx is None or mn is None or mx == mn:
            bucket_cols.append(F.lit(0))
            continue
        scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn)
        b = F.floor(scaled * n_buckets).cast("long")
        bucket_cols.append(F.least(b, F.lit(n_buckets - 1)))

    # interleave: output bit (k * ncols + i) = bit k of column i's bucket
    n = len(cols)
    z = F.lit(0).cast("long")
    for i, b in enumerate(bucket_cols):
        for k in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, k).bitwiseAND(F.lit(1)), k * n + i
            )
    return df.withColumn(Z_COL, z), Z_COL


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
    col_ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Cluster rows along the Morton curve of ``cols`` — write the
    result with ``.write.parquet`` and multi-column filters prune.
    ``col_ranges`` skips the stats scan (see ``zorder_value``)."""
    with_z, zc = zorder_value(df, cols, bits, col_ranges=col_ranges)
    n_parts = (
        num_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    return (
        with_z.repartitionByRange(n_parts, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
    )
