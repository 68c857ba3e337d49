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

import pandas as pd
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
    bucket_cols = _bucketize(df, cols, bits, col_ranges)

    # interleave: output bit (k * ncols + i) = bit k of column i's bucket
    n = len(cols)
    z = F.lit(0).cast("long")
    for i, b in enumerate(bucket_cols):
        for k in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, k).bitwiseAND(F.lit(1)), k * n + i
            )
    return df.withColumn(Z_COL, z), Z_COL


def _bucketize(
    df: DataFrame,
    cols: list[str],
    bits: int,
    col_ranges: dict[str, tuple[float, float]] | None,
) -> list[F.Column]:
    """Equal-width bucket expressions shared by both curves (the stats
    scan / precomputed-range logic of ``zorder_value``)."""
    col_ranges = col_ranges or {}
    missing = [c for c in cols if c not in col_ranges]
    stats: dict[str, float | None] = {}
    if missing:
        row = df.agg(
            *[F.min(c).cast("double").alias(f"mn_{c}") for c in missing],
            *[F.max(c).cast("double").alias(f"mx_{c}") for c in missing],
        ).collect()[0]
        stats.update({k: row[k] for k in row.asDict()})
    for c, (mn, mx) in col_ranges.items():
        stats[f"mn_{c}"], stats[f"mx_{c}"] = mn, mx
    n_buckets = 1 << bits
    out = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mx is None or mn is None or mx == mn:
            out.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn)
        b = F.floor(scaled * n_buckets).cast("long")
        out.append(F.least(b, F.lit(n_buckets - 1)))
    return out


def hilbert_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    col_ranges: dict[str, tuple[float, float]] | None = None,
) -> tuple[DataFrame, str]:
    """Append the 2-D HILBERT index of ``cols`` — the curve Delta's
    newer OPTIMIZE clustering uses. Hilbert keeps every unit step on the
    curve a unit step in key space (Morton takes long diagonal jumps at
    quadrant boundaries), so per-file bounding boxes are tighter and
    min/max skipping prunes more.

    Bucketing stays a JVM expression; the index itself is the standard
    quadrant-rotation recurrence (Hilbert 1891; the public iterative
    xy2d algorithm) — a rotation that rebinds x/y each round, which
    flat Catalyst expressions can't share (CollapseProject inlines the
    rebinding, doubling the tree per bit — exponential). It runs as an
    Arrow-batched vectorized UDF over the two bucket columns instead:
    ~``bits`` numpy passes per batch, and the clustering REWRITE it
    feeds is IO-bound, so the Python boundary is immaterial here —
    unlike a per-row scan-path UDF."""
    if len(cols) != 2:
        raise ValueError("hilbert_value is 2-D; use zorder_value otherwise")
    if not 1 <= bits * 2 <= 62:
        raise ValueError("2 * bits must fit a signed int64")
    from pyspark.sql.functions import pandas_udf

    n_bits = bits

    @pandas_udf("long")
    def _hilbert(xs: pd.Series, ys: pd.Series) -> pd.Series:
        import numpy as np

        x = xs.to_numpy(dtype="int64", copy=True)
        y = ys.to_numpy(dtype="int64", copy=True)
        d = np.zeros_like(x)
        s = 1 << (n_bits - 1)
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            swap = ry == 0
            flip = swap & (rx == 1)
            xf = np.where(flip, s - 1 - x, x)
            yf = np.where(flip, s - 1 - y, y)
            x = np.where(swap, yf, xf)
            y = np.where(swap, xf, yf)
            s >>= 1
        return pd.Series(d)

    bx, by = _bucketize(df, cols, bits, col_ranges)
    return df.withColumn(Z_COL, _hilbert(bx, by)), Z_COL


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
    col_ranges: dict[str, tuple[float, float]] | None = None,
    curve: str = "morton",
) -> DataFrame:
    """Cluster rows along a space-filling curve of ``cols`` — write the
    result with ``.write.parquet`` and multi-column filters prune.
    ``col_ranges`` skips the stats scan (see ``zorder_value``);
    ``curve="hilbert"`` (2-D only) trades the pure-JVM Morton interleave
    for tighter per-file bounding boxes."""
    if curve == "hilbert":
        with_z, zc = hilbert_value(df, cols, bits, col_ranges=col_ranges)
    elif curve == "morton":
        with_z, zc = zorder_value(df, cols, bits, col_ranges=col_ranges)
    else:
        raise ValueError(f"unknown curve {curve!r}")
    n_parts = (
        num_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    return (
        with_z.repartitionByRange(n_parts, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
    )
