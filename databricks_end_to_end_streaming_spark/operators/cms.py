"""Count-min sketch: mergeable approximate frequency counts.

Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications" (J. Algorithms 2005) — public
literature. The frequency-estimation twin of the HLL rollup
(queries/analytics.py): token counts over a 100 TB corpus can't keep an
exact (token, count) row per distinct token cheaply, but a d x w counter
grid can — estimates are one-sided (never undercounts, overcounts by at
most eps*N with probability 1-delta), and grids from different shards /
days / partitions ADD, so rollups re-aggregate without rescanning.

Spark-first shape: the grid is built entirely with built-in expressions
— explode d hash rows per token occurrence, md5-prefix-bucket into w
columns, one partial-agg shuffle of (d x w) tiny rows. No UDFs, no
driver-side counting; the sketch itself is a DataFrame and merging is
``union + groupBy sum`` (algebraic, map-side combinable). The row hash
is the first 15 hex chars of md5("item|row_id") mod w: deterministic
across engines, so the driver's DuckDB oracle REPLAYS the sketch
(queries/extensions.py) instead of recording rows-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_DEPTH = 4  # d independent hash rows: delta = e^-d
DEFAULT_WIDTH = 256  # w buckets per row: eps = e/w


def _bucket(item: F.Column, row_id: F.Column, width: int) -> F.Column:
    """Deterministic, SQL-replayable bucket: md5-prefix of
    "item|row_id" mod width (both operands non-negative, pmod == %)."""
    key = F.concat(item, F.lit("|"), row_id.cast("string"))
    h = F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(width))


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """(row_id, bucket, cnt) counter grid over one item per input row.
    One explode (x depth) + one partial-agg shuffle of at most d*w rows.

    ``weight_col`` (r13): each input row contributes that many
    occurrences (the grid cell is the SUM of weights) — a
    pre-aggregated (item, count) relation builds the IDENTICAL grid
    with d hashes per DISTINCT item instead of d per occurrence, the
    "aggregate before you shuffle" move (guide §2.3) for callers whose
    item stream is explode-heavy. Cell values are the same exact int64s
    either way; the default (None) counts rows, as before."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = items.select(
        F.col(item_col).alias("item"),
        w.cast("long").alias("_w"),
        F.explode(
            F.array(*[F.lit(d) for d in range(depth)])
        ).alias("row_id"),
    ).select(
        "row_id",
        _bucket(F.col("item"), F.col("row_id"), width).alias("bucket"),
        "_w",
    )
    return rows.groupBy("row_id", "bucket").agg(F.sum("_w").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge counter grids (same depth/width) by cell-wise addition —
    the property that makes shard/day rollups re-aggregatable."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("row_id", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str = "item",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-query estimates: min over the d rows of the queried cell.
    The sketch is at most d*w rows — broadcast — so estimation is a
    map-side join against the (possibly huge) query relation."""
    probes = queries.select(
        F.col(item_col).alias("item"),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("row_id"),
    ).select(
        "item",
        "row_id",
        _bucket(F.col("item"), F.col("row_id"), width).alias("bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["row_id", "bucket"], "left").select(
        "item", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy("item").agg(F.min("cnt").alias("est_count"))
