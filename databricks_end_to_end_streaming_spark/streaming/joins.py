"""Stream-stream joins with event-time bounds.

Beyond the reference surface (it has no joins at all, SURVEY §2.5), but
essential for a production event pipeline: correlating two live streams
(e.g. raw events with a stream of enrichment/confirmation events) needs
a stream-stream join where BOTH sides buffer state, bounded by
watermarks + a time-range join condition so Spark can evict rows that
can no longer match.

State math: each side keeps rows until its watermark passes
(other side's watermark + the time bound); without the range condition
the state would grow forever — Spark rejects unbounded stream-stream
outer joins for exactly that reason.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_stream_time_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "event_time",
    right_ts: str = "event_time",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on `key` where the right event lands in
    [left_ts, left_ts + within). Columns from both sides are kept with
    l_/r_ prefixes for the ambiguous ones."""
    l = left.withWatermark(left_ts, watermark).select(
        F.col(key).alias("join_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(key).alias("r_join_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    )
    cond = (
        (l.join_key == r.r_join_key)
        & (r.r_ts >= l.l_ts)
        & (r.r_ts < l.l_ts + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop("r_join_key")
