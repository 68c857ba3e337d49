"""Snapshot diff: which rows were added / dropped / modified / unchanged
between two versions of a table — the audit primitive behind pipeline-run
reviews ("what did today's clean pass actually do"), CDC backfills, and
regression triage of a rewritten job against its predecessor.

100 TB shape: each side collapses its compared columns to ONE md5 row
hash map-side (whole-stage codegen, no Python), so the full-outer join
on the key carries key + 32-byte hash + any passthrough columns — never
the wide payload twice. The join is the single shuffle; on bucketed
tables (``bucketing.py``) it is exchange-free. Nothing is collected:
the per-row statuses stay a relation, and ``diff_summary`` reduces them
with one partial-agg'd shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

ADDED = "added"
DROPPED = "dropped"
MODIFIED = "modified"
UNCHANGED = "unchanged"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-key status relation. ``compare_cols`` define row identity
    beyond the key (hashed with a 0x1f separator so column boundaries
    can't alias); ``passthrough`` columns ride along from whichever side
    has the row (old wins when both do — they're equal for unchanged
    rows and the audit wants the before-image for modified ones)."""
    passthrough = passthrough or []

    def prep(df: DataFrame, tag: str) -> DataFrame:
        h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in compare_cols]))
        cols = [F.col(k) for k in keys] + [h.alias(f"_h_{tag}")]
        cols += [F.col(c).alias(f"_p_{tag}_{c}") for c in passthrough]
        return df.select(*cols)

    o = prep(old, "old")
    n = prep(new, "new")
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit(ADDED))
        .when(F.col("_h_new").isNull(), F.lit(DROPPED))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit(UNCHANGED))
        .otherwise(F.lit(MODIFIED))
    )
    out = joined.withColumn("status", status)
    for c in passthrough:
        out = out.withColumn(
            c, F.coalesce(F.col(f"_p_old_{c}"), F.col(f"_p_new_{c}"))
        )
    return out.select(*keys, "status", *passthrough)


def diff_summary(diff: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Counts per status (optionally per extra group columns) — one
    partial-agg'd shuffle over the status relation."""
    return diff.groupBy("status", *(group_cols or [])).agg(
        F.count("*").cast("long").alias("n_rows")
    )
