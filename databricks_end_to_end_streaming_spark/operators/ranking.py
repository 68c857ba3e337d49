"""Distributed global ranking without a single-partition sort.

``Window.orderBy`` with no ``partitionBy`` collapses the whole dataset
into ONE partition — correct, and fatal at 100 TB. The classic
distributed alternative computed here:

1. range-repartition by the sort key (Spark samples the key distribution
   to build balanced range bounds — the same machinery ORDER BY uses),
2. sort within each partition,
3. count rows per partition (a tiny driver-side collect of one long per
   partition — the only data that ever leaves the cluster),
4. global rank = cumulative offset of the partition + local row_number.

Every heavy step stays parallel; the per-partition counts are O(number
of partitions), not O(rows). This is how distributed engines implement
total ORDER BY ranking generally (TeraSort-style range partitioning —
public literature).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from ..pin import pin


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based dense global row number ordered by ``order_cols``
    (which must form a total order — include a unique tiebreaker)."""
    return global_row_number_counted(df, order_cols, rank_col, num_partitions)[0]


def global_row_number_counted(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Like ``global_row_number`` but also returns the TOTAL row count,
    derived from the per-partition counts the ranking already collects —
    zero extra jobs. Iterative callers (suffix-array prefix doubling)
    use it as a free convergence check: total == max rank for a dense
    1-based ranking.
    """
    cols = [F.col(c) for c in order_cols]
    # r13 (guide §2 "scale-adaptive partitioning"): with no explicit
    # num_partitions the range exchange comes from a plain global sort,
    # whose partition count AQE coalesces by SIZE — a 5k-row collapsed
    # relation lands in 1-2 partitions (no 32-task fan-out of scheduler
    # overhead), a 100 TB one in as many advisory-sized partitions as it
    # needs. A fixed defaultParallelism was wrong at both ends.
    if num_partitions:
        parted = df.repartitionByRange(num_partitions, *cols).sortWithinPartitions(
            *cols
        )
    else:
        parted = df.sort(*cols)
    # Pin the partitioning before branching: the range exchange SAMPLES
    # the key distribution per job, so the counts job below and the
    # final output job would otherwise re-sample different range bounds
    # and assign rows to different partitions — duplicate and missing
    # ranks. require_frozen: a lineage-keeping persist would RECOMPUTE
    # lost blocks with freshly sampled bounds — same corruption, just
    # deferred to executor loss — so this site always truncates.
    #
    # r13 (guide §2.4 "remove shuffles outright"): the local row number
    # rides monotonically_increasing_id, captured INSIDE the pinned
    # sorted plan — its documented layout is (partition id << 33) +
    # per-partition consecutive row number, so the within-partition rank
    # is `_mid & (2^33 - 1)` as a pure map. This replaces the old
    # Window.partitionBy("_pid") pass, whose hash exchange re-shuffled
    # the whole relation AFTER the checkpoint (localCheckpoint hides
    # the range partitioning from the planner). One range shuffle total.
    with_pid = (
        parted.withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .transform(
            lambda d: pin(d, require_frozen=True, site="ranking.range_ranks")
        )
    )

    # one long per partition to the driver; offsets broadcast back
    counts = with_pid.groupBy("_pid").count().collect()
    sizes = {r["_pid"]: r["count"] for r in counts}
    if sizes and max(sizes.values()) >= (1 << 33):
        # monotonically_increasing_id's documented layout caps the
        # per-partition row number at 2^33; a partition that large is a
        # sizing bug (8.5e9 rows in one task) — fail loud, not wrap.
        raise ValueError(
            "global_row_number: a range partition exceeds 2^33 rows; "
            "pass num_partitions to split the input further"
        )
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    spark = df.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )

    local_rn = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1
    ranked = (
        with_pid.join(offsets_df, "_pid")
        .withColumn(rank_col, (F.col("_offset") + local_rn).cast("long"))
        .drop("_pid", "_offset", "_mid")
    )
    return ranked, acc


def ntile_from_rank(rank_col: str, total: int, n: int) -> F.Column:
    """SQL-standard NTILE(n) bucket from a precomputed global rank:
    the first ``total % n`` buckets get ``total // n + 1`` rows, the rest
    ``total // n`` — exactly NTILE's distribution, computed from the rank
    arithmetic instead of a windowed pass."""
    base, rem = divmod(total, n)
    r = F.col(rank_col)
    if base == 0:  # fewer rows than buckets: NTILE gives bucket = rank
        return r.cast("int")
    big = rem * (base + 1)  # rows living in the oversized buckets
    return F.when(
        r <= F.lit(big), F.ceil(r / F.lit(base + 1))
    ).otherwise(F.lit(rem) + F.ceil((r - F.lit(big)) / F.lit(base))).cast("int")
