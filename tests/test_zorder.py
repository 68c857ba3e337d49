"""Z-order layout: partitions become multi-dimensional blocks (tight on
EVERY clustered column) instead of single-column stripes."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.layout import (
    zorder_by,
    zorder_value,
)


def _grid(spark, side=64):
    return spark.createDataFrame(
        [(x, y) for x in range(side) for y in range(side)], "x long, y long"
    )


def _max_span(df, col, n_parts):
    parted = df.withColumn("pid", F.spark_partition_id())
    spans = (
        parted.groupBy("pid")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .collect()
    )
    assert len(spans) >= n_parts // 2  # range partitioner actually split
    return max(r["span"] for r in spans)


def test_zorder_bounds_both_dimensions(spark):
    df = _grid(spark)
    n = 16
    z = zorder_by(df, ["x", "y"], bits=6, num_partitions=n)
    z = z.localCheckpoint(eager=True)  # pin partition assignment
    stripes = df.repartitionByRange(n, "x").sortWithinPartitions("x")
    stripes = stripes.localCheckpoint(eager=True)

    # stripe layout: x is tight but y spans the whole domain
    assert _max_span(stripes, "y", n) >= 60
    # z-order: BOTH dimensions bounded well below the 64-wide domain
    assert _max_span(z, "x", n) <= 32
    assert _max_span(z, "y", n) <= 32


def test_zorder_preserves_rows(spark):
    df = _grid(spark, side=16)
    z = zorder_by(df, ["x", "y"], bits=4, num_partitions=4)
    assert sorted(map(tuple, z.collect())) == sorted(map(tuple, df.collect()))


def test_zorder_value_interleaves(spark):
    df = spark.createDataFrame([(0, 0), (255, 255)], "x long, y long")
    with_z, zc = zorder_value(df, ["x", "y"], bits=8)
    vals = {(r["x"], r["y"]): r[zc] for r in with_z.collect()}
    assert vals[(0, 0)] == 0
    assert vals[(255, 255)] == (1 << 16) - 1  # all 16 interleaved bits set


def test_constant_column_degenerates(spark):
    df = spark.createDataFrame([(1, 5), (2, 5)], "x long, y long")
    z = zorder_by(df, ["x", "y"], bits=4, num_partitions=2)
    assert sorted(map(tuple, z.collect())) == [(1, 5), (2, 5)]


def test_zorder_rowgroup_skipping_on_second_dim(spark, workdir):
    """The actual data-skipping payoff, measured on parquet row-group
    statistics: for a filter on y (the NON-prefix dimension), most
    z-ordered row groups are prunable by their min/max stats, while the
    sort-by-x stripe layout leaves every row group overlapping the
    predicate."""
    import pyarrow.parquet as pq

    df = _grid(spark, side=64)  # 4096 rows
    small = {"parquet.block.size": 64 * 1024}  # force several row groups

    z = zorder_by(df, ["x", "y"], bits=6, num_partitions=4)
    z.write.options(**small).parquet(f"{workdir}/zlay")
    stripes = df.repartitionByRange(4, "x").sortWithinPartitions("x")
    stripes.write.options(**small).parquet(f"{workdir}/slay")

    def overlap_fraction(path, lo=0, hi=7):
        import os

        total = hit = 0
        for root, _d, files in os.walk(path):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                ycol = md.schema.to_arrow_schema().get_field_index("y")
                for i in range(md.num_row_groups):
                    st = md.row_group(i).column(ycol).statistics
                    total += 1
                    if st.min <= hi and st.max >= lo:
                        hit += 1
        assert total >= 4  # enough row groups for the comparison to mean anything
        return hit / total

    z_frac = overlap_fraction(f"{workdir}/zlay")
    s_frac = overlap_fraction(f"{workdir}/slay")
    assert s_frac == 1.0  # stripes: y spans the domain in every row group
    assert z_frac <= 0.5  # z-order: most row groups prunable on y


def test_precomputed_col_ranges_skip_stats_scan(spark):
    """col_ranges must yield the identical layout to the stats-scan path
    when given the true min/max (single-scan OPTIMIZE), and still
    bucketize sanely with wider-than-actual ranges."""
    from databricks_end_to_end_streaming_spark.operators.layout import (
        zorder_value,
    )

    df = spark.range(0, 1000).selectExpr(
        "id AS a", "(id * 37) % 1000 AS b"
    )
    scanned, zc = zorder_value(df, ["a", "b"], bits=4)
    supplied, _ = zorder_value(
        df, ["a", "b"], bits=4, col_ranges={"a": (0.0, 999.0), "b": (0.0, 999.0)}
    )
    got_scan = {r["a"]: r[zc] for r in scanned.collect()}
    got_sup = {r["a"]: r[zc] for r in supplied.collect()}
    assert got_scan == got_sup


def _py_xy2d(nbits: int, x: int, y: int) -> int:
    d = 0
    s = 1 << (nbits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_is_a_true_hilbert_curve(spark):
    """Bijection over the full 16x16 grid AND the defining property:
    consecutive curve positions are grid NEIGHBORS (unit manhattan
    step) — Morton fails this at every quadrant boundary."""
    from databricks_end_to_end_streaming_spark.operators.layout import (
        hilbert_value,
    )

    side = 16
    df = _grid(spark, side=side)
    with_z, zc = hilbert_value(
        df, ["x", "y"], bits=4, col_ranges={"x": (0, side), "y": (0, side)}
    )
    rows = with_z.collect()
    assert sorted(r[zc] for r in rows) == list(range(side * side))
    by_d = {r[zc]: (r["x"], r["y"]) for r in rows}
    for d in range(side * side - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d
    # matches the sequential reference implementation exactly
    for r in rows[:64]:
        assert r[zc] == _py_xy2d(4, r["x"], r["y"])


def test_hilbert_tightens_bounding_boxes_vs_morton(spark):
    """The reason to pay for Hilbert: average per-partition bounding-box
    area is no worse than Morton's (it avoids Morton's quadrant jumps),
    so parquet min/max skipping prunes at least as well."""
    df = _grid(spark)
    n = 16

    def mean_area(clustered):
        parted = clustered.withColumn("pid", F.spark_partition_id())
        spans = (
            parted.groupBy("pid")
            .agg(
                (F.max("x") - F.min("x") + 1).alias("sx"),
                (F.max("y") - F.min("y") + 1).alias("sy"),
            )
            .collect()
        )
        return sum(r["sx"] * r["sy"] for r in spans) / len(spans)

    hil = zorder_by(
        df, ["x", "y"], bits=6, num_partitions=n, curve="hilbert"
    ).localCheckpoint(eager=True)
    mor = zorder_by(df, ["x", "y"], bits=6, num_partitions=n).localCheckpoint(
        eager=True
    )
    assert mean_area(hil) <= mean_area(mor) * 1.05  # never meaningfully worse
    # and both dimensions stay bounded (the block-not-stripe property)
    assert _max_span(hil, "x", n) <= 32
    assert _max_span(hil, "y", n) <= 32


def test_hilbert_preserves_rows(spark):
    df = _grid(spark, side=16)
    z = zorder_by(df, ["x", "y"], bits=4, num_partitions=4, curve="hilbert")
    assert sorted(map(tuple, z.collect())) == sorted(map(tuple, df.collect()))


def test_hilbert_rowgroup_skipping_on_second_dim(spark, workdir):
    """The Hilbert payoff measured the same way as Morton's: row groups
    prunable on the NON-prefix dimension. Must at least match the
    stripe layout's total overlap and Morton's pruning class."""
    import os

    import pyarrow.parquet as pq

    df = _grid(spark, side=64)
    small = {"parquet.block.size": 64 * 1024}
    h = zorder_by(df, ["x", "y"], bits=6, num_partitions=4, curve="hilbert")
    h.write.options(**small).parquet(f"{workdir}/hlay")

    def overlap_fraction(path, lo=0, hi=7):
        total = hit = 0
        for root, _d, files in os.walk(path):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                ycol = md.schema.to_arrow_schema().get_field_index("y")
                for i in range(md.num_row_groups):
                    st = md.row_group(i).column(ycol).statistics
                    total += 1
                    if st.min <= hi and st.max >= lo:
                        hit += 1
        assert total >= 4
        return hit / total

    assert overlap_fraction(f"{workdir}/hlay") <= 0.5
