"""Incremental fuzzy ER (streaming/fuzzy_stage.py): drained logs equal
the batch fuzzy_part_name_matches, cross-batch typo pairs are caught via
the token index, replays never duplicate, counts fold by addition."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.fuzzy import (
    fuzzy_part_name_matches,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.fuzzy_stage import (
    fuzzy_batch,
    fuzzy_er_stage,
    fuzzy_matches_from_log,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _tables(workdir):
    return (
        ParquetTable(f"{workdir}/names"),
        ParquetTable(f"{workdir}/tok"),
        ParquetTable(f"{workdir}/matches"),
    )


def _rows(df):
    return sorted(
        (r.name_a, r.name_b, r.edit_dist, r.n_rows_a, r.n_rows_b)
        for r in df.collect()
    )


def test_drained_stream_equals_batch_matches(spark, workdir):
    parts = load_table(spark, SF_DIR, "part")
    n_t, i_t, m_t = _tables(workdir)
    for i in range(3):
        fuzzy_batch(parts.where(F.col("p_partkey") % 3 == i), n_t, i_t, m_t, i)
    got = _rows(fuzzy_matches_from_log(spark, n_t, m_t))
    want = sorted(
        (r.name_a, r.name_b, r.edit_dist, r.n_parts_a, r.n_parts_b)
        for r in fuzzy_part_name_matches(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0


def test_cross_batch_typo_pair_found(spark, workdir):
    n_t, i_t, m_t = _tables(workdir)
    b0 = spark.createDataFrame(
        [(0, "small ring"), (1, "small ring")], "p_partkey long, p_name string"
    )
    b1 = spark.createDataFrame(
        [(2, "small king")], "p_partkey long, p_name string"
    )
    fuzzy_batch(b0, n_t, i_t, m_t, 0)
    fuzzy_batch(b1, n_t, i_t, m_t, 1)  # typo arrives a batch later
    got = _rows(fuzzy_matches_from_log(spark, n_t, m_t))
    assert got == [("small king", "small ring", 1, 1, 2)]


def test_replay_is_idempotent(spark, workdir):
    parts = load_table(spark, SF_DIR, "part")
    n_t, i_t, m_t = _tables(workdir)
    fuzzy_batch(parts.where(F.col("p_partkey") % 2 == 0), n_t, i_t, m_t, 0)
    fuzzy_batch(parts.where(F.col("p_partkey") % 2 == 1), n_t, i_t, m_t, 1)
    before = _rows(fuzzy_matches_from_log(spark, n_t, m_t))
    fuzzy_batch(parts.where(F.col("p_partkey") % 2 == 1), n_t, i_t, m_t, 1)
    assert _rows(fuzzy_matches_from_log(spark, n_t, m_t)) == before


def test_streaming_wrapper(spark, workdir):
    parts = load_table(spark, SF_DIR, "part")
    src = f"{workdir}/src"
    parts.write.parquet(src)
    n_t, i_t, m_t = _tables(f"{workdir}/t")
    source = spark.readStream.schema(parts.schema).parquet(src)
    fuzzy_er_stage(source, n_t, i_t, m_t, f"{workdir}/ckpt")
    got = _rows(fuzzy_matches_from_log(spark, n_t, m_t))
    want = sorted(
        (r.name_a, r.name_b, r.edit_dist, r.n_parts_a, r.n_parts_b)
        for r in fuzzy_part_name_matches(spark, SF_DIR).collect()
    )
    assert got == want


def test_drained_golden_records_equal_batch(spark, workdir):
    """Read-side golden-record fold over the incremental logs == the
    batch er_golden_records (shared survivorship core; pair discovery
    stayed incremental)."""
    from databricks_end_to_end_streaming_spark.queries.fuzzy import (
        er_golden_records,
    )
    from databricks_end_to_end_streaming_spark.streaming.fuzzy_stage import (
        golden_records_from_log,
    )

    parts = load_table(spark, SF_DIR, "part")
    n_t, i_t, m_t = _tables(workdir)
    for i in range(4):
        fuzzy_batch(parts.where(F.col("p_partkey") % 4 == i), n_t, i_t, m_t, i)
    got = sorted(
        (r.cluster_id, r.canonical_name, r.n_names, r.n_parts_total)
        for r in golden_records_from_log(spark, n_t, m_t).collect()
    )
    want = sorted(
        (r.cluster_id, r.canonical_name, r.n_names, r.n_parts_total)
        for r in er_golden_records(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0
