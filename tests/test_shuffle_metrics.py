"""Measured-shuffle regression guards: execute representative queries
at sf0.001 on the 4-core test session and assert the REAL SQLMetric
shuffle volumes stay tiny — a stronger property than plan-shape checks
(a plan can look right and still move the corpus). Bounds are loose
multiples of the aggregate-state sizes, so data growth in the fixture
would not flake them; moving a corpus-sized relation through shuffle
would blow them by orders of magnitude."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from shuffle_ledger import measure  # noqa: E402

from databricks_end_to_end_streaming_spark.queries import all_queries  # noqa: E402

SF = "/root/testdata/sf0.001"


def _measure(spark, name):
    return measure(all_queries()[name](spark, SF))


def test_q6_shuffles_one_partial_row_per_partition(spark):
    t = _measure(spark, "tpch_q6_revenue_forecast")
    assert t["scan_rows"] >= 1000  # really read the fact table
    # global agg: one partial row per input partition, nothing more
    assert t["shuffle_records"] <= 8


def test_q1_shuffles_group_partials_only(spark, monkeypatch):
    # The r13 spread_small_scan front door deliberately repartitions the
    # one-row-group toy-SF scan (a no-op at real scale, where the scan is
    # already parallel) — disable it so this asserts the AGGREGATION's
    # own at-scale shuffle shape: group partials only.
    monkeypatch.setenv("SPARK_GRAFT_NO_SPREAD", "1")
    t = _measure(spark, "tpch_q1_pricing_summary")
    # 6 groups x <= 4 partitions of partials
    assert t["scan_rows"] >= 1000
    assert t["shuffle_records"] <= 6 * 4


def test_q1_spread_moves_corpus_at_most_once(spark):
    # With the spread active (tiny-SF single-split scan), the only
    # corpus-sized exchange is the ONE deliberate repartition: total
    # shuffle records stay bounded by one pass over the scan plus the
    # group partials.
    t = _measure(spark, "tpch_q1_pricing_summary")
    assert t["shuffle_records"] <= t["scan_rows"] + 6 * 4


def test_gold_agg_shuffles_type_partials_only(spark):
    t = _measure(spark, "medallion_gold_agg")
    assert t["shuffle_records"] <= 5 * 4  # 5 event types x partitions


def test_kmv_sketch_shuffle_bounded_by_k_not_corpus(spark):
    t = _measure(spark, "kmv_distinct_users_per_type")
    # distinct hashes (<= users x types) + two bottom-k levels; the
    # guard is that it is nowhere near scan_rows (events)
    assert t["scan_rows"] >= 1000
    assert t["shuffle_records"] < t["scan_rows"] / 2


def test_bm25_shuffles_one_stats_row(spark):
    t = _measure(spark, "bm25_keyword_search")
    # map-side tf + 1-row corpus stats: no per-token explode shuffle
    assert t["shuffle_records"] <= 8
