"""Degenerate-input guards for the round-6 second-wave queries: every
operator must return (not raise) on an EMPTY corpus — the failure mode
iterative/window/sketch code hits when a filter upstream drains a
partition. The funnel still reports its four zero-count stages."""

from __future__ import annotations

import pytest

from databricks_end_to_end_streaming_spark.queries import all_queries

DOCS = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
PART = "p_partkey long, p_name string"

NEW_QUERIES = [
    "kmv_distinct_users_per_type",
    "kmv_weekly_users_rollup",
    "kmv_trailing_7day_users",
    "kmv_source_token_overlap",
    "er_golden_records",
    "domain_quota_cap",
    "packing_next_fit_stats",
    "deterministic_corpus_shuffle",
    "jaccard_prefix_filter_join",
    "web_corpus_curation_funnel",
    "seasonal_naive_backtest",
    "cdc_net_aggregate_view",
]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("empty"))
    spark.createDataFrame([], DOCS).write.parquet(f"{tmp}/documents.parquet")
    spark.createDataFrame([], EVENTS).write.parquet(f"{tmp}/events.parquet")
    spark.createDataFrame([], PART).write.parquet(f"{tmp}/part.parquet")
    return tmp


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_empty_corpus_returns_not_raises(spark, empty_dir, name):
    rows = all_queries()[name](spark, empty_dir).collect()
    if name == "web_corpus_curation_funnel":
        assert len(rows) == 4 and all(r.n_docs == 0 for r in rows)
    else:
        assert rows == []


R7_QUERIES = [
    "histogram_quantile_rollup",
    "kmv_join_size_estimate",
    "timeseries_pattern_topk",
    "sq8_cosine_topk",
    "embedding_snapshot_drift",
]

R7_TABLES = ["orders", "customer", "lineitem"]


@pytest.fixture(scope="module")
def empty_dir_r7(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("empty_r7"))
    spark.createDataFrame([], EVENTS).write.parquet(f"{tmp}/events.parquet")
    spark.createDataFrame(
        [], "vec_id long, label string, embedding array<float>"
    ).write.parquet(f"{tmp}/embeddings.parquet")
    spark.createDataFrame(
        [], "o_orderkey long, o_custkey long"
    ).write.parquet(f"{tmp}/orders.parquet")
    spark.createDataFrame([], "c_custkey long").write.parquet(
        f"{tmp}/customer.parquet"
    )
    spark.createDataFrame([], "l_orderkey long").write.parquet(
        f"{tmp}/lineitem.parquet"
    )
    return tmp


@pytest.mark.parametrize("name", R7_QUERIES)
def test_r7_empty_returns_not_raises(spark, empty_dir_r7, name):
    rows = all_queries()[name](spark, empty_dir_r7).collect()
    if name == "kmv_join_size_estimate":
        # the estimator still emits its two join rows (zero-count sides)
        assert {r.join_name for r in rows} <= {
            "orders_x_customer",
            "lineitem_x_orders",
        }
    else:
        assert rows == []


R12_QUERIES = [
    "unigram_frozen_viterbi_stats",
    "tokenizer_fertility_per_lang",
]


@pytest.mark.parametrize("name", R12_QUERIES)
def test_r12_empty_corpus_returns_not_raises(spark, empty_dir, name):
    """Empty vocabulary -> empty seed model -> zero segmented rows; the
    frozen Viterbi path must degrade to an empty result, not raise in
    seed collection or the mapInPandas closure."""
    assert all_queries()[name](spark, empty_dir).collect() == []
