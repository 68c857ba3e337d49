"""Query corpus registry.

Every batch-expressible operator from SURVEY.md §2 (plus the north-star
extension operators) registers here as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB oracle
SQL string computing the same result. The driver hash-compares the two at
sf0.01 (see /root/repo/__spark_entry__.py).

Cross-engine hash-parity rules used throughout the corpus:

* Alias every computed column identically in Spark and SQL.
* Money-ish double aggregates go through DECIMAL(18,2) (exact arithmetic)
  and are cast back to double once — bit-identical in both engines.
* Averages are written ``CAST(sum AS DOUBLE) / count`` so both engines do
  one IEEE double division.
* ``events.ts`` is truncated to microseconds on both sides (nanos parquet).
* LIMIT queries carry a total ORDER BY (unique tiebreaker column) so the
  kept rows are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


# Names that already earned a green (hash-match) row in CORRECTNESS_r01.
# The driver's correctness gate evaluates only the FIRST 50 registered
# queries per round, so ordering is evidence-driven: queries with an
# oracle but no green row yet come first (they need the driver's check
# most), rows-only queries next (weaker rows-only evidence, still worth
# a row), and already-evidenced queries last. As rounds accumulate green
# rows, extend this set so the window rotates over the whole corpus.
_PRIOR_GREEN = frozenset(
    {
        "window_lag_inter_event_gap", "sessionize_events", "explode_token_counts",
        "count_distinct_users_per_type", "running_total_per_user",
        "median_value_per_type_exact", "session_window_events",
        "asof_last_event_value", "interval_join_order_week_events",
        "dedup_exact", "dedup_ngram_overlap_sample", "knn_bruteforce_cosine",
        "embedding_label_centroid_sim", "medallion_bronze_flatten",
        "medallion_silver_dedup", "medallion_gold_agg", "gold_daily_windows",
        "sql_api_status_counts", "medallion_end_to_end", "llm_clean_corpus",
        "full_outer_join_nation_presence", "cross_join_region_matrix",
        "scalar_subquery_above_avg_orders", "cube_order_status_priority",
        "null_handling_coalesce_nullif", "scalar_math_functions",
        "string_transform_functions", "inlist_and_between_filter",
        "array_hof_embedding_features", "pivot_status_counts",
        "date_arithmetic_functions", "grouping_sets_order_margins",
        "unpivot_lineitem_rates", "array_agg_order_lines", "text_token_stats",
        "text_quality_score", "text_lang_id", "text_bpe_token_stats",
        "text_fingerprint", "dataset_split_deterministic", "text_repetition_score",
    }
)


def _ordered(names: list[str]) -> list[str]:
    def tier(n: str) -> int:
        if n in _ORACLE and n not in _PRIOR_GREEN:
            return 0  # oracled, no green evidence yet -> check first
        if n not in _ORACLE:
            return 1  # rows-only
        return 2  # already evidenced in a prior round

    index = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (tier(n), index[n]))


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return {n: _QUERIES[n] for n in _ordered(list(_QUERIES))}


def all_oracles() -> dict[str, str]:
    _load_modules()
    return {n: _ORACLE[n] for n in _ordered(list(_QUERIES)) if n in _ORACLE}


_LOADED = False


def _load_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side-effects.
    from . import (  # noqa: F401
        analytics,
        dedup,
        extensions,
        medallion,
        pipeline,
        relational,
        similarity,
        text,
        tpch,
        tpch_more,
    )

    _LOADED = True
