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


def all_queries() -> dict[str, QueryFn]:
    """All registered queries, in registration order.

    The library deliberately does NOT reorder around external evaluation
    state; coverage rotation across evaluation rounds is the concern of the
    driver-facing entry point (see /root/repo/__spark_entry__.py).
    """
    _load_modules()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_modules()
    return dict(_ORACLE)


_LOADED = False


def _load_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side-effects.
    from . import (  # noqa: F401
        analytics,
        classifier,
        dedup,
        dq,
        extensions,
        kmv,
        fuzzy,
        medallion,
        pipeline,
        relational,
        similarity,
        text,
        tpch,
        tpch_more,
        tpch_partsupp,
        web,
    )

    _LOADED = True
