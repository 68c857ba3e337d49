"""In-flight data-quality observability (Spark Observation API).

The DQ expectations suite (queries/dq.py) audits tables AT REST with an
extra scan. At 100 TB you also want the same counters ON THE FLY — rows,
nulls, malformed payloads, late events — measured by the very job that
moves the data, for free: ``df.observe`` attaches aggregate expressions
to an existing plan, the metrics ride the job's own aggregation
machinery (no second scan, no action), and Spark surfaces them

* batch: through ``pyspark.sql.Observation`` after the first action;
* streaming: in every micro-batch's ``observedMetrics`` progress entry.

This is the OSS shape of Delta Live Tables expectations: declare rules
once, get per-batch counters + a fail/warn gate, pay nothing extra.

Rules are (name, condition) pairs counted with the same
conditional-sum discipline as queries/dq.py — ALL rules in ONE pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


def expectation_exprs(rules: dict[str, F.Column]) -> list[F.Column]:
    """One row-count plus one violation counter per rule, as aggregate
    expressions suitable for ``df.observe`` — every rule rides the same
    single pass."""
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    exprs += [
        F.sum(F.when(~cond, 1).otherwise(0)).alias(f"violations_{name}")
        for name, cond in rules.items()
    ]
    return exprs


def observe_batch(
    df: DataFrame, rules: dict[str, F.Column]
) -> tuple[DataFrame, Observation]:
    """Attach expectation counters to a BATCH plan. The Observation's
    ``.get`` blocks until the first action on the returned frame and
    then yields {n_rows, violations_<rule>: int}."""
    obs = Observation()
    return df.observe(obs, *expectation_exprs(rules)), obs


def observe_stream(
    df: DataFrame, name: str, rules: dict[str, F.Column]
) -> DataFrame:
    """Attach expectation counters to a STREAMING plan under ``name``.
    Each micro-batch's counters appear in
    ``query.lastProgress["observedMetrics"][name]`` (and in every
    entry of ``query.recentProgress``) — see ``progress_metrics``."""
    return df.observe(name, *expectation_exprs(rules))


def progress_metrics(query, name: str) -> list[dict]:
    """All observed-metric rows for ``name`` across the query's retained
    progress history (one dict per micro-batch that saw data)."""
    out = []
    for p in query.recentProgress:
        row = (p.get("observedMetrics") or {}).get(name)
        if row is not None:
            out.append(dict(row.asDict()) if hasattr(row, "asDict") else dict(row))
    return out


def assert_expectations(
    metrics: dict, fail_on: list[str] | None = None
) -> None:
    """DLT-style gate: raise if any listed rule (default: all) recorded
    violations. Call with the batch Observation's ``.get`` or a
    streaming progress row."""
    names = fail_on
    if names is None:
        names = [
            k[len("violations_"):]
            for k in metrics
            if k.startswith("violations_")
        ]
    bad = {
        n: metrics[f"violations_{n}"]
        for n in names
        if metrics.get(f"violations_{n}", 0)
    }
    if bad:
        raise ValueError(f"data-quality expectations failed: {bad}")
