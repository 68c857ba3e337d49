"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``databricks_end_to_end_streaming_spark/``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from databricks_end_to_end_streaming_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)


def _evidence_rounds(
    include_local: bool = False,
) -> tuple[dict[str, int], dict[str, int]]:
    """Per query, the latest round with (a) a green ``hash_match`` row and
    (b) the driver's weaker rows-only record (``err == 'no_oracle'``),
    from the CORRECTNESS_r{N}.json files on disk. Rounds with a real
    error or a mismatch count as neither, so such a query re-enters the
    window until it goes green again.

    With ``include_local=True``, CORRECTNESS_LOCAL_r{N}.json artifacts
    (the checked-in full-registry runs of ``tools/oracle_check.py
    --json``) fold in as secondary evidence — use that view for
    freshness reporting. The coverage rotation deliberately stays on
    driver evidence only, so the driver's 50-query window keeps
    re-confirming the least-recently DRIVER-verified queries instead of
    trusting the repo's own local runs."""
    green: dict[str, int] = {}
    rows_only: dict[str, int] = {}
    patterns = ["CORRECTNESS_r*.json"]
    if include_local:
        patterns.append("CORRECTNESS_LOCAL_r*.json")
    paths = [p for pat in patterns for p in glob.glob(os.path.join(_HERE, pat))]
    for path in paths:
        m = re.search(r"CORRECTNESS(?:_LOCAL)?_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                results = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in results.items():
            if bool(row.get("hash_match")) and rnd > green.get(name, -1):
                green[name] = rnd
            if row.get("err") == "no_oracle" and rnd > rows_only.get(name, -1):
                rows_only[name] = rnd
    return green, rows_only


def _last_checked_round() -> dict[str, int]:
    """Back-compat view: latest round with any evidence (green hash row,
    or rows-only record)."""
    green, rows_only = _evidence_rounds()
    merged = dict(rows_only)
    for name, rnd in green.items():
        merged[name] = max(merged.get(name, -1), rnd)
    return merged


# Queries whose Spark implementation or DuckDB oracle changed in the
# previous round AFTER their latest driver hash-green row: they jump to
# the absolute front of the driver window so the changed semantics get
# driver-recorded cross-engine evidence, not just the local full-gate
# artifact. Clear an entry once the driver round lands green
# (tests/test_entry_rotation.py checks each name is registered+oracled).
_REVERIFY_FIRST: tuple[str, ...] = (
    "domain_quota_cap",  # r12: per-host -> PSL eTLD+1, both sides rewritten
    "spearman_trend_per_type",  # r12: int64 -> DECIMAL(38,0) moment chain
)


def _rotated(names: list[str], oracled: frozenset[str]) -> list[str]:
    """Deterministic coverage rotation for the driver's first-50 correctness
    window: oracled queries that never earned a green HASH row come first
    (a query whose oracle is newer than its last rows-only record counts
    as never-checked — the oracle hasn't been exercised), then everything
    else oldest-evidence-first, so the window slack re-verifies the
    least-recently-checked queries each round. Ties keep registration
    order. The library itself stays order-neutral (``all_queries`` is
    registration-ordered); rotation is evaluation-driver policy and lives
    only here."""
    green, rows_only = _evidence_rounds()
    index = {n: i for i, n in enumerate(names)}

    def key(n: str) -> tuple[int, int, int, int]:
        if n in oracled:
            evidence = green.get(n)
        else:
            evidence = rows_only.get(n)
        never = 0 if evidence is None else 1
        pinned = 0 if n in _REVERIFY_FIRST else 1
        return (pinned, never, evidence if evidence is not None else -1, index[n])

    return sorted(names, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full medallion chain
    (bronze flatten -> silver dedup -> gold filtered aggregation) as one
    Catalyst plan — the reference's relational core (SURVEY §3)."""
    q = all_queries()["medallion_end_to_end"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star
    extensions). Each callable takes (spark, sf_dir) -> DataFrame.
    Ordered by the coverage rotation (see ``_rotated``)."""
    qs = all_queries()
    order = _rotated(list(qs), frozenset(all_oracles()))
    return {n: qs[n] for n in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key; keys absent here are
    non-SQL-expressible (driver records a rows-only check)."""
    oracles = all_oracles()
    order = _rotated(list(all_queries()), frozenset(oracles))
    return {n: oracles[n] for n in order if n in oracles}
