"""MMR diversity re-ranking (operators/similarity.py::mmr_rerank and
mmr_rerank_exact).

The twins here are INDEPENDENT pure-Python reimplementations of
Carbonell & Goldstein's greedy loop — plain lists and math, no NumPy.
The float operator (mmr_rerank) has no SQL oracle; the SQ8-exact
variant (mmr_rerank_exact, the registered query's engine since r11) is
ALSO hash-oracled by a DuckDB unrolled-CTE replay, and its twin below
asserts bit-for-bit float equality, the property the replay relies
on."""

from __future__ import annotations

import math
import os

import pytest

from databricks_end_to_end_streaming_spark.operators.similarity import (
    mmr_rerank,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def mmr_reference(rows, k, lam):
    """Independent greedy MMR: rows = [(id, rel, vec)], ascending-id
    tie-break, cosine over unit vectors."""

    def unit(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    rows = sorted(rows)
    units = {i: unit(v) for i, _, v in rows}
    taken, out, max_sim = set(), [], {i: 0.0 for i, _, _ in rows}
    for rank in range(1, min(k, len(rows)) + 1):
        best, best_score = None, -math.inf
        for i, rel, _ in rows:  # ascending id -> first max wins
            if i in taken:
                continue
            s = lam * rel - (1.0 - lam) * max_sim[i]
            if s > best_score:
                best, best_score = i, s
        taken.add(best)
        rel_best = next(r for i, r, _ in rows if i == best)
        out.append((best, rank, rel_best, best_score))
        ub = units[best]
        for i, _, _ in rows:
            if i not in taken:
                sim = sum(a * b for a, b in zip(units[i], ub))
                max_sim[i] = max(max_sim[i], sim)
    return out


def _run(spark, rows, k=5, lam=0.7):
    df = spark.createDataFrame(
        rows, "doc_id long, cs double, embedding array<double>"
    )
    got = [
        (r.doc_id, r.mmr_rank, r.relevance, r.mmr_score)
        for r in mmr_rerank(df, k=k, lam=lam).collect()
    ]
    return sorted(got, key=lambda t: t[1])


def test_planted_near_duplicate_is_demoted(spark):
    # doc 2 is a near-copy of rank-1 doc 1; doc 3 is orthogonal with
    # slightly lower relevance — MMR must pick 3 at rank 2, not 2
    rows = [
        (1, 0.99, [1.0, 0.0, 0.0]),
        (2, 0.98, [0.999, 0.001, 0.0]),
        (3, 0.90, [0.0, 1.0, 0.0]),
        (4, 0.10, [0.0, 0.0, 1.0]),
    ]
    got = _run(spark, rows, k=3)
    assert [g[0] for g in got] == [1, 3, 2]


def test_pure_relevance_when_lambda_one(spark):
    rows = [(i, 1.0 - i / 10.0, [float(i), 1.0, 0.0]) for i in range(6)]
    got = _run(spark, rows, k=4, lam=1.0)
    assert [g[0] for g in got] == [0, 1, 2, 3]


def test_agrees_with_independent_reference(spark):
    import random

    rng = random.Random(7)
    rows = [
        (
            i,
            round(rng.uniform(0, 1), 6),
            [round(rng.gauss(0, 1), 6) for _ in range(8)],
        )
        for i in range(30)
    ]
    got = _run(spark, rows, k=10, lam=0.7)
    want = mmr_reference(rows, k=10, lam=0.7)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == w[1]
        assert abs(g[2] - w[2]) < 1e-12
        assert abs(g[3] - w[3]) < 1e-9  # float64 vs fsum-free python


def test_tie_breaks_on_smaller_id(spark):
    rows = [
        (7, 0.5, [1.0, 0.0]),
        (3, 0.5, [0.0, 1.0]),
    ]
    got = _run(spark, rows, k=1)
    assert got[0][0] == 3


def test_k_larger_than_candidates(spark):
    rows = [(1, 0.9, [1.0, 0.0]), (2, 0.8, [0.0, 1.0])]
    got = _run(spark, rows, k=10)
    assert len(got) == 2 and [g[1] for g in got] == [1, 2]


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_registered_query_shape(spark):
    from databricks_end_to_end_streaming_spark.queries.similarity import (
        MMR_K,
        mmr_diverse_topk,
    )

    rows = mmr_diverse_topk(spark, SF_DIR).collect()
    assert len(rows) == MMR_K
    assert [r.mmr_rank for r in rows] == list(range(1, MMR_K + 1))
    assert len({r.doc_id for r in rows}) == MMR_K
    # greedy invariant: rank-1 is the max-relevance candidate
    assert rows[0].relevance == max(r.relevance for r in rows)


def test_empty_candidates_yield_empty_result(spark):
    df = spark.createDataFrame(
        [], "doc_id long, cs double, embedding array<double>"
    )
    assert mmr_rerank(df, k=3).collect() == []


def mmr_exact_reference(rows, k, lam, oml):
    """Independent greedy over (id, cs, dq, nd) with exact-int dots and
    the canonical smaller-id-first division order — plain Python (ints
    + floats), no NumPy."""
    rows = sorted(rows)
    import math

    def sim(a, b):
        # a, b are (id, cs, dq, nd) with a[0] < b[0]
        dot = sum(x * y for x, y in zip(a[2], b[2]))
        return (float(dot) / math.sqrt(float(a[3]))) / math.sqrt(float(b[3]))

    taken, out = set(), []
    max_sim = {r[0]: 0.0 for r in rows}
    by_id = {r[0]: r for r in rows}
    for rank in range(1, min(k, len(rows)) + 1):
        best, best_score = None, -math.inf
        for r in rows:
            if r[0] in taken:
                continue
            s = lam * r[1] - oml * max_sim[r[0]]
            if s > best_score:
                best, best_score = r[0], s
        taken.add(best)
        out.append((best, rank, by_id[best][1], best_score))
        for r in rows:
            if r[0] not in taken:
                lo, hi = (r, by_id[best]) if r[0] < best else (by_id[best], r)
                max_sim[r[0]] = max(max_sim[r[0]], sim(lo, hi))
    return out


def test_exact_variant_agrees_bit_for_bit(spark):
    """mmr_rerank_exact vs the independent pure-Python greedy: EXACT
    equality (==, not approx) on every emitted float — the bit-identity
    the DuckDB oracle replay relies on."""
    import random

    from databricks_end_to_end_streaming_spark.operators.similarity import (
        mmr_rerank_exact,
    )

    rng = random.Random(11)
    rows = [
        (
            i,
            round(rng.uniform(0, 1), 6),
            [rng.randrange(-(2**20), 2**20) for _ in range(16)],
        )
        for i in range(30)
    ]
    rows = [(i, cs, dq, sum(x * x for x in dq)) for i, cs, dq in rows]
    df = spark.createDataFrame(
        rows, "doc_id long, cs double, dq array<long>, nd long"
    )
    got = sorted(
        (
            (r.doc_id, r.mmr_rank, r.relevance, r.mmr_score)
            for r in mmr_rerank_exact(
                df, k=10, lam=0.7, one_minus_lam=0.3
            ).collect()
        ),
        key=lambda t: t[1],
    )
    want = mmr_exact_reference(rows, k=10, lam=0.7, oml=0.3)
    assert got == want  # exact, including every float bit


def test_non_integral_id_rejected_at_plan_time(spark):
    df = spark.createDataFrame(
        [("u1", 0.5, [1.0])], "doc_id string, cs double, embedding array<double>"
    )
    with pytest.raises(TypeError, match="integral"):
        mmr_rerank(df, k=1)
