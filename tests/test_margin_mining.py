"""Margin-based neighbor mining (queries/similarity.py::
margin_mining_knn): a NumPy replica pins the exact margins on a planted
geometry, the genuine near-duplicate is accepted, and the hub match —
whose raw cosine would pass any plain threshold — scores a visibly
smaller margin (the hubness suppression the ratio criterion exists
for)."""

from __future__ import annotations

import numpy as np

from databricks_end_to_end_streaming_spark.queries.similarity import (
    MARGIN_K,
    MARGIN_THRESHOLD,
    margin_mining_knn,
)

D = 8


def _planted():
    rng = np.random.default_rng(5)
    vecs: dict[int, np.ndarray] = {}

    def unit(v):
        return v / np.linalg.norm(v)

    # queries: vec_id % 10 == 0
    for qid in (0, 10, 20, 30):
        vecs[qid] = unit(rng.normal(size=D))
    # candidate 1: near-duplicate of query 0
    vecs[1] = unit(vecs[0] + 0.05 * rng.normal(size=D))
    # candidate 2: hub — the normalized mean of ALL queries (closest
    # thing to every query that isn't a plant)
    vecs[2] = unit(sum(vecs[q] for q in (0, 10, 20, 30)))
    # background candidates
    for cid in (3, 4, 5, 6, 7, 8):
        vecs[cid] = unit(rng.normal(size=D))
    return vecs


def _numpy_margins(vecs):
    qs = sorted(i for i in vecs if i % 10 == 0)
    cs = sorted(i for i in vecs if i % 10 != 0)
    cos = {
        (q, c): float(np.dot(vecs[q], vecs[c])) for q in qs for c in cs
    }

    def hood(pairs, k=MARGIN_K):
        top = sorted(pairs, reverse=True)[:k]
        return sum(top) / k

    out = {}
    for q in qs:
        best_c = max(cs, key=lambda c: (cos[(q, c)], -c))
        aq = hood([cos[(q, c)] for c in cs])
        ac = hood([cos[(p, best_c)] for p in qs])
        out[q] = (best_c, round(cos[(q, best_c)] / ((aq + ac) / 2), 6))
    return out


def test_margin_mining_matches_numpy_and_suppresses_hub(spark, workdir):
    vecs = _planted()
    rows = [
        (int(i), [float(x) for x in v], 0) for i, v in sorted(vecs.items())
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{workdir}/embeddings.parquet")

    got = {
        r.query_id: (r.match_id, r.margin, r.accepted)
        for r in margin_mining_knn(spark, str(workdir)).collect()
    }
    want = _numpy_margins(vecs)
    assert set(got) == set(want)
    for q, (match, margin) in want.items():
        g_match, g_margin, _ = got[q]
        assert g_match == match
        # float32 storage + double chains: replica agrees to ~1e-5
        assert abs(g_margin - margin) < 1e-4
    # query 0's match is the planted near-dup, accepted
    assert got[0][0] == 1 and got[0][2] == 1
    assert got[0][1] >= MARGIN_THRESHOLD
    # at least one other query's best match is the hub, with a margin
    # clearly below the near-dup's (hubness suppression)
    hub_margins = [m for q, (mid, m, _) in got.items() if mid == 2]
    assert hub_margins
    assert all(m < got[0][1] for m in hub_margins)
