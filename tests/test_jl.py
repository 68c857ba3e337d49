"""Johnson-Lindenstrauss random projection (queries/similarity.py):
exact agreement with a NumPy big-int twin, structure preservation on
planted near-twins, and the registered queries' shapes."""

from __future__ import annotations

import numpy as np

from databricks_end_to_end_streaming_spark.queries.similarity import (
    _FP_SCALE,
    _jl_signs,
    EMB_DIM,
    JL_K,
    jl_project,
    jl_recall_eval,
)

SF_DIR = "/root/testdata/sf0.001"


def _np_project(vecs: np.ndarray) -> np.ndarray:
    q = np.floor(vecs.astype(np.float64) * _FP_SCALE).astype(np.int64)
    s = np.array(_jl_signs(), dtype=np.int64)  # (EMB_DIM, JL_K)
    return q @ s


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_projection_matches_numpy_twin_exactly(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((20, EMB_DIM)).astype(np.float32)
    got = {
        r["vec_id"]: list(r["y"])
        for r in jl_project(_emb_df(spark, vecs)).collect()
    }
    # the float32->float64 cast before floor matches Spark's cast chain
    want = _np_project(np.array([list(v) for v in vecs], dtype=np.float32))
    for i in range(20):
        assert got[i] == list(want[i]), i


def test_planted_twins_stay_rank1_after_projection(spark):
    """A genuinely-near pair (vector + 1% noise copy) must remain each
    other's nearest neighbor in the projected space — the JL guarantee
    where real margins exist (the corpus-level recall gate reads low
    only because the driver embeddings are isotropic)."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((6, EMB_DIM)).astype(np.float32)
    twins = (base + 0.01 * rng.standard_normal(base.shape)).astype(
        np.float32
    )
    vecs = np.vstack([base, twins])  # twin of i is i+6
    proj = {
        r["vec_id"]: np.array(r["y"], dtype=np.float64)
        for r in jl_project(_emb_df(spark, vecs)).collect()
    }
    for i in range(6):
        sims = {
            j: float(
                proj[i] @ proj[j]
                / (np.linalg.norm(proj[i]) * np.linalg.norm(proj[j]))
            )
            for j in proj
            if j != i
        }
        assert max(sims, key=sims.get) == i + 6, (i, sims)


def test_registered_queries_shapes(spark):
    from databricks_end_to_end_streaming_spark.queries.similarity import (
        N_QUERIES,
        embedding_random_projection,
    )

    p = embedding_random_projection(spark, SF_DIR)
    assert len(p.columns) == 1 + JL_K
    r = jl_recall_eval(spark, SF_DIR).collect()
    assert len(r) == N_QUERIES
    assert all(0.0 <= row["recall"] <= 1.0 for row in r)
