"""Product quantization (operators/pq.py): code validity/determinism,
reconstruction-error behavior, and ADC search recall on planted twins."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)

DIM = 64


def emb_df(spark, n=200, seed=7, twins=()):
    rs = np.random.RandomState(seed)
    vecs = rs.standard_normal((n, DIM)).astype(np.float32)
    for a, b in twins:
        vecs[b] = vecs[a]
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype(np.float64),
    )


def test_pq_codes_valid_and_deterministic(spark):
    df, _ = emb_df(spark)
    books = train_pq_codebooks(df, dim=DIM)
    assert books.shape == (8, 16, 8)
    coded = pq_encode(df, books)
    rows1 = {r["vec_id"]: (list(r["codes"]), r["recon_err"]) for r in coded.collect()}
    rows2 = {r["vec_id"]: (list(r["codes"]), r["recon_err"]) for r in coded.collect()}
    assert rows1 == rows2  # deterministic end to end
    for codes, err in rows1.values():
        assert len(codes) == 8
        assert all(0 <= c < 16 for c in codes)
        assert err >= 0.0


def test_pq_reconstruction_beats_coarser_codebook(spark):
    df, vecs = emb_df(spark)
    fine = train_pq_codebooks(df, k=16, dim=DIM)
    coarse = train_pq_codebooks(df, k=2, dim=DIM)
    err_fine = (
        pq_encode(df, fine).agg(F.avg("recon_err")).collect()[0][0]
    )
    err_coarse = (
        pq_encode(df, coarse).agg(F.avg("recon_err")).collect()[0][0]
    )
    assert err_fine < err_coarse
    # and quantization must capture most of the signal energy
    avg_norm2 = float((vecs**2).sum(axis=1).mean())
    assert err_fine < avg_norm2


def test_pq_adc_finds_planted_twin(spark):
    # vec 150 is an exact copy of query vec 3: identical codes, so its
    # ADC score equals the query's own reconstruction similarity — it
    # must surface at the very top among 200 random candidates.
    df, _ = emb_df(spark, twins=[(3, 150)])
    books = train_pq_codebooks(df, dim=DIM)
    coded = pq_encode(df, books).select("vec_id", "codes")
    queries = df.where(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    top = pq_adc_topk(coded, queries, books, k=3).collect()
    ranked = [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert 150 in ranked[:3]
    assert ranked[0] == 150  # identical vector wins outright


def test_pq_adc_ranks_by_cosine_not_inner_product(spark):
    """A huge-norm distractor at a wide angle must NOT outrank the
    query's own twin: under raw inner product the distractor would win
    by an order of magnitude; under cosine the twin wins."""
    rs = np.random.RandomState(11)
    vecs = rs.standard_normal((200, DIM)).astype(np.float32)
    q = vecs[3]
    vecs[150] = q  # exact twin (cosine 1)
    # distractor: cosine ~0.5 to q but norm 60 -> inner product ~30,
    # dwarfing the twin's ~|q|^2. (Cosine 0.5 stays clearly below the
    # ~0.7 that PQ quantization noise leaves measurable for the twin;
    # an outlier this large gets near-dedicated centroids, so its own
    # cosine estimate is nearly exact.)
    w = rs.standard_normal(DIM)
    w -= (w @ q) / (q @ q) * q  # orthogonal component
    w = 0.5 * q / np.linalg.norm(q) + np.sqrt(0.75) * w / np.linalg.norm(w)
    vecs[151] = (60.0 * w / np.linalg.norm(w)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = train_pq_codebooks(df, dim=DIM)
    coded = pq_encode(df, books).select("vec_id", "codes")
    queries = df.where(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    top = pq_adc_topk(coded, queries, books, k=2).collect()
    ranked = [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ranked[0] == 150  # twin first — inner-product ranking puts 151 first


def test_pq_train_empty_input_raises(spark):
    import pytest

    from databricks_end_to_end_streaming_spark.operators.pq import train_pq_codebooks

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no rows"):
        train_pq_codebooks(empty, dim=64, m=8, k=16)


def test_ivfpq_planted_twin_and_candidate_bounding(spark):
    """IVF-PQ composition: a planted exact twin lands in the same IVF
    cell (identical vectors quantize identically) and PQ-ADC ranks it
    first; and the scored candidate set is genuinely BOUNDED — each
    query scores only its probed cells' lists, strictly fewer than the
    whole corpus (what distinguishes IVFPQ from pq_adc_topk's full
    scan)."""
    from databricks_end_to_end_streaming_spark.operators.pq import (
        ivfpq_topk,
    )
    from databricks_end_to_end_streaming_spark.operators.similarity import (
        ivf_assign,
        train_ivf_centroids,
    )

    df, vecs = emb_df(spark, twins=((0, 150), (3, 160)))
    cents = train_ivf_centroids(df, n_centroids=8)
    books = train_pq_codebooks(df, dim=DIM)
    queries = df.where(F.col("vec_id").isin(0, 3)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = ivfpq_topk(df, queries, cents, books, k=5, nprobe=2)
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in out.where(F.col("rank") == 1).collect()
    }
    assert top1 == {0: 150, 3: 160}

    # candidate bounding: probed lists cover < the whole corpus
    lists = ivf_assign(df, cents, "embedding", nprobe=1).select(
        "vec_id", F.col("cluster_ids")[0].alias("cell")
    )
    sizes = {r["cell"]: r["cnt"] for r in
             lists.groupBy("cell").agg(F.count("*").alias("cnt")).collect()}
    probed = ivf_assign(queries, cents, "qv", nprobe=2).collect()
    for r in probed:
        n_cand = sum(sizes.get(c, 0) for c in r["cluster_ids"])
        assert n_cand < sum(sizes.values())


def clustered_emb_df(spark, n=160, n_clusters=8, seed=11):
    """Vectors with real cluster structure (tight gaussian blobs) —
    isotropic random data has near-zero cosine signal, so PQ noise
    swamps it and recall means nothing there; blobs are the regime ANN
    indexes are built for."""
    rs = np.random.RandomState(seed)
    centers = rs.standard_normal((n_clusters, DIM)) * 3.0
    vecs = np.stack(
        [
            centers[i % n_clusters] + rs.standard_normal(DIM) * 0.3
            for i in range(n)
        ]
    ).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype(np.float64),
    )


def test_ivfpq_recall_floor_vs_bruteforce(spark):
    """On clustered data IVFPQ@nprobe=4 must (a) draw every reported
    neighbor from the query's TRUE cluster — the guarantee the coarse
    quantizer provides — and (b) beat a 0.5 exact-top-5 recall floor.
    Within a tight blob all members share PQ codes (ADC ties), so exact
    top-5 recall has a luck component; the floor reflects that, while
    the cluster-membership check is deterministic."""
    from databricks_end_to_end_streaming_spark.operators.pq import (
        ivfpq_topk,
    )
    from databricks_end_to_end_streaming_spark.operators.similarity import (
        train_ivf_centroids,
    )

    df, vecs = clustered_emb_df(spark)
    cents = train_ivf_centroids(df, n_centroids=8)
    books = train_pq_codebooks(df, dim=DIM)
    qids = [0, 1, 2, 3]
    queries = df.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = ivfpq_topk(df, queries, cents, books, k=5, nprobe=4)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    norm = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
    )
    sims = norm @ norm.T
    hits = total = 0
    for q in qids:
        # (a) every neighbor from the true cluster (i % 8 layout)
        assert all(n % 8 == q % 8 for n in by_q[q]), (q, by_q[q])
        s = sims[q].copy()
        s[q] = -2
        exact = set(np.argsort(-s)[:5].tolist())
        hits += len(exact & by_q.get(q, set()))
        total += 5
    assert hits / total >= 0.5, (hits, total)
