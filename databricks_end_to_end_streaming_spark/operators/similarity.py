"""Approximate nearest neighbors: random-hyperplane LSH bucketing
(Charikar 2002 SimHash-for-cosine; public literature).

The brute-force kNN in queries/similarity.py is exact but O(|Q| x |N|).
This is the 100 TB path: hash every vector to a small bucket id by the
sign pattern of dot products with fixed random hyperplanes; only vectors
sharing a bucket (in at least one of several independent tables) are
scored. Candidate generation is a shuffle on (table, bucket) — tiny rows
— and scoring touches a small candidate set per query.

The hyperplanes are derived from a seeded NumPy RandomState captured in
the UDF closure — identical on driver and every executor, no broadcast
needed (same reasoning as the schema-string plan literals, SURVEY §4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf

from ..pin import pin
from ..queries.similarity import cosine

DEFAULT_N_BITS = 12
DEFAULT_N_TABLES = 4


def _planes(dim: int, n_bits: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_tables, n_bits, dim))


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = DEFAULT_N_BITS,
    n_tables: int = DEFAULT_N_TABLES,
    seed: int = 42,
) -> DataFrame:
    """Append `buckets` array<long>: one sign-pattern bucket id per table.
    Vectorized over Arrow batches: a (batch x dim) @ (dim x bits) matmul
    per table."""
    planes = _planes(dim, n_bits, n_tables, seed)

    @pandas_udf("array<long>")
    def bucketize(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)  # (n, dim)
        out = np.empty((mat.shape[0], planes.shape[0]), dtype=np.int64)
        weights = 1 << np.arange(planes.shape[1], dtype=np.int64)
        for t in range(planes.shape[0]):
            bits = (mat @ planes[t].T) > 0  # (n, bits)
            out[:, t] = bits @ weights
        return pd.Series(list(out))

    return df.withColumn("buckets", bucketize(F.col(vec_col)))


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd's k-means on a deterministic sample (ordered by id) collected
    to the driver — the standard IVF training recipe: the coarse
    quantizer trains on a sample, assignment runs distributed. Returns
    (n_centroids, dim) float64 centroids, L2-normalized."""
    rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rs = np.random.RandomState(seed)
    cents = x[rs.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    nprobe: int = 1,
    out_col: str = "cluster_ids",
) -> DataFrame:
    """Append the nprobe nearest centroid ids (array<int>) per vector —
    one Arrow-batched matmul per batch; centroids ride in the closure."""

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ centroids.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return df.withColumn(out_col, assign(F.col(vec_col)))


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """IVF search: corpus vectors live in their single nearest cluster
    (the inverted lists); each query probes its nprobe nearest clusters
    and scores only those lists. Returns (query_id, neighbor_id, rank,
    score)."""
    lists = ivf_assign(emb, centroids, vec_col, nprobe=1).select(
        id_col, vec_col, F.col("cluster_ids")[0].alias("cluster_id")
    )
    probes = ivf_assign(queries, centroids, query_vec_col, nprobe=nprobe).select(
        query_id_col,
        query_vec_col,
        F.explode("cluster_ids").alias("cluster_id"),
    )
    cand = probes.join(lists, "cluster_id").where(
        F.col(query_id_col) != F.col(id_col)
    )
    scored = cand.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(query_vec_col, vec_col).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )


def lsh_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_bits: int = 10,
    n_tables: int = 6,
) -> DataFrame:
    """Vector near-duplicate pairs (cosine > threshold) over the full
    corpus without the O(n^2) pair space: bucket-join candidates as BARE
    ID PAIRS (the distinct shuffles 16-byte rows, not embeddings), then
    join vectors back for exact scoring of the small candidate set."""
    bucketed = hyperplane_buckets(emb, vec_col, dim, n_bits, n_tables).select(
        id_col, F.posexplode("buckets").alias("table_id", "bucket")
    )
    a = bucketed.select(F.col(id_col).alias("id_a"), "table_id", "bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"), "table_id", "bucket")
    cand = (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine("va", "vb").alias("score"))
        .where(F.col("score") > threshold)
    )


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    dim: int = 64,
    n_bits: int = DEFAULT_N_BITS,
    n_tables: int = DEFAULT_N_TABLES,
) -> DataFrame:
    """Approximate top-k neighbors per query: bucket-join candidates
    (any shared table bucket), exact cosine on candidates, window top-k.
    Returns (query_id, neighbor_id, rank, score)."""
    cand_n = (
        hyperplane_buckets(emb, vec_col, dim, n_bits, n_tables)
        .select(
            id_col,
            vec_col,
            F.posexplode("buckets").alias("table_id", "bucket"),
        )
    )
    cand_q = (
        hyperplane_buckets(
            queries.withColumnRenamed(query_vec_col, "_qv"), "_qv", dim, n_bits, n_tables
        )
        .select(
            query_id_col,
            F.col("_qv").alias(query_vec_col),
            F.posexplode("buckets").alias("table_id", "bucket"),
        )
    )
    pairs = (
        cand_q.join(cand_n, ["table_id", "bucket"])
        .where(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, query_vec_col, id_col, vec_col)
        .distinct()  # a pair may collide in several tables
    )
    scored = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(query_vec_col, vec_col).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_centroids: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public paper): cluster embeddings with the IVF
    coarse quantizer, score cosine only WITHIN each cluster, and drop
    every vector that has a lower-id cluster-mate above the threshold
    (the min-id member represents each semantic-dup group; the paper
    keeps the member farthest from the centroid — a policy knob, the
    pair mining is identical). Returns the kept rows of ``emb`` with all
    original columns.

    Shape at 100 TB: this is the paper's own complexity argument —
    k-means bounds the pair space to sum(|cluster|^2) ~ n^2/k instead of
    n^2. The self-join shuffles on the cluster key (AQE splits skewed
    clusters); cosine is JVM-side HOFs; the drop set joins back as a
    broadcast-able anti-join. Centroid training collects only a fixed
    sample (train_ivf_centroids); assignment is one Arrow-batched matmul
    per batch. n_centroids defaults to ceil(n/256) (>= 16): average
    cluster size stays ~constant as the corpus grows, so total pair work
    is ~256·n — linear, not quadratic (the paper trains 50k clusters on
    its web-scale corpus for the same reason)."""
    if centroids is None and n_centroids is None:
        n = emb.count()
        n_centroids = max(16, -(-n // 256))
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(
            emb,
            n_centroids,
            vec_col,
            id_col,
            sample_size=max(4096, 32 * n_centroids),
        )
    )
    # r13 (guide §4.1): the self-join's two sides are different
    # projections of this relation, so unpinned each side re-runs the
    # whole Arrow-batched assignment UDF (two full Python passes over
    # the corpus and no exchange reuse — the projections differ). Pin
    # the (id, cluster, vec) relation once; it is corpus-row-sized with
    # no payload beyond the vector the join needs anyway.
    assigned = pin(
        ivf_assign(
            emb.select(id_col, vec_col), cents, vec_col, nprobe=1
        ).select(
            F.col(id_col),
            F.col("cluster_ids")[0].alias("cluster"),
            F.col(vec_col),
        )
    )
    left = assigned.select(
        F.col(id_col).alias("id_a"), "cluster", F.col(vec_col).alias("_va")
    )
    right = assigned.select(
        F.col(id_col).alias("id_b"), "cluster", F.col(vec_col).alias("_vb")
    )
    dropped = (
        left.join(right, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine("_va", "_vb") >= F.lit(threshold))
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return emb.join(dropped, id_col, "left_anti")


def mmr_rerank(
    cands: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "doc_id",
    rel_col: str = "cs",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily select ``k`` of the candidates maximizing
    ``lam * relevance - (1 - lam) * max_similarity_to_already_selected``
    — the standard diversity pass over a retrieval candidate list.

    CONTRACT: ``cands`` is a BOUNDED leg-depth relation (the survivors
    of a top-N cut such as ``sem_leg``/``bm25_score_from``), never the
    corpus — MMR is inherently sequential-greedy, so the whole set is
    re-ranked inside ONE Arrow batch on ONE executor (coalesce(1) +
    mapInPandas). At 100 TB the candidate generation upstream is what
    scales; this stage is O(k * N * dim) on <= N leg-depth rows.

    Determinism: relevance ties break on ascending id; similarities are
    float64 NumPy dot products over a fixed candidate order, and the
    greedy argmax scans ids in ascending order so equal MMR scores pick
    the smaller id. Returns (id, mmr_rank, relevance, mmr_score); the
    id column must be integral (it is emitted as long — validated up
    front so a string-keyed relation fails at plan time, not inside an
    executor)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_field = cands.schema[id_col].dataType
    if not isinstance(id_field, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"mmr_rerank requires an integral {id_col!r} column "
            f"(emitted as long); got {id_field.simpleString()}"
        )
    out_schema = (
        f"{id_col} long, mmr_rank int, relevance double, mmr_score double"
    )

    def _greedy(batches):
        parts = [b for b in batches if len(b)]
        if not parts:  # empty candidate relation: empty result, no crash
            return
        rows = pd.concat(parts, ignore_index=True)
        rows = rows.sort_values(id_col, kind="mergesort").reset_index(
            drop=True
        )
        ids = rows[id_col].to_numpy()
        rel = rows[rel_col].to_numpy(dtype=np.float64)
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in rows[vec_col]]
        )
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms[:, None]
        n = len(ids)
        selected: list[int] = []
        max_sim = np.zeros(n, dtype=np.float64)
        taken = np.zeros(n, dtype=bool)
        out = []
        for rank in range(1, min(k, n) + 1):
            score = lam * rel - (1.0 - lam) * max_sim
            score[taken] = -np.inf
            # ids are ascending, argmax returns the FIRST maximum ->
            # deterministic smaller-id tie-break
            i = int(np.argmax(score))
            taken[i] = True
            selected.append(i)
            out.append((int(ids[i]), rank, float(rel[i]), float(score[i])))
            sims = unit @ unit[i]
            max_sim = np.maximum(max_sim, sims)
            max_sim[taken] = 0.0  # never re-selected; keep scores finite
        yield pd.DataFrame(
            out, columns=[id_col, "mmr_rank", "relevance", "mmr_score"]
        )

    return cands.select(id_col, rel_col, vec_col).coalesce(1).mapInPandas(
        _greedy, schema=out_schema
    )


def mmr_rerank_exact(
    cands: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    one_minus_lam: float = 0.3,
) -> DataFrame:
    """MMR re-ranking whose every greedy comparison is BIT-IDENTICAL
    across engines, so the whole selection replays in DuckDB as k
    unrolled argmax CTE steps (hash-green — unlike the float
    ``mmr_rerank`` above, which stays as the general-purpose operator).

    Input contract: (doc_id long, cs double, dq array<long>, nd long)
    — ``cs`` a round-6 relevance (sem_leg) and ``dq``/``nd`` the
    SQ8-DEQUANTIZED int64 coordinates + int64 squared norm
    (queries/similarity.py::sq8_dqn). Pairwise similarity is then
    sim = (dot / sqrt(nd_lo)) / sqrt(nd_hi) — an exact int64 dot cast
    to double (|dq| <= ~2^20, dot <= 64 * 2^40 ~ 7e13 < 2^53, so the
    cast is exact and the int64 matmul cannot wrap) followed by two
    IEEE-correctly-rounded divisions, ALWAYS dividing by the
    smaller-id side's sqrt first so Spark and the SQL replay round
    identically (float division is not order-free). The greedy score
    is (lam * cs) - (one_minus_lam * max_sim) in that exact
    association order; ``one_minus_lam`` is an explicit literal
    because 1.0 - 0.7 != 0.3 in float64. Ties break on ascending
    doc_id in both engines.

    Same boundedness contract as ``mmr_rerank``: candidates are a
    leg-depth relation, re-ranked inside ONE Arrow batch."""
    out_schema = "doc_id long, mmr_rank int, relevance double, mmr_score double"

    def _greedy(batches):
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True)
        rows = rows.sort_values("doc_id", kind="mergesort").reset_index(
            drop=True
        )
        ids = rows["doc_id"].to_numpy()
        rel = rows["cs"].to_numpy(dtype=np.float64)
        vecs = np.stack(
            [np.asarray(v, dtype=np.int64) for v in rows["dq"]]
        )
        nd = rows["nd"].to_numpy(dtype=np.int64)
        dots = vecs @ vecs.T  # exact int64 (bound in the docstring)
        s = np.sqrt(nd.astype(np.float64))
        n = len(ids)
        idx = np.arange(n)
        lo = np.minimum.outer(idx, idx)  # rows sorted by id: index
        hi = np.maximum.outer(idx, idx)  # order IS id order
        sim = (dots.astype(np.float64) / s[lo]) / s[hi]
        taken = np.zeros(n, dtype=bool)
        max_sim = np.zeros(n, dtype=np.float64)
        out = []
        for rank in range(1, min(k, n) + 1):
            score = lam * rel - one_minus_lam * max_sim
            score[taken] = -np.inf
            i = int(np.argmax(score))  # first max -> smaller id on ties
            taken[i] = True
            out.append((int(ids[i]), rank, float(rel[i]), float(score[i])))
            max_sim = np.maximum(max_sim, sim[:, i])
            max_sim[taken] = 0.0  # never re-selected; keep scores finite
        yield pd.DataFrame(
            out, columns=["doc_id", "mmr_rank", "relevance", "mmr_score"]
        )

    return cands.select("doc_id", "cs", "dq", "nd").coalesce(1).mapInPandas(
        _greedy, schema=out_schema
    )


# ------------------------------------------------- multiprobe LSH

MP_SCALE = 1 << 20  # fixed-point margin quantization (the sq8 discipline)


def quantized_planes(
    dim: int, n_bits: int, n_tables: int, seed: int = 42
) -> np.ndarray:
    """The seeded hyperplanes floor-quantized to int64 at 2^20: margins
    against floor-quantized vectors become EXACT integers, so bucket
    signs AND the probe order (ascending |margin|) are deterministic
    and cross-engine replayable — float margins would make the probe
    ORDER a 1-ulp coin flip between NumPy's blocked matmul and a SQL
    engine's sequential dot."""
    return np.floor(_planes(dim, n_bits, n_tables, seed) * MP_SCALE).astype(
        np.int64
    )


def multiprobe_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    n_probes: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Append ``probes`` array<struct<table_id,bucket>>: per table, the
    sign-pattern home bucket plus the ``n_probes - 1`` single-bit flips
    with the smallest exact |margin| (Lv et al. 2007 multi-probe LSH —
    the perturbations most likely to hold a near neighbor), ties by bit
    index. With n_probes=1 this is plain bucketing on the quantized
    margins (the corpus side). Exactness: vector and planes both
    floor-quantize at 2^20, so each margin is an exact int64 (|sum| <=
    64 * 5 * 2^40 ~ 2^49) and the probe sequence is deterministic."""
    qp = quantized_planes(dim, n_bits, n_tables, seed)

    @pandas_udf("array<struct<table_id:int,bucket:bigint>>")
    def probeize(vecs: pd.Series) -> pd.Series:
        mat = np.floor(
            np.asarray(vecs.tolist(), dtype=np.float64) * MP_SCALE
        ).astype(np.int64)
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        rows = []
        for i in range(mat.shape[0]):
            out = []
            for t in range(n_tables):
                m = qp[t] @ mat[i]  # (n_bits,) exact int64
                bucket = int(((m > 0) * weights).sum())
                out.append({"table_id": t, "bucket": bucket})
                if n_probes > 1:
                    order = sorted(
                        range(n_bits), key=lambda b: (abs(int(m[b])), b)
                    )
                    for b in order[: n_probes - 1]:
                        out.append(
                            {"table_id": t, "bucket": bucket ^ (1 << b)}
                        )
            rows.append(out)
        return pd.Series(rows)

    return df.withColumn("probes", probeize(F.col(vec_col)))


def ann_multiprobe_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    n_probes: int = 3,
) -> DataFrame:
    """Multi-probe approximate top-k: the corpus hashes ONCE per table
    (home bucket only); each query probes its home bucket plus the
    lowest-|margin| single-bit flips, recovering the recall extra
    tables would buy WITHOUT replicating the corpus index — the
    standard memory/recall trade (probing is query-side-only work).
    Exact cosine re-rank on the candidate union, window top-k."""
    corpus = multiprobe_buckets(
        emb, vec_col, dim, n_bits, n_tables, 1
    ).select(
        id_col,
        vec_col,
        F.explode("probes").alias("p"),
    ).select(id_col, vec_col, "p.table_id", "p.bucket")
    probes = multiprobe_buckets(
        queries.withColumnRenamed(query_vec_col, "_qv"),
        "_qv",
        dim,
        n_bits,
        n_tables,
        n_probes,
    ).select(
        query_id_col,
        F.col("_qv").alias(query_vec_col),
        F.explode("probes").alias("p"),
    ).select(query_id_col, query_vec_col, "p.table_id", "p.bucket")
    pairs = (
        F.broadcast(probes)
        .join(corpus, ["table_id", "bucket"])
        .where(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, query_vec_col, id_col, vec_col)
        .distinct()
    )
    scored = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(query_vec_col, vec_col).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )
