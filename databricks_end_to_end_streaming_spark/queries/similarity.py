"""Similarity search over the ``embeddings`` table (north-star extension).

Brute-force cosine top-k is the correctness baseline: broadcast the query
set, score every (query, candidate) pair with built-in higher-order
functions (zip_with dot product — stays JVM-side), rank with a window.
At 100 TB the same plan holds as long as the query set is broadcastable;
for large query sets the LSH-bucketed variant (operators/similarity.py)
cuts candidates per query from |N| to a bucket.

Output is rank-only (plus ids): float summation order differs between
engines at the 1e-16 level, so ranks — stable under that noise — are the
hash-checked contract; scores are validated in pytest with a tolerance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load_table
from . import query

N_QUERIES = 8
TOP_K = 5


def cosine(a: str | F.Column, b: str | F.Column) -> F.Column:
    """Cosine similarity of two array<float> columns, computed in double
    (cast first — float accumulation drifts) via built-in HOFs."""
    ac = F.transform(a, lambda x: x.cast("double"))
    bc = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ac, bc, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm(ac) * norm(bc))


@query(
    "knn_bruteforce_cosine",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS score
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN: broadcast queries x full scan, cosine in doubles,
    window top-k. The scan side never shuffles; only TOP_K rows per query
    survive to the (tiny) window exchange."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine("qv", "embedding").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


@query(
    "embedding_label_centroid_sim",
    oracle="""
    WITH stats AS (
      SELECT label,
             count(*) AS n,
             CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) AS sum_d1,
             CAST(sum(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) AS sum_d2
      FROM embeddings GROUP BY label
    )
    SELECT label, n,
           sum_d1 / n AS centroid_d1,
           sum_d2 / n AS centroid_d2
    FROM stats
    """,
)
def embedding_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid coordinates (first two dims) — grouped vector
    aggregation. Decimal-cast sums keep the result engine-exact; floats
    at 1e-7 granularity are exactly representable in DECIMAL(20,10)."""
    emb = load_table(spark, sf_dir, "embeddings")
    d1 = F.col("embedding")[0].cast("double").cast("decimal(20,10)")
    d2 = F.col("embedding")[1].cast("double").cast("decimal(20,10)")
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.sum(d1).cast("double").alias("sum_d1"),
            F.sum(d2).cast("double").alias("sum_d2"),
        )
        .select(
            "label",
            "n",
            (F.col("sum_d1") / F.col("n")).alias("centroid_d1"),
            (F.col("sum_d2") / F.col("n")).alias("centroid_d2"),
        )
    )


@query(
    "embedding_cosine_neardup",
    # Oracle: exact all-pairs cosine (quadratic; fine for DuckDB at
    # sf0.01). Contract is id-pairs only — cosine values differ at the
    # last ulp between engines (summation order), ids don't. The driver
    # corpus has no pair above 0.95 (max off-diagonal ~0.60), so both
    # sides correctly return 0 rows; pytest plants twins to prove the
    # LSH path recovers true near-dups.
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) > 0.95
    """,
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs (cosine > 0.95) over the FULL
    corpus via hyperplane-LSH bucketing — the vector analog of text
    near-dup. Only vectors sharing a bucket in some table are scored, so
    the pair space never materializes O(n^2)."""
    from ..operators.similarity import lsh_neardup_pairs  # lazy: avoids cycle

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(emb, threshold=0.95, n_bits=10, n_tables=6)
    return pairs.select("id_a", "id_b")


@query(
    "embedding_norm_profile",
    oracle="""
    SELECT vec_id,
           label,
           CAST(len(embedding) AS INTEGER) AS dim,
           sqrt(list_reduce(
             list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             (a, b) -> a + b)) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norms + dimensionality — the sanity profile run
    before any cosine/ANN stage (catches unnormalized or truncated
    vectors). Bit-exact across engines because the fold order is the
    ARRAY's own order on both sides: each float element promotes to
    double exactly, each multiply/add is one correctly-rounded IEEE op
    in the same sequence (Spark aggregate inits at 0.0; DuckDB
    list_reduce inits at the first squared element — adding 0.0 first
    is exact, so the sequences coincide), and sqrt is correctly
    rounded. Stateless per-row projection: zero shuffles at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        F.sqrt(sq_sum).alias("l2_norm"),
    )


EMB_DIM = 64
_FP_SCALE = 1 << 20  # fixed-point quantization: exact power-of-two scaling


@query(
    "embedding_second_moment_matrix",
    oracle=f"""
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {_FP_SCALE}.0) AS BIGINT))
             AS q
      FROM embeddings
    ), n AS (
      SELECT count(*) AS n FROM q
    ), pairs AS (
      SELECT i.i AS i, j.j AS j, q.q[i.i + 1] * q.q[j.j + 1] AS prod
      FROM q,
           unnest(range(0, {EMB_DIM})) AS i(i),
           unnest(range(0, {EMB_DIM})) AS j(j)
      WHERE j.j >= i.i
    )
    SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
           CAST(sum(p.prod) AS BIGINT) AS dot_q,
           CAST(CAST(sum(p.prod) AS BIGINT) AS DOUBLE)
             / CAST(n.n AS DOUBLE) / {float(_FP_SCALE * _FP_SCALE)} AS moment
    FROM pairs p CROSS JOIN n
    GROUP BY p.i, p.j, n.n
    ORDER BY i, j
    """,
)
def embedding_second_moment_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed second-moment (un-centered Gram/covariance) matrix of
    the embedding corpus — the E[x xᵀ] input to PCA / whitening /
    covariance-shrinkage preprocessing. Upper triangle only (the matrix
    is symmetric): d(d+1)/2 = 2080 cells for d = 64.

    Exactness: embeddings quantize to fixed-point int64 at 2^20 — a
    power-of-two scale, so float->double->scaled-floor is EXACT in both
    engines — and every cell is then an exact int64 sum of products
    (order-independent), with the reported double `moment` two fixed
    IEEE divisions at the end. This is the corpus-standard "cents"
    discipline applied to linear algebra; the quantization error is the
    documented contract (bounded by 2^-20 per coordinate), which is what
    makes the matrix hash-verifiable cross-engine, unlike float sums.

    Shape at 100 TB: the per-row upper-triangle explode is O(d^2) CPU
    map-side (inherent to Gram accumulation), and the partial agg
    collapses every partition to <= 2080 cells BEFORE the single tiny
    shuffle — the wire carries cells, never rows. int64 headroom:
    |q| <= ~0.55 * 2^20, so cell sums overflow past ~3e7 rows; widen the
    product sum to DECIMAL(38,0) beyond that (ANSI fails loudly at the
    boundary rather than wrapping). At extreme d, replace the explode
    with a mapInPandas per-partition NumPy int64 outer-product
    accumulator — same cells shuffle, identical result."""
    e = load_table(spark, sf_dir, "embeddings")
    cells = gram_cells(e)
    n = e.agg(F.count("*").alias("n"))
    moment = (
        F.col("dot_q").cast("double")
        / F.col("n").cast("double")
        / F.lit(float(_FP_SCALE * _FP_SCALE))
    )
    return (
        cells.crossJoin(F.broadcast(n))
        .select("i", "j", "dot_q", moment.alias("moment"))
        .orderBy("i", "j")
    )


def gram_cells(e: DataFrame) -> DataFrame:
    """(i, j, dot_q): exact-int64 upper-triangle Gram cells of an
    embedding relation (the fixed-point discipline of
    embedding_second_moment_matrix) — shared by the full-corpus moment
    matrix and the snapshot drift monitor, so the two can never
    quantize differently."""
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.lit(float(_FP_SCALE))).cast(
            "long"
        ),
    )
    qdf = e.select(q.alias("q"))
    # r13: posexplode_OUTER + isnotnull on the position output, not a
    # plain posexplode — InferFiltersFromGenerate turns the inner form
    # into a pushed `size(q) > 0` filter that INLINES the whole
    # 64-element quantization transform (and the slice, for the second
    # generate) into a second per-row evaluation; the outer form infers
    # nothing, and the isnotnull(position) filter drops exactly the
    # null row outer adds for a null/empty array, so the row set is
    # identical to the inner form on EVERY input.
    upper = (
        qdf.select(
            F.posexplode_outer("q").alias("i", "qi"),
            # slice from position i+1 (1-based) keeps j >= i: the
            # diagonal and everything right of it
            F.slice(F.col("q"), F.col("i") + 1, F.lit(EMB_DIM)).alias(
                "rest"
            ),
        )
        .where(F.col("i").isNotNull())
        .select("i", "qi", F.posexplode_outer("rest").alias("p", "qj"))
        .where(F.col("p").isNotNull())
    )
    return (
        upper.select(
            "i",
            (F.col("i") + F.col("p")).alias("j"),
            (F.col("qi") * F.col("qj")).alias("prod"),
        )
        .groupBy("i", "j")
        .agg(F.sum("prod").alias("dot_q"))
    )


def sq8_fp_coords(e: DataFrame) -> DataFrame:
    """Fixed-point int64 coordinates at 2^20 — the exact front door of
    every SQ8 derivation."""
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.lit(float(_FP_SCALE))).cast(
            "long"
        ),
    )
    return e.select("vec_id", "label", q.alias("q"))


def sq8_dim_stats(qdf: DataFrame) -> DataFrame:
    """Per-dimension (i, mn, mx) extremes of the fixed-point coordinates
    — a fold MONOID (min of mins / max of maxs), which is what lets the
    streaming twin append one d-row partial per micro-batch and fold by
    min/max (``streaming/sq8_stage.py``)."""
    # outer + isnotnull, same rationale (and provable row-set equality)
    # as gram_cells: the inner form's inferred size(q) > 0 filter
    # re-evaluated the 64-element quantization transform per row.
    return (
        qdf.select(F.posexplode_outer("q").alias("i", "x"))
        .where(F.col("i").isNotNull())
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )


def sq8_coded(e: DataFrame, stats: DataFrame | None = None) -> DataFrame:
    """Shared SQ8 core: fixed-point coordinates ``q`` plus the broadcast
    per-dimension ``mins``/``maxs`` arrays and the 0..255 ``codes`` —
    consumed by the quantization query (codes + error), the recall
    eval (dequantize + search), and the streaming calibrator (which
    passes folded ``stats`` so drained == batch holds by construction).
    Pass 1 collapses to <= d rows map-side; pass 2 is map-only against
    ONE broadcast stats row."""
    qdf = sq8_fp_coords(e)
    if stats is None:
        stats = sq8_dim_stats(qdf)
    arrs = stats.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("i", "mn"))), lambda s: s.mn
        ).alias("mins"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("i", "mx"))), lambda s: s.mx
        ).alias("maxs"),
    )
    return qdf.crossJoin(F.broadcast(arrs)).withColumn(
        "codes",
        F.expr(
            f"""transform(sequence(0, {EMB_DIM - 1}), i -> CAST(
                 CASE WHEN element_at(maxs, i + 1) = element_at(mins, i + 1)
                      THEN 0
                      ELSE ((element_at(q, i + 1) - element_at(mins, i + 1))
                            * 255)
                           div (element_at(maxs, i + 1)
                                - element_at(mins, i + 1))
                 END AS INT))"""
        ),
    )


# DuckDB mirror of sq8_coded — WITH-clause body shared by the
# quantization and recall-eval oracles
_SQ8_CODED_SQL = f"""
    q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {_FP_SCALE}.0) AS BIGINT))
             AS q
      FROM embeddings
    ),
    stats AS (
      SELECT t.i AS i, min(q.q[t.i + 1]) AS mn, max(q.q[t.i + 1]) AS mx
      FROM q, unnest(range(0, {EMB_DIM})) AS t(i)
      GROUP BY t.i
    ),
    arrs AS (
      SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs
      FROM stats
    ),
    coded AS (
      SELECT vec_id, label, q, mins, maxs,
             list_transform(range(0, {EMB_DIM}), i -> CAST(
               CASE WHEN maxs[i + 1] = mins[i + 1] THEN 0
                    ELSE ((q[i + 1] - mins[i + 1]) * 255)
                         // (maxs[i + 1] - mins[i + 1])
               END AS INTEGER)) AS codes
      FROM q CROSS JOIN arrs
    )
"""


@query(
    "sq8_embedding_quantization",
    oracle=f"""
    WITH {_SQ8_CODED_SQL}
    SELECT vec_id, label,
           array_to_string(codes, ',') AS codes_csv,
           CAST(list_reduce(list_transform(range(0, {EMB_DIM}), i ->
             (q[i + 1] - (mins[i + 1]
                + (CAST(codes[i + 1] AS BIGINT) * (maxs[i + 1] - mins[i + 1]))
                  // 255))
             * (q[i + 1] - (mins[i + 1]
                + (CAST(codes[i + 1] AS BIGINT) * (maxs[i + 1] - mins[i + 1]))
                  // 255))), (a, b) -> a + b) AS BIGINT) AS err_q
    FROM coded
    """,
)
def sq8_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization (SQ8) of the embedding corpus — the
    standard 4x vector-compression step before ANN serving (each float32
    dim becomes one 0..255 code against per-dimension min/max), sitting
    between raw floats and the PQ codebooks in the compression
    hierarchy. Returns per-vector codes (CSV-serialized so every output
    column is harness-hashable scalar) plus an EXACT fixed-point
    reconstruction-error so compression quality is a hash-checkable
    number, not a float estimate.

    Exactness: coordinates quantize to int64 at 2^20 (exact
    power-of-two floor, the second-moment discipline above); min/max,
    code assignment ((x-mn)*255 div (mx-mn), operands nonnegative so
    int-div == floor-div in both engines), dequantization, and the
    squared-error fold are then pure int64 arithmetic — engine-identical
    by construction. Constant dimensions (mx == mn) code to 0.

    Shape at 100 TB: pass 1 is a posexplode partial-agg that collapses
    every partition to <= d rows before ONE tiny shuffle (the wire
    carries d-row stats, never vectors); pass 2 is map-only — the d-row
    stats fold to a single broadcast row of min/max arrays and every
    vector codes independently inside whole-stage codegen (JVM HOFs, no
    Python). int64 headroom: |q| <= ~0.55*2^20, so (x-mn)*255 <= ~6e8
    and the error fold <= ~2e9 — no overflow at any corpus size (the
    stats are per-dim extremes, not sums)."""
    coded = sq8_coded(load_table(spark, sf_dir, "embeddings"))
    # r13: the error fold references the dequantized value via the FUSED
    # q/mins/maxs formula (_DQ_FUSED rationale) instead of element_at on
    # the computed ``codes`` array — CollapseProject inlined the whole
    # 64-element codes transform at each of the 2x64 accesses here
    # (O(d^2) interpreted re-evaluation per row). Same integer ops,
    # same order, bit-identical err_q.
    dq_i = """(CASE WHEN element_at(maxs, i + 1) = element_at(mins, i + 1)
           THEN element_at(mins, i + 1)
           ELSE element_at(mins, i + 1)
                + ((((element_at(q, i + 1) - element_at(mins, i + 1)) * 255)
                    div (element_at(maxs, i + 1) - element_at(mins, i + 1)))
                   * (element_at(maxs, i + 1) - element_at(mins, i + 1)))
                  div 255
      END)"""
    err = F.expr(
        f"""aggregate(sequence(0, {EMB_DIM - 1}), 0L, (acc, i) -> acc
             + (element_at(q, i + 1) - {dq_i})
             * (element_at(q, i + 1) - {dq_i}))"""
    )
    return coded.select(
        "vec_id",
        "label",
        # the driver's hash harness canonicalizes with pandas, which cannot
        # factorize list cells — every registered output column must be
        # scalar, so the codes array ships as its CSV serialization (the
        # array form stays available via sq8_coded for in-repo consumers)
        F.concat_ws(",", "codes").alias("codes_csv"),
        err.alias("err_q"),
    )


# Dequantization with the codes formula FUSED per element (r13, guide
# §4.4's duplicated-evaluation trap in HOF form): the earlier spelling
# referenced the COMPUTED ``codes`` array inside this lambda, and
# CollapseProject inlines the whole 64-element codes transform at every
# element access — O(d^2) interpreted re-evaluation per row (measured:
# sq8_dqn 5.66 s -> 0.69 s at sf0.1 after fusing; results bit-identical,
# same integer ops in the same order). The lambda below touches only
# real attribute columns (q, mins, maxs), which inlining cannot expand.
# Equivalence: codes_i = 0 when maxs_i == mins_i (dq_i = mins_i), else
# codes_i = ((q_i - mins_i) * 255) div (maxs_i - mins_i) substituted
# into dq_i = mins_i + (codes_i * (maxs_i - mins_i)) div 255.
_DQ_FUSED = f"""transform(sequence(0, {EMB_DIM - 1}), i ->
      CASE WHEN element_at(maxs, i + 1) = element_at(mins, i + 1)
           THEN element_at(mins, i + 1)
           ELSE element_at(mins, i + 1)
                + ((((element_at(q, i + 1) - element_at(mins, i + 1)) * 255)
                    div (element_at(maxs, i + 1) - element_at(mins, i + 1)))
                   * (element_at(maxs, i + 1) - element_at(mins, i + 1)))
                  div 255
      END)"""


def sq8_dqn(emb: DataFrame) -> DataFrame:
    """(vec_id, dq, nd): exact SQ8-dequantized int64 coordinates and
    int64 squared norm per vector — the shared exact-arithmetic front
    door of sq8_cosine_topk, sq8_recall_eval, and mmr_diverse_topk."""
    return (
        sq8_coded(emb)
        .withColumn("dq", F.expr(_DQ_FUSED))
        .withColumn(
            "nd",
            F.expr("aggregate(transform(dq, x -> x * x), 0L, (a, b) -> a + b)"),
        )
        .select("vec_id", "dq", "nd")
    )


def sq8_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, rank): cosine top-{K} over SQ8-
    dequantized vectors — the SEARCH leg shared by the production query
    (``sq8_cosine_topk``) and the recall evaluation. int64 dot product
    and norms from the exact dequantized coordinates; only the final
    two sqrt-divisions are float."""
    emb = load_table(spark, sf_dir, "embeddings")
    dqn = sq8_dqn(emb)
    queries = dqn.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("dq").alias("qdq"),
        F.col("nd").alias("qnd"),
    )
    dot = F.expr(
        "aggregate(zip_with(qdq, dq, (x, y) -> x * y), 0L, (a, b) -> a + b)"
    )
    score = (dot.cast("double") / F.sqrt(F.col("qnd").cast("double"))) / F.sqrt(
        F.col("nd").cast("double")
    )
    scored = dqn.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), score.alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


_SQ8_SEARCH_SQL = f"""
    dq AS (
      SELECT vec_id,
             list_transform(range(0, {EMB_DIM}), i ->
               mins[i + 1]
               + (CAST(codes[i + 1] AS BIGINT)
                  * (maxs[i + 1] - mins[i + 1])) // 255) AS dq
      FROM coded
    ),
    dqn AS (
      SELECT vec_id, dq,
             list_reduce(list_transform(dq, x -> x * x), (a, b) -> a + b)
               AS nd
      FROM dq
    ),
    sq8_topk AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY
                   ((CAST(list_reduce(
                       list_transform(range(0, {EMB_DIM}),
                                      i -> q.dq[i + 1] * e.dq[i + 1]),
                       (a, b) -> a + b) AS DOUBLE)
                     / sqrt(CAST(q.nd AS DOUBLE)))
                    / sqrt(CAST(e.nd AS DOUBLE))) DESC, e.vec_id
               ) AS rank
        FROM dqn q JOIN dqn e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    )
"""


@query(
    "sq8_cosine_topk",
    oracle=f"""
    WITH {_SQ8_CODED_SQL},
    {_SQ8_SEARCH_SQL}
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
    FROM sq8_topk
    """,
)
def sq8_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of SQ8 search: the top-{K} relation alone,
    no exact brute-force leg riding along — the same prediction-vs-
    evaluation split as kmv_join_size_estimate vs _profile. Every
    comparison that decides a rank is exact int64 arithmetic, so the
    whole ranking hash-verifies against DuckDB (unlike the float ANN
    variants, which are recall-checked instead)."""
    return sq8_search_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")
    )


@query(
    "sq8_recall_eval",
    oracle=f"""
    WITH {_SQ8_CODED_SQL},
    {_SQ8_SEARCH_SQL},
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id
               ) AS rank
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT x.query_id,
           CAST(count(s.neighbor_id) AS INTEGER) AS n_hits,
           CAST(count(s.neighbor_id) AS DOUBLE) / {TOP_K} AS recall
    FROM exact x
    LEFT JOIN sq8_topk s
      ON s.query_id = x.query_id AND s.neighbor_id = x.neighbor_id
    GROUP BY x.query_id
    """,
)
def sq8_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of cosine search over SQ8-DEQUANTIZED vectors
    against the exact float brute-force top-k — the measurement that
    decides whether 4x compression is admissible for a given corpus
    (the FAISS-style quantization quality gate), as a first-class
    distributed query instead of an offline notebook check.

    Both rankings are engine-exact: the float side is the proven
    knn_bruteforce_cosine contract; the SQ8 side scores with an int64
    dot product and int64 norms from the EXACT dequantized coordinates
    (only the final two sqrt-divisions are float, identically
    parenthesized in both engines), so the oracle hash-verifies the
    whole evaluation, recall numbers included.

    Shape at 100 TB: the dequantized relation derives map-only from the
    shared SQ8 core (one d-row stats shuffle, broadcast fold); both
    search legs are broadcast-queries x corpus-scan with only TOP_K
    survivors per query reaching the tiny window exchange; the final
    recall join touches N_QUERIES*K rows."""
    exact = knn_bruteforce_cosine(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    sq8_topk = sq8_search_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hit = sq8_topk.withColumn("hit", F.lit(1))
    return (
        exact.join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("int").alias("n_hits"),
            (F.count("hit").cast("double") / F.lit(float(TOP_K))).alias(
                "recall"
            ),
        )
    )


# rows-only: like the k-means-trained IVF/PQ family, the driver-side
# eigendecomposition is not SQL-replayable; the covariance sufficient
# statistics ARE (embedding_second_moment_matrix above is oracle-green),
# and the projection contract is pinned exactly in tests/test_pca_embed.py.
@query("embedding_pca_projection")
def embedding_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus projected onto its top-4 principal components
    (operators/pca.py): exact fixed-point covariance stats on the
    cluster (one pass, <= d(d+1)/2 + d cells shuffle), a 64x64 eigh on
    the driver (O(d^3), corpus-size-independent — Spark MLlib's own PCA
    shape), then a map-only zip_with projection with broadcast-literal
    components. Sign-fixed eigenvectors make the output deterministic
    across LAPACK builds."""
    from ..operators.pca import pca_project

    e = load_table(spark, sf_dir, "embeddings")
    # Project the pca array<double> to one scalar column per component:
    # the driver harness canonicalizes results with pandas, which cannot
    # hash list cells — scalars keep the rows-only check green while the
    # array form remains available from pca_project itself. Rounded to 6
    # decimals so the check is stable across BLAS builds.
    proj = pca_project(e, k=4)
    comps = [
        F.round(F.col("pca")[i], 6).alias(f"pca_{i}") for i in range(4)
    ]
    return proj.select("vec_id", "label", *comps).orderBy("vec_id")


@query("semdedup_embeddings")  # rows-only: k-means quantizer, like IVF/PQ
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup over the full embeddings table: IVF
    k-means clusters bound the pair space (n^2/k, the paper's core
    trick), within-cluster cosine >= 0.5 drops all but the min-id member
    of each semantic-dup group; k scales as ceil(n/256) so pair work
    stays linear in corpus size. Deterministic given the seeded quantizer
    (same reason the IVF/PQ family is rows-only: Lloyd's iterations
    aren't SQL-replayable); recall on planted twins and agreement with a
    sequential NumPy twin are pytest-asserted (tests/test_semdedup.py)."""
    from ..operators.similarity import semdedup  # lazy: avoids cycle

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        semdedup(emb, threshold=0.5)
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


DRIFT_TOPK = 20


@query(
    "embedding_snapshot_drift",
    oracle=f"""
    WITH q AS (
      SELECT vec_id % 2 AS snap,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {_FP_SCALE}.0) AS BIGINT))
             AS q
      FROM embeddings
    ),
    n AS (
      SELECT
        CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM q
    ),
    pairs AS (
      SELECT snap, i.i AS i, j.j AS j, q.q[i.i + 1] * q.q[j.j + 1] AS prod
      FROM q,
           unnest(range(0, {EMB_DIM})) AS i(i),
           unnest(range(0, {EMB_DIM})) AS j(j)
      WHERE j.j >= i.i
    ),
    cells AS (
      SELECT i, j,
        CAST(sum(CASE WHEN snap = 0 THEN prod ELSE 0 END) AS BIGINT) AS dot_a,
        CAST(sum(CASE WHEN snap = 1 THEN prod ELSE 0 END) AS BIGINT) AS dot_b
      FROM pairs GROUP BY i, j
    ),
    scored AS (
      SELECT c.i, c.j, c.dot_a, c.dot_b,
             abs(CAST(c.dot_a AS DECIMAL(38,0)) * n.n_b
                 - CAST(c.dot_b AS DECIMAL(38,0)) * n.n_a) AS x_diff,
             n.n_a, n.n_b
      FROM cells c CROSS JOIN n
    )
    SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
           dot_a, dot_b,
           CAST(x_diff AS DOUBLE)
             / CAST(n_a AS DOUBLE) / CAST(n_b AS DOUBLE)
             / {float(_FP_SCALE * _FP_SCALE)} AS moment_drift
    FROM scored
    ORDER BY x_diff DESC, i, j
    LIMIT {DRIFT_TOPK}
    """,
)
def embedding_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: compare two corpus
    snapshots' second-moment (Gram) matrices cell by cell and surface
    the {DRIFT_TOPK} most-drifted (i, j) cells — the check that catches
    a silently retrained/re-normalized embedding model (or an upstream
    featurization change) before it poisons ANN indexes and SemDeDup
    thresholds built on the old geometry. Snapshots here are the
    deterministic vec_id-parity halves (the driver corpus ships no
    timestamps); swap any predicate pair in.

    Exactness: both Grams come from the shared fixed-point
    ``gram_cells`` core; per-cell drift |m_a - m_b| is computed by
    integer CROSS-MULTIPLICATION |dot_a*n_b - dot_b*n_a| in
    DECIMAL(38,0) (never a float subtraction of two divisions), so the
    ranking and the reported doubles hash-verify. At 100 TB both
    snapshots collapse to <= d(d+1)/2 cells before ONE shuffle each;
    the compare is a cells x cells join."""
    e = load_table(spark, sf_dir, "embeddings")
    a = gram_cells(e.where(F.col("vec_id") % 2 == 0)).withColumnRenamed(
        "dot_q", "dot_a"
    )
    b = gram_cells(e.where(F.col("vec_id") % 2 == 1)).withColumnRenamed(
        "dot_q", "dot_b"
    )
    n = e.agg(
        F.sum((F.col("vec_id") % 2 == 0).cast("long")).alias("n_a"),
        F.sum((F.col("vec_id") % 2 == 1).cast("long")).alias("n_b"),
    )
    cells = a.join(b, ["i", "j"], "outer").fillna(
        0, subset=["dot_a", "dot_b"]
    )
    return rank_drift(cells, n, DRIFT_TOPK)


def rank_drift(cells: DataFrame, n: DataFrame, topk: int) -> DataFrame:
    """The one drift-ranking tail the batch monitor and the incremental
    log comparison (``streaming/gram.py::drift_between_logs``) share —
    the two carry a bit-for-bit equality contract, so the scoring must
    live once. ``cells``: (i, j, dot_a, dot_b) exact int64 Gram cells;
    ``n``: one row (n_a, n_b). Ranks by the integer cross-multiplied
    |dot_a*n_b - dot_b*n_a| in DECIMAL(38,0); the reported double is
    one fixed IEEE chain at the end."""
    joined = cells.crossJoin(F.broadcast(n))
    x_diff = F.abs(
        F.col("dot_a").cast("decimal(38,0)") * F.col("n_b")
        - F.col("dot_b").cast("decimal(38,0)") * F.col("n_a")
    )
    drift = (
        x_diff.cast("double")
        / F.col("n_a").cast("double")
        / F.col("n_b").cast("double")
        / F.lit(float(_FP_SCALE * _FP_SCALE))
    )
    return (
        joined.select(
            "i",
            "j",
            "dot_a",
            "dot_b",
            x_diff.alias("_x"),
            drift.alias("moment_drift"),
        )
        .orderBy(F.desc("_x"), "i", "j")
        .limit(topk)
        .drop("_x")
    )


# ------------------------------------------------ JL random projection

JL_K = 16  # projected dimensionality (4x reduction from EMB_DIM)


def _jl_signs() -> list[list[int]]:
    """The +-1 projection matrix (Achlioptas 2003: Rademacher entries
    satisfy the Johnson-Lindenstrauss lemma), derived per cell from
    md5("jl:i:j") — the engine's stored-RNG-free determinism
    convention, so BOTH engines (and any re-run) materialize the
    identical matrix from the formula alone."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[0] < "8"
            else -1
            for j in range(JL_K)
        ]
        for i in range(EMB_DIM)
    ]


def jl_project(e: DataFrame) -> DataFrame:
    """(vec_id, y array<long>): exact int64 projection of the
    fixed-point-quantized embedding onto the JL_K +-1 directions —
    map-only (the matrix is a literal in the plan), no shuffle, which
    is the whole point at 100 TB: 4x fewer bytes into every downstream
    pairwise stage for a JL-bounded distortion."""
    signs = _jl_signs()
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.lit(float(_FP_SCALE))).cast(
            "long"
        ),
    )
    base = e.select("vec_id", q.alias("q"))
    y = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    "q",
                    F.array(*[F.lit(signs[i][j]) for i in range(EMB_DIM)]),
                    lambda a, b: a * b.cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            for j in range(JL_K)
        ]
    )
    return base.select("vec_id", y.alias("y"))


def _jl_proj_sql() -> str:
    """CTE ``proj`` (vec_id, y BIGINT[]) mirroring jl_project."""
    signs = _jl_signs()
    cols = ", ".join(
        "list_reduce(list_transform(range(0, %d), i -> q[i + 1] *"
        " ([%s]::BIGINT[])[i + 1]), (a, b) -> a + b)"
        % (EMB_DIM, ", ".join(str(signs[i][j]) for i in range(EMB_DIM)))
        for j in range(JL_K)
    )
    return f"""
    qz AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {_FP_SCALE}.0) AS BIGINT))
               AS q
      FROM embeddings
    ), proj AS (
      SELECT vec_id, [{cols}] AS y FROM qz
    )"""


def _int_cosine_rank_sql(rel: str, vec: str, dim: int, out: str) -> str:
    """Top-{TOP_K} ranking CTE ``{out}`` by exact-int cosine over the
    ``{vec}`` BIGINT[] column of CTE ``{rel}``: int64 dot + int64
    norms, ONE identically-parenthesized float chain at the end, ties
    by neighbor id (the sq8_recall_eval discipline)."""
    dot = (
        f"list_reduce(list_transform(range(0, {dim}),"
        f" i -> a.{vec}[i + 1] * b.{vec}[i + 1]), (x, y) -> x + y)"
    )
    nrm = (
        lambda s: f"list_reduce(list_transform(range(0, {dim}),"
        f" i -> {s}.{vec}[i + 1] * {s}.{vec}[i + 1]), (x, y) -> x + y)"
    )
    return f"""{out} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY CAST({dot} AS DOUBLE)
                          / (sqrt(CAST({nrm('a')} AS DOUBLE))
                             * sqrt(CAST({nrm('b')} AS DOUBLE))) DESC,
                          b.vec_id
               ) AS rank
        FROM {rel} a JOIN {rel} b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}
    )"""


@query(
    "embedding_random_projection",
    oracle=f"""
    WITH {_jl_proj_sql()}
    SELECT vec_id,
           {', '.join(f"y[{j + 1}] AS y_{j}" for j in range(JL_K))}
    FROM proj ORDER BY vec_id
    """,
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction (Achlioptas 2003
    +-1 projections, public): every embedding maps to {JL_K} exact
    int64 coordinates via a literal md5-seeded sign matrix — the
    cheap-projection stage a large-scale similarity pipeline runs
    before pairwise work to cut bytes/FLOPs 4x with lemma-bounded
    distortion. Map-only, zero shuffles; hash-oracled because the
    whole projection is integer arithmetic."""
    e = load_table(spark, sf_dir, "embeddings")
    proj = jl_project(e)
    return proj.select(
        "vec_id",
        *[F.col("y")[j].alias(f"y_{j}") for j in range(JL_K)],
    ).orderBy("vec_id")


@query(
    "jl_recall_eval",
    oracle=f"""
    WITH {_jl_proj_sql()},
    {_int_cosine_rank_sql('qz', 'q', EMB_DIM, 'exact')},
    {_int_cosine_rank_sql('proj', 'y', JL_K, 'approx')}
    SELECT x.query_id,
           CAST(count(s.neighbor_id) AS INTEGER) AS n_hits,
           CAST(count(s.neighbor_id) AS DOUBLE) / {TOP_K} AS recall
    FROM exact x
    LEFT JOIN approx s
      ON s.query_id = x.query_id AND s.neighbor_id = x.neighbor_id
    GROUP BY x.query_id
    """,
)
def jl_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of cosine ranking in the {JL_K}-dim projected
    space against the exact {EMB_DIM}-dim ranking — the admissibility
    gate for the 4x reduction (the same evaluation shape as
    sq8_recall_eval). Both rankings are engine-exact: int64 dots and
    norms from the quantized coordinates, one identically-parenthesized
    float chain, vec_id tiebreak — so the oracle hash-verifies the
    recall numbers themselves.

    Expected reading on THIS corpus: low recall. The driver embeddings
    are isotropic (no neighborhood structure), so exact top-{TOP_K}
    cosine margins are ~0 and any k < d projection scrambles the
    ranking — the gate truthfully REJECTS the reduction here, which is
    precisely its job; tests/test_jl.py plants genuinely-near twins
    and shows the projection preserves them (twin stays rank-1), i.e.
    low recall is a property of this corpus, not a projection bug."""
    e = load_table(spark, sf_dir, "embeddings")
    qz = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") * F.lit(float(_FP_SCALE))
            ).cast("long"),
        ).alias("v"),
    )
    proj = jl_project(e).withColumnRenamed("y", "v")

    def topk(rel: DataFrame) -> DataFrame:
        a = rel.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        dot = F.aggregate(
            F.zip_with("qv", "v", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        nrm = lambda c: F.aggregate(  # noqa: E731
            F.zip_with(c, c, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        score = dot.cast("double") / (
            F.sqrt(nrm("qv").cast("double")) * F.sqrt(nrm("v").cast("double"))
        )
        scored = rel.join(
            F.broadcast(a), F.col("vec_id") != F.col("query_id")
        ).select(
            "query_id", F.col("vec_id").alias("neighbor_id"), score.alias("s")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("s"), "neighbor_id"
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    exact, approx = topk(qz), topk(proj)
    hit = approx.withColumnRenamed("neighbor_id", "hit_id")
    return (
        exact.join(
            hit,
            (exact["query_id"] == hit["query_id"])
            & (exact["neighbor_id"] == hit["hit_id"]),
            "left",
        )
        .groupBy(exact["query_id"].alias("query_id"))
        .agg(
            F.count("hit_id").cast("int").alias("n_hits"),
            (F.count("hit_id").cast("double") / F.lit(TOP_K)).alias(
                "recall"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: lexical BM25 + vector cosine, fused by Reciprocal
# Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009 — "Reciprocal
# rank fusion outperforms Condorcet and individual rank learning
# methods"; score = sum over legs of 1 / (k + rank), k = 60).

RRF_K = 60  # the paper's constant
RRF_LEG_DEPTH = 50  # candidates kept per leg before fusion
RRF_TOP = 20
_RRF_QUERY_VEC_ID = 0  # stands in for the query encoder's output


# Plain sibling import: the oracle builders below need text's SQL
# builders at decoration time anyway, and text.py is already fully
# loaded before this module (queries/classifier.py, imported earlier by
# the registry, imports it at top level) — so this changes no
# registration order.
from .text import (  # noqa: E402
    BM25_TERMS,
    bm25_corpus_stats,
    bm25_doc_features,
    bm25_score_from,
    bm25_scored_sql,
)


def rrf_fused_sql() -> str:
    """lex_top/lex/q/sem_top/sem/fused CTE chain — the SQL twin of the
    two legs + ``rrf_fuse``, against the ``scored`` CTE of
    ``bm25_scored_sql()``. Shared by the ``hybrid_search_rrf`` oracle and
    the retrieval-eval oracle so the evaluated system IS the registered
    one."""
    return f"""lex_top AS (
      SELECT doc_id, round(score, 6) AS bm25
      FROM scored
      ORDER BY round(score, 6) DESC, doc_id
      LIMIT {RRF_LEG_DEPTH}
    ), lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                  AS INTEGER) AS lex_rank
      FROM lex_top
    ), q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC_ID}
    ), sem_top AS (
      SELECT e.vec_id AS doc_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv), 6) AS cs
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> {_RRF_QUERY_VEC_ID}
      ORDER BY cs DESC, doc_id
      LIMIT {RRF_LEG_DEPTH}
    ), sem AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cs DESC, doc_id)
                  AS INTEGER) AS sem_rank
      FROM sem_top
    ), fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex_rank, sem_rank,
             COALESCE(1.0 / ({RRF_K} + lex_rank), 0.0)
               + COALESCE(1.0 / ({RRF_K} + sem_rank), 0.0) AS rrf_score
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )"""


def _rrf_oracle() -> str:
    return f"""
    WITH {bm25_scored_sql()}, {rrf_fused_sql()}
    SELECT doc_id, lex_rank, sem_rank, rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT {RRF_TOP}
    """


@query("hybrid_search_rrf", oracle=_rrf_oracle())
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: a BM25 lexical leg and a cosine vector leg over the
    SAME corpus (doc_id == vec_id — every document carries an embedding),
    fused with Reciprocal Rank Fusion. The lexical leg reuses the exact
    bm25_* expression core of ``bm25_keyword_search`` (one shared score
    definition, Spark and SQL); the vector leg scores every embedding
    against one fixed query vector (vec_id 0 stands in for the output of
    a query encoder, which has no in-container model; the query vector
    itself is excluded as a degenerate self-match).

    Scale shape: each leg is a single corpus scan ending in
    TakeOrderedAndProject at depth RRF_LEG_DEPTH (50) (per-partition heaps,
    no global sort); the only post-scan work is a full-outer join of two
    RRF_LEG_DEPTH (50)-row relations. Rank assignment windows run AFTER the
    leg cutoff, so the unpartitioned window touches at most
    RRF_LEG_DEPTH (50) rows regardless of corpus size. At 100 TB the vector
    leg swaps in ``ann_ivfpq_topk``'s candidate generation unchanged —
    fusion only consumes (doc_id, rank).

    Cross-engine determinism: fusion consumes integer RANKS, never raw
    scores; rrf_score = 1/(60+rank) sums of exact integer ranks are
    bit-identical in both engines. Leg membership itself orders on a
    round-6 cosine/BM25 (doc_id tiebreak) — the same probabilistic
    rank-stability contract as every float-ranked query in this module
    (a true score within ~1e-16 of a 5e-7 rounding boundary could flip
    a leg rank; the corpus-derived scores sit nowhere near one)."""
    docs = load_table(spark, sf_dir, "documents")
    base = bm25_doc_features(docs)
    lex_top = bm25_score_from(
        base, bm25_corpus_stats(base), top_k=RRF_LEG_DEPTH
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return rrf_fuse(
        lex_ranks(lex_top), sem_ranks(sem_leg(emb, _RRF_QUERY_VEC_ID))
    )


def lex_ranks(lex_top: DataFrame) -> DataFrame:
    """(doc_id, lex_rank) from a bm25_score_from top-k relation. The
    unpartitioned window is BY DESIGN: it runs on the <= leg-depth
    survivors of a TakeOrderedAndProject, never on the corpus."""
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        lex_top.select("doc_id", "bm25")
        .withColumn("lex_rank", F.row_number().over(w))
        .select("doc_id", "lex_rank")
    )


def sem_leg(emb: DataFrame, query_vec_id: int) -> DataFrame:
    """(doc_id, cs) vector-leg candidates: one corpus scan against a
    broadcast 1-row query vector, cut at RRF_LEG_DEPTH by
    TakeOrderedAndProject."""
    qv = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    return (
        emb.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine("embedding", "qv"), 6).alias("cs"),
        )
        .orderBy(F.desc("cs"), "doc_id")
        .limit(RRF_LEG_DEPTH)
    )


def sem_ranks(sem_top: DataFrame) -> DataFrame:
    """(doc_id, sem_rank) from a vector-leg top-k relation (same
    bounded-window argument as ``lex_ranks``)."""
    w = Window.orderBy(F.desc("cs"), F.asc("doc_id"))
    return (
        sem_top.withColumn("sem_rank", F.row_number().over(w))
        .select("doc_id", "sem_rank")
    )


def rrf_fuse(lex: DataFrame, sem: DataFrame) -> DataFrame:
    """Fuse (doc_id, lex_rank) x (doc_id, sem_rank) by Reciprocal Rank
    Fusion — a full-outer join of two leg-depth-sized relations; the
    serving core shared by the batch query and the incremental path
    (drained streaming BM25 log -> ``lex_ranks`` -> here)."""
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0)
    )
    return (
        lex.join(sem, ["doc_id"], "full_outer")
        .select("doc_id", "lex_rank", "sem_rank", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(RRF_TOP)
    )


MMR_K = 10
MMR_LAMBDA = 0.7
MMR_ONE_MINUS_LAMBDA = 0.3  # explicit literal: 1.0 - 0.7 != 0.3 in float64


def _mmr_oracle(k: int = MMR_K) -> str:
    """DuckDB replay of ``mmr_diverse_topk``: the greedy selection
    unrolled as k (sel, st) MATERIALIZED CTE step pairs (the
    kcore/pagerank fixed-unroll pattern). Replayability rests on every
    compared quantity being bit-identical across engines: relevance is
    the round-6 sem_leg cosine; pairwise similarity is an exact int64
    dot of SQ8-dequantized coordinates followed by two correctly-
    rounded divisions (smaller-id sqrt FIRST — mirrored in
    operators/similarity.py::mmr_rerank_exact); the score is
    (0.7 * cs) - (0.3 * max_sim) in that exact association order."""
    step = """,
    sel{r} AS MATERIALIZED (
      SELECT doc_id, cs,
             (CAST(0.7 AS DOUBLE) * cs)
               - (CAST(0.3 AS DOUBLE) * max_sim) AS mmr_score
      FROM st{prev} ORDER BY mmr_score DESC, doc_id LIMIT 1
    ),
    st{r} AS MATERIALIZED (
      SELECT s.doc_id, s.cs, greatest(s.max_sim, p.sim) AS max_sim
      FROM st{prev} s
      JOIN sel{r} x ON s.doc_id <> x.doc_id
      JOIN pair p ON p.ia = least(s.doc_id, x.doc_id)
               AND p.ib = greatest(s.doc_id, x.doc_id)
    )"""
    steps = "".join(step.format(r=r, prev=r - 1) for r in range(1, k + 1))
    final = " UNION ALL ".join(
        f"SELECT {r} AS mmr_rank, doc_id, cs, mmr_score FROM sel{r}"
        for r in range(1, k + 1)
    )
    return f"""
    WITH {_SQ8_CODED_SQL},
    dq AS (
      SELECT vec_id,
             list_transform(range(0, {EMB_DIM}), i ->
               mins[i + 1]
               + (CAST(codes[i + 1] AS BIGINT)
                  * (maxs[i + 1] - mins[i + 1])) // 255) AS dq
      FROM coded
    ),
    dqn AS (
      SELECT vec_id, dq,
             list_reduce(list_transform(dq, x -> x * x), (a, b) -> a + b)
               AS nd
      FROM dq
    ),
    qv AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC_ID}
    ),
    cand AS MATERIALIZED (
      SELECT e.vec_id AS doc_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv), 6) AS cs
      FROM embeddings e CROSS JOIN qv q
      WHERE e.vec_id <> {_RRF_QUERY_VEC_ID}
      ORDER BY cs DESC, doc_id
      LIMIT {RRF_LEG_DEPTH}
    ),
    cv AS MATERIALIZED (
      SELECT c.doc_id, c.cs, d.dq, d.nd
      FROM cand c JOIN dqn d ON d.vec_id = c.doc_id
    ),
    pair AS MATERIALIZED (
      SELECT a.doc_id AS ia, b.doc_id AS ib,
             ((CAST(list_reduce(
                 list_transform(range(0, {EMB_DIM}),
                                i -> a.dq[i + 1] * b.dq[i + 1]),
                 (x, y) -> x + y) AS DOUBLE)
               / sqrt(CAST(a.nd AS DOUBLE)))
              / sqrt(CAST(b.nd AS DOUBLE))) AS sim
      FROM cv a JOIN cv b ON a.doc_id < b.doc_id
    ),
    st0 AS MATERIALIZED (
      SELECT doc_id, cs, CAST(0.0 AS DOUBLE) AS max_sim FROM cv
    ){steps}
    SELECT doc_id, CAST(mmr_rank AS INTEGER) AS mmr_rank,
           cs AS relevance, mmr_score
    FROM ({final})
    ORDER BY mmr_rank
    """


@query("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversity re-ranking of the vector
    leg's top-RRF_LEG_DEPTH (50) candidates (Carbonell & Goldstein 1998):
    the retrieval-serving pass that stops near-duplicate results from
    crowding a result page / RAG context window. Hash-oracled since r11
    (VERDICT r10 task 4): the greedy runs over SQ8-DEQUANTIZED
    candidate vectors, so every pairwise similarity is an exact int64
    dot + two correctly-rounded divisions and every greedy comparison
    is bit-identical across engines — the DuckDB oracle replays the
    selection as {MMR_K} unrolled argmax CTE steps (_mmr_oracle). The
    pure-Python pytest twin (tests/test_mmr.py) stays as the
    independent check of the greedy itself.

    Scale shape: candidate generation (``sem_leg``) is the corpus-sized
    work — one scan + TakeOrderedAndProject; the greedy loop runs on the
    <= RRF_LEG_DEPTH (50) survivors inside one Arrow batch (bounded by the
    leg depth, independent of corpus size). The 50-row join fetching
    vectors broadcasts the candidate ids into the SQ8 relation (whose
    stats pass is the same corpus-wide min/max monoid every SQ8 query
    shares)."""
    from ..operators.similarity import mmr_rerank_exact

    emb = load_table(spark, sf_dir, "embeddings")
    cand = sem_leg(emb, _RRF_QUERY_VEC_ID)
    with_vecs = sq8_dqn(emb).withColumnRenamed("vec_id", "doc_id").join(
        F.broadcast(cand), "doc_id"
    )
    return mmr_rerank_exact(
        with_vecs,
        k=MMR_K,
        lam=MMR_LAMBDA,
        one_minus_lam=MMR_ONE_MINUS_LAMBDA,
    ).orderBy("mmr_rank")


# ------------------------------------------------------ retrieval eval

NDCG_AT = 10  # evaluation cutoff for nDCG / MRR / precision


def _eval_contrib_sql() -> str:
    """Graded-gain DCG contribution in exact integer nano-units —
    identical expression order to the Spark side."""
    return (
        "CAST(round((power(2.0, CAST(grade AS DOUBLE)) - 1.0)"
        " / log2(CAST(rank AS DOUBLE) + 1.0)"
        " * 1000000000.0) AS BIGINT)"
    )


def _retrieval_eval_oracle() -> str:
    grade_sql = " + ".join(
        f"(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)" for t in BM25_TERMS
    )
    c = _eval_contrib_sql()
    sys_block = """
      SELECT '{name}' AS system,
             CAST(sum({c}) AS BIGINT) AS dcg_nano,
             min(CASE WHEN grade >= 2 THEN rank END) AS first_rel,
             CAST(sum(CASE WHEN grade >= 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel_at_k
      FROM {ranked} r JOIN grades g USING (doc_id)
    """
    return f"""
    WITH {bm25_scored_sql()}, {rrf_fused_sql()},
    grades AS (
      SELECT doc_id, CAST({grade_sql} AS INTEGER) AS grade FROM base
    ),
    lex_ranked AS (
      SELECT doc_id, lex_rank AS rank FROM lex WHERE lex_rank <= {NDCG_AT}
    ),
    rrf_top AS (
      SELECT doc_id, rrf_score FROM fused
      ORDER BY rrf_score DESC, doc_id LIMIT {NDCG_AT}
    ),
    rrf_ranked AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
                  AS INTEGER) AS rank
      FROM rrf_top
    ),
    ideal AS (
      SELECT grade,
             CAST(row_number() OVER (ORDER BY grade DESC, doc_id)
                  AS INTEGER) AS rank
      FROM (SELECT doc_id, grade FROM grades
            ORDER BY grade DESC, doc_id LIMIT {NDCG_AT})
    ),
    idcg AS (
      SELECT CAST(sum({c}) AS BIGINT) AS idcg_nano FROM ideal
    ),
    sys_union AS (
      {sys_block.format(name="bm25", c=c, ranked="lex_ranked")}
      UNION ALL
      {sys_block.format(name="rrf", c=c, ranked="rrf_ranked")}
    )
    SELECT system,
           CAST(round(CAST(dcg_nano AS DOUBLE)
                      / CAST(idcg_nano AS DOUBLE)
                      * 1000000000.0) AS BIGINT) AS ndcg_nano,
           COALESCE(CAST(round(1000000000.0 / CAST(first_rel AS DOUBLE))
                         AS BIGINT), 0) AS mrr_nano,
           n_rel_at_k
    FROM sys_union CROSS JOIN idcg
    """


@query("retrieval_eval_ndcg", oracle=_retrieval_eval_oracle())
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded-relevance evaluation of the two registered retrieval
    systems (plain BM25 vs hybrid RRF) at cutoff NDCG_AT (10): nDCG
    (Järvelin & Kekäläinen 2002, exponential gain), MRR (first doc with
    grade >= 2) and precision-as-count (results with grade >= 1). The
    relevance judgment is derived deterministically from the corpus
    itself — grade = number of distinct query terms a document contains
    (0..3) — so both engines hold the identical qrels without any
    external file, and the oracle replays systems AND metrics end to
    end (the ranking CTEs are the registered queries' own SQL).

    Scale shape: grades are one extra map-only column on the existing
    BM25 feature scan; each system contributes NDCG_AT (10) rows to the
    metric join (broadcast into the grade relation); the ideal ranking
    is one TakeOrderedAndProject over grades. Cross-engine determinism:
    DCG terms go to exact integer nano-units before summing (the
    order-free monoid discipline); nDCG/MRR are single double divisions
    of exact integers rounded back to micro-units."""
    docs = load_table(spark, sf_dir, "documents")
    base = bm25_doc_features(docs)
    grade = None
    for t in BM25_TERMS:
        g = (F.col(f"tf_{t}") > 0).cast("int")
        grade = g if grade is None else grade + g
    grades = base.select("doc_id", grade.alias("grade"))

    lex_full = lex_ranks(
        bm25_score_from(base, bm25_corpus_stats(base), top_k=RRF_LEG_DEPTH)
    )
    lex_ranked = lex_full.where(F.col("lex_rank") <= NDCG_AT).select(
        "doc_id", F.col("lex_rank").alias("rank")
    )
    # the fused system is hybrid_search_rrf's exact body (same expression
    # cores), built from the lex ranking ALREADY computed above so the
    # corpus-sized BM25 pipeline runs once, not twice
    emb = load_table(spark, sf_dir, "embeddings")
    fused = rrf_fuse(lex_full, sem_ranks(sem_leg(emb, _RRF_QUERY_VEC_ID)))
    rrf_top = fused.limit(NDCG_AT)
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    rrf_ranked = rrf_top.withColumn(
        "rank", F.row_number().over(w)
    ).select("doc_id", "rank")

    contrib = F.round(
        (F.pow(F.lit(2.0), F.col("grade").cast("double")) - F.lit(1.0))
        / F.log2(F.col("rank").cast("double") + F.lit(1.0))
        * F.lit(1e9)
    ).cast("long")

    def metrics(ranked: DataFrame, name: str) -> DataFrame:
        j = grades.join(F.broadcast(ranked), "doc_id")
        return j.agg(
            F.lit(name).alias("system"),
            F.sum(contrib).alias("dcg_nano"),
            F.min(F.when(F.col("grade") >= 2, F.col("rank"))).alias(
                "first_rel"
            ),
            F.sum((F.col("grade") >= 1).cast("long")).alias("n_rel_at_k"),
        )

    ideal = (
        grades.orderBy(F.desc("grade"), "doc_id")
        .limit(NDCG_AT)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("grade"), "doc_id")),
        )
    )
    idcg = ideal.agg(F.sum(contrib).alias("idcg_nano"))
    sys_union = metrics(lex_ranked, "bm25").unionByName(
        metrics(rrf_ranked, "rrf")
    )
    return sys_union.crossJoin(F.broadcast(idcg)).select(
        "system",
        F.round(
            F.col("dcg_nano").cast("double")
            / F.col("idcg_nano").cast("double")
            * F.lit(1e9)
        )
        .cast("long")
        .alias("ndcg_nano"),
        F.coalesce(
            F.round(F.lit(1e9) / F.col("first_rel").cast("double")).cast(
                "long"
            ),
            F.lit(0).cast("long"),
        ).alias("mrr_nano"),
        "n_rel_at_k",
    )


MARGIN_K = 4  # neighborhood size for the margin normalizer
MARGIN_THRESHOLD = 1.05  # accept matches whose cos beats its hood by 5%


@query(
    "margin_mining_knn",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 500
    ), scored AS (
      SELECT q.query_id, e.vec_id AS cand_id,
             list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[]))
               AS score
      FROM q JOIN embeddings e
        ON NOT (e.vec_id % 10 = 0 AND e.vec_id < 500)
    ), rq AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, cand_id) AS rnk
      FROM scored
    ), avg_q AS (
      SELECT query_id,
             list_reduce(list(score ORDER BY rnk), (a, b) -> a + b)
               / {MARGIN_K}.0 AS aq
      FROM rq WHERE rnk <= {MARGIN_K} GROUP BY query_id
    ), rc AS (
      SELECT *, row_number() OVER (PARTITION BY cand_id
                                   ORDER BY score DESC, query_id) AS rnk
      FROM scored
    ), avg_c AS (
      SELECT cand_id,
             list_reduce(list(score ORDER BY rnk), (a, b) -> a + b)
               / {MARGIN_K}.0 AS ac
      FROM rc WHERE rnk <= {MARGIN_K} GROUP BY cand_id
    ), best AS (
      SELECT query_id, cand_id, score FROM rq WHERE rnk = 1
    )
    SELECT b.query_id, b.cand_id AS match_id,
           round(b.score / ((aq.aq + ac.ac) / 2.0), 6) AS margin,
           CAST(round(b.score / ((aq.aq + ac.ac) / 2.0), 6)
                >= {MARGIN_THRESHOLD} AS BIGINT) AS accepted
    FROM best b
    JOIN avg_q aq USING (query_id)
    JOIN avg_c ac ON ac.cand_id = b.cand_id
    ORDER BY query_id
    """,
)
def margin_mining_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based neighbor mining (Artetxe & Schwenk 2019, the LASER
    bitext-mining criterion): a query's best match is accepted only if
    its cosine BEATS the average of both endpoints' k-NN neighborhoods
    — the ratio margin that suppresses hubness false positives a plain
    cosine threshold cannot (a hub is near everything, so its
    neighborhood average is high and its margin stays ~1).

    The query side is a FIXED batch (vec_id % 10 == 0 below 500 — the
    mine-new-batch-against-corpus shape, constant like the knn
    baseline's query set, so cost scales linearly with the corpus, not
    quadratically); candidates here are the exact broadcast-queries x
    scan knn leg (the correctness baseline, as in
    knn_bruteforce_cosine); at 100 TB the candidate generator swaps for
    the registered IVF-PQ path and the margin arithmetic — which only
    ever touches Q x K and candidate-side top-k rows — is unchanged.

    Float discipline: cosines are the established bit-portable chain;
    neighborhood averages fold in rank order (ties broken by id); the
    margin is rounded to 6 decimals before emission AND before the
    accept comparison (the bm25 rule), so a last-ulp division
    difference cannot flip a decision."""
    emb = load_table(spark, sf_dir, "embeddings")
    from ..pin import pin

    is_q = (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 500)
    q = emb.where(is_q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # r13 (guide §2.4 "two operations keyed the same way share one
    # exchange"): `best` (rnk == 1) and the query-side neighborhood
    # average (rnk <= K) read the SAME row_number over the same window
    # — compute it once on the pinned relation instead of two
    # query_id-keyed window passes over two subtrees.
    wq = Window.partitionBy("query_id").orderBy(F.desc("score"), "cand_id")
    scored = pin(
        emb.where(~is_q)
        .join(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            cosine("qv", "embedding").alias("score"),
        )
        .withColumn("rnk_q", F.row_number().over(wq)),
        site="margin.scored",
    )

    def hood_avg(part_col: str, other_col: str, out: str) -> DataFrame:
        if part_col == "query_id":
            topk = scored.where(F.col("rnk_q") <= MARGIN_K).withColumn(
                "rnk", F.col("rnk_q")
            )
        else:
            w = Window.partitionBy(part_col).orderBy(
                F.desc("score"), F.col(other_col)
            )
            topk = scored.withColumn("rnk", F.row_number().over(w)).where(
                F.col("rnk") <= MARGIN_K
            )
        return topk.groupBy(part_col).agg(
            (
                F.aggregate(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("rnk", "score"))
                        ),
                        lambda s: s["score"],
                    ),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )
                / float(MARGIN_K)
            ).alias(out)
        )

    avg_q = hood_avg("query_id", "cand_id", "aq")
    avg_c = hood_avg("cand_id", "query_id", "ac")
    best = scored.where(F.col("rnk_q") == 1).select(
        "query_id", F.col("cand_id").alias("match_id"), "score"
    )
    margin = F.round(
        F.col("score") / ((F.col("aq") + F.col("ac")) / 2.0), 6
    )
    return (
        best.join(avg_q, "query_id")
        .join(avg_c.withColumnRenamed("cand_id", "match_id"), "match_id")
        .select(
            "query_id",
            "match_id",
            margin.alias("margin"),
            (margin >= MARGIN_THRESHOLD).cast("long").alias("accepted"),
        )
        .orderBy("query_id")
    )
