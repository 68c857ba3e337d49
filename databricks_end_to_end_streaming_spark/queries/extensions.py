"""Driver-registered queries for the operators/ package (SimHash, ANN,
multimodal). These are genuinely non-SQL-expressible (pandas UDFs /
probabilistic structures), so they register rows-only; exactness is
covered in tests/test_operators.py against NumPy/pure-Python references.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import image_feature_stats
from ..operators.simhash import simhash_neardup_pairs
from ..operators.similarity import ann_lsh_topk
from ..tables import load_table
from . import query


@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) over documents."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_neardup_pairs(d)


@query("ann_lsh_cosine_topk")
def ann_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-5 for the same query set as
    knn_bruteforce_cosine, via hyperplane-LSH bucketing (the scale path;
    recall vs brute force is pytest-checked)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # bucket width sized to corpus: 2^6 buckets x 8 tables keeps ~10%
    # of the corpus as candidates per query at sf0.1 scale
    return ann_lsh_topk(emb, F.broadcast(queries), k=5, n_bits=6, n_tables=8)


@query("ann_ivf_cosine_topk")
def ann_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-5: k-means coarse quantizer
    trained on a deterministic sample, corpus partitioned into inverted
    lists, queries probe their 3 nearest lists. The clustered-corpus
    counterpart to the hyperplane-LSH path; recall pytest-checked with
    planted twins (tests/test_ivf.py)."""
    from ..operators.similarity import ivf_topk, train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_centroids=16)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ivf_topk(emb, queries, cents, k=5, nprobe=3)


@query(
    "multimodal_image_stats",
    # The documents corpus is pure ASCII (verified: octet_length(encode(text))
    # == length(text) at every sf), so per-character code points ARE the
    # UTF-8 bytes the Spark side decodes. mean/std are the same fixed IEEE
    # expression over exact integer moments as image_feature_stats computes,
    # so the doubles match bit-for-bit.
    oracle="""
    WITH bytes AS (
      SELECT doc_id, unicode(substr(text, CAST(i AS INTEGER), 1)) AS b
      FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
            FROM documents)
    ), m AS (
      SELECT doc_id,
             count(*)  AS n,
             sum(b)    AS sx,
             sum(b*b)  AS sx2,
             min(b)    AS mn,
             max(b)    AS mx,
             count(*) FILTER (WHERE b // 64 = 0) AS h0,
             count(*) FILTER (WHERE b // 64 = 1) AS h1,
             count(*) FILTER (WHERE b // 64 = 2) AS h2,
             count(*) FILTER (WHERE b // 64 = 3) AS h3
      FROM bytes GROUP BY doc_id
    )
    SELECT doc_id AS media_id,
           CAST(sx AS DOUBLE) / n AS mean_intensity,
           sqrt(greatest(0.0, CAST(sx2 AS DOUBLE) / n
                - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
             AS std_intensity,
           CAST(mn AS INTEGER) AS min_intensity,
           CAST(mx AS INTEGER) AS max_intensity,
           CAST(h0 AS BIGINT) AS hist_0,
           CAST(h1 AS BIGINT) AS hist_1,
           CAST(h2 AS BIGINT) AS hist_2,
           CAST(h3 AS BIGINT) AS hist_3
    FROM m
    """,
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing at driver scale: treat each document's UTF-8
    bytes as a fake/raw 1 x n_chars x 1 raster and run the Arrow-batched
    feature extractor. (Deterministic stub decode — multimodal.py.)

    Driver-facing projection flattens the 4-bin histogram to scalar
    columns (hist_0..hist_3) — array columns can't be canonicalized by
    the driver's sort/hash compare."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.length("text").cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(1).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )
    stats = image_feature_stats(media)
    return stats.select(
        "media_id",
        "mean_intensity",
        "std_intensity",
        "min_intensity",
        "max_intensity",
        *[F.col("histogram")[i].alias(f"hist_{i}") for i in range(4)],
    )


@query("pq_quantize_embeddings")  # rows-only: k-means codebooks aren't SQL
def pq_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize the embedding corpus: 64-dim float -> 8 one-byte
    codes (32x compression) + per-vector squared reconstruction error.
    Codes are flattened to scalar columns for the driver check;
    exactness/recall is pytest-covered (tests/test_pq.py)."""
    from ..operators.pq import pq_encode, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb)
    coded = pq_encode(emb, books)
    return coded.select(
        "vec_id",
        *[F.col("codes")[i].alias(f"code_{i}") for i in range(8)],
        "recon_err",
    )


@query("ann_pq_adc_topk")  # rows-only: approximate by construction
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-domain ANN: the same 8-query top-5 task as the
    brute-force/LSH/IVF variants, but scored against PQ codes via
    asymmetric distance (full-precision query x quantized corpus) —
    the memory-bound regime's search path."""
    from ..operators.pq import pq_adc_topk, pq_encode, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb)
    coded = pq_encode(emb, books).select("vec_id", "codes")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return pq_adc_topk(coded, queries, books, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


@query("cms_token_heavy_hitters")  # rows-only: sketch estimates
def cms_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the 20 most frequent
    tokens: build the d x w grid over all token occurrences, then
    point-query the candidate set. Estimates are one-sided (>= exact);
    exactness bounds and mergeability are pytest-covered
    (tests/test_cms.py). The exact twin for small corpora is
    vocab_topk_per_lang."""
    from ..operators.cms import cms_build, cms_estimate

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim("text"), " +")).alias("item")
    )
    sketch = cms_build(toks)
    candidates = (
        toks.groupBy("item")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "item")
        .limit(20)
        .select("item")
    )
    return cms_estimate(sketch, candidates).orderBy("item")
