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


@query("multimodal_image_stats")
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing at driver scale: treat each document's UTF-8
    bytes as a fake/raw 1 x n_chars x 1 raster and run the Arrow-batched
    feature extractor. (Deterministic stub decode — multimodal.py.)"""
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
    return image_feature_stats(media)
