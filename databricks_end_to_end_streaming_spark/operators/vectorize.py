"""Feature-hashing text vectorizer (Weinberger et al. 2009, "Feature
Hashing for Large Scale Multitask Learning" — public paper; the
HashingTF/HashingVectorizer design in Spark MLlib / scikit-learn).

The bridge from the documents table to the vector operators: every
token hashes to one of ``dim`` buckets (md5 — the engine's stored-RNG-
free determinism convention), with a second hash bit giving each token
a +/-1 sign so colliding tokens cancel in expectation instead of
accumulating bias (the paper's unbiasedness trick). No vocabulary is
ever built or broadcast — the map is pure arithmetic, which is the
whole point at 100 TB: vectorization is a narrow map + one
partial-agg'd (doc, bucket) shuffle regardless of vocabulary size.

Sparse form (doc_id, bucket, weight) is the exchange format (and the
DuckDB-oracled contract — queries/text.py::hashed_tf_features); the
dense form packs it to array<double> per doc for the cosine/ANN/
SemDeDup operators downstream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def hashed_tf_sparse(
    docs: DataFrame, dim: int = 64, text_col: str = "text"
) -> DataFrame:
    """(doc_id, bucket, weight): signed hashed term counts. weight is an
    exact int64 (sum of +/-1 per token instance), so the relation is
    cross-engine replayable and mergeable (a monoid — partial relations
    from corpus slices just add)."""
    norm = F.trim(F.lower(F.regexp_replace(text_col, r"\s+", " ")))
    words = docs.select("doc_id", F.explode(F.split(norm, " ")).alias("w"))
    h = F.md5("w")
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim).alias(
        "bucket"
    )
    sign = F.when(F.substring(h, 9, 1) < "8", F.lit(1)).otherwise(F.lit(-1))
    return (
        words.select("doc_id", bucket, sign.alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").cast("long").alias("weight"))
    )


def hashed_tf_dense(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """(doc_id, vec array<double>): the dense packing of the sparse
    relation — map_from_entries + a sequence probe, all JVM-side. With
    ``normalize`` the vector is L2-unit (cosine-ready for the ANN /
    SemDeDup operators); all-zero vectors (possible via sign
    cancellation) are left as zeros, not NaN."""
    sparse = hashed_tf_sparse(docs, dim=dim, text_col=text_col)
    entries = sparse.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "weight"))
        ).alias("m")
    )
    # map subscript is key-lookup: probe with the bucket id itself.
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m")[i.cast("long")], F.lit(0)).cast(
            "double"
        ),
    )
    out = entries.select("doc_id", vec.alias("vec"))
    if normalize:
        nrm = F.sqrt(
            F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x)
        )
        out = out.select(
            "doc_id",
            F.when(
                nrm > 0, F.transform("vec", lambda x: x / nrm)
            )
            .otherwise(F.col("vec"))
            .alias("vec"),
        )
    return out
