"""Deduplication operators over ``documents`` (north-star extensions).

Exact dedup is a hash-groupBy; near-dup is MinHash+LSH expressed entirely
in built-in JVM functions (shingle -> minhash -> band -> bucket join) so
the hot path never leaves whole-stage codegen. At 100 TB the LSH variant
is the only workable shape: candidate generation is a shuffle on band
signatures (tiny rows), and the exact-Jaccard verification only touches
candidate pairs instead of the O(n^2) cross product.

Algorithm background: Broder's MinHash (1997) and the standard banding
construction (Mining of Massive Datasets §3.4) — public literature.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table
from . import query

SHINGLE_K = 5  # character shingle width
N_HASHES = 16  # minhash signature length
N_BANDS = 4  # 4 bands x 4 rows: catches jaccard >~ 0.5 pairs w.h.p.
ROWS_PER_BAND = N_HASHES // N_BANDS


def _norm(col: str = "text") -> F.Column:
    return F.lower(F.regexp_replace(col, r"\s+", " "))


@query(
    "dedup_exact",
    oracle="""
    SELECT
      md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
      min(doc_id) AS canonical_doc_id,
      count(*)    AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-content fingerprint,
    keeping the lowest doc_id as canonical. One shuffle on the md5 key —
    uniformly distributed, so no skew at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(_norm().cast("binary")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_minhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + a ``signature`` array<bigint> of N_HASHES minhashes.

    Shingles and hashing stay inside built-in higher-order functions:
    sequence/transform produce the k-char shingles, xxhash64 (seeded by
    index via string salt) simulates the independent hash family, and
    array_min folds each into a signature slot.
    """
    norm = _norm(text_col)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (SHINGLE_K - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(SHINGLE_K)),
        )
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("shingles"), lambda s, seed=h: F.xxhash64(s, F.lit(seed))
                )
            )
            for h in range(N_HASHES)
        ]
    )
    return (
        df.select("doc_id", shingles.alias("shingles"))
        .where(F.size("shingles") > 0)
        .select("doc_id", sig.alias("signature"), "shingles")
    )


def minhash_lsh_candidates(sigs: DataFrame) -> DataFrame:
    """Band the signatures and self-join on (band_id, band_signature) to
    produce candidate pairs (doc_a < doc_b). The join key is a 64-bit hash
    of each band's slice, so the shuffle rows are tiny regardless of
    document size."""
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[
                                F.col("signature")[i]
                                for i in range(
                                    b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND
                                )
                            ]
                        ).alias("band_sig"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_sig")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def exact_jaccard(pairs: DataFrame, sigs: DataFrame) -> DataFrame:
    """Verify candidates with exact shingle-set Jaccard (array_intersect /
    array_union on the shingle arrays) — touches only candidate pairs."""
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
    )


@query("dedup_minhash_lsh")  # streaming-state-free but not SQL-expressible
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification
    (jaccard >= 0.5). Rows-only driver check; exactness is pytest-verified
    against a pure-Python reference on planted near-dups
    (tests/test_dedup.py)."""
    d = load_table(spark, sf_dir, "documents")
    sigs = shingle_minhash(d)
    pairs = minhash_lsh_candidates(sigs)
    return (
        exact_jaccard(pairs, sigs)
        .where(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_ngram_overlap_sample",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, length(lower(regexp_replace(text, '\\s+', ' ', 'g'))) - 2),
               i -> substr(lower(regexp_replace(text, '\\s+', ' ', 'g')), i, 4)
             )) AS shingles
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
             (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    """,
)
def dedup_ngram_overlap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-gram Jaccard over a doc sample — the oracle-checkable
    ground truth that the LSH pipeline approximates. (Quadratic; gated to
    a small id range — LSH is the scale path.)"""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    norm = _norm()
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - 3),
            lambda i: norm.substr(i, F.lit(4)),
        )
    )
    sh = d.select("doc_id", shingles.alias("shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )
