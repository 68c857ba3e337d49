"""The north-star composition: an LLM training-data cleaning pipeline
over ``documents``, end to end — the workload the extension operators
exist for. Two registrations:

* llm_clean_corpus (oracled): quality gate -> exact dedup -> per-doc
  token accounting. Fully SQL-expressible, hash-checked.
* llm_clean_corpus_neardup (rows-only): the same plus MinHash-LSH
  near-duplicate removal (keep the lowest doc_id of each verified pair)
  — LSH banding isn't SQL-expressible; pytest covers the removal rule.

Shape at 100 TB: one narrow projection pass for features, one md5
hash-groupBy for exact dedup, the LSH candidate pipeline for near-dups
(tiny band-key shuffles), one anti-join to drop losers. No step holds
more than (doc_id, small scalars) after the first projection except the
LSH verify, which touches candidate pairs only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load_table
from . import query

MIN_TOKENS = 20
MAX_TOKENS = 2000


def _features(d: DataFrame) -> DataFrame:
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    n_tokens = F.size(F.split(F.trim("text"), " +")).cast("long")
    return d.select(
        "doc_id",
        "lang",
        "text",
        n_tokens.alias("n_tokens"),
        F.md5(norm.cast("binary")).alias("fingerprint"),
    )


def clean_corpus(d: DataFrame) -> DataFrame:
    """Quality gate + exact dedup (keep lowest doc_id per fingerprint)."""
    feats = _features(d).where(
        (F.col("n_tokens") >= MIN_TOKENS) & (F.col("n_tokens") <= MAX_TOKENS)
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        feats.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens", "fingerprint", "text")
    )


@query(
    "llm_clean_corpus",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ), gated AS (
      SELECT * FROM feats WHERE n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}
    ), deduped AS (
      SELECT * FROM (
        SELECT gated.*, row_number() OVER (PARTITION BY fingerprint
                                           ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
    FROM deduped
    GROUP BY lang
    """,
)
def llm_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned-corpus accounting per language: docs kept and token
    budget after the quality gate + exact dedup."""
    d = load_table(spark, sf_dir, "documents")
    kept = clean_corpus(d)
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
    )


@query(
    "llm_clean_corpus_neardup",
    # Oracle: the whole pipeline in SQL, with the LSH near-dup stage
    # replaced by exact all-pairs jaccard over the gated+deduped corpus
    # (quadratic — fine for DuckDB at sf0.01). Equality asserts both the
    # removal rule (drop the higher doc_id of each verified pair) and the
    # LSH stage's recall on this corpus.
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang, text,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ), gated AS (
      SELECT * FROM feats WHERE n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}
    ), deduped AS (
      SELECT * FROM (
        SELECT gated.*, row_number() OVER (PARTITION BY fingerprint
                                           ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(
                 lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) - 2, 1) + 1),
               i -> array_to_string(string_split(
                 lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ')[i:i+2], ' ')
             )) AS shingles
      FROM deduped
    ), losers AS (
      SELECT DISTINCT b.doc_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
              (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) >= 0.7
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM deduped
    WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    GROUP BY lang
    """,
)
def llm_clean_corpus_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline including near-duplicate removal: of every verified
    near-dup pair, the higher doc_id is dropped (anti-join against the
    losers set).

    ``kept`` feeds three branches (signatures, verify re-scan, final
    anti-join), so it is persisted for the run and released in
    ``finally`` — the tiny per-language aggregate is materialized before
    return so the cache never outlives the query (SURVEY T8 hygiene)."""
    from .dedup import (
        NEARDUP_THRESHOLD,
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard,
    )

    d = load_table(spark, sf_dir, "documents")
    kept = clean_corpus(d).persist()
    try:
        sigs = minhash_signatures(kept)
        pairs = verify_jaccard(lsh_candidate_pairs(sigs), kept).where(
            F.col("jaccard") >= NEARDUP_THRESHOLD
        )
        losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        final = kept.join(losers, "doc_id", "left_anti")
        out = final.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        # Materialize the (few-row) aggregate so unpersist is safe before
        # the caller's action — executor-side, no driver round-trip.
        return out.localCheckpoint(eager=True)
    finally:
        kept.unpersist()
