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
from ..pin import pin
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
        # Same pin as dedup_minhash_lsh: the candidate relation feeds
        # the verify step's three consumers; without it each one re-runs
        # the signature+band subplan over the (cached) kept corpus.
        cand = lsh_candidate_pairs(sigs).transform(pin)
        pairs = verify_jaccard(cand, kept).where(
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
        return out.transform(pin)
    finally:
        kept.unpersist()


@query(
    "llm_clean_corpus_v2",
    # The full round-4 preprocessing DAG in SQL: the span-scrub CTE is
    # the dedup_ngram_span_removal oracle, then gate -> exact dedup on
    # the CLEANED fingerprint -> per-lang accounting.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents
    ), grams AS (
      SELECT doc_id, i AS pos, array_to_string(list_slice(ws, i, i + 2), ' ') AS gram
      FROM toks, unnest(generate_series(1, len(ws) - 2)) AS t(i)
    ), hot AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING count(DISTINCT doc_id) >= greatest(
        5, (SELECT (count(*) * 1 + 99) // 100 FROM documents))
    ), covered AS (
      SELECT DISTINCT s.doc_id, s.pos + u.d AS p
      FROM (SELECT doc_id, pos FROM grams WHERE gram IN (SELECT gram FROM hot)) s,
           unnest(generate_series(0, 2)) AS u(d)
    ), words AS (
      SELECT doc_id, i AS pos, ws[i] AS w
      FROM toks, unnest(generate_series(1, len(ws))) AS t(i)
    ), kept AS (
      SELECT w.doc_id, w.pos, w.w FROM words w
      WHERE NOT EXISTS (
        SELECT 1 FROM covered c WHERE c.doc_id = w.doc_id AND c.p = w.pos
      )
    ), scrubbed AS (
      SELECT t.doc_id,
             CAST(count(k.w) AS BIGINT) AS n_tokens_clean,
             CAST(len(t.ws) - count(k.w) AS BIGINT) AS n_removed,
             coalesce(string_agg(k.w, ' ' ORDER BY k.pos), '') AS cleaned_text
      FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
      GROUP BY t.doc_id, t.ws
    ), gated AS (
      SELECT s.doc_id, d.lang, s.n_tokens_clean, s.n_removed,
             md5(s.cleaned_text) AS fingerprint
      FROM scrubbed s JOIN documents d USING (doc_id)
      WHERE s.n_tokens_clean >= {MIN_TOKENS}
        AND s.n_tokens_clean <= {MAX_TOKENS}
    ), deduped AS (
      SELECT * FROM (
        SELECT gated.*, row_number() OVER (PARTITION BY fingerprint
                                           ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens_clean) AS BIGINT) AS total_tokens,
           CAST(sum(n_removed) AS BIGINT) AS boilerplate_tokens_removed,
           CAST(sum(n_tokens_clean) AS DOUBLE) / count(*) AS avg_tokens
    FROM deduped
    GROUP BY lang
    """,
)
def llm_clean_corpus_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 cleaning DAG: duplicated-SPAN scrubbing first (so shared
    boilerplate can't glue distinct docs into near-dups or inflate token
    budgets), THEN the token-count gate on the cleaned length, THEN
    exact dedup on the cleaned fingerprint (boilerplate-only differences
    collapse to one copy), per-language accounting last. Order matters
    and is the order real pipelines use: scrub -> gate -> dedup.

    Scale shape: the span stage's one gram-DF shuffle + broadcast probe
    (operators/spans.py), a doc-keyed join back for lang, one
    fingerprint window, one partial-agg rollup. Text leaves the plan at
    the fingerprint step; nothing quadratic anywhere."""
    from ..operators.spans import remove_duplicate_ngram_spans

    d = load_table(spark, sf_dir, "documents")
    scrubbed = remove_duplicate_ngram_spans(d, "text", "doc_id", k=3, min_df=5)
    gated = (
        scrubbed.withColumn(
            "n_tokens_clean", F.col("n_tokens") - F.col("n_removed")
        )
        .where(
            (F.col("n_tokens_clean") >= MIN_TOKENS)
            & (F.col("n_tokens_clean") <= MAX_TOKENS)
        )
        .join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens_clean",
            "n_removed",
            F.md5(F.col("cleaned_text").cast("binary")).alias("fingerprint"),
        )
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens_clean").alias("total_tokens"),
        F.sum("n_removed").alias("boilerplate_tokens_removed"),
        (F.sum("n_tokens_clean").cast("double") / F.count("*")).alias(
            "avg_tokens"
        ),
    )


@query(
    "corpus_snapshot_diff",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang, text,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
               AS n_tokens,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ), gated AS (
      SELECT * FROM feats
      WHERE n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}
    ), deduped AS (
      SELECT * FROM (
        SELECT gated.*, row_number() OVER (PARTITION BY fingerprint
                                           ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    ), newsnap AS (
      SELECT doc_id,
             lower(regexp_replace(text, '\\s+', ' ', 'g')) AS text
      FROM deduped
    ), d AS (
      SELECT o.doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'dropped'
                  WHEN o.text = n.text THEN 'unchanged'
                  ELSE 'modified' END AS status,
             o.lang, o.n_tokens
      FROM feats o FULL OUTER JOIN newsnap n USING (doc_id)
    )
    SELECT status, lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM d GROUP BY status, lang
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What did the clean pass actually do, per language: the raw corpus
    diffed against the cleaned snapshot (quality gate + exact dedup +
    whitespace/case canonicalization) through the generic
    ``operators/diff.py::table_diff`` audit primitive. 'dropped' = gated
    out or dedup loser, 'modified' = survived but canonicalization
    changed the text, 'unchanged' = survived verbatim ('added' can't
    occur in this instantiation — a clean pass introduces no rows — but
    the operator supports it and pytest exercises it). Each side hashes
    its compare columns to one md5 map-side, so the single full-outer
    shuffle carries key+hash, never the text twice; the rollup is one
    partial-agg'd shuffle over the status relation."""
    from ..operators.diff import table_diff

    d = load_table(spark, sf_dir, "documents")
    old = _features(d).select("doc_id", "lang", "n_tokens", "text")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    new = clean_corpus(d).select(
        "doc_id", "lang", "n_tokens", norm.alias("text")
    )
    diff = table_diff(
        old, new, keys=["doc_id"], compare_cols=["text"],
        passthrough=["lang", "n_tokens"],
    )
    return diff.groupBy("status", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


# ------------------------------------------ deterministic shuffle

SHUFFLE_SEED = 42
DOCS_PER_FILE = 64


@query(
    "deterministic_corpus_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             md5('{SHUFFLE_SEED}|' || CAST(doc_id AS VARCHAR)) AS hk
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY hk, doc_id) AS position
      FROM h
    )
    SELECT doc_id, position,
           (position - 1) // {DOCS_PER_FILE} AS file_id
    FROM r
    """,
)
def deterministic_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global corpus shuffle — the reproducible training-order
    manifest: every document gets a global position under the md5(seed |
    doc_id) permutation and a training-file assignment (position div
    {DOCS_PER_FILE}). Reruns with the same seed reproduce the order
    exactly (resumable training); a new seed is a fresh epoch
    permutation with no data movement beyond re-ranking.

    Scale shape: the ONE thing this must never be is a 1-partition
    ORDER BY window — position comes from the range-partitioned
    global-rank machinery (operators/ranking.py: per-partition sort +
    size offsets; hash keys are uniform by construction so the range
    partitions are balanced without sampling skew). Everything else is
    map-only hashing."""
    from ..operators.ranking import global_row_number

    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.md5(
            F.concat(F.lit(f"{SHUFFLE_SEED}|"), F.col("doc_id").cast("string"))
        ).alias("hk"),
    )
    r = global_row_number(h, ["hk", "doc_id"], "position")
    return r.select(
        "doc_id",
        F.col("position").cast("bigint").alias("position"),
        ((F.col("position") - 1) / DOCS_PER_FILE).cast("bigint").alias(
            "file_id"
        ),
    )


# ------------------------------------------ rendezvous resharding

RDV_OLD_SHARDS = 12
RDV_NEW_SHARDS = 15  # 3 shards added: expected movement = 3/15 of docs

_RDV_W = (
    "CAST(conv(substring(md5(concat('rdv|', CAST(doc_id AS STRING), '|',"
    " CAST({s} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
)


def _rdv_argmax(n_shards: int) -> F.Column:
    """Highest-random-weight (rendezvous) shard for each doc over
    shards 0..n_shards-1: strict > keeps the FIRST maximum, so ties
    (cryptographically negligible at 60 bits, but defined) break to the
    smaller shard id — mirrored by the oracle's ORDER BY w DESC, s ASC."""
    w = _RDV_W.format(s="s")
    return F.expr(
        f"""
        aggregate(
          sequence(0L, {n_shards - 1}L),
          named_struct('w', -1L, 's', -1L),
          (acc, s) -> IF({w} > acc.w, named_struct('w', {w}, 's', s), acc)
        ).s
        """
    )


@query(
    "reshard_movement_rendezvous",
    # Full replay: both engines weight (doc, shard) with the identical
    # md5-prefix integer (the simhash token-hash idiom) and take the
    # highest-random-weight shard, so the green hash verifies the HRW
    # assignment itself AND its minimal-movement property — the oracle's
    # n_incoming is 0 for every surviving shard by construction, which a
    # mod-N rehash (moves ~(1 - 1/gcd) of everything, scattering into
    # old shards too) could never hash-match.
    oracle=f"""
    WITH w AS (
      SELECT d.doc_id, s.s,
             ('0x' || substr(md5('rdv|' || CAST(d.doc_id AS VARCHAR) || '|'
                                 || CAST(s.s AS VARCHAR)), 1, 15))::BIGINT
               AS w
      FROM documents d, (SELECT unnest(range(0, {RDV_NEW_SHARDS})) AS s) s
    ), rank_new AS (
      SELECT doc_id, s,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY w DESC, s ASC) AS rn
      FROM w
    ), new_assign AS (
      SELECT doc_id, s AS new_s FROM rank_new WHERE rn = 1
    ), rank_old AS (
      SELECT doc_id, s,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY w DESC, s ASC) AS rn
      FROM w WHERE s < {RDV_OLD_SHARDS}
    ), old_assign AS (
      SELECT doc_id, s AS old_s FROM rank_old WHERE rn = 1
    )
    SELECT n.new_s AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n.new_s <> o.old_s THEN 1 ELSE 0 END)
                AS BIGINT) AS n_incoming
    FROM new_assign n JOIN old_assign o USING (doc_id)
    GROUP BY 1 ORDER BY shard
    """,
)
def reshard_movement_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshard-movement plan under rendezvous (highest-random-weight)
    hashing — Thaler & Ravishankar 1996, the consistent-placement
    scheme behind cache/storage rings: growing 12 -> 15
    shards moves ONLY the documents whose argmax lands on a NEW shard
    (expected 3/15 here), because removing no shard can change which of
    the surviving shards holds the max weight. A mod-N rehash would
    move ~everything and scatter it everywhere; this query is the
    accounting a 100 TB store runs BEFORE a topology change to size the
    copy job. Per new-shard row: how many docs land there and how many
    of those must move (n_incoming = n_docs on added shards, 0 on
    surviving shards — the minimal-movement invariant, hash-verified
    every round).

    Shape at 100 TB: the double argmax is map-only JVM HOF work (one
    md5 per (doc, shard) candidate — the inherent O(shards) HRW cost
    per key; big rings amortize via skeleton trees, documented not
    built); the ONE shuffle is the shard-count-sized groupBy."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return reshard_partials(d).orderBy("shard")


def reshard_partials(d: DataFrame) -> DataFrame:
    """(shard, n_docs, n_incoming) over a doc_id relation — the
    per-shard movement partial shared by the batch query and the
    streaming twin (streaming/reshard_stage.py): each doc is assigned
    independently, so per-batch partials fold to the corpus answer by
    addition."""
    assign = d.select(
        "doc_id",
        _rdv_argmax(RDV_NEW_SHARDS).alias("new_s"),
        _rdv_argmax(RDV_OLD_SHARDS).alias("old_s"),
    )
    return assign.groupBy(F.col("new_s").alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (F.col("new_s") != F.col("old_s")).cast("long")
        ).alias("n_incoming"),
    )
