"""Text-analysis operators over the ``documents`` table (north-star
extensions: the pieces a large-scale LLM training-data pipeline needs).

All four are pure built-in-function pipelines — no Python UDFs — so they
run JVM-side inside whole-stage codegen and scale linearly with the scan.
Cross-engine determinism tricks:

* Occurrence counts use replace()-length arithmetic (integer-exact, no
  regex-dialect drift between Spark and DuckDB).
* Ratios are a single IEEE double division of two exact integers.
* Fingerprints are md5 over an identically-normalized string.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load_table
from . import query

# Marker stopwords for the language-id heuristic: counts of these (as
# whole words) vote for a language. Deliberately tiny — it's an n-gram
# heuristic, not a model; the point is the distributed shape + parity.
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
}


def _occurrences(col: str, needle: str) -> F.Column:
    """Count non-overlapping occurrences of ``needle`` via replace-length
    arithmetic — exact integer math, portable to any SQL engine."""
    padded = F.concat(F.lit(" "), F.col(col), F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(f" {needle} "), F.lit(" "))))
        / (F.length(F.lit(f"{needle} ")))
    ).cast("long")


def _occurrences_sql(col: str, needle: str) -> str:
    padded = f"concat(' ', {col}, ' ')"
    return (
        f"CAST((length({padded}) - length(replace({padded}, ' {needle} ', ' ')))"
        f" / {len(needle) + 1} AS BIGINT)"
    )


@query(
    "text_token_stats",
    oracle="""
    SELECT
      doc_id,
      CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
      CAST(length(text) AS BIGINT) AS n_chars_actual,
      CAST(length(text) AS DOUBLE) /
        CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS chars_per_token
    FROM documents
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — the cheapest proxy for LLM token budget
    accounting; one narrow projection, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), " +")).cast("long")
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        (F.length("text").cast("double") / n_tokens).alias("chars_per_token"),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT
      doc_id,
      n_tokens,
      the_hits,
      CAST(n_tokens AS DOUBLE) / n_chars_actual AS token_density,
      CAST(the_hits AS DOUBLE) / n_tokens       AS stopword_ratio
    FROM (
      SELECT
        doc_id,
        CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
        CAST(length(text) AS BIGINT) AS n_chars_actual,
        CAST((length(concat(' ', text, ' ')) -
              length(replace(concat(' ', text, ' '), ' the ', ' '))) / 4 AS BIGINT)
          AS the_hits
      FROM documents
    )
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features (length / token-density / stopword
    ratio) used to filter noisy documents before training."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), " +")).cast("long")
    n_chars = F.length("text").cast("long")
    the_hits = _occurrences("text", "the")
    base = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_actual"),
        the_hits.alias("the_hits"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "the_hits",
        (F.col("n_tokens").cast("double") / F.col("n_chars_actual")).alias(
            "token_density"
        ),
        (F.col("the_hits").cast("double") / F.col("n_tokens")).alias("stopword_ratio"),
    )


def _lang_vote_spark(col: str) -> F.Column:
    """Pick the language whose marker-word hit count is highest
    (ties break by language code order, via the > comparison chain)."""
    scores = {
        lang: sum([_occurrences(col, w) for w in words], F.lit(0).cast("long"))
        for lang, words in _LANG_MARKERS.items()
    }
    best_lang = F.lit("unknown")
    best_score = F.lit(0).cast("long")
    for lang in sorted(_LANG_MARKERS):  # later langs must strictly beat
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best_lang


def _lang_vote_sql(col: str) -> str:
    def score(lang: str) -> str:
        return " + ".join(_occurrences_sql(col, w) for w in _LANG_MARKERS[lang])

    # Mirror the Spark fold exactly: iterate langs in sorted order, a new
    # lang wins only with a strictly higher score.
    expr_lang, expr_score = "'unknown'", "CAST(0 AS BIGINT)"
    for lang in sorted(_LANG_MARKERS):
        s = f"({score(lang)})"
        expr_lang = f"CASE WHEN {s} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN {s} > {expr_score} THEN {s} ELSE {expr_score} END"
    return expr_lang


@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS lang_labeled, {_lang_vote_sql('text')} AS lang_predicted
    FROM documents
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language identification (n-gram heuristic family).
    Scores every language's stopword hits in one projection pass."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        _lang_vote_spark("text").alias("lang_predicted"),
    )


# GPT-2-style pre-tokenizer, RE2-compatible subset (no lookahead): runs
# identically under Java regex (Spark) and RE2 (DuckDB). Public pattern
# family from the GPT-2 BPE paper/reference implementations.
BPE_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


@query(
    "text_bpe_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}')) AS BIGINT)
             AS n_bpe_pretokens,
           CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
             AS n_ws_tokens
    FROM documents
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-token counting (the LLM token-budget estimator) next
    to whitespace tokens — both as JVM-side regexp built-ins."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_bpe_pretokens"),
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("n_ws_tokens"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT
      doc_id,
      md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
      substr(md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 8) AS bucket
    FROM documents
    """,
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized content fingerprint — the join key for exact
    dedup and the partition key for sharded near-dup passes."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = F.md5(norm.cast("binary"))
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("bucket"),
    )


def split_bucket(id_col: F.Column) -> F.Column:
    """The one 12/2/2 md5 train/val/test bucketing rule — shared by the
    per-document split below and the near-dup-cluster split
    (queries/dedup.py::neardup_safe_split), so the two can never fork
    the split semantics. Last hex char of md5(CAST(id AS STRING)):
    0-b train, c-d val, e-f test."""
    b = F.substring(F.md5(id_col.cast("string").cast("binary")), 32, 1)
    return (
        F.when(b.isin(*"0123456789ab"), "train")
        .when(b.isin("c", "d"), "val")
        .otherwise("test")
    )


@query(
    "dataset_split_deterministic",
    oracle="""
    WITH tagged AS (
      SELECT n_chars,
             CASE
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                    IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                 THEN 'train'
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) IN ('c','d')
                 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM tagged
    GROUP BY split
    """,
)
def dataset_split_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5 hash bucket of the
    document id (12/2/2 sixteenths) — the reproducible-sampling primitive
    a training-data pipeline needs: membership is a pure function of the
    id, so re-runs, backfills, and incremental arrivals land in the same
    split with no coordination or stored state. Scales as a single
    stateless map + one 3-group aggregate (no shuffle wider than the
    final 3-row combine)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(split_bucket(F.col("doc_id")).alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        )
    )


@query(
    "text_repetition_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS l
      FROM documents
    ), bigrams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS bg
      FROM toks
    ), counts AS (
      SELECT doc_id, bg, count(*) AS c
      FROM bigrams GROUP BY doc_id, bg
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
    FROM counts
    GROUP BY doc_id
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (Gopher-style): the fraction of a
    document's word bigrams taken by its single most frequent bigram —
    high values flag boilerplate/spam for corpus filtering. Bigrams are
    formed with posexplode + lead() over the in-document position (NOT a
    transform() lambda over the token array, which re-evaluates the
    split per element under CollapseProject); the two aggregations both
    key on doc_id, so the second is shuffle-free after the first."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.lower(F.regexp_replace("text", r"\s+", " ")))
    words = d.select(
        "doc_id", F.posexplode(F.split(norm, " ")).alias("pos", "w")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        words.withColumn("w2", F.lead("w").over(w))
        .where(F.col("w2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w2").alias("bg"))
    )
    counts = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
            "top_bigram_frac"
        ),
    )


@query(
    "corpus_stats_by_source",
    oracle="""
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(length(text)) AS DOUBLE) / count(*) AS avg_chars
    FROM documents
    GROUP BY source, lang
    """,
)
def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus accounting — the first dashboard any
    training-data pipeline needs (where is my data coming from, how much,
    how long). One partial-agg shuffle on a low-cardinality key."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum(F.length("text")).cast("double") / F.count("*")).alias("avg_chars"),
    )


@query(
    "vocab_topk_per_lang",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ), counts AS (
      SELECT lang, token, count(*) AS n FROM toks GROUP BY lang, token
    )
    SELECT lang, token, CAST(n AS BIGINT) AS n, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT lang, token, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, token) AS rn
      FROM counts
    ) WHERE rn <= 5
    """,
)
def vocab_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary building step: the top-5 most frequent
    whitespace tokens per language (deterministic tiebreak on the token).
    explode -> two-level agg (partial map-side combine on (lang, token))
    -> per-lang top-k window over the tiny counts relation; the heavy
    explode never passes through the window."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(F.split(F.trim("text"), " +")).alias("token"))
    counts = toks.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "token")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("lang", "token", "n", "rank")
    )


@query(
    "stratified_sample_per_lang",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
    """,
)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% sample by hash bucket (md5 prefix < '40' covers
    64/256 of the first-byte space): seed-free, reproducible across runs,
    engines, and cluster sizes — the sampling discipline a training-data
    pipeline needs so reruns pick the SAME documents (unlike
    df.sample(), whose output depends on partitioning). Stratification
    is implicit: the hash is independent of lang, so each language is
    sampled at the same rate. Pure narrow filter; no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.where(bucket < "40").select("doc_id", "lang")


@query(
    "doc_length_deciles",
    oracle="""
    WITH ranked AS (
      SELECT n_chars, ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM ranked
    GROUP BY decile
    """,
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact document-length decile summary WITHOUT a single-partition
    window: global ranks come from range-repartition + per-partition
    offsets (operators/ranking.py — the TeraSort-style shape that
    survives 100 TB, where Window.orderBy() without partitionBy would
    funnel the corpus through one task), and NTILE buckets are computed
    arithmetically from the rank."""
    from ..operators.ranking import global_row_number, ntile_from_rank

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    total = d.count()  # one scalar action; the corpus itself never moves
    ranked = global_row_number(d, ["n_chars", "doc_id"])
    return (
        ranked.withColumn("decile", ntile_from_rank("rank", total, 10))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


CHUNK_SIZE = 50
CHUNK_STRIDE = 40  # 10-token overlap between consecutive chunks


@query(
    "text_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(trim(text), ' +') AS t,
             len(string_split_regex(trim(text), ' +')) AS n
      FROM documents
    ), chunks AS (
      SELECT doc_id, n,
             unnest(range(0, CAST(greatest(
               ceil((n - {CHUNK_SIZE}) / CAST({CHUNK_STRIDE} AS DOUBLE)), 0)
               AS BIGINT) + 1)) AS chunk_idx
      FROM toks
    )
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(least(n - chunk_idx * {CHUNK_STRIDE}, {CHUNK_SIZE}) AS BIGINT)
             AS chunk_tokens
    FROM chunks
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping chunking (size {CHUNK_SIZE}, stride
    {CHUNK_STRIDE}) — the context-window packing step of a training-data
    pipeline. Chunk boundaries are pure arithmetic on the token count;
    the explode multiplies rows by ~n/stride, and the heavy text column
    is dropped before the explode so the generated rows are tiny."""
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim("text"), " +"))
    n_chunks = (
        F.greatest(
            F.ceil((n - CHUNK_SIZE) / F.lit(float(CHUNK_STRIDE))), F.lit(0)
        ).cast("long")
        + 1
    )
    base = d.select("doc_id", n.alias("n"), n_chunks.alias("n_chunks"))
    return base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("ci"),
        "n",
    ).select(
        "doc_id",
        F.col("ci").cast("int").alias("chunk_idx"),
        F.least(
            F.col("n") - F.col("ci") * CHUNK_STRIDE, F.lit(CHUNK_SIZE)
        ).cast("long").alias("chunk_tokens"),
    )


@query(
    "sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT lang, n_tokens,
             (CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
              - n_tokens) // 512 AS pack_id
      FROM toks
    )
    SELECT lang, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY lang, pack_id
    ORDER BY lang, pack_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (concat-then-chunk): documents are laid
    end-to-end per language in doc_id order and assigned to the
    512-token context window their FIRST token lands in — the standard
    packing recipe that turns a ragged corpus into fixed-size training
    sequences. Output is per-(lang, pack) accounting.

    Scale shape: one running-sum window per lang partition (the packing
    order must be a total order anyway for reproducibility) + one
    partial-agg'd group. A pathologically dominant language would make
    one partition's sort hot; the range-partitioned global-rank machinery
    in operators/ranking.py is the drop-in fix at that point.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "pack_id", F.expr("(cum - n_tokens) div 512")
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


# Next-fit packing: bin budget and the integer state encoding. State is
# ONE int64: completed_bins * 2^20 + running_tokens (running <= budget
# << 2^20), so the whole sequential fold is exact integer arithmetic
# that Spark's aggregate() HOF and DuckDB's list_reduce express
# IDENTICALLY — a per-group sequential algorithm with a hash-checkable
# oracle and zero Python.
PACK_BUDGET = 256
_PACK_ENC = 1 << 20
PACK_SHARDS = 4


@query(
    "packing_next_fit_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, doc_id % {PACK_SHARDS} AS shard,
             least(CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT),
                   {PACK_BUDGET}) AS l
      FROM documents
    ), g AS (
      SELECT source, shard,
             count(*) AS n_docs,
             CAST(sum(l) AS BIGINT) AS tokens_packed,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list(l ORDER BY l DESC, doc_id)),
               (acc, x) -> CASE
                 WHEN acc % {_PACK_ENC} + x > {PACK_BUDGET}
                 THEN acc - (acc % {_PACK_ENC}) + {_PACK_ENC} + x
                 ELSE acc + x END
             ) AS state
      FROM toks GROUP BY source, shard
    ), b AS (
      SELECT source, shard, n_docs, tokens_packed,
             state // {_PACK_ENC}
               + (CASE WHEN state % {_PACK_ENC} > 0 THEN 1 ELSE 0 END)
               AS n_bins
      FROM g
    )
    SELECT source, shard, n_docs, tokens_packed, n_bins,
           n_bins * {PACK_BUDGET} - tokens_packed AS padding,
           CAST(tokens_packed AS DOUBLE)
             / CAST(n_bins * {PACK_BUDGET} AS DOUBLE) AS fill_rate
    FROM b
    """,
)
def packing_next_fit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-boundary-respecting training-sequence packing — the OTHER
    packing recipe (vs. ``sequence_packing``'s concat-then-chunk):
    documents are never split across context windows; within each
    (source, shard) they are laid greedily in length-descending order
    (sorted next-fit, the first-fit-decreasing-quality heuristic real
    packers use) and a window closes when the next document would
    overflow the PACK_BUDGET (256)-token budget. Output is per-shard bin and
    padding-waste accounting — the number a padding-minimizing pipeline
    actually tunes.

    Packing is inherently a sequential fold over an ordered group, and
    the standard distributed answer is the one real pipelines use: pack
    per bounded output shard. The fold itself runs as Spark's
    ``aggregate`` HOF over the per-shard length array with the state in
    one int64 (completed_bins * 2^20 + running) — JVM expression
    codegen, no Python, no window, ONE partial-agg'd shuffle — and
    DuckDB's ``list_reduce`` replays the identical integer fold, so the
    driver hash-checks a sequential algorithm end-to-end."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.pmod("doc_id", F.lit(PACK_SHARDS)).alias("shard"),
        F.least(
            F.size(F.split(F.trim("text"), " +")).cast("long"),
            F.lit(PACK_BUDGET).cast("long"),
        ).alias("l"),
    )
    g = toks.groupBy("source", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("l").alias("tokens_packed"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("l")).alias("nl"), "doc_id", "l"))
                ),
                lambda x: x["l"],
            ),
            F.lit(0).cast("long"),
            lambda acc, x: F.when(
                acc % _PACK_ENC + x > PACK_BUDGET,
                acc - (acc % _PACK_ENC) + _PACK_ENC + x,
            ).otherwise(acc + x),
        ).alias("state"),
    )
    b = g.withColumn(
        "n_bins",
        F.call_function("div", F.col("state"), F.lit(_PACK_ENC))
        + F.when(F.col("state") % _PACK_ENC > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long"),
    )
    return b.select(
        "source",
        "shard",
        "n_docs",
        "tokens_packed",
        "n_bins",
        (F.col("n_bins") * PACK_BUDGET - F.col("tokens_packed")).alias(
            "padding"
        ),
        (
            F.col("tokens_packed").cast("double")
            / (F.col("n_bins") * PACK_BUDGET).cast("double")
        ).alias("fill_rate"),
    )


@query(
    "tfidf_top_terms_per_lang",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ), tf AS (
      SELECT lang, token, count(*) AS tf FROM toks GROUP BY lang, token
    ), df AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    ), nl AS (
      SELECT count(DISTINCT lang) AS n_langs FROM tf
    )
    SELECT lang, token, tf, df, score, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT tf.lang, tf.token,
             CAST(tf.tf AS BIGINT) AS tf,
             CAST(df.df AS BIGINT) AS df,
             CAST(tf.tf * nl.n_langs AS DOUBLE) / df.df AS score,
             row_number() OVER (
               PARTITION BY tf.lang
               ORDER BY CAST(tf.tf * nl.n_langs AS DOUBLE) / df.df DESC,
                        tf.token
             ) AS rn
      FROM tf JOIN df USING (token) CROSS JOIN nl
    ) WHERE rn <= 5
    """,
)
def tfidf_top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-distinctive terms by tf-idf: tf = term count within the
    language, idf = n_langs / (number of languages containing the term),
    score = tf * idf. Top-5 per language, token tiebreak.

    Cross-engine float discipline: no logarithm (ln/log are not
    IEEE-reproducible across engines) — tf * n_langs stays exact int64
    and ONE double division produces the score, so the hash oracle can
    check it bitwise. Plan shape: explode -> partial-agg'd (lang, token)
    counts -> token-keyed df agg (vocabulary-sized, shuffles tiny rows)
    -> tf⋈df equi-join on token -> 1-row n_langs scalar broadcast
    crossJoin -> per-lang top-k window over counts only; the exploded
    corpus never passes through the window or join."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(F.split(F.trim("text"), " +")).alias("token"))
    tf = toks.groupBy("lang", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    nl = tf.select(F.count_distinct("lang").alias("n_langs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(nl))
        .withColumn(
            "score", (F.col("tf") * F.col("n_langs")).cast("double") / F.col("df")
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("lang", "token", "tf", "df", "score", "rank")
    )


def _bpe_chain_sql(num_merges: int) -> str:
    """Shared WITH-chain replaying ``operators/bpe.py`` in DuckDB
    (VERDICT r3 item 3): everything is exact string/integer work, so the
    iteration is hash-matchable once unrolled. Per-word symbol state is
    a single string — symbols joined AND bounded by DOUBLE spaces
    (words can't contain spaces; they're split on ' +'). Applying merge
    (l, r) is then the literal ``replace(' l  r ', ' lr ')``: each match
    consumes one space from each flanking pair, leaving the neighbors'
    boundary intact, and left-to-right non-overlapping replacement
    scanning (which never rescans into the replacement) is exactly the
    operator's greedy left fold. Pair counts re-split the string; the
    argmax copies the operator's (n DESC, left, right) tiebreak; a
    round whose best pair has n < 2 applies nothing (LEFT JOIN on an
    empty 1-row-max CTE + COALESCE), which composes to the operator's
    early stop. All state CTEs are MATERIALIZED — each round references
    its predecessor twice, and DuckDB's default CTE inlining would
    otherwise double the plan per round."""
    chain = """
    WITH words_all AS MATERIALIZED (
      SELECT lang, w AS word
      FROM (SELECT lang,
                   unnest(string_split_regex(trim(text), ' +')) AS w
            FROM documents)
      WHERE w <> ''
    ), vcounts AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM words_all GROUP BY word
    ), vocab0 AS MATERIALIZED (
      SELECT word, freq,
             '  ' || array_to_string(
               list_concat(chars[1:len(chars)-1],
                           [chars[len(chars)] || '</w>']),
               '  ') || '  ' AS s
      FROM (SELECT word, freq, regexp_extract_all(word, '.') AS chars
            FROM vcounts)
      WHERE len(chars) >= 1
    )"""
    step = """, pairs{k} AS MATERIALIZED (
      SELECT p[1] AS l, p[2] AS r, SUM(freq) AS n
      FROM (
        SELECT freq,
               unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS p
        FROM (
          SELECT freq, parts[2:len(parts)-1] AS syms
          FROM (SELECT freq, string_split(s, '  ') AS parts FROM vocab{prev})
        )
      )
      GROUP BY 1, 2
    ), top{k} AS MATERIALIZED (
      SELECT l, r, CAST(n AS BIGINT) AS n
      FROM pairs{k} WHERE n >= 2
      ORDER BY n DESC, l, r LIMIT 1
    ), vocab{k} AS MATERIALIZED (
      SELECT v.word, v.freq,
             COALESCE(replace(v.s, ' ' || t.l || '  ' || t.r || ' ',
                              ' ' || t.l || t.r || ' '), v.s) AS s
      FROM vocab{prev} v LEFT JOIN top{k} t ON TRUE
    )"""
    return chain + "".join(
        step.format(k=k, prev=k - 1) for k in range(1, num_merges + 1)
    )


def _bpe_learn_oracle(num_merges: int = 8) -> str:
    tops = "\n      UNION ALL ".join(
        f"SELECT {k} AS step, l, r, n FROM top{k}"
        for k in range(1, num_merges + 1)
    )
    return f"""{_bpe_chain_sql(num_merges)}
    SELECT CAST(step AS INTEGER) AS step, l AS "left", r AS "right", n
    FROM ({tops})
    ORDER BY step
    """


def _bpe_compression_oracle(num_merges: int = 6) -> str:
    return f"""{_bpe_chain_sql(num_merges)}
    , counts AS MATERIALIZED (
      SELECT word,
             CAST(len(string_split(s, '  ')) - 2 AS BIGINT) AS n_bpe_tokens
      FROM vocab{num_merges}
    )
    SELECT lang, n_chars, n_bpe_tokens,
           CAST(n_chars AS DOUBLE) / n_bpe_tokens AS chars_per_token
    FROM (
      SELECT w.lang,
             CAST(SUM(len(w.word)) AS BIGINT) AS n_chars,
             CAST(SUM(c.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens
      FROM words_all w JOIN counts c ON w.word = c.word
      GROUP BY w.lang
    )
    ORDER BY lang
    """


@query("bpe_learn_merges", oracle=_bpe_learn_oracle())
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 8 learned BPE merges over the document corpus
    (operators/bpe.py): per round, one vocabulary-sized pair count and a
    bounded-pool argmax; batch_k=4 accepts provably-compatible merges
    together, so the driver-paced loop runs ~4x fewer rounds with a
    bit-identical merge table (operators/bpe.py safety rule). The merge
    table itself is bounded (8 rows), so materializing it driver-side is
    by-construction safe. Deterministic (lexicographic pair
    tiebreak), so the whole iteration replays in DuckDB as unrolled
    string-replace rounds (``_bpe_chain_sql``) — a green hash row, not
    rows-only. Exactness vs a pure-Python sequential BPE on the same
    corpus is additionally pytest-verified (tests/test_bpe.py)."""
    from ..operators.bpe import learn_bpe_from_texts

    d = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_from_texts(d, "text", num_merges=8, batch_k=4)
    rows = [(i + 1, l, r, n) for i, (l, r, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "step int, left string, right string, n long"
    )


@query("bpe_corpus_compression", oracle=_bpe_compression_oracle())
def bpe_corpus_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end BPE usage: learn 6 merges, tokenize the corpus, and
    report per-language compression (chars per BPE token — the metric a
    tokenizer-building pipeline tracks). Scale shape: the merge folds run
    on the DISTINCT word vocabulary only; per-word token counts join
    back to exploded corpus words via broadcast, then one partial-agg'd
    (lang) rollup. Oracled via the same unrolled DuckDB merge chain as
    ``bpe_learn_merges`` (one IEEE division for chars_per_token);
    additionally pytest-verified exactly vs the sequential Python
    reference (tests/test_bpe.py).

    r14 (guide §2.1, evaluate once): the learner's final symbol
    relation IS the fully-merged tokenization of every still-mergeable
    word (the loop applies each accepted merge with the same fold
    ``bpe_token_counts`` would), and every word it dropped is exactly
    one BPE token (see learn_bpe_merges), so per-word counts are
    ``coalesce(size(symbols), 1)`` over a LEFT join — the old
    re-tokenization of the vocabulary from scratch re-ran one merge
    fold + one lineage checkpoint PER MERGE (6 extra jobs per
    evaluation) to recompute a relation the learner already held."""
    from ..operators.bpe import learn_bpe_from_texts

    d = load_table(spark, sf_dir, "documents")
    merges, final_syms = learn_bpe_from_texts(
        d, "text", num_merges=6, batch_k=4, return_symbols=True
    )
    words = d.select(
        "lang", F.explode(F.split(F.trim("text"), " +")).alias("word")
    ).where(F.col("word") != "")
    counts = final_syms.select(
        "word", F.size("symbols").cast("long").alias("n_bpe_tokens")
    )
    return (
        words.join(F.broadcast(counts), "word", "left")
        .withColumn(
            "n_bpe_tokens",
            F.coalesce(F.col("n_bpe_tokens"), F.lit(1).cast("long")),
        )
        .groupBy("lang")
        .agg(
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        )
        .withColumn(
            "chars_per_token",
            F.col("n_chars").cast("double") / F.col("n_bpe_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "bigram_conditional_probs",
    oracle="""
    WITH toks AS (
      SELECT string_split_regex(trim(text), ' +') AS ws
      FROM documents
      WHERE len(string_split_regex(trim(text), ' +')) >= 2
    ), pairs AS (
      SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS pr
      FROM toks
    ), bi AS (
      SELECT pr[1] AS w1, pr[2] AS w2, count(*) AS c12
      FROM pairs GROUP BY 1, 2
    )
    SELECT w1, w2,
           CAST(c12 AS BIGINT) AS c12,
           CAST(c1 AS BIGINT) AS c1,
           CAST(c12 AS DOUBLE) / c1 AS p
    FROM (
      SELECT w1, w2, c12,
             CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1
      FROM bi
    )
    ORDER BY c12 DESC, w1, w2
    LIMIT 50
    """,
)
def bigram_conditional_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model counts: P(w2|w1) = c(w1 w2) / c(w1 ·) for
    the 50 most frequent bigrams (the statistic behind n-gram LMs and
    phrase-mining filters). Order-safe across engines: adjacent pairs
    come from zipping the token array against its own tail — never from
    re-sorting an exploded relation — and c1 is the sum of bigram counts
    per head word (one window over the vocabulary-sized counts
    relation), so P is a single IEEE division of exact int64s. Plan:
    explode collapses into a partial-agg'd (w1, w2) count; the corpus
    never reaches the window or the top-k."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.trim("text"), " +").alias("ws")).where(
        F.size("ws") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(ws, 1, size(ws) - 1)").alias("w1"),
                F.expr("slice(ws, 2, size(ws) - 1)").alias("w2"),
            )
        ).alias("pr")
    )
    bi = pairs.groupBy(
        F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2")
    ).agg(F.count("*").alias("c12"))
    c1 = F.sum("c12").over(Window.partitionBy("w1")).cast("long")
    return (
        bi.withColumn("c1", c1)
        .withColumn("p", F.col("c12").cast("double") / F.col("c1"))
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(50)
    )


@query(
    "pmi_phrase_mining",
    oracle="""
    WITH toks AS (
      SELECT string_split_regex(trim(text), ' +') AS ws
      FROM documents
      WHERE len(string_split_regex(trim(text), ' +')) >= 2
    ), pairs AS (
      SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS pr
      FROM toks
    ), bi AS (
      SELECT pr[1] AS w1, pr[2] AS w2, count(*) AS c12
      FROM pairs GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(sum(c12) AS BIGINT) AS n FROM bi
    ), uni AS (
      SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM (
        SELECT w1 AS w, c12 AS c FROM bi
        UNION ALL
        SELECT w2 AS w, c12 AS c FROM bi
      ) GROUP BY w
    )
    SELECT w1, w2, c12, lift
    FROM (
      SELECT bi.w1, bi.w2,
             CAST(bi.c12 AS BIGINT) AS c12,
             CAST(bi.c12 * tot.n AS DOUBLE) / (u1.cw * u2.cw) AS lift
      FROM bi
      JOIN uni u1 ON bi.w1 = u1.w
      JOIN uni u2 ON bi.w2 = u2.w
      CROSS JOIN tot
      WHERE bi.c12 >= 5
    )
    ORDER BY lift DESC, w1, w2
    LIMIT 25
    """,
)
def pmi_phrase_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation / phrase mining by PMI lift: P(w1 w2)/(P(w1·)P(·w2))
    = c12 * N / (c(w1,·) * c(·,w2)), support-filtered (c12 >= 5) and
    top-25 by lift — the statistic behind phrase detectors (Mikolov
    et al. word2phrase, public literature). Log-free rational form: the
    numerator and denominator stay exact int64 products, ONE double
    division makes the score hash-checkable cross-engine (the log in
    textbook PMI is monotone, so the lift ranking is the PMI ranking).
    Plan: one (w1,w2) bigram agg; marginals are re-aggregations of the
    vocabulary-sized counts relation, never the corpus; 1-row total
    broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.trim("text"), " +").alias("ws")).where(
        F.size("ws") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(ws, 1, size(ws) - 1)").alias("w1"),
                F.expr("slice(ws, 2, size(ws) - 1)").alias("w2"),
            )
        ).alias("pr")
    )
    bi = pairs.groupBy(
        F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2")
    ).agg(F.count("*").alias("c12"))
    tot = bi.select(F.sum("c12").cast("long").alias("n"))
    uni = (
        bi.select(F.col("w1").alias("w"), "c12")
        .unionAll(bi.select(F.col("w2").alias("w"), "c12"))
        .groupBy("w")
        .agg(F.sum("c12").cast("long").alias("cw"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("cw1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("cw2"))
    return (
        bi.where(F.col("c12") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            (
                (F.col("c12") * F.col("n")).cast("double")
                / (F.col("cw1") * F.col("cw2"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(25)
    )


@query(
    "source_lang_diversity_gini",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) AS n
      FROM documents GROUP BY source, lang
    ), s AS (
      SELECT source,
             CAST(sum(n) AS BIGINT) AS total,
             CAST(sum(n * n) AS BIGINT) AS sumsq,
             CAST(count(*) AS BIGINT) AS n_langs
      FROM c GROUP BY source
    )
    SELECT source, total, n_langs,
           CAST(total * total - sumsq AS DOUBLE) / (total * total) AS gini
    FROM s
    ORDER BY source
    """,
)
def source_lang_diversity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language diversity per source as Gini impurity
    1 - Σ p_l² = (total² - Σ n_l²) / total² — the log-free diversity
    metric (Shannon entropy needs ln, which is not IEEE-reproducible
    cross-engine; Gini ranks mixes the same way and stays a single
    division of exact int64s, so the driver hash-checks the score
    itself). Two cheap aggregations over (source, lang) counts; the
    corpus shuffles once."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    s = c.groupBy("source").agg(
        F.sum("n").cast("long").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sumsq"),
        F.count("*").cast("long").alias("n_langs"),
    )
    tt = F.col("total") * F.col("total")
    return s.select(
        "source",
        "total",
        "n_langs",
        ((tt - F.col("sumsq")).cast("double") / tt).alias("gini"),
    ).orderBy("source")


@query(
    "doc_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents
    ), grams AS (
      SELECT doc_id, array_to_string(list_slice(ws, i, i + 2), ' ') AS gram
      FROM toks, unnest(generate_series(1, len(ws) - 2)) AS t(i)
    ), per_doc_gram AS (
      SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram
    ), flagged AS (
      SELECT doc_id, c,
             count(*) OVER (PARTITION BY gram) AS n_docs
      FROM per_doc_gram
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN n_docs = 1 THEN c ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(sum(CASE WHEN n_docs = 1 THEN c ELSE 0 END) AS DOUBLE)
             / sum(c) AS novelty_rate
    FROM flagged
    GROUP BY doc_id
    """,
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's word
    trigram occurrences that exist in NO other document — the document-
    level novelty/memorization signal dedup-aware data curation ranks by
    (a doc made of corpus-unique trigrams is fresh content; a doc of
    df>1 trigrams is recombined boilerplate). Deterministic: exact int64
    counts, one IEEE division per row.

    Scale shape — deliberately JOIN-FREE: the explode collapses once
    into per-(doc, gram) occurrence counts (partial-agg'd shuffle);
    document frequency is then a count() window over that collapsed
    relation partitioned by gram (a gram's df==1 iff all its occurrences
    sit in one doc, so novel mass per doc = sum of c where n_docs==1);
    a final per-doc partial agg finishes. One pass over the explode,
    no occurrence->df join (a first cut joined the full occurrence
    relation to a df table and re-ran the explode on both join sides —
    3.9x wall-time per 10x data in the scale probe; this shape is
    ~linear). Works at any corpus size: nothing is assumed
    broadcastable, all three shuffles are key-partitioned."""
    from ..operators.spans import ngram_spans

    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    grams = ngram_spans(d, "text", "doc_id", 3).select("doc_id", "gram")
    per_doc_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    flagged = per_doc_gram.select(
        "doc_id",
        "c",
        F.count("*").over(Window.partitionBy("gram")).alias("n_docs"),
    )
    novel_mass = F.sum(F.when(F.col("n_docs") == 1, F.col("c")).otherwise(0))
    return flagged.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        novel_mass.alias("n_novel"),
        (novel_mass.cast("double") / F.sum("c")).alias("novelty_rate"),
    )


@query(
    "text_pii_redaction",
    oracle="""
    WITH decorated AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' cc admin' || CAST(doc_id AS VARCHAR)
                               || '@corp.net'
                          ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS BIGINT)
             AS n_phones,
           regexp_replace(
             regexp_replace(t, '[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+',
                            '<EMAIL>', 'g'),
             '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
    FROM decorated
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails, phone numbers) — the redaction pass every
    public-web training corpus runs (cf. the public Dolma / DataTrove /
    CCNet pipelines). The synthetic corpus carries no PII, so each doc
    is first DECORATED with deterministic doc_id-derived contact strings
    (1-2 emails + 1 phone) — the decoration is part of the query in both
    engines, so the redactor always has real work at any SF and the
    result stays hash-comparable.

    Regex discipline: patterns restricted to the dialect-neutral subset
    (character classes, counted repeats — no lookaround, no \\d//\\w
    class shorthand differences) so Java (Spark) and RE2 (DuckDB) match
    identically; counts via regexp_count / len(regexp_extract_all).

    Scale shape: stateless per-row projection — no shuffle at all; at
    100 TB this runs entirely map-side inside whole-stage codegen."""
    email_re = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
    phone_re = "555-[0-9]{4}"
    d = load_table(spark, sf_dir, "documents")
    decorated = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" cc admin"),
                    F.col("doc_id").cast("string"),
                    F.lit("@corp.net"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    return decorated.select(
        "doc_id",
        F.regexp_count("t", F.lit(email_re)).cast("long").alias("n_emails"),
        F.regexp_count("t", F.lit(phone_re)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("t", email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ).alias("redacted"),
    )


@query(
    "source_lang_drift",
    oracle="""
    WITH cell AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
    ), src AS (
      SELECT source, CAST(sum(n) AS BIGINT) AS n_src FROM cell GROUP BY source
    ), corp AS (
      SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM cell GROUP BY lang
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM cell
    ), full_grid AS (
      -- a source missing a language still contributes |0 - expected|
      SELECT s.source, c.lang, s.n_src, c.n_lang,
             coalesce(cell.n, 0) AS n
      FROM src s CROSS JOIN corp c
      LEFT JOIN cell ON cell.source = s.source AND cell.lang = c.lang
    )
    SELECT g.source,
           max(g.n_src) AS n_docs,
           CAST(sum(abs(g.n * t.n_tot - g.n_lang * g.n_src)) AS DOUBLE)
             / (max(g.n_src) * max(t.n_tot)) AS l1_drift
    FROM full_grid g CROSS JOIN tot t
    GROUP BY g.source
    """,
)
def source_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-mixture drift: the L1 distance between a
    source's language distribution and the corpus marginal — the
    mixture-monitoring statistic a curation pipeline alarms on when one
    provider's crawl shifts. Exactness discipline: every |obs - expected|
    term is an INTEGER cross-multiplication |n*N_tot - n_lang*n_src|
    (no per-term division), summed exactly in int64; the single IEEE
    division normalizes at the end, so the double hash-matches across
    engines.

    Scale shape: one partial-agg shuffle to (source, lang) cells; the
    lang marginal (|langs| rows) broadcasts back; per-source rollup over
    |langs| rows per source. The corpus itself is touched once."""
    cell = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
    )
    src = cell.groupBy("source").agg(F.sum("n").alias("n_src"))
    corp = cell.groupBy("lang").agg(F.sum("n").alias("n_lang"))
    tot = cell.agg(F.sum("n").alias("n_tot"))
    grid = (
        src.crossJoin(F.broadcast(corp))
        .join(cell, ["source", "lang"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    term = F.abs(
        F.col("n") * F.col("n_tot") - F.col("n_lang") * F.col("n_src")
    )
    return grid.groupBy("source").agg(
        F.max("n_src").alias("n_docs"),
        (
            F.sum(term).cast("double")
            / (F.max("n_src") * F.max("n_tot"))
        ).alias("l1_drift"),
    )


N_NEG_BUCKETS = 16


@query(
    "contrastive_chunk_pairs",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx FROM (
        SELECT doc_id,
               unnest(range(0, CAST(greatest(
                 ceil((len(string_split_regex(trim(text), ' +'))
                       - {CHUNK_SIZE}) / CAST({CHUNK_STRIDE} AS DOUBLE)), 0)
                 AS BIGINT) + 1)) AS chunk_idx
        FROM documents)
    ), keyed AS (
      SELECT doc_id, chunk_idx,
             md5(CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR))
               AS h
      FROM chunks
    ), pos AS (
      SELECT doc_id, chunk_idx, h,
             lead(chunk_idx) OVER (PARTITION BY doc_id ORDER BY chunk_idx)
               AS pos_chunk_idx
      FROM keyed
    ), neg AS (
      SELECT *,
             lead(doc_id) OVER w AS neg_doc_id,
             lead(chunk_idx) OVER w AS neg_chunk_idx
      FROM pos
      WINDOW w AS (PARTITION BY substr(h, 1, 1) ORDER BY h, doc_id, chunk_idx)
    )
    SELECT doc_id, chunk_idx, pos_chunk_idx, neg_doc_id, neg_chunk_idx
    FROM neg
    WHERE pos_chunk_idx IS NOT NULL
      AND neg_doc_id IS NOT NULL AND neg_doc_id <> doc_id
    ORDER BY doc_id, chunk_idx
    """,
)
def contrastive_chunk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-supervised training-pair construction over the chunked
    corpus (the contrastive-embedding recipe: adjacent chunks of one
    document are semantic positives, chunks of other documents are
    negatives): for each anchor chunk, its next-chunk positive and a
    DETERMINISTIC pseudo-random negative — the chunk that follows the
    anchor in md5-hash order within its hash bucket, so re-runs and
    backfills mine identical pairs with no stored RNG state (the same
    reproducibility discipline as the md5 split/samplers).

    Shape at 100 TB: chunk rows are (doc_id, chunk_idx) pairs — the
    text never survives past the boundary arithmetic. Positives are one
    lead() over the per-doc window (co-partitioned by doc). Negatives
    partition the corpus into md5-prefix buckets (16 here; scale the
    prefix length with the corpus so a bucket fits a partition) and
    take one lead() in hash order inside each — a bucket-local sort,
    never a global one. Same-doc hash-neighbors (rare) and bucket-tail
    rows drop deterministically; both engines drop the same rows, so
    the pair set hash-matches exactly."""
    chunks = text_chunking(spark, sf_dir).select("doc_id", "chunk_idx")
    h = F.md5(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("chunk_idx").cast("string"),
        ).cast("binary")
    )
    keyed = chunks.withColumn("h", h)
    w_pos = Window.partitionBy("doc_id").orderBy("chunk_idx")
    w_neg = Window.partitionBy(F.substring("h", 1, 1)).orderBy(
        "h", "doc_id", "chunk_idx"
    )
    paired = (
        keyed.withColumn("pos_chunk_idx", F.lead("chunk_idx").over(w_pos))
        .withColumn("neg_doc_id", F.lead("doc_id").over(w_neg))
        .withColumn("neg_chunk_idx", F.lead("chunk_idx").over(w_neg))
    )
    return (
        paired.where(
            F.col("pos_chunk_idx").isNotNull()
            & F.col("neg_doc_id").isNotNull()
            & (F.col("neg_doc_id") != F.col("doc_id"))
        )
        .select(
            "doc_id", "chunk_idx", "pos_chunk_idx", "neg_doc_id", "neg_chunk_idx"
        )
        .orderBy("doc_id", "chunk_idx")
    )


CORRUPT_BLOCK = 10  # tokens per corruption block


@query(
    "span_corruption_spec",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len(string_split_regex(trim(text), ' +')) AS n
      FROM documents
    ), blocks AS (
      SELECT doc_id, n,
             unnest(range(0, CAST(ceil(n / {CORRUPT_BLOCK}.0) AS BIGINT)))
               AS blk
      FROM toks
    ), h AS (
      SELECT doc_id, n, blk,
             md5(CAST(doc_id AS VARCHAR) || ':' || CAST(blk AS VARCHAR)) AS m
      FROM blocks
    ), calc AS (
      SELECT doc_id, blk,
             ('0x' || substr(m, 2, 1))::BIGINT AS h1,
             ('0x' || substr(m, 3, 4))::BIGINT AS h2,
             least({CORRUPT_BLOCK}, n - blk * {CORRUPT_BLOCK}) AS block_len
      FROM h
      WHERE substr(m, 1, 1) < '4'
    )
    SELECT doc_id,
           blk * {CORRUPT_BLOCK}
             + (h2 % (block_len - least(1 + (h1 % 3), block_len) + 1))
             AS span_start,
           least(1 + (h1 % 3), block_len) AS span_len
    FROM calc
    ORDER BY doc_id, span_start
    """,
)
def span_corruption_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption plan: which token spans of each document
    a denoising objective should mask — ~25% of fixed-size blocks
    selected, span length 1-3, offset within the block, all derived
    from md5 digits of (doc_id, block). Like the md5 split/samplers and
    the contrastive miner, the spec is a pure function of the ids:
    re-runs, backfills, and distributed workers mask IDENTICAL spans
    with no stored RNG state, and block-local spans can never overlap
    (the public fixed-block variant of span corruption; per-example
    determinism is what makes the plan auditable).

    Shape at 100 TB: token counts come from the same boundary
    arithmetic as chunking (text dropped immediately); the block
    explode emits ~n/{CORRUPT_BLOCK} tiny rows, filtered map-side to
    the ~25% selected — zero shuffles except the output sort. Every
    quantity is integer arithmetic over md5 hex digits, so DuckDB
    replays the exact spans (hash-match verifies the corruption plan
    itself)."""
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim("text"), " +"))
    c = F.ceil(n / F.lit(float(CORRUPT_BLOCK))).cast("long")
    blocks = d.select(
        "doc_id", n.alias("n"), c.alias("c")
    ).select(
        "doc_id", "n", F.explode(F.sequence(F.lit(0), F.col("c") - 1)).alias("blk")
    )
    m = F.md5(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.col("blk").cast("string")
        ).cast("binary")
    )
    calc = (
        blocks.withColumn("m", m)
        .where(F.substring("m", 1, 1) < "4")
        .select(
            "doc_id",
            "blk",
            F.conv(F.substring("m", 2, 1), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring("m", 3, 4), 16, 10).cast("long").alias("h2"),
            F.least(
                F.lit(CORRUPT_BLOCK), F.col("n") - F.col("blk") * CORRUPT_BLOCK
            ).alias("block_len"),
        )
    )
    span_len = F.least(F.lit(1) + F.col("h1") % 3, F.col("block_len"))
    off = F.col("h2") % (F.col("block_len") - span_len + 1)
    return calc.select(
        "doc_id",
        (F.col("blk") * CORRUPT_BLOCK + off).alias("span_start"),
        span_len.alias("span_len"),
    ).orderBy("doc_id", "span_start")


@query(
    "lm_fluency_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
      FROM documents
      WHERE len(string_split_regex(trim(text), ' +')) >= 2
    ), inst AS (
      SELECT doc_id, s['pos'] AS pos, s['w1'] AS w1, s['w2'] AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                      i -> {'pos': i, 'w1': ws[i], 'w2': ws[i + 1]})) AS s
        FROM toks
      )
    ), bi AS (
      SELECT w1, w2, count(*) AS c12 FROM inst GROUP BY 1, 2
    ), bic AS (
      SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
             CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1
      FROM bi
    ), vocab AS (
      SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM (
        SELECT w1 AS w FROM bi UNION SELECT w2 AS w FROM bi
      )
    ), terms AS (
      SELECT i.doc_id, i.pos,
             CAST(b.c12 + 1 AS DOUBLE) / CAST(b.c1 + vocab.v AS DOUBLE) AS p
      FROM inst i JOIN bic b USING (w1, w2) CROSS JOIN vocab
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           list_reduce(list(p ORDER BY pos), (a, x) -> a + x)
             / CAST(count(*) AS DOUBLE) AS mean_bigram_prob
    FROM terms
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def lm_fluency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM fluency filter (the CCNet/Wikipedia-LM pipeline
    step, made engine-exact): score every document by the mean
    Laplace-smoothed bigram probability of its text under the corpus's
    own bigram model — low scores flag disfluent/garbled documents for
    removal, the same role perplexity plays in CCNet.

    The mean PROBABILITY (arithmetic) stands in for perplexity
    (geometric): ln() carries no cross-engine bit guarantee (Java
    intrinsics vs libm), while each term here is ONE correctly-rounded
    IEEE division of exact int64s — (c12+1)/(c1+V) — and the per-doc
    sum runs as the corpus-standard sorted fold (by bigram position)
    that DuckDB replays bit-for-bit via list_reduce. Ranking behavior
    matches the perplexity filter's purpose: both are monotone quality
    signals under the same LM.

    Plan at 100 TB: the bigram instance stream collapses into the
    (w1, w2) model by one partial-agg'd shuffle; c1 is a window over
    the vocabulary-sized model (the corpus never reaches it); V is a
    1-row broadcast; the instance->model join co-keys on (w1, w2); the
    per-doc fold happens inside one groupBy(doc_id) shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.trim("text"), " +").alias("ws")).where(
        F.size("ws") >= 2
    )
    inst = toks.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                F.expr("slice(ws, 1, size(ws) - 1)").alias("w1"),
                F.expr("slice(ws, 2, size(ws) - 1)").alias("w2"),
            )
        ).alias("pos", "pr"),
    ).select("doc_id", "pos", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    bi = inst.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    bic = bi.withColumn(
        "c1", F.sum("c12").over(Window.partitionBy("w1")).cast("long")
    )
    vocab = (
        bi.select(F.col("w1").alias("w"))
        .union(bi.select(F.col("w2").alias("w")))
        .agg(F.count_distinct("w").alias("v"))
    )
    terms = (
        inst.join(bic, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "pos",
            (
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("p"),
        )
    )
    fold = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "p"))),
            lambda st: st["p"],
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (fold / F.count("*").cast("double")).alias("mean_bigram_prob"),
        )
        .orderBy("doc_id")
    )


def kn_oracle_ctes() -> str:
    """toks/inst/tri/.../terms CTE chain of the Kneser-Ney oracle —
    shared between ``lm_kneser_ney_score`` and the CCNet-style
    perplexity bucketing oracle so the two can never score
    differently."""
    return """toks AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
      FROM documents
      WHERE len(string_split_regex(trim(text), ' +')) >= 3
    ), inst AS (
      SELECT doc_id, s['pos'] AS pos,
             s['w1'] AS w1, s['w2'] AS w2, s['w3'] AS w3 FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 1),
                      i -> {'pos': i, 'w1': ws[i], 'w2': ws[i + 1],
                            'w3': ws[i + 2]})) AS s
        FROM toks
      )
    ), tri AS (
      SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c3
      FROM inst GROUP BY 1, 2, 3
    ), hist AS (
      SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c2,
             CAST(count(*) AS BIGINT) AS t12
      FROM tri GROUP BY 1, 2
    ), mid AS (
      SELECT w2, w3, CAST(count(*) AS BIGINT) AS n23 FROM tri GROUP BY 1, 2
    ), w2s AS (
      SELECT w2, CAST(sum(n23) AS BIGINT) AS n2dot,
             CAST(count(*) AS BIGINT) AS t2
      FROM mid GROUP BY 1
    ), uni AS (
      SELECT w3, CAST(count(*) AS BIGINT) AS n3 FROM mid GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS nall FROM mid
    ), model AS (
      SELECT t.w1, t.w2, t.w3,
             (CAST(t.c3 AS DOUBLE) - 0.75) / CAST(h.c2 AS DOUBLE)
             + ((0.75 * CAST(h.t12 AS DOUBLE)) / CAST(h.c2 AS DOUBLE))
               * ((CAST(m.n23 AS DOUBLE) - 0.75) / CAST(s.n2dot AS DOUBLE)
                  + ((0.75 * CAST(s.t2 AS DOUBLE)) / CAST(s.n2dot AS DOUBLE))
                    * (CAST(u.n3 AS DOUBLE) / CAST(tot.nall AS DOUBLE)))
               AS p
      FROM tri t
      JOIN hist h USING (w1, w2)
      JOIN mid m USING (w2, w3)
      JOIN w2s s USING (w2)
      JOIN uni u USING (w3)
      CROSS JOIN tot
    ), terms AS (
      SELECT i.doc_id, i.pos, mo.p
      FROM inst i JOIN model mo USING (w1, w2, w3)
    )"""


# the shared per-doc rollup of the terms CTE (sorted position fold)
_KN_SCORES_SELECT = """
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           list_reduce(list(p ORDER BY pos), (a, x) -> a + x)
             / CAST(count(*) AS DOUBLE) AS mean_kn_prob
    FROM terms
    GROUP BY doc_id"""


@query(
    "lm_kneser_ney_score",
    oracle=f"""
    WITH {kn_oracle_ctes()}
    {_KN_SCORES_SELECT}
    ORDER BY doc_id
    """,
)
def lm_kneser_ney_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram fluency scoring (Chen & Goodman
    1999 — the smoothing KenLM implements, which is what CCNet's
    perplexity filter actually runs): score every document by the mean
    interpolated-KN trigram probability of its text under the corpus's
    own trigram model, with absolute discount D = 0.75. The learned
    upgrade of ``lm_fluency_score``'s Laplace bigram — KN's continuation
    counts ("how many distinct contexts precede this word") are the
    published fix for Laplace's over-penalty of legitimate-but-rare
    continuations, and the trigram order catches disfluencies a bigram
    can't.

    Model (all statistics exact int64 group-bys of trigram types):
      p_uni(w3)      = N1+(.w3) / N1+(..)
      p_bi(w3 | w2)  = (N1+(.w2w3) - D)/N1+(.w2.)
                       + (D * T(w2.)/N1+(.w2.)) * p_uni(w3)
      p_tri(w3|w1w2) = (c(w1w2w3) - D)/c(w1w2)
                       + (D * T(w1w2.)/c(w1w2)) * p_bi(w3 | w2)
    where N1+ are distinct-context continuation counts and T(h.) the
    distinct-continuation counts of history h, ALL derived from the
    trigram type table (the self-consistent trained-on-trigram-types
    convention; textbook KN reads N1+(.w3) off the raw bigram table,
    which differs only by each doc's final bigram). Because the model is
    trained on the corpus it scores, every scored type has count >= 1,
    so the textbook max(c - D, 0) clamps never bind and are dropped —
    the per-type probability is one fixed IEEE chain over exact int64
    counts and the exactly-representable 0.75, which DuckDB replays
    bit-for-bit; the per-doc mean is the corpus-standard sorted
    position fold. Mean PROBABILITY stands in for perplexity for the
    same reason as lm_fluency_score (no ln() cross-engine guarantee;
    monotone quality signal under the same LM).

    Plan at 100 TB: the trigram instance stream collapses into the type
    table by one partial-agg'd shuffle; histories / continuation stats
    are vocabulary-sized rollups of the TYPE table (the corpus never
    reaches them); the per-type probability is assembled model-side so
    the instance stream pays exactly ONE co-keyed (w1, w2, w3) join;
    the per-doc fold is one groupBy(doc_id) shuffle. The reference (a
    streaming ingest demo) has no LM stage — north-star extension.

    The expression cores (``kn_instances`` / ``kn_scores_from``) are
    shared with the incremental twin (streaming/kn_lm.py): trigram
    counts are a sum monoid, so a drained count log reproduces this
    query bit-for-bit."""
    return kn_doc_scores(load_table(spark, sf_dir, "documents"))


def kn_doc_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_trigrams, mean_kn_prob): the full KN scoring pipeline
    over a document relation — THE shared builder consumed by
    ``lm_kneser_ney_score`` and ``ccnet_perplexity_buckets`` (one
    scoring definition; a change here changes both or neither)."""
    inst = kn_instances(docs)
    tri = inst.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    return kn_scores_from(inst, tri)


def kn_instances(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, w1, w2, w3): the positioned trigram instance stream
    of every document with >= 3 whitespace tokens — the immutable
    per-doc facts both the batch KN query and the incremental index log
    once per document."""
    toks = docs.select(
        "doc_id", F.split(F.trim(text_col), " +").alias("ws")
    ).where(F.size("ws") >= 3)
    return toks.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                F.expr("slice(ws, 1, size(ws) - 2)").alias("w1"),
                F.expr("slice(ws, 2, size(ws) - 2)").alias("w2"),
                F.expr("slice(ws, 3, size(ws) - 2)").alias("w3"),
            )
        ).alias("pos", "t"),
    ).select("doc_id", "pos", "t.w1", "t.w2", "t.w3")


def kn_scores_from(
    inst: DataFrame, tri: DataFrame, pin_shared: bool = True
) -> DataFrame:
    """Assemble the interpolated-KN model from a (w1, w2, w3, c3)
    trigram count relation and score the instance stream against it —
    the shared expression core. ``tri`` is the corpus trigram type
    table: one exact-int64 count per type, whether produced by one
    groupBy (batch) or by folding per-batch count partials by addition
    (streaming) — identical ints make every downstream double
    identical, so the two paths agree bit-for-bit.

    ``tri`` feeds FIVE consumers (hist/mid/w2s/uni/tot + the model
    join), and without a cut point Catalyst re-derives the corpus
    explode + type aggregation under each one (measured: 14 parquet
    scans in the unpinned plan). Pinning the VOCABULARY-sized type
    table — never the corpus-sized instance stream — drops that to the
    two corpus passes the algorithm actually needs (count + score),
    the PPJoin tokenize-once lesson applied at the natural small cut.
    ``pin_shared=False`` is the plan-dump view."""
    if pin_shared:
        from ..pin import pin

        tri = pin(tri)
    hist = tri.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c2"), F.count("*").alias("t12")
    )
    mid = tri.groupBy("w2", "w3").agg(F.count("*").alias("n23"))
    # r13 (guide §2.1 "do fewer shuffles", the kmv grouped-profiles
    # pattern): mid feeds FOUR consumers (w2s / uni / tot + the model
    # join); unpinned, each re-aggregated it from the pinned type table
    # — three redundant (w2, w3) exchanges per evaluation. Pin it (it is
    # the bigram-successor TYPE table: vocabulary-pair-bounded, never
    # corpus-sized) and fuse the three rollups into ONE grouping-sets
    # pass, split by grouping flags as map-only filters. The rollup
    # produces the same exact int64 counts per group as the separate
    # group-bys, so every downstream double stays bit-identical.
    if pin_shared:
        mid = pin(mid)
    roll = mid.groupingSets([["w2"], ["w3"], []], "w2", "w3").agg(
        F.sum("n23").alias("_s"),
        F.count("*").alias("_c"),
        F.grouping("w2").alias("_gw2"),
        F.grouping("w3").alias("_gw3"),
    )
    if pin_shared:
        roll = pin(roll)
    w2s = roll.where((F.col("_gw2") == 0) & (F.col("_gw3") == 1)).select(
        "w2", F.col("_s").alias("n2dot"), F.col("_c").alias("t2")
    )
    uni = roll.where((F.col("_gw2") == 1) & (F.col("_gw3") == 0)).select(
        "w3", F.col("_c").alias("n3")
    )
    tot = roll.where((F.col("_gw2") == 1) & (F.col("_gw3") == 1)).select(
        F.col("_c").alias("nall")
    )
    dd = F.lit(0.75)
    p_uni = F.col("n3").cast("double") / F.col("nall").cast("double")
    p_bi = (F.col("n23").cast("double") - dd) / F.col("n2dot").cast(
        "double"
    ) + (
        (dd * F.col("t2").cast("double")) / F.col("n2dot").cast("double")
    ) * p_uni
    p_tri = (F.col("c3").cast("double") - dd) / F.col("c2").cast(
        "double"
    ) + (
        (dd * F.col("t12").cast("double")) / F.col("c2").cast("double")
    ) * p_bi
    model = (
        tri.join(hist, ["w1", "w2"])
        .join(mid, ["w2", "w3"])
        .join(w2s, "w2")
        .join(uni, "w3")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "w3", p_tri.alias("p"))
    )
    terms = inst.join(model, ["w1", "w2", "w3"]).select(
        "doc_id", "pos", "p"
    )
    fold = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "p"))),
            lambda st: st["p"],
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
            (fold / F.count("*").cast("double")).alias("mean_kn_prob"),
        )
        .orderBy("doc_id")
    )


def lm_kneser_ney_score_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpinned builder of the KN scoring plan for tools/dump_plans.py —
    same logical plan, the shared type-table subtree visible instead of
    a checkpoint scan."""
    d = load_table(spark, sf_dir, "documents")
    inst = kn_instances(d)
    tri = inst.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    return kn_scores_from(inst, tri, pin_shared=False)


def hashed_tf_cte(dim: int) -> str:
    """The hashed_tf_sparse oracle as a reusable CTE chain exposing
    ``feats`` (doc_id, bucket, weight) — shared with the classifier's
    oracles (queries/classifier.py) so the feature hash has exactly one
    SQL definition."""
    return f"""
    words AS (
      SELECT doc_id,
             unnest(string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
      FROM documents
    ), signed AS (
      SELECT doc_id,
             ('0x' || substr(md5(w), 1, 8))::BIGINT % {dim} AS bucket,
             CASE WHEN substr(md5(w), 9, 1) < '8' THEN 1 ELSE -1 END AS s
      FROM words
    ), feats AS (
      SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS weight
      FROM signed GROUP BY doc_id, bucket
    )"""


@query(
    "hashed_tf_features",
    oracle=f"""
    WITH {hashed_tf_cte(64)}
    SELECT doc_id, bucket, weight FROM feats ORDER BY doc_id, bucket
    """,
)
def hashed_tf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing vectorization (Weinberger et al. 2009; MLlib
    HashingTF) of every document into 64 signed hash buckets — the
    text->vector bridge that feeds the cosine/ANN/SemDeDup operators
    without ever building a vocabulary. Sparse (doc_id, bucket, weight)
    is the oracled contract (exact int64 signed counts); the dense
    array<double> packing is operators/vectorize.py::hashed_tf_dense.
    Plan: narrow hash map + ONE partial-agg'd (doc, bucket) shuffle —
    vocabulary-independent by construction."""
    from ..operators.vectorize import hashed_tf_sparse  # lazy: avoids cycle

    d = load_table(spark, sf_dir, "documents")
    return hashed_tf_sparse(d, dim=64).orderBy("doc_id", "bucket")


_GOPHER_STOPS = ["the", "and", "of", "to", "a"]

# Shared Gopher-gate SQL (the classifier's weak-label oracle reuses
# these verbatim — queries/classifier.py — so a threshold tweak changes
# the gate AND its distillation teacher together).
GOPHER_FEAT_CTE = f"""
    nrm AS (
      SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
      FROM documents
    ), gfeat AS (
      SELECT doc_id,
        CAST(len(string_split(nrm, ' ')) AS BIGINT) AS n_tokens,
        CAST(length(nrm) - (len(string_split(nrm, ' ')) - 1) AS BIGINT)
          AS char_sum,
        CAST(len(list_filter(string_split(nrm, ' '),
                             w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
          AS alpha_words,
        {' + '.join(_occurrences_sql('nrm', w) for w in _GOPHER_STOPS)}
          AS stop_hits
      FROM nrm
    )"""

GOPHER_PASS_SQL = """CASE WHEN n_tokens BETWEEN 50 AND 100000
             AND CAST(char_sum AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0
             AND CAST(alpha_words AS DOUBLE) / n_tokens >= 0.8
             AND stop_hits >= 2
           THEN 1 ELSE 0 END"""


def gopher_features(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, char_sum, alpha_words, stop_hits): the exact
    integer features all four Gopher rules read — ONE narrow projection
    pass, no shuffle, no UDF (the per-word alpha test is a JVM
    higher-order ``filter``)."""
    nrm = F.trim(F.regexp_replace("text", r"\s+", " "))
    base = docs.select("doc_id", nrm.alias("nrm"))
    toks = F.split(F.col("nrm"), " ")
    stop_hits = sum(
        [_occurrences("nrm", w) for w in _GOPHER_STOPS], F.lit(0).cast("long")
    )
    return base.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.length("nrm") - (F.size(toks) - F.lit(1)))
        .cast("long")
        .alias("char_sum"),
        F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]")))
        .cast("long")
        .alias("alpha_words"),
        stop_hits.alias("stop_hits"),
    )


def gopher_passes() -> F.Column:
    """The gate predicate over ``gopher_features`` output. Each ratio is
    a single IEEE division of exact integers, so the booleans are
    bit-identical across engines (GOPHER_PASS_SQL is the oracle twin)."""
    mean_len = F.col("char_sum").cast("double") / F.col("n_tokens")
    alpha_ratio = F.col("alpha_words").cast("double") / F.col("n_tokens")
    return (
        F.col("n_tokens").between(50, 100000)
        & mean_len.between(3.0, 10.0)
        & (alpha_ratio >= 0.8)
        & (F.col("stop_hits") >= 2)
    )


@query(
    "gopher_quality_rules",
    oracle=f"""
    WITH {GOPHER_FEAT_CTE}
    SELECT doc_id, n_tokens,
      CAST(char_sum AS DOUBLE) / n_tokens    AS mean_word_len,
      CAST(alpha_words AS DOUBLE) / n_tokens AS alpha_word_ratio,
      stop_hits,
      CAST({GOPHER_PASS_SQL} AS BIGINT) AS passes_gopher
    FROM gfeat
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021, public): word
    count in [50, 100k], mean word length in [3, 10], >=80% of words
    containing an alphabetic character, and >=2 stopword hits — the
    shared ``gopher_features`` projection + ``gopher_passes`` predicate
    (also the classifier's weak-label teacher)."""
    d = load_table(spark, sf_dir, "documents")
    feat = gopher_features(d)
    return feat.select(
        "doc_id",
        "n_tokens",
        (F.col("char_sum").cast("double") / F.col("n_tokens")).alias(
            "mean_word_len"
        ),
        (F.col("alpha_words").cast("double") / F.col("n_tokens")).alias(
            "alpha_word_ratio"
        ),
        "stop_hits",
        gopher_passes().cast("long").alias("passes_gopher"),
    )


_HEAPS_BUCKET = 50  # docs per growth-curve point; widen ~corpus/1000 at scale


@query(
    "vocab_growth_heaps",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n
      FROM documents
    ), words AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), ' +')) AS w
      FROM documents
    ), firsts AS (
      SELECT w, min(doc_id) AS first_doc FROM words WHERE w <> '' GROUP BY w
    ), nw AS (
      SELECT CAST(floor(first_doc / {_HEAPS_BUCKET}) AS BIGINT) AS bucket,
             count(*) AS new_words
      FROM firsts GROUP BY 1
    ), tb AS (
      SELECT CAST(floor(doc_id / {_HEAPS_BUCKET}) AS BIGINT) AS bucket,
             sum(n) AS bucket_tokens
      FROM toks GROUP BY 1
    )
    SELECT tb.bucket AS bucket,
           CAST(bucket_tokens AS BIGINT) AS bucket_tokens,
           CAST(coalesce(new_words, 0) AS BIGINT) AS new_words,
           CAST(sum(bucket_tokens) OVER (ORDER BY tb.bucket) AS BIGINT)
             AS cum_tokens,
           CAST(sum(coalesce(new_words, 0)) OVER (ORDER BY tb.bucket)
                AS BIGINT) AS cum_vocab
    FROM tb LEFT JOIN nw USING (bucket)
    """,
)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: distinct-vocabulary size as a
    function of cumulative token count, in doc-id order. The expensive
    piece — "when did each word FIRST appear" — is a plain ``min(doc_id)``
    aggregate over exploded words (algebraic: map-side partials, one
    vocabulary-sized shuffle), NOT a running distinct count; the curve
    then lives on bucket-count rows, so the cumulative window is over a
    tiny relation (widen ``_HEAPS_BUCKET`` with corpus size to keep it
    so)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("n"),
    )
    words = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), " +")).alias("w")
    ).where(F.col("w") != "")
    firsts = words.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    bucket = lambda c: F.call_function(  # noqa: E731
        "div", F.col(c), F.lit(_HEAPS_BUCKET)
    )
    nw = (
        firsts.groupBy(bucket("first_doc").alias("bucket"))
        .agg(F.count("*").alias("new_words"))
    )
    tb = toks.groupBy(bucket("doc_id").alias("bucket")).agg(
        F.sum("n").alias("bucket_tokens")
    )
    joined = tb.join(nw, on="bucket", how="left").select(
        "bucket",
        F.col("bucket_tokens").cast("long").alias("bucket_tokens"),
        F.coalesce("new_words", F.lit(0)).cast("long").alias("new_words"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "bucket",
        "bucket_tokens",
        "new_words",
        F.sum("bucket_tokens").over(w).cast("long").alias("cum_tokens"),
        F.sum("new_words").over(w).cast("long").alias("cum_vocab"),
    )


@query(
    "token_budget_waterfill",
    # Threshold search is closed-form on the per-source aggregate: for
    # each ascending-sorted row, a candidate threshold assumes all
    # smaller sources are fully kept; exactly one candidate lands inside
    # its row's [prev_count, count] bracket. One IEEE division makes the
    # threshold, so both engines compute bit-identical allocations.
    oracle="""
    WITH per_source AS (
      SELECT source,
             CAST(sum(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), ranked AS (
      SELECT source, n_tokens,
             row_number() OVER (ORDER BY n_tokens, source) AS rn,
             sum(n_tokens) OVER (ORDER BY n_tokens, source
                                 ROWS UNBOUNDED PRECEDING) AS cum,
             count(*) OVER () AS m,
             sum(n_tokens) OVER () AS total
      FROM per_source
    ), cand AS (
      SELECT *,
             (total * 6) // 10 AS budget,
             CAST(((total * 6) // 10) - (cum - n_tokens) AS DOUBLE)
               / (m - rn + 1) AS t,
             coalesce(lag(n_tokens) OVER (ORDER BY rn), 0) AS prev_n
      FROM ranked
    ), thresh AS (
      SELECT min(t) AS t FROM cand
      WHERE t >= prev_n AND t <= n_tokens
    )
    SELECT source, n_tokens,
           least(CAST(n_tokens AS DOUBLE), thresh.t) AS allocation,
           least(CAST(n_tokens AS DOUBLE), thresh.t) / n_tokens
             AS kept_fraction
    FROM per_source, thresh
    """,
)
def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation across sources: spend a
    global budget (here 60% of corpus tokens, integer arithmetic) by
    keeping small sources whole and capping large ones at a common
    threshold t with sum(min(n_i, t)) = budget — the standard capacity
    allocation used to stop one crawl dump from dominating a training
    mixture. Everything after the per-source aggregate (one partial-agg
    shuffle) runs on a sources-sized relation, so the unpartitioned
    windows are over a handful of rows at any corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim("text"), " +"))).cast("long").alias("n_tokens")
    )
    order = Window.orderBy("n_tokens", "source")
    everything = Window.orderBy("n_tokens", "source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per_source.select(
        "source",
        "n_tokens",
        F.row_number().over(order).alias("rn"),
        F.sum("n_tokens").over(order.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.count("*").over(everything).alias("m"),
        F.sum("n_tokens").over(everything).alias("total"),
    )
    budget = F.expr("(total * 6) DIV 10")
    cand = ranked.select(
        "*",
        ((budget - (F.col("cum") - F.col("n_tokens"))).cast("double")
         / (F.col("m") - F.col("rn") + 1)).alias("t"),
        F.coalesce(F.lag("n_tokens").over(Window.orderBy("rn")), F.lit(0)).alias(
            "prev_n"
        ),
    )
    thresh = cand.where(
        (F.col("t") >= F.col("prev_n")) & (F.col("t") <= F.col("n_tokens"))
    ).agg(F.min("t").alias("t"))
    alloc = F.least(F.col("n_tokens").cast("double"), F.col("t"))
    return per_source.crossJoin(F.broadcast(thresh)).select(
        "source",
        "n_tokens",
        alloc.alias("allocation"),
        (alloc / F.col("n_tokens")).alias("kept_fraction"),
    )


@query("zlib_compression_ratio")  # rows-only: DuckDB has no DEFLATE
def zlib_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality signal: DEFLATE-compressed size over raw
    size per document. Highly repetitive/templated text compresses far
    below natural prose, making the ratio a cheap standalone quality
    gate (the public gzip-compressibility heuristic used alongside
    Gopher rules in corpus filtering).

    zlib is not expressible in SQL, so this is the engine's canonical
    Arrow-batched hot path: ``mapInPandas`` with a fixed compression
    level, one pass, no shuffle — the text never leaves its input
    partition and only (doc_id, 3 numbers) rows come out. Exactness is
    pytest-pinned against sequential ``zlib.compress`` on the same
    bytes (same zlib build in-container)."""
    import pandas as pd  # noqa: F401 (schema doc)

    d = load_table(spark, sf_dir, "documents")

    def score(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            n = raw.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "n_compressed": comp.astype("int64"),
                    "compression_ratio": comp / n,
                }
            )

    return d.select("doc_id", "text").mapInPandas(
        score, "doc_id long, n_bytes long, n_compressed long, compression_ratio double"
    )


# --- round-5 additions: retrieval scoring, boilerplate detection, -----
# --- calibrated gating, leakage-safe splitting ------------------------

BM25_TERMS = ("spark", "shuffle", "join")  # fixed keyword query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20


def bm25_doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, doclen, tf_<term>...) — the per-document BM25 inputs as
    ONE map-only projection (replace-length tf, no explode). Shared by
    the batch query and the incremental stage (streaming/bm25.py), so
    the two can never tokenize differently."""
    doclen = F.size(F.split(F.trim("text"), " +")).cast("long")
    return docs.select(
        "doc_id",
        doclen.alias("doclen"),
        *[_occurrences("text", t).alias(f"tf_{t}") for t in BM25_TERMS],
    )


def bm25_corpus_stats(base: DataFrame) -> DataFrame:
    """1-row (n_docs, total_len, df_<term>...) corpus statistics — every
    column a sum-monoid, so per-batch partials of this exact relation
    merge by addition (the property streaming/bm25.py relies on)."""
    return base.agg(
        F.count("*").alias("n_docs"),
        F.sum("doclen").alias("total_len"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )


def bm25_score_from(
    base: DataFrame, stats: DataFrame, top_k: int = BM25_TOP_K
) -> DataFrame:
    """Top-k BM25 scoring of a feature relation against a 1-row stats
    relation — the shared expression core (identical operation order in
    Spark and the SQL oracle; rounded to 6 decimals before ORDER BY so
    a last-ulp libm ln() difference cannot reorder the cutoff).
    ``top_k`` widens the cut for consumers that need a deeper candidate
    list (the hybrid-RRF lexical leg) without changing the expression."""
    joined = base.crossJoin(F.broadcast(stats))
    score = None
    for t in BM25_TERMS:
        tf = F.col(f"tf_{t}").cast("double")
        df_ = F.col(f"df_{t}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - df_ + F.lit(0.5))
            / (df_ + F.lit(0.5))
        )
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B)
            * F.col("doclen").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("total_len").cast("double")
        )
        term = idf * (tf * F.lit(BM25_K1 + 1.0)) / (tf + norm)
        score = term if score is None else score + term
    return (
        joined.select(
            "doc_id", "doclen", F.round(score, 6).alias("bm25")
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(top_k)
    )



def bm25_scored_sql() -> str:
    """The base/stats/scored CTE chain of the BM25 oracle — the SQL twin
    of ``bm25_doc_features`` + ``bm25_corpus_stats`` + the score
    expression in ``bm25_score_from``. Shared between the
    ``bm25_keyword_search`` oracle and the hybrid-RRF oracle
    (queries/similarity.py) so the two lexical legs can never score
    differently."""
    return f"""base AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
               AS doclen,
             {', '.join(_occurrences_sql('text', t) + f' AS tf_{t}' for t in BM25_TERMS)}
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(doclen) AS BIGINT) AS total_len,
             {', '.join(f'CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}' for t in BM25_TERMS)}
      FROM base
    ), scored AS (
      SELECT doc_id, doclen,
             {' + '.join(
                 f"(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5) / (CAST(df_{t} AS DOUBLE) + 0.5))"
                 f" * (CAST(tf_{t} AS DOUBLE) * ({BM25_K1} + 1.0))"
                 f" / (CAST(tf_{t} AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * CAST(doclen AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(total_len AS DOUBLE))))"
                 for t in BM25_TERMS)}
               AS score
      FROM base CROSS JOIN stats
    )"""


@query(
    "bm25_keyword_search",
    oracle=f"""
    WITH {bm25_scored_sql()}
    SELECT doc_id, doclen, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT {BM25_TOP_K}
    """,
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked retrieval of the top-20 documents for a fixed keyword
    query — the lexical-search scoring every retrieval/data-curation
    stack needs (Robertson & Walker's BM25, public literature).

    Scale shape: NO inverted index and NO explode — per-term tf comes
    from the replace-length occurrence trick (map-only, whole-stage
    codegen), so the corpus scan emits one short row per doc; corpus
    statistics (N, total length, per-term df) are ONE partial-agg'd
    1-row aggregate that broadcast-joins back; the top-k is
    TakeOrderedAndProject (per-partition heaps, never a global sort).
    Cross-engine determinism: tf/df/doclen are exact integers; the
    score's ln/division chain is written in the identical operation
    order in both engines and rounded to 6 decimals before the ORDER BY
    so a last-ulp libm difference cannot reorder the cutoff."""
    d = load_table(spark, sf_dir, "documents")
    base = bm25_doc_features(d)
    return bm25_score_from(base, bm25_corpus_stats(base))


def bm25_param(
    docs: DataFrame,
    terms: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = BM25_TOP_K,
) -> DataFrame:
    """PARAMETERIZED BM25: the query terms arrive as a RELATION (one
    ``term`` string column) instead of a compile-time column set — what
    a reusable retrieval API needs (VERDICT r5 "What's missing" #4).

    Scale shape: the corpus is never exploded and never re-tokenized —
    each (doc, term) pair comes from a broadcast CROSS join of the
    corpus scan against the tiny term relation (map-side replication,
    no shuffle), with tf from the same replace-length arithmetic as the
    fixed-term query, now with the needle as a COLUMN. Per-term df is a
    terms-sized partial agg that broadcast-joins back; the only wide
    operation is the per-doc score rollup on doc_id.

    Cross-engine determinism: a per-doc SUM of double term-scores would
    be partition-order-dependent, so each term score is converted to
    exact INTEGER MICRO-UNITS (round(score*1e6)) before the sum — the
    rollup is then an order-free int64 monoid, divided back to double
    once. Zero-tf pairs are dropped pre-rollup, so (unlike the fixed
    query, which scores every doc) only docs matching >=1 term are
    retrievable — retrieval semantics, pinned by the agreement test."""
    doclen = F.size(F.split(F.trim("text"), " +")).cast("long")
    pre = docs.select(
        "doc_id",
        doclen.alias("doclen"),
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("_padded"),
    )
    needle = F.concat(F.lit(" "), F.col("term"), F.lit(" "))
    tf = (
        (
            F.length("_padded")
            - F.length(F.replace(F.col("_padded"), needle, F.lit(" ")))
        )
        / (F.length("term") + 1)
    ).cast("long")
    # r13 (guide §2.1, evaluate once): feats is consumed twice (the df
    # aggregate and the score join), and each unmaterialized consumer
    # re-ran the replace-length tf pass over the full text — plus, for
    # rm3_expanded_search, the whole expansion-term subplan (its own
    # corpus pass) that feeds ``terms``. Pin the (doc, term, tf)
    # relation once: it is |docs| x |terms| SHORT rows, no text.
    from ..pin import pin as _pin

    feats = _pin(
        pre.crossJoin(F.broadcast(terms.select("term")))
        .select("doc_id", "doclen", "term", tf.alias("tf")),
        site="bm25_param.feats",
    )
    corpus_stats = pre.agg(
        F.count("*").alias("n_docs"),
        F.sum("doclen").alias("total_len"),
    )
    dfs = feats.groupBy("term").agg(
        F.sum((F.col("tf") > 0).cast("long")).alias("df")
    )
    j = (
        feats.where(F.col("tf") > 0)
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(corpus_stats))
    )
    tfd = F.col("tf").cast("double")
    dfd = F.col("df").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - dfd + F.lit(0.5))
        / (dfd + F.lit(0.5))
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b)
        * F.col("doclen").cast("double")
        * F.col("n_docs").cast("double")
        / F.col("total_len").cast("double")
    )
    micro = F.round(idf * (tfd * F.lit(k1 + 1.0)) / (tfd + norm) * F.lit(1e6)).cast(
        "long"
    )
    return (
        j.select("doc_id", "doclen", micro.alias("_m"))
        .groupBy("doc_id", "doclen")
        .agg(F.sum("_m").alias("_ms"))
        .select(
            "doc_id",
            "doclen",
            (F.col("_ms").cast("double") / F.lit(1e6)).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(top_k)
    )


def bm25_param_scored_sql(p: str = "", terms: str = "terms") -> str:
    """The dl/feats/corpus/dfs/scored CTE chain of the parameterized-BM25
    oracle (integer-micro rollup) against a term relation named
    ``terms`` — the SQL twin of ``bm25_param``. ``p`` prefixes every CTE
    name so a composed oracle (the RM3 expansion query re-scores with a
    DERIVED term set) can include the chain without name collisions."""
    return f"""{p}dl AS (
      SELECT doc_id, text,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
               AS doclen
      FROM documents
    ),
    {p}feats AS (
      SELECT d.doc_id, d.doclen, t.term,
             CAST((length(concat(' ', d.text, ' '))
                   - length(replace(concat(' ', d.text, ' '),
                                    concat(' ', t.term, ' '), ' ')))
                  / (length(t.term) + 1) AS BIGINT) AS tf
      FROM {p}dl d CROSS JOIN {terms} t
    ),
    {p}corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(doclen) AS BIGINT) AS total_len
      FROM {p}dl
    ),
    {p}dfs AS (
      SELECT term,
             CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df
      FROM {p}feats GROUP BY term
    ),
    {p}scored AS (
      SELECT f.doc_id, f.doclen,
             sum(CAST(round(
               ln(1.0 + (CAST(c.n_docs AS DOUBLE) - CAST(s.df AS DOUBLE)
                         + 0.5) / (CAST(s.df AS DOUBLE) + 0.5))
               * (CAST(f.tf AS DOUBLE) * ({BM25_K1} + 1.0))
               / (CAST(f.tf AS DOUBLE)
                  + {BM25_K1} * (1.0 - {BM25_B}
                                 + {BM25_B} * CAST(f.doclen AS DOUBLE)
                                   * CAST(c.n_docs AS DOUBLE)
                                   / CAST(c.total_len AS DOUBLE)))
               * 1000000.0) AS BIGINT)) AS ms
      FROM {p}feats f
      JOIN {p}dfs s USING (term)
      CROSS JOIN {p}corpus c
      WHERE f.tf > 0
      GROUP BY f.doc_id, f.doclen
    )"""


@query(
    "bm25_param_topk",
    oracle=f"""
    WITH terms(term) AS (VALUES {', '.join(f"('{t}')" for t in BM25_TERMS)}),
    {bm25_param_scored_sql()}
    SELECT doc_id, doclen,
           CAST(ms AS DOUBLE) / 1000000.0 AS bm25
    FROM scored
    ORDER BY CAST(ms AS DOUBLE) / 1000000.0 DESC, doc_id
    LIMIT {BM25_TOP_K}
    """,
)
def bm25_param_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parameterized BM25 driven with BM25_TERMS as a 3-row term
    relation — the oracle replays the full relation-shaped pipeline
    (VALUES-joined terms, per-term df agg, integer-micro score rollup),
    proving the query-as-data form, while the fixed-column
    ``bm25_keyword_search`` stays the expression-chain anchor. A pytest
    asserts the two agree on ranking for the shared term set."""
    d = load_table(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")
    return bm25_param(d, terms)


# --- RM3 pseudo-relevance feedback (query expansion) ------------------
# Lavrenko & Croft 2001 relevance models; the RM3 interpolated variant
# per Abdul-Jaleel et al. 2004 (UMass TREC). Public-literature IR: take
# the top feedback docs of the initial query, estimate a relevance
# model P(w|R) ~ sum_d P(w|d) * score(d), add the heaviest terms to the
# query, re-retrieve.

RM3_FB_DOCS = 10  # pseudo-relevant feedback depth
RM3_EXP_TERMS = 5  # expansion terms added to the query
RM3_MIN_TERM_LEN = 3  # drop particles ("a", "of") from candidates


def rm3_expansion_weights(docs: DataFrame) -> DataFrame:
    """(term, weight_nano) over expansion candidates from the top
    ``RM3_FB_DOCS`` BM25 feedback docs. weight = sum_d P(term|d) *
    bm25(d), accumulated in exact integer NANO-units so the cross-doc
    sum is an order-free int64 monoid (the ``bm25_param`` discipline).
    Everything downstream of the feedback cut is bounded by
    RM3_FB_DOCS x doclen rows — the explode never touches the corpus."""
    base = bm25_doc_features(docs)
    fb = bm25_score_from(base, bm25_corpus_stats(base), top_k=RM3_FB_DOCS)
    fb_docs = docs.select("doc_id", "text").join(F.broadcast(fb), "doc_id")
    tok = fb_docs.select(
        "doc_id",
        "doclen",
        "bm25",
        F.explode(F.split(F.trim("text"), " +")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "doclen", "bm25", "term").agg(
        F.count("*").alias("tf")
    )
    cand = tf.where(
        (F.length("term") >= RM3_MIN_TERM_LEN)
        & (~F.col("term").isin(*BM25_TERMS))
    )
    micro = F.round(
        F.col("tf").cast("double")
        / F.col("doclen").cast("double")
        * F.col("bm25")
        * F.lit(1e9)
    ).cast("long")
    return (
        cand.select("term", micro.alias("_m"))
        .groupBy("term")
        .agg(F.sum("_m").alias("weight_nano"))
    )


def _rm3_cand_sql() -> str:
    """fb/tok/tf/cand CTE chain — the SQL twin of
    ``rm3_expansion_weights`` past the (shared) scored CTE."""
    not_in = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""fb AS (
      SELECT s.doc_id, s.doclen, round(s.score, 6) AS bm25, d.text
      FROM scored s JOIN documents d USING (doc_id)
      ORDER BY round(s.score, 6) DESC, s.doc_id
      LIMIT {RM3_FB_DOCS}
    ), tok AS (
      SELECT doc_id, doclen, bm25,
             unnest(string_split_regex(trim(text), ' +')) AS term
      FROM fb
    ), tf AS (
      SELECT doc_id, doclen, bm25, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, doclen, bm25, term
    ), cand AS (
      SELECT term,
             CAST(round(CAST(tf AS DOUBLE) / CAST(doclen AS DOUBLE)
                        * bm25 * 1000000000.0) AS BIGINT) AS m
      FROM tf
      WHERE length(term) >= {RM3_MIN_TERM_LEN} AND term NOT IN ({not_in})
    )"""


@query(
    "rm3_expansion_terms",
    oracle=f"""
    WITH {bm25_scored_sql()}, {_rm3_cand_sql()}
    SELECT term, CAST(sum(m) AS BIGINT) AS weight_nano
    FROM cand GROUP BY term
    ORDER BY CAST(sum(m) AS BIGINT) DESC, term
    LIMIT {RM3_EXP_TERMS}
    """,
)
def rm3_expansion_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RM3 relevance-model term selection: heaviest
    ``RM3_EXP_TERMS`` non-query terms of the top-``RM3_FB_DOCS``
    feedback docs, weighted by P(term|doc) * bm25(doc).

    Scale shape: the only corpus-sized work is the initial BM25 pass
    (one scan + TakeOrderedAndProject); term extraction explodes ONLY
    the RM3_FB_DOCS (10) feedback docs, so candidate generation is
    feedback-sized, never corpus-sized. Cross-engine determinism:
    per-(doc, term) contributions go to exact integer nano-units before
    the term rollup (order-free int64 monoid), the feedback cut and the
    final cut both break ties on doc_id/term."""
    d = load_table(spark, sf_dir, "documents")
    return (
        rm3_expansion_weights(d)
        .orderBy(F.desc("weight_nano"), "term")
        .limit(RM3_EXP_TERMS)
    )


@query(
    "rm3_expanded_search",
    oracle=f"""
    WITH {bm25_scored_sql()}, {_rm3_cand_sql()},
    exp_terms AS (
      SELECT term FROM (
        SELECT term, CAST(sum(m) AS BIGINT) AS wm
        FROM cand GROUP BY term
        ORDER BY CAST(sum(m) AS BIGINT) DESC, term
        LIMIT {RM3_EXP_TERMS}
      )
    ),
    terms AS (
      {' UNION ALL '.join(f"SELECT '{t}' AS term" for t in BM25_TERMS)}
      UNION ALL SELECT term FROM exp_terms
    ),
    {bm25_param_scored_sql(p="x")}
    SELECT doc_id, doclen,
           CAST(ms AS DOUBLE) / 1000000.0 AS bm25
    FROM xscored
    ORDER BY CAST(ms AS DOUBLE) / 1000000.0 DESC, doc_id
    LIMIT {BM25_TOP_K}
    """,
)
def rm3_expanded_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RM3: initial BM25 retrieval -> relevance-model term
    selection -> re-retrieval with the expanded term RELATION through
    ``bm25_param`` (the query-as-data scorer). The oracle replays the
    whole two-pass pipeline, so the composition — not just the parts —
    is hash-checked.

    Scale shape: two corpus scans total (initial retrieval,
    re-retrieval); the expansion term set is a derived
    RM3_EXP_TERMS (5)-row relation broadcast into the second pass exactly
    like a literal term list — nothing is collected to the driver.
    Expansion terms are provably disjoint from the originals (the
    candidate filter excludes them), so the UNION ALL introduces no
    duplicate scoring rows."""
    d = load_table(spark, sf_dir, "documents")
    exp = (
        rm3_expansion_weights(d)
        .orderBy(F.desc("weight_nano"), "term")
        .limit(RM3_EXP_TERMS)
        .select("term")
    )
    orig = spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")
    return bm25_param(d, orig.unionByName(exp))


BOILERPLATE_PREFIX_W = 3  # leading words that define a "boilerplate" prefix


@query(
    "boilerplate_prefix_detection",
    oracle=f"""
    WITH pfx AS (
      SELECT source,
             array_to_string(
               string_split_regex(trim(text), ' +')[1:{BOILERPLATE_PREFIX_W}],
               ' ') AS prefix
      FROM documents
    ), counted AS (
      SELECT source, prefix, CAST(count(*) AS BIGINT) AS n_docs_with_prefix,
             CAST(sum(count(*)) OVER (PARTITION BY source) AS BIGINT)
               AS n_docs,
             row_number() OVER (
               PARTITION BY source
               ORDER BY count(*) DESC, prefix ASC) AS rn
      FROM pfx GROUP BY source, prefix
    )
    SELECT source, prefix AS top_prefix, n_docs_with_prefix, n_docs,
           CAST(n_docs_with_prefix AS DOUBLE) / n_docs AS prefix_share
    FROM counted WHERE rn = 1 ORDER BY source
    """,
)
def boilerplate_prefix_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detection: the most common leading
    3-word prefix of each source's documents and the share of documents
    carrying it — how web-corpus pipelines find injected headers /
    cookie banners / licence stubs to strip before training (a high
    share means the source prepends boilerplate).

    Scale shape: the prefix is a map-side projection (slice of the token
    array — never the full text past the first words), ONE partial-agg'd
    groupBy on (source, prefix), then a per-source window over the
    already-collapsed counts (source-sized partitions of DISTINCT
    prefixes, not documents). Ties break on (count desc, prefix asc) —
    a total order, so both engines elect the same prefix."""
    d = load_table(spark, sf_dir, "documents")
    return boilerplate_elect(boilerplate_prefix_counts(d))


def boilerplate_prefix_counts(docs: DataFrame) -> DataFrame:
    """(source, prefix, n_docs_with_prefix) — a SUM-monoid relation, so
    per-batch partials fold by addition (the property
    streaming/boilerplate.py relies on). Shared with the batch query so
    the two can never slice prefixes differently."""
    prefix = F.array_join(
        F.slice(F.split(F.trim("text"), " +"), 1, BOILERPLATE_PREFIX_W), " "
    )
    return (
        docs.select("source", prefix.alias("prefix"))
        .groupBy("source", "prefix")
        .agg(F.count("*").alias("n_docs_with_prefix"))
    )


def boilerplate_elect(counted: DataFrame) -> DataFrame:
    """Per-source winner election over a collapsed prefix-count relation
    — the shared finalize core of the batch query and the streaming
    monitor (identical total order: count desc, prefix asc)."""
    w_src = Window.partitionBy("source")
    w_rank = Window.partitionBy("source").orderBy(
        F.desc("n_docs_with_prefix"), F.asc("prefix")
    )
    return (
        counted.select(
            "source",
            F.col("prefix").alias("top_prefix"),
            "n_docs_with_prefix",
            F.sum("n_docs_with_prefix").over(w_src).alias("n_docs"),
            F.row_number().over(w_rank).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "source",
            "top_prefix",
            "n_docs_with_prefix",
            "n_docs",
            (
                F.col("n_docs_with_prefix").cast("double") / F.col("n_docs")
            ).alias("prefix_share"),
        )
        .orderBy("source")
    )


GATE_KEEP_NUM = 7  # keep the top 7/10 of each language by quality rank
GATE_KEEP_DEN = 10


@query(
    "calibrated_quality_gate",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
               AS n_tokens,
             CAST({_occurrences_sql('text', 'the')} AS DOUBLE) /
               CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
               AS q
      FROM documents
    ), ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY lang ORDER BY q DESC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM scored
    )
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn * {GATE_KEEP_DEN} <= n * {GATE_KEEP_NUM}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn * {GATE_KEEP_DEN} <= n * {GATE_KEEP_NUM}
                         THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           min(CASE WHEN rn * {GATE_KEEP_DEN} <= n * {GATE_KEEP_NUM}
                    THEN q END) AS calibrated_threshold
    FROM ranked GROUP BY lang ORDER BY lang
    """,
)
def calibrated_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gating calibrated to a TARGET KEEP RATE instead of a fixed
    threshold: per language, keep exactly the top 70% of documents by
    quality score and report the data-derived cutoff — how production
    pipelines actually set filter thresholds (pick the budget, let each
    language's score distribution find its own bar, so a fixed global
    threshold can't silently delete a whole low-resource language).

    Determinism: the cutoff is RANK-based (rn*10 <= n*7 in exact integer
    math — no float percentile interpolation to disagree across
    engines), with the (q desc, doc_id) total order breaking ties; the
    reported threshold is then the min kept score. Scale shape: one
    narrow scored projection, one per-language window over it
    (language-sized partitions), one per-language aggregate."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), " +")).cast("long")
    scored = d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        (
            _occurrences("text", "the").cast("double") / n_tokens
        ).alias("q"),
    )
    w_rank = Window.partitionBy("lang").orderBy(F.desc("q"), F.asc("doc_id"))
    w_lang = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "n_tokens",
        "q",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_lang).alias("n"),
    )
    kept = F.col("rn") * GATE_KEEP_DEN <= F.col("n") * GATE_KEEP_NUM
    return (
        ranked.groupBy("lang")
        .agg(
            F.max("n").alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias(
                "kept_tokens"
            ),
            F.min(F.when(kept, F.col("q"))).alias("calibrated_threshold"),
        )
        .orderBy("lang")
    )


@query(
    "leakage_safe_group_split",
    oracle="""
    WITH tagged AS (
      SELECT source, n_chars,
             CASE
               WHEN substr(md5(source), 32, 1)
                    IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                 THEN 'train'
               WHEN substr(md5(source), 32, 1) IN ('c','d') THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM tagged GROUP BY split ORDER BY split
    """,
)
def leakage_safe_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/val/test split: the md5 bucket hashes the
    SOURCE, not the document id, so every document from one source lands
    in the same split — the leakage-safe variant of
    dataset_split_deterministic (near-duplicate documents cluster within
    a source/domain; splitting per-document puts one copy in train and
    its twin in test, inflating eval). Same 12/2/2-sixteenths buckets,
    same stateless-map + 3-row-aggregate scale shape; membership stays a
    pure function of the group key, so incremental arrivals from a known
    source join their split with no coordination."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("source").cast("binary")), 32, 1)
    split = (
        F.when(bucket.isin(*"0123456789ab"), "train")
        .when(bucket.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


# --- CCNet-style perplexity bucketing (head / middle / tail) ----------


@query(
    "ccnet_perplexity_buckets",
    oracle=f"""
    WITH {kn_oracle_ctes()},
    scores AS ({_KN_SCORES_SELECT}
    ),
    ranked AS (
      SELECT s.doc_id, d.lang, s.mean_kn_prob,
             CAST(row_number() OVER (
               PARTITION BY d.lang
               ORDER BY s.mean_kn_prob DESC, s.doc_id) AS BIGINT) AS r,
             CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT) AS n
      FROM scores s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, mean_kn_prob,
           CASE WHEN r * 3 <= n THEN 'head'
                WHEN r * 3 <= 2 * n THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): per
    language, rank every document by its language-model score and cut
    the ranking into terciles — "head" is the most fluent third the
    paper trains on first. The LM is the registered interpolated-KN
    trigram model (``lm_kneser_ney_score``'s exact expression core and
    oracle CTEs — one shared definition, Spark and SQL); mean trigram
    PROBABILITY stands in for perplexity (monotone decreasing in it),
    so ordering by prob DESC puts lowest-perplexity docs in head.

    Tercile assignment is exact integer arithmetic on the per-lang rank
    (r*3 <= n / r*3 <= 2n), never a float percentile — so the bucket
    column hash-matches. The rank itself orders on a double, but
    mean_kn_prob is bit-identical across engines by construction (the
    KN query's hash-green discipline) with a doc_id tiebreak.

    Scale shape: scoring inherits the KN plan (type-table rollups, ONE
    co-keyed instance join); bucketing adds one lang-partitioned window
    (per-lang sort). At 100 TB CCNet itself replaces the exact sort with
    percentile CUTOFFS estimated on a sample and a map-only threshold
    pass — the exact window here is the correctness anchor that
    validates that approximation."""
    d = load_table(spark, sf_dir, "documents")
    return ccnet_buckets_from(kn_doc_scores(d), d.select("doc_id", "lang"))


def ccnet_buckets_from(scores: DataFrame, langs: DataFrame) -> DataFrame:
    """Tercile bucketing of a (doc_id, mean_kn_prob, ...) score relation
    against a (doc_id, lang) dimension — the shared expression core of
    the registered query and the incremental view over the drained KN
    log (streaming/kn_lm.py), so the two can never bucket differently."""
    joined = scores.join(langs, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.desc("mean_kn_prob"), F.asc("doc_id")
    )
    ranked = joined.select(
        "doc_id",
        "lang",
        "mean_kn_prob",
        F.row_number().over(w).cast("long").alias("r"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    bucket = (
        F.when(F.col("r") * 3 <= F.col("n"), F.lit("head"))
        .when(F.col("r") * 3 <= 2 * F.col("n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        "doc_id", "lang", "mean_kn_prob", bucket.alias("bucket")
    )


# ------------------------------------------- repetition battery
# The repetition section of the Gopher quality rules (Rae et al. 2021,
# Table A1) — the signals gopher_quality_rules (word-shape section) and
# text_repetition_score (top-bigram fraction) did not yet cover:
# duplicate-line fraction, duplicate-line CHARACTER fraction, and the
# top n-gram character fractions for n = 2, 3, 4. "Lines" are the
# corpus's deterministic fixed-width token segments (LINE_W, shared with
# dedup_lines_first_occurrence). "Top n-gram char fraction" is defined
# as the largest count x length product over the doc's n-grams (the
# n-gram COVERING the most characters) — a deterministic refinement of
# the paper's "most frequent n-gram" that avoids tie ambiguity, clipped
# at 1 (overlapping occurrences can make the count x length product
# exceed the text length: the standard approximation of positional
# coverage). The DuckDB oracle replays the same definition. The clip
# never changes a pass/fail decision: all bounds are < 1, and the
# predicates compare the UNclipped exact integers.

from .dedup import LINE_W as _REP_LINE_W

def _ngram_cover_sql(n: int) -> str:
    """Per-doc max(count*len) over word n-grams, DuckDB side."""
    return f"""
      SELECT doc_id, CAST(max(c * l) AS BIGINT) AS cover{n} FROM (
        SELECT doc_id, count(*) AS c, len(g) AS l FROM (
          SELECT doc_id, array_to_string(t[u.i : u.i + {n - 1}], ' ') AS g
          FROM toks,
               unnest(range(1, greatest(len(t) - {n - 1}, 0) + 1)) AS u(i)
        ) GROUP BY doc_id, g
      ) GROUP BY doc_id
    """


def _tagged_grams(t, n: int):
    """Array of (n, gram) structs for word n-grams of token array ``t``
    — the n tag keeps different gram orders (and the n=1 line segments)
    in disjoint count groups inside the fused repetition explode."""
    n_pos = F.size(t) - (n - 1)
    return F.when(
        n_pos < 1, F.array().cast("array<struct<n:int,g:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_pos, F.lit(1))),
            lambda i: F.struct(
                F.lit(n).cast("int").alias("n"),
                F.array_join(F.slice(t, i, n), " ").alias("g"),
            ),
        )
    )


@query(
    "gopher_repetition_signals",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS nt
      FROM documents
    ), toks AS (
      SELECT doc_id, string_split(nt, ' ') AS t,
             CAST(len(nt) AS BIGINT) AS total_chars
      FROM norm
    ), lines AS (
      SELECT doc_id, array_to_string(t[u.i*{_REP_LINE_W}+1 : (u.i+1)*{_REP_LINE_W}], ' ') AS seg
      FROM toks, unnest(range(0, CAST(ceil(len(t) / {_REP_LINE_W}.0) AS BIGINT))) AS u(i)
    ), lstats AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_lines,
             CAST(sum(c - 1) AS BIGINT) AS n_dup_lines,
             CAST(sum((c - 1) * l) AS BIGINT) AS dup_chars,
             CAST(sum(c * l) AS BIGINT) AS line_chars
      FROM (SELECT doc_id, count(*) AS c, len(seg) AS l
            FROM lines GROUP BY doc_id, seg) g
      GROUP BY doc_id
    ), g2 AS ({_ngram_cover_sql(2)}), g3 AS ({_ngram_cover_sql(3)}),
       g4 AS ({_ngram_cover_sql(4)})
    SELECT t.doc_id, l.n_lines,
           CAST(l.n_dup_lines AS DOUBLE) / l.n_lines AS dup_line_frac,
           CAST(l.dup_chars AS DOUBLE) / l.line_chars AS dup_line_char_frac,
           CAST(least(coalesce(g2.cover2, 0), t.total_chars) AS DOUBLE)
             / t.total_chars AS top_2gram_char_frac,
           CAST(least(coalesce(g3.cover3, 0), t.total_chars) AS DOUBLE)
             / t.total_chars AS top_3gram_char_frac,
           CAST(least(coalesce(g4.cover4, 0), t.total_chars) AS DOUBLE)
             / t.total_chars AS top_4gram_char_frac,
           CAST((10 * l.n_dup_lines <= 3 * l.n_lines)
            AND (5 * l.dup_chars <= l.line_chars)
            AND (5 * coalesce(g2.cover2, 0) <= t.total_chars)
            AND (50 * coalesce(g3.cover3, 0) <= 9 * t.total_chars)
            AND (25 * coalesce(g4.cover4, 0) <= 4 * t.total_chars)
            AS BIGINT) AS passes_repetition
    FROM toks t
    JOIN lstats l USING (doc_id)
    LEFT JOIN g2 USING (doc_id)
    LEFT JOIN g3 USING (doc_id)
    LEFT JOIN g4 USING (doc_id)
    """,
)
def gopher_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition gate (Rae et al. 2021 Table A1): duplicate-line
    fraction (<= 0.30), duplicate-line char fraction (<= 0.20), and top
    2/3/4-gram char fractions (<= 0.20 / 0.18 / 0.16). All predicates
    are exact integer comparisons; the reported fractions are single
    IEEE divisions of exact int64 sums — bit-identical in both engines.

    Plan: token explode feeds per-(doc, gram) partial-agg'd counts per n
    plus the shared line-segment group; every exchange carries gram- or
    line-sized rows keyed by (doc, gram) — uniform, corpus-text-bound;
    final assembly is doc_id-keyed joins."""
    return repetition_signals(load_table(spark, sf_dir, "documents"))


def repetition_signals(d: DataFrame) -> DataFrame:
    """The repetition battery over any (doc_id, text) relation — split
    out so pytest can plant repetitive documents directly. Line segments
    derive from the SAME \\s+-normalized token stream as total_chars and
    the n-gram covers (line_segments splits on spaces only, which would
    fork the segmentation — and the oracle — on tab/newline-bearing
    text)."""
    from ..tables import spread_small_scan

    nt = F.regexp_replace(F.trim("text"), r"\s+", " ")
    # spread BEFORE the fused explode: the sf parquet is one row group,
    # and unlike the old four independent battery legs (which AQE
    # overlapped as concurrent 1-partition stages) the fused single
    # pass would otherwise serialize on 1-2 cores. No-op at scale by
    # the helper's defaultParallelism guard.
    toks = spread_small_scan(d, "doc_id").select(
        "doc_id",
        F.split(nt, " ").alias("t"),
        F.length(nt).cast("long").alias("total_chars"),
    )
    t = F.col("t")
    segs = F.transform(
        F.sequence(
            F.lit(0),
            (F.ceil(F.size(t) / F.lit(float(_REP_LINE_W))) - 1).cast("long"),
        ),
        lambda i: F.array_join(
            F.slice(t, i * _REP_LINE_W + 1, _REP_LINE_W), " "
        ),
    )
    # r13 (guide §2.1 "evaluate once"): the line segments and the three
    # n-gram streams fuse into ONE n-tagged explode — one tokenize pass
    # and one (doc, n, gram) exchange instead of four of each (the
    # before plan re-derived the corpus tokenize + explode under every
    # battery leg: 10 parquet scans / 24 Exchanges; after: 2 scans —
    # the fused pass plus the cheap total_chars projection, whose token
    # split Catalyst prunes). Tag n=1 for line segments (a segment
    # string can equal a 2-gram string; the tag keeps the count groups
    # disjoint), n=2..4 for the gram streams. Counts per tagged group
    # and the per-doc sums/maxes are the same exact int64s as the
    # separate passes, so every emitted fraction is bit-identical.
    tagged = F.concat(
        F.transform(
            segs,
            lambda s: F.struct(
                F.lit(1).cast("int").alias("n"), s.alias("g")
            ),
        ),
        _tagged_grams(t, 2),
        _tagged_grams(t, 3),
        _tagged_grams(t, 4),
    )
    counts = (
        toks.select("doc_id", F.explode(tagged).alias("p"))
        .groupBy("doc_id", F.col("p.n").alias("n"), F.col("p.g").alias("g"))
        .agg(F.count("*").alias("c"))
    )
    line = F.col("n") == 1
    glen = F.length("g")
    battery = counts.groupBy("doc_id").agg(
        F.sum(F.when(line, F.col("c"))).alias("n_lines"),
        F.sum(F.when(line, F.col("c") - 1)).alias("n_dup_lines"),
        F.sum(F.when(line, (F.col("c") - 1) * glen)).alias("dup_chars"),
        F.sum(F.when(line, F.col("c") * glen)).alias("line_chars"),
        F.max(F.when(F.col("n") == 2, F.col("c") * glen)).alias("cover2"),
        F.max(F.when(F.col("n") == 3, F.col("c") * glen)).alias("cover3"),
        F.max(F.when(F.col("n") == 4, F.col("c") * glen)).alias("cover4"),
    )
    out = toks.select("doc_id", "total_chars").join(battery, "doc_id")
    c2 = F.coalesce("cover2", F.lit(0))
    c3 = F.coalesce("cover3", F.lit(0))
    c4 = F.coalesce("cover4", F.lit(0))
    r2 = F.least(c2, F.col("total_chars"))
    r3 = F.least(c3, F.col("total_chars"))
    r4 = F.least(c4, F.col("total_chars"))
    return out.select(
        "doc_id",
        "n_lines",
        (F.col("n_dup_lines").cast("double") / F.col("n_lines")).alias(
            "dup_line_frac"
        ),
        (F.col("dup_chars").cast("double") / F.col("line_chars")).alias(
            "dup_line_char_frac"
        ),
        (r2.cast("double") / F.col("total_chars")).alias(
            "top_2gram_char_frac"
        ),
        (r3.cast("double") / F.col("total_chars")).alias(
            "top_3gram_char_frac"
        ),
        (r4.cast("double") / F.col("total_chars")).alias(
            "top_4gram_char_frac"
        ),
        (
            (10 * F.col("n_dup_lines") <= 3 * F.col("n_lines"))
            & (5 * F.col("dup_chars") <= F.col("line_chars"))
            & (5 * c2 <= F.col("total_chars"))
            & (50 * c3 <= 9 * F.col("total_chars"))
            & (25 * c4 <= 4 * F.col("total_chars"))
        )
        .cast("long")
        .alias("passes_repetition"),
    )


@query(
    "zipf_fit_per_lang",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS w
      FROM documents
    ), freq AS (
      SELECT lang, w, CAST(count(*) AS BIGINT) AS f
      FROM toks GROUP BY 1, 2
    ), ranked AS (
      SELECT lang, f,
             row_number() OVER (PARTITION BY lang ORDER BY f DESC, w) AS r
      FROM freq
    ), pts AS (
      SELECT lang, r,
             ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y, f
      FROM ranked
    ), sums AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS vocab_size,
             CAST(sum(f) AS BIGINT) AS total_tokens,
             list_reduce(list(x ORDER BY r), (a, v) -> a + v) AS sx,
             list_reduce(list(y ORDER BY r), (a, v) -> a + v) AS sy,
             list_reduce(list(x * y ORDER BY r), (a, v) -> a + v) AS sxy,
             list_reduce(list(x * x ORDER BY r), (a, v) -> a + v) AS sxx
      FROM pts GROUP BY lang
    )
    SELECT lang, vocab_size, total_tokens,
           round((vocab_size * sxy - sx * sy)
                 / (vocab_size * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - (vocab_size * sxy - sx * sy)
                       / (vocab_size * sxx - sx * sx) * sx)
                 / vocab_size, 6) AS zipf_intercept
    FROM sums ORDER BY lang
    """,
)
def zipf_fit_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: OLS slope/intercept of ln(frequency)
    against ln(rank) over the token frequency table — the classic
    corpus-health diagnostic (natural language sits near slope -1;
    template/spam corpora flatten it). Ranks break frequency ties by
    token so the regression points are deterministic.

    Float discipline: the four OLS sums fold in rank order (the
    corpus-standard sorted fold — the per-lang points are vocab-sized,
    the lm_fluency bound); ln() carries no cross-engine bit guarantee,
    so the fitted coefficients round to 6 decimals (the bm25 rule).

    Shape at 100 TB: token explode collapses map-side into the
    partial-agg'd (lang, token) frequency shuffle; ranking + the fold
    run per lang over vocabulary-sized groups — corpus text never
    reaches the window."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.split(F.trim("text"), " +")).alias("w"),
    )
    freq = toks.groupBy("lang", "w").agg(F.count("*").alias("f"))
    return zipf_fit_from_freq(freq)


def zipf_fit_from_freq(freq: DataFrame) -> DataFrame:
    """The OLS fit over a (lang, w, f) frequency relation — the shared
    core of the batch query and the streaming count-log reader
    (streaming/zipf_stage.py): token counts are a sum monoid, so the
    folded log feeds the IDENTICAL fit and drained == batch holds
    bit-for-bit."""
    win = Window.partitionBy("lang").orderBy(F.desc("f"), "w")
    pts = freq.withColumn("r", F.row_number().over(win)).select(
        "lang",
        "r",
        "f",
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )

    def fold(expr_name):
        return F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("r", F.col(expr_name).alias("v")))
                ),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )

    sums = (
        pts.withColumn("xy", F.col("x") * F.col("y"))
        .withColumn("xx", F.col("x") * F.col("x"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("vocab_size"),
            F.sum("f").alias("total_tokens"),
            fold("x").alias("sx"),
            fold("y").alias("sy"),
            fold("xy").alias("sxy"),
            fold("xx").alias("sxx"),
        )
    )
    n = F.col("vocab_size")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "lang",
        "vocab_size",
        "total_tokens",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias(
            "zipf_intercept"
        ),
    ).orderBy("lang")


BURSTY_MIN_DF = 5
BURSTY_TOP_K = 20


@query(
    "token_burstiness_topk",
    oracle=f"""
    WITH tc AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
      FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), ' +')) AS w
        FROM documents
      ) GROUP BY doc_id, w
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    ), mom AS (
      SELECT w,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS total,
             CAST(sum(c * c) AS BIGINT) AS ssq
      FROM tc GROUP BY w
    )
    SELECT w AS token, df, total,
           CAST(ssq AS DOUBLE) / total
             - CAST(total AS DOUBLE) / n_docs AS fano
    FROM mom CROSS JOIN n
    WHERE df >= {BURSTY_MIN_DF}
    ORDER BY fano DESC, token
    LIMIT {BURSTY_TOP_K}
    """,
)
def token_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness: the Fano factor (variance-to-mean ratio,
    zeros included) of each token's per-document count — topical/bursty
    tokens score > 1, Poisson-scattered ~1, evenly-spread function
    words < 1; the standard corpus-linguistics signal for keyword
    extraction and stopword discovery. Algebra keeps it exact: with N
    docs, total occurrences T and per-doc sum of squares S,
    var/mean = S/T - T/N — two IEEE divisions of exact int64s and one
    subtraction, so the emitted doubles are bit-identical across
    engines with no rounding. LIMIT carries a (fano, token) total
    order. The df >= {BURSTY_MIN_DF} floor drops hapax noise.

    Shape at 100 TB: token explode collapses map-side into the
    partial-agg'd (doc, token) shuffle; per-token moments are a second
    vocabulary-keyed partial agg; top-k is TakeOrderedAndProject —
    corpus text crosses the wire once."""
    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select(
            "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    n = d.agg(F.count("*").alias("n_docs"))
    mom = tc.groupBy("w").agg(
        F.count("*").alias("df"),
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("ssq"),
    )
    fano = (
        F.col("ssq").cast("double") / F.col("total")
        - F.col("total").cast("double") / F.col("n_docs")
    )
    return (
        mom.crossJoin(F.broadcast(n))
        .where(F.col("df") >= BURSTY_MIN_DF)
        .select(
            F.col("w").alias("token"), "df", "total", fano.alias("fano")
        )
        .orderBy(F.desc("fano"), "token")
        .limit(BURSTY_TOP_K)
    )


@query("unigram_lm_piece_stats")  # iterative EM + big-int Viterbi — rows-only
def unigram_lm_piece_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus piece statistics under a learned unigram-LM
    (SentencePiece-style) subword tokenizer (Kudo 2018;
    operators/unigram_lm.py) — the EM-over-a-substring-lattice half of
    public tokenizer practice, completing the tokenization family next
    to BPE (text_bpe_token_stats): for each learned piece, how many
    distinct words segment through it and how many corpus tokens it
    covers.

    Deterministic by construction despite being EM: the hard-EM
    variant's every comparison is exact integer arithmetic (big-int
    cross-multiplied Viterbi scores, freq-weighted integer counts), so
    the learned model and every segmentation are bit-identical across
    partitionings — asserted against a fully sequential pure-Python
    reimplementation in tests/test_unigram_lm.py. No SQL oracle
    (iterative + arbitrary-precision comparisons are not
    SQL-replayable): rows-only with the exact pytest twin, like the
    other 14 such operators. Deviation from Kudo's full EM recorded in
    the operator docstring: expected-count E-steps are float sums
    whose value depends on reduction order; Viterbi-EM is the member
    of the family that meets this corpus's exactness discipline.

    Shape at 100 TB: the corpus collapses to the (word, freq)
    vocabulary in one shuffle; seeding is one substring partial-agg +
    two bounded collects; each EM round segments the VOCABULARY
    (Arrow-batched Python, vocab-sized) and re-aggregates piece counts
    in one vocab-sized shuffle with a model-sized driver collect (the
    BPE-argmax discipline); the final stats are one more vocab-sized
    explode + partial agg."""
    from ..operators.unigram_lm import piece_stats, word_vocab
    from ..pin import pin

    d = load_table(spark, sf_dir, "documents")
    return piece_stats(pin(word_vocab(d), site="uni.vocab"))


@query(
    "unigram_frozen_viterbi_stats",
    oracle="""
    WITH RECURSIVE words AS (
      SELECT unnest(string_split_regex(trim(text), ' +')) AS word
      FROM documents
    ), vocab AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM words WHERE word <> '' GROUP BY word
    ), subs AS MATERIALIZED (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS n FROM (
        SELECT v.freq,
               unnest(flatten(list_transform(range(1, length(v.word) + 1),
                 i -> list_transform(
                        range(1, least(6, length(v.word) - i + 1) + 1),
                        l -> v.word[i : i + l - 1])))) AS piece
        FROM vocab v
      ) GROUP BY piece
    ), model AS MATERIALIZED (
      SELECT piece, n FROM (
        SELECT piece, n FROM subs WHERE length(piece) > 1
        ORDER BY n DESC, piece LIMIT 256
      )
      UNION ALL
      SELECT piece, n FROM subs WHERE length(piece) = 1
    ), tot AS MATERIALIZED (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM model
    ), dp AS (
      -- per-word Viterbi DP: one row per (word, prefix length j),
      -- carrying the whole best-array as a list of structs so each
      -- recursion step can reach positions j-5..j (a recursive CTE's
      -- working set is only the previous iteration). 'ns' is the
      -- NEGATED double score (min(struct) = lexicographic, so the
      -- minimal struct is max score, then fewest pieces, then the
      -- chr(1)-joined piece string byte-wise — exactly the Python
      -- operator's argmax key in viterbi_segment_ratio).
      SELECT v.word, v.freq, 0 AS j,
             [{'ns': CAST(-1.0 AS DOUBLE), 'k': 0, 'p': ''}] AS bests
      FROM vocab v
      UNION ALL
      SELECT word, freq, j + 1, list_append(bests, nb) FROM (
        SELECT d.word, d.freq, d.j,
               any_value(d.bests) AS bests,
               min({'ns': d.bests[d.j + 2 - l.l]['ns']
                          * (CAST(m.n AS DOUBLE) / t.t),
                    'k': d.bests[d.j + 2 - l.l]['k'] + 1,
                    'p': CASE WHEN d.bests[d.j + 2 - l.l]['p'] = ''
                              THEN m.piece
                              ELSE d.bests[d.j + 2 - l.l]['p']
                                   || chr(1) || m.piece END}) AS nb
        FROM dp d
        CROSS JOIN tot t
        JOIN (SELECT unnest(range(1, 7)) AS l) l ON l.l <= d.j + 1
        JOIN model m ON m.piece = d.word[d.j + 2 - l.l : d.j + 1]
        WHERE d.j < length(d.word)
        GROUP BY d.word, d.freq, d.j
      )
    ), finals AS (
      SELECT word, freq,
             unnest(string_split(bests[length(word) + 1]['p'], chr(1)))
               AS piece
      FROM dp WHERE j = length(word)
    )
    SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words,
           CAST(sum(freq) AS BIGINT) AS corpus_count
    FROM finals GROUP BY piece ORDER BY piece
    """,
)
def unigram_frozen_viterbi_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus piece statistics under the FROZEN unigram seed model (EM
    round 0) with division-scored Viterbi segmentation — the
    hash-oracled half of the unigram-LM family (r12, closing the r11
    verdict's open question): the seed model is pure relational algebra
    (frequency-weighted substring counts, top-256 multi-char pieces by
    (count desc, piece asc) plus every single character), and the
    segmentation scores prod(c_i/T) in IEEE doubles with ONE division
    per model piece and ONE multiply per DP edge, ties broken by fewer
    pieces then the byte-wise-smaller joined piece string — a chain the
    DuckDB oracle replays exactly via a recursive-CTE lattice DP (the
    LM-fluency division-only precedent; see
    operators/unigram_lm.py::viterbi_segment_ratio). The EM-trained
    query (``unigram_lm_piece_stats``) stays rows-only by nature — its
    argmax needs arbitrary-precision integer comparison across
    iterative M-steps, which SQL cannot replay (SURVEY §8) — so this
    pair covers the family: frozen half hash-proven cross-engine,
    trained half pytest-proven against a sequential twin.

    Shape at 100 TB: identical to piece_stats — the corpus collapses
    to the (word, freq) vocabulary in ONE shuffle, seeding is one
    substring partial agg + two bounded collects (256 + alphabet),
    and the segmentation is Arrow-batched Python over the VOCABULARY
    only; the oracle's recursive DP is the sf-small replay, not the
    production plan."""
    from ..operators.unigram_lm import frozen_piece_stats, word_vocab
    from ..pin import pin

    d = load_table(spark, sf_dir, "documents")
    return frozen_piece_stats(pin(word_vocab(d), site="uni.frozen.vocab"))


@query(
    "tokenizer_fertility_per_lang",
    oracle="""
    WITH RECURSIVE words AS (
      SELECT unnest(string_split_regex(trim(text), ' +')) AS word
      FROM documents
    ), vocab AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM words WHERE word <> '' GROUP BY word
    ), subs AS MATERIALIZED (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS n FROM (
        SELECT v.freq,
               unnest(flatten(list_transform(range(1, length(v.word) + 1),
                 i -> list_transform(
                        range(1, least(6, length(v.word) - i + 1) + 1),
                        l -> v.word[i : i + l - 1])))) AS piece
        FROM vocab v
      ) GROUP BY piece
    ), model AS MATERIALIZED (
      SELECT piece, n FROM (
        SELECT piece, n FROM subs WHERE length(piece) > 1
        ORDER BY n DESC, piece LIMIT 256
      )
      UNION ALL
      SELECT piece, n FROM subs WHERE length(piece) = 1
    ), tot AS MATERIALIZED (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM model
    ), dp AS (
      -- identical Viterbi lattice DP to unigram_frozen_viterbi_stats
      -- (see that oracle's comment); only the finalize differs: the
      -- piece COUNT k per word, not the pieces themselves
      SELECT v.word, 0 AS j,
             [{'ns': CAST(-1.0 AS DOUBLE), 'k': 0, 'p': ''}] AS bests
      FROM vocab v
      UNION ALL
      SELECT word, j + 1, list_append(bests, nb) FROM (
        SELECT d.word, d.j,
               any_value(d.bests) AS bests,
               min({'ns': d.bests[d.j + 2 - l.l]['ns']
                          * (CAST(m.n AS DOUBLE) / t.t),
                    'k': d.bests[d.j + 2 - l.l]['k'] + 1,
                    'p': CASE WHEN d.bests[d.j + 2 - l.l]['p'] = ''
                              THEN m.piece
                              ELSE d.bests[d.j + 2 - l.l]['p']
                                   || chr(1) || m.piece END}) AS nb
        FROM dp d
        CROSS JOIN tot t
        JOIN (SELECT unnest(range(1, 7)) AS l) l ON l.l <= d.j + 1
        JOIN model m ON m.piece = d.word[d.j + 2 - l.l : d.j + 1]
        WHERE d.j < length(d.word)
        GROUP BY d.word, d.j
      )
    ), wk AS (
      SELECT word, CAST(bests[length(word) + 1]['k'] AS BIGINT) AS k
      FROM dp WHERE j = length(word)
    ), lw AS (
      SELECT lang, word, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS word
        FROM documents
      ) WHERE word <> '' GROUP BY 1, 2
    )
    SELECT lang,
           CAST(sum(freq) AS BIGINT) AS n_words,
           CAST(sum(freq * length(word)) AS BIGINT) AS n_chars,
           CAST(sum(freq * k) AS BIGINT) AS n_pieces,
           CAST(sum(freq * length(word)) AS DOUBLE)
             / CAST(sum(freq * k) AS DOUBLE) AS chars_per_piece,
           CAST(sum(freq * k) AS DOUBLE)
             / CAST(sum(freq) AS DOUBLE) AS pieces_per_word
    FROM lw JOIN wk USING (word)
    GROUP BY lang ORDER BY lang
    """,
)
def tokenizer_fertility_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language under the frozen unigram seed
    model: chars-per-piece and pieces-per-word — THE standard
    multilingual-tokenizer-bias diagnostic (a language whose fertility
    is much worse than the corpus majority pays more sequence length
    per character, i.e., gets fewer effective context tokens; public
    practice audits this before committing a vocabulary). Each metric
    is ONE IEEE division of exact int64 sums, so DuckDB lands on
    identical bits; the per-word piece count k comes from the same
    division-scored Viterbi chain as ``unigram_frozen_viterbi_stats``
    (one recursive-CTE lattice DP in the oracle).

    Shape at 100 TB: the corpus collapses to the (lang, word, freq)
    relation in ONE shuffle; the distinct-word dim segments once
    (Arrow-batched, vocab-sized) and joins back word-to-word
    (vocab-sized x vocab-sized, never corpus-sized); the finalize is a
    lang-sized partial agg. int64 headroom: n_chars <= corpus bytes —
    exact past 9e18 bytes (~9 exabytes)."""
    from ..operators.unigram_lm import frozen_word_piece_counts, word_vocab
    from ..pin import pin

    d = load_table(spark, sf_dir, "documents")
    vocab = pin(word_vocab(d), site="uni.fert.vocab")
    wk = frozen_word_piece_counts(vocab)
    lw = (
        d.select(
            "lang", F.explode(F.split(F.trim("text"), " +")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count("*").alias("freq"))
    )
    j = lw.join(wk, "word")
    agg = j.groupBy("lang").agg(
        F.sum("freq").alias("n_words"),
        F.sum(F.col("freq") * F.length("word")).alias("n_chars"),
        F.sum(F.col("freq") * F.col("k")).alias("n_pieces"),
    )
    return agg.select(
        "lang",
        "n_words",
        "n_chars",
        "n_pieces",
        (
            F.col("n_chars").cast("double") / F.col("n_pieces").cast("double")
        ).alias("chars_per_piece"),
        (
            F.col("n_pieces").cast("double") / F.col("n_words").cast("double")
        ).alias("pieces_per_word"),
    ).orderBy("lang")


from ..operators.dictscan import DICT_TERMS as _DICT_TERMS  # noqa: E402

_DICT_VALUES = ", ".join(f"('{t}')" for t in _DICT_TERMS)


@query(
    "dictionary_term_scan",
    oracle=f"""
    WITH terms(term) AS (VALUES {_DICT_VALUES}),
    hits AS (
      -- non-overlapping left-to-right occurrence count: DuckDB's
      -- replace() removes exactly the occurrences Python str.count and
      -- the Aho-Corasick greedy filter count, so the semantics match
      -- bit-for-bit; // keeps the division exact integer
      SELECT t.term,
             CAST((length(d.text) - length(replace(d.text, t.term, '')))
                  // length(t.term) AS BIGINT) AS hits
      FROM documents d CROSS JOIN terms t
    )
    SELECT term,
           CAST(count(CASE WHEN hits > 0 THEN 1 END) AS BIGINT) AS n_docs,
           CAST(sum(hits) AS BIGINT) AS n_hits
    FROM hits GROUP BY term ORDER BY term
    """,
)
def dictionary_term_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagged-term dictionary audit via Aho-Corasick (r12): per
    dictionary term, the documents containing it and the total
    non-overlapping occurrences — the blocklist/PII-dictionary stage of
    a crawl pipeline, where production dictionaries run 10k+ terms and
    the naive shape (one contains()/LIKE per term) multiplies the
    corpus scan by the dictionary size. The automaton pass is ONE
    corpus scan regardless of |dictionary| (operators/dictscan.py,
    Arrow-batched mapInPandas; the dictionary ships in the closure like
    any broadcast dim), emitting output-sized (doc, term, hits) rows;
    then one term-sized partial agg + a broadcast join against the term
    dim so zero-hit terms REPORT as 0. The oracle replays the scan
    relationally (docs x terms replace-count — the sf-small shape this
    operator exists to avoid at 100 TB); counts are exact int64, no
    floats anywhere. The vendored dictionary includes absent terms
    (zero rows must appear) and self-overlapping shapes
    ('table table') that pin the non-overlapping semantics in every
    round's hash compare."""
    from ..operators.dictscan import dictionary_term_report

    return dictionary_term_report(load_table(spark, sf_dir, "documents"))
