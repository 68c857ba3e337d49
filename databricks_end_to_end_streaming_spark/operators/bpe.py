"""Byte-pair-encoding merge learning over a distributed corpus.

Classic vocabulary-level BPE (Sennrich/Haddow/Birch 2016, public
literature): work on the DISTINCT word vocabulary weighted by word
frequency — at 100 TB the corpus shrinks by orders of magnitude in the
first aggregation, and every subsequent round touches only vocabulary-
sized data. Each merge round is:

1. adjacent-pair counts: explode ``zip(symbols[:-1], symbols[1:])``
   weighted by word frequency (overlapping occurrences count, as in the
   reference algorithm), partial-agg'd map-side;
2. the argmax pair: ``orderBy(count desc, pair)`` + ``limit(1)`` — a
   ``TakeOrderedAndProject``, ONE row to the driver per round (the only
   driver traffic);
3. apply the merge to every word's symbol array with a JVM-side
   ``aggregate`` fold (left-to-right greedy, exactly the sequential
   semantics) — no Python UDF anywhere;
4. ``localCheckpoint`` to truncate lineage (iterative-algorithm hygiene,
   same as ``operators/graph.py``).

Ties break lexicographically on the pair, so the learned merge table is
deterministic across engines, partitionings, and cluster sizes.

``batch_k > 1`` bounds the driver-paced loop at scale (the one blemish
the round-3 audit noted): each driver round collects a small candidate
POOL instead of one row and accepts the longest prefix of candidates
that is PROVABLY order-equivalent to running them as separate
sequential rounds — the public "batch compatible merges" optimization
(known from parallel BPE trainers; see e.g. the batching discussion in
SentencePiece/fastBPE lineage). A candidate is safe iff, versus every
earlier-accepted merge (l, r) -> m=l+r in the same round:

1. it shares no symbol with {l, r} and is not m itself — so applying
   the earlier merge cannot destroy or create occurrences of the
   candidate (its count is exactly unchanged); and
2. its count strictly exceeds every pair the earlier merge can CREATE.
   Created pairs all involve m on one side, and (x, m) / (m, y) counts
   are bounded by the existing counts of (x, l) / (r, y) — so the
   bound is the max count among pool pairs adjacent to the merge,
   widened to the pool floor when the pool was truncated (pairs outside
   the pool can't exceed it).

The first unsafe candidate ends the round (a later candidate might not
be the sequential argmax anymore), so the result is bit-identical to
batch_k=1 — asserted against the sequential Python reference in
tests/test_bpe.py — while the number of driver rounds drops ~batch_k×.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from ..pin import pin

END_OF_WORD = "</w>"


def words_to_symbols(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Append ``symbols``: the word split into single characters, with
    the end-of-word marker fused onto the final character (so word-final
    units are distinct merge targets — the classic formulation)."""
    chars = F.expr(f"regexp_extract_all({word_col}, '.', 0)")
    syms = F.transform(
        chars,
        lambda c, i: F.when(
            i == F.size(chars) - 1, F.concat(c, F.lit(END_OF_WORD))
        ).otherwise(c),
    )
    return words.withColumn("symbols", syms)


def _apply_merge(left: str, right: str) -> F.Column:
    """Fold ``symbols`` left-to-right, fusing every adjacent
    (left, right) occurrence — greedy sequential semantics."""
    merged = left + right
    return F.aggregate(
        "symbols",
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _safe_batch_prefix(
    pool: list[tuple[str, str, int]],
    truncated: bool,
    batch_k: int,
) -> list[tuple[str, str, int]]:
    """Longest prefix of the (n desc, left, right)-ordered candidate
    ``pool`` that is provably order-equivalent to sequential rounds (see
    module docstring for the two safety conditions). Pure driver-side
    logic over at most ``len(pool)`` rows."""
    floor_n = pool[-1][2] if truncated and pool else 0
    accepted: list[tuple[str, str, int]] = []
    for left, right, n in pool:
        if n < 2:
            break
        safe = True
        for al, ar, _an in accepted:
            merged = al + ar
            if left in (al, ar, merged) or right in (al, ar, merged):
                safe = False
                break
            created_bound = max(
                (pn for pl, pr, pn in pool if pr == al or pl == ar),
                default=0,
            )
            if n <= max(created_bound, floor_n):
                safe = False
                break
        if not safe:
            break
        accepted.append((left, right, n))
        if len(accepted) == batch_k:
            break
    return accepted


def learn_bpe_merges(
    vocab: DataFrame,
    num_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    batch_k: int = 1,
    candidate_pool: int = 64,
    return_symbols: bool = False,
) -> (
    list[tuple[str, str, int]]
    | tuple[list[tuple[str, str, int]], DataFrame]
):
    """Learn ``num_merges`` BPE merges from a (word, freq) vocabulary.
    Returns [(left, right, weighted_pair_count), ...] in merge order;
    stops early when no pair occurs twice (count 1 merges are noise).
    ``batch_k > 1`` accepts up to that many provably-compatible merges
    per driver round (identical output, ~batch_k× fewer rounds);
    ``candidate_pool`` caps the rows collected per round.

    ``return_symbols=True`` (r14) additionally returns the final
    (word, symbols) relation with every accepted merge applied — the
    post-training tokenization of the STILL-MERGEABLE vocabulary.
    Words absent from it have exactly ONE BPE token: a word leaves the
    loop only when its symbol array has shrunk to a single element
    (or started as one), and ``_apply_merge`` over a singleton is the
    identity, so no later merge can change it. Consumers that need
    per-word token counts (``bpe_corpus_compression``) therefore read
    them as ``coalesce(size(symbols), 1)`` instead of re-applying the
    whole merge table to the vocabulary from scratch — which re-ran
    one fold + one checkpoint PER MERGE (``bpe_token_counts``)."""
    df = words_to_symbols(vocab, word_col).select(
        word_col, F.col(freq_col).alias("freq"), "symbols"
    )
    df = df.where(F.size("symbols") >= 2).transform(pin)

    merges: list[tuple[str, str, int]] = []
    folds_since_pin = 0
    while len(merges) < num_merges:
        pairs = (
            df.select(
                "freq",
                F.expr("slice(symbols, 1, size(symbols) - 1)").alias("s1"),
                F.expr("slice(symbols, 2, size(symbols) - 1)").alias("s2"),
            )
            .select("freq", F.explode(F.arrays_zip("s1", "s2")).alias("pr"))
            .groupBy(
                F.col("pr.s1").alias("left"), F.col("pr.s2").alias("right")
            )
            .agg(F.sum("freq").alias("n"))
        )
        # TakeOrderedAndProject: a bounded handful of rows to the driver
        # per round (one row when batch_k == 1 — the r2-audited shape)
        limit = 1 if batch_k == 1 else max(candidate_pool, batch_k)
        top = pairs.orderBy(F.desc("n"), "left", "right").limit(limit).collect()
        pool = [(r["left"], r["right"], int(r["n"])) for r in top]
        accepted = _safe_batch_prefix(
            pool,
            truncated=len(pool) == limit and batch_k > 1,
            batch_k=min(batch_k, num_merges - len(merges)),
        )
        if not accepted:
            break
        merges.extend(accepted)
        if len(merges) >= num_merges and not return_symbols:
            # r14: the re-merged relation would never be consumed —
            # skip the final fold + checkpoint job
            break
        for left, right, _n in accepted:
            df = df.withColumn("symbols", _apply_merge(left, right))
        df = df.where(F.size("symbols") >= 2)
        folds_since_pin += len(accepted)
        # r14: checkpoint on lineage DEPTH, not per round — a fold over
        # the vocabulary-sized relation is a cheap map, so re-deriving
        # a handful of them from the last checkpoint beats paying a
        # materialization job every round (~1 job per round at the
        # bench's 4-round learn); deep merge tables still truncate
        # every 8 folds, so plans never grow with num_merges.
        if folds_since_pin >= 8:
            df = pin(df)
            folds_since_pin = 0
    if return_symbols:
        return merges, df.select(word_col, "symbols")
    return merges


def learn_bpe_from_texts(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    batch_k: int = 1,
    return_symbols: bool = False,
):
    """End-to-end: whitespace words -> frequency vocabulary (the big
    corpus-shrinking aggregation) -> merge learning.
    ``return_symbols`` as in ``learn_bpe_merges``."""
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(text_col), " +")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return learn_bpe_merges(
        vocab, num_merges, batch_k=batch_k, return_symbols=return_symbols
    )


def bpe_token_counts(
    vocab: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge table to the word VOCABULARY and return
    (word, n_bpe_tokens). The scalable corpus-tokenization shape: the
    merge folds run once per DISTINCT word (vocabulary-sized, not
    corpus-sized); callers join the result back to exploded corpus words
    — broadcastable, since a word vocabulary is tiny next to the corpus.
    Lineage is checkpointed per merge so expression depth stays flat."""
    df = words_to_symbols(vocab.select(word_col), word_col)
    for m in merges:
        left, right = m[0], m[1]
        df = df.withColumn("symbols", _apply_merge(left, right)).transform(pin)
    return df.select(
        word_col, F.size("symbols").cast("long").alias("n_bpe_tokens")
    )
