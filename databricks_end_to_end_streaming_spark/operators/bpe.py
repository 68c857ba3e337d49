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
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

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


def learn_bpe_merges(
    vocab: DataFrame,
    num_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from a (word, freq) vocabulary.
    Returns [(left, right, weighted_pair_count), ...] in merge order;
    stops early when no pair occurs twice (count 1 merges are noise).
    """
    df = words_to_symbols(vocab, word_col).select(
        F.col(freq_col).alias("freq"), "symbols"
    )
    df = df.where(F.size("symbols") >= 2).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
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
        top = (
            pairs.orderBy(F.desc("n"), "left", "right").limit(1).collect()
        )  # ONE row crosses to the driver per round
        if not top or top[0]["n"] < 2:
            break
        left, right, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        merges.append((left, right, n))
        df = (
            df.withColumn("symbols", _apply_merge(left, right))
            .where(F.size("symbols") >= 2)
            .localCheckpoint(eager=True)
        )
    return merges


def learn_bpe_from_texts(
    docs: DataFrame, text_col: str = "text", num_merges: int = 8
) -> list[tuple[str, str, int]]:
    """End-to-end: whitespace words -> frequency vocabulary (the big
    corpus-shrinking aggregation) -> merge learning."""
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(text_col), " +")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return learn_bpe_merges(vocab, num_merges)


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
        df = df.withColumn("symbols", _apply_merge(left, right)).localCheckpoint(
            eager=True
        )
    return df.select(
        word_col, F.size("symbols").cast("long").alias("n_bpe_tokens")
    )
