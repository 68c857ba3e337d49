"""Unigram-LM (SentencePiece-style) subword tokenizer learning over a
distributed corpus — the EM-over-a-substring-lattice half of public
tokenizer practice (Kudo 2018, "Subword Regularization", public
literature), completing the tokenization family next to BPE
(operators/bpe.py) the way Kneser-Ney completed the LM family.

Same scale skeleton as BPE: all learning happens on the DISTINCT word
vocabulary weighted by word frequency — the corpus collapses by orders
of magnitude in the first aggregation and every later step touches
vocabulary-sized data only.

Variant implemented: **hard-EM (Viterbi-EM)** with EXACT integer
arithmetic end to end — no logs, no floats, nothing engine- or
partitioning-dependent:

1. **Seed**: every substring of every vocabulary word up to
   MAX_PIECE_LEN, weighted by word frequency, partial-agg'd; the top
   ``seed_size`` multi-char pieces (count desc, piece asc — a total
   order) plus ALL single characters (never pruned, so every word
   always has at least the character segmentation).
2. **E-step**: each distinct word gets its single BEST segmentation
   under the current model via an exact-Viterbi lattice DP. A
   segmentation's probability is prod(c_i) / T^k (c_i = piece count,
   T = model total); two candidates compare by the cross-multiplied
   big integers p_a * T^k_b vs p_b * T^k_a — Python arbitrary
   precision, EXACT, which is why this is a (bounded, Arrow-batched)
   mapInPandas over the vocabulary rather than a JVM expression. Ties
   break on fewer pieces, then the lexicographically smaller piece
   tuple — total order, so the argmax is unique.
3. **M-step + prune**: piece counts re-aggregate in ONE vocabulary-
   sized shuffle (sum of freq-weighted usage); the new model keeps the
   top ``vocab_target`` multi-char pieces (count desc, piece asc) +
   all single characters (floored at count 1 — an unused character
   must stay reachable, the standard smoothing). Fixed ``em_rounds``
   driver-paced rounds; per-round driver traffic is one model-sized
   collect (<= seed_size + alphabet rows), the BPE-argmax discipline.

Hard EM monotonically increases the Viterbi objective and is the
deterministic member of the EM family (full forward-backward expected
counts are float sums whose value depends on reduction order — the
exact-integer discipline this corpus runs on rules that out; the
docstring of the registered query records the deviation). No SQL
oracle: iterative + big-int comparisons are not SQL-replayable; the
pytest twin (tests/test_unigram_lm.py) re-implements the whole
pipeline sequentially and asserts bit-for-bit equality of the learned
model AND every segmentation.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MAX_PIECE_LEN = 6
SEED_SIZE = 256
VOCAB_TARGET = 96
EM_ROUNDS = 3


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) whitespace vocabulary — the corpus-shrinking first
    aggregation (same shape as learn_bpe_from_texts)."""
    return (
        docs.select(F.explode(F.split(F.trim(text_col), " +")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def seed_pieces(
    vocab: DataFrame,
    max_piece_len: int = MAX_PIECE_LEN,
    seed_size: int = SEED_SIZE,
) -> dict[str, int]:
    """Initial piece model: frequency-weighted substring counts, top
    ``seed_size`` multi-char pieces + every single character. One
    partial-agg'd shuffle of (piece, n); two bounded collects
    (TakeOrdered for the multi-char head, alphabet-sized for chars)."""
    subs = vocab.select(
        "freq",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), i ->
                     transform(sequence(1, least({max_piece_len},
                                                 length(word) - i + 1)),
                               l -> substr(word, i, l))))"""
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("n"))
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.desc("n"), "piece")
        .limit(seed_size)
        .collect()
    )
    chars = counts.where(F.length("piece") == 1).collect()
    model = {r["piece"]: int(r["n"]) for r in multi}
    model.update({r["piece"]: int(r["n"]) for r in chars})
    return model


def viterbi_segment(
    word: str, model: dict[str, int], total: int
) -> tuple[str, ...]:
    """Exact-argmax segmentation of ``word`` under the unigram model:
    maximizes prod(count_i) / total^k by cross-multiplied big-int
    comparison (module docstring); ties -> fewer pieces, then the
    lexicographically smaller piece tuple. Assumes every character of
    ``word`` is in the model (guaranteed for corpus words: single
    chars are never pruned)."""
    n = len(word)
    max_len = max(map(len, model)) if model else 1
    # best[j]: (prod, k, pieces) for word[:j]
    best: list[tuple[int, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (1, 0, ())
    for j in range(1, n + 1):
        top: tuple[int, int, tuple[str, ...]] | None = None
        for length in range(1, min(max_len, j) + 1):
            prev = best[j - length]
            if prev is None:
                continue
            piece = word[j - length : j]
            c = model.get(piece)
            if c is None:
                continue
            cand = (prev[0] * c, prev[1] + 1, prev[2] + (piece,))
            if top is None or _beats(cand, top, total):
                top = cand
        best[j] = top
    if best[n] is None:
        raise ValueError(f"word {word!r} has characters outside the model")
    return best[n][2]


def _beats(a, b, total: int) -> bool:
    lhs = a[0] * pow(total, b[1])
    rhs = b[0] * pow(total, a[1])
    if lhs != rhs:
        return lhs > rhs
    if a[1] != b[1]:
        return a[1] < b[1]
    return a[2] < b[2]


def _em_piece_counts(vocab: DataFrame, model: dict[str, int]) -> DataFrame:
    """E-step: (piece, n) freq-weighted usage counts over the best
    segmentations — Arrow-batched Python over the VOCABULARY (bounded),
    then one partial-agg'd piece shuffle."""
    items = sorted(model.items())  # deterministic closure payload

    def seg(batches):
        m = dict(items)
        total = sum(m.values())
        for b in batches:
            recs: list[tuple[str, int]] = []
            for w, f in zip(b["word"], b["freq"]):
                for p in viterbi_segment(w, m, total):
                    recs.append((p, int(f)))
            yield pd.DataFrame(recs, columns=["piece", "cnt"])

    out = vocab.select("word", "freq").mapInPandas(
        seg, schema="piece string, cnt long"
    )
    return out.groupBy("piece").agg(F.sum("cnt").alias("n"))


def learn_unigram_lm(
    vocab: DataFrame,
    max_piece_len: int = MAX_PIECE_LEN,
    seed_size: int = SEED_SIZE,
    vocab_target: int = VOCAB_TARGET,
    em_rounds: int = EM_ROUNDS,
) -> dict[str, int]:
    """Learn the unigram piece model from a (word, freq) vocabulary.
    Returns {piece: count} after ``em_rounds`` hard-EM rounds with
    top-``vocab_target`` pruning (single chars always retained,
    floored at count 1)."""
    model = seed_pieces(vocab, max_piece_len, seed_size)
    alphabet = [p for p in model if len(p) == 1]  # fixed at seeding
    for _ in range(em_rounds):
        counts = {
            r["piece"]: int(r["n"])
            for r in _em_piece_counts(vocab, model).collect()
        }
        multi = sorted(
            ((p, n) for p, n in counts.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[:vocab_target]
        model = dict(multi)
        # the alphabet is never pruned, floored at count 1 so rare
        # words stay segmentable even when longer pieces absorbed all
        # of a character's usage (standard smoothing)
        for c in alphabet:
            model[c] = max(counts.get(c, 0), 1)
    return model


def piece_stats(vocab: DataFrame) -> DataFrame:
    """(piece, piece_len, n_words, corpus_count): learn the model from
    a (word, freq) vocabulary and emit per-piece corpus statistics —
    the scoring core shared verbatim by the registered batch query and
    the streaming twin (streaming/unigram_lm_stage.py), so drained ==
    batch reduces to fold-invariance of the vocabulary monoid."""
    model = learn_unigram_lm(vocab)
    seged = tokenize_vocab(vocab, model)
    return (
        seged.select("word", "freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(
            F.countDistinct("word").alias("n_words"),
            F.sum("freq").alias("corpus_count"),
        )
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            "n_words",
            "corpus_count",
        )
        .orderBy("piece")
    )


def tokenize_vocab(vocab: DataFrame, model: dict[str, int]) -> DataFrame:
    """(word, freq, pieces) best segmentations of the vocabulary under a
    learned model — the vocabulary-sized tokenization relation callers
    broadcast-join back to the corpus."""
    items = sorted(model.items())

    def seg(batches):
        m = dict(items)
        total = sum(m.values())
        for b in batches:
            out = [
                (w, int(f), list(viterbi_segment(w, m, total)))
                for w, f in zip(b["word"], b["freq"])
            ]
            yield pd.DataFrame(out, columns=["word", "freq", "pieces"])

    return vocab.select("word", "freq").mapInPandas(
        seg, schema="word string, freq long, pieces array<string>"
    )


SEP = "\x01"  # joined-pieces tie-break separator: below every corpus
# byte, so byte-wise comparison of the joined string equals tuple
# comparison of the piece sequence (equal k => equal joined lengths,
# so no prefix ambiguity); DuckDB compares VARCHARs byte-wise and
# Python by code point — identical orders over UTF-8


def viterbi_segment_ratio(
    word: str, model: dict[str, int], total: int
) -> tuple[str, ...]:
    """Division-scored Viterbi twin of ``viterbi_segment`` — the
    SQL-replayable member of the pair: the score is prod(c_i/total)
    accumulated left-to-right in IEEE doubles (ONE division per model
    piece, ONE multiply per DP edge), and the argmax key is
    (-score, k, SEP-joined pieces) compared exactly — precisely the
    chain the DuckDB oracle's recursive CTE replays, so the chosen
    segmentation is bit-identical cross-engine (the LM-fluency
    division-only precedent; ln() would not be bit-portable). Long
    words can underflow the double score to 0.0 — identically in both
    engines — after which the k/pieces tie-breaks still give a unique
    deterministic argmax. The big-int ``viterbi_segment`` remains the
    exact-argmax member (no rounding ever); this one exists so a
    FROZEN model's segmentation can be hash-oracled."""
    n = len(word)
    max_len = max(map(len, model)) if model else 1
    ratio = {p: c / total for p, c in model.items()}
    # best[j]: (key, score) with key = (-score, k, joined) for word[:j]
    best: list[tuple[tuple[float, int, str], float] | None] = [
        None
    ] * (n + 1)
    best[0] = ((-1.0, 0, ""), 1.0)
    for j in range(1, n + 1):
        top: tuple[tuple[float, int, str], float] | None = None
        for length in range(1, min(max_len, j) + 1):
            prev = best[j - length]
            piece = word[j - length : j]
            r = ratio.get(piece)
            if r is None or prev is None:
                continue
            (_, pk, pp), ps = prev
            s = ps * r
            joined = piece if pp == "" else pp + SEP + piece
            key = (-s, pk + 1, joined)
            if top is None or key < top[0]:
                top = (key, s)
        best[j] = top
    if best[n] is None:
        raise ValueError(f"word {word!r} has characters outside the model")
    return tuple(best[n][0][2].split(SEP))


def frozen_piece_stats(vocab: DataFrame) -> DataFrame:
    """(piece, piece_len, n_words, corpus_count) under the FROZEN seed
    model (EM round 0) with division-scored Viterbi — the hash-oracled
    half of the unigram-LM family: the seed model is pure relational
    algebra (substring counts, top-``SEED_SIZE`` multi-char + all
    chars) and the segmentation chain is SQL-replayable (see
    ``viterbi_segment_ratio``), so DuckDB reproduces every piece row
    bit-for-bit where the EM-trained ``piece_stats`` cannot be
    (arbitrary-precision argmax + iterative M-steps — the impossibility
    note lives in SURVEY §8). Same distributed shape as piece_stats:
    seeding is one substring partial agg + two bounded collects; the
    segmentation is Arrow-batched Python over the VOCABULARY only."""
    model = seed_pieces(vocab)
    items = sorted(model.items())

    def seg(batches):
        m = dict(items)
        total = sum(m.values())
        for b in batches:
            out = [
                (w, int(f), list(viterbi_segment_ratio(w, m, total)))
                for w, f in zip(b["word"], b["freq"])
            ]
            yield pd.DataFrame(out, columns=["word", "freq", "pieces"])

    seged = vocab.select("word", "freq").mapInPandas(
        seg, schema="word string, freq long, pieces array<string>"
    )
    return (
        seged.select("word", "freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(
            F.countDistinct("word").alias("n_words"),
            F.sum("freq").alias("corpus_count"),
        )
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            "n_words",
            "corpus_count",
        )
        .orderBy("piece")
    )


def frozen_word_piece_counts(vocab: DataFrame) -> DataFrame:
    """(word, k): piece count of each distinct word's division-scored
    Viterbi segmentation under the FROZEN seed model — the word-dim
    relation fertility metrics join back to per-language frequencies
    (tokenizer_fertility_per_lang). Same bounded shape as
    frozen_piece_stats: model collects once (256 + alphabet rows), the
    segmentation is Arrow-batched Python over the vocabulary only."""
    model = seed_pieces(vocab)
    items = sorted(model.items())

    def seg(batches):
        m = dict(items)
        total = sum(m.values())
        for b in batches:
            yield pd.DataFrame(
                {
                    "word": b["word"],
                    "k": [
                        len(viterbi_segment_ratio(w, m, total))
                        for w in b["word"]
                    ],
                }
            )

    return vocab.select("word").mapInPandas(seg, schema="word string, k long")
