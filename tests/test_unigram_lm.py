"""Unigram-LM tokenizer (operators/unigram_lm.py): the distributed
hard-EM pipeline is asserted BIT-FOR-BIT against a fully sequential
pure-Python reimplementation (independent code: plain dicts and loops,
no Spark, no shared helpers), plus planted cases pinning the greedy
behavior the exact-integer Viterbi must exhibit."""

from __future__ import annotations

import os
from collections import Counter

import pytest

from databricks_end_to_end_streaming_spark.operators.unigram_lm import (
    learn_unigram_lm,
    seed_pieces,
    tokenize_vocab,
    viterbi_segment,
    word_vocab,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ------------------------------------------------ sequential reference


def ref_seed(vocab, max_len, seed_size):
    counts = Counter()
    for w, f in vocab:
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                counts[w[i : i + l]] += f
    multi = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    model = dict(multi)
    model.update({p: n for p, n in counts.items() if len(p) == 1})
    return model


def ref_viterbi(word, model, total):
    n = len(word)
    max_len = max(map(len, model))
    best = [None] * (n + 1)
    best[0] = (1, 0, ())
    for j in range(1, n + 1):
        top = None
        for l in range(1, min(max_len, j) + 1):
            prev = best[j - l]
            piece = word[j - l : j]
            if prev is None or piece not in model:
                continue
            cand = (prev[0] * model[piece], prev[1] + 1, prev[2] + (piece,))
            if top is None:
                top = cand
                continue
            lhs = cand[0] * total ** top[1]
            rhs = top[0] * total ** cand[1]
            if lhs > rhs or (
                lhs == rhs
                and (cand[1], cand[2]) < (top[1], top[2])
            ):
                top = cand
        best[j] = top
    return best[n][2]


def ref_learn(vocab, max_len, seed_size, vocab_target, rounds):
    model = ref_seed(vocab, max_len, seed_size)
    alphabet = [p for p in model if len(p) == 1]
    for _ in range(rounds):
        counts = Counter()
        total = sum(model.values())
        for w, f in vocab:
            for p in ref_viterbi(w, model, total):
                counts[p] += f
        multi = sorted(
            ((p, n) for p, n in counts.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[:vocab_target]
        model = dict(multi)
        for c in alphabet:
            model[c] = max(counts.get(c, 0), 1)
    return model


# --------------------------------------------------------------- tests

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and a rat sat",
    "mats and rats and cats",
    "the matter of the scatter",
]


def _spark_vocab(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    return word_vocab(docs)


def _ref_vocab():
    c = Counter(w for t in CORPUS for w in t.split())
    return sorted(c.items())


def test_seed_matches_reference(spark):
    got = seed_pieces(_spark_vocab(spark), max_piece_len=4, seed_size=20)
    want = ref_seed(_ref_vocab(), 4, 20)
    assert got == want


def test_learned_model_matches_reference_exactly(spark):
    got = learn_unigram_lm(
        _spark_vocab(spark),
        max_piece_len=4,
        seed_size=20,
        vocab_target=12,
        em_rounds=3,
    )
    want = ref_learn(_ref_vocab(), 4, 20, 12, 3)
    assert got == want


def test_segmentations_match_reference_exactly(spark):
    model = ref_learn(_ref_vocab(), 4, 20, 12, 3)
    total = sum(model.values())
    got = {
        r["word"]: tuple(r["pieces"])
        for r in tokenize_vocab(_spark_vocab(spark), model).collect()
    }
    want = {w: ref_viterbi(w, model, total) for w, _f in _ref_vocab()}
    assert got == want
    # every word reassembles from its pieces
    assert all("".join(ps) == w for w, ps in got.items())


def test_viterbi_prefers_high_count_piece():
    # "ab" has overwhelming count: segmenting "abab" must use it twice
    model = {"a": 5, "b": 5, "ab": 100, "ba": 1}
    assert viterbi_segment("abab", model, sum(model.values())) == ("ab", "ab")


def test_viterbi_tie_breaks_fewer_pieces_then_lex():
    # exact tie: p("xy") = 4/16 vs p("x")p("y") = (8/16)(8/16) = 4/16
    # (cross-multiplied: 4*16^2 == 8*8*16) -> fewer pieces wins
    model = {"x": 8, "y": 8, "xy": 4}
    assert viterbi_segment("xy", model, 16) == ("xy",)


def test_chars_survive_pruning(spark):
    # a word whose every char is absorbed by longer pieces elsewhere
    # still segments (alphabet floor): "q" appears once, never seeded
    # into any multi-char piece kept by a tiny vocab_target
    docs = spark.createDataFrame(
        [("the the the the q",)], "text string"
    )
    model = learn_unigram_lm(
        word_vocab(docs),
        max_piece_len=3,
        seed_size=4,
        vocab_target=2,
        em_rounds=2,
    )
    assert "q" in model and model["q"] >= 1
    assert viterbi_segment("q", model, sum(model.values())) == ("q",)


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_registered_query_shape_and_coverage(spark):
    from databricks_end_to_end_streaming_spark.queries import all_queries

    rows = all_queries()["unigram_lm_piece_stats"](spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r.piece_len == len(r.piece) for r in rows)
    assert all(r.n_words >= 1 and r.corpus_count >= r.n_words for r in rows)
    # total piece instances cover every corpus token at least once
    # (each word contributes >= 1 piece per occurrence)
    from databricks_end_to_end_streaming_spark.operators.unigram_lm import (
        word_vocab as wv,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    n_tokens = (
        wv(load_table(spark, SF_DIR, "documents"))
        .agg({"freq": "sum"})
        .first()[0]
    )
    assert sum(r.corpus_count for r in rows) >= n_tokens


def _ref_frozen_stats(corpus_texts):
    """Sequential reference of the r12 frozen-model double-Viterbi piece
    stats (full defaults: max_piece_len=6, seed_size=256): substring
    seed model, prod(c/T)-in-doubles Viterbi with the
    (-score, k, joined) key, per-piece (n_words, corpus_count)."""
    from databricks_end_to_end_streaming_spark.operators.unigram_lm import (
        SEP,
    )

    vocab = Counter(w for t in corpus_texts for w in t.split())
    subs = Counter()
    for w, f in vocab.items():
        for i in range(len(w)):
            for ln in range(1, min(6, len(w) - i) + 1):
                subs[w[i : i + ln]] += f
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:256]
    model = dict(multi)
    model.update({p: c for p, c in subs.items() if len(p) == 1})
    total = sum(model.values())

    def vit(word):
        best = [None] * (len(word) + 1)
        best[0] = ((-1.0, 0, ""), 1.0)
        for j in range(1, len(word) + 1):
            top = None
            for ln in range(1, min(6, j) + 1):
                p = word[j - ln : j]
                c = model.get(p)
                prev = best[j - ln]
                if c is None or prev is None:
                    continue
                (_, pk, pp), ps = prev
                s = ps * (c / total)
                joined = p if pp == "" else pp + SEP + p
                key = (-s, pk + 1, joined)
                if top is None or key < top[0]:
                    top = (key, s)
            best[j] = top
        return best[len(word)][0][2].split(SEP)

    stats = {}
    for w, f in vocab.items():
        pieces = vit(w)
        for p in pieces:
            ws, cc = stats.get(p, (set(), 0))
            ws.add(w)
            stats[p] = (ws, cc + f)
    return sorted(
        (p, len(p), len(ws), cc) for p, (ws, cc) in stats.items()
    )


def test_frozen_viterbi_stats_match_reference_exactly(spark):
    """The r12 hash-oracled frozen-model variant vs a fully sequential
    reimplementation, on a corpus with a 200-char word that drives the
    double score deep toward underflow territory and repeated-substring
    tie bait ('abababab...') — bit-for-bit equality of every row."""
    from databricks_end_to_end_streaming_spark.operators.unigram_lm import (
        frozen_piece_stats,
    )

    corpus = CORPUS + [
        "ab" * 100 + " " + "banana bandana " * 3,
        "x" * 37 + " mississippi " + "ab" * 100,
    ]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = [
        (r["piece"], r["piece_len"], r["n_words"], r["corpus_count"])
        for r in frozen_piece_stats(word_vocab(docs))
        .orderBy("piece")
        .collect()
    ]
    assert got == _ref_frozen_stats(corpus)


def test_viterbi_ratio_reassembles_and_tie_breaks():
    from databricks_end_to_end_streaming_spark.operators.unigram_lm import (
        viterbi_segment_ratio,
    )

    model = {"a": 5, "b": 5, "ab": 100, "ba": 1}
    assert viterbi_segment_ratio("abab", model, sum(model.values())) == (
        "ab",
        "ab",
    )
    # all-equal counts: score ties at every split -> fewer pieces wins
    model = {"a": 2, "b": 2, "ab": 2, "abab": 2}
    assert viterbi_segment_ratio("abab", model, 8) == ("abab",)


def test_tokenizer_fertility_matches_sequential_reference(spark, workdir):
    """tokenizer_fertility_per_lang vs a sequential recomputation from
    the frozen-stats reference's Viterbi: exact int64 sums and the two
    single-division doubles, per language."""
    from databricks_end_to_end_streaming_spark.queries import all_queries

    rows = [
        (1, "banana bandana banana", "aa", "src", 1),
        (2, "mississippi is big", "aa", "src", 1),
        (3, "banana is " + "ab" * 40, "bb", "src", 1),
        (4, "qx vz qx", "bb", "src", 1),
    ]
    import os

    sf = os.path.join(str(workdir), "fert_sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, v long"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    corpus = [t for _, t, *_ in rows]
    # frozen model + double-Viterbi k per word, via the same sequential
    # machinery the stats test uses
    stats_by_piece = _ref_frozen_stats(corpus)  # builds model identically
    from databricks_end_to_end_streaming_spark.operators.unigram_lm import (
        SEP,
    )

    vocab = Counter(w for t in corpus for w in t.split())
    subs = Counter()
    for w, f in vocab.items():
        for i in range(len(w)):
            for ln in range(1, min(6, len(w) - i) + 1):
                subs[w[i : i + ln]] += f
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:256]
    model = dict(multi)
    model.update({p: c for p, c in subs.items() if len(p) == 1})
    total = sum(model.values())

    def k_of(word):
        best = [None] * (len(word) + 1)
        best[0] = ((-1.0, 0, ""), 1.0)
        for j in range(1, len(word) + 1):
            top = None
            for ln in range(1, min(6, j) + 1):
                p = word[j - ln : j]
                c = model.get(p)
                prev = best[j - ln]
                if c is None or prev is None:
                    continue
                (_, pk, pp), ps = prev
                s = ps * (c / total)
                joined = p if pp == "" else pp + SEP + p
                key = (-s, pk + 1, joined)
                if top is None or key < top[0]:
                    top = (key, s)
            best[j] = top
        return best[len(word)][0][1]

    want = {}
    for _, text, lang, *_ in rows:
        for w in text.split():
            nw, nc, np_ = want.get(lang, (0, 0, 0))
            want[lang] = (nw + 1, nc + len(w), np_ + k_of(w))
    got = {
        r.lang: r
        for r in all_queries()["tokenizer_fertility_per_lang"](
            spark, sf
        ).collect()
    }
    assert set(got) == set(want)
    for lang, (nw, nc, np_) in want.items():
        r = got[lang]
        assert (r.n_words, r.n_chars, r.n_pieces) == (nw, nc, np_)
        assert r.chars_per_piece == float(nc) / float(np_)
        assert r.pieces_per_word == float(np_) / float(nw)
    assert len(stats_by_piece) > 0  # reference machinery sanity
