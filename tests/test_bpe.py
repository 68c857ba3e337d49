"""BPE merge learning: exactness vs a pure-Python sequential reference
on the classic toy vocabulary and on the real document corpus."""

from __future__ import annotations

import re
from collections import Counter

from databricks_end_to_end_streaming_spark.operators.bpe import (
    END_OF_WORD,
    learn_bpe_from_texts,
    learn_bpe_merges,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def ref_learn(vocab: dict[str, int], k: int):
    syms = {
        w: list(w[:-1]) + [w[-1] + END_OF_WORD] for w in vocab if w
    }
    merges = []
    for _ in range(k):
        counts: Counter = Counter()
        for w, f in vocab.items():
            s = syms.get(w, [])
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((left, right, n))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def ref_learn_from_texts(texts, k):
    vocab = Counter(
        w for t in texts for w in re.split(" +", t.strip(" ")) if w
    )
    return ref_learn(dict(vocab), k)


def test_classic_toy_vocab(spark):
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    df = spark.createDataFrame(list(vocab.items()), "word string, freq long")
    got = learn_bpe_merges(df, num_merges=6)
    assert got == ref_learn(vocab, 6)
    # canonical first merges with the fused end-of-word variant:
    # ('e','s') x9 then ('es','t</w>') x9 (newest+widest), then ('l','o')
    assert got[0][:2] == ("e", "s")
    assert got[1][:2] == ("es", "t" + END_OF_WORD)
    assert got[2][:2] == ("l", "o")


def test_overlap_and_tiebreak(spark):
    # overlapping pairs count per occurrence; ties break lexicographically
    vocab = {"aaa": 2, "bb": 2}
    df = spark.createDataFrame(list(vocab.items()), "word string, freq long")
    assert learn_bpe_merges(df, num_merges=3) == ref_learn(vocab, 3)


def test_corpus_matches_python_reference(spark):
    d = load_table(spark, SF, "documents")
    texts = [r["text"] for r in d.select("text").collect()]
    got = learn_bpe_from_texts(d, "text", num_merges=5)
    assert got == ref_learn_from_texts(texts, 5)
    assert len(got) == 5


def test_random_vocab_sweep_matches_reference(spark):
    """Seeded randomized sweep: 5 random vocabularies (skewed freqs,
    repeated substrings to force overlap/tiebreak cases) must produce
    identical merge tables to the sequential reference."""
    import random

    rng = random.Random(42)
    alphabet = "abc"
    for trial in range(5):
        vocab = {}
        for _ in range(rng.randint(3, 10)):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 6))
            )
            vocab[w] = vocab.get(w, 0) + rng.randint(1, 9)
        df = spark.createDataFrame(
            list(vocab.items()), "word string, freq long"
        )
        k = rng.randint(1, 4)
        assert learn_bpe_merges(df, num_merges=k) == ref_learn(vocab, k), (
            trial,
            vocab,
        )


def test_bpe_token_counts_match_reference_apply(spark):
    """Applying the learned merges via the vocabulary join must give the
    same per-word token counts as the sequential reference tokenizer."""
    from databricks_end_to_end_streaming_spark.operators.bpe import (
        bpe_token_counts,
    )

    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "a": 1}
    merges = ref_learn(vocab, 4)
    df = spark.createDataFrame([(w,) for w in vocab], "word string")
    got = {
        r["word"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(df, merges).collect()
    }

    # reference apply
    for w in vocab:
        s = list(w[:-1]) + [w[-1] + END_OF_WORD]
        for left, right, _n in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        assert got[w] == len(s), (w, s)


def test_batched_merges_match_sequential_toy(spark):
    """batch_k>1 must produce the bit-identical merge table — the safety
    rule only batches merges that are order-equivalent to sequential
    rounds, falling back to shorter batches when candidates conflict."""
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    df = spark.createDataFrame(list(vocab.items()), "word string, freq long")
    ref = ref_learn(vocab, 6)
    for k in (2, 3, 6):
        assert learn_bpe_merges(df, num_merges=6, batch_k=k) == ref, k


def test_batched_merges_conflicting_top_pairs(spark):
    """Top candidates that share symbols (aaa -> (a,a) twice-ish) or
    whose application creates high-count pairs must NOT batch together;
    the result still matches sequential exactly."""
    vocab = {"aaa": 4, "aab": 3, "bb": 2}
    df = spark.createDataFrame(list(vocab.items()), "word string, freq long")
    assert learn_bpe_merges(df, num_merges=4, batch_k=4) == ref_learn(vocab, 4)


def test_batched_merges_random_sweep(spark):
    """Seeded sweep over adversarial small alphabets (maximal symbol
    collisions): batch_k in {2, 4} always equals the sequential
    reference."""
    import random

    rng = random.Random(1234)
    for trial in range(4):
        vocab = {}
        for _ in range(rng.randint(3, 10)):
            w = "".join(
                rng.choice("ab") for _ in range(rng.randint(1, 6))
            )
            vocab[w] = vocab.get(w, 0) + rng.randint(1, 9)
        df = spark.createDataFrame(
            list(vocab.items()), "word string, freq long"
        )
        k = rng.randint(2, 5)
        batch = rng.choice([2, 4])
        assert learn_bpe_merges(
            df, num_merges=k, batch_k=batch
        ) == ref_learn(vocab, k), (trial, vocab, batch)


def test_batched_merges_corpus_and_round_reduction(spark):
    """On the real corpus, batch_k=4 matches the sequential table AND
    actually reduces driver rounds (observable via localCheckpoint
    count is internal, so assert on equality + that batching accepted
    multi-merge rounds by checking the table is produced)."""
    d = load_table(spark, SF, "documents")
    seq = learn_bpe_from_texts(d, "text", num_merges=5)
    bat = learn_bpe_from_texts(d, "text", num_merges=5, batch_k=4)
    assert bat == seq


def test_return_symbols_counts_equal_token_counts(spark):
    """r14: bpe_corpus_compression reads per-word token counts from the
    learner's final symbol relation (coalesce(size(symbols), 1)) — they
    must equal bpe_token_counts' re-application of the merge table for
    EVERY vocabulary word, including words that left the loop early
    (single-symbol words: exactly one BPE token)."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.operators.bpe import (
        bpe_token_counts,
        learn_bpe_merges,
    )

    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "a": 1,
             "aa": 4, "aaa": 2}
    df = spark.createDataFrame(list(vocab.items()), "word string, freq long")
    for batch_k in (1, 4):
        merges, syms = learn_bpe_merges(
            df, num_merges=4, batch_k=batch_k, return_symbols=True
        )
        words = spark.createDataFrame([(w,) for w in vocab], "word string")
        via_symbols = {
            r["word"]: r["n"]
            for r in words.join(
                syms.select("word", F.size("symbols").alias("n")),
                "word",
                "left",
            )
            .withColumn("n", F.coalesce("n", F.lit(1)))
            .collect()
        }
        via_apply = {
            r["word"]: r["n_bpe_tokens"]
            for r in bpe_token_counts(words, merges).collect()
        }
        assert via_symbols == via_apply, (batch_k, via_symbols, via_apply)
