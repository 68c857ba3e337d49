"""Distributed suffix array (operators/suffix.py): exact agreement with
a sequential Python suffix array + LCP on the same tokens, planted
cross-document repeated spans, and the registered per-doc stats."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401

from databricks_end_to_end_streaming_spark.operators.suffix import (
    SENTINEL_PREFIX,
    adjacent_lcp,
    corpus_positions,
    doc_token_arrays,
    position_repeat_lengths,
    suffix_rank_tables,
)
from databricks_end_to_end_streaming_spark.queries.dedup import (
    sa_repeated_span_stats,
)

DOCS_SCHEMA = "doc_id long, text string"


def _py_reference(texts: dict[int, str]) -> dict[tuple[int, int], int]:
    """(doc_id, off) -> longest repeated span starting there, by brute
    sequential suffix array: sort all suffixes (sentinel-terminated),
    max LCP with either sorted neighbor."""
    toks = {
        # mirror _norm: NUL is reserved for sentinels and stripped first
        d: t.replace(SENTINEL_PREFIX, "").lower().split()
        + [f"{SENTINEL_PREFIX}{d}"]
        for d, t in texts.items()
    }
    suffixes = [
        (tuple(toks[d][o:]), d, o) for d in toks for o in range(len(toks[d]))
    ]
    suffixes.sort()

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    out: dict[tuple[int, int], int] = {}
    for i, (suf, d, o) in enumerate(suffixes):
        best = 0
        if i > 0:
            best = max(best, lcp(suf, suffixes[i - 1][0]))
        if i + 1 < len(suffixes):
            best = max(best, lcp(suf, suffixes[i + 1][0]))
        if o < len(toks[d]) - 1:  # skip the sentinel position
            out[(d, o)] = best
    return out


TEXTS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "a quick brown fox jumps over a fence today",
    2: "completely different words here nothing shared at all",
    3: "the quick brown fox jumps over the lazy dog",  # exact dup of 0
}


def _spark_docs(spark, texts=TEXTS):
    return spark.createDataFrame(list(texts.items()), DOCS_SCHEMA)


def test_matches_python_reference_exactly(spark):
    got = {
        (r.doc_id, r.off): r.max_repeat
        for r in position_repeat_lengths(_spark_docs(spark)).collect()
    }
    want = _py_reference(TEXTS)
    assert got == want


def test_planted_cross_doc_span(spark):
    rep = {
        (r.doc_id, r.off): r.max_repeat
        for r in position_repeat_lengths(_spark_docs(spark)).collect()
    }
    # docs 0 and 3 are identical 9-token docs: position 0 repeats all 9
    assert rep[(0, 0)] == 9 and rep[(3, 0)] == 9
    # docs 0 and 1 share "quick brown fox jumps over" (5 tokens) at off 1
    assert rep[(1, 1)] == 5
    # doc 2 shares nothing: every position has repeat 0
    assert all(v == 0 for (d, _o), v in rep.items() if d == 2)


def test_rank_tables_totalize(spark):
    arrays = doc_token_arrays(_spark_docs(spark))
    tables, n = suffix_rank_tables(arrays)
    final = tables[max(tables)]
    ranks = [r.rank for r in final.collect()]
    assert sorted(ranks) == list(range(1, n + 1))  # a permutation: the SA
    # the exploded positions view matches the array view
    assert corpus_positions(_spark_docs(spark)).count() == n
    # adjacent LCP relation has exactly n-1 neighbor pairs
    assert adjacent_lcp(tables, arrays).count() == n - 1


def test_registered_stats_query(spark, workdir):
    _spark_docs(spark).withColumn("n_chars", F.length("text")).write.parquet(
        f"{workdir}/t/documents.parquet"
    )
    rows = {r.doc_id: r for r in sa_repeated_span_stats(spark, f"{workdir}/t").collect()}
    assert rows[0].max_repeat_len == 9 and rows[0].n_tokens == 9
    assert rows[0].n_pos_rep8 == 2  # offsets 0 (repeat 9) and 1 (repeat 8)
    assert rows[2].max_repeat_len == 0 and rows[2].repeat8_frac == 0.0


def test_random_corpora_match_reference(spark):
    """Property check over randomized corpora from a tiny alphabet (the
    adversarial case: massive repeat structure, rank ties everywhere).
    Seeded loop rather than hypothesis: each example costs Spark jobs,
    and a fixed seed keeps the suite deterministic."""
    import random

    rng = random.Random(1234)
    alphabet = ["a", "b", "c"]
    for trial in range(4):
        texts = {
            d: " ".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
            for d in range(rng.randint(2, 6))
        }
        got = {
            (r.doc_id, r.off): r.max_repeat
            for r in position_repeat_lengths(_spark_docs(spark, texts)).collect()
        }
        assert got == _py_reference(texts), f"trial {trial}: {texts}"


def test_nul_token_cannot_collide_with_sentinel(spark):
    """A literal "\\x000" token in document text would equal doc 0's
    sentinel; _norm strips NUL so it degrades to the ordinary token "0"
    and LCPs still stop at document boundaries (ADVICE r5)."""
    texts = {
        0: f"alpha beta {SENTINEL_PREFIX}0 gamma",
        1: "alpha beta 0 gamma",
    }
    got = {
        (r.doc_id, r.off): r.max_repeat
        for r in position_repeat_lengths(_spark_docs(spark, texts)).collect()
    }
    want = _py_reference(texts)
    assert got == want
    # the stripped token makes the docs identical: full 4-token repeat
    assert got[(0, 0)] == 4 and got[(1, 0)] == 4


def test_skew_path_matches_reference_on_pathological_corpus(spark):
    """ADVICE r8: a tied class above the threshold must route through
    the skew-safe re-rank (no class-sized single task) and produce the
    IDENTICAL suffix array. Corpus: one 12-token document duplicated 40x
    (every round's dominant class ~ corpus size) plus organic text; a
    threshold of 4 forces the skew branch, and the result must match
    both the sequential reference and the window-sort path."""
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    # 60-token body: suffixes stay tied past W_INIT, so the duplicated
    # mass survives the init ranking and the loop actually runs
    body = " ".join(words[i % len(words)] for i in range(60))
    texts = {d: body for d in range(40)}
    texts[100] = "organic words beta gamma appear once here"
    texts[101] = body.rsplit(" ", 20)[0] + " then diverges completely"
    timings: list = []
    got = {
        (r.doc_id, r.off): r.max_repeat
        for r in position_repeat_lengths(
            _spark_docs(spark, texts), skew_threshold=4, timings=timings
        ).collect()
    }
    assert any(t[0] == "skew" for t in timings), timings
    assert got == _py_reference(texts)
    # the default (window-sort) path agrees bit-for-bit
    window_path = {
        (r.doc_id, r.off): r.max_repeat
        for r in position_repeat_lengths(_spark_docs(spark, texts)).collect()
    }
    assert got == window_path


def _py_removal(texts: dict[int, str], min_len: int) -> dict[int, tuple]:
    """Sequential ExactSubstr cut: coverage from the brute suffix-array
    repeat profile (position p removed iff inside a repeated span of
    >= min_len tokens), tokens in the normalized space."""
    rep = _py_reference(texts)
    toks = {
        d: t.replace(SENTINEL_PREFIX, "").lower().split()
        for d, t in texts.items()
    }
    out = {}
    for d, ws in toks.items():
        covered = [False] * len(ws)
        for q in range(len(ws)):
            r = rep.get((d, q), 0)
            if r >= min_len:
                for p in range(q, min(q + r, len(ws))):
                    covered[p] = True
        kept = [w for w, c in zip(ws, covered) if not c]
        out[d] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


def test_exact_substr_removal_matches_sequential_reference(spark):
    """The end-to-end ExactSubstr CUT (verdict r8 ask #2): planted
    cross-doc spans are excised at their full variable lengths from ALL
    copies, non-repeated text survives, and the whole per-doc output
    matches the sequential reference exactly."""
    from databricks_end_to_end_streaming_spark.operators.suffix import (
        exact_substr_removal,
    )

    shared = "one two three four five six seven eight nine ten"  # 10 toks
    texts = {
        0: f"intro words here {shared} and a unique tail",
        1: f"{shared} opens this document then diverges completely",
        2: "totally original content with no repeats at all",
        3: f"prefix {shared} suffix",
        4: f"prefix {shared} suffix",  # exact dup of 3: whole doc repeats
    }
    for min_len in (8, 10, 11):
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
            for r in exact_substr_removal(
                _spark_docs(spark, texts), min_len=min_len
            ).collect()
        }
        assert got == _py_removal(texts, min_len), f"min_len={min_len}"
    # spot semantics at min_len=10: the shared 10-token span is cut from
    # docs 0 and 1; docs 3/4 are full duplicates so they empty out
    got10 = {
        r.doc_id: r
        for r in exact_substr_removal(
            _spark_docs(spark, texts), min_len=10
        ).collect()
    }
    assert got10[0].cleaned_text == "intro words here and a unique tail"
    assert got10[1].n_removed == 10
    assert got10[2].n_removed == 0
    assert got10[3].cleaned_text == "" and got10[4].cleaned_text == ""


def test_exact_substr_removal_randomized(spark):
    """Randomized small-alphabet corpora (max repeat structure) against
    the sequential cut, across thresholds."""
    import random

    rng = random.Random(77)
    for trial in range(3):
        texts = {
            d: " ".join(
                rng.choice(["a", "b", "c"]) for _ in range(rng.randint(1, 12))
            )
            for d in range(rng.randint(2, 5))
        }
        from databricks_end_to_end_streaming_spark.operators.suffix import (
            exact_substr_removal,
        )

        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
            for r in exact_substr_removal(
                _spark_docs(spark, texts), min_len=3
            ).collect()
        }
        assert got == _py_removal(texts, 3), f"trial {trial}: {texts}"


def test_lee2022_pipeline_stage_accounting(spark, workdir):
    """dedup_pipeline_lee2022: NearDup drops the exact-duplicate copy
    (cluster -> canonical), then ExactSubstr cuts the cross-doc span
    from BOTH surviving carriers; the per-stage accounting matches the
    hand-computed values and the sequential removal reference."""
    import pyspark.sql.functions as F  # noqa: F811

    from databricks_end_to_end_streaming_spark.queries.dedup import (
        dedup_pipeline_lee2022,
    )

    span = "one two three four five six seven eight nine ten"  # 10 toks
    texts = {
        # 3 exact copies: NearDup keeps ONE (most tokens, then min id)
        0: "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu",
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu",
        2: "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu",
        # two distinct docs sharing a 10-token span: both get cut
        3: f"intro {span} tail three words here",
        4: f"{span} completely different ending for this one",
        5: "nothing shared with anything else at all whatsoever",
    }
    spark.createDataFrame(list(texts.items()), DOCS_SCHEMA).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(f"{workdir}/lee/documents.parquet")
    rows = {
        r["stage"]: r
        for r in dedup_pipeline_lee2022(spark, f"{workdir}/lee").collect()
    }
    n_raw = sum(len(t.split()) for t in texts.values())
    assert rows["0_raw"]["n_docs"] == 6
    assert rows["0_raw"]["n_tokens"] == n_raw
    # NearDup: docs 1 and 2 drop (doc 0 canonical by min id among ties)
    surv = {0, 3, 4, 5}
    assert rows["1_neardup"]["n_docs"] == 4
    assert rows["1_neardup"]["n_tokens"] == sum(
        len(texts[d].split()) for d in surv
    )
    # ExactSubstr on the survivors: the sequential reference agrees
    ref = _py_removal({d: texts[d] for d in surv}, 8)
    want_tokens = sum(nt - nr for nt, nr, _ in ref.values())
    assert rows["2_exact_substr"]["n_docs"] == 4
    assert rows["2_exact_substr"]["n_tokens"] == want_tokens
    # and the cut really removed the planted span from both carriers
    assert ref[3][1] >= 10 and ref[4][1] >= 10
    assert want_tokens < rows["1_neardup"]["n_tokens"]


def _py_cross_set(train: dict[int, str], bench: dict[int, str], flag: int):
    """Brute-force cross-set reference: for every train position, max
    LCP against EVERY benchmark suffix by direct comparison — no
    suffix-array neighbor property, so it independently checks the
    operator's range-min derivation."""
    def toks(t, d):
        return t.replace(SENTINEL_PREFIX, "").lower().split() + [
            f"{SENTINEL_PREFIX}{d}"
        ]

    btoks = {d: toks(t, d + flag) for d, t in bench.items()}
    bsufs = [
        tuple(ts[o:]) for ts in btoks.values() for o in range(len(ts))
    ]

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    out = {}
    for d, t in train.items():
        ts = toks(t, d)
        for o in range(len(ts) - 1):  # skip the sentinel position
            suf = tuple(ts[o:])
            out[(d, o)] = max((lcp(suf, bs) for bs in bsufs), default=0)
    return out


def test_cross_set_max_spans_matches_bruteforce(spark):
    """Variable-length substring decontamination: the distributed
    nearest-benchmark range-min equals brute-force max LCP against
    every benchmark suffix — planted contamination found at its exact
    length, clean docs at 0."""
    from databricks_end_to_end_streaming_spark.operators.suffix import (
        BENCH_ID_FLAG,
        cross_set_max_spans,
    )

    leak = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    train = {
        0: f"intro {leak} tail words",          # contains the eval span
        1: "totally clean document nothing shared here",
        2: f"{leak} starts this one then diverges",
        3: "alpha beta gamma only a short prefix overlap",  # 3 tokens
    }
    bench = {
        0: f"question: {leak} answer: something",
        1: "unrelated benchmark prompt with its own words",
    }
    t_df = _spark_docs(spark, train)
    b_df = _spark_docs(spark, bench)
    got = {
        (r.doc_id, r.off): r.cross_repeat
        for r in cross_set_max_spans(t_df, b_df).collect()
    }
    want = _py_cross_set(train, bench, BENCH_ID_FLAG)
    assert got == want
    # the planted leak reads exactly 8 at its start positions
    assert got[(0, 1)] == 8 and got[(2, 0)] == 8
    assert max(v for (d, _), v in got.items() if d == 1) <= 1
    assert got[(3, 0)] == 3  # partial overlap reported at true length


def test_cross_set_randomized_against_bruteforce(spark):
    import random

    from databricks_end_to_end_streaming_spark.operators.suffix import (
        BENCH_ID_FLAG,
        cross_set_max_spans,
    )

    rng = random.Random(9)
    for trial in range(3):
        train = {
            d: " ".join(
                rng.choice(["a", "b", "c"]) for _ in range(rng.randint(1, 10))
            )
            for d in range(rng.randint(1, 4))
        }
        bench = {
            d: " ".join(
                rng.choice(["a", "b", "c"]) for _ in range(rng.randint(1, 8))
            )
            for d in range(rng.randint(1, 3))
        }
        got = {
            (r.doc_id, r.off): r.cross_repeat
            for r in cross_set_max_spans(
                _spark_docs(spark, train), _spark_docs(spark, bench)
            ).collect()
        }
        assert got == _py_cross_set(train, bench, BENCH_ID_FLAG), (
            trial,
            train,
            bench,
        )


def test_degenerate_corpora(spark):
    # single doc, single token: 2 positions (token + sentinel)
    one = {0: "hello"}
    assert {
        (r.doc_id, r.off): r.max_repeat
        for r in position_repeat_lengths(_spark_docs(spark, one)).collect()
    } == {(0, 0): 0}
    # empty corpus: no positions, no crash, no infinite doubling loop
    empty = spark.createDataFrame([], DOCS_SCHEMA)
    assert position_repeat_lengths(empty).count() == 0


def test_union_span_profile_shared_semantics(spark):
    """The shared profile (r10): max_repeat from the UNION suffix array
    equals position_repeat_lengths over the plain corpus (benchmark id
    re-namespacing cannot change any LCP), cross_repeat equals the
    decontamination projection, and the profile-driven cut equals
    exact_substr_removal bit-for-bit."""
    from databricks_end_to_end_streaming_spark.operators.suffix import (
        apply_cut_spans,
        doc_token_arrays,
        exact_substr_removal,
        position_repeat_lengths,
        union_span_profile,
    )
    import pyspark.sql.functions as F

    span = "one two three four five six seven eight nine"
    docs = {
        0: f"prefix {span} suffix words here",
        1: f"{span} repeated opener",
        2: "clean document with no shared spans at all",
        3: f"bench doc carrying {span} inside",
        4: "short",
        5: "",
    }
    d = _spark_docs(spark, docs)
    train = d.where(F.col("doc_id") % 3 != 0)
    bench = d.where(F.col("doc_id") % 3 == 0)
    prof = union_span_profile(train, bench)
    prof.persist()
    try:
        # 1. max_repeat over ALL rows == the plain-corpus repeat profile
        got_rep = {
            (r.doc_id, r.off): r.max_repeat for r in prof.collect()
        }
        want_rep = {
            (r.doc_id, r.off): r.max_repeat
            for r in position_repeat_lengths(d).collect()
        }
        assert got_rep == want_rep
        # 2. the profile-driven cut == exact_substr_removal, all columns
        spans = prof.where(F.col("max_repeat") >= 8).select(
            "doc_id",
            "off",
            (F.col("off") + F.col("max_repeat")).alias("span_end"),
        )
        got_cut = sorted(
            map(tuple, apply_cut_spans(
                doc_token_arrays(d), spans
            ).collect())
        )
        want_cut = sorted(map(tuple, exact_substr_removal(d).collect()))
        assert got_cut == want_cut
        # the 9-token span was actually cut from all three carriers
        removed = {r[0]: r[2] for r in got_cut}
        assert removed[0] == 9 and removed[1] == 9 and removed[3] == 9
        # 3. bench rows carry NULL cross_repeat, train rows non-null
        assert prof.where(
            F.col("is_bench") & F.col("cross_repeat").isNotNull()
        ).count() == 0
        assert prof.where(
            ~F.col("is_bench") & F.col("cross_repeat").isNull()
        ).count() == 0
    finally:
        prof.unpersist()


def test_gram_cut_equals_suffix_cut(spark):
    """The r10 gram-based batch cut: exact_substr_removal_grams ==
    exact_substr_removal on planted AND randomized corpora (the
    duplicated-L-window factorization, all columns incl. cleaned
    text)."""
    import random

    from databricks_end_to_end_streaming_spark.operators.suffix import (
        exact_substr_removal,
        exact_substr_removal_grams,
    )

    span = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    docs = {
        0: f"x {span} y",
        1: f"{span} z",
        2: "nothing shared in this one at all",
        3: f"w1 w2 w3 w4 w5 w6 w7 w8 middle w1 w2 w3 w4 w5 w6 w7 w8",
        4: "short",
        5: "",
    }
    rng = random.Random(1234)
    vocab = [f"t{i}" for i in range(30)]
    base = [rng.choice(vocab) for _ in range(60)]
    for i in range(6, 16):  # random docs sharing random slices
        s = rng.randrange(0, 40)
        docs[i] = " ".join(
            base[s : s + rng.randrange(4, 20)]
            + [rng.choice(vocab) for _ in range(rng.randrange(0, 10))]
        )
    d = _spark_docs(spark, docs)
    got = sorted(map(tuple, exact_substr_removal_grams(d).collect()))
    want = sorted(map(tuple, exact_substr_removal(d).collect()))
    assert got == want
    removed = {r[0]: r[2] for r in got}
    assert removed[0] == 10 and removed[1] == 10  # cross-doc span cut
    assert removed[3] == 16  # within-doc repeat cut (both copies)


def test_cut_oracle_nul_parity(spark):
    """The r10 review's latent-parity case, exercised: a text containing
    chr(0) must tokenize identically in the Spark suffix path and the
    DuckDB _CUT_ORACLE (both strip NUL before whitespace collapse) — a
    planted NUL doc shares a span with a clean doc and both engines
    must agree on counts AND the cleaned-text md5."""
    import duckdb
    import pandas as pd
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.operators.suffix import (
        exact_substr_removal,
    )
    from databricks_end_to_end_streaming_spark.queries.dedup import (
        _CUT_ORACLE,
    )

    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    texts = {
        0: f"foo\x00bar {span} tail",  # NUL inside a token
        1: f"{span} other words",
        2: "foobar unique text here",  # equals doc 0's fused token
        3: "totally clean unrelated document",
        # vertical tab: Java \s includes \x0B, RE2's does not — the
        # oracle converts VT to a space so both engines see two tokens
        4: f"alpha\x0bbeta {span} zz",
    }
    d = _spark_docs(spark, texts)
    want = sorted(
        map(
            tuple,
            exact_substr_removal(d)
            .select(
                "doc_id",
                "n_tokens",
                "n_removed",
                F.md5(F.col("cleaned_text").cast("binary")).alias("m"),
            )
            .collect(),
        )
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}
        ),
    )
    got = sorted(map(tuple, con.execute(_CUT_ORACLE).fetchall()))
    assert got == want
    # the NUL doc really went through the fused-token path: 'foo\x00bar'
    # tokenizes as ONE token 'foobar', so doc 0 has 10 tokens, not 11;
    # the VT doc went through the split path: 'alpha\x0bbeta' is TWO
    # tokens, so doc 4 has 11
    by_id = {r[0]: r for r in got}
    assert by_id[0][1] == 10 and by_id[0][2] == 8
    assert by_id[4][1] == 11 and by_id[4][2] == 8
