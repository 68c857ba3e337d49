"""Duplicated-n-gram-span removal (operators/spans.py) vs a pure-Python
reference on planted-boilerplate corpora."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.spans import (
    ngram_spans,
    remove_duplicate_ngram_spans,
)


def _py_remove(
    texts: dict[int, str], k: int, min_df: int, min_df_pct: int = 1
) -> dict[int, tuple]:
    """Sequential reference: same semantics, no Spark. Mirrors the
    engine convention (shared by Spark and DuckDB) that splitting an
    empty/whitespace-only text yields one empty token."""
    toks = {
        i: (t.split() if t.strip() else [""]) for i, t in texts.items()
    }
    df: dict[tuple, set] = {}
    for i, ws in toks.items():
        for p in range(len(ws) - k + 1):
            df.setdefault(tuple(ws[p : p + k]), set()).add(i)
    threshold = max(min_df, -(-len(texts) * min_df_pct // 100))
    hot = {g for g, docs in df.items() if len(docs) >= threshold}
    out = {}
    for i, ws in toks.items():
        covered = set()
        for p in range(len(ws) - k + 1):
            if tuple(ws[p : p + k]) in hot:
                covered.update(range(p, p + k))
        kept = [w for j, w in enumerate(ws) if j not in covered]
        out[i] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


BOILER = "all rights reserved worldwide"


def _corpus() -> dict[int, str]:
    docs = {
        0: f"alpha beta gamma {BOILER} delta",
        1: f"{BOILER} epsilon zeta",
        2: f"eta theta {BOILER}",
        3: f"iota kappa {BOILER} lam mu",
        4: f"nu xi omicron {BOILER}",
        5: "pi rho sigma tau upsilon phi",  # untouched
        6: "chi psi",  # shorter than k
    }
    return docs


def test_matches_python_reference(spark):
    docs = _corpus()
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_duplicate_ngram_spans(
            sdf, "text", "doc_id", k=3, min_df=5
        ).collect()
    }
    assert got == _py_remove(docs, k=3, min_df=5)
    # the planted boilerplate really was scrubbed, the rest kept
    assert BOILER not in got[0][2]
    assert got[0][2].startswith("alpha beta gamma")
    assert got[5] == (6, 0, docs[5])
    assert got[6] == (2, 0, docs[6])  # sub-k doc passes through intact


def test_entire_doc_removed_yields_empty_string(spark):
    docs = {i: BOILER for i in range(5)}
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    rows = remove_duplicate_ngram_spans(
        sdf, "text", "doc_id", k=3, min_df=5
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert (r["n_tokens"], r["n_removed"], r["cleaned_text"]) == (4, 4, "")


def test_min_df_threshold_boundary(spark):
    # 4 docs share the span; min_df=5 keeps it, min_df=4 scrubs it
    docs = {i: f"x{i} {BOILER}" for i in range(4)}
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    keep = remove_duplicate_ngram_spans(sdf, "text", "doc_id", 3, min_df=5)
    assert all(r["n_removed"] == 0 for r in keep.collect())
    scrub = remove_duplicate_ngram_spans(sdf, "text", "doc_id", 3, min_df=4)
    assert all(r["cleaned_text"] == f"x{r['doc_id']}" for r in scrub.collect())


def test_ngram_spans_positions(spark):
    sdf = spark.createDataFrame([(1, "a b c d"), (2, "a b")], ["doc_id", "text"])
    rows = ngram_spans(sdf, "text", "doc_id", 3).collect()
    got = {(r["doc_id"], r["pos"]): r["gram"] for r in rows}
    # doc 2 is shorter than k -> no rows (sequence() guard, not a DESCENDING range)
    assert got == {(1, 1): "a b c", (1, 2): "b c d"}


def test_overlapping_spans_union_coverage(spark):
    # two hot trigrams overlapping by 2 tokens -> union of covered
    # positions, not double-removal
    common = "p q r s"  # trigrams: "p q r" and "q r s"
    docs = {i: f"w{i} {common} z{i}" for i in range(5)}
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_duplicate_ngram_spans(
            sdf, "text", "doc_id", k=3, min_df=5
        ).collect()
    }
    assert got == _py_remove(docs, k=3, min_df=5)
    for i in range(5):
        assert got[i] == (6, 4, f"w{i} z{i}")


def test_multispace_and_padding_normalization(spark):
    # split on ' +' after trim: extra whitespace must not shift positions
    docs = {
        0: "  a   b c   ",
        1: "a b c",
        2: "a b c",
        3: "a b c",
        4: "a b c",
    }
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    rows = remove_duplicate_ngram_spans(
        sdf, "text", "doc_id", k=3, min_df=5
    ).collect()
    assert all(r["cleaned_text"] == "" and r["n_removed"] == 3 for r in rows)


def test_seeded_randomized_sweep(spark):
    """Random corpora with planted repeated spans: Spark result equals
    the sequential reference on every one (seeded, deterministic)."""
    import random

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(12)]
    for trial in range(4):
        boiler = " ".join(rng.choices(vocab, k=rng.randint(3, 5)))
        docs = {}
        for i in range(14):
            words = rng.choices(vocab, k=rng.randint(0, 9))
            if rng.random() < 0.6:
                words.insert(rng.randrange(len(words) + 1), boiler)
            docs[i] = " ".join(" ".join(words).split())
        k = rng.choice([2, 3])
        min_df = rng.choice([3, 4])
        sdf = spark.createDataFrame(
            [(i, t) for i, t in docs.items()], ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
            for r in remove_duplicate_ngram_spans(
                sdf, "text", "doc_id", k=k, min_df=min_df
            ).collect()
        }
        assert got == _py_remove(docs, k=k, min_df=min_df), (trial, k, min_df)
