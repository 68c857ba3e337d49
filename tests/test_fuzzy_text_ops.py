"""Round-5 operators: fuzzy entity-resolution join, BM25 retrieval,
boilerplate-prefix detection, calibrated quality gate, leakage-safe
group split — planted-case tests against tiny synthetic tables written
in the driver-testdata layout (``{dir}/{table}.parquet``)."""

from __future__ import annotations

import pytest

from databricks_end_to_end_streaming_spark.queries.fuzzy import (
    FUZZY_MAX_DIST,
    fuzzy_part_name_matches,
)
from databricks_end_to_end_streaming_spark.queries.text import (
    BM25_TERMS,
    BM25_TOP_K,
    bm25_keyword_search,
    boilerplate_prefix_detection,
    calibrated_quality_gate,
    leakage_safe_group_split,
)


@pytest.fixture()
def tiny_dir(spark, workdir):
    """documents + part parquet in the testdata layout, with planted
    structure: one typo'd part-name pair, one term-stuffed document,
    one boilerplate-heavy source."""
    parts = [
        # 3 rows "small ring", 2 rows "small king" (typo, dist 1)
        *[(i, "small ring") for i in range(3)],
        *[(10 + i, "small king") for i in range(2)],
        # unrelated name sharing no token with the pair
        (20, "blue gear"),
        (21, "blue bolt"),  # dist("blue gear","blue bolt") = 3 > threshold
    ]
    spark.createDataFrame(parts, "p_partkey long, p_name string").write.parquet(
        f"{workdir}/t/part.parquet"
    )
    docs = [
        # doc 0: stuffed with every BM25 query term -> must rank first
        (0, " ".join(BM25_TERMS * 10), "en", "srcA"),
        # docs 1-4: srcA boilerplate "terms of use" prefix
        *[
            (i, f"terms of use filler body {i}", "en", "srcA")
            for i in range(1, 5)
        ],
        # srcB: no repeated prefix, no query terms, varying 'the' density
        (10, "x y z", "en", "srcB"),
        (11, "the the the the", "en", "srcB"),
        (12, "a b c d e f g h the", "en", "srcB"),
        (13, "p q r s", "de", "srcB"),
    ]
    rows = [(d, t, lang, s, len(t)) for d, t, lang, s in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{workdir}/t/documents.parquet")
    return f"{workdir}/t"


def test_fuzzy_finds_planted_typo(spark, tiny_dir):
    out = fuzzy_part_name_matches(spark, tiny_dir).collect()
    assert [(r.name_a, r.name_b, r.edit_dist) for r in out] == [
        ("small king", "small ring", 1)
    ]
    (r,) = out
    # weights carried from the aggregation: 2 king rows, 3 ring rows
    assert (r.n_parts_a, r.n_parts_b) == (2, 3)
    assert r.edit_dist <= FUZZY_MAX_DIST


def test_bm25_ranks_stuffed_doc_first(spark, tiny_dir):
    out = bm25_keyword_search(spark, tiny_dir).collect()
    assert out[0].doc_id == 0
    assert out[0].bm25 > 0
    assert len(out) <= BM25_TOP_K
    # scores are non-increasing in rank order
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)


def test_boilerplate_share(spark, tiny_dir):
    rows = {r.source: r for r in boilerplate_prefix_detection(spark, tiny_dir).collect()}
    a = rows["srcA"]
    assert a.top_prefix == "terms of use"
    assert a.n_docs_with_prefix == 4 and a.n_docs == 5
    assert abs(a.prefix_share - 0.8) < 1e-12
    # srcB has no repeated prefix: share is 1/4
    assert rows["srcB"].n_docs_with_prefix == 1


def test_calibrated_gate_keeps_top_rate(spark, tiny_dir):
    rows = {r.lang: r for r in calibrated_quality_gate(spark, tiny_dir).collect()}
    en = rows["en"]
    # 8 en docs -> keep floor-by-rank rn*10 <= n*7 -> 5 docs
    assert en.n_docs == 8 and en.n_kept == 5
    # threshold is the min kept score, and it actually separates:
    # doc 11 (all 'the') must be kept, so threshold <= 1.0
    assert 0 <= en.calibrated_threshold <= 1.0
    de = rows["de"]
    assert de.n_docs == 1 and de.n_kept == 0  # rn*10=10 > n*7=7


def test_group_split_is_leakage_safe(spark, tiny_dir):
    out = leakage_safe_group_split(spark, tiny_dir).collect()
    assert sum(r.n_docs for r in out) == 9
    # every source lands wholly in one split -> distinct sources sum to 2
    assert sum(r.n_sources for r in out) == 2


def test_fuzzy_random_names_match_exact_all_pairs(spark, workdir):
    """Seeded randomized check: blocked join == exact all-pairs python
    levenshtein on random two-token names (token blocking is lossless
    whenever a qualifying pair shares a token — asserted per corpus the
    same way the oracle asserts it per round)."""
    import itertools
    import random

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = random.Random(77)
    adjs = ["red", "ted", "blue", "blu", "big", "bag", "small", "smell"]
    nouns = ["bolt", "boat", "gear", "bear", "ring", "king", "plate", "slate"]
    for trial in range(3):
        names = {
            f"{rng.choice(adjs)} {rng.choice(nouns)}" for _ in range(12)
        }
        # every qualifying pair must share a token, else blocking would
        # miss it — regenerate corpora where that precondition holds
        exact = {
            (min(a, b), max(a, b), lev(a, b))
            for a, b in itertools.combinations(sorted(names), 2)
            if lev(a, b) <= FUZZY_MAX_DIST
        }
        if any(
            not set(a.split()) & set(b.split()) for a, b, _d in exact
        ):
            continue
        rows = [(i, n) for i, n in enumerate(sorted(names))]
        d = f"{workdir}/fz{trial}"
        spark.createDataFrame(rows, "p_partkey long, p_name string").write.parquet(
            f"{d}/part.parquet"
        )
        got = {
            (r.name_a, r.name_b, r.edit_dist)
            for r in fuzzy_part_name_matches(spark, d).collect()
        }
        assert got == exact, f"trial {trial}"


def test_er_golden_records_transitive_chain(spark, workdir):
    """A~B and B~C merge into ONE entity even though dist(A,C) exceeds
    the threshold (transitive closure), the canonical is the
    heaviest-by-rows name, and non-matching names stay singletons."""
    from databricks_end_to_end_streaming_spark.queries.fuzzy import (
        er_golden_records,
    )

    parts = [
        # chain: ring ~ rink (dist 1) ~ rinkzz (dist 2); ring->rinkzz = 3 > threshold
        *[(i, "small ring") for i in range(5)],   # heaviest -> canonical
        *[(10 + i, "small rink") for i in range(2)],
        *[(20 + i, "small rinkzz") for i in range(2)],  # dist(rink,rinkzz)=2; dist(ring,rinkzz)=3
        (30, "blue gear"),  # singleton
    ]
    spark.createDataFrame(parts, "p_partkey long, p_name string").write.parquet(
        f"{workdir}/er/part.parquet"
    )
    out = {r.cluster_id: r for r in er_golden_records(spark, f"{workdir}/er").collect()}
    # sanity: the chain endpoint really is beyond the pairwise threshold
    import pyspark.sql.functions as F

    dist = spark.range(1).select(
        F.levenshtein(F.lit("small ring"), F.lit("small rinkzz")).alias("d")
    ).first().d
    assert dist > 2
    chain = out["small ring"]
    assert chain.n_names == 3 and chain.n_parts_total == 9
    assert chain.canonical_name == "small ring"
    single = out["blue gear"]
    assert single.n_names == 1 and single.canonical_name == "blue gear"
