"""Jaro-Winkler expression (operators/jaro.py): exact equality with a
sequential textbook reference on random and adversarial pairs, the
classic literature values, and the blocked pair query's threshold
semantics."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.jaro import (
    jaro_winkler_col,
)


def ref_jaro(s, t):
    ls, lt = len(s), len(t)
    if ls == 0 or lt == 0:
        return 0.0
    w = max(max(ls, lt) // 2 - 1, 0)
    mt = [False] * lt
    ms_ = []
    for i, c in enumerate(s):
        for j in range(max(0, i - w), min(lt, i + w + 1)):
            if not mt[j] and t[j] == c:
                mt[j] = True
                ms_.append((i, j, c))
                break
    m = len(ms_)
    if m == 0:
        return 0.0
    s_m = [c for _, _, c in ms_]
    t_m = [t[j] for j in sorted(j for _, j, _ in ms_)]
    t2 = sum(1 for a, b in zip(s_m, t_m) if a != b)
    return (m / ls + m / lt + (2 * m - t2) / (2 * m)) / 3


def ref_jw(s, t):
    j = ref_jaro(s, t)
    if j <= 0.7 or j == 0.0:
        return j
    l = 0
    for a, b in zip(s[:4], t[:4]):
        if a != b:
            break
        l += 1
    return j + l * 0.1 * (1 - j)


def test_jw_matches_sequential_reference_exactly(spark):
    rng = random.Random(2)
    words = [
        "lavender", "lavendar", "chocolate", "chocolat", "steel", "stele",
        "tomato", "tomatoe", "misty", "", "a", "ab", "aaaaaa", "aaab",
        "martha", "marhta", "dwayne", "duane", "dixon", "dicksonx",
    ]
    pairs = [(rng.choice(words), rng.choice(words)) for _ in range(150)]
    pairs += [
        ("martha", "marhta"),   # literature: 0.9611...
        ("dwayne", "duane"),    # literature: 0.84
        ("dixon", "dicksonx"),  # literature: 0.8133...
        ("", ""), ("a", ""), ("abcd", "dcba"),
        ("abcdef", "axxxxx"),  # jaro 0.444 < 0.7: boost must NOT fire
    ]
    df = spark.createDataFrame(pairs, "s string, t string")
    got = df.select(
        "s", "t", jaro_winkler_col(F.col("s"), F.col("t")).alias("jw")
    ).collect()
    for r in got:
        assert r.jw == ref_jw(r.s, r.t), (r.s, r.t, r.jw)
    vals = {(r.s, r.t): r.jw for r in got}
    assert abs(vals[("martha", "marhta")] - 0.9611111111111111) < 1e-15
    assert abs(vals[("dixon", "dicksonx")] - 0.8133333333333332) < 1e-15
    # above the 0.7 threshold the l=1 prefix boost fires...
    assert vals[("dwayne", "duane")] == ref_jaro("dwayne", "duane") + 0.1 * (
        1 - ref_jaro("dwayne", "duane")
    )
    # ...below it the shared prefix earns nothing
    assert vals[("abcdef", "axxxxx")] == ref_jaro("abcdef", "axxxxx")
    assert vals[("abcdef", "axxxxx")] <= 0.7


def test_jw_long_strings_score_null(spark):
    from databricks_end_to_end_streaming_spark.operators.jaro import (
        JW_MAX_LEN,
    )

    df = spark.createDataFrame(
        [("a" * (JW_MAX_LEN + 1), "a" * 5), ("ab", "ab")], "s string, t string"
    )
    got = df.select(
        jaro_winkler_col(F.col("s"), F.col("t")).alias("jw")
    ).collect()
    assert got[0].jw is None and got[1].jw == 1.0


def test_length_ratio_prefilter_is_recall_free():
    """Property check of the theorem the r11 candidate filter relies on
    (jw >= JW_THRESHOLD => 4*min(ls,lt) >= max(ls,lt)): random word
    pairs through the sequential reference — any qualifying pair the
    filter would drop is a counterexample to the derivation OR a drift
    between JW_THRESHOLD and the hard-coded bound (also guarded by the
    import-time assert in queries/fuzzy.py)."""
    from databricks_end_to_end_streaming_spark.queries.fuzzy import (
        JW_THRESHOLD,
    )

    rng = random.Random(31)
    alphabet = "abcde"
    checked = qualified = 0
    for _ in range(20000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        t = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        checked += 1
        if ref_jw(s, t) >= JW_THRESHOLD:
            qualified += 1
            assert 4 * min(len(s), len(t)) >= max(len(s), len(t)), (s, t)
    assert qualified > 50  # the property was actually exercised


def test_token_block_recall_proven_by_exhaustive_scan():
    """On the full 64-name testdata dictionary, EVERY qualifying pair
    shares a whole token — the on-corpus recall claim the exact
    all-pairs oracle re-proves each round, pinned here so a corpus
    regeneration that breaks it fails fast in pytest too."""
    import duckdb

    from databricks_end_to_end_streaming_spark.queries.fuzzy import (
        JW_THRESHOLD,
    )

    names = [
        r[0]
        for r in duckdb.sql(
            "SELECT DISTINCT p_name FROM "
            "read_parquet('/root/testdata/sf0.01/part.parquet')"
        ).fetchall()
    ]
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if ref_jw(a, b) >= JW_THRESHOLD:
                assert set(a.split()) & set(b.split()), (a, b)
