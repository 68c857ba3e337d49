"""Behavioral check of the LM fluency filter: disfluent (never-repeated
word salad) documents score below documents built from the corpus's
common phrasing. The Kneser-Ney trigram upgrade additionally carries an
exact pure-Python twin (same count statistics, same IEEE chain, same
sorted fold) so the distributed model assembly is pinned bit-for-bit."""

from __future__ import annotations

from collections import Counter, defaultdict

from databricks_end_to_end_streaming_spark.queries import all_queries


def _kn_twin(texts: dict[int, str]) -> dict[int, tuple[int, float]]:
    """Interpolated-KN trigram mean probability, computed sequentially
    with the exact expression tree of queries/text.py::lm_kneser_ney_score
    (D = 0.75, all stats from the trigram type table, position-sorted
    left fold from 0.0)."""
    docs = {
        i: t.strip().split() for i, t in texts.items() if len(t.strip().split()) >= 3
    }
    c3: Counter = Counter()
    for ws in docs.values():
        for k in range(len(ws) - 2):
            c3[(ws[k], ws[k + 1], ws[k + 2])] += 1
    c2: Counter = Counter()
    t12: Counter = Counter()
    n23: Counter = Counter()
    for (w1, w2, w3), c in c3.items():
        c2[(w1, w2)] += c
        t12[(w1, w2)] += 1
        n23[(w2, w3)] += 1
    n2dot: Counter = Counter()
    t2: Counter = Counter()
    n3: Counter = Counter()
    for (w2, w3), n in n23.items():
        n2dot[w2] += n
        t2[w2] += 1
        n3[w3] += 1
    nall = len(n23)
    p_type: dict = {}
    for (w1, w2, w3), c in c3.items():
        p_uni = float(n3[w3]) / float(nall)
        p_bi = (float(n23[(w2, w3)]) - 0.75) / float(n2dot[w2]) + (
            (0.75 * float(t2[w2])) / float(n2dot[w2])
        ) * p_uni
        p_type[(w1, w2, w3)] = (float(c) - 0.75) / float(c2[(w1, w2)]) + (
            (0.75 * float(t12[(w1, w2)])) / float(c2[(w1, w2)])
        ) * p_bi
    out: dict[int, tuple[int, float]] = {}
    for i, ws in docs.items():
        acc = 0.0
        n = len(ws) - 2
        for k in range(n):
            acc = acc + p_type[(ws[k], ws[k + 1], ws[k + 2])]
        out[i] = (n, acc / float(n))
    return out


def _write_docs(spark, workdir, texts: dict[int, str]) -> None:
    rows = [(i, t, "en", "src0", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{workdir}/documents.parquet")


def test_kneser_ney_matches_python_twin_exactly(spark, workdir):
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox sleeps under the old tree",
        2: "a slow green turtle jumps over the lazy dog",
        3: "the quick red fox jumps over a sleeping cat",
        4: "every quick brown fox jumps over the lazy dog today",
        5: "one two",  # < 3 tokens: must be absent from the output
        6: "  the   quick brown   fox  ",  # whitespace runs collapse
    }
    _write_docs(spark, workdir, texts)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["mean_kn_prob"])
        for r in all_queries()["lm_kneser_ney_score"](spark, workdir).collect()
    }
    want = _kn_twin(texts)
    assert set(got) == set(want) and 5 not in got
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == want[i][1], (i, got[i], want[i])  # bit-exact


def test_kneser_ney_garbled_doc_scores_lowest(spark, workdir):
    common = "the quick brown fox jumps over the lazy dog"
    texts = {i: common for i in range(8)}
    texts[100] = "zqx wvu tsr qpo nml kji hgf edc"
    _write_docs(spark, workdir, texts)
    out = {
        r["doc_id"]: r["mean_kn_prob"]
        for r in all_queries()["lm_kneser_ney_score"](spark, workdir).collect()
    }
    assert min(out, key=out.get) == 100
    # all probabilities are genuine interpolated-KN masses: in (0, 1]
    assert all(0.0 < p <= 1.0 for p in out.values())


def test_garbled_doc_scores_lowest(spark, workdir):
    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common, "en", "src0", len(common)) for i in range(8)]
    garbled = "zqx wvu tsr qpo nml kji hgf edc"
    rows.append((100, garbled, "en", "src0", len(garbled)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{workdir}/documents.parquet")
    out = {
        r["doc_id"]: r["mean_bigram_prob"]
        for r in all_queries()["lm_fluency_score"](spark, workdir).collect()
    }
    assert min(out, key=out.get) == 100
    # every bigram of the garbled doc is unique corpus-wide (c12 = c1 =
    # 1), so each term sits at the 2/(1+V) smoothing floor, while the
    # repeated phrasing's bigrams carry c12 = 8 of their heads' mass.
    assert out[0] > 2 * out[100]
