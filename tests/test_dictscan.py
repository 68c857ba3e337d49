"""Aho-Corasick dictionary scan (operators/dictscan.py): the automaton's
non-overlapping counts must equal Python str.count exactly (the
semantics the DuckDB replace-count oracle replays), including on
adversarial self-overlapping patterns; the report keeps zero-hit terms."""

from __future__ import annotations

import random

from databricks_end_to_end_streaming_spark.operators.dictscan import (
    DICT_TERMS,
    build_aho,
    count_nonoverlapping,
    dictionary_term_report,
)


def test_counts_match_str_count_property():
    """Random texts over a 3-char alphabet against a dictionary dense
    with borders and nestings ('aa' in 'aaa', 'aba' overlapping itself,
    terms that are prefixes/suffixes/substrings of each other) — the
    worst case for both the failure links and the greedy filter."""
    terms = ("a", "aa", "aaa", "ab", "aba", "abab", "ba", "bab", "b", "abc")
    auto = build_aho(terms)
    rng = random.Random(42)
    for _ in range(300):
        text = "".join(rng.choice("aab c") for _ in range(rng.randint(0, 60)))
        got = count_nonoverlapping(text, auto, terms)
        for ti, term in enumerate(terms):
            assert got.get(ti, 0) == text.count(term), (text, term)


def test_planted_doc_and_zero_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "fast table table table key agg row scan scan scan slow"),
            (2, "spark spark stream"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.term: (r.n_docs, r.n_hits) for r in
           dictionary_term_report(docs).collect()}
    assert set(out) == set(DICT_TERMS)  # every term reports, hits or not
    assert out["gdpr"] == (0, 0) and out["password"] == (0, 0)
    t = "fast table table table key agg row scan scan scan slow"
    assert out["table table"] == (1, t.count("table table"))
    assert out["scan scan"] == (1, t.count("scan scan"))
    assert out["fast table"] == (1, 1)
    assert out["key agg"] == (1, 1)
    assert out["agg"] == (1, 1)
    assert out["spark"] == (1, 2)
    assert out["stream"] == (1, 1)
    assert out["slow"] == (1, 1)


def test_report_plan_broadcasts_term_dim(spark):
    docs = spark.createDataFrame([(1, "agg")], "doc_id long, text string")
    plan = (
        dictionary_term_report(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_streaming_twin_drained_equals_batch_and_replays(spark, workdir):
    """3-way corpus slices through the dictscan stage fold to the
    registered batch query bit-for-bit; a replayed batch never
    double-counts."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries import all_queries
    from databricks_end_to_end_streaming_spark.streaming import ParquetTable
    from databricks_end_to_end_streaming_spark.streaming.dictscan_stage import (
        dictscan_report_from_log,
        dictscan_stage,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    t = ParquetTable(f"{workdir}/dictscan_log")
    stage = dictscan_stage(t)
    for i in range(3):
        stage(d.where(F.col("doc_id") % 3 == i), i)
    got = [tuple(r) for r in dictscan_report_from_log(spark, t).collect()]
    want = [
        tuple(r)
        for r in all_queries()["dictionary_term_scan"](spark, sf).collect()
    ]
    assert got == want and len(got) > 0
    stage(d.where(F.col("doc_id") % 3 == 1), 1)  # replay
    assert [
        tuple(r) for r in dictscan_report_from_log(spark, t).collect()
    ] == want
