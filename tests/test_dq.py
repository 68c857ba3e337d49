"""Unit behavior of the one-pass expectations report."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.dq import expectations_report


def test_expectations_counts_and_rates(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (2, 7.0), (3, 200.0)], "id long, v double"
    )
    out = {
        r["rule"]: r
        for r in expectations_report(
            df,
            rules={
                "v_nonneg": F.col("v") >= 0,
                "v_under_100": F.col("v") < 100,
            },
            uniqueness="id",
        ).collect()
    }
    assert out["v_nonneg"]["n_violations"] == 1
    assert out["v_under_100"]["n_violations"] == 1
    assert out["unique(id)"]["n_violations"] == 1  # id=2 twice
    for r in out.values():
        assert r["n_checked"] == 4
        assert abs(r["violation_rate"] - r["n_violations"] / 4) < 1e-15


def test_expectations_single_scan_plan(spark):
    # all rules ride ONE aggregate over ONE scan of the input
    df = spark.createDataFrame([(1, 5.0)], "id long, v double")
    rep = expectations_report(
        df, rules={"a": F.col("v") >= 0, "b": F.col("v") < 100}
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def _py_dsir(texts: dict[int, tuple[str, bool]]) -> dict[int, int]:
    """Sequential DSIR twin: same md5 bucketing, same integer lift."""
    import hashlib

    import re as _re

    def buckets_of(text: str) -> list[int]:
        ws = _re.sub(r"\s+", " ", text).strip().lower().split(" ")
        return [
            int(
                hashlib.md5(f"{a} {b}".encode()).hexdigest()[:2], 16
            )
            for a, b in zip(ws, ws[1:])
        ]

    cnt_r: dict[int, int] = {}
    cnt_t: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for i, (text, is_t) in texts.items():
        tf: dict[int, int] = {}
        for b in buckets_of(text):
            tf[b] = tf.get(b, 0) + 1
            cnt_r[b] = cnt_r.get(b, 0) + 1
            if is_t:
                cnt_t[b] = cnt_t.get(b, 0) + 1
        if tf:
            per_doc[i] = tf
    total_r = sum(cnt_r.values())
    total_t = sum(cnt_t.values())
    return {
        i: sum(
            tf * (cnt_t.get(b, 0) * total_r - cnt_r[b] * total_t)
            for b, tf in tfs.items()
        )
        for i, tfs in per_doc.items()
    }


def test_dsir_scores_match_sequential_twin(spark):
    corpus = {
        1: ("the quick brown fox jumps over the lazy dog", True),
        2: ("the quick brown fox sleeps all day long", True),
        3: ("lorem ipsum dolor sit amet consectetur adipiscing", False),
        4: ("the quick brown dog naps beside the fox", False),
        5: ("zzz yyy xxx www vvv uuu ttt sss", False),
        6: ("solo", False),  # 1 token -> no bigrams -> absent from output
    }
    from databricks_end_to_end_streaming_spark.queries.dq import dsir_scores

    df = spark.createDataFrame(
        [(i, t, is_t) for i, (t, is_t) in corpus.items()],
        "doc_id long, text string, is_t boolean",
    )
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(df, F.col("is_t")).collect()
    }
    want = _py_dsir(corpus)
    assert got == want
    assert 6 not in got
    # Target-like doc 4 (shares 'the quick brown' with the target slice)
    # must outrank the disjoint-vocabulary doc 5.
    assert got[4] > got[5]
