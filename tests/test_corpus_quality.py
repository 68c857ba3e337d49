"""Invariant tests for the Gopher quality gate, the Heaps vocabulary
growth curve, and quality-aware canonical selection (queries/text.py,
queries/dedup.py). Cross-engine value parity is the driver's DuckDB
gate; these assert the semantic invariants on real testdata."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_gopher_rules_consistent(spark):
    rows = all_queries()["gopher_quality_rules"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        want = int(
            50 <= r.n_tokens <= 100_000
            and 3.0 <= r.mean_word_len <= 10.0
            and r.alpha_word_ratio >= 0.8
            and r.stop_hits >= 2
        )
        assert r.passes_gopher == want
        # This corpus is all-lowercase word salad: every word is alpha.
        assert r.alpha_word_ratio == 1.0
    # The gate must actually split the corpus, not rubber-stamp it.
    passed = sum(r.passes_gopher for r in rows)
    assert 0 < passed < len(rows)


def test_heaps_curve_invariants(spark):
    rows = sorted(
        all_queries()["vocab_growth_heaps"](spark, SF_DIR).collect(),
        key=lambda r: r.bucket,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), " +")))
    ).collect()[0][0]
    total_vocab = (
        docs.select(F.explode(F.split(F.lower(F.trim("text")), " +")).alias("w"))
        .where(F.col("w") != "")
        .select("w")
        .distinct()
        .count()
    )
    assert rows[-1].cum_tokens == total_tokens
    assert rows[-1].cum_vocab == total_vocab
    # Cumulative columns are running sums of the per-bucket columns.
    ct = cv = 0
    for r in rows:
        ct += r.bucket_tokens
        cv += r.new_words
        assert (r.cum_tokens, r.cum_vocab) == (ct, cv)
    # Sub-linear growth: later buckets contribute fewer new words than
    # the first (Heaps' law shape on any natural-ish corpus).
    assert rows[-1].new_words < rows[0].new_words


def test_canonical_selection_per_cluster(spark):
    rows = all_queries()["neardup_canonical_selection"](spark, SF_DIR).collect()
    assert rows
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for members in by_cluster.values():
        canon = [m for m in members if m.is_canonical == 1]
        assert len(canon) == 1  # exactly one representative
        best = max(members, key=lambda m: (m.n_tokens, -m.doc_id))
        assert canon[0].doc_id == best.doc_id  # and it is the best one


def test_waterfill_budget_invariants(spark):
    rows = all_queries()["token_budget_waterfill"](spark, SF_DIR).collect()
    assert rows
    total = sum(r.n_tokens for r in rows)
    budget = total * 6 // 10
    spent = sum(r.allocation for r in rows)
    assert abs(spent - budget) < 1e-6 * budget  # budget spent exactly
    t = max(r.allocation for r in rows)  # the common cap
    for r in rows:
        assert r.allocation <= r.n_tokens + 1e-9
        # water-filling shape: either capped at t, or kept whole below t
        assert r.allocation == t or (
            abs(r.allocation - r.n_tokens) < 1e-9 and r.n_tokens <= t
        )
        assert 0 < r.kept_fraction <= 1.0 + 1e-12


def test_zlib_ratio_matches_sequential(spark):
    import zlib

    rows = all_queries()["zlib_compression_ratio"](spark, SF_DIR).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        raw = docs[r.doc_id].encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        assert (r.n_bytes, r.n_compressed) == (len(raw), comp)
        assert r.compression_ratio == comp / len(raw)


def test_containment_finds_planted_subset(spark, workdir):
    import random

    rng = random.Random(23)
    vocab = [f"tok{i}" for i in range(400)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(120))) for i in range(30)]
    # doc 100: the first 45 words of doc 4 — contained, but low jaccard
    inner = " ".join(docs[4][1].split()[:45])
    docs.append((100, inner))
    sf_dir = f"{workdir}/sf"
    import os

    os.makedirs(sf_dir)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {
        (r.doc_inner, r.doc_outer): r.containment
        for r in all_queries()["containment_bottomk_sketch"](spark, sf_dir).collect()
    }
    assert (100, 4) in got and got[(100, 4)] >= 0.99  # subset found
    assert (4, 100) not in got  # the long doc is NOT contained in the short


def test_containment_removal_drops_planted_subset(spark, workdir):
    import os
    import random

    rng = random.Random(23)
    vocab = [f"tok{i}" for i in range(400)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(120)), f"s{i % 2}")
        for i in range(30)
    ]
    docs.append((100, " ".join(docs[4][1].split()[:45]), "s0"))  # contained
    sf_dir = f"{workdir}/sf"
    os.makedirs(sf_dir)
    spark.createDataFrame(docs, "doc_id long, text string, source string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    rows = {
        r.source: r
        for r in all_queries()["containment_dedup_removal"](spark, sf_dir).collect()
    }
    assert rows["s0"].n_dropped == 1  # only the planted subset goes
    assert rows["s1"].n_dropped == 0
    for r in rows.values():
        assert r.n_kept + r.n_dropped == r.n_docs


def test_seasonal_backtest_planted_pattern(spark, tmp_path):
    """A perfectly seasonal series: hour-h values are constant per hour,
    so the seasonal MAE is 0 for every cell while the global-mean MAE is
    positive for hours whose level differs from the overall mean."""
    import datetime

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        seasonal_naive_backtest,
    )

    rows = []
    eid = 0
    for day in range(1, 15):  # 14 days; last 7 are the holdout
        for hr in (3, 9):  # two hours with different constant levels
            for _ in range(2):
                rows.append(
                    (
                        eid,
                        datetime.datetime(2024, 1, day, hr, 30, 0),
                        1,
                        "click",
                        100.0 if hr == 3 else 300.0,
                        "{}",
                    )
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = {(r.event_type, r.hr): r for r in seasonal_naive_backtest(spark, str(tmp_path)).collect()}
    assert set(out) == {("click", 3), ("click", 9)}
    for (t, hr), r in out.items():
        assert r.mae_seasonal == 0.0  # exact per-hour constant
        assert r.mae_global > 0.0  # hours differ from the pooled mean
        assert r.forecast_cents == (10000.0 if hr == 3 else 30000.0)
        assert r.n_test == 14 and r.n_train == 14


def test_repetition_battery_flags_planted_repeats(spark):
    """gopher_repetition_signals: a doc repeating one of its own lines
    fails the duplicate-line bounds; a doc dominated by one bigram fails
    the top-2-gram bound; diverse text passes everything."""
    import random

    from databricks_end_to_end_streaming_spark.queries.dedup import LINE_W
    from databricks_end_to_end_streaming_spark.queries.text import (
        repetition_signals,
    )

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(2000)]

    def rand(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    line = rand(LINE_W)
    docs = spark.createDataFrame(
        [
            (0, rand(8 * LINE_W)),                       # clean
            (1, " ".join([line] * 4) + " " + rand(LINE_W)),  # dup lines
            (2, "spam ham " * 60 + rand(24)),            # one hot bigram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert got[0].passes_repetition == 1
    assert got[0].dup_line_frac == 0.0
    assert got[1].passes_repetition == 0
    assert got[1].dup_line_frac > 0.3  # 3 of 5 lines are repeats
    assert got[1].dup_line_char_frac > 0.2
    assert got[2].passes_repetition == 0
    assert got[2].top_2gram_char_frac > 0.2
    # fractions are consistent: char fraction bounded by 1, ordered n-grams
    for r in got.values():
        assert 0 <= r.top_4gram_char_frac <= 1


def test_attribution_last_touch_planted(spark, workdir):
    """attribution_last_touch: in-window touch credits its channel, an
    8-day-old touch and a touchless purchase fall to 'direct', and the
    LAST touch wins over earlier ones."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 10)

    def ev(eid, uid, typ, dt_h, value=10.0):
        return (eid, t0 + timedelta(hours=dt_h), uid, typ, value)

    rows = [
        ev(1, 1, "view", 0), ev(2, 1, "purchase", 1),          # -> view
        ev(3, 2, "click", 0), ev(4, 2, "purchase", 8 * 24),    # -> direct
        ev(5, 3, "signup", 0), ev(6, 3, "view", 1),
        ev(7, 3, "click", 2), ev(8, 3, "purchase", 3),         # -> click
        ev(9, 4, "purchase", 0),                               # -> direct
        ev(10, 5, "error", 0), ev(11, 5, "purchase", 1),       # -> direct
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{workdir}/events.parquet")
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        attribution_last_touch,
    )

    got = {
        r.channel: (r.n_purchases, r.revenue)
        for r in attribution_last_touch(spark, str(workdir)).collect()
    }
    assert got == {"view": (1, 10.0), "click": (1, 10.0), "direct": (3, 30.0)}


def test_psi_flags_planted_period_shift(spark, workdir):
    """psi_value_drift_per_type: a type whose value distribution jumps
    between halves scores 'major'; a stable type scores 'stable'."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(300):
        eid += 1  # drifting type: values move 25 -> 125 across halves
        half = 0 if i < 150 else 1
        rows.append(
            (eid, t0 + timedelta(minutes=i), 1, "drifty",
             25.0 if half == 0 else 125.0)
        )
        eid += 1  # stable type: same value always
        rows.append((eid, t0 + timedelta(minutes=i), 2, "steady", 75.0))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{workdir}/events.parquet")
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        psi_value_drift_per_type,
    )

    got = {
        r.event_type: r for r in
        psi_value_drift_per_type(spark, str(workdir)).collect()
    }
    assert got["drifty"].drift_class == "major"
    assert got["drifty"].psi > 0.25
    assert got["steady"].drift_class == "stable"
    assert got["steady"].psi < 0.1


def test_zipf_fit_recovers_slope_minus_one(spark, workdir):
    """zipf_fit_per_lang: an exactly Zipfian frequency table (f = C/r)
    fits slope ~ -1."""
    words = []
    for r in range(1, 51):
        words += [f"w{r:03d}"] * max(round(600 / r), 1)
    text = " ".join(words)
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{workdir}/documents.parquet")
    from databricks_end_to_end_streaming_spark.queries.text import (
        zipf_fit_per_lang,
    )

    row = zipf_fit_per_lang(spark, str(workdir)).collect()[0]
    assert row.vocab_size == 50
    assert abs(row.zipf_slope - (-1.0)) < 0.05


def test_mann_whitney_auc_hand_cases(spark):
    """classifier_auc_eval core: perfect separation -> 1.0, reversed ->
    0.0, a cross-class score tie counts half (the average-rank rule),
    random-ish interleave matches the hand-computed U."""
    from databricks_end_to_end_streaming_spark.queries.classifier import (
        mann_whitney_auc,
    )

    def auc(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, score double, weak_label long"
        )
        return mann_whitney_auc(df).collect()[0]

    r = auc([(1, 0.1, 0), (2, 0.2, 0), (3, 0.3, 1), (4, 0.4, 1)])
    assert (r.auc, r.gini) == (1.0, 1.0)
    r = auc([(1, 0.4, 0), (2, 0.3, 0), (3, 0.2, 1), (4, 0.1, 1)])
    assert (r.auc, r.gini) == (0.0, -1.0)
    # tie across classes at 0.2: pos .3 beats both negs (2), pos .2
    # beats neg .1 (1) and ties neg .2 (0.5) -> U = 3.5 of 4 -> 0.875
    r = auc([(1, 0.1, 0), (2, 0.2, 0), (3, 0.2, 1), (4, 0.3, 1)])
    assert r.auc == 0.875
    # interleaved: neg .1, pos .2, neg .3, pos .4 -> U = 2 + 1 = 3 of 4
    r = auc([(1, 0.1, 0), (2, 0.2, 1), (3, 0.3, 0), (4, 0.4, 1)])
    assert r.auc == 0.75
    assert r.n_pos == 2 and r.n_neg == 2


def test_holt_backtest_matches_numpy_and_beats_naive_on_trend(spark, workdir):
    """holt_linear_backtest: exact NumPy-twin MAEs on planted hourly
    series; on a strong linear trend Holt's one-step forecast beats the
    naive last-value forecast."""
    from datetime import datetime, timedelta

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        HOLT_ALPHA,
        HOLT_BETA,
        holt_linear_backtest,
    )

    t0 = datetime(2024, 3, 1)
    rows, eid = [], 0
    trend_vals = [10.0 + 3.0 * i for i in range(48)]  # strong trend
    zig_vals = [50.0 if i % 2 == 0 else 10.0 for i in range(48)]
    for i in range(48):
        for v, typ in ((trend_vals[i], "trend"), (zig_vals[i], "zigzag")):
            eid += 1
            rows.append((eid, t0 + timedelta(hours=i), 1, typ, v))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{workdir}/events.parquet")

    def twin(vals):
        l, b, prev = vals[0], 0.0, vals[0]
        sh = sn = 0.0
        for v in vals[1:]:
            sh += abs(v - (l + b))
            sn += abs(v - prev)
            nl = HOLT_ALPHA * v + (1 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (nl - l) + (1 - HOLT_BETA) * b
            l, prev = nl, v
        return sh / (len(vals) - 1), sn / (len(vals) - 1)

    got = {
        r.event_type: r
        for r in holt_linear_backtest(spark, str(workdir)).collect()
    }
    for typ, vals in (("trend", trend_vals), ("zigzag", zig_vals)):
        sh, sn = twin(vals)
        assert got[typ].n_hours == 48
        assert abs(got[typ].mae_holt - sh) < 1e-12
        assert abs(got[typ].mae_naive - sn) < 1e-12
    # Holt tracks the trend; naive is always 3 behind
    assert got["trend"].holt_beats_naive == 1
    assert got["trend"].mae_holt < got["trend"].mae_naive


def test_burstiness_separates_topical_from_uniform(spark, workdir):
    """token_burstiness_topk: a token concentrated in few docs scores a
    high Fano factor; a once-per-doc token scores near zero (regular);
    values match a NumPy twin exactly."""
    import numpy as np

    from databricks_end_to_end_streaming_spark.queries.text import (
        token_burstiness_topk,
    )

    rows = []
    for i in range(40):
        words = ["filler%d_%d" % (i, j) for j in range(20)]
        words.append("uniformtok")  # exactly once per doc
        if i < 5:
            words += ["burstytok"] * 30  # 150 occurrences in 5 docs
        rows.append((i, " ".join(words), "en", "s", 1))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{workdir}/documents.parquet")
    got = {
        r.token: r for r in token_burstiness_topk(spark, str(workdir)).collect()
    }
    assert "burstytok" in got and "uniformtok" in got
    # numpy twin (zeros included)
    def fano(counts, n_docs=40):
        c = np.zeros(n_docs)
        c[: len(counts)] = counts
        return float(np.var(c) / np.mean(c))

    assert abs(got["burstytok"].fano - fano([30] * 5)) < 1e-9
    assert abs(got["uniformtok"].fano - fano([1] * 40)) < 1e-9
    assert got["burstytok"].fano > 20  # strongly bursty
    assert got["uniformtok"].fano < 0.1  # regular
    assert got["burstytok"].df == 5 and got["burstytok"].total == 150


def test_manifest_change_detection_matrix(spark, workdir):
    """corpus_manifest: identical data (even reordered/repartitioned)
    reproduces the manifest; an edit, a drop, an addition, and a re-key
    each flip content_xor."""
    from databricks_end_to_end_streaming_spark.queries.analytics import (
        corpus_manifest,
    )

    def write(rows, name):
        import os

        d = f"{workdir}/{name}"
        os.makedirs(d)
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).repartition(4).write.parquet(f"{d}/documents.parquet")
        return {
            r.source: (r.n_docs, r.total_chars, r.content_xor)
            for r in corpus_manifest(spark, d).collect()
        }

    base = [(i, f"text {i}", "en", "s0", 7) for i in range(20)]
    m0 = write(base, "base")
    assert write(list(reversed(base)), "reordered") == m0  # order-free
    edited = [r if r[0] != 7 else (7, "text 7x", "en", "s0", 8) for r in base]
    assert write(edited, "edited")["s0"][2] != m0["s0"][2]
    assert write(base[:-1], "dropped")["s0"] != m0["s0"]
    assert write(base + [(99, "new", "en", "s0", 3)], "added")["s0"] != m0["s0"]
    # re-key: swap two docs' ids, texts unchanged — XOR of (id:text)
    # hashes must still flip
    rekeyed = list(base)
    rekeyed[0] = (1, "text 0", "en", "s0", 7)
    rekeyed[1] = (0, "text 1", "en", "s0", 7)
    assert write(rekeyed, "rekeyed")["s0"][2] != m0["s0"][2]


def test_ks_and_benford_on_planted_distributions(spark, workdir):
    """ks_test_value_drift: a planted period shift yields the
    hand-computable D; benford_value_audit: Benford-conforming values
    score far below uniform-digit values."""
    from datetime import datetime, timedelta

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        benford_value_audit,
        ks_test_value_drift,
    )

    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    # KS plant: first half values ~ {10, 20}, second half ~ {20, 30}
    for i in range(100):
        eid += 1
        half = 0 if i < 50 else 1
        v = (10.0 if i % 2 == 0 else 20.0) if half == 0 else (
            20.0 if i % 2 == 0 else 30.0
        )
        rows.append((eid, t0 + timedelta(minutes=i), 1, "ks", v))
    # Benford plant: digits drawn 1-9 uniformly (anti-Benford)
    for i in range(900):
        eid += 1
        rows.append(
            (eid, t0 + timedelta(seconds=i), 2, "uniform",
             float((i % 9 + 1) * 10 + 3))
        )
    # Benford plant: counts proportional to log10(1 + 1/d)
    benford_counts = [271, 158, 112, 87, 71, 60, 52, 46, 41]
    for d, c in enumerate(benford_counts, start=1):
        for k in range(c):
            eid += 1
            rows.append(
                (eid, t0 + timedelta(seconds=eid), 3, "benford",
                 float(d * 100 + k % 90))
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{workdir}/events.parquet")

    ks = {
        r.event_type: r for r in ks_test_value_drift(spark, str(workdir)).collect()
    }
    # ECDFs: F1 = (.5 at 10, 1.0 at 20); F2 = (0 at 10, .5 at 20, 1 at 30)
    # D = max gap = .5 (at value 10 and at 20)
    assert ks["ks"].ks_d == 0.5
    assert ks["ks"].n_base == 50 and ks["ks"].n_actual == 50

    bf = {
        r.event_type: r.benford_chi2_stat
        for r in benford_value_audit(spark, str(workdir)).collect()
    }
    assert bf["uniform"] > 50 * bf["benford"]  # uniform digits flagged
    assert bf["benford"] < 0.01  # proportional counts track Benford


def test_spearman_trend_recovers_planted_monotonicity(spark, workdir):
    """spearman_trend_per_type: rho = +1 on a strictly rising series,
    -1 on a falling one, ~0 on alternation; ties take average ranks
    (hand-checked against scipy's definition on a small case)."""
    from datetime import datetime, timedelta

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        spearman_trend_per_type,
    )

    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    for i in range(60):
        for typ, v in (
            ("up", float(i)),
            ("down", float(100 - i)),
            ("flat", 5.0 if i % 2 == 0 else 4.0),
        ):
            eid += 1
            rows.append((eid, t0 + timedelta(minutes=i), 1, typ, v))
    # tie case: values [1, 2, 2, 3] over time -> rho vs ranks
    # x2 = [2,4,6,8]; value ranks (avg): [1, 2.5, 2.5, 4] -> y2=[2,5,5,8]
    for i, v in enumerate([1.0, 2.0, 2.0, 3.0]):
        eid += 1
        rows.append((eid, t0 + timedelta(minutes=i), 2, "tied", v))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{workdir}/events.parquet")
    got = {
        r.event_type: r
        for r in spearman_trend_per_type(spark, str(workdir)).collect()
    }
    assert got["up"].spearman_rho == 1.0
    assert got["down"].spearman_rho == -1.0
    assert abs(got["flat"].spearman_rho) < 0.1
    # hand value: x2=[2,4,6,8], y2=[2,5,5,8]:
    # n=4 sx=20 sy=20 sxy=(4+20+30+64)=118 sxx=120 syy=118
    # rho = (472-400)/sqrt((480-400)*(472-400)) = 72/sqrt(80*72)
    import math

    want = 72 / math.sqrt(80 * 72)
    assert abs(got["tied"].spearman_rho - want) < 1e-15


def test_cramers_v_bounds_on_planted_tables(spark, workdir):
    """cramers_v_type_weekday: a type fully determined by weekday
    scores V = 1; a type independent of weekday scores ~0."""
    from datetime import datetime, timedelta

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        cramers_v_type_weekday,
    )

    t0 = datetime(2024, 1, 1)  # a Monday
    rows, eid = [], 0
    # determined: each of 7 types occurs ONLY on its own weekday
    for week in range(8):
        for d in range(7):
            for _ in range(5):
                eid += 1
                rows.append(
                    (eid, t0 + timedelta(days=week * 7 + d), 1,
                     f"only_dow_{d}", 1.0)
                )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{workdir}/det/events.parquet")
    det = cramers_v_type_weekday(spark, f"{workdir}/det").collect()[0]
    assert det.r == 7 and det.c == 7
    assert abs(det.cramers_v - 1.0) < 1e-12

    rows2, eid = [], 0
    # independent: both types occur equally on every weekday
    for week in range(8):
        for d in range(7):
            for typ in ("a", "b"):
                for _ in range(3):
                    eid += 1
                    rows2.append(
                        (eid, t0 + timedelta(days=week * 7 + d), 1, typ, 1.0)
                    )
    spark.createDataFrame(
        rows2,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{workdir}/ind/events.parquet")
    ind = cramers_v_type_weekday(spark, f"{workdir}/ind").collect()[0]
    assert ind.cramers_v < 1e-6
