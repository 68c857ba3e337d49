"""KMV distinct sketch (operators/kmv.py, queries/kmv.py,
streaming/kmv_stage.py): exact bottom-k vs an independent sequential
computation, estimator behavior on both sides of saturation, monoid
laws, and the streaming fold's bitwise parity with the batch query."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.kmv import (
    bottom_k,
    kmv_merge,
    kmv_sketch,
)
from databricks_end_to_end_streaming_spark.queries.kmv import (
    K_USERS,
    kmv_distinct_users_per_type,
    kmv_source_token_overlap,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.kmv_stage import (
    kmv_report_from_log,
    kmv_sketch_stage,
    kmv_stage,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


def _h(key) -> int:
    """Sequential twin of operators.kmv.kmv_hash."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


def test_sketch_matches_sequential_bottom_k(spark):
    ev = load_table(spark, SF_DIR, "events")
    got = {
        (r.event_type, r.h)
        for r in kmv_sketch(ev, "user_id", ["event_type"], 8).collect()
    }
    by_type: dict[str, set[int]] = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        by_type.setdefault(r.event_type, set()).add(_h(r.user_id))
    want = {
        (t, h) for t, hs in by_type.items() for h in sorted(hs)[:8]
    }
    assert got == want and len(got) > 0


def test_estimator_exact_below_saturation(spark):
    # sf0.001 has fewer distinct users than k=64: est == exact count.
    rep = kmv_distinct_users_per_type(spark, SF_DIR)
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rep.collect():
        assert r.n_sketch == exact[r.event_type] < K_USERS
        assert r.est_distinct == float(exact[r.event_type])


def test_estimator_accuracy_when_saturated(spark):
    # sf0.01: 150 distinct users per type > k=64 — the estimator path.
    rep = {r.event_type: r for r in kmv_distinct_users_per_type(spark, SF_DIR_01).collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR_01, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, r in rep.items():
        assert r.n_sketch == K_USERS
        # k=64 gives ~1/sqrt(62) ~ 13% relative error at one sigma;
        # assert a loose 3-sigma band so the test is not a coin flip.
        assert abs(r.est_distinct - exact[t]) / exact[t] < 0.4


def test_merge_monoid_laws(spark):
    ev = load_table(spark, SF_DIR, "events")
    a = kmv_sketch(ev.where(F.col("user_id") % 2 == 0), "user_id", ["event_type"], 8)
    b = kmv_sketch(ev.where(F.col("user_id") % 2 == 1), "user_id", ["event_type"], 8)
    full = {
        (r.event_type, r.h)
        for r in kmv_sketch(ev, "user_id", ["event_type"], 8).collect()
    }
    ab = {(r.event_type, r.h) for r in kmv_merge([a, b], ["event_type"], 8).collect()}
    ba = {(r.event_type, r.h) for r in kmv_merge([b, a], ["event_type"], 8).collect()}
    aa = {(r.event_type, r.h) for r in kmv_merge([a, a], ["event_type"], 8).collect()}
    assert ab == ba == full  # merge of a partition == sketch of the whole
    assert aa == {(r.event_type, r.h) for r in a.collect()}  # idempotent


def test_overlap_self_consistency(spark):
    rows = kmv_source_token_overlap(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_common <= r.n_merged
        assert 0.0 <= r.est_jaccard <= 1.0
        # union >= each side's sketch size is not visible here, but the
        # intersection estimate can never exceed the union estimate
        assert r.est_intersection <= r.est_union + 1e-9


def _report(df):
    return [
        (r.event_type, r.n_sketch, r.kth, r.est_distinct)
        for r in df.orderBy("event_type").collect()
    ]


def test_drained_stream_equals_batch(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t = ParquetTable(f"{workdir}/kmv")
    stage = kmv_stage(t)
    for i in range(3):
        stage(ev.where(F.col("event_id") % 3 == i), i)
    got = _report(kmv_report_from_log(spark, t))
    want = _report(kmv_distinct_users_per_type(spark, SF_DIR))
    assert got == want and len(got) > 0


def test_slicing_insensitive(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t1, t2 = ParquetTable(f"{workdir}/k1"), ParquetTable(f"{workdir}/k2")
    s1, s2 = kmv_stage(t1), kmv_stage(t2)
    for i in range(2):
        s1(ev.where(F.col("event_id") % 2 == i), i)
    for i in range(5):
        s2(ev.where(F.col("user_id") % 5 == i), i)
    assert _report(kmv_report_from_log(spark, t1)) == _report(
        kmv_report_from_log(spark, t2)
    )


def test_replay_is_idempotent(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t = ParquetTable(f"{workdir}/kmv")
    stage = kmv_stage(t)
    stage(ev.where(F.col("event_id") % 2 == 0), 0)
    stage(ev.where(F.col("event_id") % 2 == 1), 1)
    before = _report(kmv_report_from_log(spark, t))
    stage(ev.where(F.col("event_id") % 2 == 1), 1)  # replay batch 1
    assert _report(kmv_report_from_log(spark, t)) == before


def test_prequential_view(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    t = ParquetTable(f"{workdir}/kmv")
    stage = kmv_stage(t)
    stage(ev.where(F.col("user_id") % 2 == 0), 0)
    stage(ev.where(F.col("user_id") % 2 == 1), 1)
    asof0 = _report(kmv_report_from_log(spark, t, up_to_batch=0))
    only0 = _report(
        kmv_report_from_log(spark, ParquetTable(f"{workdir}/kmv"))
    )
    # as-of-batch-0 must equal a log holding only batch 0
    t0 = ParquetTable(f"{workdir}/only0")
    kmv_stage(t0)(ev.where(F.col("user_id") % 2 == 0), 0)
    assert asof0 == _report(kmv_report_from_log(spark, t0))
    assert asof0 != only0  # and differ from the full two-batch fold


def test_streaming_wrapper(spark, workdir):
    ev = load_table(spark, SF_DIR, "events")
    src = f"{workdir}/src"
    ev.write.parquet(src)
    source = spark.readStream.schema(ev.schema).parquet(src)
    t = ParquetTable(f"{workdir}/kmv")
    kmv_sketch_stage(source, t, f"{workdir}/ckpt")
    got = _report(kmv_report_from_log(spark, t))
    want = _report(kmv_distinct_users_per_type(spark, SF_DIR))
    assert got == want


def test_weekly_rollup_equals_single_pass_weekly_sketch(spark):
    """The lossless-merge property that makes daily sketches worth
    persisting: weekly-from-daily-sketches == weekly-from-raw-events,
    hash for hash."""
    from databricks_end_to_end_streaming_spark.queries.kmv import (
        kmv_weekly_users_rollup,
    )

    ev = load_table(spark, SF_DIR, "events")
    raw_weekly = kmv_sketch(
        ev.select(
            F.date_format(
                F.date_trunc("week", F.to_date("ts")), "yyyy-MM-dd"
            ).alias("week"),
            "user_id",
        ),
        "user_id",
        ["week"],
        K_USERS,
    )
    agg = raw_weekly.groupBy("week").agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("kth")
    )
    want = {
        (r.week, r.n_sketch, r.kth) for r in agg.collect()
    }
    got = {
        (r.week, r.n_sketch, r.kth)
        for r in kmv_weekly_users_rollup(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0


def test_join_size_profile_estimates_close_to_actual(spark):
    """On the TPC-H FK joins the uniform-frequency model should land
    within a loose band of the true cardinality (k=256 sketches)."""
    from databricks_end_to_end_streaming_spark.queries.kmv import (
        kmv_join_size_profile,
    )

    rows = {r.join_name: r for r in kmv_join_size_profile(spark, SF_DIR_01).collect()}
    assert set(rows) == {"orders_x_customer", "lineitem_x_orders"}
    for r in rows.values():
        assert r.actual_join_rows > 0
        rel = abs(r.est_join_rows - r.actual_join_rows) / r.actual_join_rows
        assert rel < 0.35, (r.join_name, rel)


def test_streamed_daily_sketches_feed_weekly_rollup(spark, workdir):
    """The production composition the weekly rollup assumes: a stream
    persists per-DAY sketches (grouped stage), and folding that log by
    week reproduces the batch weekly rollup estimates exactly."""
    from databricks_end_to_end_streaming_spark.queries.kmv import (
        kmv_weekly_users_rollup,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    t = ParquetTable(f"{workdir}/daily")
    stage = kmv_stage(t, key="user_id", group_cols=["day"])
    for i in range(4):  # slice the stream arbitrarily
        stage(ev.where(F.col("user_id") % 4 == i), i)
    log = t.read(spark)
    weekly_hashes = log.select(
        F.date_format(F.date_trunc("week", F.col("day")), "yyyy-MM-dd").alias(
            "week"
        ),
        "h",
    ).distinct()
    from databricks_end_to_end_streaming_spark.operators.kmv import bottom_k
    from databricks_end_to_end_streaming_spark.queries.kmv import (
        kmv_group_report,
    )

    got = {
        (r.week, r.n_sketch, r.kth, r.est_distinct)
        for r in kmv_group_report(
            bottom_k(weekly_hashes, ["week"], K_USERS), ["week"], K_USERS
        ).collect()
    }
    want = {
        (r.week, r.n_sketch, r.kth, r.est_distinct)
        for r in kmv_weekly_users_rollup(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0


def test_trailing_window_equals_window_sketch_of_raw(spark):
    """Sliding-window estimates from daily sketches == sketching each
    window from raw events directly (the idempotent-merge property,
    window edition)."""
    import datetime

    from databricks_end_to_end_streaming_spark.queries.kmv import (
        TRAIL_DAYS,
        kmv_group_report,
        kmv_trailing_7day_users,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    d1 = ev.agg(F.max("day")).first()[0]
    got = {
        (r.window_end, r.n_sketch, r.kth)
        for r in kmv_trailing_7day_users(spark, SF_DIR).collect()
    }
    want = set()
    days = [r.day for r in ev.select("day").distinct().collect()]
    # window ends = every day reachable from an active day, capped at d1
    ends = sorted({min(d + datetime.timedelta(days=i), d1) for d in days for i in range(TRAIL_DAYS)})
    for w in ends:
        in_win = ev.where(
            (F.col("day") >= F.lit(w - datetime.timedelta(days=TRAIL_DAYS - 1)))
            & (F.col("day") <= F.lit(w))
        )
        sk = kmv_sketch(in_win.withColumn("g", F.lit(1)), "user_id", ["g"], K_USERS)
        agg = sk.agg(F.count("*").alias("n"), F.max("h").alias("kth")).first()
        want.add((w.strftime("%Y-%m-%d"), agg.n, agg.kth))
    assert got == want and len(got) > 0


def test_persisted_summary_prediction_equals_scan_inclusive(spark, workdir):
    """The r8 persisted-sketch path: predicting from parquet-persisted
    (rows_per, sketch) summaries must reproduce kmv_join_size_estimate
    bit-for-bit — the marginal-prediction bench number measures the
    same computation, just from its maintained inputs."""
    from databricks_end_to_end_streaming_spark.queries.kmv import (
        join_size_predict,
        join_size_summaries,
        kmv_join_size_estimate,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    want = {
        r["join_name"]: tuple(r)
        for r in kmv_join_size_estimate(spark, sf).collect()
    }
    got = {}
    for fact, fk, dim, dk, name in [
        ("orders", "o_custkey", "customer", "c_custkey", "orders_x_customer"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem_x_orders"),
    ]:
        rows_per, sk = join_size_summaries(
            load_table(spark, sf, fact), fk, load_table(spark, sf, dim), dk
        )
        rows_per.write.mode("overwrite").parquet(f"{workdir}/{name}_rows")
        sk.write.mode("overwrite").parquet(f"{workdir}/{name}_sk")
        out = join_size_predict(
            spark.read.parquet(f"{workdir}/{name}_rows"),
            spark.read.parquet(f"{workdir}/{name}_sk"),
            name,
        ).collect()
        assert len(out) == 1
        got[name] = tuple(out[0])
    assert got == want
