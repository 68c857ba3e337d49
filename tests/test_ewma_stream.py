"""Cross-batch EWMA: time-ordered micro-batches reproduce the one-shot
batch fold bit-for-bit, new keys start with the batch query's init
convention, and replays of any batch never double-apply the fold."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.streaming import (
    ParquetTable,
    current_ewma,
    ewma_stage,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts long, value double")


ROWS = [
    (1, 10, 1.0), (1, 20, 3.0), (1, 30, 5.0), (1, 40, 7.0), (1, 50, 2.0),
    (2, 10, 10.0), (2, 25, 20.0),
    (3, 45, 4.0),  # appears only in the last batch
]


def _python_ewma(vals, alpha=0.5):
    s = vals[0]
    for x in vals[1:]:
        s = alpha * x + (1.0 - alpha) * s
    return s


def test_time_ordered_batches_equal_one_shot_fold(spark, workdir):
    t = ParquetTable(f"{workdir}/ewma")
    stage = ewma_stage(t, key="user_id", value="value", order=("ts",))
    # split on event time: batch boundaries at ts<=20, ts<=40, rest
    stage(_events(spark, [r for r in ROWS if r[1] <= 20]), 0)
    stage(_events(spark, [r for r in ROWS if 20 < r[1] <= 40]), 1)
    stage(_events(spark, [r for r in ROWS if r[1] > 40]), 2)
    got = {r["key"]: r for r in current_ewma(spark, t).collect()}
    for uid in (1, 2, 3):
        vals = [v for (u, _ts, v) in sorted(ROWS, key=lambda r: r[1]) if u == uid]
        assert got[uid]["ewma"] == _python_ewma(vals), uid
        assert got[uid]["n_events"] == len(vals)


def test_matches_registered_batch_query_on_events(spark, workdir):
    """One batch containing the whole corpus == the registered
    ewma_event_value_per_user query, value for value (same init, same
    operand order, same alpha)."""
    from databricks_end_to_end_streaming_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    t = ParquetTable(f"{workdir}/ewma_full")
    stage = ewma_stage(t, key="user_id", value="value", order=("ts", "event_id"))
    stage(ev, 0)
    got = {
        r["key"]: (r["ewma"], r["n_events"])
        for r in current_ewma(spark, t).collect()
    }
    expected = {
        r["user_id"]: (r["ewma_value"], r["n_events"])
        for r in all_queries()["ewma_event_value_per_user"](spark, SF_DIR).collect()
    }
    assert got == expected and len(got) > 0


def test_replay_mid_stream_is_idempotent(spark, workdir):
    t = ParquetTable(f"{workdir}/ewma")
    stage = ewma_stage(t, key="user_id", value="value", order=("ts",))
    stage(_events(spark, [r for r in ROWS if r[1] <= 20]), 0)
    stage(_events(spark, [r for r in ROWS if 20 < r[1] <= 40]), 1)
    stage(_events(spark, [r for r in ROWS if r[1] > 40]), 2)
    before = sorted(map(tuple, t.read(spark).collect()))
    # replay batch 1 after batch 2 landed: prior-state view is
    # _batch_id < 1, so the fold re-runs from the SAME init and the
    # token overwrite leaves the log byte-identical
    stage(_events(spark, [r for r in ROWS if 20 < r[1] <= 40]), 1)
    assert sorted(map(tuple, t.read(spark).collect())) == before
    got = {r["key"]: r["ewma"] for r in current_ewma(spark, t).collect()}
    vals1 = [v for (u, _ts, v) in sorted(ROWS, key=lambda r: r[1]) if u == 1]
    assert got[1] == _python_ewma(vals1)


def test_randomized_split_sweep_matches_python(spark, workdir):
    """Seeded sweep: random corpora, random time-ordered batch splits,
    random alpha — the cross-batch continuation always lands exactly on
    the sequential Python fold."""
    import random

    for seed in range(4):
        rng = random.Random(seed)
        rows = []
        ts = 0
        for _ in range(rng.randint(8, 40)):
            ts += rng.randint(1, 5)
            rows.append(
                (rng.randint(1, 4), ts, round(rng.uniform(0.0, 50.0), 3))
            )
        alpha = rng.choice([0.5, 0.25, 0.1])
        cuts = sorted(
            rng.sample(range(1, ts + 1), k=min(rng.randint(1, 3), ts))
        )
        bounds = [0, *cuts, ts + 1]
        t = ParquetTable(f"{workdir}/ewma_s{seed}")
        stage = ewma_stage(
            t, key="user_id", value="value", order=("ts",), alpha=alpha
        )
        bid = 0
        for lo, hi in zip(bounds, bounds[1:]):
            chunk = [r for r in rows if lo < r[1] <= hi or (lo == 0 and r[1] == 0)]
            if not chunk:
                continue
            stage(_events(spark, chunk), bid)
            bid += 1
        got = {r["key"]: r["ewma"] for r in current_ewma(spark, t).collect()}
        for uid in sorted({u for (u, _t, _v) in rows}):
            vals = [
                v for (u, t_, v) in sorted(rows, key=lambda r: r[1]) if u == uid
            ]
            assert got[uid] == _python_ewma(vals, alpha), (seed, uid)
