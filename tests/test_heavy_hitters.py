"""Streaming CMS heavy hitters: cross-batch grid merge equals the
one-shot batch sketch, estimates never undercount, replays are no-ops."""

from __future__ import annotations

from collections import Counter

from databricks_end_to_end_streaming_spark.operators.cms import cms_build
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.heavy_hitters import (
    estimate_heavy_hitters,
    heavy_hitters_stage,
    merged_grid,
)

# Three micro-batches of token occurrences with a clear global top-3
BATCHES = [
    ["spark"] * 12 + ["delta"] * 7 + ["kafka"] * 5 + ["a", "b", "c"],
    ["spark"] * 9 + ["delta"] * 8 + ["avro"] * 4 + ["d", "e"],
    ["spark"] * 6 + ["kafka"] * 9 + ["delta"] * 2 + ["f"],
]


def _items(spark, tokens):
    return spark.createDataFrame([(t,) for t in tokens], "item string")


def _run(spark, workdir, name):
    grid = ParquetTable(f"{workdir}/{name}_grid")
    cand = ParquetTable(f"{workdir}/{name}_cand")
    stage = heavy_hitters_stage(grid, cand, m_per_batch=4)
    for i, batch in enumerate(BATCHES):
        stage(_items(spark, batch), i)
    return grid, cand


def test_merged_grid_equals_batch_sketch(spark, workdir):
    grid, _cand = _run(spark, workdir, "merge")
    inc = {
        (r["row_id"], r["bucket"]): r["cnt"]
        for r in merged_grid(spark, grid).collect()
    }
    all_tokens = [t for b in BATCHES for t in b]
    batch = {
        (r["row_id"], r["bucket"]): r["cnt"]
        for r in cms_build(_items(spark, all_tokens)).collect()
    }
    assert inc == batch


def test_estimates_one_sided_and_topk_exact_here(spark, workdir):
    grid, cand = _run(spark, workdir, "est")
    top = estimate_heavy_hitters(spark, grid, cand, k=3).collect()
    true = Counter(t for b in BATCHES for t in b)
    # one-sided: CMS never undercounts
    for r in top:
        assert r["est_count"] >= true[r["item"]]
    # on this corpus the top-3 is unambiguous and every hot item makes
    # some batch's top-m, so the reported set is the exact top-3
    assert [r["item"] for r in top] == ["spark", "delta", "kafka"]
    assert top[0]["est_count"] >= 27  # spark appears 27 times


def test_replay_is_idempotent(spark, workdir):
    grid = ParquetTable(f"{workdir}/replay_grid")
    cand = ParquetTable(f"{workdir}/replay_cand")
    stage = heavy_hitters_stage(grid, cand, m_per_batch=4)
    stage(_items(spark, BATCHES[0]), 0)
    before = sorted(map(str, merged_grid(spark, grid).collect()))
    stage(_items(spark, BATCHES[0]), 0)  # foreachBatch replay, same id
    after = sorted(map(str, merged_grid(spark, grid).collect()))
    assert before == after
    n_cand = cand.read(spark).select("item").distinct().count()
    assert n_cand <= 4


def test_candidate_log_is_bounded_and_deterministic(spark, workdir):
    _grid, cand = _run(spark, workdir, "bound")
    rows = cand.read(spark).collect()
    per_batch = Counter(r["_batch_id"] for r in rows)
    assert all(v <= 4 for v in per_batch.values())
    # deterministic tie-break: re-running the same batches yields the
    # same candidate set
    _grid2, cand2 = _run(spark, workdir, "bound2")
    assert sorted((r["item"], r["_batch_id"]) for r in rows) == sorted(
        (r["item"], r["_batch_id"]) for r in cand2.read(spark).collect()
    )


def test_heavy_hitters_over_real_stream(spark, workdir):
    """Wired into an actual readStream -> foreachBatch -> availableNow
    query: two drains over a growing directory yield the same merged
    grid as one batch sketch over everything."""
    data_dir = f"{workdir}/hh_stream_src"
    grid = ParquetTable(f"{workdir}/hh_stream_grid")
    cand = ParquetTable(f"{workdir}/hh_stream_cand")

    def write(tokens):
        _items(spark, tokens).write.mode("append").parquet(data_dir)

    def drain():
        stream = spark.readStream.schema("item string").parquet(data_dir)
        q = (
            stream.writeStream.foreachBatch(
                heavy_hitters_stage(grid, cand, m_per_batch=4)
            )
            .option("checkpointLocation", f"{workdir}/ckpt_hh")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write(BATCHES[0])
    drain()
    write(BATCHES[1] + BATCHES[2])
    drain()

    inc = {
        (r["row_id"], r["bucket"]): r["cnt"]
        for r in merged_grid(spark, grid).collect()
    }
    all_tokens = [t for b in BATCHES for t in b]
    batch = {
        (r["row_id"], r["bucket"]): r["cnt"]
        for r in cms_build(_items(spark, all_tokens)).collect()
    }
    assert inc == batch
    top = estimate_heavy_hitters(spark, grid, cand, k=1).collect()
    assert top[0]["item"] == "spark"
