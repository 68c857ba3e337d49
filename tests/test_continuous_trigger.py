"""Processing-time-trigger soak: the always-on mode the reference's
design implies but never runs (it only uses Trigger.Once,
bronze.py:25; its jobs DAG re-launches the drain each time).

A bronze query runs with trigger(processingTime=...) while raw data
arrives in waves; the test asserts (1) multiple timed triggers commit,
(2) data landed BETWEEN triggers is picked up incrementally without a
restart, (3) the output matches the availableNow drain bit-for-bit
(same transform, same sink — only the trigger differs), and (4) no
row is duplicated across triggers (exactly-once within one run).
"""

from __future__ import annotations

from databricks_end_to_end_streaming_spark.registry import InMemorySchemaRegistry
from databricks_end_to_end_streaming_spark.schemas import (
    PRODUCT_V1_JSON,
    PRODUCT_V2_JSON,
)
from databricks_end_to_end_streaming_spark.sources import (
    events_to_wire,
    generate_events,
    write_topic_files,
)
from databricks_end_to_end_streaming_spark.streaming import (
    ParquetTable,
    ingest_avro_stream,
)
from databricks_end_to_end_streaming_spark.sources import file_stream
from databricks_end_to_end_streaming_spark.tables import load_table
from databricks_end_to_end_streaming_spark.streaming.medallion import (
    await_batches,
    bronze_transform,
    run_continuous,
)

REGISTRY = InMemorySchemaRegistry({1: PRODUCT_V1_JSON, 2: PRODUCT_V2_JSON})


def _safe_count(spark, table) -> int:
    """Poll-safe row count of a LIVE streaming sink directory: a plain
    batch read lists files directly (bypassing _spark_metadata), so an
    in-flight trigger's footerless file can crash the read — treat any
    read error as 'not there yet' and let the poll retry."""
    try:
        if not table.exists():
            return -1
        return table.read(spark).count()
    except Exception:
        return -1


def _ingest_wave(spark, workdir, events) -> None:
    """Land one wave of decoded rows in the raw table (availableNow
    ingest — the soak under test is the DOWNSTREAM bronze query).
    ``write_topic_files`` appends, so successive waves coexist."""
    write_topic_files(spark, events_to_wire(events), f"{workdir}/topic")
    ingest_avro_stream(
        file_stream(spark, f"{workdir}/topic"),
        REGISTRY,
        ParquetTable(f"{workdir}/raw"),
        checkpoint=f"{workdir}/cp/ingest",
    )


def test_processing_time_trigger_soaks_across_waves(spark, workdir):
    wave1 = generate_events(40, seed=21, v1_ratio=0.3)
    wave2 = generate_events(25, seed=22, v1_ratio=0.3)
    _ingest_wave(spark, workdir, wave1)

    raw = ParquetTable(f"{workdir}/raw")
    bronze = ParquetTable(f"{workdir}/bronze", partition_by=("type",))
    q = run_continuous(
        bronze_transform(raw.stream(spark)),
        bronze,
        checkpoint=f"{workdir}/cp/bronze",
        query_name="bronze_soak",
        processing_time="500 milliseconds",
    )
    try:
        # trigger 1 picks up wave 1
        b1, r1 = await_batches(q, min_batches=1, min_rows=len(wave1))
        assert r1 == len(wave1)

        # wave 2 lands while the query is RUNNING; a later timed
        # trigger must pick it up with no restart
        _ingest_wave(spark, workdir, wave2)
        b2, r2 = await_batches(
            q, min_batches=b1 + 1, min_rows=len(wave1) + len(wave2)
        )
        assert b2 >= 2  # distinct committed timed triggers
        assert r2 == len(wave1) + len(wave2)
        assert q.isActive and q.exception() is None
    finally:
        q.stop()
        q.awaitTermination()

    out = bronze.read(spark)
    # exactly-once across triggers: one flat row per raw event, none
    # duplicated by the recurring trigger
    assert out.count() == len(wave1) + len(wave2)
    assert (
        out.select("eventId", "timestamp").distinct().count()
        == out.count()
    )
    # parity with the availableNow drain: same rows, same schema
    from databricks_end_to_end_streaming_spark.streaming.medallion import (
        bronze_stage,
    )

    bronze_once = ParquetTable(f"{workdir}/bronze_once", partition_by=("type",))
    bronze_stage(spark, raw, bronze_once, f"{workdir}/cp/bronze_once")
    once = bronze_once.read(spark)
    assert once.schema == out.schema
    assert once.exceptAll(out).count() == 0 and out.exceptAll(once).count() == 0


def test_await_batches_times_out_with_diagnostics(spark, workdir):
    import pytest

    _ingest_wave(spark, workdir, generate_events(5, seed=3))
    raw = ParquetTable(f"{workdir}/raw")
    bronze = ParquetTable(f"{workdir}/bronze2")
    q = run_continuous(
        bronze_transform(raw.stream(spark)),
        bronze,
        checkpoint=f"{workdir}/cp/bronze2",
        query_name="bronze_soak_timeout",
        processing_time="100 milliseconds",
    )
    try:
        with pytest.raises(TimeoutError, match="bronze_soak_timeout"):
            # ask for more rows than exist: must time out, not hang
            await_batches(q, min_batches=1, min_rows=10_000, timeout_sec=3.0)
    finally:
        q.stop()
        q.awaitTermination()


def test_stateful_silver_dedup_under_timed_triggers(spark, workdir):
    """Stateful continuous mode: silver's dropDuplicates state must span
    TRIGGERS — a duplicate eventId arriving in a later wave (while the
    query keeps running) is dropped by the keyed state, not re-emitted.
    The availableNow drains can't show this cross-trigger state
    retention; only the always-on mode can."""
    from databricks_end_to_end_streaming_spark.streaming.medallion import (
        silver_transform,
    )

    wave1 = generate_events(30, seed=31, v1_ratio=0.3)
    # wave 2 = 10 fresh events + 10 exact replays of wave-1 events
    wave2 = generate_events(10, seed=32, v1_ratio=0.3) + [
        dict(e) for e in wave1[:10]
    ]
    _ingest_wave(spark, workdir, wave1)

    raw = ParquetTable(f"{workdir}/raw")
    silver = ParquetTable(f"{workdir}/silver")
    flat = raw.stream(spark).select("parsedValue.*")
    q = run_continuous(
        silver_transform(flat),
        silver,
        checkpoint=f"{workdir}/cp/silver",
        query_name="silver_soak",
        processing_time="500 milliseconds",
    )
    n1 = len({e["eventId"] for e in wave1})
    try:
        b1, _ = await_batches(q, min_batches=1, min_rows=len(wave1))
        _ingest_wave(spark, workdir, wave2)
        await_batches(
            q, min_batches=b1 + 1, min_rows=len(wave1) + len(wave2)
        )
    finally:
        q.stop()
        q.awaitTermination()

    out = silver.read(spark)
    n_unique = len(
        {e["eventId"] for e in wave1} | {e["eventId"] for e in wave2}
    )
    assert n_unique < len(wave1) + len(wave2)  # replays really planted
    # keyed state held across triggers: exactly one row per eventId,
    # and the wave-1 replays contributed nothing
    assert out.count() == n_unique
    assert out.select("eventId").distinct().count() == n_unique
    assert n_unique == n1 + 10


def test_always_on_medallion_cascades_and_matches_batch(spark, workdir):
    """Full always-on pipeline: bronze/silver/gold running CONCURRENTLY
    under timed triggers; a second wave (with planted duplicate
    eventIds) lands while all three run, cascades through, and the
    final three tables match the sequential availableNow run_pipeline
    bit-for-bit on the same raw data."""
    import time as _time

    from databricks_end_to_end_streaming_spark.streaming import run_pipeline
    from databricks_end_to_end_streaming_spark.streaming.medallion import (
        run_pipeline_continuous,
        stop_pipeline,
    )

    wave1 = generate_events(40, seed=41, v1_ratio=0.3)
    wave2 = generate_events(20, seed=42, v1_ratio=0.3) + [
        dict(e) for e in wave1[:8]  # cross-wave duplicates
    ]
    _ingest_wave(spark, workdir, wave1)
    raw = ParquetTable(f"{workdir}/raw")

    live = run_pipeline_continuous(
        spark, f"{workdir}/live", raw, cutoff="2024-01-01 00:00:00"
    )
    n_unique = len(
        {e["eventId"] for e in wave1} | {e["eventId"] for e in wave2}
    )
    try:
        _ingest_wave(spark, workdir, wave2)
        # cascade: wait until silver has deduped BOTH waves
        deadline = _time.monotonic() + 90
        silver = live["tables"]["silver"]
        while _time.monotonic() < deadline:
            if _safe_count(spark, silver) == n_unique:
                break
            _time.sleep(0.5)
        else:
            raise TimeoutError("silver never reached both waves")
        # gold has consumed every silver row once its cumulative input
        # reaches n_unique — THAT trigger's rewrite covers both waves
        # (not a fixed sleep: the rewrite competes with two other
        # streaming queries for slots)
        await_batches(
            live["queries"]["gold"], 1, min_rows=n_unique, timeout_sec=90
        )
    finally:
        stop_pipeline(live["queries"])

    ref = run_pipeline(
        spark, f"{workdir}/ref", raw, cutoff="2024-01-01 00:00:00"
    )
    for name in ("bronze", "silver", "gold"):
        got = live["tables"][name].read(spark)
        want = ref[name].read(spark)
        assert got.count() == want.count(), name
        assert got.exceptAll(want).count() == 0, name
        assert want.exceptAll(got).count() == 0, name


def test_always_on_ingest_demux(spark, workdir):
    """Continuous ingestion: the demux runs under a processing-time
    trigger while wire data lands in waves; every wave is decoded and
    appended exactly once, and the result matches the availableNow
    drain of the same topic bit-for-bit."""
    from databricks_end_to_end_streaming_spark.streaming.ingest import (
        ingest_avro_stream,
        ingest_avro_stream_continuous,
    )

    wave1 = generate_events(25, seed=51, v1_ratio=0.4)
    wave2 = generate_events(15, seed=52, v1_ratio=0.4)
    write_topic_files(spark, events_to_wire(wave1), f"{workdir}/topic")

    raw = ParquetTable(f"{workdir}/raw_cont")
    q = ingest_avro_stream_continuous(
        file_stream(spark, f"{workdir}/topic"),
        REGISTRY,
        raw,
        checkpoint=f"{workdir}/cp/cont",
        processing_time="500 milliseconds",
    )
    try:
        b1, r1 = await_batches(q, min_batches=1, min_rows=len(wave1))
        assert r1 == len(wave1)
        write_topic_files(spark, events_to_wire(wave2), f"{workdir}/topic")
        await_batches(
            q, min_batches=b1 + 1, min_rows=len(wave1) + len(wave2)
        )
    finally:
        q.stop()
        q.awaitTermination()

    got = raw.read(spark)
    assert got.count() == len(wave1) + len(wave2)

    # parity with the drain mode on the same topic
    raw_once = ParquetTable(f"{workdir}/raw_once")
    ingest_avro_stream(
        file_stream(spark, f"{workdir}/topic"),
        REGISTRY,
        raw_once,
        checkpoint=f"{workdir}/cp/once",
    )
    want = raw_once.read(spark)
    flat = lambda df: df.select("parsedValue.*")  # noqa: E731
    assert flat(got).exceptAll(flat(want)).count() == 0
    assert flat(want).exceptAll(flat(got)).count() == 0


def test_always_on_pipeline_resumes_from_checkpoints(spark, workdir):
    """Stop the whole continuous pipeline, land a new wave while it is
    DOWN, restart from the same checkpoints: the wave is picked up
    exactly once (no replays of waves processed before the stop), and
    silver still holds one row per eventId across the outage."""
    from databricks_end_to_end_streaming_spark.streaming.medallion import (
        run_pipeline_continuous,
        stop_pipeline,
    )

    wave1 = generate_events(30, seed=61, v1_ratio=0.3)
    wave2 = generate_events(15, seed=62, v1_ratio=0.3)
    _ingest_wave(spark, workdir, wave1)
    raw = ParquetTable(f"{workdir}/raw")

    live = run_pipeline_continuous(spark, f"{workdir}/live", raw)
    try:
        silver = live["tables"]["silver"]
        deadline = __import__("time").monotonic() + 60
        n1 = len({e["eventId"] for e in wave1})
        while __import__("time").monotonic() < deadline:
            if _safe_count(spark, silver) == n1:
                break
            __import__("time").sleep(0.5)
        else:
            raise TimeoutError("silver never saw wave 1")
    finally:
        stop_pipeline(live["queries"])

    # outage: wave 2 lands while nothing is running
    _ingest_wave(spark, workdir, wave2)

    live2 = run_pipeline_continuous(spark, f"{workdir}/live", raw)
    try:
        silver = live2["tables"]["silver"]
        n_all = len(
            {e["eventId"] for e in wave1} | {e["eventId"] for e in wave2}
        )
        deadline = __import__("time").monotonic() + 60
        while __import__("time").monotonic() < deadline:
            if _safe_count(spark, silver) == n_all:
                break
            __import__("time").sleep(0.5)
        else:
            raise TimeoutError(
                f"silver={_safe_count(spark, silver)} want={n_all}"
            )
        # exactly-once across the restart: no duplicated eventIds, and
        # bronze holds exactly one flat row per raw event
        assert (
            silver.read(spark).select("eventId").distinct().count() == n_all
        )
        bronze = live2["tables"]["bronze"]
        assert bronze.read(spark).count() == len(wave1) + len(wave2)
    finally:
        stop_pipeline(live2["queries"])


def test_pipeline_progress_log_option(spark, workdir):
    """progress_log=True attaches the query-health sidecar: after a
    cascade, the listener holds per-batch rows for all three stages,
    and stop_pipeline detaches it when given the full result."""
    from databricks_end_to_end_streaming_spark.streaming.medallion import (
        run_pipeline_continuous,
        stop_pipeline,
    )

    wave = generate_events(25, seed=71, v1_ratio=0.3)
    _ingest_wave(spark, workdir, wave)
    raw = ParquetTable(f"{workdir}/raw")
    live = run_pipeline_continuous(
        spark, f"{workdir}/live", raw, progress_log=True
    )
    try:
        await_batches(
            live["queries"]["gold"], 1, min_rows=1, timeout_sec=60
        )
        import time as _time

        deadline = _time.monotonic() + 15
        while _time.monotonic() < deadline:
            names = {r[0] for r in live["listener"].snapshot()}
            if {
                "bronze_continuous",
                "silver_continuous",
                "gold_continuous",
            } <= names:
                break
            _time.sleep(0.2)
        assert {
            "bronze_continuous",
            "silver_continuous",
            "gold_continuous",
        } <= names
    finally:
        stop_pipeline(live)  # full-result form: also detaches listener
    # detached: a fresh query afterwards must add NOTHING to the buffer
    n_before = len(live["listener"].snapshot())
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    (
        spark.readStream.schema(ev.schema)
        .parquet(f"{workdir}/raw")  # any existing stream source
        .writeStream.format("noop")
        .option("checkpointLocation", f"{workdir}/cp/after")
        .queryName("after_detach")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    import time as _time

    _time.sleep(2)  # listener bus drain window
    assert len(live["listener"].snapshot()) == n_before


def test_watermarked_silver_continuous_bounds_state(spark, workdir):
    """The scale-path silver variant under timed triggers:
    dropDuplicatesWithinWatermark keeps the cross-trigger dedup
    guarantee for in-horizon replays while the watermark BOUNDS the
    keyed state (parity-mode state grows forever — T2)."""
    from databricks_end_to_end_streaming_spark.streaming.medallion import (
        silver_transform,
    )

    wave1 = generate_events(30, seed=81, v1_ratio=0.3)
    wave2 = generate_events(10, seed=82, v1_ratio=0.3) + [
        dict(e) for e in wave1[:6]  # in-horizon replays
    ]
    _ingest_wave(spark, workdir, wave1)
    raw = ParquetTable(f"{workdir}/raw")
    silver = ParquetTable(f"{workdir}/silver_wm")
    q = run_continuous(
        silver_transform(
            raw.stream(spark).select("parsedValue.*"), watermark="1 day"
        ),
        silver,
        checkpoint=f"{workdir}/cp/silver_wm",
        query_name="silver_wm_soak",
    )
    n_unique = len(
        {e["eventId"] for e in wave1} | {e["eventId"] for e in wave2}
    )
    try:
        b1, _ = await_batches(q, min_batches=1, min_rows=len(wave1))
        _ingest_wave(spark, workdir, wave2)
        await_batches(
            q, min_batches=b1 + 1, min_rows=len(wave1) + len(wave2)
        )
        # watermarked dedup keeps bounded state: the progress ledger
        # exposes state rows; they track unique keys in horizon, not
        # total input
        import json as _json

        state_rows = max(
            sum(
                s.get("numRowsTotal", 0)
                for s in _json.loads(p.json).get("stateOperators", [])
            )
            for p in q.recentProgress
        )
        assert 0 < state_rows <= n_unique + 5
    finally:
        q.stop()
        q.awaitTermination()
    out = silver.read(spark)
    assert out.count() == n_unique  # in-horizon replays dropped
    assert out.select("eventId").distinct().count() == n_unique
