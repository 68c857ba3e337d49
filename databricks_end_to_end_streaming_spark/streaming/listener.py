"""Always-on pipeline observability: a StreamingQueryListener that
records every micro-batch's progress — the ops sidecar the continuous
mode (``medallion.run_pipeline_continuous``) needs that the
drain-and-exit mode never did.

``observe.py`` covers DATA-quality counters riding the moving plan;
this covers the QUERY-health signals next to them: rows/s, batch
durations, state size, watermark — the numbers an operator alarms on
(falling processedRowsPerSecond, growing stateOperators rows, a stuck
watermark). Spark already emits all of it in each progress event; the
listener just makes it a queryable relation instead of a transient
object on the driver.

Driver-side by design: progress events are driver objects (a few per
second at most), so buffering them in memory and flushing on demand
costs nothing at any data scale — the FLUSH is the only Spark job.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

from .sinks import ParquetTable

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("query_name", T.StringType()),
        T.StructField("query_id", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("batch_ts", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_sec", T.DoubleType()),
        T.StructField("processed_rows_per_sec", T.DoubleType()),
        T.StructField("trigger_duration_ms", T.LongType()),
        T.StructField("state_rows_total", T.LongType()),
        T.StructField("watermark", T.StringType()),
    ]
)


class ProgressLogListener(StreamingQueryListener):
    """Buffers one row per committed micro-batch across EVERY query on
    the session (filter by ``query_name`` when reading). Thread-safe:
    Spark delivers listener events on its own bus thread.

    BOUNDED: the buffer keeps the newest ``max_rows`` events
    (drop-oldest) — an always-on pipeline at 500 ms triggers emits
    ~500k events/day, and a listener nobody flushes must not grow the
    driver heap forever. Flush periodically to a metrics table to keep
    full history; the default cap holds roughly a day of three-stage
    500 ms progress either way."""

    def __init__(self, max_rows: int = 500_000) -> None:
        from collections import deque

        self._lock = threading.Lock()
        self._rows: "deque[tuple]" = deque(maxlen=max_rows)

    # -- StreamingQueryListener interface (events we don't record are
    # required abstract methods on the Python listener) --------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        # normalize through the JSON form: one stable dict shape across
        # Spark's connect/classic progress objects
        d = json.loads(p.json) if hasattr(p, "json") else dict(p)
        state = d.get("stateOperators") or []
        row = (
            d.get("name"),
            str(d.get("id")),
            int(d.get("batchId", -1)),
            d.get("timestamp"),
            int(d.get("numInputRows", 0) or 0),
            float(d.get("inputRowsPerSecond", 0.0) or 0.0),
            float(d.get("processedRowsPerSecond", 0.0) or 0.0),
            int((d.get("durationMs") or {}).get("triggerExecution", 0) or 0),
            int(sum(s.get("numRowsTotal", 0) or 0 for s in state)),
            (d.get("eventTime") or {}).get("watermark"),
        )
        with self._lock:
            self._rows.append(row)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- read side ----------------------------------------------------
    def snapshot(self) -> list[tuple]:
        with self._lock:
            return list(self._rows)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The buffered progress as a relation (empty-safe)."""
        return spark.createDataFrame(self.snapshot(), PROGRESS_SCHEMA)

    def flush(self, spark: SparkSession, table: ParquetTable) -> int:
        """Append everything buffered since the last flush to ``table``
        and clear the buffer; returns rows flushed. Idempotence is the
        caller's cadence concern (metrics sidecar, not a ledger) —
        flush once per inspection interval."""
        with self._lock:
            rows = list(self._rows)
            self._rows.clear()
        if rows:
            table.append(spark.createDataFrame(rows, PROGRESS_SCHEMA))
        return len(rows)


def attach_progress_log(spark: SparkSession) -> ProgressLogListener:
    """Register a fresh listener on the session and return it (caller
    detaches with ``spark.streams.removeListener``)."""
    listener = ProgressLogListener()
    spark.streams.addListener(listener)
    return listener
