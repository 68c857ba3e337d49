"""Typed keyed state with Spark 4's transformWithStateInPandas.

The modern replacement for applyInPandasWithState (stateful.py keeps the
older API for comparison): state is declared as typed handles
(ValueState/ListState/MapState) managed by the RocksDB state store
(required by this API — session.py already selects it), and the
processor is an explicit lifecycle object instead of a bare function.

Operator: per-productId lifetime stats — running event count, last event
epoch, and a per-type count map — emitted each micro-batch for keys seen
in that batch.

Availability: the transformWithState protocol needs the `protobuf`
package on driver and executors; this container doesn't ship it, so the
test suite skips unless `transform_with_state_available()` — the
applyInPandasWithState twin (stateful.py) covers keyed state in-env.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

def transform_with_state_available() -> bool:
    """True iff the protobuf dependency of the transformWithState
    protocol is importable (required on driver and executors)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


OUTPUT_SCHEMA = StructType(
    [
        StructField("productId", StringType()),
        StructField("n_events", LongType()),
        StructField("last_epoch", LongType()),
        StructField("n_types", LongType()),
    ]
)

_COUNT_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_epoch", LongType()),
    ]
)
_TYPE_KEY_SCHEMA = StructType([StructField("type", StringType())])
_TYPE_COUNT_SCHEMA = StructType([StructField("n", LongType())])


class ProductStatsProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _COUNT_SCHEMA)
        self._type_counts = handle.getMapState(
            "type_counts", _TYPE_KEY_SCHEMA, _TYPE_COUNT_SCHEMA
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        (product_id,) = key
        n_events, last_epoch = (
            self._totals.get() if self._totals.exists() else (0, 0)
        )
        for pdf in rows:
            n_events += len(pdf)
            if len(pdf):
                last_epoch = max(last_epoch, int(pdf["timestamp"].max()))
                for t, n in pdf["type"].value_counts().items():
                    prev = (
                        self._type_counts.getValue((t,))[0]
                        if self._type_counts.containsKey((t,))
                        else 0
                    )
                    self._type_counts.updateValue((t,), (prev + int(n),))
        self._totals.update((n_events, last_epoch))
        n_types = sum(1 for _ in self._type_counts.keys())
        yield pd.DataFrame(
            [
                {
                    "productId": product_id,
                    "n_events": n_events,
                    "last_epoch": last_epoch,
                    "n_types": n_types,
                }
            ]
        )

    def close(self) -> None:
        pass


def product_stats_tws(events: DataFrame) -> DataFrame:
    """events (productId, type, timestamp-long) -> lifetime per-product
    stats via transformWithStateInPandas."""
    return (
        events.select("productId", "type", "timestamp")
        .groupBy("productId")
        .transformWithStateInPandas(
            statefulProcessor=ProductStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
