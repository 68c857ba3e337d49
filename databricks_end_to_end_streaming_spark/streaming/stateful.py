"""Custom stateful streaming operators (beyond the reference surface).

The reference's only stateful ops are dropDuplicates and the complete-mode
aggregation (SURVEY A1/A2). Real deployments of such a pipeline need
arbitrary keyed state; this module implements the canonical example with
``applyInPandasWithState`` (Arrow-batched per-group state, public Spark
API):

* running_product_stats: per-productId running event count, last event
  time, and per-type breakdown, emitted every trigger (update semantics)
  and carried across triggers/restarts in the state store.

Scale: state is keyed by the grouping column, lives in the RocksDB state
store (session.py), and each micro-batch touches only groups present in
the batch. A GroupStateTimeout can bound state for abandoned keys.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATS_OUTPUT_SCHEMA = StructType(
    [
        StructField("productId", StringType()),
        StructField("n_events", LongType()),
        StructField("last_event_time", TimestampType()),
        StructField("type_counts_json", StringType()),
    ]
)

STATS_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_epoch", LongType()),
        StructField("type_counts_json", StringType()),
    ]
)


def _update_product_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State update function: fold this batch's rows for one productId
    into (count, last_ts, per-type counts)."""
    (product_id,) = key
    if state.exists:
        n_events, last_epoch, counts_json = state.get
        counts = json.loads(counts_json)
    else:
        n_events, last_epoch, counts = 0, 0, {}
    for pdf in pdfs:
        n_events += len(pdf)
        if len(pdf):
            batch_max = int(pdf["timestamp"].max())
            last_epoch = max(last_epoch, batch_max)
            for t, n in pdf["type"].value_counts().items():
                counts[t] = counts.get(t, 0) + int(n)
    state.update((n_events, last_epoch, json.dumps(counts, sort_keys=True)))
    yield pd.DataFrame(
        [
            {
                "productId": product_id,
                "n_events": n_events,
                "last_event_time": pd.Timestamp(last_epoch, unit="s"),
                "type_counts_json": json.dumps(counts, sort_keys=True),
            }
        ]
    )


def running_product_stats(events: DataFrame) -> DataFrame:
    """events (productId, type, timestamp-long, ...) -> running stats per
    productId, updated each micro-batch."""
    return (
        events.select("productId", "type", "timestamp")
        .groupBy("productId")
        .applyInPandasWithState(
            _update_product_stats,
            outputStructType=STATS_OUTPUT_SCHEMA,
            stateStructType=STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
