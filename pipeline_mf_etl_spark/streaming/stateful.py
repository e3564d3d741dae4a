"""Custom stateful streaming operator (SURVEY.md §2.11).

The reference has no online operators — its flow-state tracking is a
batch recomputation. This is the streaming-native version: per-series
running aggregates kept in Spark state store via
``applyInPandasWithState``, updated incrementally as micro-batches
arrive. The same semantics in batch mode are a plain groupBy — which is
exactly what the equivalence test asserts.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), True),
        StructField("sum_value", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("sum_value", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
    ]
)


def _update(key, batches, state: GroupState):
    n, total, mx = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        vals = pdf["value"].dropna()
        if len(vals):
            n += int(len(vals))
            total += float(vals.sum())
            m = float(vals.max())
            mx = m if mx is None else max(mx, m)
    state.update((n, total, mx))
    yield pd.DataFrame(
        [(key[0], n, round(total, 6), mx)],
        columns=["user_id", "n_events", "sum_value", "max_value"],
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) maintained in the state store —
    emits the updated totals every micro-batch. Works only on streaming
    DataFrames; the batch twin is ``groupBy(user_id).agg(...)``."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
