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


# ---------------------------------------------------------------------------
# Online sequence packing: the streaming twin of operators/packing.py —
# documents arrive on the ingest stream, each is assigned its
# (bucket, seq_id) context IMMEDIATELY (training shards are written as
# the stream flows; assignments cannot be revised), and the per-bucket
# packing cursor (current sequence, current fill) lives in the state
# store across micro-batches.
# ---------------------------------------------------------------------------
PACK_STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType(), True),
        StructField("fill", LongType(), True),
    ]
)

PACK_OUTPUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType(), True),
        StructField("doc_id", LongType(), True),
        StructField("n_tokens", LongType(), True),
        StructField("seq_id", LongType(), True),
    ]
)


def streaming_pack_next_fit(docs: DataFrame, budget: int) -> DataFrame:
    """Online next-fit packing over a (bucket, doc_id, n_tokens) stream.

    Same recurrence as the batch operator (a doc opens a new sequence
    iff the bucket has prior docs and fill + n_tokens > budget; an
    oversize doc therefore sits alone), with the cursor state persisted
    per bucket. Docs are ordered by doc_id WITHIN a micro-batch (the
    only window where online packing may still reorder); across batches
    the arrival order is the packing order — that is the online
    semantics, and exactly why seq_ids are monotone per bucket. When
    the whole corpus arrives in one batch in doc_id order the output is
    bit-identical to ``operators.packing.pack_next_fit`` (asserted in
    tests/test_streaming.py)."""
    import numpy as np

    def update(key, batches, state: GroupState):
        seq, fill = state.get if state.exists else (0, 0)
        out_ids, out_toks, out_seqs = [], [], []
        # One micro-batch can arrive as SEVERAL Arrow chunks (any bucket
        # larger than arrow.maxRecordsPerBatch) — concatenate before the
        # single sort, otherwise each chunk sorts independently and a low
        # doc_id in a later chunk breaks the documented doc_id order
        # (and with it the bit-identity to the batch operator).
        chunks = [pdf for pdf in batches if not pdf.empty]
        whole = (
            pd.concat(chunks, ignore_index=True).sort_values("doc_id")
            if chunks
            else None
        )
        for pdf in ([whole] if whole is not None else []):
            for doc_id, t in zip(
                pdf["doc_id"].to_numpy(np.int64), pdf["n_tokens"].to_numpy(np.int64)
            ):
                if seq == 0:  # first doc this bucket has ever seen
                    seq, fill = 1, 0
                elif fill + t > budget:
                    seq, fill = seq + 1, 0
                fill += int(t)
                out_ids.append(int(doc_id))
                out_toks.append(int(t))
                out_seqs.append(seq)
        state.update((seq, fill))
        yield pd.DataFrame(
            {
                "bucket": key[0],
                "doc_id": out_ids,
                "n_tokens": out_toks,
                "seq_id": out_seqs,
            }
        )

    return docs.select("bucket", "doc_id", "n_tokens").groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState variant — the CURRENT stateful API (Spark 4.x):
# typed value state managed by a StatefulProcessor instead of the
# single opaque tuple applyInPandasWithState exposes. Requires the
# RocksDB state-store provider (set by running_user_stats_tws below);
# the semantics are identical to running_user_stats, so the same batch
# groupBy certifies both paths.
# ---------------------------------------------------------------------------
def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) via transformWithStateInPandas
    — emits updated totals per key per micro-batch (update mode).

    ENVIRONMENT GATE: Spark's TransformWithStateInPySpark driver worker
    speaks protobuf to the JVM, so ``google.protobuf`` must be
    importable (it is not in this sandbox — the query would crash the
    streaming runner at init). Probe it up front and fail loudly with
    the reason instead of a mid-query worker crash;
    ``running_user_stats`` (applyInPandasWithState) is the
    dependency-free path with identical semantics."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf Python package "
            "for Spark's streaming runner; install protobuf in production "
            "images or use running_user_stats (applyInPandasWithState), "
            "which has identical semantics"
        ) from exc
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total, mx = (
                tuple(self._state.get()) if self._state.exists() else (0, 0.0, None)
            )
            for pdf in rows:
                vals = pdf["value"].dropna()
                if len(vals):
                    n += int(len(vals))
                    total += float(vals.sum())
                    m = float(vals.max())
                    mx = m if mx is None else max(mx, m)
            self._state.update((n, total, mx))
            yield pd.DataFrame(
                [(key[0], n, round(total, 6), mx)],
                columns=["user_id", "n_events", "sum_value", "max_value"],
            )

        def close(self) -> None:
            pass

    sp = events.sparkSession
    # transformWithState requires the RocksDB provider; flip it for the
    # session (local[32] bundles RocksDB; on a cluster this is the
    # provider you want anyway — disk-backed state, bounded executor heap)
    sp.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
