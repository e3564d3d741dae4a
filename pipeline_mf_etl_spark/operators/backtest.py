"""Per-series trade simulation (SURVEY.md §2.9 B6).

The reference's backtest engine (backtest/engine.py:106-292) is an
inherently sequential per-ticker event loop: a pending entry fills at
the NEXT bar's price, one position per series (no overlap), exits on a
fixed horizon with a last-bar END_OF_DATA fallback, MFE/MAE tracked
while holding, and symmetric two-sided costs.

Spark-first shape: the loop is unavoidable WITHIN a series, so it runs
as ``groupBy(series).applyInPandas`` — one Arrow batch per series,
NumPy arrays inside, parallel across series. At 100 TB the series count
is the scaling axis (millions of keys shuffle-partitioned once); the
per-series loop stays O(series length) and never touches the driver.

Simulation contract (deterministic, documented for the oracle/tests):
- bars are ordered by (ts, event_id); bar index i is 0-based.
- a signal at bar s (while flat) fills at bar e = s+1 at ``value[e]``;
  a signal on the last bar is dropped (no next open).
- exit fills at bar x = e + hold_bars (reason HORIZON); if that runs
  past the end, at the last bar (reason END_OF_DATA).
- the series is flat again ON the exit bar: a signal at bar >= x can
  start the next trade (entry at x+1). Signals while pending/holding
  are ignored.
- gross = side * (exit/entry - 1); net = gross - 2*(fee+slip)/1e4;
  MFE/MAE = max/min of side*(value/entry - 1) over bars e..x.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TRADE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("position_id", IntegerType(), False),
        StructField("side", IntegerType(), False),
        StructField("entry_event_id", LongType(), False),
        StructField("exit_event_id", LongType(), False),
        StructField("entry_value", DoubleType(), False),
        StructField("exit_value", DoubleType(), False),
        StructField("bars_held", IntegerType(), False),
        StructField("gross_return", DoubleType(), True),
        StructField("net_return", DoubleType(), True),
        StructField("mfe", DoubleType(), True),
        StructField("mae", DoubleType(), True),
        StructField("exit_reason", StringType(), False),
    ]
)


def simulate_trades(
    bars: DataFrame,
    hold_bars: int = 5,
    fee_bps: float = 5.0,
    slippage_bps: float = 5.0,
) -> DataFrame:
    """Run the next-open / non-overlapping trade simulation per series.

    ``bars`` needs columns: user_id, ts, event_id, value, signal (bool),
    side (int, +1/-1). Returns one row per closed trade (TRADE_SCHEMA).
    """
    cost = 2.0 * (fee_bps + slippage_bps) / 1e4

    def sim_series(uid, vals, sigs, sides, eids, out: list) -> None:
        n = len(vals)
        i = 0
        pos = 0
        while i < n - 1:  # a signal on the last bar has no next open
            if not sigs[i]:
                i += 1
                continue
            e = i + 1
            side = int(sides[i])
            entry = float(vals[e])
            x = e + hold_bars
            reason = "HORIZON"
            if x > n - 1:
                x = n - 1
                reason = "END_OF_DATA"
            exit_v = float(vals[x])
            window = vals[e : x + 1]
            exc = side * (window / entry - 1.0)
            gross = side * (exit_v / entry - 1.0) if entry != 0 else None
            pos += 1
            out.append(
                (
                    uid,
                    pos,
                    side,
                    int(eids[e]),
                    int(eids[x]),
                    entry,
                    exit_v,
                    int(x - e),
                    gross,
                    (gross - cost) if gross is not None else None,
                    float(exc.max()) if entry != 0 else None,
                    float(exc.min()) if entry != 0 else None,
                    reason,
                )
            )
            i = x  # flat again on the exit bar: its signal may re-enter

    def sim(batches):
        # one Arrow exchange per PARTITION, not per series: concat the
        # partition's batches, then run the per-series loop over NumPy
        # slices at group boundaries — building a pandas sub-frame per
        # series costs more than the whole sim loop when groups are many
        # and short (same many-small-groups optimization as
        # operators/ewm.py).
        import numpy as np

        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uids = pdf["user_id"].to_numpy()
        vals = pdf["value"].to_numpy(dtype=float)
        sigs = pdf["signal"].fillna(False).to_numpy(dtype=bool)
        sides = pdf["side"].to_numpy()
        eids = pdf["event_id"].to_numpy()
        cuts = np.flatnonzero(np.r_[True, uids[1:] != uids[:-1], True])
        out: list = []
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            sim_series(
                int(uids[lo]), vals[lo:hi], sigs[lo:hi], sides[lo:hi], eids[lo:hi], out
            )
        yield pd.DataFrame(out, columns=[f.name for f in TRADE_SCHEMA.fields])

    from pipeline_mf_etl_spark.functions.core import island_repartition

    return (
        island_repartition(bars, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(sim, TRADE_SCHEMA)
    )
