"""Per-series window operator library (SURVEY.md §2.6 W1-W17).

The reference runs every sequential computation as a per-ticker Python
loop over one file per symbol; here each is a single window expression
over one partitioned DataFrame — `Window.partitionBy(series_key)
.orderBy(time_key, tiebreak)` — so Spark parallelizes across series and
AQE handles skewed keys. No Python in the hot path.

Key semantic carried over from the reference (Polars `min_samples`):
rolling statistics are NULL until the window holds n observations —
reproduced with an explicit count guard (reference:
silver/features_base.py:172-198).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def series_window(series_col: str = "user_id", *order_cols: str) -> WindowSpec:
    """Base ordered window for one series: partition by series key, order
    by event time with a deterministic tiebreak."""
    order = list(order_cols) or ["ts", "event_id"]
    return Window.partitionBy(series_col).orderBy(*order)


def rolling(agg: Column, w: WindowSpec, n: int) -> WindowSpec | Column:
    """Aggregate over the trailing n rows (current row inclusive)."""
    return agg.over(w.rowsBetween(-(n - 1), 0))


def rolling_min_samples(agg: Column, count_col: Column, w: WindowSpec, n: int) -> Column:
    """Rolling aggregate NULLed until the window holds >= n non-null
    observations (Polars ``min_samples`` semantics)."""
    frame = w.rowsBetween(-(n - 1), 0)
    return F.when(F.count(count_col).over(frame) >= n, agg.over(frame))


def bars_since(flag: Column, w: WindowSpec) -> Column:
    """Rows since the last row where ``flag`` was true (0 on the event row
    itself, NULL before the first event).

    Reference: gold/event_grammar_v1.py:32-46 — forward-fill of the last
    event row-index then subtract; here `last(when(flag, rn), ignorenulls)`.
    """
    rn = F.row_number().over(w)
    last_idx = F.last(F.when(flag, rn), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return rn - last_idx


def run_group(state: Column, w: WindowSpec) -> Column:
    """Monotone group id incremented whenever ``state`` changes within the
    series (run-length-encoding groups; reference gold/features_v1.py:290-313)."""
    changed = (
        (F.lag(state).over(w).isNull()) | (state != F.lag(state).over(w))
    ).cast("int")
    return F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0))


def dedupe_keep_first(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Deterministic keep-first dedupe via row_number over a total order
    (reference backtest/adapters.py:178-180 sort+unique keep-first)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_group(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Latest row per group: row_number over descending order == 1
    (reference bronze/symbol_master.py:130-169 max-by-ts Python loop)."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
