"""Exponentially-weighted (Wilder) smoothing — the one window primitive
with no native Spark expression (SURVEY.md §2.6 W3).

Reference semantics (silver/indicators_twiggs.py:41-44,139-146):
``ewm_mean(alpha=1/n, adjust=False, min_samples=n)`` — the recursion
``y_t = (1-a)·y_{t-1} + a·x_t`` seeded with ``y_1 = x_1``, NULL until the
series holds n observations.

Implemented as ``groupBy(series).applyInPandas`` with pandas'
``Series.ewm`` (Arrow-batched, one partition per series group, Spark
parallelizes across series). The recursion is inherently sequential
within a series but embarrassingly parallel across them, which is the
only axis that matters at 100 TB: series count scales, series length
doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from pipeline_mf_etl_spark.functions.core import island_repartition


def ewm_smooth(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    value_col: str,
    n: int,
    out_col: str,
) -> DataFrame:
    """Append Wilder-smoothed ``out_col`` = EWM(alpha=1/n, adjust=False,
    min_periods=n) of ``value_col`` per series.

    Warm-up rows (fewer than n observations) come back as NULL, matching
    Polars ``min_samples`` (reference silver/indicators_twiggs.py:41-44).

    Physical shape: hash-repartition by series key, sort within each
    partition, then ONE ``mapInPandas`` call per partition that runs
    pandas ``GroupBy.ewm`` over all series it holds. With millions of
    short series, per-group ``applyInPandas`` pays one Arrow exchange
    per series; this form pays one per partition (~3x faster here).
    """
    # build a fresh StructType — StructType.add mutates in place, which
    # would corrupt df's cached schema.
    schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType(), True)])
    alpha = 1.0 / n

    def smooth(batches):
        import pandas as pd

        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        # group-contiguous, time-ordered layout; groupby(sort=True) walks
        # keys in the same ascending order, so the flattened result is
        # row-aligned with pdf.
        pdf = pdf.sort_values(series_cols + order_cols, kind="mergesort").reset_index(drop=True)
        pdf[out_col] = (
            pdf.groupby(series_cols, sort=True)[value_col]
            .ewm(alpha=alpha, adjust=False, min_periods=n)
            .mean()
            .to_numpy()
        )
        yield pdf

    out = island_repartition(df, *series_cols).sortWithinPartitions(
        *series_cols, *order_cols
    ).mapInPandas(smooth, schema)
    # pandas NaN round-trips as Double.NaN, not SQL NULL — normalize so
    # downstream null-guards (and the DuckDB oracle) agree.
    return out.withColumn(out_col, F.when(~F.isnan(out_col), F.col(out_col)))


def ewm_smooth_many(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    cols: dict[str, str],
    n: int,
) -> DataFrame:
    """Append one Wilder-smoothed column per ``cols`` entry
    (``out_col -> value_col``) in a SINGLE mapInPandas pass.

    The viewer indicator panel needs four RMAs over the same series
    (TMF/TTI numerators and denominators, reference overlay_viewer/
    indicators_twiggs.py:55-64); smoothing them one at a time would pay
    one shuffle + Arrow exchange per column. This pays exactly one of
    each regardless of column count — same per-partition island shape as
    :func:`ewm_smooth`.
    """
    schema = StructType(
        list(df.schema.fields)
        + [StructField(out, DoubleType(), True) for out in cols]
    )
    alpha = 1.0 / n

    def smooth(batches):
        import pandas as pd

        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(series_cols + order_cols, kind="mergesort").reset_index(drop=True)
        grouped = pdf.groupby(series_cols, sort=True)
        for out, val in cols.items():
            pdf[out] = (
                grouped[val].ewm(alpha=alpha, adjust=False, min_periods=n).mean().to_numpy()
            )
        yield pdf

    out = island_repartition(df, *series_cols).sortWithinPartitions(
        *series_cols, *order_cols
    ).mapInPandas(smooth, schema)
    for col in cols:
        out = out.withColumn(col, F.when(~F.isnan(col), F.col(col)))
    return out
