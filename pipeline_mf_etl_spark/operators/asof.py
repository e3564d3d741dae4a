"""Sort-based as-of join — a time-series primitive the reference lacks
(SURVEY.md §2.4 notes all reference joins are equi-joins) but any
at-scale market-data or training-data pipeline needs: attach to each
left row the most recent right-side value at-or-before its timestamp.

Physical shape: union both sides, ONE hash shuffle on the series key,
sort within partitions, forward-fill the latest right ROW (one struct
per right row) with ``last(ignorenulls)`` over an unbounded-preceding
window, keep left rows. Linear in rows, no range self-join (a naive
``l.ts >= r.ts`` theta-join is quadratic per key and unusable at
100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: for every left row, the latest right ``value_cols``
    with ``right.time <= left.time`` within the same key group.

    Right rows sort BEFORE left rows at equal timestamps, so an exact
    timestamp match is included (ASOF ``>=`` semantics). Ties among
    right rows at the same timestamp must be resolved by the caller
    (dedupe keep-one) — forward-fill takes the last in sort order.
    """
    lhs = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.withColumn("__side", F.lit(0))
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lhs.unionByName(rhs.select(lhs.columns))

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(time_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Forward-fill ONE struct per right row, not each value column
    # independently: the struct is non-null for every right row even when
    # its fields are NULL, so the matched row's NULLs are carried as-is
    # (pandas merge_asof / DuckDB ASOF JOIN semantics) and all value
    # columns always come from the SAME matched right row.
    row_struct = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in value_cols])
    )
    matched = F.last(row_struct, ignorenulls=True).over(w)
    keep = [c for c in left.columns]
    u = u.select(*keep, F.col("__side"), matched.alias("__match"))
    filled: list[Column] = [
        F.col("__match").getField(c).alias(c) for c in value_cols
    ]
    return (
        u.select(*keep, F.col("__side"), *filled)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
