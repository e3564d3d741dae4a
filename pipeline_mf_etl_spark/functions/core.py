"""Core scalar helpers shared across every layer.

These re-express the reference's most repeated scalar patterns as Spark
column expressions (SURVEY.md §2.10):

- epsilon-guarded safe division (reference: silver/features_base.py:54-57,
  silver/indicators_twiggs.py:35-38, gold/features_v1.py:41-42)
- finite-only normalization (reference: research/forward_labels.py:23-38,
  validation/dataset_adapters.py:111-128)
- typed-null column defaults + pinned column order
  (reference: silver/features_base.py:60-98)
- horizontal (row-wise) aggregates (reference: validate/rules.py:191-193)

Everything here is a pure Column expression — JVM-side, codegen-friendly,
no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def safe_div(num: Column, den: Column, eps: float = 1e-12) -> Column:
    """num/den guarded by |den| > eps, else NULL."""
    return F.when(F.abs(den) > F.lit(eps), num / den).otherwise(F.lit(None))


def finite(col: Column) -> Column:
    """Pass through only finite values; NaN/±inf → NULL.

    Every statistical aggregate in the engine runs over ``finite(col)``
    ("finite-only aggregation" invariant).
    """
    c = col.cast("double")
    return F.when(
        (~F.isnan(c)) & (c != F.lit(float("inf"))) & (c != F.lit(float("-inf"))),
        c,
    )


def clip(col: Column, lo: float, hi: float) -> Column:
    """Clamp into [lo, hi] (reference z-clip ±8.0, research/preprocess.py:321)."""
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))


def sum_horizontal(cols: Iterable[Column]) -> Column:
    """Row-wise sum; boolean columns are cast to int first."""
    out = None
    for c in cols:
        c = c.cast("int")
        out = c if out is None else out + c
    if out is None:
        return F.lit(0)
    return out


def any_horizontal(cols: Iterable[Column]) -> Column:
    out = None
    for c in cols:
        out = c if out is None else out | c
    return F.coalesce(out, F.lit(False)) if out is not None else F.lit(False)


def all_horizontal(cols: Iterable[Column]) -> Column:
    out = None
    for c in cols:
        out = c if out is None else out & c
    return F.coalesce(out, F.lit(False)) if out is not None else F.lit(True)


def hit_rate(col: Column) -> Column:
    """Share of positive values among non-null values (A3)."""
    return F.avg((col > 0).cast("double"))


def ensure_columns(df: DataFrame, schema: T.StructType | dict[str, T.DataType]) -> DataFrame:
    """Add any missing columns as typed NULLs (defensive prelude before a
    transform whose inputs may vary across sources)."""
    if isinstance(schema, T.StructType):
        items = [(f.name, f.dataType) for f in schema.fields]
    else:
        items = list(schema.items())
    existing = set(df.columns)
    to_add = {name: F.lit(None).cast(dtype) for name, dtype in items if name not in existing}
    if to_add:
        df = df.withColumns(to_add)
    return df
