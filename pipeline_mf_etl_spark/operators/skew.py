"""Skew-mitigation operators.

AQE splits skewed SHUFFLE partitions, but a groupBy on a handful of hot
keys (5 event types over billions of rows) still funnels each key
through one reducer for the final merge. Salted two-stage aggregation
bounds reducer fan-in explicitly: partial-aggregate on (key, salt) —
map-side combine over many reducers — then merge the algebraic partials
per key. Correct for any algebraic aggregate (sum, count, min, max;
avg = merged sum / merged count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# measure kinds: partial expression builder, merge expression builder
_PARTIAL = {
    "sum": lambda c: F.sum(c),
    "count": lambda c: F.count(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, Column]],
    salt: Column,
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``measures`` maps output column name -> (kind, column) with kind in
    {sum, count, min, max, avg}. ``salt`` is any deterministic integer
    expression (e.g. ``pmod(col("id"), n)``); higher ``n_salts`` spreads
    hot keys over more partial reducers.
    """
    avg_deps: dict[str, tuple[str, str]] = {}
    partials: dict[str, tuple[str, Column]] = {}
    for name, (kind, col) in measures.items():
        if kind == "avg":
            partials[f"__{name}_sum"] = ("sum", col)
            partials[f"__{name}_cnt"] = ("count", col)
            avg_deps[name] = (f"__{name}_sum", f"__{name}_cnt")
        else:
            partials[name] = (kind, col)

    stage1 = df.withColumn("__salt", F.pmod(salt, F.lit(n_salts))).groupBy(
        *keys, "__salt"
    ).agg(*[_PARTIAL[k](c).alias(n) for n, (k, c) in partials.items()])

    merged = stage1.groupBy(*keys).agg(
        *[_MERGE[k](F.col(n)).alias(n) for n, (k, _) in partials.items()]
    )
    out: list[Column] = [F.col(k) for k in keys]
    for name, (kind, _) in measures.items():
        if kind == "avg":
            s, c = avg_deps[name]
            out.append((F.col(s) / F.col(c)).alias(name))
        else:
            out.append(F.col(name))
    return merged.select(*out)
