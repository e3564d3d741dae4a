"""Central query registry.

Each query is a pair: a Spark callable ``(spark, sf_dir) -> DataFrame``
and (where SQL-expressible) an equivalent ANSI-SQL oracle string run by
DuckDB over the same parquet tables. Column names are aligned on both
sides (the comparison sorts columns by name before hashing values), and
every computed double is rounded to a fixed precision on BOTH sides so
accumulation-order ulp drift cannot flip the hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules that register queries on import. Order matters: the driver's
# correctness harness certifies the first 50 registered queries, so the
# families with the least prior certification evidence register first and
# the long-stable relational/window/quality/stats families last.
_QUERY_MODULES = (
    "pipeline_mf_etl_spark.queries.backtest",
    "pipeline_mf_etl_spark.queries.dedup",
    "pipeline_mf_etl_spark.queries.text",
    "pipeline_mf_etl_spark.queries.similarity",
    "pipeline_mf_etl_spark.queries.flow",
    "pipeline_mf_etl_spark.queries.streaming",
    "pipeline_mf_etl_spark.queries.ml",
    "pipeline_mf_etl_spark.queries.validation",
    "pipeline_mf_etl_spark.queries.multimodal",
    "pipeline_mf_etl_spark.queries.corpus",
    "pipeline_mf_etl_spark.queries.stats",
    "pipeline_mf_etl_spark.queries.quality",
    "pipeline_mf_etl_spark.queries.windows",
    "pipeline_mf_etl_spark.queries.relational",
)

# Explicit front-of-queue names (certification priority within the driver's
# 50-query window) — used to pull individual stragglers (e.g. the bootstrap
# trio registered late in the stats module) ahead of already-certified
# queries without moving source code around.
# Round-3 rotation note: the round-2 window is exactly the 50 previously
# uncertified queries; t6_pii_scrub / o9_stratified_sample (corpus module,
# positions 51-52) and the long-green relational/windows/quality/stats
# families are NOT in it — next round, swap _PRIORITY/module order so the
# still-uncertified names come first.
_PRIORITY = (
    "m13_bootstrap_ci",
    "m14_block_bootstrap",
    "m15_pairwise_diff_ci",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str = ""


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a Spark query (and optional DuckDB oracle)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            continue  # module not built yet; registry stays partial
    ordered: dict[str, QuerySpec] = {}
    # Module order already front-loads the least-certified families; within
    # that, _PRIORITY pulls named stragglers to the very front.
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        ordered.setdefault(name, spec)
    return ordered
