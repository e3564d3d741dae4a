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

# Modules that register queries on import.
_QUERY_MODULES = (
    "pipeline_mf_etl_spark.queries.relational",
    "pipeline_mf_etl_spark.queries.windows",
    "pipeline_mf_etl_spark.queries.quality",
    "pipeline_mf_etl_spark.queries.stats",
    "pipeline_mf_etl_spark.queries.dedup",
    "pipeline_mf_etl_spark.queries.text",
    "pipeline_mf_etl_spark.queries.similarity",
    "pipeline_mf_etl_spark.queries.backtest",
    "pipeline_mf_etl_spark.queries.flow",
    "pipeline_mf_etl_spark.queries.streaming",
    "pipeline_mf_etl_spark.queries.ml",
    "pipeline_mf_etl_spark.queries.validation",
    "pipeline_mf_etl_spark.queries.multimodal",
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
    return dict(_REGISTRY)
