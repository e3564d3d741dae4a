"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (grouped-stats pricing summary,
SURVEY.md §2.5 A1) on sf0.001. ``queries()`` exposes every implemented
operator from SURVEY.md §2 as a named (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible one. Column names and float rounding are aligned on both
sides so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_mf_etl_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_queries()
    return specs["a1_grouped_stats"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Most builders are lazy (return an unexecuted plan). The model-fit /
    sketch families are EAGER: they run driver-side actions (MLlib fit,
    sketch probe, parquet export under ``.artifacts/``) at build time;
    ``eager_queries()`` lists them. Callers needing strict laziness
    should treat those as materializing.

    The sketch / native-RNG variants (a16/a17/a18/o4) are
    ``driver_visible=False``: their outputs are engine-specific by
    design, so each is certified through its hash-exact twin
    (a16b/a17b/a18b/o4b) plus error-bound property tests
    (tests/test_sketches.py) instead of a permanently-red rows-only row.
    """
    return {
        name: spec.spark
        for name, spec in all_queries().items()
        if spec.driver_visible
    }


def eager_queries() -> set[str]:
    """Names of builders with build-time side effects (``QuerySpec.eager``),
    restricted to the driver-visible surface ``queries()`` exposes."""
    return {
        name
        for name, spec in all_queries().items()
        if spec.eager and spec.driver_visible
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle}
