"""Shared persisted-export helper for oracle-certifying model-driven
queries.

Model fits / seeded resampling are engine-specific (MLlib, NumPy RNG),
so their queries cannot be oracle-checked end-to-end — but everything
DOWNSTREAM of the fitted labels / resampled distributions is plain
relational algebra. Persisting that intermediate to parquet and having
BOTH the Spark rollup and the DuckDB oracle read the exact same rows
turns a rows-only check into a full rows+schema+hash check of the
downstream computation. The export dir is gitignored scratch inside
the repo.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXPORT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".artifacts", "ml_export"
)
# Oracle SQL strings are static: they read the export for the oracle
# scale factor (the driver certifies at sf0.01; tests honor the same
# env override the parity harness uses).
_ORACLE_TAG = os.path.basename(
    os.path.normpath(os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"))
)


def export_frame(df: DataFrame, spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Write a deterministic intermediate frame to the export dir and
    read it back, so Spark aggregation and the DuckDB oracle consume
    bit-identical rows."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_EXPORT_ROOT, tag, name)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def export_glob(name: str) -> str:
    """Path glob the oracle SQL reads (fixed to the oracle sf tag)."""
    return os.path.join(_EXPORT_ROOT, _ORACLE_TAG, name, "*.parquet")
