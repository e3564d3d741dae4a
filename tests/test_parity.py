"""Oracle-parity harness: mirrors the driver's correctness gate.

For every registered query with an oracle, runs the Spark query and the
DuckDB SQL over the same sf0.01 parquet and compares row count, column
names, and canonicalized values.
"""

from __future__ import annotations

import pytest

from pipeline_mf_etl_spark.queries import all_queries
from tests.conftest import SF_ORACLE, canonical_rows

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, s in _QUERIES.items() if s.oracle)
_NO_ORACLE = sorted(n for n, s in _QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    spec = _QUERIES[name]
    sdf = spec.spark(spark, SF_ORACLE)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_can = canonical_rows(spark_rows, spark_cols)
    d_can = canonical_rows(duck_rows, duck_cols)
    if s_can != d_can:
        diffs = [(a, b) for a, b in zip(s_can, d_can) if a != b][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_rows_only(spark, name):
    """Weaker check for non-SQL-expressible ops: runs and yields a stable schema."""
    spec = _QUERIES[name]
    sdf = spec.spark(spark, SF_ORACLE)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0
