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

    # Export-backed oracles read parquet the Spark builder just wrote;
    # refuse to compare against a stale on-disk export (ADVICE r3).
    from pipeline_mf_etl_spark.queries.export import assert_exports_fresh

    assert_exports_fresh(spec.oracle)
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


# Output types the driver's value-hash formats identically between a
# collected Spark row and a DuckDB fetchall row. DuckDB widens an
# integer SUM to HUGEINT unless it is CAST(... AS BIGINT) — int128
# formats differently and breaks the hash even when values agree (the
# r11 c4/wd1/mm25/mm26/d12 failure mode). DECIMAL diverges the same
# way. This sweep enforces the casting convention mechanically.
_HASH_STABLE_TYPES = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
}


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_output_types_hash_stable(duck, name):
    """DESCRIBE every registered oracle and assert no output column has
    a type outside the driver-hash-stable set (no HUGEINT, no DECIMAL).
    Wrap integer SUMs in CAST(... AS BIGINT)."""
    spec = _QUERIES[name]
    try:
        rows = duck.execute("DESCRIBE " + spec.oracle).fetchall()
    except Exception as exc:  # export-backed oracle without its scratch tree
        if ".artifacts" in spec.oracle:
            pytest.skip(f"export-backed oracle not materialized: {exc}")
        raise
    offending = [
        (col, typ) for col, typ, *_ in rows if typ not in _HASH_STABLE_TYPES
    ]
    assert not offending, (
        f"{name}: oracle emits driver-hash-unstable column types {offending}; "
        "cast integer SUMs to BIGINT and decimals to DOUBLE"
    )


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_rows_only(spark, name):
    """Weaker check for non-SQL-expressible ops: runs and yields a stable schema."""
    spec = _QUERIES[name]
    sdf = spec.spark(spark, SF_ORACLE)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0


def test_ewm_oracle_survives_long_series(spark, tmp_path):
    """The flow-family EWM oracle must stay finite and exact on a 10k-bar
    single series — the naive closed form POWER(B, -rn) overflows double
    around rn≈7000; the block-rescaled recursive form must not. Spark's
    applyInPandas engine side and the DuckDB oracle must agree bit-for-bit
    at 6-dp on the long series."""
    import duckdb
    import numpy as np
    import pandas as pd

    n = 10_000
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": ["u1"] * n,
            "ts": pd.date_range("2020-01-01", periods=n, freq="min"),
            "event_type": ["view"] * n,
            "value": rng.normal(100, 20, n),
            "props": ["{}"] * n,
        }
    )
    # stage as a parquet dir the loaders understand
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/events.parquet")

    for qname in ("w3_ewm_wilder", "f1_flow_states"):
        spec = _QUERIES[qname]
        sdf = spec.spark(spark, sf_dir)
        srows = canonical_rows([tuple(r) for r in sdf.collect()], sdf.columns)

        con = duckdb.connect()
        con.register("events", pdf)
        cur = con.execute(spec.oracle)
        drows = canonical_rows(cur.fetchall(), [d[0] for d in cur.description])
        assert srows == drows, f"{qname}: long-series oracle mismatch"
        # explicit finiteness guard: every post-warmup smoothed value real
        svals = [r for r in srows if r[-1] != "NULL"]
        assert len(svals) >= n - 9
