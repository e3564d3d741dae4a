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

import hashlib
import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession

_EXPORT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".artifacts", "ml_export"
)
# Exports written by THIS process, keyed (sf-tag, name). The parity
# harness uses this to refuse running an oracle against a stale on-disk
# export left by an earlier run (see ``assert_exports_fresh``).
_WRITTEN: set[tuple[str, str]] = set()


def _tag(sf_dir: str) -> str:
    """Export directory tag for an sf dir: leaf name + a short hash of
    the FULL absolute path. Leaf name alone aliases two different
    corpora whose directories share a basename (e.g. two tmp corpora
    both named 'corpus', or a curated output mirroring the source
    layout) — with the per-process reuse in ``have_export`` that
    collision would silently serve the FIRST corpus's pair export to
    the second's consumers."""
    norm = os.path.abspath(os.path.normpath(sf_dir))
    return (
        os.path.basename(norm)
        + "-"
        + hashlib.md5(norm.encode("utf-8")).hexdigest()[:8]
    )


# Oracle SQL strings are static: they read the export for the oracle
# scale factor (the driver certifies at sf0.01; tests honor the same
# env override the parity harness uses).
_ORACLE_TAG = _tag(os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"))


def export_frame(df: DataFrame, spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Write a deterministic intermediate frame to the export dir and
    read it back, so Spark aggregation and the DuckDB oracle consume
    bit-identical rows."""
    tag = _tag(sf_dir)
    path = os.path.join(_EXPORT_ROOT, tag, name)
    df.write.mode("overwrite").parquet(path)
    # Run marker: ties the on-disk export to the invocation that wrote
    # it, so a harness can detect a stale export (failed write, testdata
    # regeneration, parallel run) before trusting the oracle against it.
    with open(os.path.join(path, "_meta.json"), "w") as fh:
        json.dump({"sf_dir": sf_dir, "written_at": time.time(), "pid": os.getpid()}, fh)
    _WRITTEN.add((tag, name))
    return spark.read.parquet(path)


def have_export(sf_dir: str, name: str) -> bool:
    """True when THIS process already wrote export ``name`` for the sf —
    lets expensive shared intermediates (e.g. the MinHash verified-pair
    set) be computed at most once per (process, sf) across consumers."""
    tag = _tag(sf_dir)
    return (tag, name) in _WRITTEN


def read_export(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read back an export previously written by this process."""
    tag = _tag(sf_dir)
    return spark.read.parquet(os.path.join(_EXPORT_ROOT, tag, name))


def export_glob(name: str) -> str:
    """Path glob the oracle SQL reads (fixed to the oracle sf tag)."""
    return os.path.join(_EXPORT_ROOT, _ORACLE_TAG, name, "*.parquet")


def assert_exports_fresh(oracle_sql: str) -> None:
    """Fail loudly if ``oracle_sql`` reads an export parquet that was
    NOT produced by the current process (i.e. by the Spark builder that
    just ran). Guards against the implicit disk coupling of the
    persisted-export pattern: a standalone oracle run against a stale
    ``.artifacts`` tree would mismatch for reasons unrelated to the
    query under test."""
    pattern = re.escape(_EXPORT_ROOT) + r"/([^/']+)/([^/']+)/\*\.parquet"
    for tag, name in re.findall(pattern, oracle_sql):
        if (tag, name) not in _WRITTEN:
            raise RuntimeError(
                f"oracle reads export {tag}/{name} that this process never wrote; "
                "run the Spark builder first (exports are per-invocation scratch)"
            )
        meta_path = os.path.join(_EXPORT_ROOT, tag, name, "_meta.json")
        if not os.path.exists(meta_path):
            raise RuntimeError(f"export {tag}/{name} lacks its _meta.json run marker")
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("pid") != os.getpid():
            raise RuntimeError(
                f"export {tag}/{name} was written by pid {meta.get('pid')}, "
                f"not this process ({os.getpid()}) — stale export"
            )
