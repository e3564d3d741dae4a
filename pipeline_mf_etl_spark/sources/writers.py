"""Sinks (SURVEY.md §2.1 S5-S9).

The reference writes one parquet per ticker through a temp-file +
``os.replace`` dance (bronze/writer.py:54-97,221-228) and pairs every QA
table with a CSV twin. On Spark, dataset writes are task-atomic via the
commit protocol and the per-symbol layout is ``partitionBy`` — partition
pruning on read replaces the reference's path-parsing machinery
(gold/features_pipeline.py:119-124). The temp+rename helper survives
only for small driver-side JSON artifacts.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """S6: hive-layout partitioned parquet sink (zstd, stats on — the
    reference's parquet policy, configs/settings.yaml)."""
    (
        df.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partition(spark: SparkSession, path: str, **partition_values) -> DataFrame:
    """Partition-pruned read-back: plain filters on partition columns —
    Catalyst prunes directories, no path parsing needed."""
    df = spark.read.parquet(path)
    for k, v in partition_values.items():
        df = df.filter(df[k] == v)
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table: co-locates rows by join/group key
    at WRITE time so repeated joins and aggregations on that key run
    with no exchange at all — the storage-layout answer to "this join
    shuffles 100 TB every night". Bucket count is fixed at write time;
    pick ~ (dataset size / target partition size) at production scale.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def write_csv_twin(df: DataFrame, path: str) -> None:
    """S8: human-readable CSV twin of a small QA table."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)


def write_json_artifact(payload: dict, path: str) -> None:
    """S5: atomic temp+rename for driver-side JSON artifacts (reference
    ingest/manifest.py:116-144)."""
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{os.path.basename(path)}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=2, sort_keys=True)
    os.replace(tmp, path)


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> dict:
    """Compact a small-files parquet directory into ~``target_mb`` files
    — the standing operational fix for the 100 TB small-files problem
    (streaming sinks, per-batch appends, and over-parallel writes leave
    thousands of KB-scale files; every later scan then pays one task +
    one footer read per file, and the driver pays listing time).

    File count = ceil(total_bytes / target). With ``sort_cols`` the
    rewrite is ``repartitionByRange`` + within-partition sort, so the
    compacted files carry tight min/max row-group stats on the sort
    key(s) (combine with a Z-order key column — operators/layout.py —
    for multi-dimensional locality); without, a plain ``repartition``
    balances bytes. Returns {files_before, files_after, bytes} for the
    caller's ops ledger. The write goes to ``dst`` (atomic swap is the
    caller's move — rewriting in place would race readers)."""
    import math
    import os

    total = 0
    files_before = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                files_before += 1
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if sort_cols:
        df = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        df = df.sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst)
    files_after = sum(
        1
        for root, _dirs, files in os.walk(dst)
        for f in files
        if f.endswith(".parquet")
    )
    return {"files_before": files_before, "files_after": files_after, "bytes": total}
