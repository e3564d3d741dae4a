"""Sequence packing: fill fixed-capacity token contexts with documents.

Training pipelines feed models fixed-length contexts; packing short
documents together (instead of padding each to the context length) is
what keeps token utilization high at pretraining scale. This operator
implements deterministic NEXT-FIT packing: documents are hash-assigned
to buckets, ordered by doc id within each bucket, and greedily
accumulated into sequences until the token budget would overflow.

Spark-first shape: bucket assignment is a pure projection (md5-fold,
repartition-stable); each bucket is a SEQUENTIAL ISLAND handled by one
``applyInPandas`` task — the same pattern as the trade simulator
(operators/backtest.py). The ONLY shuffle is the bucket groupBy; the
sequence aggregates (tokens, docs) are computed inside the island, not
by a second window shuffle.

Scale: the bucket count is the parallelism/memory knob — at 100 TB,
size ``n_buckets`` so one bucket's documents fit one executor task
(packing quality is unaffected: next-fit only looks at the running
fill, never across buckets). The per-bucket loop is a true prefix
recurrence (each decision depends on the running fill), so it cannot
be vectorized JVM-side; the island touches each row once.

Determinism contract (shared with the DuckDB oracle, which replays the
recurrence as a recursive CTE): sequences are 1-based per bucket; doc
``i`` (in doc_id order) starts a new sequence iff it is not the
bucket's first doc and ``fill + n_tokens(i) > budget``. A document
longer than the budget therefore always sits alone in its own
sequence (fill_ratio > 1 — reported, not hidden).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from pipeline_mf_etl_spark.operators.dedupe import md5_int64

PACK_BUDGET = 256
PACK_BUCKETS = 32

PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("bucket", LongType(), False),
        StructField("seq_id", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("seq_tokens", LongType(), False),
        StructField("seq_n_docs", LongType(), False),
    ]
)


def pack_bucket(col: Column, n_buckets: int = PACK_BUCKETS) -> Column:
    """Deterministic packing bucket: md5-fold of the salted doc id —
    repartition-stable, engine-agnostic (oracle replays the same fold)."""
    return md5_int64(F.concat(F.lit("pack:"), col.cast("string"))) % n_buckets


def pack_next_fit(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Assign every document to a (bucket, seq_id) context via next-fit
    packing. Input needs (id_col, tokens_col); output is PACK_SCHEMA."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        toks = pdf[tokens_col].to_numpy(dtype=np.int64)
        seq = np.empty(len(toks), dtype=np.int64)
        fill, s = 0, 1
        for i, t in enumerate(toks):
            if i > 0 and fill + t > budget:
                s, fill = s + 1, 0
            fill += t
            seq[i] = s
        out = pd.DataFrame(
            {
                "doc_id": pdf[id_col],
                "bucket": pdf["bucket"],
                "seq_id": seq,
                "n_tokens": toks,
            }
        )
        g = out.groupby("seq_id")["n_tokens"]
        out["seq_tokens"] = g.transform("sum")
        out["seq_n_docs"] = g.transform("size")
        # fill_ratio deliberately NOT computed here: pandas rounds
        # half-even, the engines' ROUND is half-away, and seq_tokens /
        # 2^k budgets produce exact decimal ties — callers add it with
        # F.round (queries/corpus.py o12) so both engines share one
        # rounding rule.
        return out

    from pipeline_mf_etl_spark.functions.core import island_repartition

    keyed = docs.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        pack_bucket(F.col(id_col), n_buckets).alias("bucket"),
    )
    # pre-partition on the island key with an explicit count so the
    # groupBy below reuses the exchange and AQE cannot serialize the
    # Python packing pass onto one task (see island_repartition)
    return island_repartition(keyed, "bucket").groupBy("bucket").applyInPandas(
        pack, PACK_SCHEMA
    )
