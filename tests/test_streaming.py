"""Stream-vs-batch equivalence: the shared transforms must produce the
same result through readStream (availableNow, memory sink) as through
the batch loader — the batch result is the semantic oracle for the
streaming path (SURVEY.md §2.11)."""

from __future__ import annotations

import uuid

import pytest

from pipeline_mf_etl_spark.sources.readers import load_table
from pipeline_mf_etl_spark.streaming import (
    daily_rollup,
    read_events_stream,
    session_rollup,
    sliding_rollup,
)
from tests.conftest import SF_SMOKE


def _run_stream(spark, transform):
    stream = read_events_stream(spark, SF_SMOKE)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.mark.parametrize("transform", [daily_rollup, sliding_rollup, session_rollup])
def test_stream_matches_batch(spark, transform):
    streamed = sorted(map(tuple, _run_stream(spark, transform).collect()))
    batch = sorted(
        map(tuple, transform(load_table(spark, SF_SMOKE, "events")).collect())
    )
    assert streamed == batch
    assert len(batch) > 0
