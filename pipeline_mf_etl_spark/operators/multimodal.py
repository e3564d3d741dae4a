"""Multimodal column operators: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns with typed metadata, and runs decode / feature
extraction / frame sampling as Arrow-batched Python over
``mapInPandas``. The container has no image/audio codecs, so the DECODE
step is a clearly-marked gate (``decode_media``); everything around it —
schema, batch shape, partitioning, deterministic byte-level features —
is real and tested.

The documents corpus stands in for the payload source: ``text`` encoded
to UTF-8 bytes is the binary column. All byte-level features are
deterministic, so results are oracle- or invariant-checkable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_HIST_BINS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_hist", ArrayType(DoubleType()), False),
        StructField("byte_mean", DoubleType(), True),
        StructField("payload_sha256", StringType(), False),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque payload column + typed metadata (the multimodal
    column contract: payload bytes, mime, size)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "mime", F.lit("text/plain;fake-modality")
    )


def decode_media(payload_bytes: bytes, mime: str):  # pragma: no cover
    """DECODE GATE — real codecs (PIL/librosa/av) are not installed in
    this environment; the surrounding plumbing treats the payload as
    opaque bytes and never needs this in tests."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decode requires an image/audio codec library; install "
            "PIL/librosa/av in production images. Byte-level features "
            "below do not decode."
        ) from exc


def extract_byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary column: byte
    histogram (16 bins, L1-normalized), mean byte value, SHA-256.

    This is the exact plumbing a real image/audio featurizer uses —
    binary in, fixed-width vector out, one mapInPandas batch at a time —
    with a deterministic byte-level 'featurizer' standing in for the
    codec."""

    def feats(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            out_rows = []
            for i, payload in enumerate(pdf["payload"]):
                b = bytes(payload)
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=N_HIST_BINS).astype("float64")
                total = hist.sum()
                out_rows.append(
                    (
                        int(ids[i]),
                        len(b),
                        list(hist / total) if total else [0.0] * N_HIST_BINS,
                        # exact int-sum / count division: bitwise equal to
                        # any engine computing SUM(byte)/COUNT in float64
                        float(arr.sum()) / len(arr) if len(arr) else None,
                        hashlib.sha256(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out_rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return df.select(id_col, "payload").mapInPandas(feats, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, id_col: str = "doc_id", stride: int = 4) -> DataFrame:
    """Frame-sampling fan-out: each payload advertises n_frames in its
    metadata (derived deterministically from size here); emit every
    ``stride``-th frame index with a per-frame key — the same
    explode-shaped plan a video frame sampler produces (one output row
    per sampled frame, shuffle-free)."""
    n_frames = (F.octet_length("payload") / F.lit(16)).cast("long")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(stride))
    frames = df.select(
        id_col,
        F.explode(F.when(n_frames > 0, idx).otherwise(F.array().cast("array<long>"))).alias(
            "frame_idx"
        ),
    )
    return frames.withColumn(
        "frame_key", F.md5(F.concat_ws(":", F.col(id_col).cast("string"), "frame_idx"))
    )
