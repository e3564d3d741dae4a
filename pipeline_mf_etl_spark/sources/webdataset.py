"""WebDataset tar shards — the sequential-read training-shard format.

Large multimodal training runs read tar shards, not row files: a shard
is a POSIX tar whose members are named ``<key>.<ext>``, and all members
sharing a key form one SAMPLE (``000012.txt`` + ``000012.json`` +
``000012.jpg`` → one record). Shards stream sequentially (no seeks), so
a loader saturates object-store bandwidth; the convention's one hard
rule is that a sample's members are CONTIGUOUS in the archive — a key
that reappears after a different key means a corrupt (re-sorted) shard
and must fail, never silently merge.

This module is the engine's dependency-free boundary for the format:

- ``encode_tar_shard`` — deterministic tar bytes (mtime 0, zeroed
  ownership, USTAR) so synthesized shards are byte-stable across runs.
- ``parse_tar_shard`` — member walk + contiguous-key grouping with the
  corruption checks above (stdlib ``tarfile`` over a memory buffer).
- ``build_webdataset_shards`` — documents → one shard per key group
  (``doc_id // docs_per_shard``); the groupBy is the plan's ONLY
  shuffle, then each shard is assembled in a single ``applyInPandas``
  island — at 100 TB this is the standard "repartition to shard grain,
  write sequentially" layout pass.
- ``explode_webdataset`` — shards → one row per sample (map-only
  fan-out, the loader side).

Reference parity: none — engine ADDITION for the LLM-training-data
surface (the packaging step downstream of curation; the r11 window
registers the round-trip query ``wd1_webdataset_roundtrip``).
"""

from __future__ import annotations

import io
import json
import tarfile

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: key width in member names: 000000.txt — wide enough for any shard
#: size the engine writes, and lexicographic order == numeric order.
_KEY_DIGITS = 6


def sample_key(i: int) -> str:
    if not 0 <= i < 10**_KEY_DIGITS:
        raise ValueError(f"sample index {i} outside the {_KEY_DIGITS}-digit key space")
    return f"{i:0{_KEY_DIGITS}d}"


def encode_tar_shard(samples: list[tuple[str, dict[str, bytes]]]) -> bytes:
    """Serialize ``[(key, {ext: payload, ...}), ...]`` as a deterministic
    POSIX tar: USTAR format, mtime 0, uid/gid 0, 0644, extensions
    emitted in sorted order within each sample."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
        for key, parts in samples:
            if not parts:
                raise ValueError(f"sample {key!r} has no members")
            for ext in sorted(parts):
                payload = parts[ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def parse_tar_shard(data: bytes) -> list[tuple[str, dict[str, bytes]]]:
    """Walk a WebDataset shard into ``[(key, {ext: payload})]``.

    Enforces the format's contiguity contract: members of one sample
    must be adjacent; a key that REAPPEARS after another key started is
    a corrupt shard (silently merging would fuse two samples' tensors
    at training time). Duplicate (key, ext) pairs and non-file members
    fail loudly too; directories are skipped.
    """
    samples: list[tuple[str, dict[str, bytes]]] = []
    seen_keys: set[str] = set()
    current: str | None = None
    try:
        tar = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
    except tarfile.TarError as exc:
        raise ValueError(f"not a tar shard: {exc}") from exc
    with tar:
        for member in tar:
            if member.isdir():
                continue
            if not member.isfile():
                raise ValueError(
                    f"shard member {member.name!r} is not a regular file"
                )
            name = member.name.rsplit("/", 1)[-1]  # loaders ignore dirs
            dot = name.find(".")
            if dot <= 0:
                raise ValueError(
                    f"shard member {member.name!r} has no <key>.<ext> shape"
                )
            key, ext = name[:dot], name[dot + 1 :]
            if key != current:
                if key in seen_keys:
                    raise ValueError(
                        f"sample key {key!r} reappears non-contiguously — "
                        "corrupt (re-sorted) shard"
                    )
                seen_keys.add(key)
                current = key
                samples.append((key, {}))
            parts = samples[-1][1]
            if ext in parts:
                raise ValueError(f"duplicate member {key}.{ext} in shard")
            fh = tar.extractfile(member)
            assert fh is not None  # isfile() checked above
            parts[ext] = fh.read()
    if not samples:
        raise ValueError("tar shard holds no samples")
    return samples


# ---------------------------------------------------------------------------
# Spark layer
# ---------------------------------------------------------------------------

SHARD_SCHEMA = StructType(
    [
        StructField("shard_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("shard", BinaryType(), False),
    ]
)

SAMPLE_SCHEMA = StructType(
    [
        StructField("shard_id", LongType(), False),
        StructField("key", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)


def build_webdataset_shards(
    docs: DataFrame, docs_per_shard: int = 16
) -> DataFrame:
    """Package the documents table into WebDataset shards: one tar per
    ``doc_id // docs_per_shard`` group, each doc contributing
    ``<key>.txt`` (the text bytes) and ``<key>.json`` (metadata, sorted
    keys so the bytes are deterministic). The groupBy is the only
    shuffle; shard assembly is one applyInPandas island per shard."""
    if docs_per_shard < 1:
        raise ValueError("docs_per_shard must be >= 1")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        samples = []
        # column zip, not iterrows: iterrows materializes a Series per
        # row (~10x slower per measured shard-build profile)
        for doc_id, text, lang, source in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
        ):
            key = sample_key(int(doc_id) % (10**_KEY_DIGITS))
            meta = {"doc_id": int(doc_id), "lang": lang, "source": source}
            samples.append(
                (
                    key,
                    {
                        "txt": str(text).encode("utf-8"),
                        "json": json.dumps(meta, sort_keys=True).encode("utf-8"),
                    },
                )
            )
        sid = int(pdf["shard_id"].iloc[0])
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "n_samples": [len(samples)],
                "shard": [encode_tar_shard(samples)],
            }
        )

    from pipeline_mf_etl_spark.functions.core import island_repartition

    keyed = docs.select("doc_id", "text", "lang", "source").withColumn(
        "shard_id", (F.col("doc_id") / docs_per_shard).cast("long")
    )
    # explicit-count pre-partition: the tar assembly is the expensive
    # stage, and AQE's byte-based coalescing otherwise serializes every
    # shard group onto one task at small scale (measured r14: 313 groups
    # on ONE of 32 cores; see island_repartition)
    return (
        island_repartition(keyed, "shard_id")
        .groupBy("shard_id")
        .applyInPandas(assemble, SHARD_SCHEMA)
    )


def explode_webdataset(shards: DataFrame) -> DataFrame:
    """The loader side: shards → one row per sample (map-only fan-out;
    no shuffle — a 100 TB shard store explodes at executor grain)."""

    def explode(batches):
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf["shard_id"], pdf["shard"]):
                for key, parts in parse_tar_shard(bytes(blob)):
                    if "txt" not in parts or "json" not in parts:
                        raise ValueError(
                            f"shard {sid} sample {key}: missing txt/json member"
                        )
                    meta = json.loads(parts["json"].decode("utf-8"))
                    rows.append(
                        (
                            int(sid),
                            key,
                            int(meta["doc_id"]),
                            parts["txt"].decode("utf-8"),
                            meta["lang"],
                            meta["source"],
                            sum(len(v) for v in parts.values()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SAMPLE_SCHEMA.fields]
            )

    return shards.select("shard_id", "shard").mapInPandas(explode, SAMPLE_SCHEMA)
