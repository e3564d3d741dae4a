"""Non-ASCII divergence-boundary tests for the byte-length oracle
families (r11 ADVICE follow-through).

Two distinct situations, pinned separately:

1. strlen-based oracles (wd1/c2/c5/c6/c7 sizes): DuckDB ``strlen`` is
   BYTES (``length`` is characters), so these are byte-exact on ANY
   corpus already — the test codifies that DuckDB semantic so an
   engine swap or oracle rewrite to ``length()`` gets caught.
2. ord(substr(...))-based oracles (mm2/mm4/mm25 sample values): DuckDB
   ``ord`` yields the CODE POINT of a character while the engine
   samples UTF-8 BYTES — equal only on pure-ASCII text
   (tests/test_multimodal.py::test_corpus_is_ascii pins the corpus).
   These tests assert the ENGINE side of that boundary: synthesis is
   byte-based, so a non-ASCII char becomes multiple samples. If the
   synthesis ever silently switched to characters, these fail before
   the oracle could drift.
"""

from __future__ import annotations

import numpy as np


NON_ASCII = "héllo wörld — ça va? 日本語"  # 2-, 3- and em-dash multibyte


def test_duckdb_strlen_is_bytes_not_chars():
    import duckdb

    n_bytes, n_chars = duckdb.sql(
        "SELECT strlen(?), length(?)", params=[NON_ASCII, NON_ASCII]
    ).fetchone()
    assert n_bytes == len(NON_ASCII.encode("utf-8"))
    assert n_chars == len(NON_ASCII)
    assert n_bytes > n_chars  # the divergence the strlen oracles rely on


def test_wd1_member_bytes_are_utf8_bytes(spark):
    """WebDataset tar members store UTF-8 bytes; the shard accounting
    must count them (matching the oracle's strlen), not characters."""
    from pipeline_mf_etl_spark.sources.webdataset import (
        build_webdataset_shards,
        explode_webdataset,
    )

    df = spark.createDataFrame(
        [(0, NON_ASCII, "fr", "web")], "doc_id long, text string, lang string, source string"
    )
    samples = explode_webdataset(build_webdataset_shards(df, 16)).collect()
    assert len(samples) == 1
    expected_meta = (
        '{"doc_id": 0, "lang": "fr", "source": "web"}'
    )
    assert samples[0]["n_bytes"] == len(NON_ASCII.encode("utf-8")) + len(
        expected_meta.encode("utf-8")
    )
    assert samples[0]["n_bytes"] > len(NON_ASCII) + len(expected_meta)


def test_mm25_flac_synthesis_samples_bytes(spark):
    """The FLAC synthesis maps UTF-8 BYTES to samples: a non-ASCII doc
    yields more samples than characters — the exact boundary where the
    mm25 ord(substr())-oracle (code points) stops matching, pinned so a
    silent switch to character-based synthesis cannot drift past the
    ASCII-corpus guard."""
    from pipeline_mf_etl_spark.operators.flac import _text_to_pcm, encode_flac, parse_flac

    pcm = _text_to_pcm(1, NON_ASCII)  # doc 1: mono
    raw = NON_ASCII.encode("utf-8")
    assert pcm.shape == (len(raw),)
    assert len(raw) > len(NON_ASCII)
    expected = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) * 256
    assert (pcm == expected).all()
    # and the full codec round-trips those byte-derived samples exactly
    out = parse_flac(encode_flac(pcm, sample_rate=8000, block_size=64))
    assert (out["samples"][0] == expected).all()


def test_mm4_wav_synthesis_samples_bytes(spark):
    """Same boundary for the WAV leg: byte-based sampling."""
    from pipeline_mf_etl_spark.operators.multimodal import with_wav_payload

    df = spark.createDataFrame([(7, NON_ASCII)], "doc_id long, text string")
    row = with_wav_payload(df).collect()[0]
    payload = bytes(row["payload"])
    # RIFF data chunk length = 2 bytes per sample, one sample per UTF-8 byte
    n_bytes = len(NON_ASCII.encode("utf-8"))
    assert payload[:4] == b"RIFF"
    data_at = payload.find(b"data")
    assert data_at > 0
    data_len = int.from_bytes(payload[data_at + 4 : data_at + 8], "little")
    assert data_len == 2 * n_bytes
    assert data_len > 2 * len(NON_ASCII)
