"""Property tests for the round-10 format parsers — FLAC, WARC/HTTP,
gzip member split, WebDataset tar, HTML strip. Pure-Python (no Spark),
so hypothesis can run generously; each property is either a round-trip
identity (encode∘decode == id over the whole input space) or a
never-mis-decode guarantee (mutations either parse to the same content
or raise ValueError — no silent corruption class)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline_mf_etl_spark.operators.flac import encode_flac, parse_flac
from pipeline_mf_etl_spark.operators.html import html_to_text
from pipeline_mf_etl_spark.sources.warc import (
    encode_http_response,
    gzip_member,
    parse_http_response,
    parse_warc,
    split_gzip_members,
    synth_html_page,
    synth_warc_gz,
)
from pipeline_mf_etl_spark.sources.webdataset import (
    encode_tar_shard,
    parse_tar_shard,
)

# ---------------------------------------------------------------------------
# FLAC: lossless means round-trip identity over ARBITRARY int16 PCM
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=700),
    st.sampled_from([16, 64, 333]),
)
def test_flac_mono_round_trip_identity(pcm, block):
    x = np.array(pcm, dtype=np.int16)
    out = parse_flac(encode_flac(x, block_size=block))
    assert np.array_equal(out["samples"][0], x)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=2, max_size=400),
    st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
)
def test_flac_stereo_round_trip_identity(pcm, mode):
    n = len(pcm) // 2
    x = np.array(pcm[: 2 * n], dtype=np.int16).reshape(2, n)
    out = parse_flac(encode_flac(x, block_size=64, channel_mode=mode))
    assert np.array_equal(out["samples"], x)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=8, max_size=300),
    st.integers(0, 200),
    st.integers(1, 255),
)
def test_flac_bitflip_never_misdecodes(pcm, pos, mask):
    """Flipping any byte after the magic either still decodes to the
    EXACT original PCM (flip hit padding/irrelevant bits is impossible
    given CRCs — but allow it) or raises: silent wrong samples are the
    one forbidden outcome. This is the CRC-8/CRC-16/MD5 triple doing
    its job."""
    x = np.array(pcm, dtype=np.int16)
    blob = bytearray(encode_flac(x, block_size=64))
    pos = 4 + pos % (len(blob) - 4)
    blob[pos] ^= mask
    try:
        out = parse_flac(bytes(blob))
    except (ValueError, IndexError):
        return
    assert np.array_equal(out["samples"][0], x)


# ---------------------------------------------------------------------------
# gzip member split: concatenation of members is the identity partition
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=5000), min_size=1, max_size=8))
def test_gzip_member_split_round_trip(parts):
    stream = b"".join(gzip_member(p) for p in parts)
    assert split_gzip_members(stream) == parts


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=800), min_size=1, max_size=4), st.integers(1, 40))
def test_gzip_truncation_always_raises(parts, cut):
    stream = b"".join(gzip_member(p) for p in parts)
    # the cut must land INSIDE the last member — removing it entirely
    # leaves a shorter but valid stream (hypothesis found that case)
    cut = min(cut, len(gzip_member(parts[-1])) - 1)
    with pytest.raises(ValueError):
        split_gzip_members(stream[:-cut])


# ---------------------------------------------------------------------------
# WARC + HTTP: the full capture round-trips arbitrary text
# ---------------------------------------------------------------------------

_doc_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
    max_size=400,
)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10**6), _doc_text)
def test_warc_capture_recovers_text(doc_id, text):
    gz = synth_warc_gz(doc_id, text)
    resp = [
        r
        for m in split_gzip_members(gz)
        for r in parse_warc(m)
        if r["type"] == "response"
    ]
    assert len(resp) == 1
    http = parse_http_response(resp[0]["payload"])
    stripped = html_to_text(http["body"].decode("utf-8"))
    # whitespace collapses through the HTML layer; everything else must
    # survive the gzip/WARC/HTTP/entity-escape stack byte-for-byte
    import re

    expected = re.sub(
        r"\s+", " ", f"doc {doc_id} Document #{doc_id} {text} next"
    ).strip()
    assert stripped == expected


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=3000), st.booleans(), st.booleans(), st.integers(1, 97))
def test_http_framing_round_trip(body, chunked, gz, chunk_size):
    raw = encode_http_response(body, chunked=chunked, gzip_body=gz, chunk_size=chunk_size)
    assert parse_http_response(raw)["body"] == body


# ---------------------------------------------------------------------------
# WebDataset tar: sample structure round-trips
# ---------------------------------------------------------------------------

_ext = st.text(alphabet="abcdefghijklmnopqrstuvwxyz.", min_size=1, max_size=8).filter(
    lambda e: not e.startswith(".")
)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.dictionaries(_ext, st.binary(max_size=2000), min_size=1, max_size=4)
        ),
        min_size=1,
        max_size=6,
    )
)
def test_tar_shard_round_trip(parts):
    samples = [(f"{i:06d}", d) for i, (d,) in enumerate(parts)]
    assert parse_tar_shard(encode_tar_shard(samples)) == samples


# ---------------------------------------------------------------------------
# HTML strip: idempotent on its own output, and entity decode is
# exactly one level
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10**6), _doc_text)
def test_html_strip_idempotent_on_page_text(doc_id, text):
    page = synth_html_page(doc_id, text)
    once = html_to_text(page)
    # a second pass may decode one more entity level (HTML semantics),
    # but must be stable when no entities remain
    if "&" not in once:
        assert html_to_text(once) == once


# ---------------------------------------------------------------------------
# ZIP: structure round-trips for arbitrary names/payloads/methods
# ---------------------------------------------------------------------------

from pipeline_mf_etl_spark.sources.zipshard import (  # noqa: E402
    DEFLATED,
    STORED,
    encode_zip,
    parse_zip,
)

_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_/.-", min_size=1, max_size=30
).filter(lambda n: not n.startswith("/"))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(_name, st.binary(max_size=3000), st.sampled_from([STORED, DEFLATED])),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
def test_zip_round_trip(members):
    got = parse_zip(encode_zip(members))
    assert [(m["name"], m["payload"], m["method"]) for m in got] == members


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=500, max_size=2000), st.integers(0, 10**6), st.integers(1, 255))
def test_zip_bitflip_never_misdecodes(payload, pos, mask):
    """Any single-byte corruption either still yields the exact member
    payloads or raises — CRC-32 + size + structure checks leave no
    silent-corruption class."""
    members = [("data.bin", payload, DEFLATED), ("t.txt", b"x", STORED)]
    blob = bytearray(encode_zip(members))
    blob[pos % len(blob)] ^= mask
    try:
        got = parse_zip(bytes(blob))
    except (ValueError, struct.error, UnicodeDecodeError):
        return
    assert [(m["name"], m["payload"]) for m in got] == [
        (n, p) for n, p, _ in members
    ]



# ---------------------------------------------------------------------------
# bzip2 (r13): round-trip identity over arbitrary bytes, stdlib
# cross-validation as a property, and the never-mis-decode guarantee
# ---------------------------------------------------------------------------

from pipeline_mf_etl_spark.sources.bzip2 import (  # noqa: E402
    decode_bzip2_stream,
    encode_bzip2,
)


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=6000), st.integers(1, 9), st.sampled_from([64, 700, 4096]))
def test_bzip2_round_trip_identity(payload, level, block_bytes):
    import bz2 as stdlib_bz2

    enc = encode_bzip2(payload, level=level, block_bytes=block_bytes)
    assert decode_bzip2_stream(enc)["content"] == payload
    assert stdlib_bz2.decompress(enc) == payload  # libbzip2 agrees


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=1, max_size=4000))
def test_bzip2_decodes_stdlib(payload):
    import bz2 as stdlib_bz2

    assert decode_bzip2_stream(stdlib_bz2.compress(payload, 1))["content"] == payload


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=50, max_size=1500), st.integers(0, 10**6), st.integers(1, 255))
def test_bzip2_bitflip_never_misdecodes(payload, pos, mask):
    """Any single-byte corruption either still yields the exact content
    (padding bits) or raises — block CRC + stream CRC + structural
    gates leave no silent-corruption class."""
    enc = bytearray(encode_bzip2(payload, level=1, block_bytes=256))
    enc[pos % len(enc)] ^= mask
    try:
        out = decode_bzip2_stream(bytes(enc))
    except (ValueError, NotImplementedError, IndexError):
        return
    assert out["content"] == payload
