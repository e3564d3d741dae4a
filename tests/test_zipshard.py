"""ZIP shard tests (sources/zipshard.py): real-structure round-trips,
the corruption/hostile-archive matrix, and the Spark extraction layer.
The c2 oracle parity runs in tests/test_corpus_ingest.py."""

from __future__ import annotations

import struct
import zlib

import pytest

from pipeline_mf_etl_spark.sources.zipshard import (
    DEFLATED,
    STORED,
    encode_zip,
    extract_zip_documents,
    parse_zip,
    synth_zip,
    with_zip_payload,
)

SF = "/root/testdata/sf0.001"


def _members(**over):
    m = [
        ("a/text.txt", b"alpha beta gamma" * 40, DEFLATED),
        ("a/meta.json", b'{"k": 1}', STORED),
        ("README", b"readme body", STORED),
    ]
    return m


class TestZipPure:
    def test_round_trip_both_methods(self):
        blob = encode_zip(_members())
        got = parse_zip(blob)
        assert [(m["name"], m["payload"], m["method"]) for m in got] == _members()

    def test_deterministic_bytes(self):
        assert encode_zip(_members()) == encode_zip(_members())

    def test_deflate_actually_compresses(self):
        text = b"the same words again and again " * 100
        blob = encode_zip([("t", text, DEFLATED)])
        assert len(blob) < len(text) // 2

    def test_stdlib_zipfile_reads_our_archives(self):
        # interop: the deterministic writer must produce archives any
        # consumer can open
        import io
        import zipfile

        zf = zipfile.ZipFile(io.BytesIO(encode_zip(_members())))
        assert zf.namelist() == [n for n, _, _ in _members()]
        for name, payload, _ in _members():
            assert zf.read(name) == payload

    def test_our_parser_reads_stdlib_archives(self):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("x/one.txt", "first payload")
            zf.writestr("two.bin", b"\x00\x01\x02" * 50)
        got = {m["name"]: m["payload"] for m in parse_zip(buf.getvalue())}
        assert got == {"x/one.txt": b"first payload", "two.bin": b"\x00\x01\x02" * 50}

    def test_eocd_comment_tolerated(self):
        blob = bytearray(encode_zip(_members()))
        blob[-2:] = struct.pack("<H", 9)  # comment length
        blob += b"trailing!"
        assert len(parse_zip(bytes(blob))) == 3

    def test_crc_corruption_fails(self):
        blob = bytearray(encode_zip([("t", b"payload body", STORED)]))
        blob[blob.find(b"payload")] ^= 0xFF
        with pytest.raises(ValueError, match="CRC-32"):
            parse_zip(bytes(blob))

    def test_corrupt_deflate_fails(self):
        import os

        payload = os.urandom(2000)  # incompressible: stream spans bytes 31+
        blob = bytearray(encode_zip([("t", payload, DEFLATED)]))
        blob[200] ^= 0xFF  # inside the deflate stream
        with pytest.raises(ValueError, match="deflate|CRC-32|inflated"):
            parse_zip(bytes(blob))

    def test_local_header_disagreement_fails(self):
        # hostile archive: central directory says STORED, local header
        # says DEFLATED — the classic parser-differential smuggle
        blob = bytearray(encode_zip([("t", b"body", STORED)]))
        assert blob[8] == STORED  # local header method byte
        blob[8] = DEFLATED
        with pytest.raises(ValueError, match="disagrees"):
            parse_zip(bytes(blob))

    def test_not_a_zip_fails(self):
        with pytest.raises(ValueError, match="end-of-central-directory"):
            parse_zip(b"definitely not a zip archive")

    def test_truncated_member_fails(self):
        full = encode_zip([("t", b"x" * 500, STORED)])
        # cut data but keep the EOCD: rebuild tail after slicing payload
        with pytest.raises(ValueError):
            parse_zip(full[:100] + full[400:])

    def test_encrypted_flag_gates(self):
        blob = bytearray(encode_zip([("t", b"body", STORED)]))
        cd = blob.find(b"PK\x01\x02")
        blob[cd + 8] |= 0x01  # general-purpose flag bit 0
        with pytest.raises(ValueError, match="encrypted"):
            parse_zip(bytes(blob))

    def test_unsupported_method_gates(self):
        with pytest.raises(ValueError, match="method"):
            encode_zip([("t", b"x", 12)])  # bzip2


class TestZipSpark:
    def test_extraction_matches_documents(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
        out = (
            extract_zip_documents(with_zip_payload(docs))
            .join(docs.select("doc_id", "text"), "doc_id")
            .collect()
        )
        assert len(out) == 80
        for r in out:
            assert r["text_out"] == r["text"]
            assert r["n_members"] == 3
            assert r["n_deflated"] == 1 + r["doc_id"] % 2
            assert r["total_uncompressed"] == len(r["text"]) + r["meta_len"] + 24

    def test_plan_is_map_only(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            extract_zip_documents(with_zip_payload(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" not in plan

    def test_synth_bundle_layout(self):
        got = parse_zip(synth_zip(6, "hello"))
        assert [m["name"] for m in got] == [
            "doc_6/text.txt", "doc_6/meta.json", "README",
        ]
        assert got[0]["payload"] == b"hello"
        assert got[2]["method"] == STORED  # even doc_id
        assert parse_zip(synth_zip(7, "x"))[2]["method"] == DEFLATED
