"""TFRecord framing + tf.Example wire format (sources/tfrecord.py).

No TensorFlow/protobuf in the container, so the encoder is pinned by
HAND-ASSEMBLED wire-format vectors (the protobuf encoding spec is
simple enough to write bytes by hand) the same way snappy/zstd pin
their bit-level geometry; the decoder by round-trips, packed/unpacked
acceptance, and an every-byte-flip corruption sweep over the framed
stream (the CRC layer must catch ALL of it before the protobuf walk).
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline_mf_etl_spark.sources.snappyframe import _mask_crc, crc32c
from pipeline_mf_etl_spark.sources.tfrecord import (
    decode_example,
    encode_example,
    frame_record,
    framed_length,
    iter_tfrecord,
    read_tfrecord_at,
    write_tfrecord,
)


class TestExampleWireFormat:
    def test_known_vector(self):
        # Example{features{ "doc_id": Int64List[7], "text": BytesList[b"hi"] }}
        # assembled by hand from the protobuf encoding spec:
        #   entry(doc_id): 0a 06 "doc_id" 12 05 1a 03 0a 01 07
        #   entry(text):   0a 04 "text"   12 06 0a 04 0a 02 68 69
        # sorted-key order => doc_id first.
        expected = bytes.fromhex(
            "0a21"
            "0a0f" "0a06" + b"doc_id".hex() + "1205" "1a03" "0a01" "07"
            "0a0e" "0a04" + b"text".hex() + "1206" "0a04" "0a02" + b"hi".hex()
        )
        enc = encode_example(
            {"text": ("bytes", [b"hi"]), "doc_id": ("int64", [7])}
        )
        assert enc == expected

    def test_float_packed_vector(self):
        # FloatList[1.5] packed: Feature field 2 -> 12 06 0a 04 <f32 LE 1.5>
        enc = encode_example({"x": ("float", [1.5])})
        f32 = struct.pack("<f", 1.5)
        expected = bytes.fromhex("0a0f" "0a0d" "0a01" + b"x".hex() + "1208" "1206" "0a04") + f32
        assert enc == expected
        assert decode_example(enc) == {"x": ("float", [1.5])}

    def test_roundtrip_all_kinds(self):
        feats = {
            "b": ("bytes", [b"", "café 中文".encode(), b"\x00\xff"]),
            "f": ("float", [0.0, -2.25, 1e30]),
            "i": ("int64", [0, -1, 7, -(1 << 63), (1 << 63) - 1]),
            "empty_b": ("bytes", []),
            "empty_f": ("float", []),
            "empty_i": ("int64", []),
        }
        out = decode_example(encode_example(feats))
        assert out.keys() == feats.keys()
        for k, (kind, vals) in feats.items():
            okind, ovals = out[k]
            assert okind == kind, k
            if kind == "float":
                assert ovals == [struct.unpack("<f", struct.pack("<f", v))[0] for v in vals]
            else:
                assert ovals == vals, k

    def test_unpacked_numeric_accepted(self):
        # parsers must accept unpacked repeated scalars: Int64List as
        # two field-1 varints, FloatList as two field-1 fixed32s
        i64_body = bytes.fromhex("08" "07" "08" "2a")  # 7, 42
        feat = bytes([0x1A, len(i64_body)]) + i64_body
        entry = bytes.fromhex("0a01") + b"i" + bytes([0x12, len(feat)]) + feat
        ex = bytes([0x0A, len(entry) + 2, 0x0A, len(entry)]) + entry
        assert decode_example(ex) == {"i": ("int64", [7, 42])}

        f_body = b"\x0d" + struct.pack("<f", 1.0) + b"\x0d" + struct.pack("<f", 2.0)
        feat = bytes([0x12, len(f_body)]) + f_body
        entry = bytes.fromhex("0a01") + b"f" + bytes([0x12, len(feat)]) + feat
        ex = bytes([0x0A, len(entry) + 2, 0x0A, len(entry)]) + entry
        assert decode_example(ex) == {"f": ("float", [1.0, 2.0])}

    def test_strict_walk_rejects(self):
        good = encode_example({"a": ("int64", [1])})
        with pytest.raises(ValueError):  # unknown top-level field 2
            decode_example(b"\x12\x00" + good)
        with pytest.raises(ValueError):  # wire type 0 at top level
            decode_example(b"\x08\x01")
        with pytest.raises(ValueError):  # duplicate feature name
            body = good[2:]
            inner = body[2:]
            dup = bytes([0x0A, 2 * len(inner)]) + inner + inner
            decode_example(dup)
        with pytest.raises(ValueError):  # truncated varint
            decode_example(b"\x0a\xff")
        with pytest.raises(TypeError):  # bytes values must be bytes
            encode_example({"a": ("bytes", ["not-bytes"])})
        with pytest.raises(ValueError):  # two kinds in one Feature
            feat = bytes.fromhex("0a00" "1a00")
            entry = bytes.fromhex("0a0161") + bytes([0x12, len(feat)]) + feat
            decode_example(bytes([0x0A, len(entry) + 2, 0x0A, len(entry)]) + entry)

    @settings(max_examples=50, deadline=None)
    @given(
        st.dictionaries(
            st.text(min_size=1, max_size=8),
            st.one_of(
                st.tuples(st.just("bytes"), st.lists(st.binary(max_size=40), max_size=4)),
                st.tuples(
                    st.just("int64"),
                    st.lists(
                        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
                        max_size=4,
                    ),
                ),
            ),
            max_size=5,
        )
    )
    def test_property_roundtrip(self, feats):
        assert decode_example(encode_example(feats)) == feats


class TestFraming:
    def test_frame_geometry(self):
        rec = frame_record(b"abc")
        assert len(rec) == framed_length(3) == 19
        assert rec[:8] == struct.pack("<Q", 3)
        assert struct.unpack_from("<I", rec, 8)[0] == _mask_crc(crc32c(rec[:8]))
        assert rec[12:15] == b"abc"
        assert struct.unpack_from("<I", rec, 15)[0] == _mask_crc(crc32c(b"abc"))

    def test_stream_walk(self):
        payloads = [b"", b"x", b"hello world" * 10]
        blob = write_tfrecord(payloads)
        got = list(iter_tfrecord(blob))
        assert [p for _, _, p in got] == payloads
        offs = [o for o, _, _ in got]
        lens = [n for _, n, _ in got]
        assert offs == [0, 16, 33]
        assert sum(lens) == len(blob)
        for (o, n, p) in got:  # every indexed range is point-readable
            assert read_tfrecord_at(blob[o : o + n]) == p

    def test_every_byte_flip_detected(self):
        blob = write_tfrecord([b"abc", b"defg"])
        for i in range(len(blob)):
            for bit in (0x01, 0x80):
                bad = bytearray(blob)
                bad[i] ^= bit
                with pytest.raises(ValueError):
                    list(iter_tfrecord(bytes(bad)))

    def test_truncation_detected(self):
        blob = write_tfrecord([b"abcdef"])
        for cut in range(1, len(blob)):
            with pytest.raises(ValueError):
                list(iter_tfrecord(blob[:cut]))

    def test_point_lookup_rejects_partial_ranges(self):
        blob = write_tfrecord([b"abc", b"def"])
        with pytest.raises(ValueError):
            read_tfrecord_at(blob)  # two records
        with pytest.raises(ValueError):
            read_tfrecord_at(blob[:18])  # one byte short
