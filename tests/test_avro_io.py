"""Avro object-container tests (sources/avro_io.py). c4 oracle parity
runs in tests/test_corpus_ingest.py."""

from __future__ import annotations

import pytest

from pipeline_mf_etl_spark.sources.avro_io import (
    DOC_AVRO_SCHEMA,
    encode_avro,
    parse_avro,
    synth_avro,
)


def _recs(n=20):
    return [
        {"doc_id": 7, "seq": i, "chunk": f"part {i}",
         "lang": None if i % 3 == 0 else "en"}
        for i in range(n)
    ]


class TestAvroContainer:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_round_trip(self, codec):
        blob = encode_avro(_recs(), DOC_AVRO_SCHEMA, codec=codec)
        p = parse_avro(blob)
        assert p["records"] == _recs()
        assert p["codec"] == codec
        assert p["n_blocks"] == 3  # 20 records / 8 per block

    def test_deterministic_bytes(self):
        a = encode_avro(_recs(), DOC_AVRO_SCHEMA, codec="deflate")
        assert a == encode_avro(_recs(), DOC_AVRO_SCHEMA, codec="deflate")

    def test_union_null_branch(self):
        p = parse_avro(encode_avro(_recs(6), DOC_AVRO_SCHEMA))
        assert [r["lang"] for r in p["records"]] == [
            None, "en", "en", None, "en", "en",
        ]

    def test_sync_mismatch_fails(self):
        blob = bytearray(encode_avro(_recs(), DOC_AVRO_SCHEMA))
        blob[-3] ^= 0xFF  # inside the final block's sync marker
        with pytest.raises(ValueError, match="sync marker"):
            parse_avro(bytes(blob))

    def test_unknown_codec_gates(self):
        blob = encode_avro(_recs(2), DOC_AVRO_SCHEMA)
        patched = blob.replace(b"null", b"nopq", 1)  # avro.codec value
        with pytest.raises(ValueError, match="codec"):
            parse_avro(patched)

    def test_unsupported_type_gates(self):
        schema = {"type": "record", "name": "r",
                  "fields": [{"name": "m", "type": "map"}]}
        with pytest.raises(ValueError, match="unsupported"):
            encode_avro([{"m": {}}], schema)

    def test_record_count_vs_bytes_mismatch_fails(self):
        blob = bytearray(encode_avro(_recs(3), DOC_AVRO_SCHEMA))
        # find the block count varint (zigzag 3 = 0x06) right after the
        # header sync: header = magic + meta map + 16 sync
        p = parse_avro(bytes(blob))
        assert p["n_blocks"] == 1
        at = blob.rfind(b"\x06", 0, len(blob) - 20)
        blob[at] = 0x04  # claim 2 records instead of 3
        with pytest.raises(ValueError, match="remain|truncated|overruns"):
            parse_avro(bytes(blob))

    def test_not_avro(self):
        with pytest.raises(ValueError, match="magic"):
            parse_avro(b"PAR1 definitely parquet")

    def test_truncated_block_fails(self):
        blob = encode_avro(_recs(10), DOC_AVRO_SCHEMA, codec="deflate")
        with pytest.raises(ValueError):
            parse_avro(blob[:-20])


class TestAvroSynth:
    def test_chunk_reassembly(self):
        p = parse_avro(synth_avro(3, "abcde" * 30, "fr"))
        recs = sorted(p["records"], key=lambda r: r["seq"])
        assert "".join(r["chunk"] for r in recs) == "abcde" * 30
        assert all(r["doc_id"] == 3 for r in recs)
        assert p["codec"] == "deflate"
