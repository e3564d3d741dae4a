"""Snappy codec tests: CRC-32C against the published check value, raw
block round-trips (all tag kinds, overlaps, extended literal lengths),
framing option combos, every corruption/reserved gate, and the c6
oracle parity + plan shape."""

from __future__ import annotations

import random

import pytest

from tests.conftest import canonical_rows

from pipeline_mf_etl_spark.queries import all_queries
from pipeline_mf_etl_spark.sources.snappyframe import (
    crc32c,
    decode_snappy_frame,
    encode_snappy_frame,
    snappy_compress,
    snappy_decompress,
)

SF_ORACLE = "/root/testdata/sf0.01"


class TestCrc32c:
    def test_published_check_value(self):
        assert crc32c(b"123456789") == 0xE3069283

    def test_empty_and_single(self):
        assert crc32c(b"") == 0
        assert crc32c(b"a") != crc32c(b"b")


class TestSnappyBlock:
    def test_round_trips(self):
        rng = random.Random(5)
        cases = [
            b"",
            b"a",
            b"abcd" * 400,
            bytes(rng.randrange(256) for _ in range(5000)),
            b"x" * 2000,  # overlap copies
            (b"hello snappy! " * 100)[:1500],
            b"xy" * 3,  # too short for matches
            b"L" * 59 + b"unique-tail-" + bytes(range(61)),  # 60/61 literal tags
        ]
        for src in cases:
            assert snappy_decompress(snappy_compress(src)) == src, len(src)

    def test_compresses_for_real(self):
        assert len(snappy_compress(b"abcd" * 400)) < 100

    def test_copy1_and_copy4_decode(self):
        # hand-built: 4 literals then copy-1 (len 4, offset 4), then
        # copy-4 (len 4, offset 4) — both kinds the encoder never emits
        blk = bytes([12]) + bytes([3 << 2]) + b"wxyz"
        blk += bytes([0b01 | (0 << 2)]) + bytes([4])  # copy-1 len 4 off 4
        blk += bytes([0b11 | (3 << 2)]) + (4).to_bytes(4, "little")
        assert snappy_decompress(blk) == b"wxyz" * 3

    def test_declared_size_mismatch_fails(self):
        blk = bytearray(snappy_compress(b"abc" * 10))
        blk[0] += 1  # inflate the declared size varint
        with pytest.raises(ValueError, match="declared"):
            snappy_decompress(bytes(blk))

    def test_bad_offset_fails(self):
        blk = bytes([8, 0 << 2, ord("a"), 0b10 | (3 << 2), 9, 0])
        with pytest.raises(ValueError, match="offset"):
            snappy_decompress(blk)


class TestSnappyFrame:
    def test_option_combos_round_trip(self):
        for i in range(15):
            content = (f"snappy doc {i} body " * (1 + 13 * i)).encode()
            fr = encode_snappy_frame(
                content,
                with_padding=i % 7 == 0,
                force_uncompressed=i % 5 == 0,
            )
            got = decode_snappy_frame(fr)
            assert got["content"] == content
            assert got["n_chunks"] == -(-len(content) // 1024)
            assert got["n_skipped_chunks"] == (1 if i % 7 == 0 else 0)
            if i % 5 == 0:
                assert got["n_uncompressed_chunks"] == got["n_chunks"]

    def test_bad_identifier_fails(self):
        with pytest.raises(ValueError, match="sNaPpY"):
            decode_snappy_frame(b"\xff\x06\x00\x00sNappy" + b"rest")

    def test_crc_gate(self):
        fr = bytearray(encode_snappy_frame(b"corpus body " * 90))
        at = fr.find(b"corpus")
        fr[at] ^= 0xFF
        with pytest.raises(ValueError):
            decode_snappy_frame(bytes(fr))

    def test_reserved_unskippable_gates(self):
        fr = encode_snappy_frame(b"q" * 10) + b"\x02\x01\x00\x00z"
        with pytest.raises(ValueError, match="reserved"):
            decode_snappy_frame(fr)

    def test_skippable_chunks_skipped(self):
        fr = encode_snappy_frame(b"q" * 10) + b"\x80\x03\x00\x00abc"
        got = decode_snappy_frame(fr)
        assert got["content"] == b"q" * 10
        assert got["n_skipped_chunks"] == 1

    def test_truncated_chunk_fails(self):
        fr = encode_snappy_frame(b"q" * 500)
        with pytest.raises(ValueError, match="overruns"):
            decode_snappy_frame(fr[:-3])


class TestC6Query:
    def test_c6_matches_oracle(self, spark, duck):
        spec = all_queries()["c6_snappy_extract"]
        sdf = spec.spark(spark, SF_ORACLE)
        srows = [tuple(r) for r in sdf.collect()]
        cur = duck.execute(spec.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        assert sorted(sdf.columns) == sorted(dcols)
        assert len(srows) == len(drows) == 500
        assert canonical_rows(srows, sdf.columns) == canonical_rows(drows, dcols)

    def test_c6_plan_is_single_map_pass(self, spark):
        fn = all_queries()["c6_snappy_extract"].spark
        plan = (
            fn(spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .lower()
        )
        assert "exchange hashpartitioning" not in plan
        assert plan.count("exchange roundrobinpartitioning") <= 1  # fan-out

    def test_real_corpus_chunks_compress(self, spark):
        # the column the oracle cannot replay: unforced docs' full-size
        # chunks must come back COMPRESSED (the x3 repetition guarantees
        # in-chunk matches), forced docs all raw
        from pipeline_mf_etl_spark.sources.readers import load_table
        from pipeline_mf_etl_spark.sources.snappyframe import (
            extract_snappy_documents,
            with_snappy_payload,
        )

        docs = load_table(spark, SF_ORACLE, "documents").limit(100)
        out = extract_snappy_documents(with_snappy_payload(docs)).collect()
        for r in out:
            if r["forced_raw"]:
                assert r["n_uncompressed_chunks"] == r["n_chunks"]
            elif r["content_size"] >= 64:
                assert r["n_uncompressed_chunks"] < r["n_chunks"]

    def test_corpus_texts_exceed_compressibility_threshold(self):
        """ADVICE r12: forced_raw is derived from stream accounting and
        matches the oracle's doc_id % 5 arithmetic ONLY because every
        unforced doc compresses at least one chunk. A text of length
        <= 1 cannot form a 4-byte match even tripled, which would flip
        the derived column and red the c6 row. Pin the data-side
        assumption: every documents.text in the oracle corpora is long
        enough (>= 4 chars; observed minimum is 44) that the x3
        synthesis repetition guarantees a match."""
        import duckdb

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            (mn,) = duckdb.execute(
                f"SELECT min(length(text)) FROM read_parquet('{sf}/documents.parquet')"
            ).fetchone()
            assert mn >= 4, f"{sf}: min text length {mn} below snappy match size"


class TestSnappyStream:
    def test_drop_zone_stream(self, spark, tmp_path):
        import json

        from pipeline_mf_etl_spark.streaming.transforms import (
            read_compressed_jsonl_stream,
        )

        zone = tmp_path / "szzone"
        zone.mkdir()
        payload = "\n".join(
            json.dumps({"doc_id": i, "text": f"doc {i}"}) for i in range(5)
        ).encode()
        (zone / "a.jsonl.sz").write_bytes(encode_snappy_frame(payload))
        bad = bytearray(encode_snappy_frame(b'{"doc_id": 9, "text": "x"}\n'))
        bad[-1] ^= 0xFF  # CRC mismatch -> BAD_FRAME reject, not a wedge
        (zone / "b.jsonl.sz").write_bytes(bytes(bad))

        q = (
            read_compressed_jsonl_stream(spark, str(zone), codec="snappy")
            .writeStream.format("memory")
            .queryName("sz_ingest")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from sz_ingest").collect()
        docs = sorted(
            r["doc_id"] for r in rows if r["reject_reason"] is None
        )
        assert docs == [0, 1, 2, 3, 4]
        assert any(
            r["reject_reason"] and r["reject_reason"].startswith("BAD_FRAME")
            for r in rows
        )


class TestSnappyCorruptionFuzz:
    def test_every_byte_flip_is_loud_or_accounted(self):
        """Masked CRC-32C guards every data chunk's BYTES, but the
        framing format has no stream-wide integrity: a data chunk whose
        TYPE byte flips into the skippable range (e.g. 0x00 -> 0x80) is
        dropped per spec — silently at the content level. The loss is
        visible in the chunk ACCOUNTING (n_chunks drops / n_skipped
        rises), which is exactly why the c6 query carries those columns.
        Every flip must therefore raise, round-trip bit-identical, or
        show up in the accounting — never corrupt content with clean
        accounting."""
        import random as _random

        rng = _random.Random(17)
        data = b"corruption fuzz body " * 200
        frame = bytearray(encode_snappy_frame(data, chunk_size=512))
        clean = decode_snappy_frame(bytes(frame))
        n_chunks, n_skipped = clean["n_chunks"], clean["n_skipped_chunks"]
        bad = accounted = 0
        for _ in range(300):
            at = rng.randrange(len(frame))
            bit = 1 << rng.randrange(8)
            frame[at] ^= bit
            try:
                out = decode_snappy_frame(bytes(frame))
                if out["content"] != data:
                    assert (
                        out["n_chunks"] != n_chunks
                        or out["n_skipped_chunks"] != n_skipped
                    ), f"silent corruption with clean accounting at byte {at}"
                    accounted += 1
            except (ValueError, NotImplementedError, IndexError, OverflowError):
                bad += 1
            finally:
                frame[at] ^= bit
        assert bad > 200
        assert accounted >= 1  # the documented skippable-morph channel
