"""LZ4 frame codec tests: xxHash32 against published vectors, block
round-trips (compressible / incompressible / overlapping matches),
frame option combos, every corruption gate, the compressor's
end-of-block rules, and the c5 oracle parity + plan shape."""

from __future__ import annotations

import random

import pytest

from tests.conftest import canonical_rows

from pipeline_mf_etl_spark.queries import all_queries
from pipeline_mf_etl_spark.sources.lz4frame import (
    decode_lz4_frame,
    encode_lz4_frame,
    lz4_block_compress,
    lz4_block_decompress,
    synth_lz4_content,
    xxh32,
)

SF_ORACLE = "/root/testdata/sf0.01"


class TestXxh32:
    def test_published_vectors(self):
        assert xxh32(b"") == 0x02CC5D05
        assert xxh32(b"abc") == 0x32D153FF

    def test_seed_changes_hash(self):
        assert xxh32(b"abc", seed=1) != xxh32(b"abc")

    def test_all_code_paths(self):
        # >=16 bytes (lane loop), 4-byte tail, byte tail — one string
        # exercising all three, stable across runs
        data = b"0123456789abcdefXYZW!?"
        assert xxh32(data) == xxh32(bytes(data))


class TestLz4Block:
    def test_round_trips(self):
        rng = random.Random(3)
        cases = [
            b"",
            b"a",
            b"abcd" * 200,
            bytes(rng.randrange(256) for _ in range(5000)),
            b"x" * 1000,  # overlap copies (offset 1)
            (b"hello world! " * 80)[:1000],
            b"ab" * 7,  # too short for matches (mflimit)
        ]
        for src in cases:
            assert lz4_block_decompress(lz4_block_compress(src), 65536) == src

    def test_compresses_for_real(self):
        assert len(lz4_block_compress(b"abcd" * 200)) < 40

    def test_end_of_block_rules(self):
        # the final sequence must be literals-only: decoding must hit
        # the literals-equal-end branch, and the last 5 bytes of any
        # input survive verbatim
        src = b"q" * 100 + b"tail!"
        blk = lz4_block_compress(src)
        assert lz4_block_decompress(blk, 65536)[-5:] == b"tail!"

    def test_truncated_block_fails(self):
        blk = lz4_block_compress(b"abcd" * 200)
        with pytest.raises(ValueError):
            lz4_block_decompress(blk[:-2], 65536)

    def test_bad_offset_fails(self):
        # token: 1 literal + match(len 4); offset 9 points before start
        blk = bytes([0x10, ord("a"), 9, 0])
        with pytest.raises(ValueError, match="offset"):
            lz4_block_decompress(blk, 65536)

    def test_block_max_enforced(self):
        blk = lz4_block_compress(b"z" * 5000)
        with pytest.raises(ValueError, match="block max"):
            lz4_block_decompress(blk, 1024)


class TestLz4Frame:
    def test_option_combos_round_trip(self):
        for i in range(12):
            content = synth_lz4_content(f"doc {i} body " * (1 + 17 * i))
            frame = encode_lz4_frame(
                content,
                block_size=1024,
                block_checksum=bool(i % 2),
                content_checksum=bool(i % 3),
            )
            got = decode_lz4_frame(frame)
            assert got["content"] == content
            assert got["n_blocks"] == -(-len(content) // 1024)
            assert got["had_block_checksums"] == bool(i % 2)
            assert got["had_content_checksum"] == bool(i % 3)

    def test_incompressible_blocks_stored_raw(self):
        rng = random.Random(9)
        content = bytes(rng.randrange(256) for _ in range(3000))
        got = decode_lz4_frame(encode_lz4_frame(content, block_size=1024))
        assert got["content"] == content
        assert got["n_stored_blocks"] == got["n_blocks"]  # all raw

    def test_bad_magic_fails(self):
        with pytest.raises(ValueError, match="magic"):
            decode_lz4_frame(b"\x00\x11\x22\x33rest")

    def test_header_checksum_gate(self):
        fr = bytearray(encode_lz4_frame(b"q" * 50))
        fr[5] ^= 0x08  # flip the C.Size flag under the HC byte
        with pytest.raises(ValueError, match="header checksum|reserved"):
            decode_lz4_frame(bytes(fr))

    def test_block_checksum_gate(self):
        fr = bytearray(encode_lz4_frame(b"block body " * 30, block_checksum=True))
        at = fr.find(b"block")
        fr[at] ^= 0xFF
        with pytest.raises(ValueError, match="checksum"):
            decode_lz4_frame(bytes(fr))

    def test_content_checksum_gate(self):
        fr = bytearray(encode_lz4_frame(b"corpus text " * 100))
        fr[-1] ^= 0xFF
        with pytest.raises(ValueError, match="content checksum"):
            decode_lz4_frame(bytes(fr))

    def test_linked_blocks_decode(self):
        """B.Indep=0 (block-linked) frames decode since r14: flipping
        the flag on an independent frame is a valid linked frame with
        the same content (history just goes unused); real multi-block
        linked frames (liblz4's default, via pyarrow's binding) decode
        with cross-block matches resolved through the history window."""
        fr = bytearray(encode_lz4_frame(b"q" * 50))
        flg = fr[4] & ~(1 << 5)  # clear B.Indep
        desc = bytes([flg, fr[5]]) + bytes(fr[6:14])
        fr[4] = flg
        fr[14] = (xxh32(desc) >> 8) & 0xFF
        assert decode_lz4_frame(bytes(fr))["content"] == b"q" * 50

        import pyarrow as pa  # test-side oracle only

        raw = b"the quick brown fox jumps over " * 40000  # > 2 blocks
        comp = bytes(pa.Codec("lz4").compress(raw))
        got = decode_lz4_frame(comp)
        assert got["content"] == raw
        assert got["n_blocks"] > 1  # matches actually cross blocks

    def test_trailing_garbage_fails(self):
        fr = encode_lz4_frame(b"q" * 50) + b"junk"
        with pytest.raises(ValueError, match="trailing"):
            decode_lz4_frame(fr)


class TestC5Query:
    def test_c5_matches_oracle(self, spark, duck):
        spec = all_queries()["c5_lz4_extract"]
        sdf = spec.spark(spark, SF_ORACLE)
        srows = [tuple(r) for r in sdf.collect()]
        cur = duck.execute(spec.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        assert sorted(sdf.columns) == sorted(dcols)
        assert len(srows) == len(drows) == 500
        assert canonical_rows(srows, sdf.columns) == canonical_rows(drows, dcols)

    def test_c5_plan_is_single_map_pass(self, spark):
        fn = all_queries()["c5_lz4_extract"].spark
        plan = (
            fn(spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .lower()
        )
        assert "exchange hashpartitioning" not in plan
        assert plan.count("exchange roundrobinpartitioning") <= 1  # fan-out

    def test_real_corpus_blocks_compress(self, spark):
        # on the real corpus the x3 repetition must make most non-tiny
        # frames carry at least one COMPRESSED block (the compressor is
        # real, not a literal shell) — the column the oracle cannot
        # replay, asserted here instead
        from pipeline_mf_etl_spark.sources.lz4frame import (
            extract_lz4_documents,
            with_lz4_payload,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        docs = load_table(spark, SF_ORACLE, "documents").limit(100)
        out = extract_lz4_documents(with_lz4_payload(docs)).collect()
        big = [r for r in out if r["content_size"] >= 64]
        assert big and all(r["n_compressed_blocks"] >= 1 for r in big)


class TestLz4Stream:
    def test_drop_zone_stream_with_corrupt_shard(self, spark, tmp_path):
        """Streaming a .jsonl.lz4 drop-zone: good shards parse against
        the documents contract, bad lines and a CORRUPT frame become
        reject rows — never a wedged stream (the checkpointed source
        would replay a failing file forever)."""
        import json

        from pipeline_mf_etl_spark.streaming.transforms import (
            read_compressed_jsonl_stream,
        )

        zone = tmp_path / "lz4zone"
        zone.mkdir()
        lines = [
            json.dumps({"doc_id": 1, "text": "alpha", "lang": "en",
                        "source": "web", "n_chars": 5}),
            "not json at all {",
            json.dumps({"doc_id": 2, "text": "beta"}),
            # non-integer ids/counters surface as NULL, never coerce
            # (JSON true would int() to 1, 1.7 would truncate to 1)
            json.dumps({"doc_id": 4, "text": "delta", "n_chars": True}),
            json.dumps({"doc_id": 1.7, "text": "epsilon"}),
        ]
        (zone / "shard-0.jsonl.lz4").write_bytes(
            encode_lz4_frame("\n".join(lines).encode())
        )
        good = encode_lz4_frame(b'{"doc_id": 3, "text": "gamma"}\n')
        (zone / "shard-1.jsonl.lz4").write_bytes(good)
        (zone / "shard-2.jsonl.lz4").write_bytes(good[:-2])  # truncated
        (zone / "ignored.jsonl").write_text("{}")  # glob-filtered

        q = (
            read_compressed_jsonl_stream(spark, str(zone), codec="lz4")
            .writeStream.format("memory")
            .queryName("lz4_ingest")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from lz4_ingest").collect()
        docs = {r["doc_id"]: r for r in rows if r["reject_reason"] is None}
        rejects = [r for r in rows if r["reject_reason"] is not None]
        assert set(docs) == {1, 2, 3, 4, None}
        assert docs[1]["text"] == "alpha" and docs[1]["n_chars"] == 5
        assert docs[2]["lang"] is None  # missing keys are data, not errors
        assert docs[4]["n_chars"] is None  # JSON true is not a count
        assert docs[None]["text"] == "epsilon"  # float id -> NULL, not 1
        reasons = sorted(r["reject_reason"].split(":")[0] for r in rejects)
        assert reasons == ["BAD_FRAME", "BAD_JSON"]


class TestLz4CorruptionFuzz:
    def test_every_byte_flip_is_loud_or_harmless(self):
        """With block+content checksums on, any byte flip must raise or
        leave the decoded content bit-identical — never silently corrupt."""
        rng = random.Random(17)
        data = b"corruption fuzz body " * 200
        frame = bytearray(
            encode_lz4_frame(data, block_size=512, block_checksum=True,
                             content_checksum=True)
        )
        bad = 0
        for _ in range(300):
            at = rng.randrange(len(frame))
            bit = 1 << rng.randrange(8)
            frame[at] ^= bit
            try:
                out = decode_lz4_frame(bytes(frame))
                assert out["content"] == data
            except (ValueError, NotImplementedError, IndexError, OverflowError):
                bad += 1
            finally:
                frame[at] ^= bit
        assert bad > 250
