"""Arrow IPC codec (sources/arrowipc.py): cross-validated BOTH
directions against real pyarrow (test-side oracle only, the c9/bzip2
pattern — the engine path never imports it), plus footer random
access, compressed bodies through the engine's own LZ4/zstd walks,
strict gates, and corruption sweeps."""

from __future__ import annotations

import io
import struct

import pytest

from pipeline_mf_etl_spark.sources.arrowipc import (
    ArrowField,
    decode_arrow_file,
    decode_arrow_stream,
    encode_arrow_file,
    encode_arrow_stream,
    parse_arrow_footer,
    read_arrow_batch_at,
)

pa = pytest.importorskip("pyarrow")
import pyarrow.ipc as ipc  # noqa: E402


FIELDS = [
    ArrowField("doc_id", True, "int", bits=64),
    ArrowField("text", True, "utf8", bits=32),
    ArrowField("blob", True, "binary", bits=32),
    ArrowField("flag", True, "bool"),
    ArrowField("score", True, "float", bits=32),
    ArrowField("vec", True, "list", child=ArrowField("item", True, "float", bits=32)),
]
COLS = [
    [1, 2, None, 4, -5],
    ["a", "日本語 🎉", None, "", "x" * 300],
    [b"\x00\xff", None, b"", b"xyz", b"\x80"],
    [True, None, False, True, True],
    [1.5, None, -2.25, 0.0, 2.0**90],
    [[1.5, 2.0], [], None, [3.5], [0.0, -1.0, 2.5]],
]

PA_TABLE = pa.table(
    {
        "doc_id": pa.array(COLS[0], pa.int64()),
        "text": pa.array(COLS[1], pa.utf8()),
        "blob": pa.array(COLS[2], pa.binary()),
        "flag": pa.array(COLS[3], pa.bool_()),
        "score": pa.array(COLS[4], pa.float32()),
        "vec": pa.array(COLS[5], pa.list_(pa.float32())),
    }
)


def _pa_stream(table, **opts) -> bytes:
    buf = io.BytesIO()
    w = ipc.new_stream(
        buf, table.schema,
        options=ipc.IpcWriteOptions(**opts) if opts else None,
    )
    w.write_table(table)
    w.close()
    return buf.getvalue()


def _pa_file(table, **opts) -> bytes:
    buf = io.BytesIO()
    w = ipc.new_file(
        buf, table.schema,
        options=ipc.IpcWriteOptions(**opts) if opts else None,
    )
    w.write_table(table)
    w.close()
    return buf.getvalue()


class TestDecodeTheirBytes:
    def test_stream_all_types(self):
        out = decode_arrow_stream(_pa_stream(PA_TABLE))
        assert [f.name for f in out["fields"]] == PA_TABLE.column_names
        assert out["columns"] == COLS

    def test_file_all_types(self):
        out = decode_arrow_file(_pa_file(PA_TABLE))
        assert out["columns"] == COLS

    def test_multi_batch_stream(self):
        buf = io.BytesIO()
        w = ipc.new_stream(buf, PA_TABLE.schema)
        for batch in PA_TABLE.to_batches(max_chunksize=2):
            w.write_batch(batch)
        w.close()
        out = decode_arrow_stream(buf.getvalue())
        assert out["n_batches"] == 3
        assert out["columns"] == COLS

    @pytest.mark.parametrize("comp", ["lz4", "zstd"])
    def test_compressed_bodies_via_own_codecs(self, comp):
        """BodyCompression decodes through the engine's own verified
        LZ4-frame / zstd walks — including liblz4's block-LINKED
        frames."""
        t = pa.table(
            {
                "doc_id": pa.array(range(2000), pa.int64()),
                "text": pa.array(
                    [f"document {i} " * 20 for i in range(2000)], pa.utf8()
                ),
            }
        )
        out = decode_arrow_stream(_pa_stream(t, compression=comp))
        assert out["columns"][0] == list(range(2000))
        assert out["columns"][1][7] == "document 7 " * 20

    def test_dictionary_encoded_columns_decode(self):
        """Dictionary-encoded categoricals (the HuggingFace pattern for
        lang/source columns) resolve through DictionaryBatch messages
        in both containers."""
        vals = ["en", "fr", "en", "de", None, "fr", "en", "de"]
        t = pa.table(
            {
                "doc_id": pa.array(range(8), pa.int64()),
                "lang": pa.array(vals).dictionary_encode(),
            }
        )
        assert decode_arrow_stream(_pa_stream(t))["columns"][1] == vals
        assert decode_arrow_file(_pa_file(t))["columns"][1] == vals

    def test_batch_before_its_dictionary_is_loud(self):
        """A record batch referencing a dictionary id with no prior
        DictionaryBatch must raise, as must an out-of-range index."""
        t = pa.table({"s": pa.array(["a", "b", "a"]).dictionary_encode()})
        blob = _pa_stream(t)
        # surgically drop the dictionary message: schema msg, dict msg,
        # batch msg, EOS — walk the framing and splice the dict out
        import struct as _struct

        msgs = []
        pos = 0
        while pos < len(blob):
            (meta_len,) = _struct.unpack_from("<i", blob, pos + 4)
            if meta_len == 0:
                msgs.append(blob[pos:])
                break
            # find body length by walking to the next continuation
            nxt = blob.find(b"\xff\xff\xff\xff", pos + 8 + meta_len)
            msgs.append(blob[pos:nxt])
            pos = nxt
        assert len(msgs) == 4  # schema, dict, batch, EOS
        with pytest.raises(ValueError, match="before its DictionaryBatch"):
            decode_arrow_stream(msgs[0] + msgs[2] + msgs[3])

    def test_unsupported_type_gates_loudly(self):
        t = pa.table({"s": pa.array([{"x": 1}], pa.struct([("x", pa.int64())]))})
        with pytest.raises(ValueError, match="Struct"):
            decode_arrow_stream(_pa_stream(t))


class TestTheyDecodeOurBytes:
    def test_stream_read_by_pyarrow(self):
        blob = encode_arrow_stream(FIELDS, COLS, batch_rows=2)
        t = ipc.open_stream(io.BytesIO(blob)).read_all()
        assert t.num_rows == 5
        assert t.to_pydict() == PA_TABLE.to_pydict()
        assert t.schema == PA_TABLE.schema

    def test_file_read_by_pyarrow(self):
        blob = encode_arrow_file(FIELDS, COLS, batch_rows=2)
        r = ipc.open_file(io.BytesIO(blob))
        assert r.num_record_batches == 3
        assert r.read_all().to_pydict() == PA_TABLE.to_pydict()
        # pyarrow random access agrees per batch
        assert r.get_batch(1).to_pydict()["doc_id"] == [None, 4]

    def test_self_roundtrip(self):
        for enc, dec in [
            (encode_arrow_stream, decode_arrow_stream),
            (encode_arrow_file, decode_arrow_file),
        ]:
            out = dec(enc(FIELDS, COLS, batch_rows=3))
            assert out["columns"] == COLS


class TestRandomAccess:
    def test_footer_blocks_point_read(self):
        """A footer block's byte range alone decodes its batch — the
        range-GET unit (no other file bytes touched)."""
        blob = encode_arrow_file(FIELDS, COLS, batch_rows=2)
        meta = parse_arrow_footer(blob)
        assert len(meta["blocks"]) == 3
        got: list = []
        for off, ml, bl in meta["blocks"]:
            window = blob[off : off + ml + bl]  # simulated range GET
            cols = read_arrow_batch_at(window, 0, ml, bl, meta["fields"])
            got += list(zip(*cols))
        assert [list(c) for c in zip(*got)] == COLS

    def test_pyarrow_footer_blocks_point_read(self):
        """Same point-read against PYARROW-written files."""
        blob = _pa_file(PA_TABLE)
        meta = parse_arrow_footer(blob)
        off, ml, bl = meta["blocks"][0]
        cols = read_arrow_batch_at(blob[off : off + ml + bl], 0, ml, bl, meta["fields"])
        assert cols[0] == COLS[0]


class TestCorruption:
    def test_every_byte_flip_of_metadata_is_loud_or_value_changing(self):
        """Arrow metadata carries no checksum (the framing is
        length-guarded, values are positional), so the contract is
        weaker than the codec families: a flip must either raise or
        change decoded values/schema — it must never be silently
        ABSORBED into an identical decode... except in genuinely inert
        bytes (alignment padding, the unused table-size vtable entry).
        Assert the STRUCTURAL sites raise: magic, lengths, offsets."""
        blob = encode_arrow_file(FIELDS, COLS)
        for pos in [0, 1, 7]:  # file magic
            bad = bytearray(blob)
            bad[pos] ^= 0xFF
            with pytest.raises(ValueError):
                decode_arrow_file(bytes(bad))
        bad = bytearray(blob)
        bad[-1] ^= 0xFF  # trailer magic
        with pytest.raises(ValueError):
            decode_arrow_file(bytes(bad))
        bad = bytearray(blob)
        bad[-7] ^= 0xFF  # footer length
        with pytest.raises(ValueError):
            decode_arrow_file(bytes(bad))

    def test_truncation_is_loud(self):
        stream = encode_arrow_stream(FIELDS, COLS)
        for cut in range(8, len(stream) - 1, 7):
            try:
                out = decode_arrow_stream(stream[:cut])
                # a cut exactly after a whole batch parses as a shorter
                # stream; values must still be a prefix
                for col, full in zip(out["columns"], COLS):
                    assert col == full[: len(col)]
            except ValueError:
                pass

    def test_compressed_length_prefix_mismatch_is_loud(self):
        """A lying uncompressed-length prefix in a compressed buffer
        must raise (the decompressed-size cross-check), exercised at
        the unit level on a crafted body."""
        from pipeline_mf_etl_spark.sources.arrowipc import _decompress_body
        from pipeline_mf_etl_spark.sources.lz4frame import encode_lz4_frame

        class _FakeComp:
            def u8(self, slot, default=0):
                return 0  # codec LZ4_FRAME, method BUFFER

        class _FakeHeader:
            def table(self, slot):
                return _FakeComp() if slot == 3 else None

        payload = encode_lz4_frame(b"q" * 64)
        body = struct.pack("<q", 63) + payload  # prefix lies: 63 != 64
        with pytest.raises(ValueError, match="disagrees"):
            _decompress_body(_FakeHeader(), body, [(0, len(body))])


class TestEncoderStrictness:
    def test_ragged_columns_raise(self):
        with pytest.raises(ValueError, match="ragged"):
            encode_arrow_stream(FIELDS[:2], [[1], ["a", "b"]])

    def test_unsupported_kind_raises(self):
        with pytest.raises(ValueError):
            encode_arrow_stream([ArrowField("x", True, "struct")], [[1]])


class TestPropertyRoundtrip:
    """Hypothesis: ANY column set of the supported subset survives
    encode->decode on both containers, and pyarrow agrees with our
    decode of our own bytes."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _values = st.one_of(
        st.none(),
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    )

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=9),
        data=st.data(),
    )
    def test_int_utf8_list_roundtrip(self, n, data):
        from hypothesis import strategies as st

        ints = data.draw(
            st.lists(self._values, min_size=n, max_size=n)
        )
        texts = data.draw(
            st.lists(
                st.one_of(st.none(), st.text(max_size=12)),
                min_size=n, max_size=n,
            )
        )
        vecs = data.draw(
            st.lists(
                st.one_of(
                    st.none(),
                    st.lists(
                        st.integers(min_value=-1000, max_value=1000).map(float),
                        max_size=4,
                    ),
                ),
                min_size=n, max_size=n,
            )
        )
        fields = [
            ArrowField("i", True, "int", bits=64),
            ArrowField("t", True, "utf8", bits=32),
            ArrowField(
                "v", True, "list",
                child=ArrowField("item", True, "float", bits=32),
            ),
        ]
        cols = [ints, texts, vecs]
        for enc, dec in [
            (encode_arrow_stream, decode_arrow_stream),
            (encode_arrow_file, decode_arrow_file),
        ]:
            out = dec(enc(fields, cols, batch_rows=3))
            assert out["columns"] == cols
        if n:  # pyarrow cross-check on the file container
            r = ipc.open_file(
                io.BytesIO(encode_arrow_file(fields, cols))
            ).read_all()
            assert r.to_pydict() == {"i": ints, "t": texts, "v": vecs}
