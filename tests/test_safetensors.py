"""safetensors codec (sources/safetensors.py): known-vector pinning
(no safetensors lib in the container — the tf.Example pattern), numpy
round-trips, the spec's full validation matrix, and row range math."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from pipeline_mf_etl_spark.sources.safetensors import (
    decode_safetensors_header,
    encode_safetensors,
    tensor_row_range,
    tensor_to_numpy,
)


def _blob(meta=None):
    emb = np.arange(12, dtype="<f4").reshape(3, 4)
    ids = np.array([10, 20, 30], dtype="<i8")
    return (
        encode_safetensors(
            {
                "embedding": ("F32", [3, 4], emb.tobytes()),
                "vec_id": ("I64", [3], ids.tobytes()),
            },
            metadata=meta,
        ),
        emb,
        ids,
    )


class TestKnownVector:
    def test_exact_bytes(self):
        """Hand-assembled: 8-byte LE header length, compact sorted-key
        JSON, tensors tiling the data region in name order."""
        blob, emb, ids = self._ = _blob()
        (n,) = struct.unpack_from("<Q", blob, 0)
        header = json.loads(blob[8 : 8 + n])
        assert header == {
            "embedding": {
                "dtype": "F32",
                "shape": [3, 4],
                "data_offsets": [0, 48],
            },
            "vec_id": {"dtype": "I64", "shape": [3], "data_offsets": [48, 72]},
        }
        assert blob[8 + n : 8 + n + 48] == emb.tobytes()
        assert blob[8 + n + 48 :] == ids.tobytes()

    def test_roundtrip_and_metadata(self):
        blob, emb, ids = _blob(meta={"source": "unit"})
        meta = decode_safetensors_header(blob)
        assert meta["metadata"] == {"source": "unit"}
        np.testing.assert_array_equal(tensor_to_numpy(blob, meta, "embedding"), emb)
        np.testing.assert_array_equal(tensor_to_numpy(blob, meta, "vec_id"), ids)

    def test_row_range_is_the_row(self):
        blob, emb, ids = _blob()
        meta = decode_safetensors_header(blob)
        for i in range(3):
            off, ln = tensor_row_range(meta, "embedding", i)
            assert ln == 16
            assert blob[off : off + ln] == emb[i].tobytes()
            off, ln = tensor_row_range(meta, "vec_id", i)
            assert blob[off : off + ln] == ids[i : i + 1].tobytes()
        with pytest.raises(ValueError, match="outside"):
            tensor_row_range(meta, "embedding", 3)


class TestValidationMatrix:
    def _raw(self, header: dict, body: bytes) -> bytes:
        hj = json.dumps(header, separators=(",", ":")).encode()
        return struct.pack("<Q", len(hj)) + hj + body

    def test_gap_overlap_trailing_all_reject(self):
        t = {"dtype": "F32", "shape": [1], "data_offsets": [0, 4]}
        good = self._raw({"a": t}, b"\x00" * 4)
        assert decode_safetensors_header(good)["tensors"]["a"]["shape"] == [1]
        with pytest.raises(ValueError, match="gap or overlap"):
            decode_safetensors_header(
                self._raw(
                    {"a": t, "b": {"dtype": "F32", "shape": [1], "data_offsets": [8, 12]}},
                    b"\x00" * 12,
                )
            )
        with pytest.raises(ValueError, match="gap or overlap"):
            decode_safetensors_header(
                self._raw(
                    {"a": t, "b": {"dtype": "F32", "shape": [1], "data_offsets": [2, 6]}},
                    b"\x00" * 6,
                )
            )
        with pytest.raises(ValueError, match="trailing"):
            decode_safetensors_header(self._raw({"a": t}, b"\x00" * 8))

    def test_size_dtype_shape_offsets_reject(self):
        with pytest.raises(ValueError, match="inconsistent"):
            decode_safetensors_header(
                self._raw(
                    {"a": {"dtype": "F32", "shape": [2], "data_offsets": [0, 4]}},
                    b"\x00" * 4,
                )
            )
        with pytest.raises(ValueError, match="unsupported"):
            decode_safetensors_header(
                self._raw(
                    {"a": {"dtype": "BF16", "shape": [2], "data_offsets": [0, 4]}},
                    b"\x00" * 4,
                )
            )
        with pytest.raises(ValueError, match="bad data_offsets"):
            decode_safetensors_header(
                self._raw(
                    {"a": {"dtype": "F32", "shape": [1], "data_offsets": [0]}},
                    b"\x00" * 4,
                )
            )
        with pytest.raises(ValueError, match="not valid JSON"):
            decode_safetensors_header(struct.pack("<Q", 4) + b"{{{{")
        with pytest.raises(ValueError, match="not a JSON object"):
            decode_safetensors_header(struct.pack("<Q", 2) + b"[]")
        with pytest.raises(ValueError, match="overruns"):
            decode_safetensors_header(struct.pack("<Q", 100) + b"{}")
        with pytest.raises(ValueError, match="shorter"):
            decode_safetensors_header(b"\x01")
        with pytest.raises(ValueError, match="exceeds cap"):
            decode_safetensors_header(struct.pack("<Q", 1 << 40) + b"{}")

    def test_encoder_rejects_bad_input(self):
        with pytest.raises(ValueError, match="imply"):
            encode_safetensors({"a": ("F32", [2], b"\x00" * 4)})
        with pytest.raises(ValueError, match="unsupported dtype"):
            encode_safetensors({"a": ("BF16", [1], b"\x00" * 2)})
        with pytest.raises(ValueError, match="str->str"):
            encode_safetensors(
                {"a": ("F32", [1], b"\x00" * 4)}, metadata={"k": 1}
            )

    def test_every_header_byte_flip_is_loud_or_value_changing(self):
        """No checksum in the format — but a flip in the 8-byte length
        or anywhere in the JSON must either raise or change the parsed
        header (JSON has no inert bytes in compact form)."""
        blob, _, _ = _blob()
        (n,) = struct.unpack_from("<Q", blob, 0)
        base = decode_safetensors_header(blob)
        for i in range(8 + n):
            bad = bytearray(blob)
            bad[i] ^= 0xFF
            try:
                got = decode_safetensors_header(bytes(bad))
            except ValueError:
                continue
            assert got != base, f"flip at {i} silently absorbed"


class TestF16AndHeaderOnly:
    def test_f16_round_trip(self):
        emb = np.array([[0.5, -1.25], [2.0, 0.0]], dtype="<f2")
        blob = encode_safetensors({"e": ("F16", [2, 2], emb.tobytes())})
        meta = decode_safetensors_header(blob)
        np.testing.assert_array_equal(tensor_to_numpy(blob, meta, "e"), emb)
        off, ln = tensor_row_range(meta, "e", 1)
        assert ln == 4 and blob[off : off + ln] == emb[1].tobytes()

    def test_header_only_decode_with_total_length(self):
        blob, emb, ids = _blob()
        (n,) = struct.unpack_from("<Q", blob, 0)
        head = blob[: 8 + n]
        meta = decode_safetensors_header(head, total_length=len(blob))
        assert meta["tensors"]["embedding"]["shape"] == [3, 4]
        # a lying total_length still trips the tiling check
        with pytest.raises(ValueError, match="trailing|inconsistent"):
            decode_safetensors_header(head, total_length=len(blob) + 8)


class TestPropertyRoundtrip:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.dictionaries(
            st.text(
                alphabet="abcdefghij_", min_size=1, max_size=8
            ).filter(lambda s: s != "__metadata__"),
            st.tuples(
                st.sampled_from(["F32", "I64", "I16", "U8"]),
                st.integers(min_value=0, max_value=5),
            ),
            min_size=0,
            max_size=4,
        )
    )
    def test_any_tensor_set_roundtrips(self, spec):
        import numpy as np

        from pipeline_mf_etl_spark.sources.safetensors import DTYPES

        tensors = {}
        arrays = {}
        for name, (dtype, n) in spec.items():
            itemsize, np_dt = DTYPES[dtype]
            arr = np.arange(n, dtype=np_dt)
            tensors[name] = (dtype, [n], arr.tobytes())
            arrays[name] = arr
        blob = encode_safetensors(tensors, metadata={"k": "v"})
        meta = decode_safetensors_header(blob)
        assert meta["metadata"] == {"k": "v"}
        assert set(meta["tensors"]) == set(tensors)
        for name, arr in arrays.items():
            np.testing.assert_array_equal(
                tensor_to_numpy(blob, meta, name), arr
            )
