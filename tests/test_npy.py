"""npy/npz codec (sources/npy.py): cross-validated BOTH directions
against real numpy (np.save/np.savez as test-side oracle — our v1.0
output is byte-identical to np.save's), row range math, and the
validation matrix."""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from pipeline_mf_etl_spark.sources.npy import (
    npy_row_range,
    npy_to_numpy,
    read_npy_header,
    read_npz,
    write_npy,
    write_npz,
)

EMB = np.arange(12, dtype="<f4").reshape(3, 4)
IDS = np.array([10, 20, 30], dtype="<i8")


class TestNpyBothDirections:
    def test_byte_identical_to_np_save(self):
        blob = write_npy("<f4", (3, 4), EMB.tobytes())
        buf = io.BytesIO()
        np.save(buf, EMB)
        assert blob == buf.getvalue()

    def test_np_load_reads_ours_and_we_read_np_save(self):
        for arr, descr in ((EMB, "<f4"), (IDS, "<i8")):
            blob = write_npy(descr, arr.shape, arr.tobytes())
            np.testing.assert_array_equal(np.load(io.BytesIO(blob)), arr)
            buf = io.BytesIO()
            np.save(buf, arr)
            np.testing.assert_array_equal(npy_to_numpy(buf.getvalue()), arr)

    def test_row_range_math(self):
        blob = write_npy("<f4", (3, 4), EMB.tobytes())
        meta = read_npy_header(blob)
        for i in range(3):
            off, ln = npy_row_range(meta, i)
            assert blob[off : off + ln] == EMB[i].tobytes()
        with pytest.raises(ValueError, match="outside"):
            npy_row_range(meta, 3)

    def test_v2_header_reads(self):
        """numpy emits v2.0 when the header is large; synthesize one."""
        blob = bytearray(write_npy("<f4", (3, 4), EMB.tobytes()))
        (hlen,) = struct.unpack_from("<H", blob, 8)
        v2 = (
            blob[:6]
            + bytes((2, 0))
            + struct.pack("<I", hlen)
            + blob[10:]
        )
        np.testing.assert_array_equal(npy_to_numpy(bytes(v2)), EMB)


class TestNpyValidation:
    def test_rejects(self):
        good = write_npy("<f4", (3, 4), EMB.tobytes())
        with pytest.raises(ValueError, match="bad magic"):
            read_npy_header(b"\x93NUMPZ" + good[6:])
        with pytest.raises(ValueError, match="version"):
            read_npy_header(good[:6] + bytes((9, 0)) + good[8:])
        with pytest.raises(ValueError, match="imply"):
            read_npy_header(good[:-4])  # truncated data
        with pytest.raises(ValueError, match="unsupported descr"):
            write_npy(">f4", (1,), b"\x00" * 4)
        # fortran_order True rejects (patch the header text)
        bad = good.replace(b"'fortran_order': False", b"'fortran_order': True ")
        with pytest.raises(ValueError, match="fortran"):
            read_npy_header(bad)
        # pickled object arrays never parse
        obj = io.BytesIO()
        np.save(obj, np.array([{"a": 1}], dtype=object), allow_pickle=True)
        with pytest.raises(ValueError, match="descr"):
            read_npy_header(obj.getvalue())


class TestNpz:
    def test_np_load_reads_our_npz(self):
        z = write_npz(
            {
                "embedding": ("<f4", (3, 4), EMB.tobytes()),
                "vec_id": ("<i8", (3,), IDS.tobytes()),
            }
        )
        loaded = np.load(io.BytesIO(z))
        assert sorted(loaded.files) == ["embedding", "vec_id"]
        np.testing.assert_array_equal(loaded["embedding"], EMB)
        np.testing.assert_array_equal(loaded["vec_id"], IDS)

    def test_we_read_np_savez_and_compressed(self):
        for saver in (np.savez, np.savez_compressed):
            buf = io.BytesIO()
            saver(buf, embedding=EMB, vec_id=IDS)
            m = read_npz(buf.getvalue())
            assert m["embedding"]["shape"] == (3, 4)
            np.testing.assert_array_equal(
                npy_to_numpy(m["embedding"]["payload"]), EMB
            )
            assert m["embedding"]["stored"] == (saver is np.savez)

    def test_stored_members_are_range_addressable(self):
        z = write_npz({"embedding": ("<f4", (3, 4), EMB.tobytes())})
        e = read_npz(z)["embedding"]
        assert e["stored"]
        off, ln = npy_row_range(e, 2)
        assert z[e["member_offset"] + off : e["member_offset"] + off + ln] == EMB[2].tobytes()

    def test_zip_integrity_is_inherited(self):
        """A flipped byte inside a member's data fails the shared ZIP
        walk's CRC-32 before any npy parsing happens."""
        z = bytearray(write_npz({"embedding": ("<f4", (3, 4), EMB.tobytes())}))
        e = read_npz(bytes(z))["embedding"]
        z[e["member_offset"] + e["data_start"] + 5] ^= 0xFF
        with pytest.raises(ValueError, match="CRC-32"):
            read_npz(bytes(z))

    def test_non_npy_member_rejects(self):
        from pipeline_mf_etl_spark.sources.zipshard import STORED, encode_zip

        z = encode_zip([("readme.txt", b"hi", STORED)])
        with pytest.raises(ValueError, match="non-npy"):
            read_npz(z)


class TestPropertyRoundtrip:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        descr=st.sampled_from(["<f8", "<f4", "<i8", "<i4", "<i2", "|u1"]),
        rows=st.integers(min_value=0, max_value=6),
        cols=st.integers(min_value=0, max_value=5),
    )
    def test_any_2d_array_roundtrips_and_np_load_agrees(self, descr, rows, cols):
        arr = np.arange(rows * cols).astype(descr).reshape(rows, cols)
        blob = write_npy(descr, (rows, cols), arr.tobytes())
        np.testing.assert_array_equal(npy_to_numpy(blob), arr)
        np.testing.assert_array_equal(np.load(io.BytesIO(blob)), arr)
        buf = io.BytesIO()
        np.save(buf, arr)
        assert blob == buf.getvalue()  # byte-identical, every shape
