"""NumPy ``.npy`` / ``.npz`` — dependency-free reader/writer for the
most common ad-hoc embedding-dump format in ML research (every
``np.save``/``np.savez`` artifact: embedding matrices, label arrays,
score dumps).

Implements the PUBLIC ``.npy`` format spec (numpy/lib/format.py's
documented layout):

- magic ``\\x93NUMPY`` + (major, minor) version;
- v1.0: uint16-LE header length / v2.0: uint32-LE (both read; v1.0
  written unless the header needs v2.0), header padded with spaces to
  64-byte alignment and terminated by ``\\n``;
- the header is a Python dict literal ``{'descr': '<f4',
  'fortran_order': False, 'shape': (n, d)}`` — parsed here with
  ``ast.literal_eval`` (never ``eval``) and validated field by field;
- raw C-order little-endian data follows, which (as with safetensors)
  makes a 2-D array ROW-ADDRESSABLE by pure offset arithmetic.

``.npz`` is a ZIP container of ``<name>.npy`` members — composed from
the engine's own ZIP walk (``sources/zipshard.py``: EOCD/central-
directory/local-header cross-checks, CRC-32 verified). Writing uses
STORED members (``np.savez``'s choice), which keeps every array
range-addressable inside the archive; DEFLATE members decode too.

Loud gates: fortran_order (row addressing assumes C order), big-endian
or structured descrs, pickled object arrays (the format's security
trap — never parsed here), header/shape/size disagreements,
truncation. Cross-validated BOTH directions against real numpy in
tests (numpy ships in the container; the engine path only uses it for
array materialization, not IO).

Reference parity: none — engine ADDITION for the training-data
surface, same family as c13/c14/c15.
"""

from __future__ import annotations

import ast
import struct

MAGIC = b"\x93NUMPY"

#: descr -> itemsize for the supported little-endian/byte types
DESCRS = {
    "<f8": 8,
    "<f4": 4,
    "<f2": 2,
    "<i8": 8,
    "<i4": 4,
    "<i2": 2,
    "|i1": 1,
    "|u1": 1,
    "|b1": 1,
}


def _prod(shape: tuple[int, ...]) -> int:
    n = 1
    for s in shape:
        n *= s
    return n


def write_npy(descr: str, shape: tuple[int, ...], raw: bytes) -> bytes:
    """Serialize one array (raw C-order LE bytes) as ``.npy`` v1.0
    (v2.0 automatically when the header exceeds the uint16 field)."""
    if descr not in DESCRS:
        raise ValueError(f"npy: unsupported descr {descr!r}")
    want = _prod(tuple(shape)) * DESCRS[descr]
    if len(raw) != want:
        raise ValueError(
            f"npy: {len(raw)} data bytes, shape/descr imply {want}"
        )
    shape_txt = (
        f"({shape[0]},)" if len(shape) == 1 else f"({', '.join(map(str, shape))})"
    )
    header = (
        f"{{'descr': '{descr}', 'fortran_order': False, "
        f"'shape': {shape_txt}, }}"
    ).encode("latin1")
    # pad so magic+version+len+header is 64-aligned, ending in \n
    base = len(MAGIC) + 2 + 2
    pad = (-(base + len(header) + 1)) % 64
    header += b" " * pad + b"\n"
    if len(header) <= 0xFFFF:
        head = MAGIC + bytes((1, 0)) + struct.pack("<H", len(header))
    else:
        base = len(MAGIC) + 2 + 4
        head = MAGIC + bytes((2, 0)) + struct.pack("<I", len(header))
    return head + header + raw


def read_npy_header(data: bytes) -> dict:
    """Parse + validate the ``.npy`` header. Returns ``{"descr",
    "shape", "itemsize", "data_start"}``; the array bytes are
    ``data[data_start:]`` (length-checked)."""
    if len(data) < 10 or not data.startswith(MAGIC):
        raise ValueError("npy: bad magic")
    major, minor = data[6], data[7]
    if major == 1:
        (hlen,) = struct.unpack_from("<H", data, 8)
        hstart = 10
    elif major in (2, 3):
        if len(data) < 12:
            raise ValueError("npy: truncated v2 header length")
        (hlen,) = struct.unpack_from("<I", data, 8)
        hstart = 12
    else:
        raise ValueError(f"npy: unsupported format version {major}.{minor}")
    if hstart + hlen > len(data):
        raise ValueError("npy: header overruns the payload")
    try:
        header = ast.literal_eval(data[hstart : hstart + hlen].decode("latin1"))
    except Exception as e:
        raise ValueError(f"npy: header is not a dict literal ({e})")
    if not isinstance(header, dict) or set(header) != {
        "descr",
        "fortran_order",
        "shape",
    }:
        raise ValueError("npy: header must have exactly the three spec keys")
    descr, fortran, shape = (
        header["descr"],
        header["fortran_order"],
        header["shape"],
    )
    if descr not in DESCRS:
        raise ValueError(
            f"npy: descr {descr!r} unsupported (big-endian, structured and "
            f"object arrays are out of scope; pickled arrays never parse)"
        )
    if fortran is not False:
        raise ValueError("npy: fortran_order arrays unsupported (need C order)")
    if not isinstance(shape, tuple) or not all(
        isinstance(s, int) and s >= 0 for s in shape
    ):
        raise ValueError(f"npy: bad shape {shape!r}")
    itemsize = DESCRS[descr]
    data_start = hstart + hlen
    want = _prod(shape) * itemsize
    if len(data) - data_start != want:
        raise ValueError(
            f"npy: {len(data) - data_start} data bytes, shape/descr imply {want}"
        )
    return {
        "descr": descr,
        "shape": shape,
        "itemsize": itemsize,
        "data_start": data_start,
    }


def npy_to_numpy(data: bytes):
    """Materialize a ``.npy`` payload as a numpy array."""
    import numpy as np

    meta = read_npy_header(data)
    return np.frombuffer(
        data[meta["data_start"] :], dtype=meta["descr"]
    ).reshape(meta["shape"])


def npy_row_range(meta: dict, row: int) -> tuple[int, int]:
    """(offset, length) of row ``row`` within the ``.npy`` payload —
    offset arithmetic on the C-order layout (1-D and 2-D)."""
    shape = meta["shape"]
    if len(shape) not in (1, 2):
        raise ValueError(f"npy: array is {len(shape)}-D, need 1-D/2-D")
    if not 0 <= row < shape[0]:
        raise ValueError(f"npy: row {row} outside [0, {shape[0]})")
    width = (shape[1] if len(shape) == 2 else 1) * meta["itemsize"]
    return meta["data_start"] + row * width, width


# ---------------------------------------------------------------------------
# npz — the ZIP container composition
# ---------------------------------------------------------------------------


def write_npz(arrays: dict[str, tuple[str, tuple[int, ...], bytes]]) -> bytes:
    """Serialize ``{name: (descr, shape, raw)}`` as an UNCOMPRESSED
    ``.npz`` (STORED members, ``np.savez``'s layout) in sorted-name
    order — every array stays range-addressable inside the archive."""
    from pipeline_mf_etl_spark.sources.zipshard import STORED, encode_zip

    return encode_zip(
        [
            (f"{name}.npy", write_npy(*arrays[name]), STORED)
            for name in sorted(arrays)
        ]
    )


def read_npz(data: bytes) -> dict[str, dict]:
    """Walk an ``.npz`` into ``{name: {"descr", "shape", "itemsize",
    "data_start", "payload", "member_offset", "stored"}}`` with every
    ZIP integrity check (CRC-32, size fields, header cross-checks)
    applied by the shared walk. ``member_offset`` is the member data's
    ABSOLUTE archive offset — for STORED members, array row ranges are
    ``member_offset + npy_row_range(...)``."""
    from pipeline_mf_etl_spark.sources.zipshard import STORED, parse_zip

    out: dict[str, dict] = {}
    for m in parse_zip(data):
        name = m["name"]
        if not name.endswith(".npy"):
            raise ValueError(f"npz: non-npy member {name!r}")
        meta = read_npy_header(m["payload"])
        out[name[: -len(".npy")]] = {
            **meta,
            "payload": m["payload"],
            "member_offset": m["data_offset"],
            "stored": m["method"] == STORED,
        }
    if not out:
        raise ValueError("npz: archive holds no arrays")
    return out
