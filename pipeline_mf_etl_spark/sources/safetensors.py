"""safetensors — dependency-free reader/writer for the Hugging Face
tensor container (model weights and, increasingly, embedding shards
ship as ``.safetensors``).

The published format (github.com/huggingface/safetensors, spec in the
README) is deliberately simple and that simplicity is the security
model — this module enforces ALL of its validation rules:

- ``uint64-LE N`` + ``N`` bytes of JSON header + the data region.
- Header maps tensor name -> ``{"dtype", "shape", "data_offsets"}``
  (+ optional ``"__metadata__"`` of string pairs). Offsets are
  relative to the data region, ``end - begin`` must equal
  ``prod(shape) * itemsize``, and the official implementation requires
  the tensors to tile the data region EXACTLY: in increasing offset
  order, no gaps, no overlaps, no trailing bytes. Duplicate names,
  unknown dtypes, non-object headers, and headers that overrun the
  payload all reject.
- Tensors are C-order (row-major) raw little-endian bytes — which is
  what makes the container RANGE-ADDRESSABLE: row ``i`` of a 2-D
  ``[n, d]`` tensor is the ``d * itemsize`` bytes at
  ``begin + i * d * itemsize``, one bounded range GET per row with no
  framing walk at all.

Dtype subset: F64/F32/F16/I64/I32/I16/I8/U8/BOOL (the training-data
types, fp16 embeddings included); BF16/F8 and the exotic widths gate
loudly (numpy has no native bfloat16 to decode into). No TF/torch/
safetensors lib exists in this container, so tests pin the writer with
hand-assembled known vectors and numpy round-trips (the tf.Example
pattern).

Reference parity: none — engine ADDITION for the training-data
surface, same family as c13 (TFRecord) / c14 (Arrow IPC).
"""

from __future__ import annotations

import json
import struct

_U64 = struct.Struct("<Q")

#: dtype -> (itemsize, numpy dtype string)
DTYPES = {
    "F64": (8, "<f8"),
    "F32": (4, "<f4"),
    "F16": (2, "<f2"),
    "I64": (8, "<i8"),
    "I32": (4, "<i4"),
    "I16": (2, "<i2"),
    "I8": (1, "i1"),
    "U8": (1, "u1"),
    "BOOL": (1, "?"),
}

#: the spec's cap on the header (100 MB in the reference impl)
MAX_HEADER = 100 * 1024 * 1024


def _prod(shape: list[int]) -> int:
    n = 1
    for s in shape:
        if not isinstance(s, int) or s < 0:
            raise ValueError(f"safetensors: bad shape entry {s!r}")
        n *= s
    return n


def encode_safetensors(
    tensors: dict[str, tuple[str, list[int], bytes]],
    metadata: dict[str, str] | None = None,
) -> bytes:
    """Serialize ``{name: (dtype, shape, raw_le_bytes)}``. Tensors are
    laid out in sorted-name order (deterministic); sizes are checked
    against ``shape``/``dtype`` before anything is written."""
    header: dict = {}
    if metadata:
        if any(
            not isinstance(k, str) or not isinstance(v, str)
            for k, v in metadata.items()
        ):
            raise ValueError("safetensors: __metadata__ must be str->str")
        header["__metadata__"] = dict(metadata)
    body = bytearray()
    for name in sorted(tensors):
        dtype, shape, raw = tensors[name]
        if dtype not in DTYPES:
            raise ValueError(f"safetensors: unsupported dtype {dtype!r}")
        itemsize = DTYPES[dtype][0]
        want = _prod(shape) * itemsize
        if len(raw) != want:
            raise ValueError(
                f"safetensors: tensor {name!r} has {len(raw)} bytes, "
                f"shape/dtype imply {want}"
            )
        begin = len(body)
        body += raw
        header[name] = {
            "dtype": dtype,
            "shape": list(shape),
            "data_offsets": [begin, begin + want],
        }
    hjson = json.dumps(header, sort_keys=True, separators=(",", ":")).encode(
        "utf-8"
    )
    return _U64.pack(len(hjson)) + hjson + bytes(body)


def decode_safetensors_header(
    data: bytes, total_length: int | None = None
) -> dict:
    """Parse + STRICTLY validate the header. Returns ``{"tensors":
    {name: {"dtype", "shape", "begin", "end"}}, "metadata": {...},
    "data_start": int}`` with begin/end ABSOLUTE file offsets.
    ``total_length`` lets a range-reading client validate against the
    FILE size while holding only the header bytes (``data`` may then
    be just the first ``8 + N`` bytes)."""
    if len(data) < 8:
        raise ValueError("safetensors: shorter than the header length")
    (n,) = _U64.unpack_from(data, 0)
    if n > MAX_HEADER:
        raise ValueError(f"safetensors: header length {n} exceeds cap")
    total = len(data) if total_length is None else total_length
    if 8 + n > total or 8 + n > len(data):
        raise ValueError("safetensors: header overruns the payload")
    try:
        header = json.loads(data[8 : 8 + n].decode("utf-8"))
    except Exception as e:
        raise ValueError(f"safetensors: header is not valid JSON ({e})")
    if not isinstance(header, dict):
        raise ValueError("safetensors: header is not a JSON object")
    data_start = 8 + n
    data_len = total - data_start
    metadata = header.pop("__metadata__", {})
    if not isinstance(metadata, dict) or any(
        not isinstance(k, str) or not isinstance(v, str)
        for k, v in metadata.items()
    ):
        raise ValueError("safetensors: __metadata__ must be str->str")
    tensors: dict[str, dict] = {}
    spans = []
    for name, info in header.items():
        if not isinstance(info, dict):
            raise ValueError(f"safetensors: tensor {name!r} entry not object")
        dtype = info.get("dtype")
        shape = info.get("shape")
        offs = info.get("data_offsets")
        if dtype not in DTYPES:
            raise ValueError(
                f"safetensors: tensor {name!r} dtype {dtype!r} unsupported"
            )
        if not isinstance(shape, list):
            raise ValueError(f"safetensors: tensor {name!r} shape not list")
        if (
            not isinstance(offs, list)
            or len(offs) != 2
            or not all(isinstance(o, int) for o in offs)
        ):
            raise ValueError(f"safetensors: tensor {name!r} bad data_offsets")
        begin, end = offs
        want = _prod(shape) * DTYPES[dtype][0]
        if begin < 0 or end > data_len or end - begin != want:
            raise ValueError(
                f"safetensors: tensor {name!r} offsets [{begin}, {end}) "
                f"inconsistent with shape/dtype ({want} bytes, data region "
                f"{data_len})"
            )
        spans.append((begin, end, name))
        tensors[name] = {
            "dtype": dtype,
            "shape": list(shape),
            "begin": data_start + begin,
            "end": data_start + end,
        }
    # the official validation: tensors tile the data region exactly
    spans.sort()
    cursor = 0
    for begin, end, name in spans:
        if begin != cursor:
            raise ValueError(
                f"safetensors: gap or overlap before tensor {name!r} "
                f"(offset {begin}, expected {cursor})"
            )
        cursor = end
    if cursor != data_len:
        raise ValueError(
            f"safetensors: {data_len - cursor} trailing bytes after the "
            f"last tensor"
        )
    return {"tensors": tensors, "metadata": metadata, "data_start": data_start}


def tensor_to_numpy(data: bytes, meta: dict, name: str):
    """Materialize one tensor as a numpy array (zero-copy view)."""
    import numpy as np

    info = meta["tensors"].get(name)
    if info is None:
        raise KeyError(f"safetensors: no tensor {name!r}")
    arr = np.frombuffer(
        data[info["begin"] : info["end"]], dtype=DTYPES[info["dtype"]][1]
    )
    return arr.reshape(info["shape"])


def tensor_row_range(meta: dict, name: str, row: int) -> tuple[int, int]:
    """ABSOLUTE (offset, length) of row ``row`` of a 2-D tensor — the
    bounded range-GET unit (also accepts 1-D tensors: one element)."""
    info = meta["tensors"].get(name)
    if info is None:
        raise KeyError(f"safetensors: no tensor {name!r}")
    shape = info["shape"]
    if len(shape) not in (1, 2):
        raise ValueError(
            f"safetensors: tensor {name!r} is {len(shape)}-D, need 1-D/2-D"
        )
    n = shape[0]
    if not 0 <= row < n:
        raise ValueError(f"safetensors: row {row} outside [0, {n})")
    width = (shape[1] if len(shape) == 2 else 1) * DTYPES[info["dtype"]][0]
    return info["begin"] + row * width, width
