"""Arrow IPC (Feather V2) — dependency-free reader/writer for the
columnar interchange format ML datasets actually ship in (HuggingFace
``datasets`` stores every split as Arrow record-batch files; Arrow
Flight, DuckDB, Polars, and pandas all speak it natively).

Everything here derives from the PUBLIC format specs only — the Arrow
columnar spec (validity bitmaps + offsets + data buffers, 8-byte
alignment, preorder field-node flattening) and the FlatBuffers wire
format (soffset->vtable indirection, uoffset graphs) that Arrow uses
for message metadata — and is cross-validated BOTH directions against
the real pyarrow in tests (the container bundles pyarrow; the engine
path never imports it), the c9/bzip2 validation pattern.

Two containers, per the spec:

- **stream**: ``0xFFFFFFFF`` continuation + int32 metadata length +
  Message FlatBuffer (8-byte padded) + aligned body, repeated; a
  zero-length metadata terminates. Message order: one Schema, then
  RecordBatches.
- **file**: ``ARROW1\\0\\0`` magic, the stream, then a Footer
  FlatBuffer (schema + Block locations of every batch) + int32 footer
  length + ``ARROW1``. The footer is what makes shards RANDOM-ACCESS:
  ``read_arrow_batch_at`` decodes ONE batch from its block's byte
  range — the point-lookup unit, batch-grain.

Type subset (the training-data corpus needs): signed/unsigned ints of
any width, float32/float64, bool, utf8/binary (+ Large variants),
List<primitive>, and DICTIONARY-ENCODED columns (decode side — the
HuggingFace pattern for categoricals; DictionaryBatch messages incl.
deltas resolve before the batches that reference them). Nested
structs/maps/unions and run-end encodings gate LOUDLY. Compressed bodies
(BodyCompression: LZ4_FRAME / ZSTD) decode through the engine's OWN
verified frame decoders (sources/lz4frame.py / sources/zstdframe.py) —
corrupt metadata, truncated buffers, bad magic, and unknown union tags
all raise; a corrupt shard must never decode silently.

Reference parity: none — engine ADDITION for the training-data
ingestion surface, same family as c4 (Avro) / c13 (TFRecord).
"""

from __future__ import annotations

import struct

_I16 = struct.Struct("<h")
_U16 = struct.Struct("<H")
_I32 = struct.Struct("<i")
_U32 = struct.Struct("<I")
_I64 = struct.Struct("<q")
_U64 = struct.Struct("<Q")

CONTINUATION = 0xFFFFFFFF
FILE_MAGIC = b"ARROW1\x00\x00"
FILE_TRAILER = b"ARROW1"

#: MessageHeader union tags (Message.fbs)
_MSG_SCHEMA, _MSG_DICT_BATCH, _MSG_RECORD_BATCH = 1, 2, 3

#: Type union tags (Schema.fbs enum order)
_T_INT, _T_FLOAT, _T_BINARY, _T_UTF8, _T_BOOL = 2, 3, 4, 5, 6
_T_LIST = 12
_T_LARGE_BINARY, _T_LARGE_UTF8 = 19, 20
_TYPE_NAMES = {
    0: "NONE", 1: "Null", 7: "Decimal", 8: "Date", 9: "Time",
    10: "Timestamp", 11: "Interval", 13: "Struct", 14: "Union",
    15: "FixedSizeBinary", 16: "FixedSizeList", 17: "Map",
    18: "Duration", 21: "LargeList", 22: "RunEndEncoded",
    23: "BinaryView", 24: "Utf8View", 25: "ListView", 26: "LargeListView",
}


# ---------------------------------------------------------------------------
# FlatBuffers reader: the minimal vtable walk Arrow metadata needs.
# ---------------------------------------------------------------------------


class _FB:
    """A FlatBuffers table in a buffer: field access via the vtable."""

    __slots__ = ("data", "pos", "_vt", "_vt_size")

    def __init__(self, data: bytes, pos: int):
        if pos + 4 > len(data):
            raise ValueError("arrow: flatbuffer table overruns buffer")
        self.data = data
        self.pos = pos
        soffset = _I32.unpack_from(data, pos)[0]
        vt = pos - soffset
        if vt < 0 or vt + 4 > len(data):
            raise ValueError("arrow: flatbuffer vtable out of range")
        self._vt = vt
        self._vt_size = _U16.unpack_from(data, vt)[0]

    @classmethod
    def root(cls, data: bytes, base: int = 0) -> "_FB":
        if base + 4 > len(data):
            raise ValueError("arrow: truncated flatbuffer root")
        return cls(data, base + _U32.unpack_from(data, base)[0])

    def _field_pos(self, slot: int) -> int | None:
        off = 4 + 2 * slot
        if off + 2 > self._vt_size:
            return None
        voff = _U16.unpack_from(self.data, self._vt + off)[0]
        return self.pos + voff if voff else None

    def scalar(self, slot: int, fmt: struct.Struct, default=0):
        p = self._field_pos(slot)
        return default if p is None else fmt.unpack_from(self.data, p)[0]

    def bool_(self, slot: int, default: bool = False) -> bool:
        p = self._field_pos(slot)
        return default if p is None else self.data[p] != 0

    def u8(self, slot: int, default: int = 0) -> int:
        p = self._field_pos(slot)
        return default if p is None else self.data[p]

    def _indirect(self, p: int) -> int:
        return p + _U32.unpack_from(self.data, p)[0]

    def table(self, slot: int) -> "_FB | None":
        p = self._field_pos(slot)
        return None if p is None else _FB(self.data, self._indirect(p))

    def string(self, slot: int) -> str | None:
        p = self._field_pos(slot)
        if p is None:
            return None
        t = self._indirect(p)
        n = _U32.unpack_from(self.data, t)[0]
        return self.data[t + 4 : t + 4 + n].decode("utf-8")

    def _vector(self, slot: int) -> tuple[int, int] | None:
        """-> (element-0 position, length)."""
        p = self._field_pos(slot)
        if p is None:
            return None
        t = self._indirect(p)
        return t + 4, _U32.unpack_from(self.data, t)[0]

    def table_vector(self, slot: int) -> list["_FB"]:
        v = self._vector(slot)
        if v is None:
            return []
        start, n = v
        return [
            _FB(self.data, self._indirect(start + 4 * i)) for i in range(n)
        ]

    def struct_vector(self, slot: int, size: int) -> list[int]:
        """-> positions of each inline struct element."""
        v = self._vector(slot)
        if v is None:
            return []
        start, n = v
        return [start + size * i for i in range(n)]


# ---------------------------------------------------------------------------
# schema model
# ---------------------------------------------------------------------------


class ArrowField:
    """One schema field of the supported subset. ``dict_id``/``index``
    are set on DICTIONARY-ENCODED fields (decode-only): kind/bits keep
    describing the VALUE type, the record-batch column carries indices
    of the ``index`` Int type, mapped through DictionaryBatch values."""

    __slots__ = ("name", "nullable", "kind", "bits", "signed", "child",
                 "dict_id", "index")

    def __init__(self, name, nullable, kind, bits=0, signed=True, child=None,
                 dict_id=None, index=None):
        self.name, self.nullable, self.kind = name, nullable, kind
        self.bits, self.signed, self.child = bits, signed, child
        self.dict_id, self.index = dict_id, index

    def __repr__(self):
        inner = f"<{self.child!r}>" if self.child else ""
        d = f"@dict{self.dict_id}" if self.dict_id is not None else ""
        return f"{self.name}:{self.kind}{self.bits or ''}{inner}{d}"


def _parse_field(f: _FB) -> ArrowField:
    name = f.string(0) or ""
    nullable = f.bool_(1, True)
    tag = f.u8(2)
    t = f.table(3)
    dict_enc = f.table(4)
    dict_id = index = None
    if dict_enc is not None:  # DictionaryEncoding: id + index Int type
        dict_id = dict_enc.scalar(0, _I64, 0)
        idx_t = dict_enc.table(1)
        index = (
            (idx_t.scalar(0, _I32, 0), idx_t.bool_(1, True))
            if idx_t is not None
            else (32, True)  # spec default index type
        )
        if index not in _INT_FMT:
            raise ValueError(
                f"arrow: field {name!r} dictionary index type {index} "
                f"unsupported"
            )
    children = f.table_vector(5)

    def done(fld: ArrowField) -> ArrowField:
        fld.dict_id, fld.index = dict_id, index
        return fld

    if tag == _T_INT:
        if t is None:
            raise ValueError(f"arrow: field {name!r} Int type table missing")
        return done(ArrowField(
            name, nullable, "int",
            bits=t.scalar(0, _I32, 0), signed=t.bool_(1, True),
        ))
    if tag == _T_FLOAT:
        prec = t.scalar(0, _I16, 0) if t is not None else 0
        if prec == 0:
            raise ValueError(f"arrow: field {name!r} float16 unsupported")
        return done(
            ArrowField(name, nullable, "float", bits=32 if prec == 1 else 64)
        )
    if tag == _T_BOOL:
        return done(ArrowField(name, nullable, "bool"))
    if tag in (_T_UTF8, _T_LARGE_UTF8):
        return done(ArrowField(
            name, nullable, "utf8", bits=64 if tag == _T_LARGE_UTF8 else 32
        ))
    if tag in (_T_BINARY, _T_LARGE_BINARY):
        return done(ArrowField(
            name, nullable, "binary",
            bits=64 if tag == _T_LARGE_BINARY else 32,
        ))
    if tag == _T_LIST:
        if len(children) != 1:
            raise ValueError(f"arrow: list field {name!r} needs 1 child")
        child = _parse_field(children[0])
        if child.kind == "list":
            raise ValueError(f"arrow: nested list {name!r} unsupported")
        return done(ArrowField(name, nullable, "list", child=child))
    raise ValueError(
        f"arrow: field {name!r} type "
        f"{_TYPE_NAMES.get(tag, tag)} unsupported"
    )


def _parse_schema(s: _FB) -> list[ArrowField]:
    fields = [_parse_field(f) for f in s.table_vector(1)]
    if not fields:
        raise ValueError("arrow: schema has no fields")
    return fields


# ---------------------------------------------------------------------------
# message framing
# ---------------------------------------------------------------------------


def _iter_messages(data: bytes, pos: int):
    """Yield (header_tag, header_table, body_bytes, end_pos) per message
    starting at ``pos``; stops at end-of-stream (zero metadata length or
    buffer end)."""
    n = len(data)
    while pos + 4 <= n:
        first = _U32.unpack_from(data, pos)[0]
        if first == CONTINUATION:
            if pos + 8 > n:
                raise ValueError("arrow: truncated continuation frame")
            meta_len = _I32.unpack_from(data, pos + 4)[0]
            meta_start = pos + 8
        else:  # pre-1.0 legacy framing: length alone
            meta_len = _I32.unpack_from(data, pos)[0]
            meta_start = pos + 4
        if meta_len == 0:
            return
        if meta_len < 0 or meta_start + meta_len > n:
            raise ValueError("arrow: message metadata overruns buffer")
        msg = _FB.root(data, meta_start)
        tag = msg.u8(1)
        header = msg.table(2)
        body_len = msg.scalar(3, _I64, 0)
        body_start = meta_start + meta_len
        if body_start % 8:
            raise ValueError("arrow: message body misaligned")
        if body_start + body_len > n:
            raise ValueError("arrow: message body overruns buffer")
        body = data[body_start : body_start + body_len]
        pos = body_start + body_len
        yield tag, header, body, pos


# ---------------------------------------------------------------------------
# record-batch decode
# ---------------------------------------------------------------------------

_INT_FMT = {
    (8, True): "b", (8, False): "B", (16, True): "h", (16, False): "H",
    (32, True): "i", (32, False): "I", (64, True): "q", (64, False): "Q",
}


class _BatchCtx:
    __slots__ = ("body", "nodes", "buffers", "ni", "bi")

    def __init__(self, body, nodes, buffers):
        self.body, self.nodes, self.buffers = body, nodes, buffers
        self.ni = self.bi = 0

    def node(self):
        if self.ni >= len(self.nodes):
            raise ValueError("arrow: record batch short of field nodes")
        n = self.nodes[self.ni]
        self.ni += 1
        return n

    def buf(self) -> bytes:
        if self.bi >= len(self.buffers):
            raise ValueError("arrow: record batch short of buffers")
        off, ln = self.buffers[self.bi]
        self.bi += 1
        if off + ln > len(self.body):
            raise ValueError("arrow: buffer overruns message body")
        return self.body[off : off + ln]


def _validity(bitmap: bytes, n: int, null_count: int) -> list[bool]:
    if null_count == 0 and not bitmap:
        return [True] * n
    if len(bitmap) * 8 < n:
        raise ValueError("arrow: validity bitmap too short")
    return [(bitmap[i >> 3] >> (i & 7)) & 1 == 1 for i in range(n)]


def _decode_column(
    field: ArrowField, ctx: _BatchCtx, dicts: dict | None = None
) -> list:
    length, null_count = ctx.node()
    valid = _validity(ctx.buf(), length, null_count)
    if field.dict_id is not None:
        data = ctx.buf()
        bits, signed = field.index
        fmt = _INT_FMT[(bits, signed)]
        width = bits // 8
        if len(data) < length * width:
            raise ValueError("arrow: dictionary index buffer too short")
        idx = struct.unpack_from(f"<{length}{fmt}", data, 0)
        values = (dicts or {}).get(field.dict_id)
        if values is None:
            raise ValueError(
                f"arrow: record batch references dictionary "
                f"{field.dict_id} before its DictionaryBatch"
            )
        out = []
        for i in range(length):
            if not valid[i]:
                out.append(None)
                continue
            if not 0 <= idx[i] < len(values):
                raise ValueError(
                    f"arrow: dictionary index {idx[i]} out of range"
                )
            out.append(values[idx[i]])
        return out
    if field.kind in ("int", "float", "bool"):
        data = ctx.buf()
        if field.kind == "bool":
            if len(data) * 8 < length:
                raise ValueError("arrow: bool data bitmap too short")
            vals = [(data[i >> 3] >> (i & 7)) & 1 == 1 for i in range(length)]
        else:
            fmt = (
                _INT_FMT[(field.bits, field.signed)]
                if field.kind == "int"
                else ("f" if field.bits == 32 else "d")
            )
            width = field.bits // 8
            if len(data) < length * width:
                raise ValueError("arrow: primitive buffer too short")
            vals = list(struct.unpack_from(f"<{length}{fmt}", data, 0))
        return [v if ok else None for v, ok in zip(vals, valid)]
    if field.kind in ("utf8", "binary"):
        offsets = _offsets(ctx.buf(), length, field.bits)
        data = ctx.buf()
        out = []
        for i in range(length):
            if not valid[i]:
                out.append(None)
                continue
            lo, hi = offsets[i], offsets[i + 1]
            if lo > hi or hi > len(data):
                raise ValueError("arrow: varbinary offsets out of range")
            b = data[lo:hi]
            out.append(b.decode("utf-8") if field.kind == "utf8" else b)
        return out
    if field.kind == "list":
        offsets = _offsets(ctx.buf(), length, 32)
        child_vals = _decode_column(field.child, ctx, dicts)
        out = []
        for i in range(length):
            if not valid[i]:
                out.append(None)
                continue
            lo, hi = offsets[i], offsets[i + 1]
            if lo > hi or hi > len(child_vals):
                raise ValueError("arrow: list offsets out of range")
            out.append(child_vals[lo:hi])
        return out
    raise AssertionError(field.kind)


def _offsets(buf: bytes, n: int, bits: int) -> list[int]:
    width = bits // 8
    if len(buf) < (n + 1) * width:
        raise ValueError("arrow: offsets buffer too short")
    fmt = "i" if bits == 32 else "q"
    return list(struct.unpack_from(f"<{n + 1}{fmt}", buf, 0))


def _decompress_body(header: _FB, body: bytes, buffers) -> tuple[bytes, list]:
    """Apply BodyCompression if present: per the spec each buffer is an
    int64 uncompressed-length prefix + compressed payload (-1 = raw
    passthrough). Rebuilds a flat body with rewritten buffer entries;
    decoding runs through the engine's own verified LZ4-frame / zstd
    walks."""
    comp = header.table(3)
    if comp is None:
        return body, buffers
    codec = comp.u8(0, 0)  # CompressionType is a byte enum
    if comp.u8(1, 0) != 0:
        raise ValueError("arrow: only BUFFER compression method supported")
    if codec == 0:
        from pipeline_mf_etl_spark.sources.lz4frame import decode_lz4_frame

        decode = lambda b: decode_lz4_frame(b)["content"]  # noqa: E731
    elif codec == 1:
        from pipeline_mf_etl_spark.sources.zstdframe import decode_zstd_stream

        decode = lambda b: decode_zstd_stream(b)["content"]  # noqa: E731
    else:
        raise ValueError(f"arrow: unknown compression codec {codec}")
    out = bytearray()
    rewritten = []
    for off, ln in buffers:
        if off + ln > len(body):
            raise ValueError("arrow: compressed buffer overruns body")
        chunk = body[off : off + ln]
        if ln == 0:
            rewritten.append((len(out), 0))
            continue
        if ln < 8:
            raise ValueError("arrow: compressed buffer missing length prefix")
        (raw_len,) = _I64.unpack_from(chunk, 0)
        payload = chunk[8:]
        if raw_len == -1:
            data = payload
        else:
            data = decode(payload)
            if len(data) != raw_len:
                raise ValueError(
                    "arrow: decompressed buffer length disagrees with prefix"
                )
        rewritten.append((len(out), len(data)))
        out += data
        while len(out) % 8:
            out.append(0)
    return bytes(out), rewritten


def _decode_batch(
    header: _FB,
    body: bytes,
    fields: list[ArrowField],
    dicts: dict | None = None,
) -> list[list]:
    """-> one list of values per field."""
    n_rows = header.scalar(0, _I64, 0)
    nodes = [
        (
            _I64.unpack_from(header.data, p)[0],
            _I64.unpack_from(header.data, p + 8)[0],
        )
        for p in header.struct_vector(1, 16)
    ]
    buffers = [
        (
            _I64.unpack_from(header.data, p)[0],
            _I64.unpack_from(header.data, p + 8)[0],
        )
        for p in header.struct_vector(2, 16)
    ]
    body, buffers = _decompress_body(header, body, buffers)
    ctx = _BatchCtx(body, nodes, buffers)
    cols = []
    for f in fields:
        vals = _decode_column(f, ctx, dicts)
        if len(vals) != n_rows:
            raise ValueError(
                f"arrow: column {f.name!r} length {len(vals)} != "
                f"batch length {n_rows}"
            )
        cols.append(vals)
    if ctx.ni != len(nodes) or ctx.bi != len(buffers):
        raise ValueError("arrow: record batch has surplus nodes/buffers")
    return cols


def _apply_dictionary_batch(
    header: _FB, body: bytes, fields: list[ArrowField], dicts: dict
) -> None:
    """DictionaryBatch: id + a one-column RecordBatch of the VALUE
    type; isDelta appends to an existing dictionary."""
    dict_id = header.scalar(0, _I64, 0)
    data = header.table(1)
    if data is None:
        raise ValueError("arrow: DictionaryBatch without data batch")
    is_delta = header.bool_(2, False)
    owners = [
        f
        for f in _iter_fields(fields)
        if f.dict_id == dict_id
    ]
    if not owners:
        raise ValueError(f"arrow: DictionaryBatch for unknown id {dict_id}")
    f = owners[0]
    value_field = ArrowField(
        f.name, f.nullable, f.kind, f.bits, f.signed, f.child
    )
    (values,) = _decode_batch(data, body, [value_field])
    if is_delta:
        dicts.setdefault(dict_id, []).extend(values)
    else:
        dicts[dict_id] = values


def _iter_fields(fields):
    for f in fields:
        yield f
        if f.child is not None:
            yield from _iter_fields([f.child])


# ---------------------------------------------------------------------------
# stream + file containers
# ---------------------------------------------------------------------------


def decode_arrow_stream(data: bytes) -> dict:
    """Decode an IPC STREAM: ``{"fields": [ArrowField...], "columns":
    [per-field value list], "n_batches": int}`` with batches
    concatenated in order."""
    fields: list[ArrowField] | None = None
    cols: list[list] = []
    n_batches = 0
    dicts: dict = {}
    for tag, header, body, _pos in _iter_messages(data, 0):
        if tag == _MSG_SCHEMA:
            if fields is not None:
                raise ValueError("arrow: second schema message in stream")
            fields = _parse_schema(header)
            cols = [[] for _ in fields]
        elif tag == _MSG_RECORD_BATCH:
            if fields is None:
                raise ValueError("arrow: record batch before schema")
            for acc, vals in zip(
                cols, _decode_batch(header, body, fields, dicts)
            ):
                acc.extend(vals)
            n_batches += 1
        elif tag == _MSG_DICT_BATCH:
            if fields is None:
                raise ValueError("arrow: dictionary batch before schema")
            _apply_dictionary_batch(header, body, fields, dicts)
        else:
            raise ValueError(f"arrow: unknown message header tag {tag}")
    if fields is None:
        raise ValueError("arrow: stream has no schema message")
    return {"fields": fields, "columns": cols, "n_batches": n_batches}


def parse_footer_flatbuffer(data: bytes, fstart: int = 0) -> dict:
    """Parse a Footer FlatBuffer (already located): ``{"fields": ...,
    "blocks": [(offset, meta_len, body_len), ...]}``."""
    footer = _FB.root(data, fstart)
    schema = footer.table(1)
    if schema is None:
        raise ValueError("arrow: footer has no schema")
    def read_blocks(slot):
        out = []
        for p in footer.struct_vector(slot, 24):
            off = _I64.unpack_from(data, p)[0]
            meta_len = _I32.unpack_from(data, p + 8)[0]
            body_len = _I64.unpack_from(data, p + 16)[0]
            out.append((off, meta_len, body_len))
        return out

    return {
        "fields": _parse_schema(schema),
        "blocks": read_blocks(3),
        "dict_blocks": read_blocks(2),
    }


def arrow_footer_length(tail: bytes) -> int:
    """Given the file's last 10 bytes, -> the Footer FlatBuffer length
    (the tail probe a range-reading client issues first)."""
    if len(tail) != 10 or not tail.endswith(FILE_TRAILER):
        raise ValueError("arrow: bad trailing magic")
    (flen,) = _I32.unpack_from(tail, 0)
    if flen <= 0:
        raise ValueError("arrow: footer length out of range")
    return flen


def parse_arrow_footer(data: bytes) -> dict:
    """Parse an IPC FILE's footer: the random-access map. Validates
    both magics and the footer length."""
    if len(data) < len(FILE_MAGIC) + 10 or not data.startswith(FILE_MAGIC):
        raise ValueError("arrow: bad file magic")
    flen = arrow_footer_length(data[-10:])
    fstart = len(data) - 10 - flen
    if fstart < len(FILE_MAGIC):
        raise ValueError("arrow: footer length out of range")
    return parse_footer_flatbuffer(data, fstart)


def load_arrow_dictionaries(
    data: bytes, meta: dict, read=None
) -> dict:
    """Decode a file's DictionaryBatch blocks (footer slot 2) into the
    id -> values map record batches resolve against. ``read(off, n)``
    overrides the byte source (range-GET clients)."""
    dicts: dict = {}
    for off, meta_len, body_len in meta["dict_blocks"]:
        window = (
            read(off, meta_len + body_len)
            if read is not None
            else data[off : off + meta_len + body_len]
        )
        got = next(_iter_messages(window, 0), None)
        if got is None:
            raise ValueError("arrow: empty dictionary block")
        tag, header, body, _pos = got
        if tag != _MSG_DICT_BATCH:
            raise ValueError(
                f"arrow: dictionary block holds message tag {tag}"
            )
        _apply_dictionary_batch(header, body, meta["fields"], dicts)
    return dicts


def decode_arrow_file(data: bytes) -> dict:
    """Decode an IPC FILE via its footer blocks (also cross-checks that
    every block's framing walks cleanly)."""
    meta = parse_arrow_footer(data)
    fields = meta["fields"]
    dicts = load_arrow_dictionaries(data, meta)
    cols: list[list] = [[] for _ in fields]
    for off, meta_len, body_len in meta["blocks"]:
        for acc, vals in zip(
            cols,
            read_arrow_batch_at(
                data, off, meta_len, body_len, fields, dicts
            ),
        ):
            acc.extend(vals)
    return {
        "fields": fields,
        "columns": cols,
        "n_batches": len(meta["blocks"]),
    }


def read_arrow_batch_at(
    data: bytes,
    offset: int,
    meta_len: int,
    body_len: int,
    fields: list[ArrowField],
    dicts: dict | None = None,
) -> list[list]:
    """Decode ONE record batch from its footer block byte range — the
    point-lookup unit (``data`` may be just the block's bytes when
    ``offset`` is 0, i.e. a range GET of ``meta_len + body_len``)."""
    end = offset + meta_len + body_len
    if end > len(data):
        raise ValueError("arrow: block overruns buffer")
    it = _iter_messages(data[offset:end], 0)
    got = next(it, None)
    if got is None:
        raise ValueError("arrow: empty block")
    tag, header, body, _pos = got
    if tag != _MSG_RECORD_BATCH:
        raise ValueError(f"arrow: block holds message tag {tag}, not a batch")
    return _decode_batch(header, body, fields, dicts)


# ---------------------------------------------------------------------------
# encoder: a minimal FlatBuffers builder (back-to-front, end-measured
# offsets — the standard construction) + the columnar buffer layout.
# Cross-validated in tests by REAL pyarrow reading every byte we emit.
# ---------------------------------------------------------------------------


class _Builder:
    """Back-to-front FlatBuffers builder. Object positions are measured
    as END-offsets (distance from object start to buffer end), which
    never move as objects are prepended; forward alignment holds because
    finish() pads the total to 8 and every allocation pins
    ``end_offset % align == phase``."""

    def __init__(self):
        self.buf = bytearray()

    def _alloc(self, obj: bytes, align: int, phase: int = 0) -> int:
        """Prepend ``obj`` with filler so its end-offset ≡ phase (mod
        align); returns the object's end-offset."""
        pad = (phase - (len(self.buf) + len(obj))) % align
        self.buf[:0] = obj + b"\x00" * pad
        return len(self.buf)

    def _patch(self, end_off: int, data: bytes) -> None:
        p = len(self.buf) - end_off
        self.buf[p : p + len(data)] = data

    def string(self, s: str) -> int:
        data = s.encode("utf-8")
        return self._alloc(_U32.pack(len(data)) + data + b"\x00", 4, 0)

    def struct_vector(self, elems: list[bytes], elem_align: int = 8) -> int:
        """Vector of inline structs: u32 count + elements; elements are
        aligned, the count sits directly before them."""
        body = b"".join(elems)
        return self._alloc(
            _U32.pack(len(elems)) + body, elem_align, (4 + len(body)) % elem_align
        )

    def offset_vector(self, targets: list[int]) -> int:
        """Vector of uoffsets to already-written objects."""
        size = 4 + 4 * len(targets)
        obj = bytearray(_U32.pack(len(targets)) + b"\x00" * (4 * len(targets)))
        end = self._alloc(bytes(obj), 4, 0)
        for i, t in enumerate(targets):
            k = 4 + 4 * i
            self._patch(end - k, _U32.pack((end - k) - t))
        return end

    def table(self, fields: list[tuple[int, str, object]]) -> int:
        """Write a table: ``fields`` is (slot, kind, value) with kind in
        i8/i16/i32/i64/bool/off (off values are end-offsets). Returns
        the table's end-offset."""
        sizes = {"i8": 1, "bool": 1, "i16": 2, "i32": 4, "off": 4, "i64": 8}
        packs = {"i16": _I16, "i32": _I32, "i64": _I64}
        # inline layout: soffset at 0, then fields largest-first with
        # per-field alignment (table end-offset is pinned to 8 below,
        # so internal offset k aligned to the field size suffices)
        layout: dict[int, int] = {}
        k = 4
        for slot, kind, _v in sorted(
            fields, key=lambda f: (-sizes[f[1]], f[0])
        ):
            size = sizes[kind]
            k += (-k) % size
            layout[slot] = k
            k += size
        table_size = k + (-k) % 4
        obj = bytearray(table_size)
        pending: list[tuple[int, int]] = []  # (internal k, target end-off)
        for slot, kind, v in fields:
            kk = layout[slot]
            if kind == "off":
                pending.append((kk, v))
            elif kind in ("i8", "bool"):
                obj[kk] = int(v) & 0xFF
            else:
                packs[kind].pack_into(obj, kk, int(v))
        end = self._alloc(bytes(obj), 8, 0)
        for kk, target in pending:
            self._patch(end - kk, _U32.pack((end - kk) - target))
        # vtable: u16 size, u16 table size, u16 voffset per slot
        n_slots = max((s for s, _, _ in fields), default=-1) + 1
        vt_size = 4 + 2 * n_slots
        vt = bytearray(_U16.pack(vt_size) + _U16.pack(table_size))
        for slot in range(n_slots):
            vt += _U16.pack(layout.get(slot, 0))
        vt_end = self._alloc(bytes(vt), 2, 0)
        self._patch(end, _I32.pack(vt_end - end))  # soffset at table start
        return end

    def finish(self, root: int) -> bytes:
        pad = (-(len(self.buf) + 4)) % 8
        self.buf[:0] = b"\x00" * pad
        self.buf[:0] = _U32.pack((len(self.buf) + 4) - root)
        return bytes(self.buf)


def _build_field_fb(b: _Builder, f: ArrowField) -> int:
    name = b.string(f.name)
    if f.kind == "int":
        t = b.table([(0, "i32", f.bits), (1, "bool", f.signed)])
        tag = _T_INT
    elif f.kind == "float":
        t = b.table([(0, "i16", 1 if f.bits == 32 else 2)])
        tag = _T_FLOAT
    elif f.kind == "bool":
        t = b.table([])
        tag = _T_BOOL
    elif f.kind == "utf8":
        t = b.table([])
        tag = _T_LARGE_UTF8 if f.bits == 64 else _T_UTF8
    elif f.kind == "binary":
        t = b.table([])
        tag = _T_LARGE_BINARY if f.bits == 64 else _T_BINARY
    elif f.kind == "list":
        child = _build_field_fb(b, f.child)
        children = b.offset_vector([child])
        t = b.table([])
        return b.table(
            [
                (0, "off", name),
                (1, "bool", f.nullable),
                (2, "i8", _T_LIST),
                (3, "off", t),
                (5, "off", children),
            ]
        )
    else:
        raise ValueError(f"arrow: cannot encode field kind {f.kind!r}")
    return b.table(
        [(0, "off", name), (1, "bool", f.nullable), (2, "i8", tag), (3, "off", t)]
    )


def _build_schema_fb(b: _Builder, fields: list[ArrowField]) -> int:
    return b.table([(1, "off", b.offset_vector([_build_field_fb(b, f) for f in fields]))])


def _message(header_tag: int, build_header, body_len: int) -> bytes:
    """One framed message: continuation + metadata length + Message
    FlatBuffer (8-padded)."""
    b = _Builder()
    header = build_header(b)
    root = b.table(
        [
            (0, "i16", 4),  # MetadataVersion V5
            (1, "i8", header_tag),
            (2, "off", header),
            (3, "i64", body_len),
        ]
    )
    meta = b.finish(root)
    return _U32.pack(CONTINUATION) + _I32.pack(len(meta)) + meta


def _pad8(n: int) -> int:
    return (-n) % 8


def _encode_column(field: ArrowField, values: list) -> tuple[list, list[bytes]]:
    """-> (field nodes [(length, null_count), ... preorder], buffers)."""
    n = len(values)
    null_count = sum(1 for v in values if v is None)
    if null_count:
        bitmap = bytearray((n + 7) // 8)
        for i, v in enumerate(values):
            if v is not None:
                bitmap[i >> 3] |= 1 << (i & 7)
        validity = bytes(bitmap)
    else:
        validity = b""
    if field.kind in ("int", "float", "bool"):
        if field.kind == "bool":
            data = bytearray((n + 7) // 8)
            for i, v in enumerate(values):
                if v:
                    data[i >> 3] |= 1 << (i & 7)
            data = bytes(data)
        else:
            if field.kind == "int":
                fmt = _INT_FMT[(field.bits, field.signed)]
                # int() coercion: a pandas int column WITH nulls arrives
                # as floats; exactness is the caller's contract
                vals = [0 if v is None else int(v) for v in values]
            else:
                fmt = "f" if field.bits == 32 else "d"
                vals = [0.0 if v is None else float(v) for v in values]
            data = struct.pack(f"<{n}{fmt}", *vals)
        return [(n, null_count)], [validity, data]
    if field.kind in ("utf8", "binary"):
        blobs = [
            b""
            if v is None
            else (v.encode("utf-8") if field.kind == "utf8" else v)
            for v in values
        ]
        offs, acc = [0], 0
        for bl in blobs:
            acc += len(bl)
            offs.append(acc)
        fmt = "i" if field.bits == 32 else "q"
        return [(n, null_count)], [
            validity,
            struct.pack(f"<{n + 1}{fmt}", *offs),
            b"".join(blobs),
        ]
    if field.kind == "list":
        offs, acc = [0], 0
        flat: list = []
        for v in values:
            if v is not None:
                flat.extend(v)
                acc += len(v)
            offs.append(acc)
        child_nodes, child_bufs = _encode_column(field.child, flat)
        return [(n, null_count)] + child_nodes, [
            validity,
            struct.pack(f"<{n + 1}i", *offs),
        ] + child_bufs
    raise ValueError(f"arrow: cannot encode column kind {field.kind!r}")


def _encode_batch_message(fields: list[ArrowField], columns: list[list]) -> bytes:
    n_rows = len(columns[0]) if columns else 0
    nodes: list[tuple] = []
    bufs: list[bytes] = []
    for f, col in zip(fields, columns):
        if len(col) != n_rows:
            raise ValueError("arrow: ragged columns")
        fn, fb = _encode_column(f, col)
        nodes.extend(fn)
        bufs.extend(fb)
    body = bytearray()
    entries: list[tuple[int, int]] = []
    for bf in bufs:
        entries.append((len(body), len(bf)))
        body += bf + b"\x00" * _pad8(len(bf))
    body = bytes(body)

    def header(b: _Builder) -> int:
        node_v = b.struct_vector(
            [_I64.pack(ln) + _I64.pack(nc) for ln, nc in nodes]
        )
        buf_v = b.struct_vector(
            [_I64.pack(o) + _I64.pack(ln) for o, ln in entries]
        )
        return b.table(
            [(0, "i64", n_rows), (1, "off", node_v), (2, "off", buf_v)]
        )

    return _message(_MSG_RECORD_BATCH, header, len(body)) + body


def _check_columns(fields: list[ArrowField], columns: list[list]) -> None:
    if len(fields) != len(columns):
        raise ValueError("arrow: fields/columns count mismatch")
    if columns and any(len(c) != len(columns[0]) for c in columns):
        raise ValueError("arrow: ragged columns")


def encode_arrow_stream(
    fields: list[ArrowField], columns: list[list], batch_rows: int | None = None
) -> bytes:
    """Encode an IPC STREAM of the supported subset; ``batch_rows``
    splits rows into multiple record batches (None = one batch)."""
    _check_columns(fields, columns)
    out = bytearray(
        _message(_MSG_SCHEMA, lambda b: _build_schema_fb(b, fields), 0)
    )
    n = len(columns[0]) if columns else 0
    step = batch_rows or max(n, 1)
    for lo in range(0, max(n, 1), step):
        out += _encode_batch_message(
            fields, [c[lo : lo + step] for c in columns]
        )
    out += _U32.pack(CONTINUATION) + _I32.pack(0)  # end-of-stream
    return bytes(out)


def encode_arrow_file(
    fields: list[ArrowField], columns: list[list], batch_rows: int | None = None
) -> bytes:
    """Encode an IPC FILE (random-access footer over the stream)."""
    _check_columns(fields, columns)
    out = bytearray(FILE_MAGIC)
    schema_msg = _message(_MSG_SCHEMA, lambda b: _build_schema_fb(b, fields), 0)
    out += schema_msg
    n = len(columns[0]) if columns else 0
    step = batch_rows or max(n, 1)
    blocks: list[tuple[int, int, int]] = []
    for lo in range(0, max(n, 1), step):
        msg = _encode_batch_message(fields, [c[lo : lo + step] for c in columns])
        (meta_len,) = _I32.unpack_from(msg, 4)
        frame_len = 8 + meta_len
        blocks.append((len(out), frame_len, len(msg) - frame_len))
        out += msg
    out += _U32.pack(CONTINUATION) + _I32.pack(0)
    b = _Builder()
    schema = _build_schema_fb(b, fields)
    block_v = b.struct_vector(
        [
            _I64.pack(off) + _I32.pack(ml) + b"\x00" * 4 + _I64.pack(bl)
            for off, ml, bl in blocks
        ]
    )
    footer = b.finish(
        b.table([(0, "i16", 4), (1, "off", schema), (3, "off", block_v)])
    )
    out += footer + _I32.pack(len(footer)) + FILE_TRAILER
    return bytes(out)
