"""ClickHouse Native wire-format writer (SURVEY §2.8 F6, §3.2).

One block: varint n_columns, varint n_rows, then per column:
varstr name, varstr type, column data. Scalar encodings:

- String: per value varint length + UTF-8 bytes
- (U)Int8/16/32/64: little-endian fixed width
- Float32/64: IEEE little-endian
- Date: UInt16 days since epoch; DateTime: UInt32 unix seconds
- Nullable(T): null-mask byte per row, then inner data with
  defaults in null slots

The reference round-trips a parsed blob and only handles 5 types
with single-byte counts (main.py:570-654 — ≤255 rows); this writer
encodes directly from typed rows with full varints, fixing both
limits. Arrays/Maps/Tuples fall back to their String rendering
(documented limitation; the native protocol tests only exercise
scalars, test_suite.py:294-306).
"""

from __future__ import annotations

import datetime as _dt
import struct
from typing import Iterable, Optional

from .render import plain_text

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)


def write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def write_varstr(s: str | bytes) -> bytes:
    b = s.encode("utf-8") if isinstance(s, str) else s
    return write_varint(len(b)) + b


_INT_FMT = {
    "Int8": "<b",
    "Int16": "<h",
    "Int32": "<i",
    "Int64": "<q",
    "UInt8": "<B",
    "UInt16": "<H",
    "UInt32": "<I",
    "UInt64": "<Q",
}


def _encode_scalar(ch_type: str, v) -> bytes:
    if ch_type in _INT_FMT:
        return struct.pack(_INT_FMT[ch_type], int(v if v is not None else 0))
    if ch_type == "Float64":
        return struct.pack("<d", float(v if v is not None else 0.0))
    if ch_type == "Float32":
        return struct.pack("<f", float(v if v is not None else 0.0))
    if ch_type == "Bool":
        return struct.pack("<B", 1 if v else 0)
    if ch_type == "Date":
        if v is None:
            return struct.pack("<H", 0)
        if isinstance(v, _dt.datetime):
            v = v.date()
        return struct.pack("<H", max(0, (v - _EPOCH_DATE).days))
    if ch_type == "DateTime":
        if v is None:
            return struct.pack("<I", 0)
        ts = int((v - _EPOCH_DT).total_seconds()) if isinstance(v, _dt.datetime) else int(v)
        return struct.pack("<I", max(0, ts))
    # String and everything non-scalar → CH text rendering as String
    return write_varstr("" if v is None else plain_text(v))


def _strip_nullable(t: str) -> tuple[str, bool]:
    if t.startswith("Nullable(") and t.endswith(")"):
        return t[len("Nullable(") : -1], True
    return t, False


def _wire_type(t: str) -> str:
    """Type name actually emitted (non-scalars degrade to String)."""
    inner, nullable = _strip_nullable(t)
    if inner in _INT_FMT or inner in ("Float32", "Float64", "Bool", "Date", "DateTime", "String"):
        wire = inner
    else:
        wire = "String"
    return f"Nullable({wire})" if nullable else wire


def to_native(res, limit: Optional[int] = None) -> bytes:
    """Serialize a QueryResult as a single Native block."""
    rows = []
    for i, r in enumerate(res.rows):
        if limit is not None and i >= limit:
            break
        rows.append(r)
    n_rows = len(rows)
    out = bytearray()
    out += write_varint(len(res.columns))
    out += write_varint(n_rows)
    for ci, (name, ch_t) in enumerate(zip(res.columns, res.ch_types)):
        wire = _wire_type(ch_t)
        inner, nullable = _strip_nullable(wire)
        out += write_varstr(name)
        out += write_varstr(wire)
        col = [r[ci] for r in rows]
        if nullable:
            out += bytes(1 if v is None else 0 for v in col)
        for v in col:
            out += _encode_scalar(inner, v)
    return bytes(out)


def read_block(r, with_custom_flag: bool = True):
    """Decode one Native block from a streaming reader (an object
    with ``varint()``, ``binary_str()`` and ``_need(n)`` — the
    native server's socket reader). Used for native-protocol INSERT
    data (the reference reads and DISCARDS these packets,
    main.py:677-696 — a fidelity bug we fix by applying them).

    Returns ``(names, ch_types, rows)``; an end-of-data marker block
    decodes as ``([], [], [])``.
    """
    names: list[str] = []
    types: list[str] = []
    cols: list[list] = []
    # BlockInfo: (field_num, value) pairs until field_num == 0
    while True:
        field = r.varint()
        if field == 0:
            break
        if field == 1:
            r._need(1)  # is_overflows
        elif field == 2:
            r._need(4)  # bucket_num
    n_cols = r.varint()
    n_rows = r.varint()
    for _ in range(n_cols):
        name = r.binary_str()
        ch_t = r.binary_str()
        if with_custom_flag:
            r._need(1)
        names.append(name)
        types.append(ch_t)
        inner, nullable = _strip_nullable(ch_t)
        mask = [False] * n_rows
        if nullable:
            raw = r._need(n_rows)
            mask = [b == 1 for b in raw]
        vals: list = []
        for i in range(n_rows):
            if inner in _INT_FMT:
                fmt = _INT_FMT[inner]
                (v,) = struct.unpack(fmt, r._need(struct.calcsize(fmt)))
            elif inner in ("Float32", "Float64"):
                fmt = "<f" if inner == "Float32" else "<d"
                (v,) = struct.unpack(fmt, r._need(struct.calcsize(fmt)))
            elif inner == "Bool":
                v = r._need(1)[0] == 1
            elif inner == "Date":
                (d,) = struct.unpack("<H", r._need(2))
                v = _EPOCH_DATE + _dt.timedelta(days=d)
            elif inner.startswith("DateTime"):
                (s,) = struct.unpack("<I", r._need(4))
                v = _EPOCH_DT + _dt.timedelta(seconds=s)
            else:
                v = r.binary_str()
            vals.append(None if nullable and mask[i] else v)
        cols.append(vals)
    rows = [tuple(c[i] for c in cols) for i in range(n_rows)]
    return names, types, rows


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def read_varstr(buf: bytes, pos: int) -> tuple[str, int]:
    ln, pos = read_varint(buf, pos)
    return buf[pos : pos + ln].decode("utf-8"), pos + ln


def parse_native(buf: bytes) -> tuple[list[str], list[str], list[tuple]]:
    """Decode one Native block (round-trip testing + native INSERT)."""
    pos = 0
    n_cols, pos = read_varint(buf, pos)
    n_rows, pos = read_varint(buf, pos)
    names: list[str] = []
    types: list[str] = []
    cols: list[list] = []
    for _ in range(n_cols):
        name, pos = read_varstr(buf, pos)
        ch_t, pos = read_varstr(buf, pos)
        names.append(name)
        types.append(ch_t)
        inner, nullable = _strip_nullable(ch_t)
        mask = [False] * n_rows
        if nullable:
            mask = [buf[pos + i] == 1 for i in range(n_rows)]
            pos += n_rows
        vals: list = []
        for i in range(n_rows):
            if inner in _INT_FMT:
                fmt = _INT_FMT[inner]
                size = struct.calcsize(fmt)
                (v,) = struct.unpack_from(fmt, buf, pos)
                pos += size
            elif inner in ("Float32", "Float64"):
                fmt = "<f" if inner == "Float32" else "<d"
                (v,) = struct.unpack_from(fmt, buf, pos)
                pos += struct.calcsize(fmt)
            elif inner == "Bool":
                v = buf[pos] == 1
                pos += 1
            elif inner == "Date":
                (d,) = struct.unpack_from("<H", buf, pos)
                pos += 2
                v = _EPOCH_DATE + _dt.timedelta(days=d)
            elif inner == "DateTime":
                (s,) = struct.unpack_from("<I", buf, pos)
                pos += 4
                v = _EPOCH_DT + _dt.timedelta(seconds=s)
            else:
                v, pos = read_varstr(buf, pos)
            vals.append(None if nullable and mask[i] else v)
        cols.append(vals)
    rows = [tuple(c[i] for c in cols) for i in range(n_rows)]
    return names, types, rows
