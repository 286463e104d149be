"""Adversarial wire-payload tests: crafted Avro/CapnProto/netpbm
inputs must fail fast with ValueError (or None), never hang or
allocate unbounded memory. The INSERT FORMAT path feeds these
decoders client-controlled bytes."""
from __future__ import annotations

import io
import json
import struct
import zlib

import pytest

from cowsdb_spark.formats.avro import MAGIC, _SYNC, _write_long, _write_bytes, read_ocf


def _ocf(schema: dict, blocks: list[tuple[int, bytes]], codec=b"null") -> bytes:
    buf = io.BytesIO()
    buf.write(MAGIC)
    _write_long(buf, 2)
    _write_bytes(buf, b"avro.schema")
    _write_bytes(buf, json.dumps(schema).encode())
    _write_bytes(buf, b"avro.codec")
    _write_bytes(buf, codec)
    _write_long(buf, 0)
    buf.write(_SYNC)
    for n, raw in blocks:
        _write_long(buf, n)
        _write_long(buf, len(raw))
        buf.write(raw)
        buf.write(_SYNC)
    return buf.getvalue()


class TestAvroHardening:
    def test_array_of_null_bomb_rejected(self):
        # a 6-byte body claiming a billion null array elements
        schema = {"type": "record", "name": "r",
                  "fields": [{"name": "a", "type": {"type": "array", "items": "null"}}]}
        body = io.BytesIO()
        _write_long(body, 1_000_000_000)  # block count, all zero-byte nulls
        _write_long(body, 0)              # array terminator
        with pytest.raises(ValueError):
            read_ocf(_ocf(schema, [(1, body.getvalue())]))

    def test_forged_row_count_rejected(self):
        schema = {"type": "record", "name": "r",
                  "fields": [{"name": "x", "type": "null"}]}
        with pytest.raises(ValueError):
            read_ocf(_ocf(schema, [(1 << 40, b"")]))

    def test_overlong_varint_rejected(self):
        blob = _ocf({"type": "record", "name": "r", "fields": []}, [])
        # splice an 11-byte varint where the first block count would be
        with pytest.raises(ValueError):
            read_ocf(blob + b"\x80" * 12 + b"\x00")

    def test_deflate_bomb_rejected(self):
        schema = {"type": "record", "name": "r",
                  "fields": [{"name": "s", "type": "string"}]}
        # 64 MB of zeros deflates to ~64 KB; claims one row whose
        # string length would then lie about the rest
        huge = zlib.compress(b"\x00" * (64 << 20))[2:-4]
        with pytest.raises(ValueError):
            read_ocf(_ocf(schema, [(1, huge)], codec=b"deflate"))

    def test_legit_roundtrip_still_works(self):
        from cowsdb_spark.formats.avro import write_ocf
        blob = write_ocf(["a", "s"], ["Int64", "String"], [(1, "x"), (2, "y")])
        names, rows = read_ocf(blob)
        assert names == ["a", "s"] and rows == [(1, "x"), (2, "y")]


class TestCapnpHardening:
    def _msg_with_root_and_ptr(self, ptr_word: int) -> bytes:
        # segment table: 1 segment of 3 words; root struct pointer
        # (0 data words, 1 pointer), then the crafted list pointer
        seg = struct.pack("<Q", (0 << 2) | 0 | (0 << 32) | (1 << 48))
        seg += struct.pack("<Q", ptr_word)
        seg += b"\x00" * 8
        return struct.pack("<II", 0, 3) + seg

    def test_scalar_list_beyond_segment_rejected(self):
        from cowsdb_spark.formats.capnp import Field, decode_message, layout_struct
        fs = [Field("v", 0, "list:uint64")]
        layout_struct(fs)
        # list pointer: kind=1, offset 0, size code 5 (8B), count 2^20
        ptr = 1 | (0 << 2) | (5 << 32) | ((1 << 20) << 35)
        with pytest.raises(ValueError):
            decode_message(fs, self._msg_with_root_and_ptr(ptr), 0)

    def test_bit_list_beyond_segment_rejected(self):
        from cowsdb_spark.formats.capnp import Field, decode_message, layout_struct
        fs = [Field("v", 0, "list:bool")]
        layout_struct(fs)
        ptr = 1 | (0 << 2) | (1 << 32) | ((1 << 28) << 35)
        with pytest.raises(ValueError):
            decode_message(fs, self._msg_with_root_and_ptr(ptr), 0)


class TestNetpbmHardening:
    def test_negative_dims_rejected(self):
        from cowsdb_spark.operators.media_codecs import decode_netpbm
        assert decode_netpbm(b"P5 -1 -3 255 " + b"\x00" * 100) is None


class TestNativeHardening:
    def test_forged_row_count_rejected(self):
        from cowsdb_spark.formats.native import parse_native, write_varint, write_varstr

        blob = (
            write_varint(1)            # 1 column
            + write_varint(1 << 40)    # forged row count
            + write_varstr("v") + write_varstr("Nullable(Int64)")
        )
        with pytest.raises(ValueError, match="row count"):
            parse_native(blob)

    def test_rows_without_columns_rejected(self):
        from cowsdb_spark.formats.native import parse_native, write_varint

        blob = write_varint(0) + write_varint(1 << 40)
        with pytest.raises(ValueError, match="without columns"):
            parse_native(blob)

    def test_forged_array_offsets_rejected(self):
        from cowsdb_spark.formats.native import parse_native, write_varint, write_varstr
        import struct as _s

        blob = (
            write_varint(1) + write_varint(1)
            + write_varstr("a") + write_varstr("Array(UInt8)")
            + _s.pack("<Q", 1 << 40)   # offsets[-1] claims 2^40 elems
        )
        with pytest.raises(ValueError):
            parse_native(blob)

    def test_roundtrip_still_works(self):
        from cowsdb_spark.formats import QueryResult
        from cowsdb_spark.formats.native import parse_native, to_native

        res = QueryResult(
            columns=["a", "s"], ch_types=["Int64", "String"],
            rows=[(1, "x"), (2, "y")],
        )
        names, types, rows = parse_native(to_native(res))
        assert names == ["a", "s"] and rows == [(1, "x"), (2, "y")]
