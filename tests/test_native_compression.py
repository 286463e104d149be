"""Native-protocol compressed framing + complex-type encodings.

Covers what the reference cannot do: its "compression" support
zlib-decompresses the query string (main.py:505-512, 782-805) while
real clients send a plain query and compress DATA blocks; and its
Native re-serializer handles 5 scalar types at ≤255 rows
(main.py:570-654) with no Array/Map/Tuple. Here we test:

- CityHash128 v1.0.2 + LZ4 block codec + CH frame round-trips
- a clickhouse-driver-shaped client with compression=1: plain query
  text, compressed external-tables marker, compressed server DATA
- the reference's zlib-query dialect still accepted
- stream stays in sync when the client sends the empty
  external-tables end marker after QUERY (the reference answered it
  with a spurious END_OF_STREAM, breaking the next query on the
  same connection)
- Array/Map/Tuple/Decimal columns round-tripping typed through the
  native format and the live server
"""

from __future__ import annotations

import datetime
import struct
from decimal import Decimal

import pytest

from cowsdb_spark.formats.native import (
    decode_column,
    encode_column,
    parse_native,
    read_block,
    to_native,
    wire_type,
)
from cowsdb_spark.formats import QueryResult
from cowsdb_spark.server.compression import (
    METHOD_LZ4,
    METHOD_NONE,
    FrameReader,
    cityhash128,
    compress_frame,
    lz4_compress_literal,
    lz4_decompress,
)

from test_native_server import Client, native_port, write_str, write_varint  # noqa: F401

REVISION = 54468


# ---------------------------------------------------------------- codecs


class TestLZ4:
    def test_literal_roundtrip(self):
        for payload in (b"", b"x", b"hello world", bytes(range(256)) * 40):
            enc = lz4_compress_literal(payload)
            assert lz4_decompress(enc, len(payload)) == payload

    def test_match_sequences(self):
        # handcrafted block: 4 literals "abcd", then a match of length 8
        # at offset 4 (abcdabcd), then final literals "XY".
        block = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) + bytes([0x20]) + b"XY"
        assert lz4_decompress(block, 14) == b"abcdabcdabcdXY"

    def test_overlapping_match(self):
        # 1 literal "a", match offset 1 length 7 → run-length expansion
        block = bytes([0x13]) + b"a" + struct.pack("<H", 1)
        assert lz4_decompress(block, 8) == b"aaaaaaaa"

    def test_long_literal_run_extension_bytes(self):
        payload = bytes(i & 0xFF for i in range(15 + 255 + 7))
        enc = lz4_compress_literal(payload)
        assert enc[0] == 0xF0 and enc[1] == 255 and enc[2] == 7
        assert lz4_decompress(enc, len(payload)) == payload


class TestCityHash:
    def test_all_length_branches_deterministic_and_distinct(self):
        # 0..16 (short), 17..127 (CityMurmur), >=144 (full 128-byte loop
        # + tail). No public vectors available in-container; assert
        # determinism, 128-bit spread, and sensitivity to single-byte
        # changes in every branch.
        seen = set()
        for n in (0, 1, 3, 7, 8, 9, 15, 16, 17, 31, 64, 127, 128, 143, 144, 200, 256, 400):
            data = bytes((i * 131 + n) & 0xFF for i in range(n))
            h1 = cityhash128(data)
            assert h1 == cityhash128(bytes(data))
            assert 0 <= h1[0] < 2**64 and 0 <= h1[1] < 2**64
            if n:
                flipped = bytes([data[0] ^ 1]) + data[1:]
                assert cityhash128(flipped) != h1
            assert h1 not in seen
            seen.add(h1)


class _Raw:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _need(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        assert len(out) == n
        self.pos += n
        return out


class TestFrames:
    @pytest.mark.parametrize("method", [METHOD_LZ4, METHOD_NONE])
    def test_frame_roundtrip(self, method):
        payload = b"the quick brown fox" * 50
        fr = FrameReader(_Raw(compress_frame(payload, method)))
        assert fr._need(len(payload)) == payload

    def test_checksum_rejected_on_corruption(self):
        frame = bytearray(compress_frame(b"data data data", METHOD_LZ4))
        frame[-1] ^= 0xFF
        with pytest.raises(ValueError, match="checksum"):
            FrameReader(_Raw(bytes(frame)))._need(1)

    def test_multi_frame_stream(self):
        raw = _Raw(compress_frame(b"abc") + compress_frame(b"defgh"))
        fr = FrameReader(raw)
        assert fr._need(8) == b"abcdefgh"


# ---------------------------------------------------------------- columnar


def _roundtrip(ch_type: str, values: list) -> list:
    buf = encode_column(ch_type, values)
    from cowsdb_spark.formats.native import _Cursor

    out = decode_column(ch_type, len(values), _Cursor(buf))
    return out


class TestComplexColumns:
    def test_array_of_ints(self):
        vals = [[1, 2, 3], [], [42]]
        assert _roundtrip("Array(Int64)", vals) == vals

    def test_nested_array(self):
        vals = [[[1], [2, 3]], [], [[], [4]]]
        assert _roundtrip("Array(Array(Int32))", vals) == vals

    def test_array_of_nullable_strings(self):
        vals = [["a", None], [], [None, "b", "c"]]
        assert _roundtrip("Array(Nullable(String))", vals) == vals

    def test_map_string_uint64(self):
        vals = [{"a": 1, "b": 2}, {}, {"z": 99}]
        assert _roundtrip("Map(String, UInt64)", vals) == vals

    def test_tuple_named_elements(self):
        vals = [(1, "x"), (2, "y")]
        assert _roundtrip("Tuple(id Int64, name String)", vals) == vals

    def test_tuple_unnamed(self):
        vals = [(1.5, [1, 2]), (2.5, [])]
        assert _roundtrip("Tuple(Float64, Array(Int32))", vals) == vals

    def test_decimal_widths(self):
        assert _roundtrip("Decimal(9, 2)", [Decimal("12.34"), Decimal("-0.01")]) == [
            Decimal("12.34"),
            Decimal("-0.01"),
        ]
        assert _roundtrip("Decimal(18, 4)", [Decimal("123456.7891")]) == [
            Decimal("123456.7891")
        ]
        assert _roundtrip("Decimal(38, 10)", [Decimal("-1234567890.0123456789")]) == [
            Decimal("-1234567890.0123456789")
        ]

    def test_nullable_array_slots(self):
        vals = [[1, 2], None, [3]]
        assert _roundtrip("Nullable(Array(Int64))", vals) == vals

    def test_wire_type_preserves_composites(self):
        assert wire_type("Array(UInt32)") == "Array(UInt32)"
        assert wire_type("Map(String, UInt64)") == "Map(String, UInt64)"
        assert wire_type("Tuple(a Int64, b String)") == "Tuple(a Int64, b String)"
        assert wire_type("LowCardinality(String)") == "String"
        assert wire_type("AggregateFunction(uniq, UInt64)") == "String"

    def test_to_native_parse_native_composites(self):
        res = QueryResult(
            columns=["arr", "m", "tup"],
            ch_types=["Array(Int64)", "Map(String, Int64)", "Tuple(a Int64, b String)"],
            rows=[([1, 2], {"k": 7}, (1, "one")), ([], {}, (2, "two"))],
        )
        names, types, rows = parse_native(to_native(res))
        assert names == ["arr", "m", "tup"]
        assert types == ["Array(Int64)", "Map(String, Int64)", "Tuple(a Int64, b String)"]
        assert rows == [([1, 2], {"k": 7}, (1, "one")), ([], {}, (2, "two"))]


# ---------------------------------------------------------------- protocol


class TypedClient(Client):
    """Client that decodes DATA blocks with the library column decoder
    (so Array/Map/Tuple and compressed frames are readable) and can
    speak the compressed dialect clickhouse-driver uses."""

    def __init__(self, port: int, compression: int = 0, **kw):
        self.compression = compression
        super().__init__(port, **kw)

    def binary_str(self) -> str:  # read_block-compatible alias
        return self.rstr()

    def query_packet(self, sql: str, compression: int) -> bytes:
        return (
            write_varint(1)
            + write_str("typed-query-id")
            + bytes([1])
            + write_str("") + write_str("") + write_str("0.0.0.0:0")
            + struct.pack("<Q", 0)
            + bytes([1])
            + write_str("osuser") + write_str("host") + write_str("typed-client")
            + write_varint(25) + write_varint(5) + write_varint(REVISION)
            + write_str("")
            + write_varint(0)
            + write_str("")  # end of settings
            + write_str("")  # interserver secret
            + write_varint(2)  # stage
            + write_varint(compression)
            + write_str(sql)
            + write_str("")  # end of parameters
        )

    def _marker_block_bytes(self) -> bytes:
        return (
            write_varint(1) + bytes([0]) + write_varint(2)
            + struct.pack("<i", -1) + write_varint(0)
            + write_varint(0) + write_varint(0)
        )

    def send_external_tables_marker(self):
        """The empty DATA block clickhouse-driver sends after every
        SELECT query packet."""
        body = self._marker_block_bytes()
        if self.compression:
            body = compress_frame(body, METHOD_LZ4)
        self.sock.sendall(write_varint(2) + write_str("") + body)

    def query_typed(self, sql: str, send_marker: bool = True):
        self.sock.sendall(self.query_packet(sql, self.compression))
        if send_marker:
            self.send_external_tables_marker()
        cols, rows = [], []
        while True:
            ptype = self.varint()
            if ptype == 1:  # DATA
                self.rstr()  # table name — plain even when compressed
                src = FrameReader(self) if self.compression else self
                names, types, block_rows = read_block(src, with_custom_flag=True)
                cols = list(zip(names, types))
                rows.extend(block_rows)
            elif ptype == 5:
                return cols, rows
            elif ptype == 2:
                raise RuntimeError(self.rstr())
            else:
                raise AssertionError(f"unexpected packet {ptype}")


class TestCompressedProtocol:
    def test_compressed_select_roundtrip(self, native_port):
        c = TypedClient(native_port, compression=1)
        try:
            cols, rows = c.query_typed("SELECT number, toString(number) AS s FROM numbers(300)")
            assert len(rows) == 300
            assert rows[0] == (0, "0") and rows[299] == (299, "299")
        finally:
            c.close()

    def test_compressed_then_plain_on_new_connection(self, native_port):
        c = TypedClient(native_port, compression=1)
        try:
            _, rows = c.query_typed("SELECT 1 AS x")
            assert rows == [(1,)]
        finally:
            c.close()
        c2 = TypedClient(native_port, compression=0)
        try:
            _, rows = c2.query_typed("SELECT 2 AS x")
            assert rows == [(2,)]
        finally:
            c2.close()

    def test_zlib_query_dialect_accepted(self, native_port):
        """The reference's dialect: compression flag set and the query
        string itself zlib-deflated (main.py:782-805)."""
        import zlib

        c = TypedClient(native_port, compression=0)
        try:
            comp = zlib.compress(b"SELECT 7 AS seven")
            pkt = (
                write_varint(1)
                + write_str("zlib-query-id")
                + bytes([1])
                + write_str("") + write_str("") + write_str("0.0.0.0:0")
                + struct.pack("<Q", 0)
                + bytes([1])
                + write_str("osuser") + write_str("host") + write_str("zlib-client")
                + write_varint(25) + write_varint(5) + write_varint(REVISION)
                + write_str("")
                + write_varint(0)
                + write_str("") + write_str("")
                + write_varint(2)
                + write_varint(1)  # compression flag
                + write_varint(len(comp)) + comp
                + write_str("")
            )
            self_sock = c.sock
            self_sock.sendall(pkt)
            # response is compressed (flag was 1)
            c.compression = 1
            cols, rows = [], []
            ptype = c.varint()
            assert ptype == 1
            c.rstr()
            names, types, rows = read_block(FrameReader(c), with_custom_flag=True)
            assert rows == [(7,)]
            assert c.varint() == 5
        finally:
            c.close()

    def test_marker_does_not_desync_stream(self, native_port):
        """Regression for the reference's bug: answering the empty
        external-tables marker with END_OF_STREAM desynchronizes the
        SECOND query on a reused connection."""
        c = TypedClient(native_port, compression=0)
        try:
            _, rows1 = c.query_typed("SELECT 1 AS x", send_marker=True)
            assert rows1 == [(1,)]
            _, rows2 = c.query_typed("SELECT 2 AS y", send_marker=True)
            assert rows2 == [(2,)]
            _, rows3 = c.query_typed("SELECT 3 AS z", send_marker=True)
            assert rows3 == [(3,)]
        finally:
            c.close()

    def test_compressed_insert_applied(self, native_port, spark):
        c = TypedClient(native_port, compression=0)
        try:
            c.query_typed(
                "CREATE TABLE default.comp_ins (a Int64, s String) ENGINE = Memory",
                send_marker=True,
            )
        finally:
            c.close()
        c = TypedClient(native_port, compression=1)
        try:
            # INSERT flow with compressed data blocks
            c.sock.sendall(
                c.query_packet("INSERT INTO default.comp_ins (a, s) VALUES", 1)
            )
            ptype = c.varint()
            assert ptype == 1, "expected sample block"
            c.rstr()
            read_block(FrameReader(c), with_custom_flag=True)  # sample
            block = (
                write_varint(1) + bytes([0]) + write_varint(2)
                + struct.pack("<i", -1) + write_varint(0)
                + write_varint(2) + write_varint(3)
                + write_str("a") + write_str("Int64") + bytes([0])
                + encode_column("Int64", [10, 20, 30])
                + write_str("s") + write_str("String") + bytes([0])
                + encode_column("String", ["x", "y", "z"])
            )
            c.sock.sendall(write_varint(2) + write_str("") + compress_frame(block))
            c.sock.sendall(
                write_varint(2) + write_str("") + compress_frame(c._marker_block_bytes())
            )
            assert c.varint() == 5  # END_OF_STREAM
            cols, rows = c.query_typed("SELECT a, s FROM default.comp_ins ORDER BY a")
            assert rows == [(10, "x"), (20, "y"), (30, "z")]
        finally:
            c.close()


class TestComplexTypesOverWire:
    def test_array_column(self, native_port):
        c = TypedClient(native_port)
        try:
            cols, rows = c.query_typed("SELECT [1, 2, 3] AS arr")
            assert cols[0][1].startswith("Array(")
            assert list(rows[0][0]) == [1, 2, 3]
        finally:
            c.close()

    def test_map_column(self, native_port):
        c = TypedClient(native_port)
        try:
            cols, rows = c.query_typed("SELECT map('a', 1, 'b', 2) AS m")
            assert cols[0][1].startswith("Map(")
            assert rows[0][0] == {"a": 1, "b": 2}
        finally:
            c.close()

    def test_tuple_column(self, native_port):
        c = TypedClient(native_port)
        try:
            cols, rows = c.query_typed("SELECT tuple(1, 'x') AS t")
            assert cols[0][1].startswith("Tuple(")
            assert tuple(rows[0][0]) == (1, "x")
        finally:
            c.close()

    def test_grouped_array_from_table(self, native_port, spark, sf_dir):
        from cowsdb_spark.catalog import register_tables

        register_tables(spark, sf_dir)
        c = TypedClient(native_port)
        try:
            cols, rows = c.query_typed(
                "SELECT r_regionkey, groupArray(n_nationkey) AS ks "
                "FROM nation JOIN region ON n_regionkey = r_regionkey "
                "GROUP BY r_regionkey ORDER BY r_regionkey"
            )
            assert len(rows) == 5
            assert cols[1][1].startswith("Array(")
            assert all(len(r[1]) == 5 for r in rows)
        finally:
            c.close()
