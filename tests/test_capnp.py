"""FORMAT CapnProto — pure-Python Cap'n Proto codec + .capnp subset
parser (formats/capnp.py), driven by the format_schema setting like
ClickHouse's schema-file formats. The reference serves CapnProto
through chDB's delegation (main.py:190); here the wire layer encodes
the public spec (capnproto.org/encoding.html) directly."""

from __future__ import annotations

import struct

import pytest

from cowsdb_spark.formats.capnp import (
    Field,
    decode_rows,
    encode_message,
    encode_rows,
    layout_struct,
    parse_capnp,
    resolve_schema,
)

CAPNP = """
@0xbf5147cbbecf40c1;

struct Doc {
  id @0 :UInt64;
  body @1 :Text;
  score @2 :Float64;
  flag @3 :Bool;
  tags @4 :List(UInt32);
  labels @5 :List(Text);
  delta @6 :Int32;
  blob @7 :Data;
}

struct Tiny { a @0 :Int32; }

enum Color { red @0; green @1; blue @2; }
struct Painted { c @0 :Color; x @1 :UInt8; }
"""


class TestLayout:
    def test_hole_filling_canonical(self):
        # capnp's documented layout: Bool@0 starts a word; Int32@1
        # takes the 32-bit hole; Bool@2 the 1-bit hole; Int16@3 the
        # 16-bit hole — all within the first word.
        fs = [Field("a", 0, "bool"), Field("b", 1, "int32"),
              Field("c", 2, "bool"), Field("d", 3, "int16")]
        dw, pc = layout_struct(fs)
        offs = {f.name: f.bit_offset for f in fs}
        assert dw == 1 and pc == 0
        assert offs == {"a": 0, "b": 32, "c": 1, "d": 16}

    def test_word_extension_and_pointers(self):
        fs = [Field("u", 0, "uint64"), Field("t", 1, "text"),
              Field("f", 2, "float64"), Field("b", 3, "bool"),
              Field("x", 4, "uint32")]
        dw, pc = layout_struct(fs)
        offs = {f.name: f.bit_offset for f in fs}
        assert dw == 3 and pc == 1
        assert offs["u"] == 0 and offs["f"] == 64
        assert offs["b"] == 128 and offs["x"] == 160
        assert [f for f in fs if f.name == "t"][0].ptr_index == 0


class TestWire:
    def test_single_uint64_message_bytes(self):
        # one UInt64 field = 1 data word, 0 pointers. Message:
        # segment table (0, 2 words) + root struct pointer
        # (offset 0, data 1, ptrs 0) + the value word.
        fs = [Field("v", 0, "uint64")]
        dw, pc = layout_struct(fs)
        msg = encode_message(fs, dw, pc, {"v": 0x1122334455667788})
        assert msg[:8] == struct.pack("<II", 0, 2)
        root, val = struct.unpack_from("<QQ", msg, 8)
        assert root == (1 << 32)  # offset 0, dataWords 1, ptrWords 0
        assert val == 0x1122334455667788

    def test_text_pointer_nul_terminated(self):
        fs = [Field("t", 0, "text")]
        dw, pc = layout_struct(fs)
        msg = encode_message(fs, dw, pc, {"t": "hello"})
        # segment: root ptr, text list ptr, "hello\0" padded
        ptr, = struct.unpack_from("<Q", msg, 16)
        assert ptr & 3 == 1            # list pointer
        assert (ptr >> 32) & 7 == 2    # byte elements
        assert (ptr >> 35) == 6        # 5 chars + NUL
        assert msg[24:30] == b"hello\x00"

    def test_round_trip_all_types(self):
        fs = parse_capnp(CAPNP)["Doc"]
        cols = ["id", "body", "score", "flag", "tags", "labels", "delta",
                "blob"]
        rows = [
            (7, "alpha", 1.5, True, [1, 2, 3], ["x", "yy"], -9, b"\x00\xff"),
            (8, "", 0.0, False, [], [], 0, b""),
            (2**63, "unicode é中", -2.25, True, [4294967295],
             ["a"], -2**31, b"bin"),
        ]
        data = encode_rows(fs, cols, ["UInt64"] * 8, rows)
        names, out = decode_rows(fs, data)
        assert names == cols
        assert out[0] == rows[0]
        assert out[1][0] == 8 and out[1][3] is False and out[1][4] == []
        assert out[2][0] == 2**63 and out[2][6] == -(2**31)
        assert out[2][1] == "unicode é中"

    def test_defaults_read_as_zero_beyond_data_section(self):
        # a reader with a wider schema than the writer sees defaults
        narrow = [Field("a", 0, "uint32")]
        dwn, pcn = layout_struct(narrow)
        msg = encode_message(narrow, dwn, pcn, {"a": 5})
        wide = parse_capnp(
            "struct W { a @0 :UInt32; b @1 :UInt64; t @2 :Text; }"
        )["W"]
        names, rows = decode_rows(wide, msg)
        assert rows == [(5, 0, None)]

    def test_enum_as_uint16(self):
        fs = parse_capnp(CAPNP)["Painted"]
        assert fs[0].ctype == "enum"
        data = encode_rows(fs, ["c", "x"], ["UInt16", "UInt8"], [(2, 9)])
        _, rows = decode_rows(fs, data)
        assert rows == [(2, 9)]


class TestSchemaResolution:
    def test_resolve_and_escape_rejected(self, tmp_path):
        (tmp_path / "doc.capnp").write_text(CAPNP)
        fields, msg = resolve_schema("doc.capnp:Doc", str(tmp_path))
        assert msg == "Doc" and any(f.name == "body" for f in fields)
        fields2, _ = resolve_schema("doc:Tiny", str(tmp_path))
        assert fields2[0].name == "a"
        with pytest.raises(ValueError, match="escapes"):
            resolve_schema("../etc/x.capnp:Doc", str(tmp_path))
        with pytest.raises(ValueError, match="not found"):
            resolve_schema("doc.capnp:NoSuch", str(tmp_path))

    def test_unsupported_nested_struct_is_clear_error(self, tmp_path):
        (tmp_path / "bad.capnp").write_text(
            "struct A { x @0 :UInt8; }\nstruct B { a @0 :A; }"
        )
        with pytest.raises(ValueError, match="unsupported"):
            resolve_schema("bad.capnp:B", str(tmp_path))


@pytest.mark.usefixtures("spark")
class TestEngineCapnProto:
    @pytest.fixture()
    def eng(self, spark, tmp_path):
        from cowsdb_spark.engine import Engine

        (tmp_path / "doc.capnp").write_text(CAPNP)
        return Engine(spark, format_schema_dir=str(tmp_path))

    def test_select_format_capnproto(self, eng):
        out = eng.execute(
            "SELECT CAST(7 AS UInt64) AS id, 'hi' AS body, 0.5 AS score "
            "SETTINGS format_schema='doc.capnp:Doc' FORMAT CapnProto"
        )
        fields = parse_capnp(CAPNP)["Doc"]
        names, rows = decode_rows(fields, out)
        row = dict(zip(names, rows[0]))
        assert row["id"] == 7 and row["body"] == "hi" and row["score"] == 0.5

    def test_insert_format_capnproto_round_trip(self, eng):
        u = {"user": "cpuser"}
        eng.execute("DROP TABLE IF EXISTS cp", **u)
        eng.execute(
            "CREATE TABLE cp (id UInt64, body String, score Float64) "
            "ENGINE=Memory", **u
        )
        fields = parse_capnp(CAPNP)["Doc"]
        payload = encode_rows(
            fields, ["id", "body", "score"], ["UInt64", "String", "Float64"],
            [(1, "a", 2.5), (2, "b", 3.5)],
        )
        stmt = (
            "INSERT INTO cp SETTINGS format_schema='doc.capnp:Doc' "
            "FORMAT CapnProto\n"
            + payload.decode("utf-8", "surrogateescape")
        )
        eng.execute(stmt, **u)
        assert eng.execute(
            "SELECT id, body, score FROM cp ORDER BY id FORMAT CSV", **u
        ) == b'1,"a",2.5\n2,"b",3.5\n'

    def test_missing_schema_is_bad_arguments(self, eng):
        from cowsdb_spark.engine import EngineError

        with pytest.raises(EngineError) as ei:
            eng.execute("SELECT 1 AS a FORMAT CapnProto")
        assert ei.value.code == 36
