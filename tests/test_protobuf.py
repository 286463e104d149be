"""FORMAT Protobuf / ProtobufSingle / ProtobufList — pure-Python wire
codec + .proto subset parser (formats/protobuf.py), driven by the
format_schema setting like ClickHouse's schema-file formats. The
reference serves Protobuf through chDB's delegation (main.py:190);
here the wire layer encodes the public spec directly."""

from __future__ import annotations

import pytest

from cowsdb_spark.formats.protobuf import (
    Field,
    decode_message,
    decode_rows,
    encode_message,
    encode_rows,
    parse_proto,
    resolve_schema,
)

PROTO = """
syntax = "proto3";
package test;

// a scalar-heavy message
message Doc {
  int64 id = 1;
  string body = 2;
  double score = 3;
  bool flag = 4;
  repeated int32 tags = 5;
  repeated string labels = 6;
  sint64 delta = 7;
  fixed32 ip = 8;
  bytes blob = 9;
}

message Tiny { int32 a = 1; }
"""


class TestWireVectors:
    """Byte-exact checks against the protobuf encoding spec's own
    published examples (protobuf.dev/programming-guides/encoding)."""

    def test_varint_field_150(self):
        # spec example: message Test1 { int32 a = 1; } with a=150
        # encodes as 08 96 01
        fields = [Field("a", 1, "int32", False)]
        assert encode_message(fields, {"a": 150}) == b"\x08\x96\x01"

    def test_string_field(self):
        # spec example: field 2 string "testing" -> 12 07 74 65 73 74 69 6e 67
        fields = [Field("b", 2, "string", False)]
        assert encode_message(fields, {"b": "testing"}) == b"\x12\x07testing"

    def test_negative_int64_ten_bytes(self):
        # int64 -2 is the 64-bit two's complement varint (10 bytes)
        fields = [Field("a", 1, "int64", False)]
        enc = encode_message(fields, {"a": -2})
        assert enc == b"\x08\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"
        assert decode_message(fields, enc)["a"] == -2

    def test_zigzag_sint(self):
        fields = [Field("a", 1, "sint64", False)]
        # zigzag(-1) = 1, zigzag(1) = 2
        assert encode_message(fields, {"a": -1}) == b"\x08\x01"
        assert encode_message(fields, {"a": 1}) == b"\x08\x02"

    def test_packed_repeated(self):
        # spec example: repeated int32 [3, 270, 86942] packed ->
        # 22 06 03 8E 02 9E A7 05 (field 4)
        fields = [Field("d", 4, "int32", True)]
        enc = encode_message(fields, {"d": [3, 270, 86942]})
        assert enc == b"\x22\x06\x03\x8e\x02\x9e\xa7\x05"
        assert decode_message(fields, enc)["d"] == [3, 270, 86942]

    def test_default_values_omitted(self):
        fields = [Field("a", 1, "int32", False), Field("b", 2, "string", False)]
        assert encode_message(fields, {"a": 0, "b": ""}) == b""

    def test_unknown_field_skipped(self):
        known = [Field("a", 1, "int32", False)]
        wide = [Field("a", 1, "int32", False), Field("x", 9, "string", False)]
        enc = encode_message(wide, {"a": 5, "x": "junk"})
        assert decode_message(known, enc) == {"a": 5}


class TestProtoParser:
    def test_messages_and_fields(self):
        msgs = parse_proto(PROTO)
        assert set(msgs) >= {"Doc", "Tiny"}
        doc = {f.name: f for f in msgs["Doc"]}
        assert doc["id"].number == 1 and doc["id"].ptype == "int64"
        assert doc["tags"].repeated and doc["tags"].ptype == "int32"
        assert doc["delta"].ptype == "sint64"
        assert doc["blob"].ptype == "bytes"

    def test_enum_fields_are_ints(self):
        msgs = parse_proto(
            "enum Color { RED = 0; BLUE = 1; }\n"
            "message M { Color c = 1; int32 x = 2; }"
        )
        m = {f.name: f for f in msgs["M"]}
        assert m["c"].ptype == "enum"

    def test_nested_message_registered_dotted(self):
        msgs = parse_proto(
            "message Outer { message Inner { int32 v = 1; } int64 id = 1; }"
        )
        assert "Outer.Inner" in msgs and "Inner" in msgs
        assert msgs["Outer"][0].name == "id"


class TestRowStreams:
    FIELDS = [
        Field("id", 1, "int64", False),
        Field("body", 2, "string", False),
        Field("score", 3, "double", False),
    ]

    ROWS = [(1, "alpha", 1.5), (2, "", 0.0), (3, "gamma", -2.25)]

    def test_delimited_round_trip(self):
        data = encode_rows(self.FIELDS, ["id", "body", "score"],
                           ["Int64", "String", "Float64"], self.ROWS)
        names, rows = decode_rows(self.FIELDS, data)
        assert names == ["id", "body", "score"]
        # defaults decode as None (proto3 presence) — normalize
        assert rows[0] == (1, "alpha", 1.5)
        assert rows[1][0] == 2 and rows[1][1] is None and rows[1][2] is None
        assert rows[2] == (3, "gamma", -2.25)

    def test_single_takes_first_row_only(self):
        data = encode_rows(self.FIELDS, ["id", "body", "score"],
                           ["Int64", "String", "Float64"], self.ROWS,
                           mode="single")
        names, rows = decode_rows(self.FIELDS, data, mode="single")
        assert len(rows) == 1 and rows[0][0] == 1

    def test_list_envelope_round_trip(self):
        data = encode_rows(self.FIELDS, ["id", "body", "score"],
                           ["Int64", "String", "Float64"], self.ROWS,
                           mode="list")
        # envelope: every row framed as field #1 length-delimited
        assert data[0] == 0x0A
        names, rows = decode_rows(self.FIELDS, data, mode="list")
        assert len(rows) == 3 and rows[2][1] == "gamma"


class TestSchemaResolution:
    def test_resolve_and_escape_rejected(self, tmp_path):
        (tmp_path / "doc.proto").write_text(PROTO)
        fields, msg = resolve_schema("doc.proto:Doc", str(tmp_path))
        assert msg == "Doc" and any(f.name == "body" for f in fields)
        # extension added automatically
        fields2, _ = resolve_schema("doc:Tiny", str(tmp_path))
        assert fields2[0].name == "a"
        with pytest.raises(ValueError, match="escapes"):
            resolve_schema("../etc/passwd.proto:Doc", str(tmp_path))
        with pytest.raises(ValueError, match="not found"):
            resolve_schema("doc.proto:NoSuch", str(tmp_path))
        with pytest.raises(ValueError, match="format_schema"):
            resolve_schema("doc.proto", str(tmp_path))


@pytest.mark.usefixtures("spark")
class TestEngineProtobuf:
    @pytest.fixture()
    def eng(self, spark, tmp_path):
        from cowsdb_spark.engine import Engine

        (tmp_path / "doc.proto").write_text(PROTO)
        return Engine(spark, format_schema_dir=str(tmp_path))

    def test_select_format_protobuf(self, eng):
        out = eng.execute(
            "SELECT CAST(7 AS Int64) AS id, 'hi' AS body, 0.5 AS score "
            "SETTINGS format_schema='doc.proto:Doc' FORMAT Protobuf"
        )
        fields = [Field("id", 1, "int64", False),
                  Field("body", 2, "string", False),
                  Field("score", 3, "double", False)]
        names, rows = decode_rows(fields, out)
        assert rows == [(7, "hi", 0.5)]

    def test_insert_format_protobuf_round_trip(self, eng):
        u = {"user": "pbuser"}
        eng.execute("DROP TABLE IF EXISTS pb", **u)
        eng.execute(
            "CREATE TABLE pb (id Int64, body String, score Float64) "
            "ENGINE=Memory", **u
        )
        fields = [Field("id", 1, "int64", False),
                  Field("body", 2, "string", False),
                  Field("score", 3, "double", False)]
        payload = encode_rows(fields, ["id", "body", "score"],
                              ["Int64", "String", "Float64"],
                              [(1, "a", 2.5), (2, "b", 3.5)])
        stmt = (
            "INSERT INTO pb SETTINGS format_schema='doc.proto:Doc' "
            "FORMAT Protobuf\n" + payload.decode("utf-8", "surrogateescape")
        )
        eng.execute(stmt, **u)
        assert eng.execute(
            "SELECT id, body, score FROM pb ORDER BY id FORMAT CSV", **u
        ) == b'1,"a",2.5\n2,"b",3.5\n'

    def test_missing_schema_is_bad_arguments(self, eng):
        from cowsdb_spark.engine import EngineError

        with pytest.raises(EngineError) as ei:
            eng.execute("SELECT 1 AS a FORMAT Protobuf")
        assert ei.value.code == 36

    def test_capnproto_without_schema_is_bad_arguments(self, eng):
        # CapnProto is implemented (formats/capnp.py) — without a
        # format_schema it fails with BAD_ARGUMENTS, not UNKNOWN_FORMAT
        from cowsdb_spark.engine import EngineError

        with pytest.raises(EngineError) as ei:
            eng.execute("SELECT 1 AS a FORMAT CapnProto")
        assert ei.value.code == 36
