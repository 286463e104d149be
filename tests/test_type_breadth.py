"""Tier-[D] type breadth (SURVEY §1.2 last row): Decimal / UUID /
IPv4 / IPv6 / Enum / LowCardinality / FixedString / Tuple DDL parse,
INSERT/SELECT round-trip, and SHOW CREATE TABLE preserving the
declared ClickHouse type names (the reference returns chDB's names;
ours come from the ``moospark.ch_types`` table property)."""

from __future__ import annotations

import pytest

from cowsdb_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


U = {"user": "types", "password": "t"}


class TestTypeRoundTrips:
    def test_decimal(self, engine):
        engine.execute("CREATE TABLE ty_dec (d Decimal(9,2), e Decimal64(4), f Decimal128(10)) ENGINE=Memory", **U)
        engine.execute("INSERT INTO ty_dec VALUES (12.34, 5.6789, -1.0123456789)", **U)
        assert engine.execute("SELECT d, e, f FROM ty_dec", **U) == b"12.34\t5.6789\t-1.0123456789\n"

    def test_uuid(self, engine):
        engine.execute("CREATE TABLE ty_uuid (u UUID) ENGINE=Memory", **U)
        engine.execute("INSERT INTO ty_uuid VALUES ('a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11')", **U)
        assert engine.execute("SELECT u FROM ty_uuid", **U) == b"a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11\n"

    def test_enum(self, engine):
        engine.execute("CREATE TABLE ty_enum (e Enum8('red' = 1, 'green' = 2), f Enum16('a' = 1000)) ENGINE=Memory", **U)
        engine.execute("INSERT INTO ty_enum VALUES ('red', 'a')", **U)
        assert engine.execute("SELECT e, f FROM ty_enum", **U) == b"red\ta\n"

    def test_low_cardinality(self, engine):
        engine.execute(
            "CREATE TABLE ty_lc (s LowCardinality(String), n LowCardinality(Nullable(String))) ENGINE=Memory",
            **U,
        )
        engine.execute("INSERT INTO ty_lc VALUES ('x', NULL)", **U)
        assert engine.execute("SELECT s, n FROM ty_lc", **U) == b"x\t\\N\n"
        assert engine.execute(
            "SELECT count(DISTINCT s) AS c FROM ty_lc", **U
        ) == b"1\n"

    def test_ip_types(self, engine):
        engine.execute("CREATE TABLE ty_ip (v4 IPv4, v6 IPv6) ENGINE=Memory", **U)
        engine.execute("INSERT INTO ty_ip VALUES ('1.2.3.4', '::1')", **U)
        assert engine.execute("SELECT v4, v6 FROM ty_ip", **U) == b"1.2.3.4\t::1\n"

    def test_datetime64_subsecond_values(self, engine):
        """VERDICT r2 #6: DateTime64(p) must keep sub-second values
        through INSERT/SELECT, not silently truncate to seconds."""
        engine.execute(
            "CREATE TABLE ty_dt64 (t3 DateTime64(3), t6 DateTime64(6)) ENGINE=Memory",
            **U,
        )
        engine.execute(
            "INSERT INTO ty_dt64 VALUES "
            "('2024-03-01 12:34:56.789', '2024-03-01 12:34:56.789123')",
            **U,
        )
        assert engine.execute("SELECT t3, t6 FROM ty_dt64", **U) == (
            b"2024-03-01 12:34:56.789\t2024-03-01 12:34:56.789123\n"
        )

    def test_datetime64_native_codec_roundtrip(self):
        import datetime as dt

        from cowsdb_spark.formats.native import decode_column, encode_column

        class R:
            def __init__(self, b):
                self.b, self.off = b, 0

            def _need(self, n):
                out = self.b[self.off : self.off + n]
                self.off += n
                return out

        vals = [
            dt.datetime(2024, 3, 1, 12, 34, 56, 789000),
            dt.datetime(1970, 1, 1, 0, 0, 0, 1000),
        ]
        for t in ("DateTime64(3)", "DateTime64(6)", "DateTime64(3, 'UTC')"):
            enc = encode_column(t, vals)
            got = decode_column(t, len(vals), R(enc))
            assert got == vals, t

    def test_fixed_string(self, engine):
        engine.execute("CREATE TABLE ty_fs (f FixedString(4)) ENGINE=Memory", **U)
        engine.execute("INSERT INTO ty_fs VALUES ('abcd')", **U)
        assert engine.execute("SELECT f FROM ty_fs", **U) == b"abcd\n"

    def test_tuple_literal_insert(self, engine):
        # CH tuple literal in VALUES — needs the struct() rewrite
        engine.execute("CREATE TABLE ty_tup (t Tuple(a Int64, b String)) ENGINE=Memory", **U)
        engine.execute("INSERT INTO ty_tup VALUES ((1, 'x')), ((2, 'y'))", **U)
        assert engine.execute(
            "SELECT t.a AS a, t.b AS b FROM ty_tup ORDER BY a", **U
        ) == b"1\tx\n2\ty\n"

    def test_tuple_mixed_row(self, engine):
        engine.execute(
            "CREATE TABLE ty_tup2 (id Int64, t Tuple(x Float64, y Float64), s String) ENGINE=Memory",
            **U,
        )
        engine.execute(
            "INSERT INTO ty_tup2 VALUES (1, (0.5, 1.5), 'p'), (2, (2.5, 3.5), 'q')", **U
        )
        assert engine.execute(
            "SELECT id, t.y AS y, s FROM ty_tup2 ORDER BY id", **U
        ) == b"1\t1.5\tp\n2\t3.5\tq\n"

    def test_nested_tuple_literal(self, engine):
        engine.execute(
            "CREATE TABLE ty_tup3 (t Tuple(p Tuple(a Int64, b Int64), q Int64)) ENGINE=Memory",
            **U,
        )
        engine.execute("INSERT INTO ty_tup3 VALUES (((1, 2), 3))", **U)
        assert engine.execute("SELECT t.p.b AS b, t.q AS q FROM ty_tup3", **U) == b"2\t3\n"

    def test_values_without_tuples_unchanged(self, engine):
        # plain VALUES must not be rewritten (regression guard)
        engine.execute("CREATE TABLE ty_plain (a Int64, b String) ENGINE=Memory", **U)
        engine.execute("INSERT INTO ty_plain VALUES (1, 'x'), (2, 'y')", **U)
        assert engine.execute("SELECT count(*) AS c FROM ty_plain", **U) == b"2\n"


class TestShowCreatePreservesDeclaredTypes:
    def test_show_create_ch_names(self, engine):
        engine.execute(
            "CREATE TABLE ty_show (u UUID, s LowCardinality(String), "
            "e Enum8('on' = 1, 'off' = 0), d Decimal(9,2), ip IPv4) "
            "ENGINE = MergeTree ORDER BY u",
            **U,
        )
        out = engine.execute("SHOW CREATE TABLE ty_show", **U).decode()
        assert "`u` UUID" in out
        assert "`s` LowCardinality(String)" in out
        assert "Enum8(" in out
        assert "`d` Decimal(9, 2)" in out
        assert "`ip` IPv4" in out
        assert "ENGINE = MergeTree" in out

    def test_aggregation_on_typed_columns(self, engine):
        engine.execute(
            "CREATE TABLE ty_agg (k LowCardinality(String), v Decimal(18,4)) ENGINE=Memory", **U
        )
        engine.execute(
            "INSERT INTO ty_agg VALUES ('a', 1.5), ('a', 2.25), ('b', 10.0)", **U
        )
        out = engine.execute(
            "SELECT k, sum(v) AS s FROM ty_agg GROUP BY k ORDER BY k", **U
        )
        assert out == b"a\t3.75\nb\t10\n" or out == b"a\t3.7500\nb\t10.0000\n"
