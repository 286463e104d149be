"""End-to-end engine tests — the reference test suite's coverage
map (SURVEY §5.1) re-expressed against our engine API:
literal matrix (test_suite.py:138-161), DDL round-trip (:308-318),
numbers(N) (:320-329), mixed expressions (:331-351), edge values
(:353-365), session/auth matrix (:367-390)."""

from __future__ import annotations

import json

import pytest

from cowsdb_spark.engine import Engine, EngineError


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


class TestLiterals:
    def test_select_1(self, engine):
        assert engine.execute("SELECT 1 AS num") == b"1\n"

    def test_literal_matrix(self, engine):
        out = engine.execute("SELECT 1 AS i, 'hello' AS s, 3.14 AS f, 1.5 AS h")
        assert out == b"1\thello\t3.14\t1.5\n"

    def test_edge_values(self, engine):
        # test_suite.py:355-361
        out = engine.execute("SELECT 0 AS a, 255 AS b, 65535 AS c, 4294967295 AS d")
        assert out == b"0\t255\t65535\t4294967295\n"


class TestFormats:
    def test_format_clause_overrides(self, engine):
        doc = json.loads(engine.execute("SELECT 1 AS num FORMAT JSON", fmt="TSV"))
        assert doc["data"] == [{"num": 1}]
        assert doc["meta"][0]["type"].startswith("Int")

    def test_default_format_param(self, engine):
        doc = json.loads(engine.execute("SELECT 1 AS num", fmt="JSONCompact"))
        assert doc["data"] == [[1]]

    def test_max_result_rows_setting(self, engine):
        out = engine.execute(
            "SELECT number FROM numbers(100) ORDER BY number SETTINGS max_result_rows=5"
        )
        assert out == b"0\n1\n2\n3\n4\n"


class TestNumbers:
    def test_numbers_multirow(self, engine):
        # test_suite.py:323-325
        out = engine.execute("SELECT number FROM numbers(5) ORDER BY number")
        assert out == b"0\n1\n2\n3\n4\n"

    def test_numbers_expressions(self, engine):
        # test_suite.py:334-336
        out = engine.execute(
            "SELECT toString(number) AS s, number * 2 AS d FROM numbers(3) ORDER BY number"
        )
        assert out == b"0\t0\n1\t2\n2\t4\n"


class TestDDLAndSessions:
    def test_create_insert_select_drop(self, engine):
        # test_suite.py:308-318 shape
        engine.execute("CREATE DATABASE IF NOT EXISTS `testdb`")
        engine.execute(
            "CREATE TABLE IF NOT EXISTS testdb.test_table (id UInt32, name String) ENGINE=Memory"
        )
        engine.execute("INSERT INTO testdb.test_table VALUES (1, 'one'), (2, 'two')")
        out = engine.execute("SELECT id, name FROM testdb.test_table ORDER BY id")
        assert out == b"1\tone\n2\ttwo\n"
        engine.execute("DROP TABLE IF EXISTS testdb.test_table")
        engine.execute("DROP DATABASE IF EXISTS testdb")

    def test_use_statement_prefix(self, engine):
        # main.py:859-860 semantics: USE db; SELECT …
        engine.execute("CREATE DATABASE IF NOT EXISTS udb")
        engine.execute("USE udb; CREATE TABLE t1 (x Int64) ENGINE=Memory")
        engine.execute("USE udb; INSERT INTO t1 VALUES (42)")
        assert engine.execute("USE udb; SELECT x FROM t1") == b"42\n"
        engine.execute("DROP DATABASE IF EXISTS udb")

    def test_sessions_isolated_per_credentials(self, engine):
        # test_suite.py:367-390: different creds → different catalogs
        engine.execute("CREATE TABLE iso (x Int64) ENGINE=Memory", user="alice", password="a")
        engine.execute("INSERT INTO iso VALUES (1)", user="alice", password="a")
        assert engine.execute("SELECT x FROM iso", user="alice", password="a") == b"1\n"
        with pytest.raises(EngineError):
            engine.execute("SELECT x FROM iso", user="bob", password="b")

    def test_insert_select(self, engine):
        engine.execute("CREATE TABLE src (v Int64) ENGINE=Memory")
        engine.execute("CREATE TABLE dst (v Int64) ENGINE=Memory")
        engine.execute("INSERT INTO src VALUES (1), (2), (3)")
        engine.execute("INSERT INTO dst SELECT v FROM src WHERE v > 1")
        assert engine.execute("SELECT sum(v) AS s FROM dst") == b"5\n"
        engine.execute("DROP TABLE src")
        engine.execute("DROP TABLE dst")


class TestErrors:
    def test_bad_sql_raises_engine_error(self, engine):
        with pytest.raises(EngineError) as ei:
            engine.execute("SELECT FROM WHERE")
        assert "Code:" in str(ei.value)

    def test_missing_table(self, engine):
        with pytest.raises(EngineError):
            engine.execute("SELECT * FROM no_such_table_xyz")


class TestMergeTreeOrderBy:
    """ENGINE=MergeTree ORDER BY (test.yml:49 shape): inserts sort
    within partitions so parquet row-group min/max stats provide the
    data skipping a CH sparse primary index gives (SURVEY §4.2)."""

    def test_insert_select_lands_sorted(self, engine, tmp_path):
        import glob

        import pyarrow.parquet as pq

        engine.execute("DROP TABLE IF EXISTS mtorder")
        engine.execute(
            "CREATE TABLE mtorder (k Int64, v Int64) ENGINE=MergeTree() ORDER BY (k)"
        )
        engine.execute("INSERT INTO mtorder SELECT number % 97, number FROM numbers(20000)")
        sess = engine.get_session()
        rows = engine.spark.sql(
            f"DESCRIBE TABLE EXTENDED `{sess.spark_db()}`.mtorder"
        ).collect()
        loc = [r[1] for r in rows if r[0] == "Location"][0]
        files = glob.glob(loc.replace("file:", "") + "/*.parquet")
        assert files
        for f in files:
            ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
            assert all(a <= b for a, b in zip(ks, ks[1:])), f"unsorted file {f}"
        assert engine.execute("SELECT count(*) AS c FROM mtorder") == b"20000\n"
        engine.execute("DROP TABLE mtorder")

    def test_values_insert_still_works_on_ordered_table(self, engine):
        engine.execute("DROP TABLE IF EXISTS mtv")
        engine.execute("CREATE TABLE mtv (k Int64) ENGINE=MergeTree() ORDER BY (k)")
        engine.execute("INSERT INTO mtv VALUES (3), (1), (2)")
        assert engine.execute("SELECT k FROM mtv ORDER BY k") == b"1\n2\n3\n"
        engine.execute("DROP TABLE mtv")


class TestChErrorCodes:
    """CH ErrorCodes parity: the reference surfaces chDB's numeric
    codes in the error text (main.py:823-847); we map Spark error
    classes onto the same public numbering."""

    def _code(self, engine, sql):
        with pytest.raises(EngineError) as ei:
            engine.execute(sql)
        return ei.value.code

    def test_unknown_table_60(self, engine):
        assert self._code(engine, "SELECT * FROM no_such_tbl") == 60

    def test_unknown_identifier_47(self, engine):
        engine.execute("CREATE TABLE ec47 (x Int64) ENGINE=Memory")
        assert self._code(engine, "SELECT nope FROM ec47") == 47
        engine.execute("DROP TABLE ec47")

    def test_syntax_error_62(self, engine):
        assert self._code(engine, "SELECT (1") == 62

    def test_unknown_function_46(self, engine):
        assert self._code(engine, "SELECT definitely_not_a_function(1)") == 46


class TestWithTotals:
    """GROUP BY … WITH TOTALS (CH surface; rewritten to GROUPING SETS
    + grouping_id split in the engine)."""

    def test_tsv_blank_line_then_totals(self, engine):
        out = engine.execute(
            "SELECT number % 3 AS g, sum(number) AS s FROM numbers(10) "
            "GROUP BY g WITH TOTALS ORDER BY g"
        )
        assert out == b"0\t18\n1\t12\n2\t15\n\n0\t45\n"

    def test_json_totals_field(self, engine):
        import json

        out = engine.execute(
            "SELECT number % 3 AS g, sum(number) AS s FROM numbers(10) "
            "GROUP BY g WITH TOTALS ORDER BY g",
            fmt="JSON",
        )
        d = json.loads(out)
        assert d["totals"] == {"g": 0, "s": 45} and d["rows"] == 3

    def test_jsoncompact_totals_array(self, engine):
        import json

        out = engine.execute(
            "SELECT number % 2 AS g, count(*) AS c FROM numbers(6) "
            "GROUP BY g WITH TOTALS ORDER BY g",
            fmt="JSONCompact",
        )
        d = json.loads(out)
        assert d["totals"] == [0, 6]

    def test_string_key_defaults_to_empty(self, engine):
        out = engine.execute(
            "SELECT toString(number % 2) AS g, count(*) AS c FROM numbers(4) "
            "GROUP BY g WITH TOTALS ORDER BY g"
        )
        assert out.endswith(b"\n\n\t4\n")  # '' key, total count

    def test_without_totals_unchanged(self, engine):
        out = engine.execute(
            "SELECT number % 2 AS g, count(*) AS c FROM numbers(4) GROUP BY g ORDER BY g"
        )
        assert out == b"0\t2\n1\t2\n"


class TestMutations:
    """CH mutation/maintenance statements (ALTER … UPDATE/DELETE,
    lightweight DELETE, TRUNCATE, RENAME, ADD/DROP COLUMN, OPTIMIZE,
    EXISTS TABLE) — delegated-only surface in the reference
    (main.py:190); here implemented as stage-and-swap rewrites."""

    def _mk(self, engine, name, order_by=False):
        ob = " ENGINE=MergeTree() ORDER BY (id)" if order_by else " ENGINE=Memory"
        engine.execute(f"DROP TABLE IF EXISTS {name}")
        engine.execute(f"CREATE TABLE {name} (id UInt32, v String){ob}")
        engine.execute(f"INSERT INTO {name} VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")

    def test_alter_delete(self, engine):
        self._mk(engine, "mut1")
        engine.execute("ALTER TABLE mut1 DELETE WHERE id % 2 = 0")
        assert engine.execute("SELECT id FROM mut1 ORDER BY id") == b"1\n3\n"
        engine.execute("DROP TABLE mut1")

    def test_lightweight_delete(self, engine):
        self._mk(engine, "mut2")
        engine.execute("DELETE FROM mut2 WHERE v = 'a'")
        assert engine.execute("SELECT count(*) AS c FROM mut2") == b"3\n"
        engine.execute("DROP TABLE mut2")

    def test_alter_update(self, engine):
        self._mk(engine, "mut3")
        engine.execute("ALTER TABLE mut3 UPDATE v = upper(v), id = id + 10 WHERE id <= 2")
        out = engine.execute("SELECT id, v FROM mut3 ORDER BY id")
        assert out == b"3\tc\n4\td\n11\tA\n12\tB\n"
        engine.execute("DROP TABLE mut3")

    def test_update_preserves_order_by_property(self, engine):
        self._mk(engine, "mut4", order_by=True)
        engine.execute("ALTER TABLE mut4 UPDATE v = 'x' WHERE id = 1")
        # table property survives the swap → later sorted inserts still work
        engine.execute("INSERT INTO mut4 SELECT 5 AS id, 'e' AS v")
        assert engine.execute("SELECT v FROM mut4 WHERE id IN (1, 5) ORDER BY id") == b"x\ne\n"
        engine.execute("DROP TABLE mut4")

    def test_truncate(self, engine):
        self._mk(engine, "mut5")
        engine.execute("TRUNCATE TABLE mut5")
        assert engine.execute("SELECT count(*) AS c FROM mut5") == b"0\n"
        engine.execute("DROP TABLE mut5")

    def test_rename(self, engine):
        self._mk(engine, "mut6")
        engine.execute("DROP TABLE IF EXISTS mut6_renamed")
        engine.execute("RENAME TABLE mut6 TO mut6_renamed")
        assert engine.execute("SELECT count(*) AS c FROM mut6_renamed") == b"4\n"
        assert engine.execute("EXISTS TABLE mut6") == b"0\n"
        engine.execute("DROP TABLE mut6_renamed")

    def test_exists_table(self, engine):
        self._mk(engine, "mut7")
        assert engine.execute("EXISTS TABLE mut7") == b"1\n"
        assert engine.execute("EXISTS no_such_table_qq") == b"0\n"
        engine.execute("DROP TABLE mut7")

    def test_add_column_with_default_backfills(self, engine):
        self._mk(engine, "mut8")
        engine.execute("ALTER TABLE mut8 ADD COLUMN flag UInt8 DEFAULT 7")
        assert engine.execute("SELECT sum(flag) AS s FROM mut8") == b"28\n"
        engine.execute("ALTER TABLE mut8 ADD COLUMN IF NOT EXISTS flag UInt8")  # no-op
        engine.execute("DROP TABLE mut8")

    def test_add_column_no_default_is_metadata_only(self, engine):
        self._mk(engine, "mut9")
        engine.execute("ALTER TABLE mut9 ADD COLUMN note String")
        assert engine.execute("SELECT count(note) AS c FROM mut9") == b"0\n"
        engine.execute("DROP TABLE mut9")

    def test_drop_column(self, engine):
        self._mk(engine, "mut10")
        engine.execute("ALTER TABLE mut10 DROP COLUMN v")
        out = engine.execute("SELECT * FROM mut10 ORDER BY id LIMIT 1")
        assert out == b"1\n"
        engine.execute("DROP TABLE mut10")

    def test_optimize_compacts(self, engine):
        self._mk(engine, "mut11", order_by=True)
        for i in range(5, 9):
            engine.execute(f"INSERT INTO mut11 VALUES ({i}, 'z')")
        engine.execute("OPTIMIZE TABLE mut11 FINAL")
        assert engine.execute("SELECT count(*) AS c, sum(id) AS s FROM mut11") == b"8\t36\n"
        engine.execute("DROP TABLE mut11")
