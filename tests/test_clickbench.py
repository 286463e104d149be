"""ClickBench sweep: engine (CH dialect) vs DuckDB oracle on
hits_sample (SURVEY §5.2 item 5; the reference CI's benchmark,
test.yml:28-31,57-61)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from cowsdb_spark.clickbench import QUERIES, register_hits
from cowsdb_spark.engine import Engine
from tools.gen_hits import ensure_hits


@pytest.fixture(scope="module")
def engine(spark):
    eng = Engine(spark)
    register_hits(spark)
    return eng


@pytest.fixture(scope="module")
def hits_ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW hits AS SELECT * FROM read_parquet('{ensure_hits()}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        return v
    try:  # decimals / numpy scalars
        if isinstance(v, int):
            return v
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def _rows_equal(a, b, tol):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            va, vb = _norm(va), _norm(vb)
            if isinstance(va, float) or isinstance(vb, float):
                if va is None or vb is None:
                    if va is not vb:
                        return False
                    continue
                fa, fb = float(va), float(vb)
                if not math.isclose(fa, fb, rel_tol=tol, abs_tol=tol):
                    return False
            elif va != vb:
                return False
    return True


@pytest.mark.parametrize("q", QUERIES, ids=[q["id"] for q in QUERIES])
def test_clickbench_query(q, engine, hits_ddb):
    df, _, _, _ = engine.execute_to_df(q["sql"])
    spark_rows = [tuple(r) for r in df.collect()]
    oracle_rows = hits_ddb.execute(q.get("oracle", q["sql"])).fetchall()
    tol = q.get("float_tol", 1e-9)
    assert _rows_equal(spark_rows, oracle_rows, tol), (
        f"{q['id']}: {len(spark_rows)} vs {len(oracle_rows)} rows; "
        f"first spark={spark_rows[:2]} oracle={oracle_rows[:2]}"
    )


class TestHostExtractRewrite:
    """r6: cb28's REGEXP_REPLACE domain extraction compiles to
    LIKE/instr/substr string ops (dialect/functions.py
    _fn_regexp_replace); the rewrite must be exact vs the real regex,
    including the optional-www backtracking and newline rows."""

    def test_translation_fires(self):
        from cowsdb_spark.dialect.translate import translate

        st = translate(
            "SELECT REGEXP_REPLACE(Referer, "
            "'^https?://(?:www\\\\.)?([^/]+)/.*$', '$1') AS k FROM hits"
        )[0]
        assert "instr(" in st.spark_sql  # string-op tier emitted
        assert "regexp_replace" in st.spark_sql  # newline fallback kept

    def test_non_matching_patterns_untouched(self):
        from cowsdb_spark.dialect.translate import translate

        st = translate(
            "SELECT REGEXP_REPLACE(x, '[aeiou]', '*') AS m FROM t"
        )[0]
        assert "instr(" not in st.spark_sql

    def test_exact_vs_real_regex(self, spark):
        # evaluate rewrite and genuine regex side-by-side on
        # adversarial strings; they must agree row-for-row (the
        # genuine side goes through a literal spark.sql call because
        # the dialect would rewrite both sides)
        from cowsdb_spark.dialect.translate import translate

        vals = [
            "http://example.com/path", "https://www.x.com/a/b",
            "http://www./path", "http://hostonly", "HTTP://upper.com/x",
            "https://www.y/", "ftp://z/a", "", "http://www.",
            "https://a.b.c/d?q=1", "http://h/", "https://www.www.d/e",
            "http://a//b", "http:///x", "https://www./",
            # every Java line terminator: $ matches BEFORE a final one,
            # so these rows must take the real-regex tier (ADVICE r6
            # found NEL/LS/PS missing from the guard)
            "http://a/b\n", "http://a/b\r", "http://a/b\x85",
            "http://a/b\u2028", "http://a/b\u2029", "http://a/b\u2028x",
            "http://nl.host/p\nq", "https://www.m.com/x\u2029",
        ]
        union = " UNION ALL ".join(f"SELECT {v!r} AS r" for v in vals)

        rewritten = translate(
            "SELECT REGEXP_REPLACE(r, "
            "'^https?://(?:www\\\\.)?([^/]+)/.*$', '$1') AS k "
            "FROM (" + union + ") t"
        )[0].spark_sql
        got = [row["k"] for row in spark.sql(rewritten).collect()]
        want = [
            row["k"] for row in spark.sql(
                "SELECT regexp_replace(r, "
                "'^https?://(?:www\\\\.)?([^/]+)/.*$', '$1') AS k "
                "FROM (" + union + ") t"
            ).collect()
        ]
        assert got == want
