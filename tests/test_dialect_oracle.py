"""Engine (CH dialect path) vs DuckDB oracle for the dialect features
added in the gap-hunt rounds: DISTINCT ON, LIMIT BY, LIMIT offset,count,
ANY JOIN dedup, * REPLACE, combinators. Complements test_clickbench
(which covers the ClickBench shapes) with feature-targeted checks on
the TPC-H-ish testdata."""

from __future__ import annotations

import duckdb
import pytest

from cowsdb_spark.engine import Engine

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "orders", "part")


@pytest.fixture(scope="module")
def engine(spark):
    from cowsdb_spark.catalog import register_tables

    register_tables(spark, SF_DIR, TABLES)
    return Engine(spark)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _check(engine, ddb, ch_sql, duck_sql=None):
    ours = engine.execute(ch_sql + " FORMAT TSV").decode().rstrip("\n").split("\n")
    theirs = [
        "\t".join("\\N" if v is None else str(v) for v in row)
        for row in ddb.execute(duck_sql or ch_sql).fetchall()
    ]
    assert ours == theirs, f"\nquery: {ch_sql}\nours:   {ours[:5]}\ntheirs: {theirs[:5]}"


class TestDialectOracle:
    def test_distinct_on(self, engine, ddb):
        _check(
            engine,
            ddb,
            "SELECT DISTINCT ON (n_regionkey) n_name, n_regionkey FROM nation "
            "ORDER BY n_regionkey, n_name",
        )  # DuckDB supports DISTINCT ON natively — same semantics

    def test_limit_comma(self, engine, ddb):
        _check(
            engine,
            ddb,
            "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5, 3",
            "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 3 OFFSET 5",
        )

    def test_limit_by(self, engine, ddb):
        _check(
            engine,
            ddb,
            "SELECT n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name "
            "LIMIT 2 BY n_regionkey",
            "SELECT n_regionkey, n_name FROM ("
            "  SELECT n_regionkey, n_name, row_number() OVER ("
            "    PARTITION BY n_regionkey ORDER BY n_regionkey, n_name) rn FROM nation) "
            "WHERE rn <= 2 ORDER BY n_regionkey, n_name",
        )

    def test_any_join_dedup(self, engine, ddb, spark):
        # USING needs the key under the same name on both sides
        spark.sql(
            "SELECT n_regionkey AS r_regionkey, n_name FROM nation"
        ).createOrReplaceTempView("nation_r")
        ddb.execute(
            "CREATE OR REPLACE VIEW nation_r AS "
            "SELECT n_regionkey AS r_regionkey, n_name FROM nation"
        )
        out = engine.execute(
            "SELECT r_name, n_name FROM region ANY LEFT JOIN nation_r "
            "USING (r_regionkey) ORDER BY r_name FORMAT TSV"
        ).decode().rstrip("\n").split("\n")
        # ANY = exactly one (arbitrary) match per left row; validate
        # the structure and membership rather than the survivor choice
        n_regions = ddb.execute("SELECT count(*) FROM region").fetchone()[0]
        assert len(out) == n_regions
        valid = {
            tuple(r)
            for r in ddb.execute(
                "SELECT r_name, n_name FROM region LEFT JOIN nation_r USING (r_regionkey)"
            ).fetchall()
        }
        for line in out:
            r_name, n_name = line.split("\t")
            assert (r_name, n_name) in valid

    def test_star_replace(self, engine, ddb):
        _check(
            engine,
            ddb,
            "SELECT * REPLACE (r_regionkey + 100 AS r_regionkey) FROM region "
            "ORDER BY r_regionkey",
            "SELECT * EXCLUDE (r_regionkey), r_regionkey + 100 AS r_regionkey "
            "FROM region ORDER BY r_regionkey",
        )

    def test_count_bare_and_countdistinct(self, engine, ddb):
        _check(
            engine,
            ddb,
            "SELECT count(), countDistinct(n_regionkey) FROM nation",
            "SELECT count(*), count(DISTINCT n_regionkey) FROM nation",
        )

    def test_group_by_all(self, engine, ddb):
        _check(
            engine,
            ddb,
            "SELECT n_regionkey, count() AS c FROM nation GROUP BY ALL ORDER BY n_regionkey",
            "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY ALL ORDER BY n_regionkey",
        )
