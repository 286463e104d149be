"""Driver-session simulation for the TIMESTAMP_NTZ bug class.

The correctness driver hands queries a SparkSession it built itself —
without session.py's ``inferTimestampNTZ.enabled=false``. Round 2 died
on that (t15/t21/t22: CAST(ntz AS BIGINT/DOUBLE) AnalysisException).
The defense is layered: catalog.load_table force-sets the conf at read
time AND casts any residual NTZ column to TimestampType. This test
turns NTZ inference back ON (driver default) and proves the three
formerly-failing queries still run and still hash-match DuckDB.
"""

from __future__ import annotations

import math

import pytest

from cowsdb_spark import catalog
from cowsdb_spark.queries import registry

REG = registry()

# r7: t21/t22 were absorbed into t20_retention, which now carries the
# windowFunnel + sequenceMatch legs (the NTZ-sensitive ts arithmetic).
FORMERLY_FAILING = ["t15_sessionize_batch", "t20_retention"]


def _canon(rows, cols):
    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        return str(v)

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", FORMERLY_FAILING)
def test_runs_with_ntz_inference_on(name, spark, ddb, sf_dir):
    qd = REG[name]
    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    # Drop memoized DataFrames so the read happens under driver-like conf.
    catalog._df_cache.clear()
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        df = qd.spark(spark, sf_dir)
        scols = df.columns
        srows = [tuple(r) for r in df.collect()]
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)
        catalog._df_cache.clear()
    res = ddb.execute(qd.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows)
    assert sorted(scols) == sorted(dcols)
    assert _canon(srows, scols) == _canon(drows, dcols)
