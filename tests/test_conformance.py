"""Every registry query hash-matches its DuckDB oracle at sf0.001.

This is the in-repo mirror of the driver's CORRECTNESS gate
(driver runs the same comparison at sf0.01). Mirrors the reference's
end-to-end test strategy (SURVEY.md §5) but with value-level
assertions instead of the reference's presence checks
(test_suite.py:126 '1' in text).
"""

from __future__ import annotations

import math

import pytest

from cowsdb_spark.queries import registry

REG = registry()


def norm_cell(v):
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


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(REG))
def test_query_matches_oracle(name, spark, ddb, sf_dir):
    qd = REG[name]
    df = qd.spark(spark, sf_dir)
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]
    if qd.oracle is None:
        assert len(srows) >= 0  # rows-only contract: runs without error
        return
    res = ddb.execute(qd.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs oracle {len(drows)}"
    assert sorted(scols) == sorted(dcols), f"columns {scols} vs oracle {dcols}"
    assert canon(srows, scols) == canon(drows, dcols)
