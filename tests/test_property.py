"""Property-based checks for the custom operators.

Randomized inputs cross-checked against independent implementations
(numpy percentile, pandas merge_asof) — the operators' semantics must
hold on inputs nobody hand-picked. Example counts are small because
each example is a Spark job; deadline disabled for JVM warm-up.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cowsdb_spark.operators.asof import asof_join
from cowsdb_spark.operators.quantile import exact_percentiles

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


class TestExactPercentileProperty:
    @given(
        vals=st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1,
            max_size=200,
        ),
        q=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0]),
    )
    @settings(**_SETTINGS)
    def test_matches_numpy_linear_interpolation(self, spark, vals, q):
        df = spark.createDataFrame(pd.DataFrame({"v": vals}))
        (got,) = exact_percentiles(df, "v", [q])
        want = float(np.percentile(np.array(vals, dtype=float), q * 100))
        assert got == pytest.approx(want, rel=1e-9, abs=1e-9)


class TestAsofProperty:
    @given(
        lts=st.lists(st.integers(0, 1000), min_size=1, max_size=30),
        rts=st.lists(st.integers(0, 1000), min_size=1, max_size=30),
        direction=st.sampled_from(["backward", "forward", "nearest"]),
    )
    @settings(**_SETTINGS)
    def test_matches_pandas_merge_asof(self, spark, lts, rts, direction):
        rts = sorted(set(rts))  # asof right side: distinct sorted ts
        left = pd.DataFrame({"k": 1, "ts": sorted(lts)})
        right = pd.DataFrame({"k": 1, "ts": rts, "v": [float(t) for t in rts]})
        want = pd.merge_asof(
            left, right, on="ts", by="k", direction=direction
        )["v"].tolist()

        ldf = spark.createDataFrame(left[["k", "ts"]])
        rdf = spark.createDataFrame(right)
        got = (
            asof_join(ldf, rdf, on="k", direction=direction)
            .orderBy("ts")
            .select("v")
            .toPandas()["v"]
            .tolist()
        )
        assert len(got) == len(want)
        for g, w in zip(got, want):
            if pd.isna(w):
                assert g is None or pd.isna(g)
            else:
                assert g == w
