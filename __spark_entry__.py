"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pricing-summary query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2
inventory + §7 pipeline extensions), registered in
``cowsdb_spark.queries``.
``oracle_sql()`` — matching DuckDB SQL per query (None-oracle ops
are omitted → driver's rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cowsdb_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _q.registry()
    return reg["q25_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    return {name: qd.spark for name, qd in sorted(_q.registry().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omits non-SQL ops)."""
    return {
        name: qd.oracle
        for name, qd in sorted(_q.registry().items())
        if qd.oracle is not None
    }
