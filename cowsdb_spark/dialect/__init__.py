"""ClickHouse-dialect front-end: CH SQL in → Spark SQL out.

The reference performs zero SQL understanding (it string-splits a
trailing FORMAT clause, main.py:534-546, and prefixes ``USE db;``,
main.py:860); everything else is delegated. Our front-end is the
Spark-side equivalent of that delegation boundary: token-aware
rewrites of the ClickHouse spellings onto Spark SQL, then
``spark.sql`` — Catalyst is our chDB.
"""

from .translate import Statement, split_statements, translate  # noqa: F401
from .types import ch_type_to_spark, spark_type_to_ch  # noqa: F401
