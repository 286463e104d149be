"""moospark — a PySpark-native analytics engine with the query and
data-processing capabilities of cowsdb/cowsdb (ClickHouse-compatible
OLAP server; see SURVEY.md).

Layers (mirrors the reference's two-layer shape, SURVEY.md §0):

- ``cowsdb_spark.engine`` — the thin shell: sessions, dialect
  front-end, format serialization (reference: main.py:140-217).
- Spark SQL + Catalyst — the delegated query engine (reference:
  chDB behind main.py:190).
- ``cowsdb_spark.operators`` — scale extensions (dedup, similarity,
  text analysis, as-of join) beyond the reference surface.
"""

__version__ = "0.1.0"

# Advertised ClickHouse-compatible version, reference main.py:74-78.
CLICKHOUSE_COMPAT_VERSION = "25.5.2"
CLICKHOUSE_COMPAT_REVISION = 54468
