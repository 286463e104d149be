"""Table registration over the driver-generated parquet testdata.

Reference equivalent: per-session on-disk ClickHouse catalogs
(main.py:140-173). Here tables are parquet-backed temp views; at
100 TB these would be external Parquet/Iceberg tables partitioned on
their natural keys — the query code is identical either way because
everything goes through ``spark.table``/view names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver's star schema + pipeline tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (session id, sf_dir, table) → DataFrame. A DataFrame is an immutable
# logical plan, so memoizing skips the parquet footer/schema read that
# spark.read.parquet pays on every call (~50-150 ms each — material
# when a suite builds hundreds of plans over the same ten tables).
_df_cache: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table, normalizing exotic types.

    The driver's ``events`` table stores ``ts`` as parquet
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    ([PARQUET_TYPE_ILLEGAL]). We read it via the documented escape
    hatch ``spark.sql.legacy.parquet.nanosAsLong`` and truncate
    ns → µs exactly like DuckDB/Arrow do, so oracle comparisons see
    identical second/microsecond values.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    key = (id(spark), os.path.abspath(sf_dir), name)
    if key in _df_cache:
        return _df_cache[key]
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The driver may hand us a session without our factory config
    # (session.py): pin NTZ inference off here too, so parquet
    # TIMESTAMP(MICROS) without the UTC flag reads as TimestampType
    # everywhere (ClickHouse DateTime is an instant, not a local time).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Belt-and-braces: if a timestamp still reads NTZ (conf ignored on
    # some reader path), normalize — value-identical wall clock.
    for fld in df.schema.fields:
        if isinstance(fld.dataType, TimestampNTZType):
            df = df.withColumn(fld.name, F.col(fld.name).cast("timestamp"))
    _df_cache[key] = df
    return df


def register_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each parquet table as a temp view named after it.

    Idempotent; cheap (schema-only read at registration — Catalyst
    prunes columns and pushes filters into the parquet scan at query
    time, so registering all tables costs nothing per-query).
    """
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
