"""``system.*`` introspection tables (SURVEY §1.1: Play UI queries
``system.settings``, index.html:27; ClickHouse clients expect
``system.databases``/``system.tables``/``system.one``).

Synthesized on access as DataFrames over engine state — the engine's
db-remap pass routes ``system.X`` here instead of a user namespace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .localdf import local_df


def _strip_ns(spark_db: str) -> str | None:
    """u<hash>__<name> → <name>; None for non-namespace databases."""
    if "__" in spark_db and spark_db.startswith("u"):
        return spark_db.split("__", 1)[1]
    return None


def system_one(spark: SparkSession, ns: str) -> DataFrame:
    return spark.sql("SELECT CAST(0 AS TINYINT) AS dummy")


def system_databases(spark: SparkSession, ns: str) -> DataFrame:
    rows = []
    for db in spark.catalog.listDatabases():
        if db.name.startswith(ns + "__"):
            rows.append((db.name.split("__", 1)[1],))
    if not rows:
        rows = [("default",)]
    return local_df(spark, sorted(set(rows)), "name string")


def system_tables(spark: SparkSession, ns: str) -> DataFrame:
    rows = []
    for db in spark.catalog.listDatabases():
        if not db.name.startswith(ns + "__"):
            continue
        visible = db.name.split("__", 1)[1]
        for t in spark.catalog.listTables(db.name):
            if t.tableType != "TEMPORARY" and not t.name.startswith("__detached__"):
                rows.append((visible, t.name, "MergeTree"))
    schema = "database string, name string, engine string"
    if not rows:
        return local_df(spark, [], schema)
    return local_df(spark, sorted(rows), schema)


def system_settings(spark: SparkSession, ns: str) -> DataFrame:
    """A representative settings list (the Play UI only needs
    name/value/description rows to render)."""
    rows = [
        ("max_result_rows", "0", "Limit on result rows (serializer-enforced)"),
        ("max_result_bytes", "0", "Accepted and ignored"),
        ("result_overflow_mode", "throw", "Accepted and ignored"),
        ("default_format", "TSV", "Default output format"),
        ("max_threads", str(spark.sparkContext.defaultParallelism), "Spark cores"),
    ]
    return local_df(spark, rows, "name string, value string, description string")


def system_functions(spark: SparkSession, ns: str) -> DataFrame:
    from .dialect.functions import RENAMES, TEMPLATES

    names = sorted(set(RENAMES) | {k for k, v in TEMPLATES.items() if v is not None})
    return local_df(spark, [(n,) for n in names], "name string")


def system_numbers(spark: SparkSession, ns: str) -> DataFrame:
    """CH ``system.numbers`` is unbounded; Range generates lazily, so
    LIMIT short-circuits — and an unbounded full scan hangs exactly
    like it does on ClickHouse."""
    return spark.range(0, 9223372036854775806).withColumnRenamed("id", "number")


def system_columns(spark: SparkSession, ns: str) -> DataFrame:
    from .dialect.types import spark_type_to_ch

    rows = []
    for db in spark.catalog.listDatabases():
        if not db.name.startswith(ns + "__"):
            continue
        visible = db.name.split("__", 1)[1]
        for t in spark.catalog.listTables(db.name):
            if t.tableType == "TEMPORARY" or t.name.startswith("__detached__"):
                continue
            try:
                schema = spark.table(f"`{db.name}`.`{t.name}`").schema
            except Exception:
                continue
            for pos, f in enumerate(schema.fields, start=1):
                rows.append(
                    (visible, t.name, f.name, spark_type_to_ch(f.dataType, f.nullable), pos)
                )
    schema_s = "database string, table string, name string, type string, position int"
    if not rows:
        return local_df(spark, [], schema_s)
    return local_df(spark, sorted(rows), schema_s)


def system_dictionaries(spark: SparkSession, ns: str, session=None) -> DataFrame:
    """Registered CREATE DICTIONARY entries for this credential pair
    (the engine passes its UserSession; None → empty)."""
    rows = []
    for spec in (getattr(session, "dictionaries", None) or {}).values():
        rows.append(
            (spec.name, spec.source, spec.key, ",".join(spec.attrs), "FLAT")
        )
    schema = "name string, source string, key string, attribute_names string, layout string"
    return local_df(spark, sorted(rows), schema) if rows else local_df(spark, [], schema)


PROVIDERS = {
    "one": system_one,
    "databases": system_databases,
    "tables": system_tables,
    "settings": system_settings,
    "functions": system_functions,
    "numbers": system_numbers,
    "columns": system_columns,
    "dictionaries": system_dictionaries,
    "parts": None,  # defined below, resolved in materialize()
    "query_log": None,  # engine-backed, resolved in materialize()
    "processes": None,
}

# providers that take the engine's UserSession as a third argument
_SESSION_PROVIDERS = {"dictionaries"}


def system_query_log(spark: SparkSession, ns: str, engine) -> DataFrame:
    """CH-shaped query history (ring buffer per credential namespace;
    CH's table is server-wide — namespace scoping here matches the
    engine's everywhere-else isolation)."""
    rows = engine.query_log_rows(ns) if engine is not None else []
    return local_df(
        spark,
        rows,
        "type string, event_time timestamp, query_duration_ms double, "
        "query string, result_rows long, user string, exception string",
    )


def system_processes(spark: SparkSession, ns: str, engine) -> DataFrame:
    """Empty by construction: the engine executes synchronously, so a
    query can never observe another one still running in this
    snapshot-materialized view."""
    return spark.createDataFrame(
        [], "query_id string, user string, query string, elapsed double"
    )


def materialize(spark: SparkSession, ns: str, table: str, session=None, engine=None) -> str | None:
    """Build system.<table> and return a temp view name, or None.

    The name embeds the credential namespace and a uuid so concurrent
    statements never collide and no other credential can resolve this
    session's snapshot by guessing a fixed name; the engine drops the
    view once the statement's plan is analyzed."""
    import uuid

    t = table.lower()
    if t not in PROVIDERS:
        return None
    view = f"__moospark_system_{ns}_{t}_{uuid.uuid4().hex[:8]}"
    if t == "parts":
        df = system_parts(spark, ns)
    elif t == "query_log":
        df = system_query_log(spark, ns, engine)
    elif t == "processes":
        df = system_processes(spark, ns, engine)
    elif t in _SESSION_PROVIDERS:
        df = PROVIDERS[t](spark, ns, session)
    else:
        df = PROVIDERS[t](spark, ns)
    df.createOrReplaceTempView(view)
    return view


def system_parts(spark: SparkSession, ns: str) -> DataFrame:
    """Parquet files of the namespace's managed tables as CH "parts":
    (database, table, name, rows, bytes_on_disk, active). Driver-side
    metadata listing only — row counts come from parquet footers, no
    data is read."""
    import glob as _glob
    import os as _os

    rows = []
    for db in spark.catalog.listDatabases():
        if not db.name.startswith(ns + "__"):
            continue
        visible = db.name.split("__", 1)[1]
        for t in spark.catalog.listTables(db.name):
            if t.tableType == "TEMPORARY" or t.name.startswith("__detached__"):
                continue
            try:
                detail = spark.sql(
                    f"DESCRIBE TABLE EXTENDED `{db.name}`.`{t.name}`"
                ).collect()
                loc = next(r[1] for r in detail if r[0] == "Location")
            except Exception:
                continue
            path = loc.replace("file:", "")
            for f in sorted(_glob.glob(_os.path.join(path, "*.parquet"))):
                try:
                    import pyarrow.parquet as pq

                    md = pq.ParquetFile(f).metadata
                    n, size = md.num_rows, _os.path.getsize(f)
                except Exception:
                    n, size = 0, 0
                rows.append(
                    (visible, t.name, _os.path.basename(f), n, size, 1)
                )
    schema = (
        "database string, table string, name string, rows long, "
        "bytes_on_disk long, active int"
    )
    return local_df(spark, rows, schema) if rows else local_df(spark, [], schema)
