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
    from .engine import _PIPELINE_FNS

    names = sorted(
        set(RENAMES)
        | {k for k, v in TEMPLATES.items() if v is not None}
        | set(_PIPELINE_FNS)  # SQL-callable pipeline table functions
    )
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


def system_formats(spark: SparkSession, ns: str) -> DataFrame:
    from .dialect.translate import KNOWN_FORMATS

    names = sorted({v for v in KNOWN_FORMATS.values()})
    return local_df(
        spark, [(n, True, True) for n in names],
        "name string, is_input boolean, is_output boolean",
    )


def system_table_engines(spark: SparkSession, ns: str) -> DataFrame:
    rows = [(e,) for e in (
        "Memory", "MergeTree", "ReplacingMergeTree", "SummingMergeTree",
        "AggregatingMergeTree", "Log", "TinyLog", "StripeLog", "View",
        "MaterializedView", "Distributed", "URL", "File", "Merge",
    )]
    return local_df(spark, rows, "name string")


def system_data_type_families(spark: SparkSession, ns: str) -> DataFrame:
    rows = [(t, t.lower(), False) for t in (
        "Int8", "Int16", "Int32", "Int64", "Int128", "Int256",
        "UInt8", "UInt16", "UInt32", "UInt64", "UInt128", "UInt256",
        "Float32", "Float64", "Decimal", "String", "FixedString",
        "Date", "Date32", "DateTime", "DateTime64", "UUID", "IPv4",
        "IPv6", "Enum8", "Enum16", "Array", "Tuple", "Map", "Nullable",
        "LowCardinality", "Bool", "JSON", "Nothing",
    )]
    return local_df(
        spark, rows,
        "name string, case_insensitive_aliases string, alias_to boolean",
    )


def system_disks(spark: SparkSession, ns: str) -> DataFrame:
    import shutil

    du = shutil.disk_usage("/")
    rows = [("default", "/", du.free, du.total, 0)]
    return local_df(
        spark, rows,
        "name string, path string, free_space bigint, "
        "total_space bigint, keep_free_space bigint",
    )


def system_clusters(spark: SparkSession, ns: str) -> DataFrame:
    # single-node deployment: one local shard/replica (the CH default)
    rows = [("default", 1, 1, 1, "localhost", "127.0.0.1", 9000, 1)]
    return local_df(
        spark, rows,
        "cluster string, shard_num int, shard_weight int, replica_num int, "
        "host_name string, host_address string, port int, is_local tinyint",
    )


def system_time_zones(spark: SparkSession, ns: str) -> DataFrame:
    import zoneinfo

    return local_df(
        spark,
        sorted((z,) for z in zoneinfo.available_timezones()),
        "time_zone string",
    )


def system_macros(spark: SparkSession, ns: str) -> DataFrame:
    return local_df(spark, [], "macro string, substitution string")


def system_users(spark: SparkSession, ns: str) -> DataFrame:
    return local_df(
        spark, [("default", "local_directory")],
        "name string, storage string",
    )


def system_warnings(spark: SparkSession, ns: str) -> DataFrame:
    return local_df(spark, [], "message string")


def system_build_options(spark: SparkSession, ns: str) -> DataFrame:
    import pyspark

    rows = [
        ("VERSION_FULL", f"moospark (PySpark {pyspark.__version__})"),
        ("BUILD_TYPE", "Release"),
        ("SYSTEM", "Linux"),
    ]
    return local_df(spark, rows, "name string, value string")


def system_contributors(spark: SparkSession, ns: str) -> DataFrame:
    return local_df(spark, [("moospark",)], "name string")


def system_licenses(spark: SparkSession, ns: str) -> DataFrame:
    return local_df(
        spark, [("pyspark", "Apache-2.0"), ("pyarrow", "Apache-2.0")],
        "library_name string, license_type string",
    )


def _empty_activity(schema: str):
    def provider(spark: SparkSession, ns: str) -> DataFrame:
        return local_df(spark, [], schema)

    return provider


# no background merges / replication / mutations queue in this engine:
# structurally-correct empty tables (clients poll these)
system_merges = _empty_activity(
    "database string, table string, elapsed double, progress double"
)
system_replicas = _empty_activity(
    "database string, table string, is_leader tinyint, is_readonly tinyint"
)
system_mutations = _empty_activity(
    "database string, table string, mutation_id string, command string, "
    "is_done tinyint"
)
system_events = _empty_activity(
    "event string, value bigint, description string"
)
system_metrics = _empty_activity(
    "metric string, value bigint, description string"
)
system_asynchronous_metrics = _empty_activity(
    "metric string, value double"
)
system_quotas = _empty_activity("name string, keys string")
system_grants = _empty_activity(
    "user_name string, access_type string, database string"
)


PROVIDERS = {
    "one": system_one,
    "databases": system_databases,
    "tables": system_tables,
    "settings": system_settings,
    "functions": system_functions,
    "numbers": system_numbers,
    "numbers_mt": system_numbers,  # CH: same stream, parallel order
    "columns": system_columns,
    "dictionaries": system_dictionaries,
    "parts": None,  # defined below, resolved in materialize()
    "query_log": None,  # engine-backed, resolved in materialize()
    "processes": None,
    "formats": system_formats,
    "table_engines": system_table_engines,
    "data_type_families": system_data_type_families,
    "disks": system_disks,
    "clusters": system_clusters,
    "time_zones": system_time_zones,
    "macros": system_macros,
    "users": system_users,
    "warnings": system_warnings,
    "build_options": system_build_options,
    "contributors": system_contributors,
    "licenses": system_licenses,
    "merges": system_merges,
    "replicas": system_replicas,
    "mutations": system_mutations,
    "events": system_events,
    "metrics": system_metrics,
    "asynchronous_metrics": system_asynchronous_metrics,
    "quotas": system_quotas,
    "grants": system_grants,
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
