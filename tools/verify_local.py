"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, then compares row count, column names,
and order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from cowsdb_spark.catalog import TABLES
from cowsdb_spark.session import get_spark


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
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# The driver's compare hashes TYPED values (via pandas/arrow), so a DuckDB
# HUGEINT (-> float64/object in pandas) vs a Spark BIGINT hashes differently
# even when every cell stringifies identically.  norm_cell() above is blind
# to that (it stringifies), which is exactly how r6's t43 slipped the local
# gate.  canon_dtype maps both engines' column types onto one class lattice
# and the verifier fails on any mismatch.

_DUCK_DTYPE = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "UBIGINT": "hugeint", "HUGEINT": "hugeint",
    "FLOAT": "float", "REAL": "float", "DOUBLE": "float",
    "BOOLEAN": "bool", "VARCHAR": "str", "BLOB": "object",
    "DATE": "date", "TIME": "object", "INTERVAL": "object",
}


def canon_dtype_duck(tname):
    t = tname.upper()
    # DECIMAL converts to float64 on the driver's pandas path, same as a
    # Spark double -> equivalent.  HUGEINT does NOT hash like BIGINT
    # (r6's t43) -> its own class.
    if t.startswith("DECIMAL") or t.startswith("NUMERIC"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return "object"
    return _DUCK_DTYPE.get(t, "object")


def canon_dtype_spark(dt):
    t = dt.lower()
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("float", "double") or t.startswith("decimal"):
        return "float"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    return "object"


def dtype_problems(spark_dtypes, duck_desc):
    """Compare per-column canonical dtypes (columns matched by name)."""
    smap = {c: canon_dtype_spark(t) for c, t in spark_dtypes}
    out = []
    for d in duck_desc:
        name, tname = d[0], str(d[1])
        if name not in smap:
            continue  # column-name mismatch reported separately
        dcanon = canon_dtype_duck(tname)
        if smap[name] != dcanon:
            out.append(f"dtype[{name}]: spark {smap[name]} vs duckdb "
                       f"{dcanon} ({tname})")
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            sdtypes = df.dtypes
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{dt:.1f}s]")
            n_rows_only += 1
            continue
        try:
            # con.sql() (not execute()) so .types carries real DuckDB type
            # names (HUGEINT vs BIGINT); DB-API description collapses all
            # numerics to 'NUMBER'.
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes_duck = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        problems.extend(dtype_problems(sdtypes, list(zip(dcols, dtypes_duck))))
        if not problems:
            sc, dc = canon(srows, scols), canon(drows, dcols)
            if sc != dc:
                diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
