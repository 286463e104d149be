"""Round-6 query-shape A/B at 10M: regex->string-ops for cb28, and
dictionary/hash-encoded string GROUP BY keys for the perf-weak
hash-agg family. Raw spark.sql, min-of-3, results cross-checked
between variants.  Scratch tool."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cowsdb_spark.session import get_spark  # noqa: E402
from tools.gen_hits import ensure_hits_10m  # noqa: E402

# cb28's regex, rewritten to pure string ops (exact; see comments)
CB28_BASE = """
SELECT REGEXP_REPLACE(Referer, '^https?://(?:www\\\\.)?([^/]+)/.*$', '$1') AS k,
       ROUND(AVG(length(Referer)), 4) AS l, COUNT(*) AS c, MIN(Referer) AS mr
FROM hits WHERE Referer <> ''
GROUP BY REGEXP_REPLACE(Referer, '^https?://(?:www\\\\.)?([^/]+)/.*$', '$1')
HAVING COUNT(*) > 100 ORDER BY l DESC, k LIMIT 25
"""

# host(x): scheme prefix -> strip optional www. (only when a non-empty
# host remains before the next '/') -> chars before '/'; no '/' or
# empty host -> whole string unchanged (regex non-match semantics)
HOST = """
CASE
  WHEN Referer LIKE 'http://%' THEN
    CASE
      WHEN Referer LIKE 'http://www.%' AND instr(substr(Referer, 12), '/') > 1
        THEN substr(substr(Referer, 12), 1, instr(substr(Referer, 12), '/') - 1)
      WHEN instr(substr(Referer, 8), '/') > 1
        THEN substr(substr(Referer, 8), 1, instr(substr(Referer, 8), '/') - 1)
      ELSE Referer
    END
  WHEN Referer LIKE 'https://%' THEN
    CASE
      WHEN Referer LIKE 'https://www.%' AND instr(substr(Referer, 13), '/') > 1
        THEN substr(substr(Referer, 13), 1, instr(substr(Referer, 13), '/') - 1)
      WHEN instr(substr(Referer, 9), '/') > 1
        THEN substr(substr(Referer, 9), 1, instr(substr(Referer, 9), '/') - 1)
      ELSE Referer
    END
  ELSE Referer
END
"""

CB28_STROPS = f"""
SELECT {HOST} AS k,
       ROUND(AVG(length(Referer)), 4) AS l, COUNT(*) AS c, MIN(Referer) AS mr
FROM hits WHERE Referer <> ''
GROUP BY {HOST}
HAVING COUNT(*) > 100 ORDER BY l DESC, k LIMIT 25
"""

EXPERIMENTS = [
    ("cb28_base", CB28_BASE),
    ("cb28_strops", CB28_STROPS),
    ("cb13_base",
     "SELECT SearchPhrase, COUNT(DISTINCT UserID) AS u FROM hits "
     "WHERE SearchPhrase <> '' GROUP BY SearchPhrase "
     "ORDER BY u DESC, SearchPhrase LIMIT 10"),
    ("cb13_hashkey",
     "SELECT min(SearchPhrase) AS SearchPhrase, COUNT(DISTINCT UserID) AS u "
     "FROM hits WHERE SearchPhrase <> '' GROUP BY xxhash64(SearchPhrase) "
     "ORDER BY u DESC, SearchPhrase LIMIT 10"),
    ("cb13_twolevel",
     "SELECT SearchPhrase, COUNT(*) AS u FROM (SELECT SearchPhrase, UserID "
     "FROM hits WHERE SearchPhrase <> '' GROUP BY SearchPhrase, UserID) g "
     "GROUP BY SearchPhrase ORDER BY u DESC, SearchPhrase LIMIT 10"),
    ("cb13_hash_twolevel",
     "SELECT min(sp) AS SearchPhrase, COUNT(*) AS u FROM ("
     "SELECT min(SearchPhrase) AS sp, h FROM (SELECT SearchPhrase, "
     "xxhash64(SearchPhrase) AS h, UserID FROM hits "
     "WHERE SearchPhrase <> '') GROUP BY h, UserID) g "
     "GROUP BY h ORDER BY u DESC, SearchPhrase LIMIT 10"),
    ("cb12_base",
     "SELECT SearchPhrase, COUNT(*) AS c FROM hits WHERE SearchPhrase <> '' "
     "GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"),
    ("cb12_hashkey",
     "SELECT min(SearchPhrase) AS SearchPhrase, COUNT(*) AS c FROM hits "
     "WHERE SearchPhrase <> '' GROUP BY xxhash64(SearchPhrase) "
     "ORDER BY c DESC, SearchPhrase LIMIT 10"),
    ("cb16_base",
     "SELECT UserID, SearchPhrase, COUNT(*) AS c FROM hits "
     "GROUP BY UserID, SearchPhrase ORDER BY c DESC, UserID, SearchPhrase "
     "LIMIT 10"),
    ("cb16_hashkey",
     "SELECT UserID, min(SearchPhrase) AS SearchPhrase, COUNT(*) AS c "
     "FROM hits GROUP BY UserID, xxhash64(SearchPhrase) "
     "ORDER BY c DESC, UserID, SearchPhrase LIMIT 10"),
    ("cb18_base",
     "SELECT UserID, extract(minute FROM EventTime) AS m, SearchPhrase, "
     "COUNT(*) AS c FROM hits GROUP BY UserID, "
     "extract(minute FROM EventTime), SearchPhrase "
     "ORDER BY c DESC, UserID, m, SearchPhrase LIMIT 10"),
    ("cb18_hashkey",
     "SELECT UserID, extract(minute FROM EventTime) AS m, "
     "min(SearchPhrase) AS SearchPhrase, COUNT(*) AS c FROM hits "
     "GROUP BY UserID, extract(minute FROM EventTime), "
     "xxhash64(SearchPhrase) ORDER BY c DESC, UserID, m, SearchPhrase "
     "LIMIT 10"),
    ("cb05_base",
     "SELECT COUNT(DISTINCT SearchPhrase) AS u FROM hits"),
    ("cb05_hashkey",
     "SELECT COUNT(DISTINCT xxhash64(SearchPhrase)) AS u FROM hits"),
    ("cb04_base",
     "SELECT COUNT(DISTINCT UserID) AS u FROM hits"),
    ("cb35_base",
     "SELECT ClientIP, ClientIP - 1 AS m1, ClientIP - 2 AS m2, "
     "ClientIP - 3 AS m3, COUNT(*) AS c FROM hits GROUP BY ClientIP "
     "ORDER BY c DESC, ClientIP LIMIT 10"),
]


def main():
    spark = get_spark("probe-shapes-r6")
    spark.read.parquet(ensure_hits_10m()).createOrReplaceTempView("hits")
    results = {}
    times = {}
    for name, sql in EXPERIMENTS:
        df = spark.sql(sql)
        rows = df.collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.sql(sql).collect()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        results[name] = rows
        print(f"{name:22} {best:7.3f}s")
    # cross-check variant results against their base
    for name in list(results):
        base = name.split("_")[0] + "_base"
        if name != base and base in results:
            a = sorted(map(tuple, results[base]))
            b = sorted(map(tuple, results[name]))
            print(f"match {name:22} vs {base}: {a == b}")
            if a != b:
                print("  base:", a[:3])
                print("  var :", b[:3])


if __name__ == "__main__":
    main()
