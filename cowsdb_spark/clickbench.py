"""The 43 public ClickBench queries over the ``hits_sample`` fixture.

This is the reference's own benchmark surface: its CI loads the hits
table and runs the cowsdbench sweep (SURVEY §5.1/§6;
.github/workflows/test.yml:28-31,49-61). The query texts below are
the public ClickBench set (tier [B] in SURVEY §2), adapted to the
100k-row fixture (tools/gen_hits.py) in two documented ways:

- ``HAVING COUNT(*) > 100000`` thresholds and the large OFFSETs are
  scaled to the fixture (100k rows vs 8.87M) so results are
  non-trivial;
- every ``ORDER BY c DESC LIMIT n`` gets the group keys appended as
  tie-breakers so engine vs oracle comparison is deterministic (the
  same text runs on both sides, so the measured plan shape — top-k,
  partial agg, pushdown — is unchanged).

Each entry runs verbatim through the CH-dialect engine AND DuckDB,
except where ``oracle`` overrides (regex backreference spelling:
Spark wants ``$1``, DuckDB ``\\1``).
"""

from __future__ import annotations

Q29_SUMS = ", ".join(f"SUM(ResolutionWidth + {i}) AS s{i}" for i in range(90))

QUERIES: list[dict] = [
    {"id": "cb00", "sql": "SELECT COUNT(*) AS c FROM hits"},
    {"id": "cb01", "sql": "SELECT COUNT(*) AS c FROM hits WHERE AdvEngineID <> 0"},
    {"id": "cb02", "sql": "SELECT SUM(AdvEngineID) AS s, COUNT(*) AS c, ROUND(AVG(ResolutionWidth), 4) AS a FROM hits"},
    {"id": "cb03", "sql": "SELECT ROUND(AVG(UserID), 0) AS a FROM hits", "float_tol": 1e-6},
    {"id": "cb04", "sql": "SELECT COUNT(DISTINCT UserID) AS u FROM hits"},
    {"id": "cb05", "sql": "SELECT COUNT(DISTINCT SearchPhrase) AS u FROM hits"},
    {"id": "cb06", "sql": "SELECT MIN(EventDate) AS mn, MAX(EventDate) AS mx FROM hits"},
    {"id": "cb07", "sql": "SELECT AdvEngineID, COUNT(*) AS c FROM hits WHERE AdvEngineID <> 0 GROUP BY AdvEngineID ORDER BY c DESC, AdvEngineID"},
    {"id": "cb08", "sql": "SELECT RegionID, COUNT(DISTINCT UserID) AS u FROM hits GROUP BY RegionID ORDER BY u DESC, RegionID LIMIT 10"},
    {"id": "cb09", "sql": "SELECT RegionID, SUM(AdvEngineID) AS s, COUNT(*) AS c, ROUND(AVG(ResolutionWidth), 4) AS a, COUNT(DISTINCT UserID) AS u FROM hits GROUP BY RegionID ORDER BY c DESC, RegionID LIMIT 10"},
    {"id": "cb10", "sql": "SELECT MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM hits WHERE MobilePhoneModel <> '' GROUP BY MobilePhoneModel ORDER BY u DESC, MobilePhoneModel LIMIT 10"},
    {"id": "cb11", "sql": "SELECT MobilePhone, MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM hits WHERE MobilePhoneModel <> '' GROUP BY MobilePhone, MobilePhoneModel ORDER BY u DESC, MobilePhone, MobilePhoneModel LIMIT 10"},
    {"id": "cb12", "sql": "SELECT SearchPhrase, COUNT(*) AS c FROM hits WHERE SearchPhrase <> '' GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"},
    {"id": "cb13", "sql": "SELECT SearchPhrase, COUNT(DISTINCT UserID) AS u FROM hits WHERE SearchPhrase <> '' GROUP BY SearchPhrase ORDER BY u DESC, SearchPhrase LIMIT 10"},
    {"id": "cb14", "sql": "SELECT SearchEngineID, SearchPhrase, COUNT(*) AS c FROM hits WHERE SearchPhrase <> '' GROUP BY SearchEngineID, SearchPhrase ORDER BY c DESC, SearchEngineID, SearchPhrase LIMIT 10"},
    {"id": "cb15", "sql": "SELECT UserID, COUNT(*) AS c FROM hits GROUP BY UserID ORDER BY c DESC, UserID LIMIT 10"},
    {"id": "cb16", "sql": "SELECT UserID, SearchPhrase, COUNT(*) AS c FROM hits GROUP BY UserID, SearchPhrase ORDER BY c DESC, UserID, SearchPhrase LIMIT 10"},
    {"id": "cb17", "sql": "SELECT COUNT(*) AS c FROM (SELECT UserID, SearchPhrase, COUNT(*) AS n FROM hits GROUP BY UserID, SearchPhrase LIMIT 10) t"},
    {"id": "cb18", "sql": "SELECT UserID, extract(minute FROM EventTime) AS m, SearchPhrase, COUNT(*) AS c FROM hits GROUP BY UserID, extract(minute FROM EventTime), SearchPhrase ORDER BY c DESC, UserID, m, SearchPhrase LIMIT 10"},
    {"id": "cb19", "sql": "SELECT UserID FROM hits WHERE UserID = 435090932899640449"},
    {"id": "cb20", "sql": "SELECT COUNT(*) AS c FROM hits WHERE URL LIKE '%google%'"},
    {"id": "cb21", "sql": "SELECT SearchPhrase, MIN(URL) AS mu, COUNT(*) AS c FROM hits WHERE URL LIKE '%google%' AND SearchPhrase <> '' GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"},
    {"id": "cb22", "sql": "SELECT SearchPhrase, MIN(URL) AS mu, MIN(Title) AS mt, COUNT(*) AS c, COUNT(DISTINCT UserID) AS u FROM hits WHERE Title LIKE '%the%' AND URL NOT LIKE '%.google.%' AND SearchPhrase <> '' GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"},
    {"id": "cb23", "sql": "SELECT WatchID, UserID, URL, Title, EventTime FROM hits WHERE URL LIKE '%google%' ORDER BY EventTime, WatchID LIMIT 10"},
    {"id": "cb24", "sql": "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' ORDER BY EventTime, WatchID LIMIT 10"},
    {"id": "cb25", "sql": "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' ORDER BY SearchPhrase, WatchID LIMIT 10"},
    {"id": "cb26", "sql": "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' ORDER BY EventTime, SearchPhrase, WatchID LIMIT 10"},
    {"id": "cb27", "sql": "SELECT CounterID, ROUND(AVG(length(URL)), 4) AS l, COUNT(*) AS c FROM hits WHERE URL <> '' GROUP BY CounterID HAVING COUNT(*) > 100 ORDER BY l DESC, CounterID LIMIT 25"},
    {
        "id": "cb28",
        "sql": "SELECT REGEXP_REPLACE(Referer, '^https?://(?:www\\\\.)?([^/]+)/.*$', '$1') AS k, ROUND(AVG(length(Referer)), 4) AS l, COUNT(*) AS c, MIN(Referer) AS mr FROM hits WHERE Referer <> '' GROUP BY REGEXP_REPLACE(Referer, '^https?://(?:www\\\\.)?([^/]+)/.*$', '$1') HAVING COUNT(*) > 100 ORDER BY l DESC, k LIMIT 25",
        "oracle": "SELECT REGEXP_REPLACE(Referer, '^https?://(?:www\\.)?([^/]+)/.*$', '\\1') AS k, ROUND(AVG(length(Referer)), 4) AS l, COUNT(*) AS c, MIN(Referer) AS mr FROM hits WHERE Referer <> '' GROUP BY REGEXP_REPLACE(Referer, '^https?://(?:www\\.)?([^/]+)/.*$', '\\1') HAVING COUNT(*) > 100 ORDER BY l DESC, k LIMIT 25",
    },
    {"id": "cb29", "sql": f"SELECT {Q29_SUMS} FROM hits"},
    {"id": "cb30", "sql": "SELECT SearchEngineID, ClientIP, COUNT(*) AS c, SUM(IsRefresh) AS r, ROUND(AVG(ResolutionWidth), 4) AS a FROM hits WHERE SearchPhrase <> '' GROUP BY SearchEngineID, ClientIP ORDER BY c DESC, SearchEngineID, ClientIP LIMIT 10"},
    {"id": "cb31", "sql": "SELECT WatchID, ClientIP, COUNT(*) AS c, SUM(IsRefresh) AS r, ROUND(AVG(ResolutionWidth), 4) AS a FROM hits WHERE SearchPhrase <> '' GROUP BY WatchID, ClientIP ORDER BY c DESC, WatchID, ClientIP LIMIT 10"},
    {"id": "cb32", "sql": "SELECT WatchID, ClientIP, COUNT(*) AS c, SUM(IsRefresh) AS r, ROUND(AVG(ResolutionWidth), 4) AS a FROM hits GROUP BY WatchID, ClientIP ORDER BY c DESC, WatchID, ClientIP LIMIT 10"},
    {"id": "cb33", "sql": "SELECT URL, COUNT(*) AS c FROM hits GROUP BY URL ORDER BY c DESC, URL LIMIT 10"},
    {"id": "cb34", "sql": "SELECT 1 AS one, URL, COUNT(*) AS c FROM hits GROUP BY 1, URL ORDER BY c DESC, URL LIMIT 10"},
    {"id": "cb35", "sql": "SELECT ClientIP, ClientIP - 1 AS m1, ClientIP - 2 AS m2, ClientIP - 3 AS m3, COUNT(*) AS c FROM hits GROUP BY ClientIP, ClientIP - 1, ClientIP - 2, ClientIP - 3 ORDER BY c DESC, ClientIP LIMIT 10"},
    {"id": "cb36", "sql": "SELECT URL, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' AND DontCountHits = 0 AND IsRefresh = 0 AND URL <> '' GROUP BY URL ORDER BY PageViews DESC, URL LIMIT 10"},
    {"id": "cb37", "sql": "SELECT Title, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' AND DontCountHits = 0 AND IsRefresh = 0 AND Title <> '' GROUP BY Title ORDER BY PageViews DESC, Title LIMIT 10"},
    {"id": "cb38", "sql": "SELECT URL, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' AND IsRefresh = 0 AND IsLink <> 0 AND IsDownload = 0 GROUP BY URL ORDER BY PageViews DESC, URL LIMIT 10 OFFSET 100"},
    {"id": "cb39", "sql": "SELECT TraficSourceID, SearchEngineID, AdvEngineID, CASE WHEN (SearchEngineID = 0 AND AdvEngineID = 0) THEN Referer ELSE '' END AS Src, URL AS Dst, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' AND IsRefresh = 0 GROUP BY TraficSourceID, SearchEngineID, AdvEngineID, CASE WHEN (SearchEngineID = 0 AND AdvEngineID = 0) THEN Referer ELSE '' END, URL ORDER BY PageViews DESC, TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst LIMIT 10 OFFSET 100"},
    {"id": "cb40", "sql": "SELECT URLHash, EventDate, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' AND IsRefresh = 0 AND TraficSourceID IN (-1, 6) AND RefererHash = 3594120000172545465 GROUP BY URLHash, EventDate ORDER BY PageViews DESC, URLHash, EventDate LIMIT 10 OFFSET 10"},
    {"id": "cb41", "sql": "SELECT WindowClientWidth, WindowClientHeight, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' AND IsRefresh = 0 AND DontCountHits = 0 AND URLHash = 2868770270353813622 GROUP BY WindowClientWidth, WindowClientHeight ORDER BY PageViews DESC, WindowClientWidth, WindowClientHeight LIMIT 10 OFFSET 10"},
    {"id": "cb42", "sql": "SELECT DATE_TRUNC('minute', EventTime) AS M, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND EventDate >= '2013-07-14' AND EventDate <= '2013-07-15' AND IsRefresh = 0 AND DontCountHits = 0 GROUP BY DATE_TRUNC('minute', EventTime) ORDER BY DATE_TRUNC('minute', EventTime) LIMIT 10 OFFSET 100"},
]


def register_hits(spark) -> None:
    """Register the hits_sample fixture as temp view ``hits``."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.gen_hits import ensure_hits

    spark.read.parquet(ensure_hits()).createOrReplaceTempView("hits")
