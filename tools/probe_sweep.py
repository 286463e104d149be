"""Dialect gap-probe harness (round-4 sweep 9+).

Feeds candidate ClickHouse spellings through the engine and compares
the TSV result against the expected text.  Used interactively to find
translator gaps: failures become the work-list for the next breadth
commit, then graduate into value-level tests in tests/test_dialect.py.

Usage: python tools/probe_sweep.py [section ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (sql, expected TSV without trailing newline; None = just expect no error)
PROBES: dict[str, list[tuple[str, str | None]]] = {
    "tuple": [
        ("SELECT tuple(1, 'a') AS t", None),
        ("SELECT tupleElement(tuple(1, 2), 1) AS r", "1"),
        ("SELECT tuple(1, 2).1 AS r", "1"),
        ("SELECT tupleElement(tuple('x', 'y'), 2) AS r", "y"),
    ],
    "null": [
        ("SELECT assumeNotNull(CAST(NULL AS Nullable(Int32))) AS r", None),
        ("SELECT assumeNotNull(toNullable(7)) AS r", "7"),
        ("SELECT toNullable(3) AS r", "3"),
        ("SELECT nullIf(1, 1) AS r", "\\N"),
        ("SELECT nullIf(2, 1) AS r", "2"),
        ("SELECT isZeroOrNull(0) AS r", "true"),
        ("SELECT isZeroOrNull(5) AS r", "false"),
    ],
    "string": [
        ("SELECT leftPad('x', 3, '_') AS r", "__x"),
        ("SELECT rightPad('x', 3, '_') AS r", "x__"),
        ("SELECT trimLeft('  a ') AS r", "a "),
        ("SELECT trimRight(' a  ') AS r", " a"),
        ("SELECT trimBoth(' a ') AS r", "a"),
        ("SELECT startsWith('hello', 'he') AS r", "true"),
        ("SELECT endsWith('hello', 'lo') AS r", "true"),
        ("SELECT substringIndex('a.b.c', '.', 2) AS r", "a.b"),
        ("SELECT splitByChar(',', 'a,b,c') AS r", "['a','b','c']"),
        ("SELECT splitByString('::', 'a::b') AS r", "['a','b']"),
        ("SELECT splitByRegexp('[0-9]+', 'a1b22c') AS r", "['a','b','c']"),
        ("SELECT arrayStringConcat(['a','b'], '-') AS r", "a-b"),
        ("SELECT repeat('ab', 3) AS r", "ababab"),
        ("SELECT space(3) AS r", "   "),
        ("SELECT left('hello', 2) AS r", "he"),
        ("SELECT right('hello', 2) AS r", "lo"),
        ("SELECT concatWithSeparator('-', 'a', 'b') AS r", "a-b"),
        ("SELECT base64Encode('abc') AS r", "YWJj"),
        ("SELECT base64Decode('YWJj') AS r", "abc"),
        ("SELECT hex(255) AS r", "FF"),
        ("SELECT unhex('414243') AS r", "ABC"),
        ("SELECT bin(5) AS r", None),
        ("SELECT ascii('A') AS r", "65"),
        ("SELECT char(72, 105) AS r", "Hi"),
        ("SELECT format('{}-{}', 'a', 'b') AS r", "a-b"),
        ("SELECT initcap('hello world') AS r", "Hello World"),
        ("SELECT normalizeQuery('SELECT 1, 2') AS r", None),
        ("SELECT tokens('a b  c') AS r", "['a','b','c']"),
    ],
    "date": [
        ("SELECT toUnixTimestamp(toDateTime('1970-01-02 00:00:00')) AS r", "86400"),
        ("SELECT fromUnixTimestamp(86400) AS r", "1970-01-02 00:00:00"),
        ("SELECT formatDateTime(toDateTime('2024-03-05 07:08:09'), '%Y/%m/%d') AS r", "2024/03/05"),
        ("SELECT parseDateTimeBestEffort('2024-03-05 07:08:09') AS r", "2024-03-05 07:08:09"),
        ("SELECT monthName(toDate('2024-03-05')) AS r", "March"),
        ("SELECT toQuarter(toDate('2024-05-05')) AS r", "2"),
        ("SELECT toISOWeek(toDate('2024-01-04')) AS r", "1"),
        ("SELECT toISOYear(toDate('2024-01-04')) AS r", "2024"),
        ("SELECT timeSlot(toDateTime('2024-01-01 10:44:00')) AS r", "2024-01-01 10:30:00"),
        ("SELECT dateName('month', toDate('2024-03-05')) AS r", "March"),
        ("SELECT age('day', toDate('2024-01-01'), toDate('2024-01-31')) AS r", "30"),
        ("SELECT dateAdd(day, 3, toDate('2024-01-01')) AS r", None),
        ("SELECT timestampAdd(toDateTime('2024-01-01 00:00:00'), INTERVAL 1 HOUR) AS r", "2024-01-01 01:00:00"),
        ("SELECT toStartOfInterval(toDateTime('2024-01-01 10:44:00'), INTERVAL 15 MINUTE) AS r", "2024-01-01 10:30:00"),
        ("SELECT toRelativeDayNum(toDate('1970-01-10')) AS r", "9"),
        ("SELECT toStartOfFifteenMinutes(toDateTime('2024-01-01 10:44:00')) AS r", "2024-01-01 10:30:00"),
    ],
    "math": [
        ("SELECT intDiv(7, 2) AS r", "3"),
        ("SELECT intDivOrZero(7, 0) AS r", "0"),
        ("SELECT moduloOrZero(7, 0) AS r", "0"),
        ("SELECT gcd(12, 18) AS r", "6"),
        ("SELECT lcm(4, 6) AS r", "12"),
        ("SELECT exp2(3) AS r", "8"),
        ("SELECT exp10(2) AS r", "100"),
        ("SELECT cbrt(27) AS r", "3"),
        ("SELECT degrees(pi()) AS r", "180"),
        ("SELECT radians(180) AS r", None),
        ("SELECT sign(-5) AS r", "-1"),
        ("SELECT factorial(5) AS r", "120"),
        ("SELECT isFinite(1.0) AS r", "true"),
        ("SELECT isInfinite(1.0 / 0.0) AS r", "\\N"),
        ("SELECT isNaN(0.0 / 0.0) AS r", "false"),
        ("SELECT roundBankers(2.5) AS r", "2"),
        ("SELECT roundToExp2(100) AS r", "64"),
        ("SELECT truncate(3.77, 1) AS r", "3.7"),
    ],
    "agg": [
        ("SELECT quantiles(0.5, 0.9)(x) AS r FROM (SELECT number AS x FROM numbers(101))", None),
        ("SELECT groupArray(x) AS r FROM (SELECT number AS x FROM numbers(3))", "[0,1,2]"),
        ("SELECT groupUniqArray(x % 2) AS r FROM (SELECT number AS x FROM numbers(4))", None),
        ("SELECT groupBitAnd(x) AS r FROM (SELECT 6 AS x UNION ALL SELECT 7)", "6"),
        ("SELECT groupBitOr(x) AS r FROM (SELECT 4 AS x UNION ALL SELECT 1)", "5"),
        ("SELECT groupBitXor(x) AS r FROM (SELECT 5 AS x UNION ALL SELECT 3)", "6"),
        ("SELECT sumCount(x) AS r FROM (SELECT number AS x FROM numbers(4))", "(6,4)"),
        ("SELECT deltaSum(x) AS r FROM (SELECT number AS x FROM numbers(5))", "4"),
        ("SELECT stddevPop(x) AS r FROM (SELECT number AS x FROM numbers(2))", "0.5"),
        ("SELECT varSamp(x) AS r FROM (SELECT number AS x FROM numbers(3))", "1"),
        ("SELECT corr(x, y) AS r FROM (SELECT number AS x, number * 2 AS y FROM numbers(10))", "1"),
        ("SELECT covarPop(x, x) AS r FROM (SELECT number AS x FROM numbers(2))", "0.25"),
        ("SELECT first_value(x) AS r FROM (SELECT number AS x FROM numbers(3) ORDER BY x)", "0"),
        ("SELECT last_value(x) AS r FROM (SELECT number AS x FROM numbers(3) ORDER BY x)", "2"),
        ("SELECT minMap(m) AS r FROM (SELECT map('a', 2) AS m UNION ALL SELECT map('a', 1))", None),
        ("SELECT uniqCombined(x) AS r FROM (SELECT number % 10 AS x FROM numbers(100))", None),
        ("SELECT uniqHLL12(x) AS r FROM (SELECT number % 10 AS x FROM numbers(100))", None),
    ],
    "url": [
        ("SELECT domain('http://www.example.com/a/b') AS r", "www.example.com"),
        ("SELECT domainWithoutWWW('http://www.example.com/a') AS r", "example.com"),
        ("SELECT topLevelDomain('http://www.example.com/a') AS r", "com"),
        ("SELECT protocol('https://x.y/z') AS r", "https"),
        ("SELECT path('http://x.y/a/b?q=1') AS r", "/a/b"),
        ("SELECT pathFull('http://x.y/a/b?q=1') AS r", "/a/b?q=1"),
        ("SELECT queryString('http://x.y/a?q=1&w=2') AS r", "q=1&w=2"),
        ("SELECT fragment('http://x.y/a#frag') AS r", "frag"),
        ("SELECT extractURLParameter('http://x.y/a?q=1&w=2', 'w') AS r", "2"),
        ("SELECT extractURLParameters('http://x.y/a?q=1&w=2') AS r", "['q=1','w=2']"),
        ("SELECT cutQueryString('http://x.y/a?q=1') AS r", "http://x.y/a"),
        ("SELECT cutWWW('http://www.x.y/a') AS r", "http://x.y/a"),
        ("SELECT netloc('http://u:p@x.y:8080/a') AS r", None),
        ("SELECT decodeURLComponent('a%20b') AS r", "a b"),
        ("SELECT encodeURLComponent('a b') AS r", "a%20b"),
        ("SELECT firstSignificantSubdomain('http://news.example.com.cn/a') AS r", None),
        ("SELECT cutToFirstSignificantSubdomain('http://a.b.example.com/x') AS r", None),
        ("SELECT URLHierarchy('http://x.y/a/b') AS r", None),
        ("SELECT URLPathHierarchy('http://x.y/a/b') AS r", None),
    ],
    "bit": [
        ("SELECT bitTest(5, 0) AS r", "1"),
        ("SELECT bitTest(5, 1) AS r", "0"),
        ("SELECT bitTestAll(7, 0, 1) AS r", "1"),
        ("SELECT bitTestAny(4, 0, 1) AS r", "0"),
        ("SELECT bitRotateLeft(1, 3) AS r", "8"),
        ("SELECT bitCount(7) AS r", "3"),
        ("SELECT bitHammingDistance(5, 6) AS r", "2"),
    ],
    "uuid": [
        ("SELECT toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS r", "61f0c404-5cb3-11e7-907b-a6006ad3dba0"),
        ("SELECT length(toString(generateUUIDv4())) AS r", "36"),
        ("SELECT UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS r", None),
        ("SELECT empty(toUUID('00000000-0000-0000-0000-000000000000')) AS r", None),
    ],
    "json2": [
        ("SELECT simpleJSONExtractInt('{\"a\": 5}', 'a') AS r", "5"),
        ("SELECT simpleJSONExtractString('{\"a\": \"x\"}', 'a') AS r", "x"),
        ("SELECT simpleJSONHas('{\"a\": 1}', 'a') AS r", "true"),
        ("SELECT visitParamExtractInt('{\"a\": 5}', 'a') AS r", "5"),
        ("SELECT JSONExtractKeys('{\"a\":1,\"b\":2}') AS r", "['a','b']"),
        ("SELECT JSONType('{\"a\":1}') AS r", "Object"),
        ("SELECT JSONArrayLength('[1,2,3]') AS r", "3"),
    ],
    "format_readable": [
        ("SELECT formatReadableSize(1024) AS r", "1.00 KiB"),
        ("SELECT formatReadableQuantity(1500) AS r", "1.50 thousand"),
        ("SELECT formatReadableTimeDelta(90) AS r", None),
    ],
    "misc": [
        ("SELECT sleep(0) AS r", "0"),
        ("SELECT hostName() AS r", None),
        ("SELECT currentUser() AS r", "default"),
        ("SELECT currentDatabase() AS r", "default"),
        ("SELECT transform(2, [1,2,3], ['a','b','c'], 'z') AS r", "b"),
        ("SELECT transform(9, [1,2,3], ['a','b','c'], 'z') AS r", "z"),
        ("SELECT greatest(1, 2, 3) AS r", "3"),
        ("SELECT least(1, 2, 3) AS r", "1"),
        ("SELECT bar(5, 0, 10, 10) AS r", None),
        ("SELECT formatRow('CSV', 1, 'a') AS r", "1,a\\n"),
        ("SELECT toTypeName(1) AS r", None),
        ("SELECT identity(42) AS r", "42"),
        ("SELECT materialize(42) AS r", "42"),
        ("SELECT ignore(1, 2) AS r", "0"),
        ("SELECT isConstant(1) AS r", None),
        ("SELECT rowNumberInAllBlocks() AS r FROM numbers(1)", "0"),
        ("SELECT arrayJoin([1,2]) AS r", "1\n2"),
        ("SELECT indexHint(1) AS r", None),
        ("SELECT countDigits(1234) AS r", "4"),
    ],
}

PROBES["window2"] = [
    ("SELECT number, ntile(2) OVER (ORDER BY number) AS r FROM numbers(4) ORDER BY number", "0\t1\n1\t1\n2\t2\n3\t2"),
    ("SELECT number, percent_rank() OVER (ORDER BY number) AS r FROM numbers(3) ORDER BY number", None),
    ("SELECT number, cume_dist() OVER (ORDER BY number) AS r FROM numbers(2) ORDER BY number", None),
    ("SELECT number, nth_value(number, 2) OVER (ORDER BY number ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS r FROM numbers(3) ORDER BY number", None),
    ("SELECT number, anyLast(number) OVER (ORDER BY number ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r FROM numbers(3) ORDER BY number", None),
    ("SELECT groupArray(number) OVER (ORDER BY number ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS r FROM numbers(3) ORDER BY 1", None),
    ("SELECT number, row_number() OVER w AS r FROM numbers(3) WINDOW w AS (ORDER BY number) ORDER BY number", "0\t1\n1\t2\n2\t3"),
]
PROBES["subquery"] = [
    ("SELECT number FROM numbers(5) WHERE number IN (SELECT number FROM numbers(2)) ORDER BY number", "0\n1"),
    ("SELECT number FROM numbers(5) WHERE number NOT IN (SELECT number FROM numbers(4)) ORDER BY number", "4"),
    ("SELECT number FROM numbers(5) WHERE number GLOBAL IN (SELECT number FROM numbers(2)) ORDER BY number", "0\n1"),
    ("SELECT (number, number) IN ((1, 1), (2, 2)) AS r FROM numbers(3) ORDER BY number", None),
    ("SELECT number FROM numbers(3) WHERE EXISTS (SELECT 1 WHERE number > 1) ORDER BY number", None),
    ("SELECT number FROM numbers(5) WHERE number > ALL (SELECT number FROM numbers(3)) ORDER BY number", "3\n4"),
    ("SELECT number FROM numbers(5) WHERE number >= ANY (SELECT number + 3 FROM numbers(2)) ORDER BY number", "3\n4"),
    ("WITH top AS (SELECT number FROM numbers(3)) SELECT count(*) AS c FROM top", "3"),
    ("SELECT (SELECT max(number) FROM numbers(5)) AS r", "4"),
]
PROBES["interval"] = [
    ("SELECT toDate('2024-01-31') + INTERVAL 1 MONTH AS r", "2024-02-29"),
    ("SELECT toDateTime('2024-01-01 00:00:00') - INTERVAL 90 SECOND AS r", "2023-12-31 23:58:30"),
    ("SELECT toIntervalDay(2) + toDate('2024-01-01') AS r", "2024-01-03"),
    ("SELECT INTERVAL 2 DAY + toDate('2024-01-01') AS r", "2024-01-03"),
    ("SELECT toDate('2024-03-05') - toDate('2024-03-01') AS r", "4"),
]
PROBES["stringdist"] = [
    ("SELECT editDistance('kitten', 'sitting') AS r", "3"),
    ("SELECT levenshteinDistance('abc', 'abd') AS r", "1"),
    ("SELECT editDistanceUTF8('abc', 'abd') AS r", "1"),
    ("SELECT soundex('Robert') AS r", "R163"),
    ("SELECT stringJaccardIndex('abc', 'bcd') AS r", None),
    ("SELECT damerauLevenshteinDistance('abc', 'acb') AS r", None),
]
PROBES["trig"] = [
    ("SELECT sinh(0) AS r", "0"),
    ("SELECT cosh(0) AS r", "1"),
    ("SELECT tanh(0) AS r", "0"),
    ("SELECT asinh(0) AS r", "0"),
    ("SELECT acosh(1) AS r", "0"),
    ("SELECT atanh(0) AS r", "0"),
    ("SELECT atan2(0, 1) AS r", "0"),
    ("SELECT hypot(3, 4) AS r", "5"),
    ("SELECT log1p(0) AS r", "0"),
    ("SELECT expm1(0) AS r", "0"),
]
PROBES["encode"] = [
    ("SELECT base58Encode('abc') AS r", None),
    ("SELECT base58Decode(base58Encode('abc')) AS r", "abc"),
    ("SELECT base32Encode('abc') AS r", None),
    ("SELECT bitmaskToList(10) AS r", "2,8"),
    ("SELECT bitmaskToArray(10) AS r", "[2,8]"),
    ("SELECT bitPositionsToArray(10) AS r", "[1,3]"),
    ("SELECT toDecimalString(3.14159, 3) AS r", "3.142"),
    ("SELECT punycodeEncode('abc') AS r", None),
]
PROBES["select_modifiers"] = [
    ("SELECT * EXCEPT (b) FROM (SELECT 1 AS a, 2 AS b)", "1"),
    ("SELECT * REPLACE (a + 1 AS a) FROM (SELECT 1 AS a, 2 AS b)", "2\t2"),
    ("SELECT COLUMNS('a|b') FROM (SELECT 1 AS a, 2 AS b, 3 AS c)", "1\t2"),
    ("SELECT any(a), any(b) FROM (SELECT 1 AS a, 2 AS b)", "1\t2"),
]
PROBES["null_funcs"] = [
    ("SELECT toString(NULL) AS r", "\\N"),
    ("SELECT coalesce(NULL, NULL, 7) AS r", "7"),
    ("SELECT ifNull(NULL, 'x') AS r", "x"),
    ("SELECT defaultValueOfTypeName('Int32') AS r", None),
    ("SELECT emptyArrayInt32() AS r", "[]"),
    ("SELECT emptyArrayString() AS r", "[]"),
    ("SELECT notEmpty('x') AS r", "true"),
]


PROBES["sweep11"] = [
    ("SELECT positionCaseInsensitive('Hello','hel') AS r", "1"),
    ("SELECT arrayEnumerateDense([10,20,10]) AS r", "[1,2,1]"),
    ("SELECT arrayReduce('sum', [1,2,3]) AS r", "6"),
    ("SELECT multiSearchFirstIndex('hello', ['xx','ell']) AS r", "2"),
    ("SELECT multiSearchAllPositions('hello', ['l','x']) AS r", "[3,0]"),
    ("SELECT multiMatchAny('hello', ['^x', 'l+o$']) AS r", "true"),
    ("SELECT round(ngramDistance('ClickHouse','House'), 4) AS r", "0.5556"),
    ("SELECT extractAll('a1b22c', '[0-9]+') AS r", "['1','22']"),
    (r"SELECT extractGroups('a=1', '(\\w+)=(\\w+)') AS r", "['a','1']"),
    ("SELECT mapFilter((k, v) -> v > 1, map('a',1,'b',2)) AS r", "{'b':2}"),
    ("SELECT mapApply((k, v) -> (k, v * 2), map('a', 1)) AS r", "{'a':2}"),
    ("SELECT mapSort(map('b',1,'a',2)) AS r", "{'a':2,'b':1}"),
    ("SELECT arrayShiftLeft([1,2,3], 1, 0) AS r", "[2,3,0]"),
    ("SELECT timeDiff(toDateTime('2024-01-01 00:00:00'), toDateTime('2024-01-01 01:00:00')) AS r", "3600"),
    ("SELECT 0b101 AS r", "5"),
    ("SELECT 0x1F AS r", "31"),
    ("SELECT untuple(tuple(1, 'a')) AS a, 9 AS b", "1\ta\t9"),
    ("SELECT initializeAggregation('sum', 3) AS r", "3"),
    ("SELECT toTypeName(1) AS r", "Int32"),
    ("SELECT snowflakeToDateTime(1426860702823350272) AS r", "2021-08-15 10:57:56"),
    ("SELECT geohashEncode(-5.60302734375, 42.593994140625, 5) AS r", "ezs42"),
    ("SELECT pointInPolygon((3., 3.), [(6, 0), (8, 4), (5, 8), (0, 2)]) AS r", "1"),
    ("SELECT round(jaroSimilarity('abc','abd'), 4) AS r", "0.7778"),
    ("SELECT normalizeUTF8NFC('abc') AS r", "abc"),
    ("SELECT runningDifference(n) AS r FROM (SELECT number * number AS n FROM numbers(3))", "0\n1\n3"),
    ("SELECT neighbor(number, 1) AS r FROM numbers(2)", "1\n\\N"),
    ("SELECT number AS r FROM numbers(5) ORDER BY number OFFSET 2 ROWS FETCH FIRST 2 ROWS ONLY", "2\n3"),
    ("SELECT b AS r FROM VALUES('a Int32, b String', (1, 'x')) ", "x"),
    ("SELECT sequenceMatch('(?1).*(?2)')(ts, ev = 'A', ev = 'B') AS r FROM (SELECT 1 AS ts, 'A' AS ev UNION ALL SELECT 2, 'B')", "1"),
    ("SELECT windowFunnel(10)(ts, ev = 'A', ev = 'B') AS r FROM (SELECT 1 AS ts, 'A' AS ev UNION ALL SELECT 5, 'B')", "2"),
]


def main() -> None:
    from cowsdb_spark.engine import Engine
    from cowsdb_spark.session import get_spark

    sections = sys.argv[1:] or list(PROBES)
    eng = Engine(get_spark("probe-sweep"))
    ok = miss = err = 0
    for sec in sections:
        for sql, want in PROBES[sec]:
            try:
                got = eng.execute(sql).decode().rstrip("\n")
                if want is None or got == want:
                    ok += 1
                else:
                    miss += 1
                    print(f"MISMATCH [{sec}] {sql}\n  want={want!r} got={got!r}")
            except Exception as e:  # noqa: BLE001
                err += 1
                msg = str(e).replace("\n", " ")[:160]
                print(f"ERROR    [{sec}] {sql}\n  {msg}")
    print(f"\n{ok} ok, {miss} mismatch, {err} error")


if __name__ == "__main__":
    main()

PROBES["sweep12_vector"] = [
    ("SELECT arrayDotProduct([1,2], [3,4]) AS r", "11"),
    ("SELECT L2Distance([0,0], [3,4]) AS r", "5"),
    ("SELECT cosineDistance([1,0], [0,1]) AS r", "1"),
    ("SELECT L2Normalize([3,4]) AS r", "[0.6,0.8]"),
]

PROBES["sweep12_bitmap"] = [
    ("SELECT bitmapCardinality(bitmapBuild([1,2,3,3])) AS r", "3"),
    ("SELECT bitmapAnd(bitmapBuild([1,2,3]), bitmapBuild([2,3,4])) AS r", "[2,3]"),
    ("SELECT bitmapHasAll(bitmapBuild([1,2,3]), bitmapBuild([2,3])) AS r", "true"),
    ("SELECT groupBitmap(x) AS r FROM (SELECT arrayJoin([1,2,2,3]) AS x)", "3"),
]

PROBES["sweep12_misc"] = [
    ("SELECT count() AS c FROM numbers(4, 4)", "4"),
    ("SELECT byteSwap(3351772109) AS r", "3455829959"),
    ("SELECT parseReadableSize('1 KiB') AS r", "1024"),
    ("SELECT byteSize(toInt32(1)) AS r", "4"),
    ("SELECT fromUnixTimestamp64Milli(1704067200000) AS r", "2024-01-01 00:00:00"),
    ("SELECT arrayShiftLeft([1,2,3], 1) AS r", "[2,3,0]"),
]
