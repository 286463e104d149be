"""Cell renderers shared by the text formats.

ClickHouse text conventions (observed via the reference's formats,
test_suite.py:163-179 and the Play UI's JSON expectations):
TSV escapes tab/newline/backslash and spells NULL as ``\\N``;
floats print shortest-roundtrip; dates ``YYYY-MM-DD``; datetimes
``YYYY-MM-DD hh:mm:ss`` (second precision, UTC); arrays ``[a,b]``
with quoted strings; maps ``{'k':v}``.
"""

from __future__ import annotations

import datetime as _dt
import math


def _dt_text(v: _dt.datetime) -> str:
    """CH-style datetime text: second precision for DateTime; values
    carrying sub-second micros (DateTime64 storage, SURVEY §1.2) keep
    them — 3 digits when they are whole millis, else 6 — instead of
    silently truncating."""
    base = v.strftime("%Y-%m-%d %H:%M:%S")
    if v.microsecond == 0:
        return base
    if v.microsecond % 1000 == 0:
        return f"{base}.{v.microsecond // 1000:03d}"
    return f"{base}.{v.microsecond:06d}"


def _num_repr(v: float) -> str:
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e16:
            return str(int(v))
        return repr(v)
    return str(v)


def _timedelta_repr(v: _dt.timedelta) -> str:
    """CH has no interval output type: Date − Date is Int32 days and
    toIntervalN prints its count — render whole-day deltas as days,
    sub-day ones as seconds."""
    secs = v.total_seconds()
    if secs == int(secs) and int(secs) % 86400 == 0:
        return str(int(secs) // 86400)
    return _num_repr(secs)


def plain_text(v) -> str:
    """Unescaped scalar text (building block for all text formats)."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _num_repr(v)
    if isinstance(v, _dt.datetime):
        return _dt_text(v)
    if isinstance(v, _dt.timedelta):
        return _timedelta_repr(v)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", "replace")
    if isinstance(v, list):
        return "[" + ",".join(_quoted_inner(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{_quoted_inner(k)}:{_quoted_inner(x)}" for k, x in v.items()) + "}"
    if hasattr(v, "__fields__"):  # pyspark Row (struct) → CH tuple style
        return "(" + ",".join(_quoted_inner(x) for x in v) + ")"
    if isinstance(v, tuple):
        return "(" + ",".join(_quoted_inner(x) for x in v) + ")"
    return str(v)


def _quoted_inner(v) -> str:
    """Elements inside arrays/maps: strings get single quotes (CH style)."""
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if v is None:
        return "NULL"
    return plain_text(v)


def tsv_cell(v) -> str:
    s = plain_text(v)
    if isinstance(v, str):
        s = (
            s.replace("\\", "\\\\")
            .replace("\t", "\\t")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )
    return s


def csv_cell(v) -> str:
    if v is None:
        return "\\N"
    s = plain_text(v)
    if isinstance(v, str) or any(c in s for c in (",", '"', "\n", "\r")):
        return '"' + s.replace('"', '""') + '"'
    return s


def json_value(v):
    """JSON-native value for the JSON* formats.

    ClickHouse renders UInt64/Int64 as strings in JSON by default;
    we keep numbers as numbers (the Play UI accepts both) but turn
    non-JSON scalars (dates, datetimes, bytes) into strings.
    """
    if v is None or isinstance(v, (bool, int, str)):
        return v
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return v
    if isinstance(v, _dt.datetime):
        return _dt_text(v)
    if isinstance(v, _dt.timedelta):
        return _timedelta_repr(v)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", "replace")
    if hasattr(v, "__fields__"):  # pyspark Row (struct) → JSON object
        return {f: json_value(x) for f, x in zip(v.__fields__, v)}
    if isinstance(v, list):
        return [json_value(x) for x in v]
    if isinstance(v, dict):
        return {str(k): json_value(x) for k, x in v.items()}
    return str(v)


def pretty_width(s: str) -> int:
    return len(s)
