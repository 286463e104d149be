"""Stateless serverless entry point (SURVEY §3.3).

Reference shape: lambda/lambda.py:6-19 — API-Gateway event in,
query executed with no session/persistence, body out; defaults are
``SELECT version()`` / ``JSONCompact``. Here the "stateless engine"
is a module-held Engine over the shared SparkSession (warm-start
reuse, exactly how Spark-on-serverless amortizes the JVM), but each
call uses a throwaway credential namespace so no state leaks
between invocations.
"""

from __future__ import annotations

import itertools
import json
from typing import Any, Optional

from ..engine import Engine, EngineError

_engine: Optional[Engine] = None
_invocation = itertools.count()


def _get_engine() -> Engine:
    global _engine
    if _engine is None:
        _engine = Engine()
    return _engine


def handler(event: dict[str, Any], context: Any = None) -> dict[str, Any]:
    """API-Gateway-style handler, same contract as the reference."""
    if "requestContext" in event:
        event = json.loads(event["body"])
    query = event.get("query", "SELECT version()")
    fmt = event.get("default_format", "JSONCompact")
    # fresh namespace per invocation = statelessness (the reference
    # gets this by calling chdb.query with no session)
    user = f"__lambda_{next(_invocation)}"
    try:
        body = _get_engine().execute(query, fmt=fmt, user=user).decode("utf-8")
        status = 200
    except EngineError as e:
        body, status = str(e), 400
    return {
        "statusCode": status,
        "headers": {"Content-Type": "application/json"},
        "body": body,
    }
