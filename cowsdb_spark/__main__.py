"""Container entrypoint: boot both wire protocols on one shared engine.

Mirrors the reference's deployment contract (reference Dockerfile:1,
main.py:955-968): one process serves the ClickHouse HTTP API on port
8123 and the native TCP protocol on port 9000, with SIGINT/SIGTERM
shutting both down cleanly.  ``python -m cowsdb_spark`` is the CMD of
the repo Dockerfile; the same invocation works bare-metal.

Differences from the reference, by design:

- One ``Engine`` (one SparkSession, one catalog) is shared by both
  servers, so a table created over HTTP is queryable over native —
  the reference gets the same effect via its per-auth-pair chdb
  session manager (main.py:33-35).
- ``PORT`` / ``NATIVE_PORT`` env vars are honored (the reference's
  fly.toml sets PORT=8080 for its deployment; its CI sets PORT=8123),
  with CLI flags taking precedence.  Port 0 binds an ephemeral port
  and prints the real one — used by the container-contract pytest to
  exercise this exact entrypoint without a fixed-port collision.
"""

from __future__ import annotations

import argparse
import os
import signal
import sys

from .engine import Engine
from .server.http_server import make_server
from .server.native_server import NativeServer


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        prog="python -m cowsdb_spark",
        description="moospark: ClickHouse-compatible HTTP (8123) + native (9000) servers on Spark",
    )
    p.add_argument("--host", default=os.environ.get("HOST", "0.0.0.0"))
    p.add_argument(
        "--port",
        type=int,
        default=int(os.environ.get("PORT", "8123")),
        help="HTTP API port (env PORT; 0 = ephemeral)",
    )
    p.add_argument(
        "--native-port",
        type=int,
        default=int(os.environ.get("NATIVE_PORT", "9000")),
        help="native TCP port (env NATIVE_PORT; 0 = ephemeral)",
    )
    args = p.parse_args(argv)

    engine = Engine()  # builds the SparkSession; shared by both servers

    native = NativeServer(engine, args.host, args.native_port)
    native.start_background()

    http = make_server(engine, args.host, args.port)
    http_port = http.server_address[1]

    def _shutdown(signum, frame):  # noqa: ARG001
        print("Shutting down servers...", flush=True)
        native.stop()
        # shutdown() must not run on the serve_forever thread; we're on
        # the signal frame of the main thread which IS that thread, so
        # close the socket and exit — daemon threads die with us.
        http.server_close()
        sys.exit(0)

    signal.signal(signal.SIGINT, _shutdown)
    signal.signal(signal.SIGTERM, _shutdown)

    print(f"HTTP API: http://{args.host}:{http_port}", flush=True)
    print(f"Native protocol: {args.host}:{native.port}", flush=True)
    try:
        http.serve_forever()
    except KeyboardInterrupt:
        _shutdown(signal.SIGINT, None)


if __name__ == "__main__":
    main()
