"""Serving-concurrency benchmark → BENCH_SERVE.json (VERDICT r5 #6).

Boots the REAL container entrypoint (``python -m cowsdb_spark``, the
Dockerfile CMD) and drives N simultaneous clients against both wires:

- HTTP (port 8123 contract): thread-per-client, each client issues a
  mixed query set back-to-back; per-request latency recorded.
- Native TCP (port 9000 contract): same, over the raw-socket client
  from tests/test_native_server.py.

Concurrency levels include 25 — the reference's production envelope
(fly/fly.toml:27-29 pins hard_limit=25 connections) — so the artifact
answers "does the lock-free read path actually scale to the
reference's deployed ceiling?". The reference serializes every query
behind a global session lock (main.py:34,162); this engine's
_run_select is lock-free, so aggregate throughput should RISE with
client count until the 32 local cores saturate, not stay flat.

Usage: python tools/bench_serve.py
"""

from __future__ import annotations

import base64
import json
import os
import statistics
import subprocess
import sys
import threading
import time
import urllib.parse
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Mixed workload per client: point-ish scan, aggregation, expression.
QUERY_MIX = [
    "SELECT count() AS c, sum(number) AS s FROM numbers(100000)",
    "SELECT number % 10 AS k, count() AS c FROM numbers(100000) "
    "GROUP BY k ORDER BY k",
    "SELECT 1 AS x, 'hello' AS s, now() IS NOT NULL AS t",
    "SELECT max(number) AS m FROM numbers(50000) WHERE number % 7 = 3",
]

REQUESTS_PER_CLIENT = 12
LEVELS = (1, 8, 25)


def boot():
    env = dict(os.environ)
    env["MOOSPARK_WAREHOUSE"] = f"/tmp/moospark-serve-bench-{os.getpid()}"
    env.setdefault("SPARK_DRIVER_MEMORY", "12g")
    proc = subprocess.Popen(
        [sys.executable, "-m", "cowsdb_spark", "--host", "127.0.0.1",
         "--port", "0", "--native-port", "0"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
    )
    http_port = native_port = None
    deadline = time.time() + 180
    while time.time() < deadline and (http_port is None or native_port is None):
        line = proc.stdout.readline()
        if not line:
            if proc.poll() is not None:
                raise RuntimeError(f"entrypoint died rc={proc.returncode}")
            time.sleep(0.1)
            continue
        if line.startswith("HTTP API:"):
            http_port = int(line.rsplit(":", 1)[1])
        elif line.startswith("Native protocol:"):
            native_port = int(line.rsplit(":", 1)[1])
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{http_port}/ping", timeout=2
            ) as r:
                if r.read() == b"Ok\n":
                    break
        except OSError:
            time.sleep(0.5)
    return proc, http_port, native_port


def http_get(port: int, query: str) -> bytes:
    url = f"http://127.0.0.1:{port}/?" + urllib.parse.urlencode(
        {"query": query}
    )
    req = urllib.request.Request(url)
    cred = base64.b64encode(b"default:").decode()
    req.add_header("Authorization", f"Basic {cred}")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read()


def drive(n_clients: int, one_request) -> dict:
    """Run n_clients threads × REQUESTS_PER_CLIENT requests; return
    latency percentiles + aggregate throughput."""
    lats: list[float] = []
    errs: list[str] = []
    lock = threading.Lock()

    def client(cid: int):
        for i in range(REQUESTS_PER_CLIENT):
            q = QUERY_MIX[(cid + i) % len(QUERY_MIX)]
            t0 = time.perf_counter()
            try:
                one_request(q)
            except Exception as e:  # noqa: BLE001 — recorded, not fatal
                with lock:
                    errs.append(f"{type(e).__name__}: {e}")
                continue
            dt = time.perf_counter() - t0
            with lock:
                lats.append(dt)

    threads = [
        threading.Thread(target=client, args=(c,)) for c in range(n_clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lats.sort()

    def pct(p: float) -> float:
        return round(lats[min(len(lats) - 1, int(p * len(lats)))], 3)

    return {
        "clients": n_clients,
        "requests": len(lats),
        "errors": len(errs),
        "error_sample": errs[:3],
        "wall_s": round(wall, 2),
        "qps": round(len(lats) / wall, 1),
        "p50_s": pct(0.50),
        "p90_s": pct(0.90),
        "p99_s": pct(0.99),
    }


def main() -> None:
    proc, http_port, native_port = boot()
    out: dict = {"levels": {}, "protocol": (
        f"{REQUESTS_PER_CLIENT} mixed queries per client, "
        "thread-per-client, real entrypoint subprocess"
    )}
    try:
        # warm the engine (JIT/codegen) before measuring
        for q in QUERY_MIX:
            http_get(http_port, q)

        for n in LEVELS:
            cell = drive(n, lambda q: http_get(http_port, q))
            out["levels"][f"http_{n}"] = cell
            print("http", cell, flush=True)

        from tests.test_native_server import Client

        for n in (1, 8):
            local = threading.local()

            def native_req(q):
                if not hasattr(local, "cli"):
                    local.cli = Client(native_port)
                local.cli.query(q)

            cell = drive(n, native_req)
            out["levels"][f"native_{n}"] = cell
            print("native", cell, flush=True)

        h1 = out["levels"]["http_1"]["qps"]
        h25 = out["levels"]["http_25"]["qps"]
        out["http_scaleup_1_to_25"] = round(h25 / h1, 2) if h1 else None
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
    with open(os.path.join(REPO, "BENCH_SERVE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
