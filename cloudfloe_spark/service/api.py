"""HTTP API (A13, `backend/main.py:646-770`) on the Python stdlib.

Same six routes and payload shapes as the reference, so its frontend
(`frontend/js/app.js`) can point at this service unchanged. Implemented
with ``http.server`` (no web-framework dependency in this container); the
handlers are plain functions over JSON dicts, so mounting them in FastAPI
— the reference's stack — is a ~20-line adapter when it's installed.

Routes:
- ``GET  /``                     → health (`backend/main.py:664-671`)
- ``GET  /health``               → health + engine version (`:674-681`)
- ``POST /api/connect/test``     → connection probe (`:684-709`)
- ``POST /api/query``            → query execution (`:712-722`)
- ``GET  /api/demo/connection``  → demo connection config (`:725-735`)
- ``GET  /api/demo/queries``     → demo query corpus (`:738-770`)
- ``POST /api/maintenance/compact`` → Iceberg compaction (beyond the
  reference, which only advises it; opt-in via
  ``CLOUDFLOE_ENABLE_MAINTENANCE=1``, 403 otherwise)
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyspark
from pydantic import ValidationError

from cloudfloe_spark.service.config import (
    MaintenanceRequest,
    QueryRequest,
    TestConnectionRequest,
)
from cloudfloe_spark.service.engine import (
    DEMO_TABLE,
    run_connection_test,
    run_maintenance_compact,
    run_query,
)
from cloudfloe_spark.service.errors import CloudfloeError

DEMO_SF_DIR = os.environ.get("CLOUDFLOE_DEMO_SF_DIR", "/root/testdata/sf0.01")


def demo_connection() -> dict:
    """Demo connection payload (`backend/main.py:725-735`), pointing at the
    local fixture warehouse instead of the reference's MinIO demo."""
    return {
        "connection": {
            "storageType": "local",
            "endpoint": "",
            "accessKey": "",
            "secretKey": "",
            "region": "us-east-1",
            "catalogType": "none",
            "tablePath": DEMO_TABLE,
        }
    }


def demo_queries() -> dict:
    """Demo corpus (`backend/main.py:738-770`): the same five shapes —
    preview / count / group-count / filter-sort / split+explode — over the
    fixture tables. DuckDB-dialect scan + functions on purpose: exercises
    the conversion + transpile path exactly like the reference corpus."""
    orders = f"{DEMO_SF_DIR}/orders.parquet"
    docs = f"{DEMO_SF_DIR}/documents.parquet"
    return {
        "queries": [
            {
                "name": "Sample Orders",
                "description": "Preview first 10 orders",
                "sql": (
                    "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate "
                    f"FROM read_parquet('{orders}') "
                    "WHERE o_orderstatus = 'O' ORDER BY o_orderdate DESC LIMIT 10"
                ),
            },
            {
                "name": "Row Count",
                "description": "Count total rows in dataset",
                "sql": f"SELECT COUNT(*) as total_orders FROM read_parquet('{orders}')",
            },
            {
                "name": "Orders by Priority",
                "description": "Count orders by priority",
                "sql": (
                    "SELECT o_orderpriority, COUNT(*) as order_count "
                    f"FROM read_parquet('{orders}') "
                    "GROUP BY o_orderpriority ORDER BY o_orderpriority DESC"
                ),
            },
            {
                "name": "Large Orders",
                "description": "Find orders over 400k",
                "sql": (
                    "SELECT o_orderkey, o_orderdate, o_totalprice "
                    f"FROM read_parquet('{orders}') "
                    "WHERE o_totalprice > 400000 ORDER BY o_totalprice DESC"
                ),
            },
            {
                "name": "Popular Words",
                "description": "Most common document words",
                "sql": (
                    "SELECT TRIM(word) as word, COUNT(*) as count FROM "
                    "(SELECT UNNEST(string_split(text, ' ')) as word "
                    f"FROM read_parquet('{docs}')) "
                    "WHERE word <> '' GROUP BY word ORDER BY count DESC"
                ),
            },
        ]
    }


# --- request handlers (framework-free) ----------------------------------------


class Handlers:
    """Route handlers bound to one SparkSession."""

    def __init__(self, spark) -> None:
        self.spark = spark

    def health_root(self) -> tuple[int, dict]:
        return 200, {"status": "healthy", "service": "cloudfloe-spark"}

    def health(self) -> tuple[int, dict]:
        return 200, {
            "status": "healthy",
            "engine": "spark",
            "engineVersion": pyspark.__version__,
        }

    def connect_test(self, payload: dict) -> tuple[int, dict]:
        try:
            req = TestConnectionRequest.model_validate(payload)
        except ValidationError as e:
            return 422, {"detail": json.loads(e.json())}
        try:
            info = run_connection_test(self.spark, req.connection)
        except CloudfloeError as e:
            return e.status_code, {"detail": e.detail}
        if info is None:
            # No internals leaked on failure (backend/main.py:533-537,696)
            return 400, {"detail": "Connection test failed"}
        return 200, {
            "status": "success",
            "message": "Connection successful",
            "tableInfo": info.model_dump(),
        }

    def query(self, payload: dict) -> tuple[int, dict]:
        try:
            req = QueryRequest.model_validate(payload)
        except ValidationError as e:
            return 422, {"detail": json.loads(e.json())}
        try:
            resp = run_query(
                self.spark, req.sql, req.connection, row_limit=req.rowLimit
            )
        except CloudfloeError as e:
            return e.status_code, {"detail": e.detail}
        except Exception:
            return 500, {"detail": "Internal server error"}
        return 200, resp.model_dump()

    def maintenance_compact(self, payload: dict) -> tuple[int, dict]:
        try:
            req = MaintenanceRequest.model_validate(payload)
        except ValidationError as e:
            return 422, {"detail": json.loads(e.json())}
        try:
            result = run_maintenance_compact(
                self.spark, req.connection, req.targetFileBytes
            )
        except CloudfloeError as e:
            return e.status_code, {"detail": e.detail}
        except Exception:
            return 500, {"detail": "Internal server error"}
        return 200, result

    def dispatch(self, method: str, path: str, payload: dict | None) -> tuple[int, dict]:
        if method == "GET" and path == "/":
            return self.health_root()
        if method == "GET" and path == "/health":
            return self.health()
        if method == "GET" and path == "/api/demo/connection":
            return 200, demo_connection()
        if method == "GET" and path == "/api/demo/queries":
            return 200, demo_queries()
        if method == "POST" and path == "/api/connect/test":
            return self.connect_test(payload or {})
        if method == "POST" and path == "/api/query":
            return self.query(payload or {})
        if method == "POST" and path == "/api/maintenance/compact":
            return self.maintenance_compact(payload or {})
        return 404, {"detail": "Not found"}


# --- stdlib HTTP server ---------------------------------------------------------


_STATIC_TYPES = {
    ".html": "text/html",
    ".css": "text/css",
    ".js": "application/javascript",
    ".json": "application/json",
    ".svg": "image/svg+xml",
    ".png": "image/png",
    ".ico": "image/x-icon",
}


def make_server(
    spark,
    host: str = "127.0.0.1",
    port: int = 8000,
    static_dir: str | None = None,
) -> ThreadingHTTPServer:
    """API server; with ``static_dir`` set it ALSO serves that directory
    with an index.html fallback — the single-process analog of the
    reference's nginx topology (`frontend/nginx.conf`: ``/api/`` proxied
    to the backend, everything else static), so the reference's client JS
    (which fetches relative ``/api/...`` paths) runs unmodified."""
    handlers = Handlers(spark)
    static_root = os.path.realpath(static_dir) if static_dir else None

    def static_file(path: str) -> tuple[int, bytes, str] | None:
        assert static_root is not None
        rel = path.split("?", 1)[0].lstrip("/") or "index.html"
        full = os.path.realpath(os.path.join(static_root, rel))
        # containment check beats sanitizing: symlinks/.. both resolve here
        if not full.startswith(static_root + os.sep) and full != static_root:
            return 404, b"not found", "text/plain"
        if os.path.isdir(full):
            full = os.path.join(full, "index.html")
        if not os.path.isfile(full):  # nginx try_files fallback
            full = os.path.join(static_root, "index.html")
            if not os.path.isfile(full):
                return None
        with open(full, "rb") as f:
            data = f.read()
        ctype = _STATIC_TYPES.get(
            os.path.splitext(full)[1].lower(), "application/octet-stream"
        )
        return 200, data, ctype

    class _Handler(BaseHTTPRequestHandler):
        def _respond(self, status: int, body: dict) -> None:
            data = json.dumps(body).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _respond_raw(self, status: int, data: bytes, ctype: str) -> None:
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            if static_root is not None and not (
                self.path.startswith("/api/") or self.path == "/health"
            ):
                served = static_file(self.path)
                if served is not None:
                    self._respond_raw(*served)
                    return
            status, body = handlers.dispatch("GET", self.path, None)
            self._respond(status, body)

        def do_POST(self) -> None:  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._respond(400, {"detail": "Invalid JSON"})
                return
            status, body = handlers.dispatch("POST", self.path, payload)
            self._respond(status, body)

        def log_message(self, *args) -> None:  # quiet
            pass

    return ThreadingHTTPServer((host, port), _Handler)


def serve_background(spark, host: str = "127.0.0.1", port: int = 0, static_dir=None):
    """Start the API on a daemon thread; returns (server, actual_port)."""
    server = make_server(spark, host, port, static_dir=static_dir)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]


def main() -> None:  # pragma: no cover - manual entry point
    from cloudfloe_spark.session import get_spark

    spark = get_spark(app_name="cloudfloe-api")
    server = make_server(
        spark,
        os.environ.get("CLOUDFLOE_HOST", "0.0.0.0"),
        int(os.environ.get("CLOUDFLOE_PORT", "8000")),
        static_dir=os.environ.get("CLOUDFLOE_STATIC_DIR") or None,
    )
    server.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
