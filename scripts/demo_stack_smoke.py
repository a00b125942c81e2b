#!/usr/bin/env python
"""Demo-stack smoke: the reference's client JS against this engine.

Starts ONE combined server (static frontend + /api routes — the
single-process analog of the reference's nginx→backend topology) and
proves, without a browser, everything the unmodified client needs:

1. ``GET /`` serves the frontend's index.html; the JS/CSS assets it
   references resolve.
2. The client's exact fetch sequence works against our routes with the
   reference's payload shapes: ``GET /api/demo/connection`` →
   ``POST /api/connect/test`` → ``GET /api/demo/queries`` → one
   ``POST /api/query`` per demo query (`frontend/js/app.js:133,232`).
3. Response fields the JS renders (columns/rows/stats.executionTimeMs/
   rowsReturned, tableInfo.suggestedQuery) are present.

Frontend dir: $CLOUDFLOE_FRONTEND_DIR (default: the reference checkout's
``frontend/`` — used read-only at runtime, never copied into this repo).

Usage: python scripts/demo_stack_smoke.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRONTEND = os.environ.get(
    "CLOUDFLOE_FRONTEND_DIR", "/root/reference/frontend"
)


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def _post(base: str, path: str, payload: dict):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def main() -> int:
    if not os.path.isfile(os.path.join(FRONTEND, "index.html")):
        print(f"SKIP: no frontend at {FRONTEND} (set CLOUDFLOE_FRONTEND_DIR)")
        return 0

    from cloudfloe_spark.service.api import serve_background
    from cloudfloe_spark.session import get_spark

    spark = get_spark(app_name="demo-stack-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    server, port = serve_background(spark, static_dir=FRONTEND)
    base = f"http://127.0.0.1:{port}"

    # 1. static frontend
    status, ctype, html = _get(base, "/")
    assert status == 200 and "text/html" in ctype, (status, ctype)
    page = html.decode()
    for asset in re.findall(r'(?:src|href)="(?!http)([^"]+\.(?:js|css))"', page):
        s, ct, _ = _get(base, "/" + asset.lstrip("/"))
        assert s == 200, (asset, s)
        print(f"asset OK: {asset} ({ct})")

    # 2. the client's fetch sequence
    s, _, body = _get(base, "/api/demo/connection")
    conn = json.loads(body)["connection"]
    assert s == 200 and conn["storageType"], conn

    s, t = _post(base, "/api/connect/test", {"connection": conn})
    assert s == 200 and t["status"] == "success", t
    assert t["tableInfo"]["suggestedQuery"], t
    print("connect/test OK:", t["message"])

    s, _, body = _get(base, "/api/demo/queries")
    queries = json.loads(body)["queries"]
    assert s == 200 and len(queries) == 5, len(queries)

    for q in queries:
        s, resp = _post(
            base,
            "/api/query",
            {"sql": q["sql"], "connection": conn, "rowLimit": 100},
        )
        assert s == 200, (q["name"], resp)
        assert resp["columns"] and isinstance(resp["rows"], list), q["name"]
        assert {"executionTimeMs", "bytesScanned", "rowsReturned"} <= resp[
            "stats"
        ].keys(), q["name"]
        print(
            f"query OK: {q['name']} — {resp['stats']['rowsReturned']} rows "
            f"in {resp['stats']['executionTimeMs']} ms"
        )

    server.shutdown()
    spark.stop()
    print("PASS: unmodified reference client contract served end-to-end")
    return 0


if __name__ == "__main__":
    sys.exit(main())
