"""HTTP API tests (A13) — the six routes over a live server thread."""

from __future__ import annotations

import json
import urllib.request

import pytest

from cloudfloe_spark.service.api import serve_background


@pytest.fixture(scope="module")
def api(spark):
    server, port = serve_background(spark)
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _get(base: str, path: str):
    try:
        with urllib.request.urlopen(base + path) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(base: str, path: str, payload: dict):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_routes(api):
    status, body = _get(api, "/")
    assert status == 200 and body["status"] == "healthy"
    status, body = _get(api, "/health")
    assert status == 200 and body["engine"] == "spark" and body["engineVersion"]


def test_demo_connection_and_queries(api):
    status, conn = _get(api, "/api/demo/connection")
    assert status == 200 and conn["connection"]["storageType"] == "local"
    status, corpus = _get(api, "/api/demo/queries")
    assert status == 200 and len(corpus["queries"]) == 5
    assert all({"name", "description", "sql"} <= q.keys() for q in corpus["queries"])


def test_connect_test_roundtrip(api, sf_dir):
    status, body = _post(
        api,
        "/api/connect/test",
        {
            "connection": {
                "storageType": "local",
                "endpoint": "",
                "accessKey": "",
                "secretKey": "",
                "tablePath": f"{sf_dir}/orders.parquet",
            }
        },
    )
    assert status == 200
    assert body["status"] == "success"
    assert body["tableInfo"]["rows"] > 0
    assert "suggestedQuery" in body["tableInfo"]


def test_connect_test_failure_is_generic_400(api):
    status, body = _post(
        api,
        "/api/connect/test",
        {
            "connection": {
                "storageType": "local",
                "endpoint": "",
                "accessKey": "",
                "secretKey": "",
                "tablePath": "/nonexistent/x1",
            }
        },
    )
    assert status == 400
    assert body["detail"] == "Connection test failed"  # no internals leaked


def test_query_roundtrip(api, sf_dir):
    status, body = _post(
        api,
        "/api/query",
        {
            "sql": (
                "SELECT o_orderpriority, COUNT(*) AS n "
                f"FROM read_parquet('{sf_dir}/orders.parquet') "
                "GROUP BY o_orderpriority ORDER BY n DESC"
            ),
            "connection": {
                "storageType": "local",
                "endpoint": "",
                "accessKey": "",
                "secretKey": "",
            },
            "rowLimit": 100,
        },
    )
    assert status == 200
    assert body["columns"] == ["o_orderpriority", "n"]
    assert body["stats"]["rowsReturned"] == len(body["rows"])
    assert body["truncated"] is False


def test_glue_catalog_type_returns_explicit_501(api, sf_dir):
    """r9 (VERDICT r08 #7): catalogType 'glue' is accepted by the config
    model for wire parity but implemented by nothing — the API must say
    so explicitly (501 + guidance) on BOTH query and connection-test
    routes, instead of the reference's silent fall-through."""
    conn = {
        "storageType": "s3",
        "endpoint": "https://example.invalid",
        "accessKey": "k",
        "secretKey": "s",
        "catalogType": "glue",
    }
    status, body = _post(
        api, "/api/query", {"sql": "SELECT 1 AS one", "connection": conn}
    )
    assert status == 501
    assert "glue" in body["detail"] and "not implemented" in body["detail"]
    assert "rest" in body["detail"]  # the guidance half
    status, body = _post(api, "/api/connect/test", {"connection": conn})
    assert status == 501 and "glue" in body["detail"]


def test_glue_with_path_fallback_is_served(api, sf_dir):
    """r10 (ADVICE r9 #4): the 501 applies only when the request DEPENDS
    on catalog resolution. A glue config with a usable tablePath — or a
    self-contained path-function query — is served via path reads, the
    same fall-through the reference implements (`backend/main.py`)."""
    conn = {
        "storageType": "local",
        "endpoint": "",
        "accessKey": "",
        "secretKey": "",
        "catalogType": "glue",
        "tablePath": f"{sf_dir}/region.parquet",
    }
    status, body = _post(
        api,
        "/api/query",
        {
            "sql": f"SELECT count(*) AS n "
            f"FROM read_parquet('{sf_dir}/region.parquet')",
            "connection": conn,
        },
    )
    assert status == 200 and body["rows"][0][0] == 5
    status, body = _post(api, "/api/connect/test", {"connection": conn})
    assert status == 200 and body["status"] == "success"
    assert body["tableInfo"]["rows"] == 5
    # no tablePath but the SQL reads through a path function → served
    conn2 = dict(conn)
    conn2.pop("tablePath")
    status, body = _post(
        api,
        "/api/query",
        {
            "sql": f"SELECT count(*) AS n "
            f"FROM read_parquet('{sf_dir}/nation.parquet')",
            "connection": conn2,
        },
    )
    assert status == 200 and body["rows"][0][0] == 25


def test_query_write_rejected_400(api):
    status, body = _post(
        api,
        "/api/query",
        {
            "sql": "DROP TABLE t",
            "connection": {
                "storageType": "local",
                "endpoint": "",
                "accessKey": "",
                "secretKey": "",
            },
        },
    )
    assert status == 400 and "allowed" in body["detail"]


def test_query_row_limit_validation_422(api):
    status, body = _post(
        api,
        "/api/query",
        {
            "sql": "SELECT 1",
            "connection": {
                "storageType": "local",
                "endpoint": "",
                "accessKey": "",
                "secretKey": "",
            },
            "rowLimit": 99999,
        },
    )
    assert status == 422


def test_unknown_route_404(api):
    status, _ = _get(api, "/api/nope")
    assert status == 404


def test_every_demo_query_executes(api):
    """Reference-parity proof: all five demo-corpus queries (DuckDB
    dialect, read_parquet scans — `backend/main.py:743-769` shapes) run
    end-to-end through rewrite → transpile → validate → Spark."""
    _, conn = _get(api, "/api/demo/connection")
    _, corpus = _get(api, "/api/demo/queries")
    for q in corpus["queries"]:
        status, body = _post(
            api,
            "/api/query",
            {"sql": q["sql"], "connection": conn["connection"], "rowLimit": 50},
        )
        assert status == 200, (q["name"], body)
        assert body["stats"]["rowsReturned"] > 0, q["name"]


def test_concurrent_queries(api, sf_dir):
    """The service must serve parallel requests over one shared
    SparkContext (ThreadingHTTPServer + per-request newSession) — the
    concurrency model that replaces the reference's engine-per-request."""
    import concurrent.futures

    def one(i):
        return _post(
            api,
            "/api/query",
            {
                "sql": (
                    f"SELECT o_orderpriority, COUNT(*) + {i} AS n "
                    f"FROM read_parquet('{sf_dir}/orders.parquet') "
                    "GROUP BY o_orderpriority ORDER BY o_orderpriority"
                ),
                "connection": {
                    "storageType": "local",
                    "endpoint": "",
                    "accessKey": "",
                    "secretKey": "",
                },
            },
        )

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(one, range(6)))
    for i, (status, body) in enumerate(results):
        assert status == 200, body
        base = body["rows"][0][1] - i  # same count, offset i
        assert base == results[0][1]["rows"][0][1]


def test_query_iceberg_time_travel_over_http(api, tmp_path_factory):
    """The full reference workflow over HTTP against a local Iceberg
    table: current scan, VERSION AS OF, snapshot listing — all without
    the runtime jar (resolved by service/iceberg_local.py)."""
    import pyarrow as pa

    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    root = str(tmp_path_factory.mktemp("api_ice") / "tbl")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64())]))
    s1 = t.append_snapshot([pa.table({"id": [1, 2]})], timestamp_ms=1700000000000)
    t.append_snapshot([pa.table({"id": [3]})], timestamp_ms=1700000100000)
    conn = {
        "storageType": "local",
        "endpoint": "",
        "accessKey": "",
        "secretKey": "",
    }
    status, body = _post(
        api,
        "/api/query",
        {
            "sql": f"SELECT COUNT(*) AS n FROM iceberg_scan('{root}')",
            "connection": conn,
            "rowLimit": 10,
        },
    )
    assert status == 200 and body["rows"][0][0] == 3
    status, body = _post(
        api,
        "/api/query",
        {
            "sql": (
                f"SELECT COUNT(*) AS n FROM iceberg_scan('{root}') "
                f"VERSION AS OF {s1}"
            ),
            "connection": conn,
            "rowLimit": 10,
        },
    )
    assert status == 200 and body["rows"][0][0] == 2
    status, body = _post(
        api,
        "/api/query",
        {
            "sql": f"SELECT snapshot_id FROM iceberg_snapshots('{root}')",
            "connection": conn,
            "rowLimit": 10,
        },
    )
    assert status == 200 and len(body["rows"]) == 2


def test_maintenance_compact_over_http(api, tmp_path_factory, monkeypatch):
    """The reference's 400 says "run compaction" but ships no tool; this
    endpoint IS the tool. Drive: deletes-bearing table 400s under blanket
    rejection → endpoint 403s while disabled (read-only default) → enabled
    compact succeeds → the same query now returns the surviving rows."""
    import pyarrow as pa

    from cloudfloe_spark.service import engine as eng
    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    root = str(tmp_path_factory.mktemp("maint") / "tbl")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("name", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2, 3], "name": ["a", "b", "c"]})],
        timestamp_ms=1700000000000,
    )
    t.position_delete_snapshot(
        [(t.live_data_paths()[0], 0)], timestamp_ms=1700000100000
    )
    conn = {
        "storageType": "local",
        "endpoint": "",
        "accessKey": "",
        "secretKey": "",
        "tablePath": root,
    }
    q = {
        "sql": f"SELECT id FROM iceberg_scan('{root}') ORDER BY id",
        "connection": conn,
        "rowLimit": 10,
    }

    monkeypatch.setattr(eng, "REJECT_DELETE_TABLES", True)
    status, body = _post(api, "/api/query", q)
    assert status == 400 and "compaction" in body["detail"]

    # read-only default: the write path is 403 until explicitly enabled
    monkeypatch.delenv("CLOUDFLOE_ENABLE_MAINTENANCE", raising=False)
    status, body = _post(api, "/api/maintenance/compact", {"connection": conn})
    assert status == 403 and "CLOUDFLOE_ENABLE_MAINTENANCE" in body["detail"]

    monkeypatch.setenv("CLOUDFLOE_ENABLE_MAINTENANCE", "1")
    status, body = _post(api, "/api/maintenance/compact", {"connection": conn})
    assert status == 200 and body["status"] == "success"
    assert body["rows"] == 2 and body["filesAfter"] >= 1
    assert isinstance(body["snapshotId"], str)

    status, body = _post(api, "/api/query", q)
    assert status == 200 and [r[0] for r in body["rows"]] == [2, 3]
    monkeypatch.setattr(eng, "REJECT_DELETE_TABLES", False)


def test_maintenance_compact_validation(api, tmp_path_factory, monkeypatch):
    monkeypatch.setenv("CLOUDFLOE_ENABLE_MAINTENANCE", "1")
    base = {
        "storageType": "local",
        "endpoint": "",
        "accessKey": "",
        "secretKey": "",
    }
    # non-Iceberg path → 400
    empty = str(tmp_path_factory.mktemp("maint_v"))
    status, body = _post(
        api,
        "/api/maintenance/compact",
        {"connection": {**base, "tablePath": empty}},
    )
    assert status == 400 and "Iceberg" in body["detail"]
    # out-of-range targetFileBytes → 422
    status, body = _post(
        api,
        "/api/maintenance/compact",
        {"connection": {**base, "tablePath": empty}, "targetFileBytes": 1},
    )
    assert status == 422


def test_static_frontend_serving(spark, tmp_path_factory):
    """nginx-parity static serving: with static_dir set, '/' serves
    index.html, assets resolve, unknown paths fall back to index.html
    (SPA routing), traversal is contained, and /api + /health stay API."""
    import urllib.request

    from cloudfloe_spark.service.api import serve_background

    root = tmp_path_factory.mktemp("frontend")
    (root / "index.html").write_text("<html><body>cloudfloe</body></html>")
    (root / "js").mkdir()
    (root / "js" / "app.js").write_text("console.log('ok')")

    server, port = serve_background(spark, static_dir=str(root))
    base = f"http://127.0.0.1:{port}"
    try:
        def raw(path):
            try:
                with urllib.request.urlopen(base + path) as r:
                    return r.status, r.headers.get("Content-Type", ""), r.read()
            except urllib.error.HTTPError as e:
                return e.code, e.headers.get("Content-Type", ""), e.read()

        s, ct, body = raw("/")
        assert s == 200 and "text/html" in ct and b"cloudfloe" in body
        s, ct, _ = raw("/js/app.js")
        assert s == 200 and "javascript" in ct
        # SPA fallback
        s, ct, body = raw("/some/client/route")
        assert s == 200 and b"cloudfloe" in body
        # traversal contained (urllib normalizes plain ../; use encoded)
        s, _, body = raw("/..%2f..%2fetc%2fpasswd")
        assert b"root:" not in body
        # API routes still JSON
        s, ct, body = raw("/health")
        assert s == 200 and "json" in ct
        s, ct, _ = raw("/api/demo/queries")
        assert s == 200 and "json" in ct
    finally:
        server.shutdown()


def test_query_new_table_functions_over_http(api, tmp_path_factory):
    """The r8 metadata surfaces — history, column stats, scan-plan
    EXPLAIN, and views — all answer through the plain /api/query route
    (same validation gate, same payload shape as any scan)."""
    import pyarrow as pa

    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
    from cloudfloe_spark.sources.iceberg_views import create_iceberg_view

    d = tmp_path_factory.mktemp("api_fns")
    root = str(d / "t")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2, 3], "v": ["a", "b", "c"]})],
        timestamp_ms=1700000000000,
    )
    vroot = str(d / "view")
    create_iceberg_view(
        vroot,
        f"SELECT COUNT(*) AS n FROM iceberg_scan('{root}')",
        timestamp_ms=1700000001000,
    )
    conn = {
        "storageType": "local", "endpoint": "",
        "accessKey": "", "secretKey": "",
    }
    for sql, check in [
        (
            f"SELECT snapshot_id, is_current_ancestor "
            f"FROM iceberg_history('{root}')",
            lambda b: len(b["rows"]) == 1 and b["rows"][0][1] is True,
        ),
        (
            f"SELECT stage, files FROM iceberg_scan_plan('{root}', "
            f"'id > 2') ORDER BY stage",
            lambda b: len(b["rows"]) >= 4,
        ),
        (
            f"SELECT n FROM iceberg_view('{vroot}')",
            lambda b: b["rows"] == [[3]],
        ),
    ]:
        status, body = _post(
            api, "/api/query",
            {"sql": sql, "connection": conn, "rowLimit": 100},
        )
        assert status == 200, (sql, body)
        assert check(body), (sql, body["rows"])
