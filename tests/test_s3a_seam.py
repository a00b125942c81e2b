"""S3A credential-isolation seam (VERDICT r02 'Next round' #5).

The sandbox has no network and no hadoop-aws jar (the attempt is pinned
by :func:`test_hadoop_aws_absent_is_pinned`), so real S3 wire traffic is
impossible here. What IS testable — and what SURVEY §7.3 risk #1 is
actually about — is the conf plumbing in the shared JVM: per-request
credential installs must be bucket-scoped, coexist across tenants, and be
live in the same Hadoop Configuration that serves real FileSystem calls
for the table's scheme. Hadoop's ViewFileSystemOverloadScheme (public
hadoop-common machinery, HADOOP-15891) mounts the ``s3://`` scheme onto
the local filesystem, so ``run_query``/``run_connection_test`` exercise a
REAL FileSystem resolution + read through the exact code path a
credentialed S3A deployment uses — only the wire protocol is swapped out.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import (
    filesystem_available,
    request_session,
    run_connection_test,
    run_query,
    s3a_options,
)

_VIEWFS = "org.apache.hadoop.fs.viewfs.ViewFileSystemOverloadScheme"


def _hconf(spark):
    return spark.sparkContext._jsc.hadoopConfiguration()


def _cfg(bucket: str, access: str, secret: str, path: str = "") -> ConnectionConfig:
    return ConnectionConfig(
        storageType="minio",
        endpoint="http://localhost:9000",
        accessKey=access,
        secretKey=secret,
        tablePath=f"s3://{bucket}{path}",
    )


@pytest.fixture()
def s3_seam(spark):
    """Mount s3:// on the local filesystem for the buckets tests use."""
    conf = _hconf(spark)
    keys = {
        "fs.s3.impl": _VIEWFS,
        "fs.viewfs.mounttable.bucket-a.linkFallback": "file:///",
        "fs.viewfs.mounttable.bucket-b.linkFallback": "file:///",
    }
    for k, v in keys.items():
        conf.set(k, v)
    try:
        yield
    finally:
        for k in keys:
            conf.unset(k)


def test_hadoop_aws_absent_is_pinned(spark):
    """Records the runtime attempt: hadoop-aws is not on the classpath and
    cannot be fetched (no network), so bare s3a:// resolution fails in
    this sandbox. If this ever XPASSES, the environment gained the jar —
    promote the seam tests to live-S3A tests."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        pytest.xfail("hadoop-aws IS present — seam no longer required")
    except Exception:
        pass
    assert not filesystem_available(spark, "s3a")


def test_bucket_scoped_credentials_coexist(spark):
    """Two tenants, two buckets: both credential sets live in the shared
    conf simultaneously — tenant B's install must not clobber tenant A's
    (the shared-JVM leak mitigation SURVEY §7.3 prescribes)."""
    conf = _hconf(spark)
    request_session(spark, _cfg("bucket-a", "tenant_a_key", "tenant_a_sec", "/t"))
    request_session(spark, _cfg("bucket-b", "tenant_b_key", "tenant_b_sec", "/t"))
    assert conf.get("fs.s3a.bucket.bucket-a.access.key") == "tenant_a_key"
    assert conf.get("fs.s3a.bucket.bucket-b.access.key") == "tenant_b_key"
    assert conf.get("fs.s3a.bucket.bucket-a.secret.key") == "tenant_a_sec"
    assert conf.get("fs.s3a.bucket.bucket-b.secret.key") == "tenant_b_sec"
    # bucket was derivable ⇒ nothing leaked into the global keys
    assert conf.get("fs.s3a.access.key") is None
    assert conf.get("fs.s3a.secret.key") is None


def test_same_bucket_conflicting_creds_last_writer_wins(spark):
    """The documented residual race: same bucket, different credentials —
    the second install overwrites (engine.py notes this is detectable via
    the fingerprint; a true fix needs per-FileSystem conf upstream)."""
    conf = _hconf(spark)
    request_session(spark, _cfg("bucket-a", "first_key", "first_sec", "/t"))
    request_session(spark, _cfg("bucket-a", "second_key", "second_sec", "/t"))
    assert conf.get("fs.s3a.bucket.bucket-a.access.key") == "second_key"


def test_query_reads_through_s3_scheme(spark, s3_seam, tmp_path):
    """End-to-end: the same request that installs bucket-scoped creds
    performs a real FileSystem resolution + parquet read through the
    s3:// scheme (ViewFs-mounted), proving the conf the credentials live
    in is the conf FileSystem calls consume."""
    pd.DataFrame({"id": [1, 2, 3], "v": ["x", "y", "z"]}).to_parquet(
        tmp_path / "part-0.parquet"
    )
    cfg = _cfg("bucket-a", "tenant_a_key", "tenant_a_sec", str(tmp_path))
    resp = run_query(
        spark,
        f"SELECT id, v FROM read_parquet('s3://bucket-a{tmp_path}/*.parquet') "
        "ORDER BY id",
        cfg,
    )
    assert [tuple(r) for r in resp.rows] == [(1, "x"), (2, "y"), (3, "z")]
    assert (
        _hconf(spark).get("fs.s3a.bucket.bucket-a.access.key")
        == "tenant_a_key"
    )


def test_connection_test_probes_through_s3_scheme(spark, s3_seam, tmp_path):
    pd.DataFrame({"id": [1, 2, 3]}).to_parquet(tmp_path / "part-0.parquet")
    info = run_connection_test(
        spark, _cfg("bucket-a", "tenant_a_key", "tenant_a_sec", str(tmp_path))
    )
    assert info is not None
    assert info.format == "parquet"
    assert info.rows == 3
    assert info.files == 1
    assert info.suggestedQuery.startswith("SELECT * FROM parquet.`s3://bucket-a")


def test_remote_probe_without_filesystem_returns_none(spark, tmp_path):
    """No seam, no jar: the probe fails fast with a clear capability
    error (surfaced as the connection test's None), not a Spark stack."""
    assert (
        run_connection_test(
            spark, _cfg("bucket-zz", "k", "s", f"{tmp_path}")
        )
        is None
    )


def test_s3a_options_scheme_alias_not_forced(spark):
    """s3a_options never claims fs.s3.impl itself — the alias is applied
    at install time only when S3AFileSystem is loadable, so a deployment
    mount (like the test seam) is never clobbered."""
    opts = s3a_options(_cfg("bucket-a", "k", "s", "/t"))
    assert "fs.s3.impl" not in opts
    assert not any(k.startswith("fs.s3.") for k in opts)


def _ice_cfg(storage: str, bucket: str, path: str) -> ConnectionConfig:
    if storage == "local":
        return ConnectionConfig(
            storageType="local", endpoint="", accessKey="", secretKey="",
            tablePath=path,
        )
    return _cfg(bucket, "tenant_a_key", "tenant_a_sec", path)


def _build_mor_table(root: str, prefix: str):
    """Three snapshots: append (1,2,3) → position-delete id=1 →
    equality-delete name='c'. Every URI in the metadata carries
    ``prefix`` as its scheme/authority."""
    import pyarrow as pa

    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    t = LocalIcebergTable(
        root,
        pa.schema([("id", pa.int64()), ("name", pa.string())]),
        uri_prefix=prefix,
    )
    s1 = t.append_snapshot(
        [pa.table({"id": [1, 2, 3], "name": ["a", "b", "c"]})],
        timestamp_ms=1700000000000,
    )
    target = t.live_data_paths()[0]
    t.position_delete_snapshot([(target, 0)], timestamp_ms=1700000100000)
    t.equality_delete_snapshot(
        pa.table({"name": ["c"]}), [2], timestamp_ms=1700000200000
    )
    return s1


def test_iceberg_mor_read_through_s3_scheme_matches_local(
    spark, s3_seam, tmp_path
):
    """VERDICT r03 'Next round' #4: an Iceberg table whose metadata records
    ``s3://`` URIs reads end-to-end WITHOUT the runtime jar — metadata
    JSON + Avro manifests stream through the Hadoop FileSystem serving the
    scheme (fsio), data/delete parquet through sess.read — and the result
    (position AND equality deletes applied) matches the identical table
    read from a local root."""
    local_root = str(tmp_path / "local_tbl")
    s3_root = str(tmp_path / "s3_tbl")
    _build_mor_table(local_root, "file://")
    _build_mor_table(s3_root, "s3://bucket-a")

    remote = run_query(
        spark,
        f"SELECT id, name FROM iceberg_scan('s3://bucket-a{s3_root}') "
        "ORDER BY id",
        _ice_cfg("minio", "bucket-a", s3_root),
    )
    local = run_query(
        spark,
        f"SELECT id, name FROM iceberg_scan('{local_root}') ORDER BY id",
        _ice_cfg("local", "", local_root),
    )
    assert [tuple(r) for r in remote.rows] == [tuple(r) for r in local.rows]
    assert [tuple(r) for r in remote.rows] == [(2, "b")]


def test_iceberg_time_travel_through_s3_scheme(spark, s3_seam, tmp_path):
    """Time travel over the s3 scheme: VERSION AS OF the pre-delete
    snapshot returns all three rows."""
    s3_root = str(tmp_path / "s3_tt")
    s1 = _build_mor_table(s3_root, "s3://bucket-a")
    resp = run_query(
        spark,
        f"SELECT id FROM iceberg_scan('s3://bucket-a{s3_root}') "
        f"VERSION AS OF {s1} ORDER BY id",
        _ice_cfg("minio", "bucket-a", s3_root),
    )
    assert [r[0] for r in resp.rows] == [1, 2, 3]


def test_iceberg_snapshots_listing_through_s3_scheme(spark, s3_seam, tmp_path):
    s3_root = str(tmp_path / "s3_snap")
    _build_mor_table(s3_root, "s3://bucket-a")
    resp = run_query(
        spark,
        f"SELECT snapshot_id FROM iceberg_snapshots('s3://bucket-a{s3_root}') "
        "ORDER BY sequence_number",
        _ice_cfg("minio", "bucket-a", s3_root),
    )
    assert len(resp.rows) == 3


def test_unserved_scheme_iceberg_scan_still_passes_through(spark, tmp_path):
    """No seam mounted: an s3:// iceberg_scan must NOT resolve through the
    jarless reader (scheme unserved) — it falls through to the catalog
    rewrite whose failure names the missing connector, same as before."""
    from cloudfloe_spark.service.errors import CloudfloeError

    with pytest.raises(CloudfloeError):
        run_query(
            spark,
            "SELECT * FROM iceberg_scan('s3://nowhere/tbl')",
            _ice_cfg("minio", "nowhere", "/tbl"),
        )


def test_iceberg_probe_through_s3_scheme(spark, s3_seam, tmp_path):
    """probe_table / run_connection_test detect the ICEBERG layout over a
    served scheme (metadata streamed via fsio), not just raw parquet: the
    suggested query is the iceberg_scan form, row/file counts come from
    the snapshot summary, and hasDeletes reflects the delete files."""
    s3_root = str(tmp_path / "s3_probe")
    _build_mor_table(s3_root, "s3://bucket-a")
    info = run_connection_test(
        spark, _ice_cfg("minio", "bucket-a", s3_root)
    )
    assert info is not None
    assert info.format == "iceberg-v2"
    assert info.suggestedQuery.startswith(
        f"SELECT * FROM iceberg_scan('s3://bucket-a{s3_root}')"
    )
    assert info.hasDeletes is True
    assert info.rows == 3  # summary counts data rows pre-MOR
    assert info.snapshotId is not None


def test_rest_catalog_table_on_s3_scheme(spark, s3_seam, tmp_path):
    """REST catalog + object-store root + jarless reader in one path: the
    stub's metadata-location carries an s3:// URI, resolve_rest_tables
    accepts it because a filesystem serves the scheme, and the read goes
    metadata-via-fsio + parquet-via-sess.read with MOR deletes applied."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    s3_root = str(tmp_path / "rest_s3")
    _build_mor_table(s3_root, "s3://bucket-a")
    from cloudfloe_spark.sources import iceberg_meta as im

    meta_loc = "s3://bucket-a" + im.latest_metadata_path(s3_root)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code, payload):
            body = _json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/v1/config":
                return self._json(200, {"defaults": {}, "overrides": {}})
            if self.path.endswith("/tables/mor"):
                return self._json(
                    200, {"metadata-location": meta_loc, "metadata": {}}
                )
            return self._json(404, {"error": "nope"})

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        cfg = ConnectionConfig(
            storageType="local",
            endpoint="",
            accessKey="",
            secretKey="",
            catalogType="rest",
            catalogEndpoint=f"http://127.0.0.1:{server.server_address[1]}",
            namespace="demo",
        )
        resp = run_query(
            spark,
            "SELECT id, name FROM iceberg_catalog.demo.mor ORDER BY id",
            cfg,
        )
        assert [tuple(r) for r in resp.rows] == [(2, "b")]
    finally:
        server.shutdown()
        server.server_close()


def test_fsio_resolves_from_worker_thread(spark, s3_seam, tmp_path):
    """The service handles each request on a fresh thread
    (ThreadingHTTPServer): SparkSession.getActiveSession() is THREAD-LOCAL
    and returns None there, so fsio must resolve through the process-global
    SparkContext — a jarless s3:// Iceberg read from a worker thread has to
    succeed exactly like the main-thread one."""
    import threading

    s3_root = str(tmp_path / "thr")
    _build_mor_table(s3_root, "s3://bucket-a")
    result: dict = {}

    def worker():
        try:
            resp = run_query(
                spark,
                f"SELECT id FROM iceberg_scan('s3://bucket-a{s3_root}') "
                "ORDER BY id",
                _ice_cfg("minio", "bucket-a", s3_root),
            )
            result["rows"] = [r[0] for r in resp.rows]
        except Exception as e:  # surface in the main thread's assert
            result["err"] = repr(e)

    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=120)
    assert result.get("err") is None, result
    assert result["rows"] == [2]


def test_remote_root_blanket_delete_rejection(
    spark, s3_seam, tmp_path, monkeypatch
):
    """CLOUDFLOE_REJECT_DELETES must gate REMOTE roots exactly like local
    ones — run_query's pre-check and probe_table agree on the rejection
    contract for the s3://-served tables the jarless reader now reads."""
    from cloudfloe_spark.service import engine as eng
    from cloudfloe_spark.service.errors import CloudfloeError

    s3_root = str(tmp_path / "rej")
    _build_mor_table(s3_root, "s3://bucket-a")
    monkeypatch.setattr(eng, "REJECT_DELETE_TABLES", True)
    with pytest.raises(CloudfloeError) as e:
        run_query(
            spark,
            f"SELECT id FROM iceberg_scan('s3://bucket-a{s3_root}')",
            _ice_cfg("minio", "bucket-a", s3_root),
        )
    assert e.value.status_code == 400
    assert "delete files" in e.value.detail


def test_transform_pruning_through_s3_scheme(spark, s3_seam, tmp_path):
    """Transform-aware partition pruning composes with the remote path:
    a days(ts)-partitioned table whose metadata records s3:// URIs prunes
    file groups from the WHERE conjunct exactly like a local table —
    manifests stream through fsio, and only the surviving day's parquet
    is ever handed to the reader."""
    import datetime

    import pyarrow as pa

    from cloudfloe_spark.service.iceberg_local import resolve_iceberg_reads
    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    root = str(tmp_path / "s3_days")
    t = LocalIcebergTable(
        root,
        pa.schema([("id", pa.int64()), ("ts", pa.timestamp("us"))]),
        uri_prefix="s3://bucket-a",
        partition_by=("ts", "day"),
    )
    t.append_snapshot(
        [
            pa.table(
                {
                    "id": [1, 2, 3],
                    "ts": [
                        datetime.datetime(2024, 3, d) for d in (1, 2, 3)
                    ],
                }
            )
        ],
        timestamp_ms=1700000000000,
    )
    sess = request_session(spark, _ice_cfg("minio", "bucket-a", root))
    sql = resolve_iceberg_reads(
        sess,
        f"SELECT id FROM iceberg_scan('s3://bucket-a{root}') "
        "WHERE ts >= TIMESTAMP '2024-03-03 00:00:00'",
    )
    df = sess.sql(sql)
    assert [r["id"] for r in df.collect()] == [3]
    assert len(set(df.inputFiles())) == 1  # 2 of 3 day files never touched
