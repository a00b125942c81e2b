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
