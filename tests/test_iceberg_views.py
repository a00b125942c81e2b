"""Iceberg views (view-spec v1): versioned SQL stored as view metadata,
inlined into queries by ``iceberg_view('<root>')`` — create/replace,
nesting, the read-only gate, and cycle protection."""

from __future__ import annotations

import pyarrow as pa
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.service.errors import CloudfloeError
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.iceberg_views import (
    IcebergViewError,
    create_iceberg_view,
    load_view,
    replace_iceberg_view,
)

T1 = 1700000000000


def _cfg():
    return ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )


def _rows(spark, sql):
    return [tuple(r) for r in run_query(spark, sql, _cfg()).rows]


@pytest.fixture()
def table(tmp_path):
    root = str(tmp_path / "t")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("lang", pa.string())])
    )
    t.append_snapshot(
        [
            pa.table(
                {"id": [1, 2, 3, 4], "lang": ["en", "en", "de", "fr"]}
            )
        ],
        timestamp_ms=T1,
    )
    return root


def test_view_create_query_replace(spark, table, tmp_path):
    vroot = str(tmp_path / "v")
    res = create_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n FROM iceberg_scan('{table}') "
        "GROUP BY lang",
        timestamp_ms=T1 + 1000,
    )
    assert res["version_id"] == 1
    got = _rows(
        spark,
        f"SELECT lang, n FROM iceberg_view('{vroot}') ORDER BY lang",
    )
    assert got == [("de", 1), ("en", 2), ("fr", 1)]

    # REPLACE appends version 2; both versions stay in the log
    res = replace_iceberg_view(
        vroot,
        f"SELECT lang FROM iceberg_scan('{table}') WHERE id >= 3",
        timestamp_ms=T1 + 2000,
    )
    assert res["version_id"] == 2
    got = _rows(
        spark, f"SELECT lang FROM iceberg_view('{vroot}') ORDER BY lang"
    )
    assert got == [("de",), ("fr",)]
    meta = load_view(vroot)
    assert [v["version-id"] for v in meta["versions"]] == [1, 2]
    assert meta["current-version-id"] == 2
    assert [e["version-id"] for e in meta["version-log"]] == [1, 2]
    # the spark representation is always stored; a duckdb one appears
    # when sqlglot is importable (optional per the spec's single-rep rule)
    reps = meta["versions"][0]["representations"]
    assert {r["dialect"] for r in reps} >= {"spark"}
    assert all(r["type"] == "sql" for r in reps)


def test_view_composes_with_outer_query_and_nesting(spark, table, tmp_path):
    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    create_iceberg_view(
        v1,
        f"SELECT id, lang FROM iceberg_scan('{table}') WHERE lang = 'en'",
        timestamp_ms=T1 + 1000,
    )
    create_iceberg_view(
        v2,
        f"SELECT COUNT(*) AS n_en FROM iceberg_view('{v1}')",
        timestamp_ms=T1 + 2000,
    )
    got = _rows(spark, f"SELECT n_en FROM iceberg_view('{v2}')")
    assert got == [(2,)]
    # outer filters/joins apply over the inlined subquery
    got = _rows(
        spark,
        f"SELECT v.id FROM iceberg_view('{v1}') v WHERE v.id > 1",
    )
    assert got == [(2,)]


def test_view_rejects_non_queries_and_cycles(spark, table, tmp_path):
    vroot = str(tmp_path / "v")
    with pytest.raises(Exception):
        create_iceberg_view(
            vroot, f"DROP TABLE important", timestamp_ms=T1 + 1000
        )
    # self-referential view: depth cap turns it into a clean 400
    create_iceberg_view(
        vroot, f"SELECT 1 AS one", timestamp_ms=T1 + 1000
    )
    replace_iceberg_view(
        vroot,
        f"SELECT one FROM iceberg_view('{vroot}')",
        timestamp_ms=T1 + 2000,
    )
    with pytest.raises(CloudfloeError, match="nesting depth"):
        _rows(spark, f"SELECT * FROM iceberg_view('{vroot}')")


def test_view_errors_are_clean(spark, table, tmp_path):
    # a TABLE root is not a view
    with pytest.raises(CloudfloeError, match="not an Iceberg view"):
        _rows(spark, f"SELECT * FROM iceberg_view('{table}')")
    # double create refused
    vroot = str(tmp_path / "v")
    create_iceberg_view(vroot, "SELECT 1 AS one", timestamp_ms=T1 + 1000)
    with pytest.raises(IcebergViewError, match="already exists"):
        create_iceberg_view(vroot, "SELECT 2 AS two", timestamp_ms=T1 + 2000)


def test_view_version_time_travel_and_listing(spark, table, tmp_path):
    """iceberg_view VERSION AS OF n pins an older DEFINITION, and
    iceberg_view_versions lists the full version history."""
    vroot = str(tmp_path / "v")
    create_iceberg_view(
        vroot,
        f"SELECT COUNT(*) AS n FROM iceberg_scan('{table}')",
        timestamp_ms=T1 + 1000,
    )
    replace_iceberg_view(
        vroot,
        f"SELECT COUNT(*) AS n FROM iceberg_scan('{table}') "
        "WHERE lang = 'en'",
        timestamp_ms=T1 + 2000,
    )
    assert _rows(spark, f"SELECT n FROM iceberg_view('{vroot}')") == [(2,)]
    assert _rows(
        spark,
        f"SELECT n FROM iceberg_view('{vroot}') VERSION AS OF 1",
    ) == [(4,)]
    with pytest.raises(CloudfloeError, match="no SQL for version"):
        _rows(
            spark,
            f"SELECT n FROM iceberg_view('{vroot}') VERSION AS OF 9",
        )
    rows = _rows(
        spark,
        f"SELECT version_id, operation, is_current FROM "
        f"iceberg_view_versions('{vroot}') ORDER BY version_id",
    )
    assert rows == [(1, "create", False), (2, "replace", True)]


def test_materialized_view_lifecycle(spark, table, tmp_path):
    """Materialize → query equals the view; base DML flips staleness
    (metadata-only check); refresh re-lands and goes fresh; a fresh
    refresh is a no-op skip; a replaced view definition is stale too."""
    from cloudfloe_spark.sources.iceberg_views import (
        materialize_iceberg_view,
        materialized_view_status,
        refresh_materialized_view,
    )
    from cloudfloe_spark.sources.maintenance import delete_where

    vroot = str(tmp_path / "v")
    troot = str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n FROM iceberg_scan('{table}') "
        "GROUP BY lang",
        timestamp_ms=T1 + 1000,
    )
    res = materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 2000
    )
    assert res["rows"] == 3
    got = _rows(
        spark, f"SELECT lang, n FROM iceberg_scan('{troot}') ORDER BY lang"
    )
    assert got == [("de", 1), ("en", 2), ("fr", 1)]
    assert materialized_view_status(troot)["stale"] is False

    # fresh: refresh skips without running anything
    assert refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 3000
    )["skipped"] is True

    # base DML → stale → refresh reflects the change
    delete_where(spark, table, "lang = 'fr'", timestamp_ms=T1 + 4000)
    assert materialized_view_status(troot)["stale"] is True
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 5000
    )
    assert res.get("skipped") is None
    got = _rows(
        spark, f"SELECT lang, n FROM iceberg_scan('{troot}') ORDER BY lang"
    )
    assert got == [("de", 1), ("en", 2)]
    assert materialized_view_status(troot)["stale"] is False

    # a new view VERSION is also staleness
    replace_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n FROM iceberg_scan('{table}') "
        "WHERE lang = 'en' GROUP BY lang",
        timestamp_ms=T1 + 6000,
    )
    assert materialized_view_status(troot)["stale"] is True
    refresh_materialized_view(spark, vroot, troot, timestamp_ms=T1 + 7000)
    got = _rows(spark, f"SELECT lang, n FROM iceberg_scan('{troot}')")
    assert got == [("en", 2)]


def test_materialize_guards(spark, table, tmp_path):
    from cloudfloe_spark.sources.iceberg_views import (
        materialize_iceberg_view,
        materialized_view_status,
    )

    vroot = str(tmp_path / "v")
    create_iceberg_view(
        vroot, f"SELECT id FROM iceberg_scan('{table}')",
        timestamp_ms=T1 + 1000,
    )
    troot = str(tmp_path / "mv")
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    with pytest.raises(IcebergViewError, match="already exists"):
        materialize_iceberg_view(
            spark, vroot, troot, timestamp_ms=T1 + 3000
        )
    with pytest.raises(IcebergViewError, match="not a materialized view"):
        materialized_view_status(table)
