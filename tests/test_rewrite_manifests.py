"""rewrite_manifests (r9): consolidate the one-delta-manifest-per-commit
metadata a manifest-reuse DML chain accumulates, without touching a single
data or delete file — read planning drops to O(1) manifest opens while
rows, time travel, delete semantics and CDC ranges all survive verbatim.
(Iceberg's `rewrite_manifests` procedure; the reference has no write
surface at all.)
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.sources import iceberg_meta as im
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.maintenance import (
    delete_where,
    rewrite_manifests,
    update_where,
)

T1 = 1700000000000


def _cfg():
    return ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )


def _rows(spark, sql):
    return [tuple(r) for r in run_query(spark, sql, _cfg()).rows]


def _n_manifests(root) -> int:
    cur = im.resolve_snapshot(root)
    root_n = im._norm_root(root)
    return len(
        list(im._read_manifest(im._relocate(cur["manifest-list"], root_n)))
    )


@pytest.fixture()
def churned_table(spark, tmp_path):
    """A table after a 5-commit DML chain: manifest reuse leaves one
    delta manifest per commit."""
    root = str(tmp_path / "t")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.int64())])
    )
    t.append_snapshot(
        [
            pa.table({"id": list(range(0, 50)), "v": list(range(0, 50))}),
            pa.table({"id": list(range(50, 100)), "v": list(range(50, 100))}),
        ],
        timestamp_ms=T1,
    )
    for i in range(3):
        delete_where(spark, root, f"id = {i * 7}", timestamp_ms=T1 + 1000 + i)
    update_where(
        spark, root, "id = 30", {"v": "v + 1000"}, timestamp_ms=T1 + 2000
    )
    update_where(
        spark, root, "id = 31", {"v": "v + 1000"}, timestamp_ms=T1 + 3000
    )
    return root


def test_rewrite_manifests_consolidates_without_changing_rows(
    spark, churned_table
):
    root = churned_table
    before_rows = _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id"
    )
    n_before = _n_manifests(root)
    assert n_before >= 5  # the chain really did accumulate manifests
    data_files_before = sorted(
        im.live_data_paths(root, im.resolve_snapshot(root))
    )

    res = rewrite_manifests(root, timestamp_ms=T1 + 5000)
    assert res["manifests_before"] == n_before
    assert res["manifests_after"] <= 2  # one data + one delete manifest
    assert _n_manifests(root) == res["manifests_after"]

    # zero data movement: the live file set is byte-identical
    data_files_after = sorted(
        im.live_data_paths(root, im.resolve_snapshot(root))
    )
    assert data_files_after == data_files_before
    # identical rows (deletes still apply at their original sequences)
    after_rows = _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert after_rows == before_rows
    assert len(after_rows) == 97
    # the commit is a 'replace' — changelog readers skip it
    snaps = im.load_metadata(root)["snapshots"]
    assert snaps[-1]["summary"]["operation"] == "replace"


def test_rewrite_manifests_preserves_time_travel_and_cdc(
    spark, churned_table
):
    root = churned_table
    snaps = im.snapshots(root)
    s0, s_pre = snaps[0]["snapshot-id"], snaps[-1]["snapshot-id"]
    rewrite_manifests(root, timestamp_ms=T1 + 5000)
    s_post = im.resolve_snapshot(root)["snapshot-id"]

    # time travel to any pre-rewrite snapshot still resolves
    old = _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF {s0}",
    )
    assert old == [(100,)]

    # a CDC range CROSSING the rewrite equals the same range ending just
    # before it (no data files were removed/rewritten, so unlike
    # compaction the changelog contract survives)
    q = (
        "SELECT id, v, _change_type FROM "
        "iceberg_cdc('{root}', {a}, {b}) ORDER BY id, _change_type"
    )
    pre = _rows(spark, q.format(root=root, a=s0, b=s_pre))
    crossing = _rows(spark, q.format(root=root, a=s0, b=s_post))
    assert crossing == pre and len(pre) > 0


def test_rewrite_manifests_conflict_detected(spark, churned_table, tmp_path):
    from cloudfloe_spark.sources.iceberg_fixture import (
        CommitConflictError,
        commit_manifest_rewrite_snapshot,
    )

    root = churned_table
    stale = im.latest_metadata_path(root)
    delete_where(spark, root, "id = 99", timestamp_ms=T1 + 4000)
    with pytest.raises(CommitConflictError):
        commit_manifest_rewrite_snapshot(
            root, timestamp_ms=T1 + 5000, expected_metadata_path=stale
        )
