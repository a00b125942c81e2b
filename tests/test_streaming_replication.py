"""End-to-end streaming CDC replication (``streaming/replication.py``):
``iceberg_commits`` source (cdc) → per-key batch netting →
``apply_changelog`` — a replica that follows the primary commit-by-commit
at changelog-sized cost, exactly-once across checkpointed passes."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.sources.iceberg_fixture import (
    LocalIcebergTable,
    commit_row_delta_snapshot,
)
from cloudfloe_spark.sources.maintenance import delete_where, update_where
from cloudfloe_spark.streaming.replication import replicate_iceberg_table

T1 = 1700000000000
_CFG = ConnectionConfig(
    storageType="local", endpoint="", accessKey="", secretKey=""
)


def _scan(spark, root):
    return sorted(
        tuple(r)
        for r in run_query(
            spark, f"SELECT id, v FROM iceberg_scan('{root}')", _CFG
        ).rows
    )


@pytest.fixture()
def pair(tmp_path):
    primary = str(tmp_path / "primary")
    replica = str(tmp_path / "replica")
    schema = pa.schema([("id", pa.int64()), ("v", pa.string())])
    p = LocalIcebergTable(primary, schema)
    p.append_snapshot(
        [pa.table({"id": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})],
        timestamp_ms=T1,
    )
    r = LocalIcebergTable(replica, schema)
    r.append_snapshot(
        [pa.table({"id": pa.array([], pa.int64()), "v": pa.array([], pa.string())})],
        timestamp_ms=T1,
    )
    return primary, replica


def _append(root, name, ids, vs, ts):
    fp = os.path.join(root, "data", name)
    pq.write_table(pa.table({"id": ids, "v": vs}), fp)
    commit_row_delta_snapshot(root, new_data_files=[(fp, len(ids))], timestamp_ms=ts)


def test_replication_initial_sync_then_incremental(spark, pair, tmp_path):
    primary, replica = pair
    ck = str(tmp_path / "ck")

    # pass 1: initial sync (the seed append streams as inserts)
    s = replicate_iceberg_table(
        spark, primary, replica, "id", ck, base_timestamp_ms=T1 + 10_000
    )
    assert s["batches"] == 1
    assert _scan(spark, replica) == _scan(spark, primary)

    # DML on the primary: delete + update + append, then catch up
    delete_where(spark, primary, "id = 2", timestamp_ms=T1 + 1000)
    update_where(
        spark, primary, "id = 3", {"v": "upper(v)"}, timestamp_ms=T1 + 2000
    )
    _append(primary, "b1.parquet", [5], ["e"], T1 + 3000)
    s = replicate_iceberg_table(
        spark, primary, replica, "id", ck, base_timestamp_ms=T1 + 20_000
    )
    assert s["batches"] == 1
    assert _scan(spark, replica) == _scan(spark, primary)
    assert _scan(spark, replica) == [(1, "a"), (3, "C"), (4, "d"), (5, "e")]

    # quiescent pass: no commits, no apply
    s = replicate_iceberg_table(
        spark, primary, replica, "id", ck, base_timestamp_ms=T1 + 30_000
    )
    assert s["batches"] == 0
    assert _scan(spark, replica) == _scan(spark, primary)


def test_replication_nets_insert_then_delete_within_batch(spark, pair, tmp_path):
    """A row appended and deleted between two passes (both commits in ONE
    batch) must not survive on the replica — the per-key fold applies the
    LAST state, not the union of changes."""
    primary, replica = pair
    ck = str(tmp_path / "ck")
    replicate_iceberg_table(
        spark, primary, replica, "id", ck, base_timestamp_ms=T1 + 10_000
    )

    _append(primary, "eph.parquet", [9], ["z"], T1 + 1000)
    delete_where(spark, primary, "id = 9", timestamp_ms=T1 + 2000)
    # and a key updated twice: only the second value may land
    update_where(spark, primary, "id = 4", {"v": "'d2'"}, timestamp_ms=T1 + 3000)
    update_where(spark, primary, "id = 4", {"v": "'d3'"}, timestamp_ms=T1 + 4000)

    replicate_iceberg_table(
        spark, primary, replica, "id", ck, base_timestamp_ms=T1 + 20_000
    )
    assert _scan(spark, replica) == _scan(spark, primary)
    assert (9, "z") not in _scan(spark, replica)
    assert (4, "d3") in _scan(spark, replica)


def test_replication_replay_is_idempotent(spark, pair, tmp_path):
    """A replayed epoch (crash between apply and offset commit) must not
    double-apply: the changelog_id dedup turns the second apply of the
    same (checkpoint, epoch) into a silent skip."""
    from pyspark.sql import functions as F

    from cloudfloe_spark.sources import iceberg_meta as im
    from cloudfloe_spark.sources.maintenance import apply_changelog
    from cloudfloe_spark.streaming.replication import net_changelog_per_key

    primary, replica = pair
    ck = str(tmp_path / "ck")
    replicate_iceberg_table(
        spark, primary, replica, "id", ck, base_timestamp_ms=T1 + 10_000
    )
    _append(primary, "b1.parquet", [6], ["f"], T1 + 1000)
    replicate_iceberg_table(
        spark, primary, replica, "id", ck, base_timestamp_ms=T1 + 20_000
    )
    state = _scan(spark, replica)

    # simulate the replayed batch: same net changes, same changelog_id
    meta = im.load_metadata(primary, im.latest_metadata_path(primary))
    seq_of = {
        sn["snapshot-id"]: sn.get("sequence-number", 0)
        for sn in meta.get("snapshots", [])
    }
    sid = meta["snapshots"][-1]["snapshot-id"]
    batch = spark.createDataFrame(
        [(6, "f", "insert", sid)],
        "id BIGINT, v STRING, _change_type STRING, _commit_snapshot_id BIGINT",
    )
    net = net_changelog_per_key(batch, "id", seq_of)
    res = apply_changelog(
        spark,
        replica,
        net,
        "id",
        timestamp_ms=T1 + 30_000,
        changelog_id=f"rep:{primary}:{os.path.abspath(ck)}:1",
    )
    assert res.get("skipped") is True
    assert _scan(spark, replica) == state  # no duplicate (6, 'f')
