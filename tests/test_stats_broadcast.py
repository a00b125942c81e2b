"""ANALYZE stats feeding PLANNING (r9 — VERDICT r08 #4): a jarless
Iceberg scan whose exact-snapshot ANALYZE sidecar says the
merge-on-read-applied relation fits under
``spark.sql.autoBroadcastJoinThreshold`` gets a broadcast hint stamped on
its view — flipping a join the file-size heuristic alone plans as a
shuffle join (the dimension's FILES are big; its LIVE rows are few).
``iceberg_scan_plan`` reports the estimate the decision read.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest

from cloudfloe_spark.service.iceberg_local import (
    resolve_iceberg_reads,
)
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.maintenance import (
    analyze_iceberg_table,
    delete_where,
)

T1 = 1700000000000

N_DIM = 2000
KEEP_EVERY = 20  # delete 95%: live rows = N_DIM / KEEP_EVERY = 100


def _pad(i: int) -> str:
    # unique, incompressible-ish padding so the parquet FILE stays big
    return hashlib.md5(str(i).encode()).hexdigest() * 3


def _build_dim(tmp_path, name):
    root = str(tmp_path / name)
    t = LocalIcebergTable(
        root, pa.schema([("k", pa.int64()), ("pad", pa.string())])
    )
    t.append_snapshot(
        [
            pa.table(
                {
                    "k": list(range(N_DIM)),
                    "pad": [_pad(i) for i in range(N_DIM)],
                }
            )
        ],
        timestamp_ms=T1,
    )
    return root


def _session(spark, threshold: str):
    from cloudfloe_spark.sources.tables import ensure_runtime_conf

    sess = spark.newSession()
    ensure_runtime_conf(sess)
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    sess.conf.set("spark.sql.adaptive.enabled", "false")  # static plan
    return sess


def _join_plan(spark, sess, dim_root):
    fact = sess.range(0, 20000).selectExpr("id % 2000 AS k", "id AS v")
    fact.createOrReplaceTempView("__fact")
    sql = resolve_iceberg_reads(
        sess,
        f"SELECT f.k, COUNT(*) AS n FROM __fact f "
        f"JOIN iceberg_scan('{dim_root}') d ON f.k = d.k GROUP BY f.k",
    )
    df = sess.sql(sql)
    return df, df._jdf.queryExecution().executedPlan().toString()


def test_analyze_stats_flip_join_to_broadcast(spark, tmp_path):
    """Same data, same threshold: without ANALYZE the dimension's
    file-size-derived estimate exceeds the threshold → shuffle join; with
    ANALYZE (live rows = 5% of file rows after the MOR delete) the
    stats-driven hint flips it to BroadcastHashJoin, and the results are
    identical."""
    import os

    # --- control: no ANALYZE → no hint → sort-merge join
    dim_a = _build_dim(tmp_path, "dim_a")
    delete_where(spark, dim_a, f"k % {KEEP_EVERY} != 0", timestamp_ms=T1 + 1000)
    sess = _session(spark, "16KB")
    # sanity: the dim FILE is far bigger than the 16KB threshold, so the
    # size heuristic alone cannot justify a broadcast
    data_dir = os.path.join(dim_a, "data")
    file_bytes = sum(
        os.path.getsize(os.path.join(data_dir, f))
        for f in os.listdir(data_dir)
        if f.endswith(".parquet") and "deletes" not in f
    )
    assert file_bytes > 64 * 1024, file_bytes
    # the MOR delete anti-join broadcasts its (tiny) delete side either
    # way — the observable is the FACT⋈DIM join: SortMergeJoin without
    # stats, gone with them
    df_a, plan_a = _join_plan(spark, sess, dim_a)
    assert "SortMergeJoin" in plan_a, plan_a

    # --- with ANALYZE: 100 live rows x avg-row-bytes ≈ file_bytes/20 < 16KB
    dim_b = _build_dim(tmp_path, "dim_b")
    delete_where(spark, dim_b, f"k % {KEEP_EVERY} != 0", timestamp_ms=T1 + 1000)
    res = analyze_iceberg_table(spark, dim_b, timestamp_ms=T1 + 2000)
    assert res["row_count"] == N_DIM // KEEP_EVERY
    df_b, plan_b = _join_plan(spark, sess, dim_b)
    assert "SortMergeJoin" not in plan_b, plan_b
    assert "BroadcastHashJoin" in plan_b, plan_b

    # identical results either way (the hint changes strategy, not rows)
    rows_a = sorted(tuple(r) for r in df_a.collect())
    rows_b = sorted(tuple(r) for r in df_b.collect())
    assert rows_a == rows_b and len(rows_a) == 100


def test_stale_stats_never_drive_broadcast(spark, tmp_path):
    """Stats registered for an OLDER snapshot must be ignored: after a
    post-ANALYZE commit, the estimate disappears instead of reporting
    stale numbers."""
    from cloudfloe_spark.service.iceberg_local import (
        _stats_broadcast_estimate,
    )
    from cloudfloe_spark.sources import iceberg_meta as im

    root = _build_dim(tmp_path, "dim_stale")
    analyze_iceberg_table(spark, root, timestamp_ms=T1 + 1000)
    mp = im.latest_metadata_path(root)
    snap = im.resolve_snapshot(root, metadata_path=mp)
    assert _stats_broadcast_estimate(root, snap, mp) is not None
    delete_where(spark, root, "k = 0", timestamp_ms=T1 + 2000)
    mp = im.latest_metadata_path(root)
    snap = im.resolve_snapshot(root, metadata_path=mp)
    assert _stats_broadcast_estimate(root, snap, mp) is None


def test_scan_plan_reports_stats_estimate(spark, tmp_path):
    """iceberg_scan_plan surfaces the planning input: live rows + byte
    estimate once ANALYZE ran; an explicit no-stats row before."""
    from cloudfloe_spark.service.config import ConnectionConfig
    from cloudfloe_spark.service.engine import run_query

    cfg = ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )
    root = _build_dim(tmp_path, "dim_plan")
    delete_where(spark, root, f"k % {KEEP_EVERY} != 0", timestamp_ms=T1 + 1000)
    q = (
        f"SELECT stage, files, bytes, detail "
        f"FROM iceberg_scan_plan('{root}') "
        f"WHERE stage = 'stats_broadcast_estimate'"
    )
    rows = run_query(spark, q, cfg).rows
    assert len(rows) == 1 and rows[0][1] is None and rows[0][2] is None
    assert "no ANALYZE statistics" in rows[0][3]

    analyze_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    rows = run_query(spark, q, cfg).rows
    assert len(rows) == 1
    assert rows[0][1] == N_DIM // KEEP_EVERY  # live rows, MOR-applied
    assert rows[0][2] > 0
    assert "broadcast" in rows[0][3]
