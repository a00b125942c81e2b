"""Structured Streaming SOURCE over a local Iceberg table
(``streaming/iceberg_source.py`` — PySpark 4 Python Data Source).

Contract under test: microbatches are the table's commits; checkpointed
``availableNow`` runs tail the table exactly-once (run 2 emits only the
commits landed after run 1's offset — never a replay, never a skip);
``mode=cdc`` emits the per-commit row-level changelog whose replay onto
the start state reproduces ``iceberg_scan``'s end state; compaction
(REPLACE) commits advance offsets while emitting nothing; planning reads
only the files each commit touched (asserted at the planner level on the
``CommitSlice`` list — the streaming analog of the batch plan audits)."""

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
from cloudfloe_spark.sources.maintenance import (
    compact_iceberg_table,
    delete_where,
    update_where,
)
from cloudfloe_spark.streaming.iceberg_source import (
    CommitSlice,
    IcebergCommitsStreamReader,
    IcebergSourceError,
    register_iceberg_commits_source,
)

T1 = 1700000000000


@pytest.fixture()
def table(tmp_path):
    root = str(tmp_path / "tsrc")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})],
        timestamp_ms=T1,
    )
    return root, t


def _append(root, name, ids, vs, ts):
    p = os.path.join(root, "data", name)
    pq.write_table(pa.table({"id": ids, "v": vs}), p)
    commit_row_delta_snapshot(root, new_data_files=[(p, len(ids))], timestamp_ms=ts)


def _run_once(spark, root, out, cp, run_tag, **opts):
    """One checkpointed availableNow pass; returns THIS run's rows (the
    sink partition dir is per-run so deltas are directly observable)."""
    register_iceberg_commits_source(spark)
    r = spark.readStream.format("iceberg_commits")
    for k, v in opts.items():
        r = r.option(k, v)
    dst = os.path.join(out, run_tag)
    q = (
        r.load(root)
        .writeStream.format("parquet")
        .option("path", dst)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(180):
            raise TimeoutError("streaming source run exceeded 180s")
    finally:
        q.stop()
    files = (
        [
            os.path.join(dst, f)
            for f in os.listdir(dst)
            if f.endswith(".parquet")
        ]
        if os.path.isdir(dst)
        else []
    )
    if not files:
        return []
    return [tuple(r) for r in spark.read.parquet(*files).collect()]


_CFG = ConnectionConfig(
    storageType="local", endpoint="", accessKey="", secretKey=""
)


def _sql(spark, sql):
    return [tuple(r) for r in run_query(spark, sql, _CFG).rows]


def _scan(spark, root):
    return sorted(_sql(spark, f"SELECT id, v FROM iceberg_scan('{root}')"))


def test_append_stream_tails_commits_exactly_once(spark, table, tmp_path):
    root, _ = table
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    r1 = _run_once(spark, root, out, cp, "r1")
    assert sorted(r1) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]

    _append(root, "b1.parquet", [5, 6], ["e", "f"], T1 + 1000)
    r2 = _run_once(spark, root, out, cp, "r2")
    assert sorted(r2) == [(5, "e"), (6, "f")]  # only the NEW commit

    r3 = _run_once(spark, root, out, cp, "r3")
    assert r3 == []  # nothing new: no replay

    assert sorted(r1 + r2) == _scan(spark, root)


def test_append_mode_rejects_retraction_unless_skipped(spark, table, tmp_path):
    root, _ = table
    delete_where(spark, root, "id = 2", timestamp_ms=T1 + 1000)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    with pytest.raises(Exception, match="retracts rows"):
        _run_once(spark, root, out, cp, "r1")
    # on_delete=skip: initial rows arrive, the retraction is dropped
    r1 = _run_once(
        spark, root, str(tmp_path / "o2"), str(tmp_path / "c2"), "r1",
        on_delete="skip",
    )
    assert sorted(r1) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_cdc_stream_replay_reproduces_scan(spark, table, tmp_path):
    """delete + update + append tailed in cdc mode; applying each
    commit's delta in commit order onto the start state reproduces the
    final iceberg_scan — the incremental-consumer contract."""
    root, _ = table
    delete_where(spark, root, "id = 2", timestamp_ms=T1 + 1000)
    update_where(
        spark, root, "id = 3", {"v": "upper(v)"}, timestamp_ms=T1 + 2000
    )
    _append(root, "b1.parquet", [5], ["e"], T1 + 3000)

    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    rows = _run_once(spark, root, out, cp, "r1", mode="cdc")
    # columns: id, v, _change_type, _commit_snapshot_id
    seq_of = {
        int(r[0]): int(r[1])
        for r in _sql(
            spark,
            f"SELECT snapshot_id, sequence_number FROM "
            f"iceberg_snapshots('{root}')",
        )
    }
    state: list = []
    for r in sorted(rows, key=lambda r: (seq_of[r[3]], r[2] == "insert")):
        if r[2] == "delete":
            state.remove((r[0], r[1]))
        else:
            state.append((r[0], r[1]))
    assert sorted(state) == _scan(spark, root)

    # the delete and the update's pre-image carry their commits' ids
    dels = sorted((r[0], r[1], seq_of[r[3]]) for r in rows if r[2] == "delete")
    assert [(d[0], d[1]) for d in dels] == [(2, "b"), (3, "c")]
    assert dels[0][2] < dels[1][2]

    # incremental: a second run emits only commits after the first run
    delete_where(spark, root, "id = 5", timestamp_ms=T1 + 4000)
    r2 = _run_once(spark, root, out, cp, "r2", mode="cdc")
    assert [(r[0], r[1], r[2]) for r in r2] == [(5, "e", "delete")]


def test_replace_commit_emits_nothing_but_advances(spark, table, tmp_path):
    root, _ = table
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    r1 = _run_once(spark, root, out, cp, "r1", mode="cdc")
    assert len(r1) == 4

    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    r2 = _run_once(spark, root, out, cp, "r2", mode="cdc")
    assert [(r[0], r[1], r[2]) for r in r2] == [(1, "a", "delete")]

    r3 = _run_once(spark, root, out, cp, "r3", mode="cdc")
    assert r3 == []  # the replace advanced the offset silently


def test_start_latest_skips_history(spark, table, tmp_path):
    root, _ = table
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    r1 = _run_once(spark, root, out, cp, "r1", start="latest")
    assert r1 == []
    _append(root, "b1.parquet", [9], ["z"], T1 + 1000)
    r2 = _run_once(spark, root, out, cp, "r2", start="latest")
    assert r2 == [(9, "z")]  # start option ignored once checkpointed


# -- planner-level audits (the streaming analog of the plan audits) ---------


def _reader(root, **opts):
    return IcebergCommitsStreamReader({"path": root, **opts})


def _snap_log(root):
    from cloudfloe_spark.sources import iceberg_meta as im

    meta = im.load_metadata(root, im.latest_metadata_path(root))
    return [e["snapshot-id"] for e in meta.get("snapshot-log", [])]


def test_partitions_one_slice_per_added_file(table):
    root, t = table
    t.append_snapshot(
        [
            pa.table({"id": [10], "v": ["x"]}),
            pa.table({"id": [11], "v": ["y"]}),
            pa.table({"id": [12], "v": ["z"]}),
        ],
        timestamp_ms=T1 + 1000,
    )
    ids = _snap_log(root)
    r = _reader(root)
    parts = r.partitions({"snapshot_id": ids[0]}, {"snapshot_id": ids[1]})
    assert len(parts) == 3  # executor parallelism = files added
    assert all(p.kind == "insert" for p in parts)


def test_cdc_delete_slices_touch_only_named_files(spark, table, tmp_path):
    """A point DELETE plans delete slices ONLY for the data files its
    position-delete files name — never a table-wide carried scan (the
    streaming twin of the r8 batch-CDC pruning)."""
    root, t = table
    # 4 more files so the table has 5; the delete hits exactly one
    for i, name in enumerate(["f1", "f2", "f3", "f4"]):
        _append(root, f"{name}.parquet", [100 + i], [name], T1 + 1000 + i)
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 9000)
    ids = _snap_log(root)
    r = _reader(root, mode="cdc")
    parts = r.partitions(
        {"snapshot_id": ids[-2]}, {"snapshot_id": ids[-1]}
    )
    dels = [p for p in parts if p.kind == "delete"]
    assert len(dels) == 1  # one named file, one slice — not five
    assert not [p for p in parts if p.kind == "insert"]


def test_same_commit_add_and_delete_nets_out(spark, table):
    """A row appended and position-deleted IN THE SAME COMMIT window
    never reaches the stream (net-per-commit semantics) — exercised at
    the read level through the slice's exclude set."""
    root, _ = table
    p = os.path.join(root, "data", "eph.parquet")
    pq.write_table(pa.table({"id": [7, 8], "v": ["g", "h"]}), p)
    commit_row_delta_snapshot(root, new_data_files=[(p, 2)], timestamp_ms=T1 + 1000)
    delete_where(spark, root, "id = 8", timestamp_ms=T1 + 2000)
    ids = _snap_log(root)
    r = _reader(root, mode="cdc")
    # range covering both commits: the insert slice for eph.parquet must
    # exclude pos 1 (id=8) ... and the delete slice retracts it — but a
    # consumer replaying insert-then-delete still nets correctly. Check
    # the per-commit batch boundaries instead: batch (0,1] emits both
    # inserts; batch (1,2] retracts id=8.
    b1 = r.partitions({"snapshot_id": ids[0]}, {"snapshot_id": ids[1]})
    assert [p.kind for p in b1] == ["insert"]
    rows = [tuple(row)[:3] for batch in b1 for row in _batch_rows(r, batch)]
    assert sorted(rows) == [(7, "g", "insert"), (8, "h", "insert")]
    b2 = r.partitions({"snapshot_id": ids[1]}, {"snapshot_id": ids[2]})
    assert [p.kind for p in b2] == ["delete"]
    rows = [tuple(row) for batch in b2 for row in _batch_rows(r, batch)]
    assert [(r_[0], r_[1], r_[2]) for r_ in rows] == [(8, "h", "delete")]


def test_true_same_commit_add_and_delete_nets_in_one_commit(table):
    """ONE commit that both adds a file and position-deletes a row of
    that same file (the overwrite shape): the insert slice excludes the
    deleted position and NO delete slice is planned for the new file —
    per-commit net semantics inside a single commit."""
    root, _ = table
    p = os.path.join(root, "data", "newf.parquet")
    pq.write_table(pa.table({"id": [20, 21], "v": ["m", "n"]}), p)
    d = os.path.join(root, "data", "newf-del.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": [f"file://{p}"],
                "pos": pa.array([1], type=pa.int64()),
            }
        ),
        d,
    )
    commit_row_delta_snapshot(
        root,
        new_data_files=[(p, 2)],
        delete_files=[(d, 1)],
        timestamp_ms=T1 + 1000,
    )
    ids = _snap_log(root)
    r = _reader(root, mode="cdc")
    parts = r.partitions({"snapshot_id": ids[0]}, {"snapshot_id": ids[1]})
    news = [pp for pp in parts if pp.data_file.endswith("newf.parquet")]
    assert [pp.kind for pp in news] == ["insert"]
    rows = [tuple(row)[:3] for row in _batch_rows(r, news[0])]
    assert rows == [(20, "m", "insert")]  # (21,'n') netted out


def _batch_rows(reader, part):
    out = []
    for rb in reader.read(part):
        tbl = pa.Table.from_batches([rb])
        out.extend(zip(*(tbl.column(c).to_pylist() for c in tbl.column_names)))
    return out


def test_equality_deletes_fail_with_clear_error(spark, table):
    from cloudfloe_spark.sources.maintenance import delete_by_key

    root, _ = table
    delete_by_key(root, "id", [2], timestamp_ms=T1 + 1000)
    ids = _snap_log(root)
    r = _reader(root, mode="cdc")
    with pytest.raises(IcebergSourceError, match="equality-delete"):
        r.partitions({"snapshot_id": ids[0]}, {"snapshot_id": ids[1]})


def test_renamed_history_reads_under_current_names(spark, tmp_path):
    """Files written before a column rename stream out under CURRENT
    names via the same field-id footer mapping as the batch read path."""
    root = str(tmp_path / "tren")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1], "v": ["a"]})], timestamp_ms=T1
    )
    t.rename_column("v", "val", timestamp_ms=T1 + 500)
    _append_renamed(root, "b1.parquet", [2], ["b"], T1 + 1000)
    ids = _snap_log(root)
    r = _reader(root)
    assert r.pinned_ddl.find("val") >= 0
    parts = r.partitions(
        {"snapshot_id": 0}, {"snapshot_id": ids[-1]}
    )
    rows = sorted(
        tuple(row) for p in parts for row in _batch_rows(r, p)
    )
    assert rows == [(1, "a"), (2, "b")]


def _append_renamed(root, name, ids, vals, ts):
    p = os.path.join(root, "data", name)
    pq.write_table(pa.table({"id": ids, "val": vals}), p)
    commit_row_delta_snapshot(root, new_data_files=[(p, len(ids))], timestamp_ms=ts)


def test_schema_evolution_mid_stream_fails_with_restart_hint(spark, table):
    root, t = table
    ids0 = _snap_log(root)
    r = _reader(root)
    t.rename_column("v", "val", timestamp_ms=T1 + 500)
    _append_renamed(root, "b1.parquet", [2], ["b"], T1 + 1000)
    ids = _snap_log(root)
    with pytest.raises(IcebergSourceError, match="restart"):
        r.partitions({"snapshot_id": ids0[0]}, {"snapshot_id": ids[-1]})


def test_cdc_stream_over_cow_commit_replays(spark, table, tmp_path):
    """A copy-on-write DML commit (files removed + replaced, no delete
    files) tailed in cdc mode: the source emits full-file retractions
    for the removed files and inserts for their replacements — noisier
    than the batch iceberg_cdc_commits net diff, but replay-exact:
    applying deletes-then-inserts per commit reproduces the scan."""
    root, _ = table
    update_where(
        spark, root, "id = 3", {"v": "upper(v)"},
        timestamp_ms=T1 + 1000, mode="copy-on-write",
    )
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    rows = _run_once(spark, root, out, cp, "r1", mode="cdc")
    seq_of = {
        int(r[0]): int(r[1])
        for r in _sql(
            spark,
            f"SELECT snapshot_id, sequence_number FROM "
            f"iceberg_snapshots('{root}')",
        )
    }
    state: list = []
    for r in sorted(rows, key=lambda r: (seq_of[r[3]], r[2] == "insert")):
        if r[2] == "delete":
            state.remove((r[0], r[1]))
        else:
            state.append((r[0], r[1]))
    assert sorted(state) == _scan(spark, root)
    # the COW commit retracts the rewritten file's rows and re-inserts
    # the survivors + the updated row — full-file granularity
    cow = [r for r in rows if seq_of[r[3]] == 2]
    assert sorted(
        (r[0], r[1]) for r in cow if r[2] == "delete"
    ) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    assert sorted(
        (r[0], r[1]) for r in cow if r[2] == "insert"
    ) == [(1, "a"), (2, "b"), (3, "C"), (4, "d")]


def test_stream_decodes_variant_and_surfaces_ns(spark, tmp_path):
    """r12 (late): the commit-tail source surfaces variant as
    canonical-JSON STRING and ns timestamps as µs TIMESTAMP — the same
    forms the batch scan exposes. The codec closure travels BY VALUE
    with the reader (executors never import the package); SHREDDED
    variant files fail the batch with a clear error."""
    from cloudfloe_spark.functions.variant import encode_variant, shred_rows

    root = str(tmp_path / "vsrc")
    vt = pa.struct([("metadata", pa.binary()), ("value", pa.binary())])

    def mk(n0, n):
        col = pa.array(
            [
                dict(
                    zip(("metadata", "value"), encode_variant({"a": i}))
                )
                for i in range(n0, n0 + n)
            ],
            vt,
        )
        return pa.table(
            {
                "id": pa.array(range(n0, n0 + n), pa.int64()),
                "v": col,
                "ts": pa.array(
                    [1700000000123456789 + i for i in range(n0, n0 + n)],
                    pa.timestamp("ns"),
                ),
            }
        )

    t = LocalIcebergTable(root, mk(0, 2).schema, variant_cols=("v",))
    t.append_snapshot([mk(0, 2)], timestamp_ms=T1)
    t.append_snapshot([mk(2, 2)], timestamp_ms=T1 + 1000)
    rows = sorted(
        _run_once(
            spark, root, str(tmp_path / "out"), str(tmp_path / "cp"),
            "r1", mode="cdc",
        )
    )
    assert [r[1] for r in rows] == [
        '{"a":0}', '{"a":1}', '{"a":2}', '{"a":3}',
    ]
    assert all(
        str(r[2]).startswith("2023-11-14 22:13:20.123456") for r in rows
    )
    assert all(r[3] == "insert" for r in rows)

    # a SHREDDED commit fails the batch with the shredding named
    shred = {
        "kind": "object",
        "fields": {"a": {"value": True, "typed": {"kind": "int"}}},
    }
    scol = shred_rows([{"a": 9}], shred)
    sp = os.path.join(root, "data", "shred-00001.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array([9], pa.int64()),
                "v": scol,
                "ts": pa.array(
                    [1700000000123456789], pa.timestamp("ns")
                ),
            }
        ),
        sp,
    )
    commit_row_delta_snapshot(
        root, new_data_files=[(sp, 1)], timestamp_ms=T1 + 2000
    )
    with pytest.raises(Exception, match="SHREDDED"):
        _run_once(
            spark, root, str(tmp_path / "out"), str(tmp_path / "cp"),
            "r2", mode="cdc",
        )
