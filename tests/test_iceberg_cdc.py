"""``iceberg_cdc('<root>', from, to)`` — net row-level changelog across
DML snapshots (VERDICT r06 #6). Oracle: a DuckDB multiset snapshot diff —
the from- and to-states are loaded into DuckDB and diffed with EXCEPT ALL
both ways; the CDC output must match exactly, and replaying deletes+
inserts onto the from-state must reproduce the to-state (the incremental
consumer contract the net-append ``iceberg_changes`` cannot provide
across delete_where / update_where / merge_into)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.service.errors import CloudfloeError
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.maintenance import (
    compact_iceberg_table,
    delete_by_key,
    delete_where,
    update_where,
)

T1 = 1700000000000


def _cfg():
    return ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )


def _rows(spark, sql):
    return [tuple(r) for r in run_query(spark, sql, _cfg()).rows]


def _state(spark, root, snap_id):
    return _rows(
        spark,
        f"SELECT id, v FROM iceberg_scan('{root}') VERSION AS OF {snap_id}",
    )


def _duckdb_diff(state_from, state_to):
    """(deletes, inserts) per multiset snapshot diff in DuckDB."""
    con = duckdb.connect()
    con.execute("CREATE TABLE f (id BIGINT, v VARCHAR)")
    con.execute("CREATE TABLE t (id BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO f VALUES (?, ?)", state_from or [(None, None)])
    if not state_from:
        con.execute("DELETE FROM f")
    con.executemany("INSERT INTO t VALUES (?, ?)", state_to or [(None, None)])
    if not state_to:
        con.execute("DELETE FROM t")
    dels = con.execute(
        "SELECT * FROM f EXCEPT ALL SELECT * FROM t ORDER BY id, v"
    ).fetchall()
    ins = con.execute(
        "SELECT * FROM t EXCEPT ALL SELECT * FROM f ORDER BY id, v"
    ).fetchall()
    return [tuple(r) for r in dels], [tuple(r) for r in ins]


def _cdc(spark, root, s_from, s_to):
    rows = _rows(
        spark,
        f"SELECT id, v, _change_type FROM iceberg_cdc('{root}', {s_from}, "
        f"{s_to}) ORDER BY _change_type, id, v",
    )
    dels = sorted((r[0], r[1]) for r in rows if r[2] == "delete")
    ins = sorted((r[0], r[1]) for r in rows if r[2] == "insert")
    assert all(r[2] in ("insert", "delete") for r in rows)
    return dels, ins


@pytest.fixture()
def table(tmp_path):
    root = str(tmp_path / "tcdc")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})],
        timestamp_ms=T1,
    )
    return root, t


def _snap_ids(spark, root):
    return [
        int(r[0])
        for r in _rows(
            spark,
            f"SELECT snapshot_id FROM iceberg_snapshots('{root}') "
            "ORDER BY sequence_number",
        )
    ]


def test_cdc_append_delete_update_matches_duckdb_diff(spark, table):
    """The judge's three shapes in one range: append, DELETE, and an
    update (delete+insert) — CDC equals the DuckDB snapshot diff."""
    root, t = table
    delete_where(spark, root, "id = 2", timestamp_ms=T1 + 1000)
    update_where(
        spark, root, "id = 3", {"v": "upper(v)"}, timestamp_ms=T1 + 2000
    )
    # plain append through the row-delta commit path
    import os

    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )

    p = os.path.join(root, "data", "late-append.parquet")
    pq.write_table(pa.table({"id": [5], "v": ["e"]}), p)
    commit_row_delta_snapshot(
        root, new_data_files=[(p, 1)], timestamp_ms=T1 + 3000
    )

    snaps = _snap_ids(spark, root)
    s_from, s_to = snaps[0], snaps[-1]
    exp_dels, exp_ins = _duckdb_diff(
        _state(spark, root, s_from), _state(spark, root, s_to)
    )
    dels, ins = _cdc(spark, root, s_from, s_to)
    assert dels == sorted(exp_dels)  # (2,'b') and (3,'c')
    assert ins == sorted(exp_ins)    # (3,'C') and (5,'e')

    # consumer contract: from-state + changelog == to-state (multiset)
    replay = sorted(
        [r for r in _state(spark, root, s_from) if r not in dels] + ins
    )
    assert replay == sorted(_state(spark, root, s_to))


def test_cdc_equality_delete_in_range(spark, table):
    """delete_by_key commits an EQUALITY delete — the changelog must
    retract the matching pre-range rows."""
    root, _ = table
    delete_by_key(root, "id", [4], timestamp_ms=T1 + 1000)
    snaps = _snap_ids(spark, root)
    exp_dels, exp_ins = _duckdb_diff(
        _state(spark, root, snaps[0]), _state(spark, root, snaps[-1])
    )
    dels, ins = _cdc(spark, root, snaps[0], snaps[-1])
    assert (dels, ins) == (sorted(exp_dels), sorted(exp_ins))
    assert dels == [(4, "d")] and ins == []


def test_cdc_row_added_and_deleted_in_range_emits_nothing(spark, table):
    root, t = table
    t.append_snapshot(
        [pa.table({"id": [9], "v": ["ephemeral"]})], timestamp_ms=T1 + 1000
    )
    delete_where(spark, root, "id = 9", timestamp_ms=T1 + 2000)
    snaps = _snap_ids(spark, root)
    dels, ins = _cdc(spark, root, snaps[0], snaps[-1])
    assert dels == [] and ins == []


def test_cdc_re_delete_is_silent(spark, table):
    """A row deleted BEFORE the range and re-matched by an in-range
    delete (idempotent re-delete) must not emit a retraction again."""
    root, _ = table
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    mid = _snap_ids(spark, root)[-1]
    delete_where(spark, root, "id <= 2", timestamp_ms=T1 + 2000)
    snaps = _snap_ids(spark, root)
    dels, ins = _cdc(spark, root, mid, snaps[-1])
    assert dels == [(2, "b")] and ins == []  # 1 already dead at `from`


def test_cdc_empty_range_right_columns(spark, table):
    root, _ = table
    snaps = _snap_ids(spark, root)
    rows = _rows(
        spark,
        f"SELECT id, v, _change_type FROM "
        f"iceberg_cdc('{root}', {snaps[0]}, {snaps[0]})",
    )
    assert rows == []


def test_cdc_rejects_compaction_and_ambiguous_renames(spark, table):
    root, t = table
    s1 = _snap_ids(spark, root)[0]
    delete_where(spark, root, "id = 2", timestamp_ms=T1 + 1000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    s_last = _snap_ids(spark, root)[-1]
    with pytest.raises(CloudfloeError, match="append-only|full refresh"):
        _cdc(spark, root, s1, s_last)

    # an AMBIGUOUS rename history (old name collides with a live column —
    # the one shape footer mapping cannot resolve) still rejects; a plain
    # rename is supported (test_cdc_on_renamed_table_matches_duckdb_diff)
    root2 = str(t.root) + "_r"
    t2 = LocalIcebergTable(
        root2, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t2.append_snapshot(
        [pa.table({"id": [1], "v": ["a"]})], timestamp_ms=T1
    )
    t2.rename_column("v", "val", timestamp_ms=T1 + 500)
    t2.add_column("v", pa.string(), timestamp_ms=T1 + 600)
    t2.append_snapshot(
        [pa.table({"id": [2], "val": ["b"], "v": ["x"]})],
        timestamp_ms=T1 + 1000,
    )
    ids = _snap_ids(spark, root2)
    with pytest.raises(CloudfloeError, match="[Aa]mbiguous"):
        _rows(
            spark,
            f"SELECT * FROM iceberg_cdc('{root2}', {ids[0]}, {ids[-1]})",
        )


def test_cdc_on_renamed_table_matches_duckdb_diff(spark, table):
    """r8 (VERDICT r07 #3): a metadata-only column rename no longer locks
    the changelog out — carried/added files resolve through scan_groups
    field-id mapping exactly as the DML path does, and the CDC output
    (under CURRENT names) still equals the DuckDB snapshot diff."""
    root, t = table
    t.rename_column("v", "val", timestamp_ms=T1 + 500)
    t.append_snapshot(
        [pa.table({"id": [5], "val": ["e"]})], timestamp_ms=T1 + 1000
    )
    s_from = _snap_ids(spark, root)[0]
    state_from = _state(spark, root, s_from)  # write-time names, same values
    # DML on CURRENT names must hit pre-rename files (id=2,3) and the
    # post-rename file (id=5) alike
    delete_where(spark, root, "id = 2", timestamp_ms=T1 + 2000)
    update_where(
        spark, root, "id = 3 OR id = 5", {"val": "upper(val)"},
        timestamp_ms=T1 + 3000,
    )
    s_to = _snap_ids(spark, root)[-1]
    state_to = _rows(
        spark, f"SELECT id, val FROM iceberg_scan('{root}')"
    )
    exp_dels, exp_ins = _duckdb_diff(state_from, [tuple(r) for r in state_to])
    rows = _rows(
        spark,
        f"SELECT id, val, _change_type FROM iceberg_cdc('{root}', "
        f"{s_from}, {s_to}) ORDER BY _change_type, id, val",
    )
    dels = sorted((r[0], r[1]) for r in rows if r[2] == "delete")
    ins = sorted((r[0], r[1]) for r in rows if r[2] == "insert")
    assert dels == sorted(exp_dels)  # (2,'b') and (3,'c')
    assert ins == sorted(exp_ins)    # (3,'C') and (5,'E')
    # consumer contract on the renamed table too
    replay = sorted([r for r in state_from if r not in dels] + ins)
    assert replay == sorted(tuple(r) for r in state_to)


def test_cdc_carried_scan_prunes_to_delete_referenced_files(
    spark, tmp_path, monkeypatch
):
    """r8 (VERDICT r07 #1): with only POSITION deletes in range, the
    carried (retraction) scan must read only the data files the delete
    files name — a 1-file DELETE over a 3-file table scans 1 carried
    file, not 3. Captured by spying on every DataFrameReader.parquet call
    while the changelog builds and runs (plan-spy style,
    test_delete_where.py::test_dml_writes_read_cached_matches_not_parquet)."""
    from pyspark.sql.readwriter import DataFrameReader

    root = str(tmp_path / "tprune")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    # three data files in the FROM snapshot: ids 1-2 / 3-4 / 5-6
    t.append_snapshot(
        [
            pa.table({"id": [1, 2], "v": ["a", "b"]}),
            pa.table({"id": [3, 4], "v": ["c", "d"]}),
            pa.table({"id": [5, 6], "v": ["e", "f"]}),
        ],
        timestamp_ms=T1,
    )
    s_from = _snap_ids(spark, root)[0]
    delete_where(spark, root, "id = 3", timestamp_ms=T1 + 1000)
    s_to = _snap_ids(spark, root)[-1]

    calls: list[tuple[str, ...]] = []
    orig = DataFrameReader.parquet

    def spy(self, *paths, **kw):
        calls.append(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    dels, ins = _cdc(spark, root, s_from, s_to)
    assert dels == [(3, "c")] and ins == []
    data_scans = [
        ps for ps in calls
        if any("/data/" in p and "/deletes-" not in p for p in ps)
    ]
    # exactly ONE data scan (the carried retraction side; no added files),
    # listing exactly ONE file — the one the position delete names
    assert len(data_scans) == 1, data_scans
    assert len(data_scans[0]) == 1, data_scans


def test_cdc_identifier_columns_pair_update_images(spark, table):
    """r8: iceberg_cdc('<root>', f, t, 'id') — a key with exactly one
    retraction and one insertion in the net range relabels as
    update_preimage/update_postimage (the jarless analog of
    create_changelog_view(identifier_columns=...)); pure deletes and
    pure inserts keep their plain labels."""
    root, t = table
    delete_where(spark, root, "id = 2", timestamp_ms=T1 + 1000)
    update_where(
        spark, root, "id = 3", {"v": "upper(v)"}, timestamp_ms=T1 + 2000
    )
    import os

    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )

    p = os.path.join(root, "data", "late-append5.parquet")
    pq.write_table(pa.table({"id": [5], "v": ["e"]}), p)
    commit_row_delta_snapshot(
        root, new_data_files=[(p, 1)], timestamp_ms=T1 + 3000
    )
    snaps = _snap_ids(spark, root)
    rows = sorted(
        _rows(
            spark,
            f"SELECT id, v, _change_type FROM iceberg_cdc('{root}', "
            f"{snaps[0]}, {snaps[-1]}, 'id')",
        )
    )
    assert rows == sorted(
        [
            (2, "b", "delete"),            # only a retraction: plain
            (3, "c", "update_preimage"),   # paired
            (3, "C", "update_postimage"),
            (5, "e", "insert"),            # only an insertion: plain
        ]
    )


def test_cdc_identifier_columns_rekey_stays_plain(spark, table):
    """A key hit by TWO retractions (or whose insert count != 1) cannot
    pair — both rows keep plain labels rather than guessing."""
    root, t = table
    # duplicate key 7 twice, then delete both copies in range
    t.append_snapshot(
        [pa.table({"id": [7, 7], "v": ["x", "y"]})], timestamp_ms=T1 + 500
    )
    mid = _snap_ids(spark, root)[-1]
    delete_where(spark, root, "id = 7", timestamp_ms=T1 + 1000)
    snaps = _snap_ids(spark, root)
    rows = sorted(
        _rows(
            spark,
            f"SELECT id, v, _change_type FROM iceberg_cdc('{root}', "
            f"{mid}, {snaps[-1]}, 'id')",
        )
    )
    assert rows == sorted([(7, "x", "delete"), (7, "y", "delete")])


def test_cdc_identifier_columns_unknown_column_rejects(spark, table):
    root, _ = table
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    snaps = _snap_ids(spark, root)
    with pytest.raises(CloudfloeError, match="identifier column"):
        _rows(
            spark,
            f"SELECT * FROM iceberg_cdc('{root}', {snaps[0]}, "
            f"{snaps[-1]}, 'nope')",
        )


def test_cdc_replay_contract_across_mixed_dml_history(spark, tmp_path):
    """End-to-end replay contract over a mixed history — appends, a
    position DELETE, an UPDATE spanning pre- and post-range files, a
    column RENAME, an equality delete, and an update AFTER the equality
    delete (the r8 write path): for EVERY sampled snapshot range, the CDC
    output must equal the DuckDB multiset diff of the two states, and
    applying it to the from-state must reproduce the to-state."""
    import os

    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )

    root = str(tmp_path / "tmix")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [
            pa.table(
                {
                    "id": list(range(10)),
                    "v": [chr(97 + i) for i in range(10)],
                }
            )
        ],
        timestamp_ms=T1,
    )
    delete_where(spark, root, "id % 3 = 0", timestamp_ms=T1 + 1000)
    p = os.path.join(root, "data", "mix-append.parquet")
    pq.write_table(
        pa.table(
            {"id": list(range(10, 15)), "v": [f"n{i}" for i in range(5)]}
        ),
        p,
    )
    commit_row_delta_snapshot(root, new_data_files=[(p, 5)], timestamp_ms=T1 + 2000)
    update_where(
        spark, root, "id >= 8 AND id <= 12", {"v": "upper(v)"},
        timestamp_ms=T1 + 3000,
    )
    # rename MID-HISTORY through the external metadata commit (the live
    # fixture object is stale after DML commits and would clobber them)
    from cloudfloe_spark.sources.iceberg_fixture import rename_column_on_disk

    rename_column_on_disk(root, "v", "w", timestamp_ms=T1 + 4000)
    delete_by_key(root, "w", ["b"], timestamp_ms=T1 + 5000)
    update_where(
        spark, root, "id = 1", {"w": "concat(w, '!')"},
        timestamp_ms=T1 + 6000,
    )

    snaps = _snap_ids(spark, root)

    def state(snap_id):
        # positional compare: write-time schema names the value column v
        # before the rename, w after — SELECT * keeps (id, value) order
        return _rows(
            spark,
            f"SELECT * FROM iceberg_scan('{root}') VERSION AS OF {snap_id}",
        )

    def cdc(s_from, s_to):
        rows = _rows(
            spark,
            f"SELECT * FROM iceberg_cdc('{root}', {s_from}, {s_to})",
        )
        dels = sorted((r[0], r[1]) for r in rows if r[2] == "delete")
        ins = sorted((r[0], r[1]) for r in rows if r[2] == "insert")
        return dels, ins

    pairs = [
        (snaps[0], snaps[-1]),
        (snaps[2], snaps[-1]),
        (snaps[0], snaps[3]),
        (snaps[1], snaps[4]),
    ]
    for s_from, s_to in pairs:
        exp_dels, exp_ins = _duckdb_diff(state(s_from), state(s_to))
        dels, ins = cdc(s_from, s_to)
        assert dels == sorted(exp_dels), (s_from, s_to, dels, exp_dels)
        assert ins == sorted(exp_ins), (s_from, s_to, ins, exp_ins)
        replay = sorted(
            [r for r in state(s_from) if r not in dels] + ins
        )
        assert replay == sorted(state(s_to)), (s_from, s_to)


def test_apply_changelog_syncs_replica_to_primary(spark, tmp_path):
    """The write half of the incremental-consumer loop (r8):
    apply_changelog(replica, iceberg_cdc(primary, a, b), key) makes a
    replica seeded from snapshot a equal the primary's snapshot b — a
    DELETE, an UPDATE, and an append replicated in ONE merge-on-read
    commit, no full refresh. A second apply of the next range keeps it
    in sync (incremental, not one-shot)."""
    from cloudfloe_spark.service.iceberg_local import (
        resolve_iceberg_reads,
        resolve_incremental_reads,
    )
    from cloudfloe_spark.sources.maintenance import apply_changelog

    primary = str(tmp_path / "primary")
    replica = str(tmp_path / "replica")
    seed = pa.table({"id": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
    for root in (primary, replica):
        t = LocalIcebergTable(
            root, pa.schema([("id", pa.int64()), ("v", pa.string())])
        )
        t.append_snapshot([seed], timestamp_ms=T1)

    delete_where(spark, primary, "id = 2", timestamp_ms=T1 + 1000)
    update_where(
        spark, primary, "id = 3", {"v": "upper(v)"}, timestamp_ms=T1 + 2000
    )
    snaps = _snap_ids(spark, primary)

    def changes(s_from, s_to):
        sql = (
            f"SELECT * FROM iceberg_cdc('{primary}', {s_from}, {s_to}, 'id')"
        )
        return spark.sql(
            resolve_incremental_reads(
                spark, resolve_iceberg_reads(spark, sql)
            )
        )

    res = apply_changelog(
        spark, replica, changes(snaps[0], snaps[-1]), "id",
        timestamp_ms=T1 + 3000,
    )
    assert res["retracted"] == 2 and res["inserted"] == 1
    assert _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{replica}') ORDER BY id"
    ) == _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{primary}') ORDER BY id"
    )

    # next range: another DML on the primary, apply only the NEW range
    mark = snaps[-1]
    delete_where(spark, primary, "id = 4", timestamp_ms=T1 + 4000)
    s_new = _snap_ids(spark, primary)[-1]
    res = apply_changelog(
        spark, replica, changes(mark, s_new), "id", timestamp_ms=T1 + 5000
    )
    assert res["retracted"] == 1 and res["inserted"] == 0
    assert _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{replica}') ORDER BY id"
    ) == _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{primary}') ORDER BY id"
    )

    # empty range is a no-op commit-wise
    res = apply_changelog(
        spark, replica, changes(s_new, s_new), "id", timestamp_ms=T1 + 6000
    )
    assert res == {"retracted": 0, "inserted": 0, "snapshot_id": None}


def test_cdc_and_changes_accept_ref_and_timestamp_endpoints(spark, table):
    """r8: range endpoints accept the same spellings as time travel —
    bare snapshot ids, quoted ref names (tags/branches), and quoted
    timestamps."""
    from cloudfloe_spark.sources.iceberg_fixture import set_ref

    root, _ = table
    s1 = _snap_ids(spark, root)[0]
    set_ref(root, "v1", s1, timestamp_ms=T1 + 500)
    delete_where(spark, root, "id = 2", timestamp_ms=T1 + 1000)
    s2 = _snap_ids(spark, root)[-1]

    by_id = _rows(
        spark,
        f"SELECT id, v, _change_type FROM iceberg_cdc('{root}', {s1}, {s2}) "
        "ORDER BY id",
    )
    assert by_id == [(2, "b", "delete")]
    by_ref = _rows(
        spark,
        f"SELECT id, v, _change_type FROM iceberg_cdc('{root}', 'v1', {s2}) "
        "ORDER BY id",
    )
    assert by_ref == by_id
    # timestamps: snapshot commit times are T1 and T1+1000 (epoch ms)
    import datetime

    def ts(ms):
        return datetime.datetime.fromtimestamp(
            ms / 1000, tz=datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")

    by_ts = _rows(
        spark,
        f"SELECT id, v, _change_type FROM "
        f"iceberg_cdc('{root}', '{ts(T1)}', '{ts(T1 + 1000)}') ORDER BY id",
    )
    assert by_ts == by_id
    # iceberg_changes takes the same endpoint spellings (append feed)
    ch = _rows(
        spark,
        f"SELECT id, v FROM iceberg_changes('{root}', 'v1', '{ts(T1 + 1000)}')",
    )
    assert ch == []  # delete-only range appends nothing


def test_apply_changelog_idempotent_by_changelog_id(spark, tmp_path):
    """r8: a retried apply with the same changelog_id is a no-op (the
    id is recorded in the commit summary) — without it, a retry would
    re-append every insertion."""
    from cloudfloe_spark.sources.maintenance import apply_changelog

    root = str(tmp_path / "tidem")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2], "v": ["a", "b"]})], timestamp_ms=T1
    )
    changes = spark.createDataFrame(
        [(2, "b", "update_preimage"), (2, "B", "update_postimage"),
         (9, "n", "insert")],
        "id BIGINT, v STRING, _change_type STRING",
    )
    tag = "src:1:2"
    res1 = apply_changelog(
        spark, root, changes, "id", timestamp_ms=T1 + 1000, changelog_id=tag
    )
    assert res1["retracted"] == 1 and res1["inserted"] == 2
    res2 = apply_changelog(
        spark, root, changes, "id", timestamp_ms=T1 + 2000, changelog_id=tag
    )
    assert res2.get("skipped") is True
    got = _rows(spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id")
    assert got == [(1, "a"), (2, "B"), (9, "n")]


def test_apply_changelog_rejects_null_keys(spark, tmp_path):
    from cloudfloe_spark.sources.maintenance import apply_changelog

    root = str(tmp_path / "tnull")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1], "v": ["a"]})], timestamp_ms=T1
    )
    changes = spark.createDataFrame(
        [(None, "a", "delete")], "id BIGINT, v STRING, _change_type STRING"
    )
    with pytest.raises(ValueError, match="NULL key"):
        apply_changelog(spark, root, changes, "id", timestamp_ms=T1 + 1000)


def test_apply_changelog_prunes_retraction_scan_by_key_bounds(
    spark, tmp_path, monkeypatch
):
    """r8: the retraction pass prunes the target scan through the
    manifest-stats machinery using the changelog keys' [min, max] — a
    changelog touching one file's key range scans that file, not the
    table (reader plan-spy, like the CDC carried-scan prune test)."""
    from pyspark.sql.readwriter import DataFrameReader

    from cloudfloe_spark.sources.maintenance import apply_changelog

    root = str(tmp_path / "tpr")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    # three files with disjoint sorted id ranges -> disjoint manifest bounds
    t.append_snapshot(
        [
            pa.table({"id": [1, 2], "v": ["a", "b"]}),
            pa.table({"id": [10, 11], "v": ["c", "d"]}),
            pa.table({"id": [20, 21], "v": ["e", "f"]}),
        ],
        timestamp_ms=T1,
    )
    changes = spark.createDataFrame(
        [(10, "c", "delete"), (11, "d", "update_preimage"),
         (11, "D", "update_postimage")],
        "id BIGINT, v STRING, _change_type STRING",
    )
    calls: list[tuple[str, ...]] = []
    orig = DataFrameReader.parquet

    def spy(self, *paths, **kw):
        calls.append(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    res = apply_changelog(spark, root, changes, "id", timestamp_ms=T1 + 1000)
    assert res["retracted"] == 2 and res["inserted"] == 1
    data_scans = [
        ps for ps in calls
        if any("/data/" in p and "/deletes-" not in p for p in ps)
    ]
    assert len(data_scans) == 1, data_scans
    assert len(data_scans[0]) == 1, data_scans  # only the ids-10..11 file
    got = _rows(spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id")
    assert got == [(1, "a"), (2, "b"), (11, "D"), (20, "e"), (21, "f")]


def test_position_delete_targets_stats_and_boundary_row_groups(tmp_path):
    """Footer-only target resolution: single-file row groups resolve from
    statistics alone; a row group spanning a file boundary (min != max)
    falls back to reading just that group's column; truncation-suspect
    stats (value not ending in .parquet) are never trusted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_meta import position_delete_targets

    a = "/w/t/data/part-a.parquet"
    b = "/w/t/data/part-b.parquet"
    c = "/w/t/data/part-c.parquet"
    p = str(tmp_path / "del.parquet")
    # row group 1: all file a (min==max, trusted); row group 2: spans b+c
    t1 = pa.table({"file_path": [a, a, a], "pos": [0, 1, 2]})
    t2 = pa.table({"file_path": [b, c], "pos": [0, 0]})
    w = pq.ParquetWriter(p, t1.schema)
    w.write_table(t1)
    w.write_table(t2)
    w.close()
    pf = pq.ParquetFile(p)
    assert pf.metadata.num_row_groups == 2
    assert position_delete_targets([p]) == {
        "part-a.parquet",
        "part-b.parquet",
        "part-c.parquet",
    }

    # truncated-looking stats (no .parquet suffix): must read, not trust
    d = str(tmp_path / "trunc.parquet")
    pq.write_table(
        pa.table({"file_path": ["/w/t/data/prefix-only", "/w/t/data/prefix-only"],
                  "pos": [0, 1]}),
        d,
    )
    assert position_delete_targets([d]) == {"prefix-only"}


def test_cdc_commits_per_commit_granularity(spark, table):
    """r8: iceberg_cdc_commits — each commit's own delta with
    _commit_snapshot_id/_commit_ordinal; a row inserted then deleted
    INSIDE the range appears in both commits (where the net view shows
    nothing), and a REPLACE (compaction) commit emits nothing without
    breaking the range."""
    import os

    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )

    root, t = table
    p = os.path.join(root, "data", "eph.parquet")
    pq.write_table(pa.table({"id": [9], "v": ["eph"]}), p)
    commit_row_delta_snapshot(root, new_data_files=[(p, 1)], timestamp_ms=T1 + 1000)
    delete_where(spark, root, "id = 9", timestamp_ms=T1 + 2000)
    snaps = _snap_ids(spark, root)

    # net view: nothing (added-and-deleted collapses)
    dels, ins = _cdc(spark, root, snaps[0], snaps[-1])
    assert dels == [] and ins == []

    rows = sorted(
        _rows(
            spark,
            f"SELECT id, v, _change_type, _commit_snapshot_id, "
            f"_commit_ordinal FROM "
            f"iceberg_cdc_commits('{root}', {snaps[0]}, {snaps[-1]})",
        )
    )
    assert rows == sorted(
        [
            (9, "eph", "insert", snaps[1], 1),
            (9, "eph", "delete", snaps[2], 2),
        ]
    )


def test_cdc_commits_skips_replace_commits(spark, table):
    """A compaction inside the range emits nothing and does not 400 the
    per-commit read (unlike the net view, which cannot represent a
    rewritten file history)."""
    root, _ = table
    delete_where(spark, root, "id = 2", timestamp_ms=T1 + 1000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    update_where(
        spark, root, "id = 3", {"v": "upper(v)"}, timestamp_ms=T1 + 3000
    )
    snaps = _snap_ids(spark, root)
    rows = sorted(
        _rows(
            spark,
            f"SELECT id, v, _change_type, _commit_ordinal FROM "
            f"iceberg_cdc_commits('{root}', {snaps[0]}, {snaps[-1]}, 'id')",
        )
    )
    # ordinal 1 = the DELETE commit; the compaction is skipped (no rows,
    # no ordinal); ordinal 2 = the UPDATE commit (post-compaction files)
    assert rows == sorted(
        [
            (2, "b", "delete", 1),
            (3, "c", "update_preimage", 2),
            (3, "C", "update_postimage", 2),
        ]
    ), rows


def test_cdc_commits_on_renamed_table(spark, table):
    """Per-commit changelog across a rename history: each pair's delta
    resolves pre-rename files through the same scan_groups mapping as
    the net view, so the per-commit read works on renamed tables too
    (output under CURRENT names, ordinals unaffected by the metadata-only
    rename, which commits no snapshot)."""
    root, t = table
    t.rename_column("v", "val", timestamp_ms=T1 + 500)
    delete_where(spark, root, "id = 2", timestamp_ms=T1 + 1000)
    update_where(
        spark, root, "id = 3", {"val": "upper(val)"}, timestamp_ms=T1 + 2000
    )
    snaps = _snap_ids(spark, root)
    rows = sorted(
        _rows(
            spark,
            f"SELECT id, val, _change_type, _commit_ordinal FROM "
            f"iceberg_cdc_commits('{root}', {snaps[0]}, {snaps[-1]}, 'id')",
        )
    )
    assert rows == sorted(
        [
            (2, "b", "delete", 1),
            (3, "c", "update_preimage", 2),
            (3, "C", "update_postimage", 2),
        ]
    ), rows


def test_cdc_commits_over_cow_delete_matches_duckdb_diff(spark, table):
    """r8: a copy-on-write DELETE commit (files removed + replaced, no
    delete files) reads as a restricted row-diff — per-commit CDC equals
    the DuckDB snapshot diff, where the pre-r8 behavior was a 400."""
    root, _ = table
    delete_where(
        spark, root, "id IN (2, 4)", timestamp_ms=T1 + 1000,
        mode="copy-on-write",
    )
    snaps = _snap_ids(spark, root)
    exp_dels, exp_ins = _duckdb_diff(
        _state(spark, root, snaps[0]), _state(spark, root, snaps[-1])
    )
    rows = sorted(
        _rows(
            spark,
            f"SELECT id, v, _change_type, _commit_ordinal FROM "
            f"iceberg_cdc_commits('{root}', {snaps[0]}, {snaps[-1]})",
        )
    )
    assert sorted((r[0], r[1]) for r in rows if r[2] == "delete") == exp_dels
    assert sorted((r[0], r[1]) for r in rows if r[2] == "insert") == exp_ins
    assert all(r[3] == 1 for r in rows)


def test_cdc_commits_over_cow_update_pairs_images(spark, table):
    root, _ = table
    update_where(
        spark, root, "id = 3", {"v": "upper(v)"},
        timestamp_ms=T1 + 1000, mode="copy-on-write",
    )
    snaps = _snap_ids(spark, root)
    rows = sorted(
        _rows(
            spark,
            f"SELECT id, v, _change_type FROM "
            f"iceberg_cdc_commits('{root}', {snaps[0]}, {snaps[-1]}, 'id')",
        )
    )
    assert rows == sorted(
        [(3, "c", "update_preimage"), (3, "C", "update_postimage")]
    ), rows


def test_cdc_commits_mixed_mor_and_cow_range(spark, table):
    """A range holding one merge-on-read commit and one copy-on-write
    commit: each reads with its own machinery, ordinals in order."""
    root, _ = table
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)  # MOR
    update_where(
        spark, root, "id = 3", {"v": "'z'"},
        timestamp_ms=T1 + 2000, mode="copy-on-write",
    )
    snaps = _snap_ids(spark, root)
    rows = sorted(
        _rows(
            spark,
            f"SELECT id, v, _change_type, _commit_ordinal FROM "
            f"iceberg_cdc_commits('{root}', {snaps[0]}, {snaps[-1]})",
        )
    )
    assert rows == sorted(
        [
            (1, "a", "delete", 1),
            (3, "c", "delete", 2),
            (3, "z", "insert", 2),
        ]
    ), rows
    # replaying the per-commit deltas in ordinal order reproduces the
    # final state from the initial one
    state = set(_state(spark, root, snaps[0]))
    for r in sorted(rows, key=lambda r: r[3]):
        if r[2] == "delete":
            state.discard((r[0], r[1]))
        else:
            state.add((r[0], r[1]))
    assert state == set(_state(spark, root, snaps[-1]))


def test_cdc_net_view_still_refuses_cow_range(spark, table):
    """The net view keeps its clear refusal over rewritten histories —
    now pointing the caller at iceberg_cdc_commits."""
    root, _ = table
    delete_where(
        spark, root, "id = 2", timestamp_ms=T1 + 1000, mode="copy-on-write"
    )
    snaps = _snap_ids(spark, root)
    with pytest.raises(CloudfloeError, match="iceberg_cdc_commits"):
        _rows(
            spark,
            f"SELECT * FROM iceberg_cdc('{root}', {snaps[0]}, {snaps[-1]})",
        )


def test_changes_feed_resolves_renames_and_applies_dvs(spark, tmp_path):
    """r15 late REGRESSIONS (found live): the append feed
    (``iceberg_changes``) (1) failed to resolve appended files written
    under PRE-RENAME column names (plain files errored at query time;
    shredded files silently NULLED the renamed column), and (2) never
    applied v3 DELETION VECTORS — a row appended and MOR-deleted inside
    the range leaked into the feed (every v3 MOR delete commits DVs,
    so append-then-delete ranges emitted phantom rows). The feed now
    resolves appended files through scan_groups and applies the DVs
    that reference them."""
    import os

    import pyarrow.parquet as pq

    from cloudfloe_spark.sources import iceberg_meta as im
    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
        rename_column_on_disk,
    )

    # (1) rename, then an OLD-schema writer appends
    root = str(tmp_path / "chren")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("x", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [0, 1], "x": ["a", "b"]})], timestamp_ms=T1
    )
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    rename_column_on_disk(root, "id", "doc_id", timestamp_ms=T1 + 500)
    ap = os.path.join(root, "data", "old-name-append.parquet")
    pq.write_table(
        pa.table(
            {"id": pa.array([9], pa.int64()), "x": pa.array(["z"])}
        ),
        ap,
    )
    commit_row_delta_snapshot(
        root, new_data_files=[(ap, 1)], timestamp_ms=T1 + 1000
    )
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    got = _rows(
        spark,
        f"SELECT doc_id, x FROM iceberg_changes('{root}', {s0}, {s1})",
    )
    assert got == [(9, "z")]

    # (2) append then MOR-delete (a DV on the added file) in one range
    root2 = str(tmp_path / "chdv")
    t2 = LocalIcebergTable(
        root2, pa.schema([("id", pa.int64()), ("x", pa.string())]),
        row_lineage=True,
    )
    t2.append_snapshot(
        [pa.table({"id": [0, 1], "x": ["a", "b"]})], timestamp_ms=T1
    )
    s0 = im.resolve_snapshot(root2)["snapshot-id"]
    ap2 = os.path.join(root2, "data", "newrows.parquet")
    pq.write_table(
        pa.table(
            {"id": pa.array([5, 6], pa.int64()),
             "x": pa.array(["p", "q"])}
        ),
        ap2,
    )
    commit_row_delta_snapshot(
        root2, new_data_files=[(ap2, 2)], timestamp_ms=T1 + 600
    )
    delete_where(spark, root2, "id = 5", timestamp_ms=T1 + 1000)
    s1 = im.resolve_snapshot(root2)["snapshot-id"]
    got = _rows(
        spark, f"SELECT id FROM iceberg_changes('{root2}', {s0}, {s1})"
    )
    assert sorted(r[0] for r in got) == [6]
