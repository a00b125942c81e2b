"""Row-level DELETE via merge-on-read position deletes: the write half of
the v2 delete support the reader already applies. The reference cannot even
READ tables with delete files (backend/main.py:398-414 rejects); this
engine both reads them and now PRODUCES them without rewriting data files.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.sources import iceberg_meta as im
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.maintenance import compact_iceberg_table, delete_where

T1 = 1700000000000


def _cfg():
    return ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )


def _rows(spark, sql):
    return run_query(spark, sql, _cfg()).rows


@pytest.fixture()
def two_file_table(tmp_path):
    root = str(tmp_path / "tdel")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64()), ("v", pa.string())]))
    t.append_snapshot(
        [
            pa.table({"id": list(range(0, 5)), "v": list("abcde")}),
            pa.table({"id": list(range(5, 10)), "v": list("fghij")}),
        ],
        timestamp_ms=T1,
    )
    return root


def test_delete_where_marks_rows_without_rewrite(spark, two_file_table):
    root = two_file_table
    pre_files = set(im.live_data_paths(root, im.resolve_snapshot(root)))
    res = delete_where(spark, root, "id >= 8 OR v = 'a'", timestamp_ms=T1 + 1000)
    assert res["matched"] == 3
    assert res["snapshot_id"] is not None

    got = _rows(
        spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert [r[0] for r in got] == [1, 2, 3, 4, 5, 6, 7]
    # data files untouched — deletion is metadata + delete files only
    post_files = set(im.live_data_paths(root, im.resolve_snapshot(root)))
    assert post_files == pre_files
    # the reference's probe aggregate now reports deletes
    agg = _rows(
        spark,
        f"""SELECT BOOL_OR(manifest_content <> 'DATA') AS has_deletes
            FROM iceberg_metadata('{root}')""",
    )
    assert agg == [[True]]


def test_delete_where_time_travel_preserves_history(spark, two_file_table):
    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    delete_where(spark, root, "id < 5", timestamp_ms=T1 + 1000)
    cur = _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')")
    assert cur == [[5]]
    old = _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF {s1}",
    )
    assert old == [[10]]


def test_delete_where_zero_matches_commits_nothing(spark, two_file_table):
    root = two_file_table
    n_before = len(im.load_metadata(root).get("snapshots", []))
    res = delete_where(spark, root, "id > 999", timestamp_ms=T1 + 1000)
    assert res["matched"] == 0 and res["snapshot_id"] is None
    assert res["delete_files"] == []
    assert len(im.load_metadata(root).get("snapshots", [])) == n_before


def test_delete_where_is_idempotent(spark, two_file_table):
    root = two_file_table
    delete_where(spark, root, "id = 3", timestamp_ms=T1 + 1000)
    delete_where(spark, root, "id <= 3", timestamp_ms=T1 + 2000)  # re-deletes 3
    got = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in got] == [4, 5, 6, 7, 8, 9]


def test_delete_where_works_on_renamed_tables(spark, tmp_path):
    """r7 (VERDICT r06 #2): DML on a renamed-column table — the scan
    resolves write-time names per file group like the read path, so a
    condition in CURRENT names matches rows in pre-rename files, and a
    post-rename append (current-name footers) participates in the same
    pass. DuckDB computes the expected survivors from the raw parquet."""
    import duckdb

    root = str(tmp_path / "tren")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2, 3], "v": ["a", "b", "c"]})], timestamp_ms=T1
    )
    t.rename_column("id", "row_id", timestamp_ms=T1 + 500)
    # post-rename file: footer already carries the current name
    t.append_snapshot(
        [pa.table({"row_id": [4, 5], "v": ["d", "e"]})], timestamp_ms=T1 + 700
    )
    s_pre = im.resolve_snapshot(root)["snapshot-id"]

    # DuckDB oracle over the RAW data files (read before the DML adds
    # delete sidecars): normalize each footer's write-time first column
    # to the current name, union, filter the survivors.
    import glob as g
    import os

    raw = []
    for f in sorted(g.glob(os.path.join(root, "data", "*.parquet"))):
        # positional fetch: column 0 is id-then-renamed-row_id either way
        raw += [tuple(r) for r in duckdb.sql(
            f"SELECT * FROM read_parquet('{f}')"
        ).fetchall()]
    expected = sorted(t for t in raw if t[0] % 2 != 0)

    res = delete_where(spark, root, "row_id % 2 = 0", timestamp_ms=T1 + 1000)
    assert res["matched"] == 2  # row_id 2 (pre-rename file) + 4 (post)

    got = _rows(
        spark,
        f"SELECT row_id, v FROM iceberg_scan('{root}') ORDER BY row_id",
    )
    assert [tuple(r) for r in got] == expected
    # time travel across the DML still shows every pre-delete row
    old = _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF {s_pre}",
    )
    assert old == [[5]]


def test_update_and_merge_work_on_renamed_tables(spark, tmp_path):
    """update_where assignments and merge_into join keys are written in
    CURRENT names and must hit rows stored in pre-rename files."""
    from cloudfloe_spark.sources.maintenance import merge_into, update_where

    root = str(tmp_path / "tren2")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2, 3], "v": ["a", "b", "c"]})], timestamp_ms=T1
    )
    t.rename_column("v", "val", timestamp_ms=T1 + 500)

    update_where(
        spark, root, "id = 2", {"val": "upper(val)"}, timestamp_ms=T1 + 1000
    )
    got = _rows(
        spark, f"SELECT id, val FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert [tuple(r) for r in got] == [(1, "a"), (2, "B"), (3, "c")]

    src = spark.createDataFrame(
        [(3, "merged"), (9, "new")], "id LONG, val STRING"
    )
    res = merge_into(
        spark, root, src, "id",
        when_matched={"val": "s.val"}, timestamp_ms=T1 + 2000,
    )
    assert res["matched"] == 1 and res["inserted"] == 1
    got = _rows(
        spark, f"SELECT id, val FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert [tuple(r) for r in got] == [
        (1, "a"), (2, "B"), (3, "merged"), (9, "new")
    ]


def test_delete_then_compact_materializes_deletion(spark, two_file_table):
    """Composition: delete_where marks rows; compact_iceberg_table reads
    MOR-applied and rewrites — the new snapshot is delete-free and the
    deleted rows are physically gone from the new files."""
    root = two_file_table
    delete_where(spark, root, "id % 2 = 0", timestamp_ms=T1 + 1000)
    res = compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    assert res["rows"] == 5
    snap = im.resolve_snapshot(root)
    assert im.position_delete_paths(root, snap) == []
    got = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in got] == [1, 3, 5, 7, 9]


def test_delete_where_sequencing_vs_equality_deletes(spark, tmp_path):
    """Carried data entries must keep their ORIGINAL sequence numbers:
    an equality delete at seq 2 still applies only to seq-1 files after a
    later delete_where commit (a seq bump would resurrect nothing here but
    would break strictly-lower comparisons in general)."""
    root = str(tmp_path / "tseq")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64()), ("v", pa.string())]))
    t.append_snapshot([pa.table({"id": [1, 2, 3], "v": ["x", "y", "z"]})],
                      timestamp_ms=T1)
    t.equality_delete_snapshot(
        pa.table({"v": ["y"]}), equality_ids=[2], timestamp_ms=T1 + 500
    )
    delete_where(spark, root, "id = 3", timestamp_ms=T1 + 1000)
    got = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in got] == [1]


def test_update_where_rewrites_matching_rows(spark, two_file_table):
    from cloudfloe_spark.sources.maintenance import update_where

    root = two_file_table
    res = update_where(
        spark,
        root,
        "id >= 8",
        {"v": "upper(v)", "id": "id + 100"},
        timestamp_ms=T1 + 1000,
    )
    assert res["matched"] == 2
    got = _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert got == [
        [0, "a"], [1, "b"], [2, "c"], [3, "d"], [4, "e"],
        [5, "f"], [6, "g"], [7, "h"], [108, "I"], [109, "J"],
    ]
    # old values visible via time travel
    snaps = im.load_metadata(root)["snapshots"]
    first = snaps[0]["snapshot-id"]
    old = _rows(
        spark,
        f"SELECT v FROM iceberg_scan('{root}') VERSION AS OF {first} "
        "WHERE id = 9",
    )
    assert old == [["j"]]
    # the update snapshot is the spec's overwrite shape
    assert snaps[-1]["summary"]["operation"] == "overwrite"


def test_update_where_assignments_see_old_values(spark, tmp_path):
    """Standard UPDATE semantics: a swap via two assignments reads the
    PRE-update row for both expressions."""
    from cloudfloe_spark.sources.maintenance import update_where

    root = str(tmp_path / "tswap")
    t = LocalIcebergTable(
        root, pa.schema([("a", pa.int64()), ("b", pa.int64())])
    )
    t.append_snapshot([pa.table({"a": [1, 10], "b": [2, 20]})], timestamp_ms=T1)
    update_where(spark, root, "a = 1", {"a": "b", "b": "a"}, timestamp_ms=T1 + 1000)
    got = _rows(spark, f"SELECT a, b FROM iceberg_scan('{root}') ORDER BY a")
    assert got == [[2, 1], [10, 20]]


def test_update_where_new_files_carry_stats(spark, two_file_table):
    """Rows rewritten by update_where get fresh column bounds, so
    metrics skipping keeps pruning the updated files too."""
    from cloudfloe_spark.sources.maintenance import update_where

    root = two_file_table
    update_where(spark, root, "id = 9", {"id": "900"}, timestamp_ms=T1 + 1000)
    snap = im.resolve_snapshot(root)
    stats = im.live_data_stats(root, snap)
    new = [s for p, s in stats.items() if "/update-" in p]
    assert len(new) == 1 and new[0]["lower"]["id"] == "900"
    # a selective predicate touches ONLY the updated file
    from cloudfloe_spark.service.iceberg_local import resolve_iceberg_reads

    sess = spark.newSession()
    df = sess.sql(
        resolve_iceberg_reads(
            sess, f"SELECT id FROM iceberg_scan('{root}') WHERE id = 900"
        )
    )
    assert [r["id"] for r in df.collect()] == [900]
    # both original data files are bounds-pruned; what remains is the
    # updated file plus the position-delete parquet the MOR anti-join
    # legitimately scans
    touched = set(df.inputFiles())
    assert all("/update-" in p or "/deletes-" in p for p in touched), touched
    assert any("/update-" in p for p in touched)


def test_update_where_unknown_column_rejected(spark, two_file_table):
    from cloudfloe_spark.sources.maintenance import update_where

    with pytest.raises(ValueError, match="unknown columns"):
        update_where(
            spark, two_file_table, "id = 1", {"nope": "1"}, timestamp_ms=T1
        )


def test_merge_into_upsert(spark, tmp_path):
    from cloudfloe_spark.sources.maintenance import merge_into

    root = str(tmp_path / "tmerge")
    t = LocalIcebergTable(
        root, pa.schema([("k", pa.int64()), ("v", pa.string()), ("n", pa.int64())])
    )
    t.append_snapshot(
        [pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"], "n": [10, 20, 30]})],
        timestamp_ms=T1,
    )
    src = spark.createDataFrame(
        [(2, "B", 5), (4, "D", 40)], "k LONG, v STRING, n LONG"
    )
    res = merge_into(
        spark,
        root,
        src,
        "k",
        when_matched={"v": "s.v", "n": "t.n + s.n"},
        timestamp_ms=T1 + 1000,
    )
    assert res["matched"] == 1 and res["inserted"] == 1
    got = _rows(spark, f"SELECT k, v, n FROM iceberg_scan('{root}') ORDER BY k")
    assert got == [[1, "a", 10], [2, "B", 25], [3, "c", 30], [4, "D", 40]]
    snaps = im.load_metadata(root)["snapshots"]
    assert snaps[-1]["summary"]["operation"] == "overwrite"


def test_merge_into_duplicate_source_rejected(spark, tmp_path):
    from cloudfloe_spark.sources.maintenance import (
        MergeCardinalityError,
        merge_into,
    )

    root = str(tmp_path / "tmdup")
    t = LocalIcebergTable(root, pa.schema([("k", pa.int64()), ("v", pa.string())]))
    t.append_snapshot([pa.table({"k": [1], "v": ["a"]})], timestamp_ms=T1)
    src = spark.createDataFrame([(1, "x"), (1, "y")], "k LONG, v STRING")
    with pytest.raises(MergeCardinalityError):
        merge_into(
            spark, root, src, "k", when_matched={"v": "s.v"},
            timestamp_ms=T1 + 1000,
        )
    # nothing was committed
    assert len(im.load_metadata(root)["snapshots"]) == 1


def test_merge_into_matched_only(spark, tmp_path):
    from cloudfloe_spark.sources.maintenance import merge_into

    root = str(tmp_path / "tmonly")
    t = LocalIcebergTable(root, pa.schema([("k", pa.int64()), ("v", pa.string())]))
    t.append_snapshot([pa.table({"k": [1, 2], "v": ["a", "b"]})], timestamp_ms=T1)
    src = spark.createDataFrame([(2, "B"), (9, "Z")], "k LONG, v STRING")
    res = merge_into(
        spark, root, src, "k", when_matched={"v": "s.v"},
        insert_unmatched=False, timestamp_ms=T1 + 1000,
    )
    assert res["matched"] == 1 and res["inserted"] == 0
    got = _rows(spark, f"SELECT k, v FROM iceberg_scan('{root}') ORDER BY k")
    assert got == [[1, "a"], [2, "B"]]


def test_row_delta_commit_conflict_detected(spark, two_file_table):
    """A commit landing between the delete's metadata read and its commit
    must abort with CommitConflictError — otherwise the interleaved
    snapshot would be silently superseded."""
    from cloudfloe_spark.sources.iceberg_fixture import (
        CommitConflictError,
        commit_row_delta_snapshot,
        commit_rewrite_snapshot,
    )

    root = two_file_table
    pinned = im.latest_metadata_path(root)
    # interleaved external commit moves the table on
    import os
    import pyarrow.parquet as pq

    p = os.path.join(root, "data", "interleaved.parquet")
    pq.write_table(pa.table({"id": [99], "v": ["x"]}), p)
    commit_rewrite_snapshot(root, [(p, 1)], timestamp_ms=T1 + 500)
    with pytest.raises(CommitConflictError):
        commit_row_delta_snapshot(
            root,
            delete_files=[],
            timestamp_ms=T1 + 1000,
            expected_metadata_path=pinned,
        )


def test_delete_compact_expire_orphan_lifecycle(spark, two_file_table):
    """Full storage lifecycle: delete rows (MOR), compact (materialize),
    expire old snapshots, sweep orphans — the original data files AND the
    now-unreferenced position-delete files are physically reclaimed, and
    the table still reads correctly."""
    import os

    from cloudfloe_spark.sources.maintenance import (
        expire_snapshots,
        remove_orphan_files,
    )

    root = two_file_table
    delete_where(spark, root, "id < 5", timestamp_ms=T1 + 1000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    expire_snapshots(root, keep_last=1, timestamp_ms=T1 + 3000)
    swept = remove_orphan_files(root, older_than_ms=0)
    assert swept["removed"] >= 3  # 2 original data files + >=1 delete file
    got = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in got] == [5, 6, 7, 8, 9]
    # no stray delete parquet remains on disk
    leftover = []
    for dirpath, _, files in os.walk(os.path.join(root, "data")):
        for f in files:
            if "deletes-" in dirpath:
                leftover.append(os.path.join(dirpath, f))
    assert leftover == [], leftover


def test_delete_by_key_metadata_only(spark, two_file_table):
    """Equality-delete erasure: no Spark job, no table scan — one tiny
    parquet + a commit. Reads apply it sequence-correctly."""
    import glob as globmod
    import os

    from cloudfloe_spark.sources.maintenance import delete_by_key

    root = two_file_table
    res = delete_by_key(root, "id", [2, 7, 999], timestamp_ms=T1 + 1000)
    assert res["values"] == 3 and res["snapshot_id"] is not None
    got = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in got] == [0, 1, 3, 4, 5, 6, 8, 9]
    # exactly one new file on disk: the equality-delete parquet
    edel = globmod.glob(os.path.join(root, "data", "edel-*.parquet"))
    assert len(edel) == 1


def test_delete_by_key_rows_rewritten_after_survive(spark, two_file_table):
    """v2 strictly-lower rule: a row RE-WRITTEN after the equality delete
    (same key, later sequence) survives — the retraction applies only to
    the past."""
    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )
    from cloudfloe_spark.sources.maintenance import delete_by_key

    root = two_file_table
    delete_by_key(root, "id", [3], timestamp_ms=T1 + 1000)
    # re-append id=3 at a LATER sequence
    import os
    import pyarrow.parquet as pq

    p = os.path.join(root, "data", "reappend.parquet")
    pq.write_table(pa.table({"id": [3], "v": ["re"]}), p)
    commit_row_delta_snapshot(
        root, new_data_files=[(p, 1)], timestamp_ms=T1 + 2000
    )
    got = _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{root}') WHERE id = 3"
    )
    assert got == [[3, "re"]]


def test_delete_by_key_works_after_rename(spark, tmp_path):
    """Equality deletes bind by field id; the delete parquet carries the
    CURRENT name and the reader resolves history — so key erasure works
    on renamed tables with no scan at all."""
    from cloudfloe_spark.sources.maintenance import delete_by_key

    root = str(tmp_path / "tekr")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2], "v": ["a", "b"]})], timestamp_ms=T1
    )
    t.rename_column("id", "row_id", timestamp_ms=T1 + 500)
    delete_by_key(root, "row_id", [1], timestamp_ms=T1 + 1000)
    got = _rows(
        spark, f"SELECT row_id FROM iceberg_scan('{root}') ORDER BY row_id"
    )
    assert [r[0] for r in got] == [2]


def test_delete_by_key_unknown_column_rejected(spark, two_file_table):
    from cloudfloe_spark.sources.maintenance import delete_by_key

    with pytest.raises(ValueError, match="not in current schema"):
        delete_by_key(two_file_table, "nope", [1], timestamp_ms=T1 + 1000)


def test_update_where_does_not_resurrect_deleted_rows(spark, two_file_table):
    """A row removed by an earlier position delete must NOT be matched
    (and re-appended) by a later update whose condition covers it — the
    DML scans run MOR-applied, not raw."""
    from cloudfloe_spark.sources.maintenance import update_where

    root = two_file_table
    delete_where(spark, root, "id = 3", timestamp_ms=T1 + 1000)
    res = update_where(
        spark, root, "id <= 5", {"v": "upper(v)"}, timestamp_ms=T1 + 2000
    )
    assert res["matched"] == 5  # ids 0,1,2,4,5 — NOT the deleted 3
    got = _rows(spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id")
    assert got == [
        [0, "A"], [1, "B"], [2, "C"], [4, "E"],
        [5, "F"], [6, "g"], [7, "h"], [8, "i"], [9, "j"],
    ]


def test_update_applies_live_equality_deletes(spark, tmp_path):
    """r8 (VERDICT r07 #5): a metadata-only erasure (equality delete) no
    longer forces compaction before the next UPDATE — the DML scan applies
    the equality deletes sequence-aware, so the erased row is neither
    matched nor resurrected, and the updated rows (written at a HIGHER
    sequence than the delete) survive the strictly-lower rule."""
    from cloudfloe_spark.sources.maintenance import delete_by_key, update_where

    root = str(tmp_path / "teq")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64()), ("v", pa.string())]))
    t.append_snapshot(
        [pa.table({"id": [1, 2, 3, 4], "v": ["x", "y", "z", "y"]})],
        timestamp_ms=T1,
    )
    delete_by_key(root, "v", ["y"], timestamp_ms=T1 + 500)  # erases 2 and 4
    res = update_where(
        spark, root, "id >= 1", {"v": "upper(v)"}, timestamp_ms=T1 + 1000
    )
    assert res["matched"] == 2  # only the LIVE rows 1 and 3
    got = _rows(spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id")
    # DuckDB oracle on the same logical history: erase v='y', then upper()
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, v VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(1, "x"), (2, "y"), (3, "z"), (4, "y")],
    )
    con.execute("DELETE FROM t WHERE v = 'y'")
    con.execute("UPDATE t SET v = upper(v)")
    exp = con.execute("SELECT id, v FROM t ORDER BY id").fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    # resurrection guard: the erased rows stay gone after the update
    assert [r[0] for r in got] == [1, 3]


def test_merge_applies_live_equality_deletes(spark, tmp_path):
    """MERGE after a metadata-only erasure: the erased key must take the
    NOT-MATCHED (insert) path, never resurrect the erased row's values."""
    from cloudfloe_spark.sources.maintenance import delete_by_key, merge_into

    root = str(tmp_path / "teqm")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64()), ("v", pa.string())]))
    t.append_snapshot(
        [pa.table({"id": [1, 2], "v": ["x", "y"]})], timestamp_ms=T1
    )
    delete_by_key(root, "id", [2], timestamp_ms=T1 + 500)
    res = merge_into(
        spark, root,
        spark.createDataFrame([(1, "u"), (2, "back")], "id BIGINT, v STRING"),
        on="id", when_matched={"v": "s.v"}, timestamp_ms=T1 + 1000,
    )
    assert res["matched"] == 1 and res["inserted"] == 1
    got = _rows(spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id")
    assert got == [[1, "u"], [2, "back"]]


def test_update_refuses_unreadable_equality_deletes(spark, tmp_path):
    """Equality deletes whose field ids don't resolve still refuse —
    applying around them would silently resurrect erased rows."""
    from cloudfloe_spark.sources.maintenance import update_where

    root = str(tmp_path / "tequr")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64()), ("v", pa.string())]))
    t.append_snapshot([pa.table({"id": [1, 2], "v": ["x", "y"]})], timestamp_ms=T1)
    t.equality_delete_snapshot(
        pa.table({"v": ["y"]}), equality_ids=[99], timestamp_ms=T1 + 500
    )
    with pytest.raises(ValueError, match="equality-delete"):
        update_where(spark, root, "id = 1", {"v": "'z'"}, timestamp_ms=T1 + 1000)


def test_delete_where_prunes_scan_by_condition(spark, two_file_table):
    """DELETE WHERE on a selective condition must not scan the whole
    table: the same two pruning levels the read path uses eliminate files
    whose bounds exclude the condition before the Spark job launches."""
    root = two_file_table
    res = delete_where(spark, root, "id >= 8", timestamp_ms=T1 + 1000)
    assert res["matched"] == 2
    assert res["files_total"] == 2
    assert res["files_scanned"] == 1  # first file's ids 0-4 are excluded
    got = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in got] == [0, 1, 2, 3, 4, 5, 6, 7]


def test_delete_where_prune_to_zero_commits_nothing(spark, two_file_table):
    root = two_file_table
    res = delete_where(spark, root, "id > 500", timestamp_ms=T1 + 1000)
    assert res["matched"] == 0 and res["files_scanned"] == 0
    assert res["files_total"] == 2
    assert res["snapshot_id"] is None


def test_update_where_prunes_scan_by_condition(spark, two_file_table):
    from cloudfloe_spark.sources.maintenance import update_where

    root = two_file_table
    res = update_where(
        spark, root, "id = 2", {"v": "'Z'"}, timestamp_ms=T1 + 1000
    )
    assert res["matched"] == 1
    assert res["files_scanned"] == 1 and res["files_total"] == 2
    got = _rows(spark, f"SELECT v FROM iceberg_scan('{root}') WHERE id = 2")
    assert got == [["Z"]]


def test_version_as_of_tag_name(spark, two_file_table):
    """VERSION AS OF '<name>' resolves through the Iceberg refs map."""
    from cloudfloe_spark.sources.iceberg_fixture import set_ref

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    delete_where(spark, root, "id >= 5", timestamp_ms=T1 + 1000)
    set_ref(root, "pre-cleanup", s1, timestamp_ms=T1 + 2000)
    tagged = _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') "
        "VERSION AS OF 'pre-cleanup'",
    )
    assert tagged == [[10]]
    cur = _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')")
    assert cur == [[5]]


def test_write_audit_publish_flow(spark, two_file_table):
    """WAP: stage a row delta on a ref without publishing, audit it via
    VERSION AS OF '<ref>' while current readers see nothing, then publish
    to fast-forward current."""
    import os
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
        publish_ref,
    )

    root = two_file_table
    p = os.path.join(root, "data", "staged.parquet")
    pq.write_table(pa.table({"id": [100], "v": ["staged"]}), p)
    commit_row_delta_snapshot(
        root,
        new_data_files=[(p, 1)],
        timestamp_ms=T1 + 1000,
        publish=False,
        ref="audit",
    )
    # current readers: unchanged
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[10]]
    # auditors: staged state visible through the ref
    audit = _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF 'audit'",
    )
    assert audit == [[11]]
    publish_ref(root, "audit", timestamp_ms=T1 + 2000)
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[11]]


def test_unpublished_commit_requires_ref(two_file_table):
    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )

    with pytest.raises(ValueError, match="requires a ref"):
        commit_row_delta_snapshot(
            two_file_table, delete_files=[], timestamp_ms=T1, publish=False
        )


def test_unknown_ref_is_a_client_error(spark, two_file_table):
    from cloudfloe_spark.service.errors import CloudfloeError

    with pytest.raises(CloudfloeError):
        _rows(
            spark,
            f"SELECT 1 FROM iceberg_scan('{two_file_table}') "
            "VERSION AS OF 'nope'",
        )


def test_iceberg_refs_listing(spark, two_file_table):
    from cloudfloe_spark.sources.iceberg_fixture import set_ref

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    set_ref(root, "v1", s1, timestamp_ms=T1 + 1000)
    rows = _rows(
        spark,
        f"SELECT ref, type, snapshot_id, is_current "
        f"FROM iceberg_refs('{root}') ORDER BY ref",
    )
    assert rows == [["v1", "tag", str(s1), True]]
    # no refs → empty listing, correct schema
    delete_where(spark, root, "id = 0", timestamp_ms=T1 + 2000)
    rows2 = _rows(
        spark, f"SELECT ref, is_current FROM iceberg_refs('{root}')"
    )
    assert rows2 == [["v1", False]]  # tag no longer the current snapshot


def test_iceberg_changes_across_a_delete_snapshot(spark, two_file_table):
    """A delete_where commit inside a change range keeps the append feed
    coherent: files are neither added nor removed (guard passes), rows
    appended in the range are reported with the TO snapshot's deletes
    applied, and pre-range deletions are — per the documented append-feed
    contract — not re-reported."""
    import os
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    # append 3 rows, then delete one of them (and one pre-range row)
    p = os.path.join(root, "data", "appended.parquet")
    pq.write_table(pa.table({"id": [50, 51, 52], "v": ["x", "y", "z"]}), p)
    commit_row_delta_snapshot(root, new_data_files=[(p, 3)], timestamp_ms=T1 + 1000)
    delete_where(spark, root, "id IN (51, 0)", timestamp_ms=T1 + 2000)
    s3 = im.resolve_snapshot(root)["snapshot-id"]
    rows = _rows(
        spark,
        f"SELECT id FROM iceberg_changes('{root}', {s1}, {s3}) ORDER BY id",
    )
    assert [r[0] for r in rows] == [50, 52]  # appended minus its deletion


def test_rollback_to_undoes_a_delete(spark, two_file_table):
    """rollback_to is the instant undo for any committed row delta: the
    delete's snapshot stays in history (roll-forward possible), but the
    CURRENT read is the pre-delete state again."""
    from cloudfloe_spark.sources.maintenance import rollback_to

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    res = delete_where(spark, root, "id < 5", timestamp_ms=T1 + 1000)
    s2 = res["snapshot_id"]
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[5]]
    rollback_to(root, s1, timestamp_ms=T1 + 2000)
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[10]]
    # roll-forward: the delete snapshot is still there
    rollback_to(root, s2, timestamp_ms=T1 + 3000)
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[5]]
    with pytest.raises(ValueError, match="not in table"):
        rollback_to(root, 123, timestamp_ms=T1 + 4000)


def test_expire_retains_ref_reachable_snapshots(spark, two_file_table):
    """A snapshot named by a tag (or an unpublished WAP stage's branch)
    survives expiry even outside keep_last — expiring it would dangle
    VERSION AS OF '<name>'; the orphan sweep keeps its files too."""
    from cloudfloe_spark.sources.iceberg_fixture import set_ref
    from cloudfloe_spark.sources.maintenance import (
        expire_snapshots,
        remove_orphan_files,
    )

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    set_ref(root, "keepme", s1, timestamp_ms=T1 + 500)
    delete_where(spark, root, "id = 0", timestamp_ms=T1 + 1000)
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 2000)
    res = expire_snapshots(root, keep_last=1, timestamp_ms=T1 + 3000)
    assert s1 in res["kept"]
    remove_orphan_files(root, older_than_ms=0)
    tagged = _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF 'keepme'",
    )
    assert tagged == [[10]]
    cur = _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')")
    assert cur == [[8]]


def test_append_to_branch_lifecycle(spark, two_file_table):
    """r7 (VERDICT r06 #7): branch-targeted writes. Append twice to a
    branch — each commit's parent is the BRANCH head, only the branch ref
    advances, main readers see nothing — then fast-forward publish."""
    import os
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        append_to_branch,
        publish_ref,
        set_ref,
    )

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    set_ref(root, "dev", s1, ref_type="branch", timestamp_ms=T1 + 500)
    for i, ts in ((1, 1000), (2, 2000)):
        p = os.path.join(root, "data", f"branch-{i}.parquet")
        pq.write_table(pa.table({"id": [100 + i], "v": [f"b{i}"]}), p)
        append_to_branch(root, "dev", [(p, 1)], timestamp_ms=T1 + ts)
        # main unchanged after every branch commit
        assert _rows(
            spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')"
        ) == [[10]]
        assert _rows(
            spark,
            f"SELECT COUNT(*) FROM iceberg_scan('{root}') "
            "VERSION AS OF 'dev'",
        ) == [[10 + i]]
    # the second commit's parent is the branch head, not s1
    head = im.resolve_ref(root, "dev")
    snaps = {
        s["snapshot-id"]: s
        for s in im.load_metadata(root).get("snapshots", [])
    }
    parent = snaps[head]["parent-snapshot-id"]
    assert parent != s1 and snaps[parent]["parent-snapshot-id"] == s1
    rows = _rows(
        spark,
        f"SELECT ref, type FROM iceberg_refs('{root}') WHERE ref = 'dev'",
    )
    assert rows == [["dev", "branch"]]
    publish_ref(root, "dev", timestamp_ms=T1 + 3000)
    assert _rows(
        spark,
        f"SELECT id, v FROM iceberg_scan('{root}') WHERE id > 100 ORDER BY id",
    ) == [[101, "b1"], [102, "b2"]]
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[12]]


def test_append_to_tag_or_missing_branch_errors(two_file_table):
    """Tags are immutable; a branch must exist before it can be appended
    to (set_ref creates it — implicit creation would hide typos)."""
    import os
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        append_to_branch,
        set_ref,
    )

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    set_ref(root, "v1", s1, ref_type="tag", timestamp_ms=T1 + 500)
    p = os.path.join(root, "data", "b.parquet")
    pq.write_table(pa.table({"id": [200], "v": ["x"]}), p)
    with pytest.raises(ValueError, match="immutable"):
        append_to_branch(root, "v1", [(p, 1)], timestamp_ms=T1 + 1000)
    with pytest.raises(ValueError, match="not found"):
        append_to_branch(root, "nope", [(p, 1)], timestamp_ms=T1 + 1000)


def test_publish_ref_rejects_diverged_branch(spark, two_file_table):
    """Publishing a branch whose history does NOT descend from main's
    current snapshot would silently drop main's commits — it errors
    (Iceberg's fast_forward contract). The WAP flow (branch staged ON
    current) keeps publishing fine — test_write_audit_publish_flow."""
    import os
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        append_to_branch,
        publish_ref,
        set_ref,
    )

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    set_ref(root, "dev", s1, ref_type="branch", timestamp_ms=T1 + 500)
    p = os.path.join(root, "data", "b.parquet")
    pq.write_table(pa.table({"id": [200], "v": ["x"]}), p)
    append_to_branch(root, "dev", [(p, 1)], timestamp_ms=T1 + 1000)
    # main advances independently → branch and main diverge
    delete_where(spark, root, "id = 0", timestamp_ms=T1 + 2000)
    with pytest.raises(ValueError, match="fast-forward"):
        publish_ref(root, "dev", timestamp_ms=T1 + 3000)
    # main kept its commit
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[9]]


def test_expire_retains_branch_head_after_branch_appends(spark, two_file_table):
    """Extends the ref-retention test to branch WRITES: after appends to a
    branch and further main commits, expiry keeps the branch head (its
    manifest carries every file the branch needs) and the orphan sweep
    keeps its files — VERSION AS OF '<branch>' stays readable."""
    import os
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        append_to_branch,
        set_ref,
    )
    from cloudfloe_spark.sources.maintenance import (
        expire_snapshots,
        remove_orphan_files,
    )

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    set_ref(root, "dev", s1, ref_type="branch", timestamp_ms=T1 + 500)
    for i, ts in ((1, 1000), (2, 2000)):
        p = os.path.join(root, "data", f"branch-{i}.parquet")
        pq.write_table(pa.table({"id": [100 + i], "v": [f"b{i}"]}), p)
        append_to_branch(root, "dev", [(p, 1)], timestamp_ms=T1 + ts)
    head = im.resolve_ref(root, "dev")
    delete_where(spark, root, "id = 0", timestamp_ms=T1 + 3000)
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 4000)
    res = expire_snapshots(root, keep_last=1, timestamp_ms=T1 + 5000)
    assert head in res["kept"]
    remove_orphan_files(root, older_than_ms=0)
    assert _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF 'dev'",
    ) == [[12]]
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[8]]


def test_drop_ref_releases_snapshot_for_expiry(spark, two_file_table):
    from cloudfloe_spark.sources.iceberg_fixture import drop_ref, set_ref
    from cloudfloe_spark.sources.maintenance import expire_snapshots

    root = two_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    set_ref(root, "tmp", s1, timestamp_ms=T1 + 500)
    delete_where(spark, root, "id = 0", timestamp_ms=T1 + 1000)
    drop_ref(root, "tmp", timestamp_ms=T1 + 2000)
    res = expire_snapshots(root, keep_last=1, timestamp_ms=T1 + 3000)
    assert s1 in res["expired"]
    with pytest.raises(Exception):
        _rows(
            spark,
            f"SELECT 1 FROM iceberg_scan('{root}') VERSION AS OF 'tmp'",
        )


def test_dml_writes_read_cached_matches_not_parquet(
    spark, two_file_table, monkeypatch
):
    """r7 (VERDICT r06 #3): the matching files must be scanned ONCE per
    DML call. The count() materializes the persisted match set; every
    subsequent write plan must read InMemoryTableScan, never re-scan the
    table parquet (pre-fix, the write re-executed the full filter scan —
    2× the dominant cost of a 100-TB DELETE). Captured by spying on the
    write-side plan at write time."""
    from pyspark.sql.readwriter import DataFrameWriter

    from cloudfloe_spark.sources.maintenance import update_where

    plans = []
    orig = DataFrameWriter.parquet

    def spy(self, path, **kw):
        plans.append(
            self._df._jdf.queryExecution().executedPlan().toString()
        )
        return orig(self, path, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", spy)

    root = two_file_table
    delete_where(spark, root, "id < 3", timestamp_ms=T1 + 1000)
    update_where(
        spark, root, "id = 5", {"v": "upper(v)"}, timestamp_ms=T1 + 2000
    )
    assert len(plans) == 3  # 1 delete write + update's delete + data write
    for p in plans:
        assert "InMemoryTableScan" in p, p
        # A FileScan may appear INSIDE the InMemoryRelation node (that is
        # the cache's stored definition being printed, not a re-scan);
        # what must not exist is a parquet scan OUTSIDE the cache, i.e.
        # before the first InMemoryRelation in the top-down tree text.
        first_file_scan = p.find("FileScan parquet")
        if first_file_scan != -1:
            assert 0 <= p.find("InMemoryRelation") < first_file_scan, p


def test_small_update_writes_one_data_file(spark, two_file_table):
    """r8: a small UPDATE commits ONE rewritten data file, not one per
    task — small-file accretion at a daily-DML cadence is what
    compaction exists to undo, so the write is sized by row count."""
    from cloudfloe_spark.sources.maintenance import update_where

    root = two_file_table
    res = update_where(
        spark, root, "id >= 7", {"v": "upper(v)"}, timestamp_ms=T1 + 1000
    )
    assert res["matched"] == 3
    snap = im.resolve_snapshot(root)
    added = [
        f for f in im.live_data_files(root, snap)
        if "/update-" in f["file_path"]
    ]
    assert len(added) == 1, [f["file_path"] for f in added]


def test_delete_by_composite_key(spark, two_file_table):
    """Multi-column equality delete (r8): a row is erased only when
    EVERY key column matches — rows sharing just one value survive."""
    from cloudfloe_spark.sources.maintenance import delete_by_key

    root = two_file_table
    # rows: (0,'a') (1,'b') ... (9,'j'). Erase exactly (1,'b') and (4,'e');
    # (1,'x') / (9,'b') shapes don't exist but the per-column values DO
    # appear in other rows — the conjunction must not erase those.
    res = delete_by_key(
        root, ["id", "v"], [(1, "b"), (4, "e"), (7, "zzz")],
        timestamp_ms=T1 + 1000,
    )
    assert res["values"] == 3
    got = _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert [tuple(r) for r in got] == [
        (0, "a"), (2, "c"), (3, "d"), (5, "f"),
        (6, "g"), (7, "h"), (8, "i"), (9, "j"),
    ]


def test_delete_by_composite_key_arity_validated(two_file_table):
    from cloudfloe_spark.sources.maintenance import delete_by_key

    with pytest.raises(ValueError, match="tuples"):
        delete_by_key(
            two_file_table, ["id", "v"], [1, 2], timestamp_ms=T1 + 1000
        )


def test_row_delta_commit_reuses_parent_manifests(spark, two_file_table):
    """Pure row-delta commits reference the parent's manifest files
    verbatim and write only the delta — O(new files) metadata writes
    (Iceberg's own append model). A second DML chains the reuse."""
    from cloudfloe_spark.sources import iceberg_meta as im

    root = two_file_table

    def mlist_paths(snap):
        root_n = im._norm_root(root)
        return [
            m["manifest_path"]
            for m in im._read_manifest(
                im._relocate(snap["manifest-list"], root_n)
            )
        ]

    s0 = im.resolve_snapshot(root)
    base_manifests = set(mlist_paths(s0))
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    s1 = im.resolve_snapshot(root)
    p1 = mlist_paths(s1)
    assert base_manifests <= set(p1)          # parent manifests reused
    assert len(set(p1) - base_manifests) == 1  # + exactly one delta manifest

    delete_where(spark, root, "id = 5", timestamp_ms=T1 + 2000)
    s2 = im.resolve_snapshot(root)
    p2 = mlist_paths(s2)
    assert set(p1) <= set(p2)
    assert len(set(p2) - set(p1)) == 1

    got = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in got] == [0, 2, 3, 4, 6, 7, 8, 9]
    # time travel through the chain still resolves
    assert _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF "
        f"{s1['snapshot-id']}",
    ) == [[9]]


def test_rewrite_position_deletes_consolidates(spark, two_file_table):
    """rewrite_position_delete_files analog: many small DML delete files
    consolidate to one sorted file without touching data files; reads
    identical before/after; time travel intact; duplicates and dangling
    coordinates dropped; per-commit CDC skips the replace."""
    from cloudfloe_spark.sources.maintenance import (
        rewrite_position_deletes,
        update_where,
    )

    root = two_file_table
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    delete_where(spark, root, "id = 7", timestamp_ms=T1 + 2000)
    delete_where(spark, root, "id <= 1", timestamp_ms=T1 + 3000)  # re-delete
    # COW update removes file 2 → its delete coordinate (id=7) dangles...
    # actually the COW rewrite drops that delete file as dangling already;
    # keep this pure-MOR: three delete files, one duplicate coordinate.
    snap = im.resolve_snapshot(root)
    pre_files = set(im.live_data_paths(root, snap))
    assert len(im.position_delete_paths(root, snap)) == 3

    pre_rows = _rows(
        spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id"
    )
    res = rewrite_position_deletes(spark, root, timestamp_ms=T1 + 4000)
    assert res["files_before"] == 3 and res["files_after"] == 1
    assert res["rows_after"] == 3  # ids 0, 1, 7 — duplicate collapsed

    snap2 = im.resolve_snapshot(root)
    assert set(im.live_data_paths(root, snap2)) == pre_files  # data untouched
    assert len(im.position_delete_paths(root, snap2)) == 1
    assert snap2["summary"]["operation"] == "replace"
    assert snap2["summary"]["removed-delete-files"] == "3"

    post_rows = _rows(
        spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert post_rows == pre_rows
    # time travel to a mid-DML snapshot still applies the OLD delete set
    snaps = sorted(
        im.load_metadata(root)["snapshots"],
        key=lambda s: s["sequence-number"],
    )
    mid = snaps[1]["snapshot-id"]  # after the first delete only
    got = _rows(
        spark,
        f"SELECT id FROM iceberg_scan('{root}') VERSION AS OF {mid} "
        "ORDER BY id",
    )
    assert [r[0] for r in got] == [0, 2, 3, 4, 5, 6, 7, 8, 9]

    # further DML composes on the consolidated layout
    res = update_where(
        spark, root, "id = 9", {"v": "'Z'"}, timestamp_ms=T1 + 5000
    )
    assert res["matched"] == 1
    got = _rows(
        spark,
        f"SELECT v FROM iceberg_scan('{root}') WHERE id = 9",
    )
    assert [r[0] for r in got] == ["Z"]


def test_rewrite_position_deletes_noop_and_empty(spark, two_file_table):
    from cloudfloe_spark.sources.maintenance import (
        rewrite_position_deletes,
    )

    root = two_file_table
    res = rewrite_position_deletes(spark, root, timestamp_ms=T1 + 1000)
    assert res == {"files_before": 0, "files_after": 0, "snapshot_id": None}


def test_rewrite_position_deletes_drops_dangling_coordinates(
    spark, two_file_table
):
    """A delete file targeting TWO data files survives a COW rewrite of
    one of them (it still targets the other) — but its coordinates into
    the removed file dangle. The delete rewrite drops exactly those."""
    from cloudfloe_spark.sources.maintenance import (
        rewrite_position_deletes,
    )

    root = two_file_table
    delete_where(spark, root, "id IN (1, 7)", timestamp_ms=T1 + 1000)
    delete_where(
        spark, root, "id = 3", timestamp_ms=T1 + 2000, mode="copy-on-write"
    )
    snap = im.resolve_snapshot(root)
    assert len(im.position_delete_paths(root, snap)) == 1  # still targets f2
    pre = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in pre] == [0, 2, 4, 5, 6, 8, 9]

    res = rewrite_position_deletes(spark, root, timestamp_ms=T1 + 3000)
    assert res["rows_after"] == 1  # only id=7's coordinate is still live
    post = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert post == pre
