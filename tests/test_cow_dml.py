"""Copy-on-write DML (``mode="copy-on-write"``): DELETE/UPDATE rewrite
exactly the data files containing matches and commit them as removed +
replacements — Iceberg's ``write.delete.mode=copy-on-write`` twin of the
merge-on-read path. The table stays delete-file-free (reads pay no
anti-join; engines without delete support — the reference's own guard,
``backend/main.py:398-414`` — keep working), at the cost of write
amplification bounded by the affected files.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.sources import iceberg_meta as im
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.maintenance import delete_where, update_where

T1 = 1700000000000


def _cfg():
    return ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )


def _rows(spark, sql):
    return run_query(spark, sql, _cfg()).rows


def _has_deletes(spark, root):
    agg = _rows(
        spark,
        f"""SELECT BOOL_OR(manifest_content <> 'DATA') AS has_deletes
            FROM iceberg_metadata('{root}')""",
    )
    return bool(agg and agg[0][0])


@pytest.fixture()
def three_file_table(tmp_path):
    """Three data files with disjoint id ranges — exact bounds in the
    manifests, so a DML condition on one range prunes to one file."""
    root = str(tmp_path / "tcow")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [
            pa.table({"id": list(range(0, 5)), "v": list("abcde")}),
            pa.table({"id": list(range(5, 10)), "v": list("fghij")}),
            pa.table({"id": list(range(10, 15)), "v": list("klmno")}),
        ],
        timestamp_ms=T1,
    )
    return root


def test_cow_delete_rewrites_only_affected_files(spark, three_file_table):
    root = three_file_table
    pre = set(im.live_data_paths(root, im.resolve_snapshot(root)))
    s1 = im.resolve_snapshot(root)["snapshot-id"]

    res = delete_where(
        spark, root, "id IN (6, 8)", timestamp_ms=T1 + 1000,
        mode="copy-on-write",
    )
    assert res["matched"] == 2
    assert res["files_rewritten"] == 1
    assert res["delete_files"] == []
    # bounds-pruned scan: only the [5,9] file was a candidate
    assert res["files_scanned"] == 1 and res["files_total"] == 3

    got = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in got] == [0, 1, 2, 3, 4, 5, 7, 9, 10, 11, 12, 13, 14]

    # no delete files, ever — that's the point of copy-on-write
    assert not _has_deletes(spark, root)

    # untouched files carried verbatim; the affected one replaced
    post = set(im.live_data_paths(root, im.resolve_snapshot(root)))
    assert len(pre & post) == 2
    assert len(post - pre) >= 1

    # summary records the partial rewrite
    snap = im.resolve_snapshot(root)
    assert snap["summary"]["operation"] == "overwrite"
    assert snap["summary"]["deleted-data-files"] == "1"

    # time travel to the pre-DML snapshot still shows every row
    old = _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF {s1}",
    )
    assert old == [[15]]


def test_cow_delete_can_empty_a_file(spark, three_file_table):
    root = three_file_table
    res = delete_where(
        spark, root, "id >= 10", timestamp_ms=T1 + 1000,
        mode="copy-on-write",
    )
    assert res["matched"] == 5 and res["files_rewritten"] == 1
    got = _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')")
    assert got == [[10]]
    snap = im.resolve_snapshot(root)
    # nothing survived the affected file: a pure delete commit
    assert snap["summary"]["operation"] == "delete"


def test_cow_update_applies_assignments_old_values(spark, three_file_table):
    root = three_file_table
    res = update_where(
        spark, root, "id BETWEEN 5 AND 7",
        {"id": "id + 100", "v": "concat(v, '!')"},
        timestamp_ms=T1 + 1000, mode="copy-on-write",
    )
    assert res["matched"] == 3 and res["files_rewritten"] == 1
    assert not _has_deletes(spark, root)
    got = _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert [tuple(r) for r in got] == [
        (0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e"),
        (8, "i"), (9, "j"), (10, "k"), (11, "l"), (12, "m"),
        (13, "n"), (14, "o"), (105, "f!"), (106, "g!"), (107, "h!"),
    ]


def test_cow_null_condition_keeps_rows(spark, tmp_path):
    """Rows where the condition evaluates NULL are kept — parity with the
    merge-on-read path's matched-rows-only semantics."""
    root = str(tmp_path / "tnull")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("n", pa.int64())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2, 3], "n": pa.array([10, None, 30], pa.int64())})],
        timestamp_ms=T1,
    )
    res = delete_where(
        spark, root, "n > 20", timestamp_ms=T1 + 1000, mode="copy-on-write"
    )
    assert res["matched"] == 1
    got = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in got] == [1, 2]


def test_cow_update_after_mor_delete_no_resurrection(spark, three_file_table):
    """A COW rewrite of a file carrying merge-on-read deletes must apply
    them (the rewrite reads MOR-applied rows) — and the rewritten file
    then needs no delete files at all."""
    root = three_file_table
    delete_where(spark, root, "id = 6", timestamp_ms=T1 + 1000)
    assert _has_deletes(spark, root)
    res = update_where(
        spark, root, "id BETWEEN 5 AND 9", {"v": "upper(v)"},
        timestamp_ms=T1 + 2000, mode="copy-on-write",
    )
    assert res["matched"] == 4  # id=6 already gone
    got = _rows(
        spark,
        f"SELECT id, v FROM iceberg_scan('{root}') WHERE id BETWEEN 5 AND 9 "
        "ORDER BY id",
    )
    assert [tuple(r) for r in got] == [(5, "F"), (7, "H"), (8, "I"), (9, "J")]
    assert [r[0] for r in _rows(
        spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id"
    )] == [0, 1, 2, 3, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14]
    # the MOR delete file targeted ONLY the rewritten (removed) file, so
    # the COW commit drops it as dangling — the table is live-delete-free
    # again without a compaction
    snap = im.resolve_snapshot(root)
    assert im.position_delete_paths(root, snap) == []


def test_cow_partitioned_table_keeps_tuples(spark, tmp_path):
    root = str(tmp_path / "tpart")
    t = LocalIcebergTable(
        root,
        pa.schema([("id", pa.int64()), ("lang", pa.string()), ("n", pa.int64())]),
        partition_by=[("lang", "identity")],
    )
    t.append_snapshot(
        [
            pa.table({"id": [1, 2], "lang": ["en", "en"], "n": [10, 20]}),
            pa.table({"id": [3, 4], "lang": ["de", "de"], "n": [30, 40]}),
        ],
        timestamp_ms=T1,
    )
    res = update_where(
        spark, root, "lang = 'en' AND id = 1", {"n": "n + 1"},
        timestamp_ms=T1 + 1000, mode="copy-on-write",
    )
    assert res["matched"] == 1 and res["files_rewritten"] == 1
    snap = im.resolve_snapshot(root)
    parts = im.live_data_partitions(root, snap)
    assert parts and all(pv is not None for pv in parts.values()), parts
    assert sorted(pv["lang"] for pv in parts.values()) == ["de", "en"]
    got = _rows(spark, f"SELECT id, n FROM iceberg_scan('{root}') ORDER BY id")
    assert [tuple(r) for r in got] == [(1, 11), (2, 20), (3, 30), (4, 40)]
    # post-COW partition pruning still works: de-only DML scans one file
    res2 = delete_where(spark, root, "lang = 'de'", timestamp_ms=T1 + 2000)
    assert res2["files_scanned"] == 1 and res2["files_total"] == 2
    assert res2["matched"] == 2


def test_cow_no_match_commits_nothing(spark, three_file_table):
    root = three_file_table
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    res = delete_where(
        spark, root, "id = 999", timestamp_ms=T1 + 1000, mode="copy-on-write"
    )
    assert res["matched"] == 0 and res["snapshot_id"] is None
    assert im.resolve_snapshot(root)["snapshot-id"] == s1


def test_cow_unknown_mode_rejected(spark, three_file_table):
    with pytest.raises(ValueError, match="unknown mode"):
        delete_where(
            spark, three_file_table, "id = 1", timestamp_ms=T1 + 1000,
            mode="lazy",
        )


def test_removed_files_must_name_live_files(three_file_table):
    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )

    with pytest.raises(ValueError, match="no live data file"):
        commit_row_delta_snapshot(
            three_file_table,
            removed_data_files=["/nowhere/data/ghost.parquet"],
            timestamp_ms=T1 + 1000,
        )


def test_cow_merge_upsert(spark, three_file_table):
    """merge_into mode='copy-on-write': matched rows' files are rewritten
    with the source values applied, inserts append, no delete files —
    one atomic commit."""
    from cloudfloe_spark.sources.maintenance import merge_into

    root = three_file_table
    src = spark.createDataFrame(
        [(6, "G!"), (99, "new")], "id LONG, v STRING"
    )
    res = merge_into(
        spark, root, src, "id", when_matched={"v": "s.v"},
        timestamp_ms=T1 + 1000, mode="copy-on-write",
    )
    assert res["matched"] == 1 and res["inserted"] == 1
    assert res["files_rewritten"] == 1
    assert not _has_deletes(spark, root)
    got = _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert (6, "G!") in [tuple(r) for r in got]
    assert (99, "new") in [tuple(r) for r in got]
    assert len(got) == 16
    # untouched rows of the rewritten file carried through
    assert (5, "f") in [tuple(r) for r in got]
    snap = im.resolve_snapshot(root)
    assert snap["summary"]["operation"] == "overwrite"


def test_cow_merge_insert_only_commits_append(spark, three_file_table):
    from cloudfloe_spark.sources.maintenance import merge_into

    root = three_file_table
    pre = set(im.live_data_paths(root, im.resolve_snapshot(root)))
    src = spark.createDataFrame([(50, "x")], "id LONG, v STRING")
    res = merge_into(
        spark, root, src, "id", when_matched={"v": "s.v"},
        timestamp_ms=T1 + 1000, mode="copy-on-write",
    )
    assert res["matched"] == 0 and res["inserted"] == 1
    assert res["files_rewritten"] == 0
    post = set(im.live_data_paths(root, im.resolve_snapshot(root)))
    assert pre < post  # pure append: nothing removed
    snap = im.resolve_snapshot(root)
    assert snap["summary"]["operation"] == "append"


def test_cow_merge_cardinality_guard(spark, three_file_table):
    from cloudfloe_spark.sources.maintenance import (
        MergeCardinalityError,
        merge_into,
    )

    root = three_file_table
    src = spark.createDataFrame(
        [(6, "x"), (6, "y")], "id LONG, v STRING"
    )
    with pytest.raises(MergeCardinalityError):
        merge_into(
            spark, root, src, "id", when_matched={"v": "s.v"},
            timestamp_ms=T1 + 1000, mode="copy-on-write",
        )


def test_cow_passes_scan_only_what_they_must(spark, three_file_table, monkeypatch):
    """Structural pin of the two-pass COW shape: with an UNPRUNABLE
    condition, pass 1 scans every candidate file once (match discovery),
    and pass 2 re-reads ONLY the files that contained matches — the
    unaffected file is never read twice and never rewritten."""
    from collections import Counter

    from pyspark.sql.readwriter import DataFrameReader

    root = three_file_table
    calls: list[tuple[str, ...]] = []
    orig = DataFrameReader.parquet

    def spy(self, *paths, **kw):
        calls.append(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    # id % 7 = 6 → ids 6 and 13: files 2 and 3 affected, file 1 clean;
    # the modulo isn't conjunct-extractable, so nothing prunes pass 1
    res = delete_where(
        spark, root, "id % 7 = 6", timestamp_ms=T1 + 1000,
        mode="copy-on-write",
    )
    assert res["matched"] == 2 and res["files_rewritten"] == 2
    assert res["files_scanned"] == 3
    cnt = Counter(
        p.rsplit("/data/", 1)[-1]
        for ps in calls
        for p in ps
        if "/data/" in p and "/cow-" not in p
    )
    reads = sorted(cnt.values())
    assert reads == [1, 2, 2], cnt  # clean file once, affected twice


# --- branch-targeted DML (write-audit-publish on row-level changes) --------


def test_branch_dml_stages_then_publishes(spark, three_file_table):
    """delete_where/update_where/merge_into on a BRANCH: main readers are
    unaffected while the branch accumulates DML; VERSION AS OF '<ref>'
    audits it; fast-forward publish lands the whole staged chain."""
    from cloudfloe_spark.sources.iceberg_fixture import publish_ref, set_ref
    from cloudfloe_spark.sources.maintenance import merge_into

    root = three_file_table
    set_ref(
        root, "audit",
        im.resolve_snapshot(root)["snapshot-id"],
        ref_type="branch", timestamp_ms=T1 + 500,
    )
    res = delete_where(
        spark, root, "id = 6", timestamp_ms=T1 + 1000, ref="audit"
    )
    assert res["matched"] == 1
    res = update_where(
        spark, root, "id = 5", {"v": "'F'"},
        timestamp_ms=T1 + 2000, ref="audit",
    )
    assert res["matched"] == 1
    src = spark.createDataFrame([(99, "new")], "id LONG, v STRING")
    res = merge_into(
        spark, root, src, "id", when_matched={"v": "s.v"},
        timestamp_ms=T1 + 3000, ref="audit",
    )
    assert res["inserted"] == 1

    # main is untouched: 15 original rows
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[15]]
    # the branch shows all three staged changes
    branch = _rows(
        spark,
        f"SELECT id, v FROM iceberg_scan('{root}') VERSION AS OF 'audit' "
        "ORDER BY id",
    )
    ids = [r[0] for r in branch]
    assert 6 not in ids and 99 in ids
    assert (5, "F") in [tuple(r) for r in branch]
    assert len(branch) == 15  # 15 - 1 deleted + 1 inserted

    publish_ref(root, "audit", timestamp_ms=T1 + 4000)
    main = _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert [tuple(r) for r in main] == [tuple(r) for r in branch]


def test_branch_dml_cow_mode(spark, three_file_table):
    from cloudfloe_spark.sources.iceberg_fixture import set_ref

    root = three_file_table
    set_ref(
        root, "b1", im.resolve_snapshot(root)["snapshot-id"],
        ref_type="branch", timestamp_ms=T1 + 500,
    )
    res = delete_where(
        spark, root, "id = 6", timestamp_ms=T1 + 1000,
        ref="b1", mode="copy-on-write",
    )
    assert res["matched"] == 1 and res["files_rewritten"] == 1
    assert _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')") == [[15]]
    b = _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF 'b1'",
    )
    assert b == [[14]]


def test_branch_dml_unknown_or_tag_ref_rejected(spark, three_file_table):
    from cloudfloe_spark.sources.iceberg_fixture import set_ref

    root = three_file_table
    with pytest.raises(ValueError, match="unknown ref"):
        delete_where(
            spark, root, "id = 1", timestamp_ms=T1 + 1000, ref="ghost"
        )
    set_ref(
        root, "v1", im.resolve_snapshot(root)["snapshot-id"],
        ref_type="tag", timestamp_ms=T1 + 500,
    )
    with pytest.raises(ValueError, match="tag"):
        delete_where(
            spark, root, "id = 1", timestamp_ms=T1 + 1000, ref="v1"
        )
