"""Iceberg v3 ROW LINEAGE (r11, VERDICT r10 #5): commits assign
``first_row_id`` per data file and maintain the table's ``next-row-id``;
``iceberg_row_lineage('<root>')`` exposes ``_row_id`` (file
first_row_id + position, or the materialized ``_row_id`` column of
rewritten files); ids are STABLE ACROSS COMPACTION — the spec's whole
point — which lets ``iceberg_cdc`` track net changes across ranges that
rewrite files, where the coordinate diff is undefined."""

from __future__ import annotations

import pyarrow as pa
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.sources import iceberg_meta as im
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.maintenance import (
    compact_iceberg_table,
    delete_where,
    row_lineage_scan,
    update_where,
)

T1 = 1700000000000


def _cfg():
    return ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )


def _rows(spark, sql):
    return [tuple(r) for r in run_query(spark, sql, _cfg()).rows]


@pytest.fixture()
def lineage_table(tmp_path):
    root = str(tmp_path / "t")
    t = LocalIcebergTable(
        root,
        pa.schema([("id", pa.int64()), ("v", pa.string())]),
        row_lineage=True,
    )
    t.append_snapshot(
        [
            pa.table({"id": [0, 1, 2], "v": list("abc")}),
            pa.table({"id": [3, 4], "v": list("de")}),
        ],
        timestamp_ms=T1,
    )
    return root, t


def test_commit_assigns_first_row_ids(lineage_table):
    root, t = lineage_table
    meta = im.load_metadata(root)
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 5
    assert meta["snapshots"][-1]["first-row-id"] == 0
    snap = im.resolve_snapshot(root)
    firsts = sorted(im.first_row_ids(root, snap).values())
    assert firsts == [0, 3]  # two files, contiguous id blocks
    # a second append continues the counter and stamps the snapshot
    t.append_snapshot([pa.table({"id": [5], "v": ["f"]})], timestamp_ms=T1 + 1000)
    meta2 = im.load_metadata(root)
    assert meta2["next-row-id"] == 6
    assert meta2["snapshots"][-1]["first-row-id"] == 5


def test_row_lineage_scan_and_dml_carries_ids(spark, lineage_table):
    root, _ = lineage_table
    got = _rows(
        spark,
        f"SELECT id, _row_id FROM iceberg_row_lineage('{root}') ORDER BY id",
    )
    assert got == [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)]
    # DML: the delete retracts an id; the UPDATE carries the row's id
    # forward (the spec's preferred write behavior — the rewritten row
    # materializes its source _row_id)
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    update_where(spark, root, "id = 3", {"v": "'D'"}, timestamp_ms=T1 + 2000)
    got2 = _rows(
        spark,
        f"SELECT id, v, _row_id FROM iceberg_row_lineage('{root}') "
        "ORDER BY id",
    )
    assert got2 == [(0, "a", 0), (2, "c", 2), (3, "D", 3), (4, "e", 4)]
    # the counter still advanced by the rewritten file's record count
    # (the spec's commit rule; the unused block is just skipped ids)
    assert im.load_metadata(root)["next-row-id"] == 6


def test_row_ids_stable_across_compaction(spark, lineage_table):
    """The spec's whole point: compaction is not a logical change, so
    every surviving row keeps its id — through TWO rounds (the second
    rewrite must carry the first's materialized column forward)."""
    root, _ = lineage_table
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    update_where(spark, root, "id = 3", {"v": "'D'"}, timestamp_ms=T1 + 2000)
    before = _rows(
        spark,
        f"SELECT id, v, _row_id FROM iceberg_row_lineage('{root}') "
        "ORDER BY id",
    )
    res = compact_iceberg_table(spark, root, timestamp_ms=T1 + 3000)
    assert res["files_after"] < res["files_before"]
    after = _rows(
        spark,
        f"SELECT id, v, _row_id FROM iceberg_row_lineage('{root}') "
        "ORDER BY id",
    )
    assert after == before
    # the compacted file carries a materialized _row_id column, and the
    # NORMAL scan must not leak it
    paths = im.live_data_paths(root, im.resolve_snapshot(root))
    assert any("_row_id" in im.parquet_column_names(p) for p in paths)
    plain = run_query(spark, f"SELECT * FROM iceberg_scan('{root}')", _cfg())
    assert plain.columns == ["id", "v"]
    # round 2: DML then compact again — ids still stable (and the
    # update carried id 0 through both the rewrite and the compaction)
    update_where(spark, root, "id = 0", {"v": "'A'"}, timestamp_ms=T1 + 4000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 5000)
    final = _rows(
        spark,
        f"SELECT id, v, _row_id FROM iceberg_row_lineage('{root}') "
        "ORDER BY id",
    )
    assert final == [(0, "A", 0), (2, "c", 2), (3, "D", 3), (4, "e", 4)]


def test_cdc_by_row_id_matches_cdc_by_coordinates(spark, lineage_table):
    """The verdict's bar: on the same logical history, the row-id diff
    (used when a compaction makes coordinates undefined) emits exactly
    the changelog the coordinate diff emits — the compaction itself
    contributes nothing."""
    root, _ = lineage_table
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    update_where(spark, root, "id = 3", {"v": "'D'"}, timestamp_ms=T1 + 2000)
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    by_coords = sorted(
        _rows(spark, f"SELECT * FROM iceberg_cdc('{root}', {s0}, {s1})")
    )
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 3000)
    s2 = im.resolve_snapshot(root)["snapshot-id"]
    # compaction-only range: zero net changes
    assert _rows(spark, f"SELECT * FROM iceberg_cdc('{root}', {s1}, {s2})") == []
    # range crossing the compaction: row-id netting reproduces the
    # coordinate changelog exactly
    by_rid = sorted(
        _rows(spark, f"SELECT * FROM iceberg_cdc('{root}', {s0}, {s2})")
    )
    assert by_rid == by_coords
    assert sorted(r[2] for r in by_rid) == [
        "delete", "delete", "insert",
    ]  # id=1 delete; id=3 delete+insert
    # identifier-column pairing works across the rewrite too
    paired = _rows(
        spark,
        f"SELECT id, v, _change_type "
        f"FROM iceberg_cdc('{root}', {s0}, {s2}, 'id') ORDER BY id, v",
    )
    assert paired == [
        (1, "b", "delete"),
        (3, "D", "update_postimage"),
        (3, "d", "update_preimage"),
    ]


def test_cdc_with_dml_after_compaction_in_range(spark, lineage_table):
    """DMLs on BOTH sides of a compaction inside one range: the rewrite
    cancels, both DMLs surface."""
    root, _ = lineage_table
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    delete_where(spark, root, "id = 4", timestamp_ms=T1 + 1000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    update_where(spark, root, "id = 2", {"v": "'C'"}, timestamp_ms=T1 + 3000)
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    got = sorted(
        _rows(spark, f"SELECT * FROM iceberg_cdc('{root}', {s0}, {s1})")
    )
    assert got == [
        (2, "C", "insert"),
        (2, "c", "delete"),
        (4, "e", "delete"),
    ]


def test_cdc_compaction_without_lineage_still_refuses(spark, tmp_path):
    root = str(tmp_path / "nolineage")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64())]))
    t.append_snapshot([pa.table({"id": [1, 2, 3]})], timestamp_ms=T1)
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    from cloudfloe_spark.service.errors import CloudfloeError

    with pytest.raises(CloudfloeError) as ei:
        _rows(spark, f"SELECT * FROM iceberg_cdc('{root}', {s0}, {s1})")
    assert ei.value.status_code == 400
    assert "row lineage" in str(ei.value)


def test_row_lineage_fn_rejects_non_lineage_table(spark, tmp_path):
    root = str(tmp_path / "plain")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64())]))
    t.append_snapshot([pa.table({"id": [1]})], timestamp_ms=T1)
    from cloudfloe_spark.service.errors import CloudfloeError

    with pytest.raises(CloudfloeError) as ei:
        _rows(spark, f"SELECT * FROM iceberg_row_lineage('{root}')")
    assert ei.value.status_code == 400
    assert "no row lineage" in str(ei.value)


def test_lineage_composes_with_deletion_vectors(spark, lineage_table):
    """Lineage tables are v3, so their MOR deletes land as deletion
    vectors — the lineage scan applies them, and a DV commit only
    advances next-row-id by its NEW data files."""
    root, _ = lineage_table
    nri = im.load_metadata(root)["next-row-id"]
    delete_where(spark, root, "id IN (0, 4)", timestamp_ms=T1 + 1000)
    snap = im.resolve_snapshot(root)
    assert im.deletion_vector_records(root, snap)  # v3 MOR delete
    assert im.load_metadata(root)["next-row-id"] == nri  # no new rows
    got = _rows(
        spark,
        f"SELECT id, _row_id FROM iceberg_row_lineage('{root}') ORDER BY id",
    )
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_lineage_scan_empty_after_full_delete(spark, tmp_path):
    root = str(tmp_path / "empty")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64())]), row_lineage=True
    )
    t.append_snapshot([pa.table({"id": [1]})], timestamp_ms=T1)
    df = row_lineage_scan(spark, root)
    assert "_row_id" in df.columns and df.count() == 1


def test_lineage_composes_with_defaults_and_compaction(spark, tmp_path):
    """The r11 features composed on ONE table: row lineage + a defaulted
    column added mid-history + DV deletes + compaction. After the
    rewrite, the compacted files carry BOTH the materialized _row_id and
    the (previously filled) default values; every surviving row keeps
    its id and its logical column values; the normal scan stays clean."""
    import pyarrow as pa2

    root = str(tmp_path / "combo")
    t = LocalIcebergTable(
        root,
        pa2.schema([("id", pa2.int64()), ("v", pa2.string())]),
        row_lineage=True,
    )
    t.append_snapshot(
        [pa2.table({"id": [0, 1, 2, 3], "v": list("abcd")})],
        timestamp_ms=T1,
    )
    t.add_column("flag", pa2.int32(), timestamp_ms=T1 + 100, default=7)
    t.append_snapshot(  # post-default rows, explicit values
        [pa2.table({"id": [4, 5], "v": list("ef"), "flag": [1, 2]})],
        timestamp_ms=T1 + 200,
    )
    # condition reads the FILLED column; commits DVs (v3)
    delete_where(spark, root, "flag = 7 AND id = 1", timestamp_ms=T1 + 300)
    before = _rows(
        spark,
        f"SELECT id, v, flag, _row_id FROM iceberg_row_lineage('{root}') "
        "ORDER BY id",
    )
    assert before == [
        (0, "a", 7, 0), (2, "c", 7, 2), (3, "d", 7, 3),
        (4, "e", 1, 4), (5, "f", 2, 5),
    ]
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 400)
    after = _rows(
        spark,
        f"SELECT id, v, flag, _row_id FROM iceberg_row_lineage('{root}') "
        "ORDER BY id",
    )
    assert after == before
    # the rewritten files MATERIALIZE the default (the fill rule no
    # longer applies to them — they contain the column)
    paths = im.live_data_paths(root, im.resolve_snapshot(root))
    assert all("flag" in im.parquet_column_names(p) for p in paths)
    plain = run_query(
        spark, f"SELECT * FROM iceberg_scan('{root}')", _cfg()
    )
    assert plain.columns == ["id", "v", "flag"]
    # and the lineage CDC across the whole history (add-column + DV
    # delete + compaction in range) nets to exactly the logical change
    s_first = im.load_metadata(root)["snapshots"][0]["snapshot-id"]
    cur = im.resolve_snapshot(root)["snapshot-id"]
    changes = sorted(
        _rows(
            spark,
            f"SELECT id, v, flag, _change_type "
            f"FROM iceberg_cdc('{root}', {s_first}, {cur})",
        )
    )
    assert changes == [
        (1, "b", 7, "delete"),
        (4, "e", 1, "insert"),
        (5, "f", 2, "insert"),
    ]


def test_cdc_pairs_updates_by_row_id_identifier(spark, lineage_table):
    """'_row_id' as the identifier argument (r11): a retraction and an
    insertion carrying the same row id — the MOR update carries ids
    forward — pair as update images with NO user key columns, both
    across a rewrite (the lineage diff) and on a plain
    coordinate-consistent DML range (preimage first_row_id + position
    collides with the rewrite's carried materialized id). Non-lineage
    tables reject the identifier clearly."""
    root, _ = lineage_table
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    update_where(spark, root, "id = 3", {"v": "'D'"}, timestamp_ms=T1 + 1000)
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 2000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 3000)
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    got = sorted(
        _rows(
            spark,
            f"SELECT id, v, _change_type "
            f"FROM iceberg_cdc('{root}', {s0}, {s1}, '_row_id')",
        )
    )
    assert got == [
        (1, "b", "delete"),
        (3, "D", "update_postimage"),
        (3, "d", "update_preimage"),
    ]
    # coordinate-consistent range (no rewrite): pairing works there too
    update_where(spark, root, "id = 2", {"v": "'C'"}, timestamp_ms=T1 + 4000)
    delete_where(spark, root, "id = 4", timestamp_ms=T1 + 5000)
    s2 = im.resolve_snapshot(root)["snapshot-id"]
    got2 = sorted(
        _rows(
            spark,
            f"SELECT id, v, _change_type "
            f"FROM iceberg_cdc('{root}', {s1}, {s2}, '_row_id')",
        )
    )
    assert got2 == [
        (2, "C", "update_postimage"),
        (2, "c", "update_preimage"),
        (4, "e", "delete"),
    ]


def test_cdc_row_id_identifier_rejected_without_lineage(spark, tmp_path):
    root = str(tmp_path / "plain")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64())]))
    t.append_snapshot([pa.table({"id": [1, 2]})], timestamp_ms=T1)
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    from cloudfloe_spark.service.errors import CloudfloeError

    with pytest.raises(CloudfloeError) as ei:
        _rows(
            spark,
            f"SELECT * FROM iceberg_cdc('{root}', {s0}, {s1}, '_row_id')",
        )
    assert ei.value.status_code == 400
    assert "row-lineage" in str(ei.value) or "row lineage" in str(ei.value)


def test_cdc_cow_carryover_rows_net_out(spark, lineage_table):
    """A COW update rewrites whole files — the untouched co-located rows
    are carry-overs that must emit NOTHING in the net changelog (the
    value-multiset netting cancels them; with (rid,data)-keyed netting
    they'd only cancel if ids were preserved, which COW does too — but
    the cancellation must not DEPEND on it)."""
    root, _ = lineage_table
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    update_where(
        spark, root, "id = 1", {"v": "'B'"},
        timestamp_ms=T1 + 1000, mode="copy-on-write",
    )
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    got = sorted(
        _rows(spark, f"SELECT * FROM iceberg_cdc('{root}', {s0}, {s1})")
    )
    # ids 0 and 2 shared the rewritten file but are carry-overs
    assert got == [(1, "B", "insert"), (1, "b", "delete")]
    # COW also preserved every row's id (carry-overs AND the update)
    ids = _rows(
        spark,
        f"SELECT id, _row_id FROM iceberg_row_lineage('{root}') ORDER BY id",
    )
    assert ids == [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)]


def test_cdc_duplicate_rows_net_with_multiplicity(spark, tmp_path):
    """Value-identical rows are distinct multiset members: deleting ONE
    of two duplicates across a compaction emits exactly one delete."""
    root = str(tmp_path / "dups")
    t = LocalIcebergTable(
        root,
        pa.schema([("id", pa.int64()), ("v", pa.string())]),
        row_lineage=True,
    )
    # two VALUE-IDENTICAL rows (same id, same v) plus a bystander
    t.append_snapshot(
        [pa.table({"id": [7, 7, 8], "v": ["x", "x", "y"]})],
        timestamp_ms=T1,
    )
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    # delete exactly one duplicate by position: DV on position 0
    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_deletion_vector_snapshot,
    )

    paths = im.live_data_paths(root, im.resolve_snapshot(root))
    commit_deletion_vector_snapshot(
        root, {paths[0]: [0]}, timestamp_ms=T1 + 1000
    )
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    got = sorted(
        _rows(spark, f"SELECT * FROM iceberg_cdc('{root}', {s0}, {s1})")
    )
    assert got == [(7, "x", "delete")]  # exactly ONE, not zero, not two
    left = _rows(
        spark, f"SELECT id, v FROM iceberg_scan('{root}') ORDER BY id"
    )
    assert left == [(7, "x"), (8, "y")]


def test_merge_carries_ids_and_inserts_get_fresh(spark, lineage_table):
    from cloudfloe_spark.sources.maintenance import merge_into

    root, _ = lineage_table
    src = spark.createDataFrame(
        [(2, "CC"), (9, "new")], "id LONG, v STRING"
    )
    res = merge_into(
        spark, root, src, "id", when_matched={"v": "s.v"},
        timestamp_ms=T1 + 1000,
    )
    assert res["matched"] == 1 and res["inserted"] == 1
    got = _rows(
        spark,
        f"SELECT id, v, _row_id FROM iceberg_row_lineage('{root}') "
        "ORDER BY id",
    )
    # id=2 kept rid 2 through the merge rewrite; id=9 got a fresh id
    # from the new file's first_row_id block
    assert (2, "CC", 2) in got
    new_rid = [r[2] for r in got if r[0] == 9][0]
    assert new_rid >= 5
    assert len({r[2] for r in got}) == len(got)  # ids unique


def test_row_lineage_scan_plan_broadcast_no_row_shuffle(
    spark, lineage_table
):
    """Plan audit: the lineage scan's id resolution is a BROADCAST map
    join against per-file coordinates — zero exchanges of table rows
    (the only acceptable cost of exposing _row_id at 100 TB)."""
    from cloudfloe_spark.plans import has_broadcast_join, shuffle_count

    from cloudfloe_spark.plans import executed_plan

    root, _ = lineage_table
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    # pre-compaction: manifest first_row_ids resolve through a broadcast
    # LEFT OUTER map join; the only exchange in the plan is the
    # DELETE-SET-sized distinct inside the DV apply — table rows never
    # shuffle (scan → broadcast anti-join → broadcast outer → project)
    df_pre = row_lineage_scan(spark, root)
    assert has_broadcast_join(df_pre)
    assert shuffle_count(df_pre) <= 1, executed_plan(df_pre)
    assert "BroadcastHashJoin LeftOuter" in executed_plan(df_pre)
    assert df_pre.count() == 4
    # post-compaction: every file materializes _row_id — the map join
    # disappears entirely (still zero exchanges)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    df_post = row_lineage_scan(spark, root)
    assert shuffle_count(df_post) == 0
    assert df_post.count() == 4


def test_cdc_lineage_netting_single_shuffle(spark, lineage_table):
    """Plan audit: the rewritten-set diff is ONE value-keyed exchange
    (the netting groupBy, with map-side partial aggregation); the rid
    map joins broadcast."""
    from cloudfloe_spark.plans import executed_plan, shuffle_count
    from cloudfloe_spark.service.iceberg_local import _cdc_frame
    from cloudfloe_spark.sources.tables import ensure_runtime_conf

    root, _ = lineage_table
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    sess = spark.newSession()
    ensure_runtime_conf(sess)
    df = _cdc_frame(sess, root, str(s0), str(s1))
    # one exchange for the netting groupBy; anything table-joined rides
    # broadcasts (AQE may add a read-side coalesce, not a new exchange)
    assert shuffle_count(df) <= 2, executed_plan(df)
    plan = executed_plan(df)
    assert "partial" in plan.lower()  # map-side combine on the netting
    assert df.count() == 1  # the one delete


def test_cdc_equality_delete_folded_by_compaction(spark, lineage_table):
    """An EQUALITY delete in range, folded away by a later compaction in
    the same range: the eq-deleted rows were visible at FROM in the
    rewritten files and absent from the compaction's outputs — the value
    netting emits exactly them as deletes, with no equality machinery
    involved."""
    from cloudfloe_spark.sources.maintenance import delete_by_key

    root, _ = lineage_table
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    delete_by_key(root, "id", [1, 4], timestamp_ms=T1 + 1000)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    snap = im.resolve_snapshot(root)
    assert not im.equality_delete_records(root, snap)  # folded
    s1 = snap["snapshot-id"]
    got = sorted(
        _rows(spark, f"SELECT * FROM iceberg_cdc('{root}', {s0}, {s1})")
    )
    assert got == [(1, "b", "delete"), (4, "e", "delete")]
    left = _rows(spark, f"SELECT id FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in left] == [0, 2, 3]


def test_row_lineage_time_travel(spark, lineage_table):
    """``iceberg_row_lineage(...) VERSION AS OF n`` pins the snapshot —
    the historical id assignment is readable after later DML and even
    after a compaction rewrote the files it names."""
    root, _ = lineage_table
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    update_where(spark, root, "id = 3", {"v": "'D'"}, timestamp_ms=T1 + 2000)
    tt = _rows(
        spark,
        f"SELECT id, v, _row_id FROM iceberg_row_lineage('{root}') "
        f"VERSION AS OF {s0} ORDER BY id",
    )
    assert tt == [
        (0, "a", 0), (1, "b", 1), (2, "c", 2), (3, "d", 3), (4, "e", 4),
    ]
    cur = _rows(
        spark,
        f"SELECT id, v, _row_id FROM iceberg_row_lineage('{root}') "
        "ORDER BY id",
    )
    assert cur == [(0, "a", 0), (2, "c", 2), (3, "D", 3), (4, "e", 4)]


def test_external_rewrite_commits_stamp_lineage(spark, lineage_table):
    """ADVICE r11 (low): the EXTERNAL rewrite commits are v3-conformant
    on lineage tables — compaction's added files receive fresh assigned
    id ranges (readers still prefer the materialized ``_row_id`` per
    row) and the snapshot carries ``first-row-id``/``assigned-rows``;
    manifest rewrite adds no rows and stamps a zero-width block."""
    root, t = lineage_table
    delete_where(spark, root, "id = 1", timestamp_ms=T1 + 1000)
    nri = im.load_metadata(root)["next-row-id"]
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    meta = im.load_metadata(root)
    snap = meta["snapshots"][-1]
    assert snap["first-row-id"] == nri
    assigned = int(snap["summary"]["assigned-rows"])
    assert assigned > 0
    assert meta["next-row-id"] == nri + assigned
    # every live data file now carries a manifest first_row_id
    firsts = im.first_row_ids(root, im.resolve_snapshot(root))
    assert firsts and all(v is not None for v in firsts.values())
    # the materialized column still wins: ids are the PRE-compaction ones
    got = sorted(
        tuple(r)
        for r in row_lineage_scan(spark, root).select("_row_id", "id")
        .collect()
    )
    assert got == [(0, 0), (2, 2), (3, 3), (4, 4)]
    # manifest rewrite: zero assigned rows, still stamped
    from cloudfloe_spark.sources.maintenance import rewrite_manifests

    rewrite_manifests(root, timestamp_ms=T1 + 3000)
    meta2 = im.load_metadata(root)
    snap2 = meta2["snapshots"][-1]
    assert snap2["first-row-id"] == meta2["next-row-id"] == nri + assigned
    assert snap2["summary"]["assigned-rows"] == "0"
    got2 = sorted(
        tuple(r)
        for r in row_lineage_scan(spark, root).select("_row_id", "id")
        .collect()
    )
    assert got2 == got


def test_cdc_row_id_on_nonlineage_table_with_added_files(spark, tmp_path):
    """ADVICE r11 (low): '_row_id' pairing on a NON-lineage table whose
    range added files must surface the precise 'requires a row-lineage
    table' message, not the misleading 'lineage is incomplete' one."""
    root = str(tmp_path / "plain")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64())]))
    t.append_snapshot([pa.table({"id": [1, 2]})], timestamp_ms=T1)
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    t.append_snapshot([pa.table({"id": [3]})], timestamp_ms=T1 + 1000)
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    from cloudfloe_spark.service.errors import CloudfloeError

    with pytest.raises(CloudfloeError) as ei:
        _rows(
            spark,
            f"SELECT * FROM iceberg_cdc('{root}', {s0}, {s1}, '_row_id')",
        )
    assert ei.value.status_code == 400
    assert "requires a row-lineage table" in str(ei.value)
    assert "incomplete" not in str(ei.value)


# ---------------------------------------------------------------------------
# _last_updated_sequence_number (r12, VERDICT r11 #2) — the second of the
# v3 row-lineage spec's two inherited metadata columns: the data sequence
# number of the commit that last CHANGED the row. Inherited from the
# file's data sequence number unless a change-free rewrite (compaction,
# COW carry-over) materialized the pre-rewrite value.
# ---------------------------------------------------------------------------


def _lineage_rows(spark, root, **kw):
    return sorted(
        (r["id"], r["_row_id"], r["_last_updated_sequence_number"])
        for r in row_lineage_scan(spark, root, **kw).collect()
    )


def test_last_updated_seq_fresh_rows_inherit_commit_seq(
    spark, lineage_table
):
    root, t = lineage_table
    assert _lineage_rows(spark, root) == [
        (0, 0, 1), (1, 1, 1), (2, 2, 1), (3, 3, 1), (4, 4, 1),
    ]
    # a second append's rows inherit THAT commit's sequence
    t.append_snapshot([pa.table({"id": [5], "v": ["f"]})], timestamp_ms=T1 + 1000)
    assert _lineage_rows(spark, root)[-1] == (5, 5, 2)


def test_last_updated_seq_mor_update_bumps_touched_only(
    spark, lineage_table
):
    root, _ = lineage_table
    update_where(spark, root, "id IN (1, 3)", {"v": "'X'"}, timestamp_ms=T1 + 1000)
    assert _lineage_rows(spark, root) == [
        (0, 0, 1), (1, 1, 2), (2, 2, 1), (3, 3, 2), (4, 4, 1),
    ]
    # a MOR delete (deletion vector) does not touch survivors' seq
    delete_where(spark, root, "id = 0", timestamp_ms=T1 + 2000)
    assert _lineage_rows(spark, root) == [
        (1, 1, 2), (2, 2, 1), (3, 3, 2), (4, 4, 1),
    ]


def test_last_updated_seq_preserved_across_compaction(spark, lineage_table):
    """Compaction is not a logical change: rewritten rows keep their
    pre-rewrite last-updated sequence via the materialized column, even
    though the rewritten file's own data sequence is higher."""
    root, _ = lineage_table
    update_where(spark, root, "id = 2", {"v": "'Z'"}, timestamp_ms=T1 + 1000)
    before = _lineage_rows(spark, root)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)
    assert _lineage_rows(spark, root) == before
    # the compacted file carries BOTH materialized lineage columns
    snap = im.resolve_snapshot(root)
    for p in im.live_data_paths(root, snap):
        cols = im.parquet_column_names(p)
        assert "_row_id" in cols
        assert "_last_updated_sequence_number" in cols
    # and a second compaction still preserves (materialized col wins)
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 3000)
    assert _lineage_rows(spark, root) == before


def test_last_updated_seq_cow_update_and_delete_carry(spark, lineage_table):
    """COW rewrites: matched rows inherit the new commit's sequence;
    co-located carried rows and COW-delete survivors MATERIALIZE their
    source value."""
    root, _ = lineage_table
    update_where(
        spark, root, "id = 1", {"v": "'U'"},
        timestamp_ms=T1 + 1000, mode="copy-on-write",
    )
    assert _lineage_rows(spark, root) == [
        (0, 0, 1), (1, 1, 2), (2, 2, 1), (3, 3, 1), (4, 4, 1),
    ]
    delete_where(
        spark, root, "id = 0", timestamp_ms=T1 + 2000, mode="copy-on-write"
    )
    # survivors keep their values — including the carried id=1 bump
    assert _lineage_rows(spark, root) == [
        (1, 1, 2), (2, 2, 1), (3, 3, 1), (4, 4, 1),
    ]


def test_last_updated_seq_merge_paths(spark, lineage_table):
    from cloudfloe_spark.sources.maintenance import merge_into

    root, _ = lineage_table
    # MOR merge: matched rewrites + an insert both land at commit seq 2
    src = spark.createDataFrame([(1, "m"), (9, "n")], "id BIGINT, v STRING")
    merge_into(
        spark, root, src, on="id", when_matched={"v": "s.v"},
        timestamp_ms=T1 + 1000,
    )
    rows = _lineage_rows(spark, root)
    assert [(i, s) for i, _, s in rows] == [
        (0, 1), (1, 2), (2, 1), (3, 1), (4, 1), (9, 2),
    ]
    # COW merge: matched row bumps, co-located rows carry, insert fresh
    src2 = spark.createDataFrame([(2, "c"), (10, "i")], "id BIGINT, v STRING")
    merge_into(
        spark, root, src2, on="id", when_matched={"v": "s.v"},
        timestamp_ms=T1 + 2000, mode="copy-on-write",
    )
    rows = _lineage_rows(spark, root)
    assert [(i, s) for i, _, s in rows] == [
        (0, 1), (1, 2), (2, 3), (3, 1), (4, 1), (9, 2), (10, 3),
    ]


def test_last_updated_seq_through_service_view(spark, lineage_table):
    """``iceberg_row_lineage('<root>')`` exposes the column; VERSION AS
    OF reconstructs the HISTORICAL values from the pinned snapshot."""
    root, _ = lineage_table
    s0 = im.resolve_snapshot(root)["snapshot-id"]
    update_where(spark, root, "id = 4", {"v": "'W'"}, timestamp_ms=T1 + 1000)
    got = _rows(
        spark,
        "SELECT id, _row_id, _last_updated_sequence_number "
        f"FROM iceberg_row_lineage('{root}') ORDER BY id",
    )
    assert got == [
        (0, 0, 1), (1, 1, 1), (2, 2, 1), (3, 3, 1), (4, 4, 2),
    ]
    tt = _rows(
        spark,
        "SELECT id, _last_updated_sequence_number "
        f"FROM iceberg_row_lineage('{root}') VERSION AS OF {s0} "
        "ORDER BY id",
    )
    assert tt == [(0, 1), (1, 1), (2, 1), (3, 1), (4, 1)]


def test_last_updated_seq_empty_table_schema(spark, tmp_path):
    """Zero live data files (a COW delete of everything): the empty
    frame still carries BOTH lineage columns."""
    root = str(tmp_path / "empty")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64())]), row_lineage=True
    )
    t.append_snapshot([pa.table({"id": [1]})], timestamp_ms=T1)
    delete_where(
        spark, root, "id = 1", timestamp_ms=T1 + 1000, mode="copy-on-write"
    )
    df = row_lineage_scan(spark, root)
    assert "_last_updated_sequence_number" in df.columns
    assert "_row_id" in df.columns
    assert df.count() == 0


def test_binpack_preserves_row_ids_and_sequences(spark, tmp_path):
    """r13 regression: compact_small_files on a lineage table must
    MATERIALIZE the source _row_id / _last_updated_sequence_number into
    the consolidated files — previously the new files committed with
    fresh first_row_ids, silently reassigning every compacted row's
    id."""
    from cloudfloe_spark.sources.maintenance import compact_small_files

    root = str(tmp_path / "bp")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64())]), row_lineage=True
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2]}), pa.table({"id": [3, 4]})],
        timestamp_ms=T1,
    )
    sql = (
        "SELECT id, _row_id, _last_updated_sequence_number "
        f"FROM iceberg_row_lineage('{root}') ORDER BY id"
    )
    before = _rows(spark, sql)
    r = compact_small_files(
        spark, root, timestamp_ms=T1 + 1000, min_files=2
    )
    assert r["files_rewritten"] == 2
    assert _rows(spark, sql) == before
