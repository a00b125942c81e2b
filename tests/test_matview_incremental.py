"""Incremental materialized-view refresh (r9 — VERDICT r08 #1): when a
matview's SQL is a projection/filter or per-key aggregate over ONE base
table, ``refresh_materialized_view`` applies ``iceberg_cdc(base,
recorded_snapshot, current)`` deltas to the target instead of
re-materializing — one small DML on the base costs delta-sized refresh
work, never a view recompute. Unsupported shapes fall back to full
refresh, and the result records which path ran.

Reference parity: the reference has no view surface at all; this composes
the engine's own CDC (r7) and matview (r8) surfaces, the direction
Iceberg's materialized-view spec work points at.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.iceberg_views import (
    create_iceberg_view,
    incremental_shape,
    materialize_iceberg_view,
    materialized_view_status,
    refresh_materialized_view,
    replace_iceberg_view,
)
from cloudfloe_spark.sources.maintenance import (
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


@pytest.fixture()
def base(tmp_path):
    """Three data files so delta-only-read pins are meaningful."""
    root = str(tmp_path / "base")
    t = LocalIcebergTable(
        root,
        pa.schema(
            [("id", pa.int64()), ("lang", pa.string()), ("n", pa.int64())]
        ),
    )
    t.append_snapshot(
        [
            pa.table({"id": [1, 2, 3], "lang": ["en", "en", "de"],
                      "n": [100, 150, 50]}),
            pa.table({"id": [4, 5, 6], "lang": ["de", "fr", "fr"],
                      "n": [200, 250, 300]}),
            pa.table({"id": [7, 8, 9], "lang": ["en", "de", "fr"],
                      "n": [120, 80, 400]}),
        ],
        timestamp_ms=T1,
    )
    return root


def test_agg_view_refreshes_incrementally(spark, base, tmp_path):
    """Per-lang aggregate: a point DELETE refreshes via touched-group
    recompute — result identical to a full recompute, target fresh."""
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n_docs, SUM(n) AS sum_n "
        f"FROM iceberg_scan('{base}') GROUP BY lang",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    delete_where(spark, base, "id = 5", timestamp_ms=T1 + 3000)  # one fr row
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "incremental-agg"
    assert res["snapshot_id"] is not None
    got = _rows(
        spark,
        f"SELECT lang, n_docs, sum_n FROM iceberg_scan('{troot}') "
        "ORDER BY lang",
    )
    assert got == [("de", 3, 330), ("en", 3, 370), ("fr", 2, 700)]
    assert materialized_view_status(troot)["stale"] is False


def test_agg_group_extinction_and_migration(spark, base, tmp_path):
    """An UPDATE that MOVES a row between groups touches both groups;
    deleting a group's last row retracts the group entirely."""
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n_docs FROM iceberg_scan('{base}') "
        "GROUP BY lang",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    # migrate id=3 (de → fr), then delete ALL remaining de rows
    update_where(
        spark, base, "id = 3", {"lang": "'fr'"}, timestamp_ms=T1 + 3000
    )
    delete_where(spark, base, "lang = 'de'", timestamp_ms=T1 + 4000)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 5000
    )
    assert res["path"] == "incremental-agg"
    got = _rows(
        spark, f"SELECT lang, n_docs FROM iceberg_scan('{troot}') "
        "ORDER BY lang"
    )
    assert got == [("en", 3), ("fr", 4)]  # de extinct, fr gained id=3


def test_row_view_refreshes_incrementally_with_filter_crossing(
    spark, base, tmp_path
):
    """Projection/filter view keyed on id: an update can move a row INTO
    or OUT OF the view's WHERE slice — the delta transform must retract
    the leaver and insert the joiner."""
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT id, lang, n FROM iceberg_scan('{base}') WHERE n >= 100",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 2000, key_cols=["id"]
    )
    # id=1 leaves the slice (100 → 10); id=3 joins it (50 → 500)
    update_where(spark, base, "id = 1", {"n": "10"}, timestamp_ms=T1 + 3000)
    update_where(spark, base, "id = 3", {"n": "500"}, timestamp_ms=T1 + 4000)
    delete_where(spark, base, "id = 9", timestamp_ms=T1 + 5000)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 6000
    )
    assert res["path"] == "incremental-row"
    got = _rows(
        spark, f"SELECT id, n FROM iceberg_scan('{troot}') ORDER BY id"
    )
    assert got == [(2, 150), (3, 500), (4, 200), (5, 250), (6, 300),
                   (7, 120)]
    assert materialized_view_status(troot)["stale"] is False


def test_incremental_equals_full_refresh(spark, base, tmp_path):
    """Differential: the incremental target must equal a target refreshed
    with allow_incremental=False after the same mixed DML script."""
    vroot = str(tmp_path / "v")
    t_inc, t_full = str(tmp_path / "mv_inc"), str(tmp_path / "mv_full")
    create_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n_docs, SUM(n) AS sum_n "
        f"FROM iceberg_scan('{base}') WHERE n < 400 GROUP BY lang",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(spark, vroot, t_inc, timestamp_ms=T1 + 2000)
    materialize_iceberg_view(spark, vroot, t_full, timestamp_ms=T1 + 2001)
    delete_where(spark, base, "n <= 80", timestamp_ms=T1 + 3000)
    update_where(
        spark, base, "id IN (2, 9)", {"n": "n - 50"}, timestamp_ms=T1 + 4000
    )
    r1 = refresh_materialized_view(spark, vroot, t_inc,
                                   timestamp_ms=T1 + 5000)
    r2 = refresh_materialized_view(spark, vroot, t_full,
                                   timestamp_ms=T1 + 5001,
                                   allow_incremental=False)
    assert r1["path"] == "incremental-agg" and r2["path"] == "full"
    q = "SELECT lang, n_docs, sum_n FROM iceberg_scan('{}') ORDER BY lang"
    assert _rows(spark, q.format(t_inc)) == _rows(spark, q.format(t_full))


def test_row_refresh_reads_only_delta_base_files(
    spark, base, tmp_path, monkeypatch
):
    """The 'read only delta files' pin (plan-spy style): a 1-row DELETE on
    a 3-file base must not read the base's untouched data files during an
    incremental row refresh — only the delete-referenced file (CDC
    retraction side) plus target files."""
    from pyspark.sql.readwriter import DataFrameReader

    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT id, lang, n FROM iceberg_scan('{base}')",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 2000, key_cols=["id"]
    )
    delete_where(spark, base, "id = 5", timestamp_ms=T1 + 3000)

    calls: list[tuple[str, ...]] = []
    orig = DataFrameReader.parquet

    def spy(self, *paths, **kw):
        calls.append(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "incremental-row"
    base_data_scans = [
        p
        for ps in calls
        for p in ps
        if p.startswith(base) and "/data/" in p and "/deletes-" not in p
    ]
    # the base fixture wrote 3 data files; only the ONE the position
    # delete names may be read (the CDC carried/retraction side)
    assert len(set(base_data_scans)) == 1, base_data_scans
    got = _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{troot}')")
    assert got == [(8,)]


def test_join_refresh_prunes_static_side_by_key_bounds(
    spark, tmp_path, monkeypatch
):
    """r10: the join refresh bounds the UNCHANGED side's scan by the
    delta's join-key [min, max] — on a key-clustered fact (the layout a
    partitioned 100-TB table gives for free), a dim-side update must not
    re-scan every fact file."""
    import pyarrow as pa
    from pyspark.sql.readwriter import DataFrameReader

    fact = str(tmp_path / "factK")
    dim = str(tmp_path / "dimK")
    tf = LocalIcebergTable(
        fact,
        pa.schema([("id", pa.int64()), ("k", pa.int64()), ("n", pa.int64())]),
    )
    # 4 files, k-clustered: k ∈ {0},{1},{2},{3} per file
    tf.append_snapshot(
        [
            pa.table({"id": [10 * k, 10 * k + 1], "k": [k, k],
                      "n": [k, k]})
            for k in range(4)
        ],
        timestamp_ms=T1,
    )
    td = LocalIcebergTable(
        dim, pa.schema([("k", pa.int64()), ("name", pa.string())])
    )
    td.append_snapshot(
        [pa.table({"k": [0, 1, 2, 3], "name": ["a", "b", "c", "d"]})],
        timestamp_ms=T1,
    )
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT f.id, f.n, d.name FROM iceberg_scan('{fact}') f "
        f"JOIN iceberg_scan('{dim}') d ON f.k = d.k",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 2000, key_cols=["id"]
    )
    update_where(
        spark, dim, "k = 2", {"name": "'C'"}, timestamp_ms=T1 + 3000
    )

    calls: list[tuple[str, ...]] = []
    orig = DataFrameReader.parquet

    def spy(self, *paths, **kw):
        calls.append(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "incremental-join"
    fact_scans = {
        p
        for ps in calls
        for p in ps
        if p.startswith(fact) and "/data/" in p
    }
    # only the k=2 fact file survives the bounds pruning (4 files total)
    assert len(fact_scans) == 1, sorted(fact_scans)
    got = _rows(
        spark, f"SELECT id, name FROM iceberg_scan('{troot}') ORDER BY id"
    )
    assert [r[1] for r in got] == ["a", "a", "b", "b", "C", "C", "d", "d"]


def test_unsupported_shapes_fall_back_to_full(spark, base, tmp_path):
    """Joins/DISTINCT/multi-scan views refresh via the full path and say
    so; the result is still correct."""
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT DISTINCT lang FROM iceberg_scan('{base}')",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    delete_where(spark, base, "lang = 'fr'", timestamp_ms=T1 + 3000)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "full"
    got = _rows(
        spark, f"SELECT lang FROM iceberg_scan('{troot}') ORDER BY lang"
    )
    assert got == [("de",), ("en",)]


def test_keyless_row_view_refreshes_append_only_range(
    spark, base, tmp_path
):
    """A keyless projection view still refreshes incrementally when the
    CDC range is APPEND-ONLY (the event-stream matview case): the
    transformed inserts land without any retraction machinery. A
    retraction SURVIVING the view filter then forces full; one the
    filter excludes does not."""
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT id, lang, n FROM iceberg_scan('{base}') WHERE n >= 100",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    # append-only growth: one new snapshot of two rows (one passes WHERE)
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )

    p = os.path.join(base, "data", "append-r9.parquet")
    pq.write_table(
        pa.table({"id": [10, 11], "lang": ["en", "de"], "n": [500, 50]}), p
    )
    commit_row_delta_snapshot(
        base, new_data_files=[(p, 2)], timestamp_ms=T1 + 3000
    )
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "incremental-row-append"
    got = _rows(spark, f"SELECT id FROM iceberg_scan('{troot}') ORDER BY id")
    assert [r[0] for r in got] == [1, 2, 4, 5, 6, 7, 9, 10]

    # a delete EXCLUDED by the filter stays incremental; one surviving
    # the filter forces full (keyless retraction is impossible)
    delete_where(spark, base, "id = 11", timestamp_ms=T1 + 5000)  # n=50
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 6000
    )
    assert res["path"] == "incremental-row-append"
    delete_where(spark, base, "id = 10", timestamp_ms=T1 + 7000)  # n=500
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 8000
    )
    assert res["path"] == "full"
    got = _rows(spark, f"SELECT id FROM iceberg_scan('{troot}') ORDER BY id")
    assert [r[0] for r in got] == [1, 2, 4, 5, 6, 7, 9]


def test_row_shape_without_keys_falls_back_to_full(spark, base, tmp_path):
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT id, n FROM iceberg_scan('{base}')",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 3000)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "full"
    # ... but passing keys at refresh time unlocks the incremental path
    delete_where(spark, base, "id = 2", timestamp_ms=T1 + 5000)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 6000, key_cols=["id"]
    )
    assert res["path"] == "incremental-row"
    got = _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{troot}')")
    assert got == [(7,)]


def test_view_version_change_forces_full(spark, base, tmp_path):
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n FROM iceberg_scan('{base}') "
        "GROUP BY lang",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    replace_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n FROM iceberg_scan('{base}') "
        "WHERE lang <> 'fr' GROUP BY lang",
        timestamp_ms=T1 + 3000,
    )
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "full"
    got = _rows(
        spark, f"SELECT lang FROM iceberg_scan('{troot}') ORDER BY lang"
    )
    assert got == [("de",), ("en",)]


def test_compaction_in_range_falls_back_to_full(spark, base, tmp_path):
    """A rewrite commit between refreshes breaks the changelog contract —
    the refresh must detect it (CDC raises) and recompute fully."""
    from cloudfloe_spark.sources.maintenance import compact_iceberg_table

    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n FROM iceberg_scan('{base}') "
        "GROUP BY lang",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 3000)
    compact_iceberg_table(spark, base, timestamp_ms=T1 + 4000)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 5000
    )
    assert res["path"] == "full"
    got = _rows(
        spark, f"SELECT lang, n FROM iceberg_scan('{troot}') ORDER BY lang"
    )
    assert got == [("de", 3), ("en", 2), ("fr", 3)]


@pytest.fixture()
def fact_dim(tmp_path):
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    tf = LocalIcebergTable(
        fact,
        pa.schema([("id", pa.int64()), ("k", pa.int64()), ("n", pa.int64())]),
    )
    tf.append_snapshot(
        [
            pa.table({"id": [1, 2, 3], "k": [0, 1, 2], "n": [10, 20, 30]}),
            pa.table({"id": [4, 5, 6], "k": [0, 1, 2], "n": [40, 50, 60]}),
        ],
        timestamp_ms=T1,
    )
    td = LocalIcebergTable(
        dim, pa.schema([("k", pa.int64()), ("name", pa.string())])
    )
    td.append_snapshot(
        [pa.table({"k": [0, 1, 2], "name": ["red", "green", "blue"]})],
        timestamp_ms=T1,
    )
    return fact, dim


def _join_view(fact, dim, vroot):
    create_iceberg_view(
        vroot,
        f"SELECT f.id, f.n, d.name FROM iceberg_scan('{fact}') f "
        f"JOIN iceberg_scan('{dim}') d ON f.k = d.k WHERE f.n < 900",
        timestamp_ms=T1 + 1000,
    )


def test_join_view_fact_delta_refreshes_incrementally(
    spark, fact_dim, tmp_path
):
    """Fact ⋈ dim enrichment view: a fact-side DML refreshes by joining
    the fact CHANGELOG to the (unchanged) dim — including a filter
    crossing — and equals a full recompute."""
    fact, dim = fact_dim
    vroot = str(tmp_path / "v")
    t_inc, t_full = str(tmp_path / "mv_inc"), str(tmp_path / "mv_full")
    _join_view(fact, dim, vroot)
    materialize_iceberg_view(
        spark, vroot, t_inc, timestamp_ms=T1 + 2000, key_cols=["id"]
    )
    materialize_iceberg_view(
        spark, vroot, t_full, timestamp_ms=T1 + 2001, key_cols=["id"]
    )
    delete_where(spark, fact, "id = 2", timestamp_ms=T1 + 3000)
    update_where(
        spark, fact, "id = 5", {"n": "1000"}, timestamp_ms=T1 + 4000
    )  # leaves the n < 900 slice
    r1 = refresh_materialized_view(spark, vroot, t_inc,
                                   timestamp_ms=T1 + 5000)
    assert r1["path"] == "incremental-join"
    r2 = refresh_materialized_view(spark, vroot, t_full,
                                   timestamp_ms=T1 + 5001,
                                   allow_incremental=False)
    assert r2["path"] == "full"
    q = "SELECT id, n, name FROM iceberg_scan('{}') ORDER BY id"
    got = _rows(spark, q.format(t_inc))
    assert got == _rows(spark, q.format(t_full))
    assert [r[0] for r in got] == [1, 3, 4, 6]
    assert materialized_view_status(t_inc)["stale"] is False


def test_join_view_dim_delta_is_symmetric(spark, fact_dim, tmp_path):
    """The join shape is base-symmetric: a DIM-side update refreshes via
    delta(dim) ⋈ fact — every enriched row re-keys through the view's id."""
    fact, dim = fact_dim
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    _join_view(fact, dim, vroot)
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 2000, key_cols=["id"]
    )
    update_where(
        spark, dim, "k = 1", {"name": "'GREEN'"}, timestamp_ms=T1 + 3000
    )
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "incremental-join"
    got = _rows(
        spark, f"SELECT id, name FROM iceberg_scan('{troot}') ORDER BY id"
    )
    assert got == [
        (1, "red"), (2, "GREEN"), (3, "blue"),
        (4, "red"), (5, "GREEN"), (6, "blue"),
    ]


def test_join_view_both_bases_moved_refreshes_incrementally(
    spark, fact_dim, tmp_path
):
    """r10 (VERDICT r9 #3): BOTH bases moved in one staleness window —
    the algebraic delta Δfact ⋈ dim_new ∪ fact_old ⋈ Δdim refreshes at
    delta cost instead of the r9 full recompute. The chosen DML pair is
    the adversarial cancellation case: fact id=1 is DELETED while its
    dim row (k=0) is UPDATED, so the raw combined changelog contains both
    −(1, RED) and +(1, RED) — only row-level NETTING keeps the keyed
    apply from resurrecting the deleted row."""
    fact, dim = fact_dim
    vroot = str(tmp_path / "v")
    t_inc, t_full = str(tmp_path / "mv_inc"), str(tmp_path / "mv_full")
    _join_view(fact, dim, vroot)
    materialize_iceberg_view(
        spark, vroot, t_inc, timestamp_ms=T1 + 2000, key_cols=["id"]
    )
    materialize_iceberg_view(
        spark, vroot, t_full, timestamp_ms=T1 + 2001, key_cols=["id"]
    )
    delete_where(spark, fact, "id = 1", timestamp_ms=T1 + 3000)
    update_where(
        spark, dim, "k = 0", {"name": "'RED'"}, timestamp_ms=T1 + 4000
    )
    # plus a fact-side insert joining the UPDATED dim row
    from cloudfloe_spark.sources.maintenance import merge_into

    merge_into(
        spark, fact,
        spark.createDataFrame([(7, 0, 70)], "id LONG, k LONG, n LONG"),
        ["id"], timestamp_ms=T1 + 4500,
    )
    res = refresh_materialized_view(
        spark, vroot, t_inc, timestamp_ms=T1 + 5000
    )
    assert res["path"] == "incremental-join-both"
    full = refresh_materialized_view(
        spark, vroot, t_full, timestamp_ms=T1 + 5001,
        allow_incremental=False,
    )
    assert full["path"] == "full"
    q = "SELECT id, n, name FROM iceberg_scan('{}') ORDER BY id"
    got = _rows(spark, q.format(t_inc))
    assert got == _rows(spark, q.format(t_full))
    assert got == [
        (2, 20, "green"), (3, 30, "blue"), (4, 40, "RED"),
        (5, 50, "green"), (6, 60, "blue"), (7, 70, "RED"),
    ]
    assert materialized_view_status(t_inc)["stale"] is False


def test_join_both_moved_without_keys_falls_back_when_retracting(
    spark, fact_dim, tmp_path
):
    """Keyless both-moved: a netted delta containing retractions cannot
    be applied without keys → full refresh (sound), while a pure-append
    window refreshes via the keyless path."""
    fact, dim = fact_dim
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    _join_view(fact, dim, vroot)
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    # append-only on BOTH bases → keyless both-moved path
    from cloudfloe_spark.sources.maintenance import merge_into

    merge_into(
        spark, fact,
        spark.createDataFrame([(8, 3, 80)], "id LONG, k LONG, n LONG"),
        ["id"], timestamp_ms=T1 + 3000,
    )
    merge_into(
        spark, dim,
        spark.createDataFrame([(3, "teal")], "k LONG, name STRING"),
        ["k"], timestamp_ms=T1 + 3500,
    )
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "incremental-join-both-append"
    got = _rows(
        spark, f"SELECT id, name FROM iceberg_scan('{troot}') ORDER BY id"
    )
    assert got[-1] == (8, "teal") and len(got) == 7
    # now a retracting window without keys → full
    delete_where(spark, fact, "id = 2", timestamp_ms=T1 + 5000)
    update_where(
        spark, dim, "k = 2", {"name": "'BLUE'"}, timestamp_ms=T1 + 5500
    )
    res2 = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 6000
    )
    assert res2["path"] == "full"
    got2 = _rows(
        spark, f"SELECT id, name FROM iceberg_scan('{troot}') ORDER BY id"
    )
    assert (3, "BLUE") in got2 and all(r[0] != 2 for r in got2)


def test_incremental_shape_parser_rejects_unsafe_sql():
    """The lexical gate: anything whose delta/group transform could be
    unsound parses to None (full refresh)."""
    ok_agg = incremental_shape(
        "SELECT lang, COUNT(*) AS n FROM iceberg_scan('/t') GROUP BY lang"
    )
    assert ok_agg["kind"] == "agg" and ok_agg["group_out"] == ["lang"]
    ok_row = incremental_shape(
        "SELECT id, n FROM iceberg_scan('/t') WHERE n > 5"
    )
    assert ok_row["kind"] == "row" and ok_row["where"] == "n > 5"
    # r10 (ADVICE r9 #3): a top-level `*` that is MULTIPLICATION is not a
    # star projection — `n_chars * 2` must keep the incremental path
    arith = incremental_shape(
        "SELECT doc_id, n_chars * 2 AS d FROM iceberg_scan('/t')"
    )
    assert arith is not None and arith["kind"] == "row"
    assert incremental_shape(
        "SELECT id, n * 2 AS d FROM iceberg_scan('/t') WHERE n * 3 > 5"
    )["kind"] == "row"
    # ... while genuine star ITEMS still gate: bare `*` alone is the row
    # shape, `alias.*` or mixed stars are not
    assert incremental_shape("SELECT * FROM iceberg_scan('/t')") is not None
    for bad in [
        "SELECT t.* FROM iceberg_scan('/t')",
        "SELECT id, * FROM iceberg_scan('/t')",
        # r10 (VERDICT r9 #5): nondeterministic expressions would give
        # delta rows fresh values while untouched rows keep old ones
        "SELECT id, rand() AS r FROM iceberg_scan('/t')",
        "SELECT id, uuid() AS u FROM iceberg_scan('/t')",
        "SELECT id, current_timestamp AS ts FROM iceberg_scan('/t')",
        "SELECT id, current_date() AS d FROM iceberg_scan('/t')",
        "SELECT id, now() AS ts FROM iceberg_scan('/t')",
        "SELECT id FROM iceberg_scan('/t') "
        "WHERE ts > current_timestamp - INTERVAL 1 DAY",
        "SELECT id, monotonically_increasing_id() AS m "
        "FROM iceberg_scan('/t')",
    ]:
        assert incremental_shape(bad) is None, bad
    # r10: LEFT [OUTER] joins parse as the join shape; right/full reject
    lj = incremental_shape(
        "SELECT f.a, d.b FROM iceberg_scan('/f') f "
        "LEFT JOIN iceberg_scan('/d') d ON f.k = d.k"
    )
    assert lj["kind"] == "join" and lj["join_type"] == "left"
    for bad_join in (
        "SELECT f.a FROM iceberg_scan('/f') f RIGHT JOIN "
        "iceberg_scan('/d') d ON f.k = d.k",
        "SELECT f.a FROM iceberg_scan('/f') f FULL OUTER JOIN "
        "iceberg_scan('/d') d ON f.k = d.k",
    ):
        assert incremental_shape(bad_join) is None, bad_join
    for bad in [
        "SELECT a FROM iceberg_scan('/t') JOIN x ON a = b",
        "SELECT DISTINCT a FROM iceberg_scan('/t')",
        "SELECT a FROM iceberg_scan('/t') ORDER BY a LIMIT 5",
        "SELECT a, ROW_NUMBER() OVER (ORDER BY a) AS r "
        "FROM iceberg_scan('/t')",
        "SELECT a FROM iceberg_scan('/t') VERSION AS OF 3",
        "SELECT a FROM iceberg_view('/v')",
        "SELECT upper(a) AS u, COUNT(*) AS n FROM iceberg_scan('/t') "
        "GROUP BY upper(a)",
        "SELECT COUNT(*) AS n FROM iceberg_scan('/t') GROUP BY a",
        "WITH x AS (SELECT 1) SELECT * FROM x",
        "SELECT a, (SELECT MAX(b) FROM y) AS m FROM iceberg_scan('/t')",
    ]:
        assert incremental_shape(bad) is None, bad


def test_generator_projection_falls_back_to_full(spark, base, tmp_path):
    """r10 (ADVICE r9 #2): a generator projection (explode) is
    one-to-many — it passes the lexical row gate but the analyzed plan's
    Generate node must reject it at refresh time, else a keyed retraction
    would delete every target row sharing the key."""
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT id, explode(split(lang, 'x')) AS part "
        f"FROM iceberg_scan('{base}')",
        timestamp_ms=T1 + 1000,
    )
    assert incremental_shape(
        "SELECT id, explode(split(lang, 'x')) AS part "
        "FROM iceberg_scan('/t')"
    ) is not None  # the lexical gate alone does NOT catch it
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 2000, key_cols=["id"]
    )
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 3000)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "full"
    got = _rows(
        spark,
        f"SELECT id FROM iceberg_scan('{troot}') ORDER BY id",
    )
    assert [r[0] for r in got] == [2, 3, 4, 5, 6, 7, 8, 9]


def test_nonunique_keys_fall_back_to_full(spark, base, tmp_path):
    """r10 (ADVICE r9 #2): keys that do not uniquely identify view rows
    (here key_cols=['lang'] while lang repeats) would make a keyed
    retraction over-delete — _keyed_apply_safe detects the violation and
    the refresh falls back to full instead of silently diverging."""
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT id, lang, n FROM iceberg_scan('{base}')",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 2000, key_cols=["lang"]
    )
    # delete ONE of the three en rows; a lang-keyed apply would retract
    # all three and reinsert none
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 3000)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "full"
    got = _rows(
        spark, f"SELECT id FROM iceberg_scan('{troot}') ORDER BY id"
    )
    assert [r[0] for r in got] == [2, 3, 4, 5, 6, 7, 8, 9]


def test_matview_status_table_function(spark, base, tmp_path):
    """``iceberg_matview_status('<target>')`` (r9): per-row freshness —
    the view-definition row and one base-table row, each with its own
    stale flag; flips with a base DML and settles after a refresh."""
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS n FROM iceberg_scan('{base}') "
        "GROUP BY lang",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 2000)
    q = (
        f"SELECT kind, ref, stale FROM iceberg_matview_status('{troot}') "
        "ORDER BY kind"
    )
    rows = _rows(spark, q)
    assert rows == [("base-table", base, False),
                    ("view-definition", vroot, False)]
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 3000)
    rows = _rows(spark, q)
    assert rows == [("base-table", base, True),
                    ("view-definition", vroot, False)]
    refresh_materialized_view(spark, vroot, troot, timestamp_ms=T1 + 4000)
    rows = _rows(spark, q)
    assert all(r[2] is False for r in rows)
    # non-matview target is a clean 400
    from cloudfloe_spark.service.errors import CloudfloeError

    with pytest.raises(CloudfloeError, match="not a materialized view"):
        _rows(spark, f"SELECT * FROM iceberg_matview_status('{base}')")


def test_global_aggregate_row_misparse_is_caught_at_runtime(
    spark, base, tmp_path
):
    """A global aggregate (no GROUP BY) lexically looks like a row shape;
    the analyzed-plan Aggregate check must force the full path."""
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT COUNT(*) AS n FROM iceberg_scan('{base}')",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 2000, key_cols=["n"]
    )
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 3000)
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "full"
    assert _rows(spark, f"SELECT n FROM iceberg_scan('{troot}')") == [(8,)]


def test_left_join_view_fact_delta_refreshes_incrementally(
    spark, tmp_path
):
    """r10: LEFT JOIN enrichment views refresh incrementally on a
    FACT-side delta — null-extended rows (fact keys with no dim match)
    included — and equal a full recompute."""
    fact = str(tmp_path / "factL")
    dim = str(tmp_path / "dimL")
    tf = LocalIcebergTable(
        fact,
        pa.schema([("id", pa.int64()), ("k", pa.int64()), ("n", pa.int64())]),
    )
    # k=9 has NO dim row → null-extended in the view
    tf.append_snapshot(
        [
            pa.table({"id": [1, 2, 3], "k": [0, 1, 9], "n": [10, 20, 30]}),
            pa.table({"id": [4, 5, 6], "k": [0, 9, 1], "n": [40, 50, 60]}),
        ],
        timestamp_ms=T1,
    )
    td = LocalIcebergTable(
        dim, pa.schema([("k", pa.int64()), ("name", pa.string())])
    )
    td.append_snapshot(
        [pa.table({"k": [0, 1], "name": ["red", "green"]})], timestamp_ms=T1
    )
    vroot = str(tmp_path / "v")
    t_inc, t_full = str(tmp_path / "mv_inc"), str(tmp_path / "mv_full")
    create_iceberg_view(
        vroot,
        f"SELECT f.id, f.n, d.name FROM iceberg_scan('{fact}') f "
        f"LEFT JOIN iceberg_scan('{dim}') d ON f.k = d.k",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(
        spark, vroot, t_inc, timestamp_ms=T1 + 2000, key_cols=["id"]
    )
    materialize_iceberg_view(
        spark, vroot, t_full, timestamp_ms=T1 + 2001, key_cols=["id"]
    )
    # delete a null-extended row, update a matched one, and insert a NEW
    # null-extended one (k=7 unmatched)
    delete_where(spark, fact, "id = 3", timestamp_ms=T1 + 3000)
    update_where(spark, fact, "id = 2", {"n": "22"}, timestamp_ms=T1 + 4000)
    from cloudfloe_spark.sources.maintenance import merge_into

    merge_into(
        spark, fact,
        spark.createDataFrame([(7, 7, 70)], "id LONG, k LONG, n LONG"),
        ["id"], timestamp_ms=T1 + 5000,
    )
    r1 = refresh_materialized_view(spark, vroot, t_inc,
                                   timestamp_ms=T1 + 6000)
    assert r1["path"] == "incremental-join"
    r2 = refresh_materialized_view(spark, vroot, t_full,
                                   timestamp_ms=T1 + 6001,
                                   allow_incremental=False)
    assert r2["path"] == "full"
    q = "SELECT id, n, name FROM iceberg_scan('{}') ORDER BY id"
    got = _rows(spark, q.format(t_inc))
    assert got == _rows(spark, q.format(t_full))
    assert got == [
        (1, 10, "red"), (2, 22, "green"), (4, 40, "red"),
        (5, 50, None), (6, 60, "green"), (7, 70, None),
    ]
    assert materialized_view_status(t_inc)["stale"] is False


def test_left_join_dim_delta_falls_back_to_full(spark, tmp_path):
    """A DIM-side change under a LEFT join flips rows between
    null-extended and matched — only a full refresh is sound, and the
    result reflects the flip."""
    fact = str(tmp_path / "factL2")
    dim = str(tmp_path / "dimL2")
    tf = LocalIcebergTable(
        fact, pa.schema([("id", pa.int64()), ("k", pa.int64())])
    )
    tf.append_snapshot(
        [pa.table({"id": [1, 2], "k": [0, 9]})], timestamp_ms=T1
    )
    td = LocalIcebergTable(
        dim, pa.schema([("k", pa.int64()), ("name", pa.string())])
    )
    td.append_snapshot(
        [pa.table({"k": [0], "name": ["red"]})], timestamp_ms=T1
    )
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT f.id, d.name FROM iceberg_scan('{fact}') f "
        f"LEFT JOIN iceberg_scan('{dim}') d ON f.k = d.k",
        timestamp_ms=T1 + 1000,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 2000, key_cols=["id"]
    )
    # the k=9 dim row APPEARS: id=2 must flip from null-extended to matched
    from cloudfloe_spark.sources.maintenance import merge_into

    merge_into(
        spark, dim,
        spark.createDataFrame([(9, "blue")], "k LONG, name STRING"),
        ["k"], timestamp_ms=T1 + 3000,
    )
    res = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 4000
    )
    assert res["path"] == "full"
    got = _rows(
        spark, f"SELECT id, name FROM iceberg_scan('{troot}') ORDER BY id"
    )
    assert got == [(1, "red"), (2, "blue")]
    # both-moved under LEFT also stays full
    delete_where(spark, fact, "id = 1", timestamp_ms=T1 + 5000)
    update_where(
        spark, dim, "k = 9", {"name": "'BLUE'"}, timestamp_ms=T1 + 6000
    )
    res2 = refresh_materialized_view(
        spark, vroot, troot, timestamp_ms=T1 + 7000
    )
    assert res2["path"] == "full"
    got2 = _rows(
        spark, f"SELECT id, name FROM iceberg_scan('{troot}') ORDER BY id"
    )
    assert got2 == [(2, "BLUE")]


def test_matview_over_variant_base(spark, tmp_path):
    """r13: a materialized view over a VARIANT base table — the stored
    SQL extracts from the decoded JSON surface, the target is a plain
    typed table, and a refresh after variant DML reproduces the view
    exactly (full path: the extraction is a function of the variant
    column, outside the incremental shapes — sound fallback)."""
    from cloudfloe_spark.functions.variant import encode_variant

    objs = [
        {"k": i, "tag": "even" if i % 2 == 0 else "odd"}
        for i in range(8)
    ]
    col = pa.array(
        [
            dict(zip(("metadata", "value"), encode_variant(o)))
            for o in objs
        ],
        pa.struct([("metadata", pa.binary()), ("value", pa.binary())]),
    )
    base = str(tmp_path / "b")
    tb = pa.table(
        {"id": pa.array(list(range(8)), pa.int64()), "v": col}
    )
    t = LocalIcebergTable(base, tb.schema, variant_cols=("v",))
    t.append_snapshot([tb], timestamp_ms=T1)
    view = str(tmp_path / "view")
    tgt = str(tmp_path / "tgt")
    create_iceberg_view(
        view,
        "SELECT get_json_object(v, '$.tag') AS tag, count(*) AS n "
        f"FROM iceberg_scan('{base}') GROUP BY tag",
        timestamp_ms=T1 + 500,
    )
    materialize_iceberg_view(
        spark, view, tgt, timestamp_ms=T1 + 1000, key_cols=["tag"]
    )
    assert _rows(
        spark, f"SELECT * FROM iceberg_scan('{tgt}') ORDER BY tag"
    ) == [("even", 4), ("odd", 4)]
    delete_where(
        spark, base, "get_json_object(v, '$.k') = 0",
        timestamp_ms=T1 + 2000,
    )
    update_where(
        spark, base, "id = 1",
        {"v": "to_json(named_struct('k', 1, 'tag', 'even'))"},
        timestamp_ms=T1 + 3000,
    )
    refresh_materialized_view(spark, view, tgt, timestamp_ms=T1 + 4000)
    assert _rows(
        spark, f"SELECT * FROM iceberg_scan('{tgt}') ORDER BY tag"
    ) == [("even", 4), ("odd", 3)]
