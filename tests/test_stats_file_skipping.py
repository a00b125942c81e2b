"""File-statistics skipping (Iceberg InclusiveMetricsEvaluator analog):
manifest-recorded per-column min/max bounds and null counts eliminate data
files whose value interval provably excludes a WHERE conjunct — including
on UNPARTITIONED columns, where partition pruning can't help.

Reference parity: the reference inherits this from DuckDB's iceberg
extension (reads data_file lower_bounds/upper_bounds, reference
README.md:199); here the fixture writer records exact bounds
(`iceberg_fixture._column_stats`) and the reader evaluates them
(`partition_pruning.file_survives_stats`) before any parquet footer opens.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest

from cloudfloe_spark.sources import partition_pruning as pp
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

T1 = 1700000000000


def _resolved_df(spark, sql):
    from cloudfloe_spark.service.iceberg_local import resolve_iceberg_reads

    sess = spark.newSession()
    return sess.sql(resolve_iceberg_reads(sess, sql))


@pytest.fixture()
def three_range_files(tmp_path):
    """Unpartitioned table, three data files with disjoint id ranges and
    distinct string/timestamp envelopes."""
    root = str(tmp_path / "tstats")
    t = LocalIcebergTable(
        root,
        pa.schema(
            [("id", pa.int64()), ("name", pa.string()), ("ts", pa.timestamp("us"))]
        ),
    )
    def mk(lo):
        return pa.table(
            {
                "id": list(range(lo, lo + 10)),
                "name": [chr(ord("a") + lo // 10) * 2] * 10,
                "ts": [datetime.datetime(2024, 1 + lo // 10, 5)] * 10,
            }
        )
    t.append_snapshot([mk(0), mk(10), mk(20)], timestamp_ms=T1)
    return root


def test_int_bounds_skip_files(spark, three_range_files):
    root = three_range_files
    df = _resolved_df(
        spark, f"SELECT id FROM iceberg_scan('{root}') WHERE id = 15"
    )
    assert [r["id"] for r in df.collect()] == [15]
    assert len(set(df.inputFiles())) == 1

    df2 = _resolved_df(
        spark, f"SELECT id FROM iceberg_scan('{root}') WHERE id >= 20"
    )
    assert sorted(r["id"] for r in df2.collect()) == list(range(20, 30))
    assert len(set(df2.inputFiles())) == 1

    # no predicate: all three files stay in the plan
    df3 = _resolved_df(spark, f"SELECT id FROM iceberg_scan('{root}')")
    assert df3.count() == 30
    assert len(set(df3.inputFiles())) == 3


def test_bounds_can_skip_every_file(spark, three_range_files):
    root = three_range_files
    df = _resolved_df(
        spark, f"SELECT id, name FROM iceberg_scan('{root}') WHERE id > 99"
    )
    assert df.count() == 0
    assert set(df.columns) == {"id", "name"}
    assert len(set(df.inputFiles())) == 0


def test_string_and_timestamp_bounds_skip(spark, three_range_files):
    root = three_range_files
    df = _resolved_df(
        spark,
        f"SELECT id FROM iceberg_scan('{root}') WHERE name = 'cc'",
    )
    assert sorted(r["id"] for r in df.collect()) == list(range(20, 30))
    assert len(set(df.inputFiles())) == 1

    df2 = _resolved_df(
        spark,
        f"SELECT id FROM iceberg_scan('{root}') "
        "WHERE ts < TIMESTAMP '2024-02-01 00:00:00'",
    )
    assert sorted(r["id"] for r in df2.collect()) == list(range(0, 10))
    assert len(set(df2.inputFiles())) == 1


def test_null_counts_prune_is_null(spark, tmp_path):
    root = str(tmp_path / "tnulls")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.string())])
    )
    t.append_snapshot(
        [
            pa.table({"id": [1, 2], "v": ["x", "y"]}),          # no nulls
            pa.table({"id": [3, 4], "v": pa.array([None, None], pa.string())}),
        ],
        timestamp_ms=T1,
    )
    df = _resolved_df(
        spark, f"SELECT id FROM iceberg_scan('{root}') WHERE v IS NULL"
    )
    assert sorted(r["id"] for r in df.collect()) == [3, 4]
    assert len(set(df.inputFiles())) == 1  # the no-null file skipped

    df2 = _resolved_df(
        spark, f"SELECT id FROM iceberg_scan('{root}') WHERE v IS NOT NULL"
    )
    assert sorted(r["id"] for r in df2.collect()) == [1, 2]
    assert len(set(df2.inputFiles())) == 1  # the all-null file skipped


def test_stats_skip_composes_with_partition_pruning(spark, tmp_path):
    """days(ts) partitioning prunes by day; within the surviving day,
    id bounds skip the non-matching file — both levels in one query."""
    root = str(tmp_path / "tcombo")
    t = LocalIcebergTable(
        root,
        pa.schema([("id", pa.int64()), ("ts", pa.timestamp("us"))]),
        partition_by=("ts", "day"),
    )
    d1, d2 = datetime.datetime(2024, 3, 1), datetime.datetime(2024, 3, 2)
    # two files per day (disjoint id ranges) via two appended tables
    t.append_snapshot(
        [
            pa.table({"id": [0, 1], "ts": [d1, d1]}),
            pa.table({"id": [100, 101], "ts": [d1, d1]}),
        ],
        timestamp_ms=T1,
    )
    t.append_snapshot(
        [
            pa.table({"id": [0, 1], "ts": [d2, d2]}),
            pa.table({"id": [100, 101], "ts": [d2, d2]}),
        ],
        timestamp_ms=T1 + 1000,
    )
    all_df = _resolved_df(spark, f"SELECT id FROM iceberg_scan('{root}')")
    assert len(set(all_df.inputFiles())) == 4
    df = _resolved_df(
        spark,
        f"SELECT id FROM iceberg_scan('{root}') "
        "WHERE ts >= TIMESTAMP '2024-03-02 00:00:00' AND id >= 100",
    )
    assert sorted(r["id"] for r in df.collect()) == [100, 101]
    assert len(set(df.inputFiles())) == 1


def test_rewrite_files_get_fresh_stats_and_prune(spark, tmp_path):
    """Compaction-rewrite entries recompute column bounds from the
    rewritten files (r6 upgrade — originally they carried none), so a
    post-compaction excluding predicate prunes the compacted file too.
    Sound-by-omission for genuinely stats-less entries stays covered at
    the unit level (TestFileSurvivesStats::test_sound_by_omission)."""
    import pyarrow.parquet as pq
    import os

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_rewrite_snapshot,
    )

    root = str(tmp_path / "trw")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64())]))
    t.append_snapshot([pa.table({"id": [1, 2, 3]})], timestamp_ms=T1)
    new = os.path.join(root, "data", "compacted-000.parquet")
    pq.write_table(pa.table({"id": [1, 2, 3]}), new)
    commit_rewrite_snapshot(root, [(new, 3)], timestamp_ms=T1 + 5000)
    df = _resolved_df(
        spark, f"SELECT id FROM iceberg_scan('{root}') WHERE id > 999"
    )
    assert df.count() == 0
    assert len(set(df.inputFiles())) == 0  # bounds [1,3] exclude >999
    df2 = _resolved_df(
        spark, f"SELECT id FROM iceberg_scan('{root}') WHERE id >= 2"
    )
    assert sorted(r["id"] for r in df2.collect()) == [2, 3]


def test_sorted_compaction_enables_range_skipping(spark, tmp_path):
    """compact_iceberg_table(sort_by=...): range-partitioned sorted output
    gives each file a disjoint value interval, so a range predicate reads
    exactly one of the compacted files — the cluster-then-skip play."""
    from cloudfloe_spark.sources.maintenance import compact_iceberg_table

    root = str(tmp_path / "tsort")
    t = LocalIcebergTable(root, pa.schema([("id", pa.int64()), ("v", pa.string())]))
    # interleaved ids across files: pre-compaction bounds overlap fully
    t.append_snapshot(
        [
            pa.table({"id": list(range(0, 100, 2)), "v": ["a"] * 50}),
            pa.table({"id": list(range(1, 100, 2)), "v": ["b"] * 50}),
        ],
        timestamp_ms=T1,
    )
    pre = _resolved_df(
        spark, f"SELECT id FROM iceberg_scan('{root}') WHERE id >= 90"
    )
    assert len(set(pre.inputFiles())) == 2  # overlapping bounds: no skip

    res = compact_iceberg_table(
        spark, root, timestamp_ms=T1 + 1000,
        target_file_bytes=1024, sort_by=["id"],
    )
    assert res["files_after"] >= 2
    post = _resolved_df(
        spark, f"SELECT id FROM iceberg_scan('{root}') WHERE id >= 90"
    )
    assert sorted(r["id"] for r in post.collect()) == list(range(90, 100))
    assert len(set(post.inputFiles())) == 1  # disjoint bounds: skipped


def _grid_table(tmp_path, name, n=64):
    """n x n grid of (x, y) in one file: pre-compaction bounds span the
    full range of both columns, so nothing skips."""
    root = str(tmp_path / name)
    t = LocalIcebergTable(
        root,
        pa.schema([("x", pa.int64()), ("y", pa.int64()), ("v", pa.int64())]),
    )
    t.append_snapshot(
        [
            pa.table(
                {
                    "x": [i // n for i in range(n * n)],
                    "y": [i % n for i in range(n * n)],
                    "v": list(range(n * n)),
                }
            )
        ],
        timestamp_ms=T1,
    )
    return root


def test_zorder_compaction_skips_on_both_dimensions(spark, tmp_path):
    """compact_iceberg_table(zorder_by=[x, y]): every output file owns a
    small hyper-rectangle in (x, y) space, so range predicates on EITHER
    column skip most files — where lexicographic sort_by=[x, y] clusters
    x only (each file spans y's full range, y predicates read everything).
    This is the multi-dimensional file-skipping property that makes
    z-order the 100-TB layout for tables queried along independent axes.
    """
    import glob
    import os

    from cloudfloe_spark.sources.maintenance import compact_iceberg_table

    zroot = _grid_table(tmp_path, "tz")
    lroot = _grid_table(tmp_path, "tlex")
    # size the rewrite to ~16 output files whatever parquet compression does
    live = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(zroot, "data", "*.parquet"))
    )
    target = max(1, live // 16)
    rz = compact_iceberg_table(
        spark, zroot, timestamp_ms=T1 + 1000,
        target_file_bytes=target, zorder_by=["x", "y"],
    )
    rl = compact_iceberg_table(
        spark, lroot, timestamp_ms=T1 + 1000,
        target_file_bytes=target, sort_by=["x", "y"],
    )
    assert rz["files_after"] >= 8, rz
    assert rz["rows"] == 64 * 64

    def files_read(root, cond):
        df = _resolved_df(
            spark,
            f"SELECT v FROM iceberg_scan('{root}') WHERE {cond}",
        )
        return len(set(df.inputFiles())), df.count()

    # top-1/8 slice of x: both layouts skip (x is the leading sort key)
    zx, zx_rows = files_read(zroot, "x >= 56")
    lx, _ = files_read(lroot, "x >= 56")
    assert zx_rows == 8 * 64
    assert zx <= rz["files_after"] // 2, (zx, rz)
    assert lx <= rl["files_after"] // 2, (lx, rl)

    # top-1/8 slice of y: ONLY the z-ordered layout skips
    zy, zy_rows = files_read(zroot, "y >= 56")
    ly, ly_rows = files_read(lroot, "y >= 56")
    assert zy_rows == ly_rows == 8 * 64
    assert zy <= rz["files_after"] // 2, (zy, rz)
    assert ly >= rl["files_after"] - 1, (ly, rl)  # lexicographic: no skip

    # point query in both dimensions: a z-ordered tile corner
    zp, zp_rows = files_read(zroot, "x = 3 AND y = 3")
    assert zp_rows == 1
    assert zp <= max(2, rz["files_after"] // 4), (zp, rz)


def test_zorder_validation(spark, tmp_path):
    from cloudfloe_spark.sources.maintenance import compact_iceberg_table

    root = str(tmp_path / "tzv")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("name", pa.string())])
    )
    t.append_snapshot(
        [pa.table({"id": [1, 2], "name": ["a", "b"]})], timestamp_ms=T1
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_iceberg_table(
            spark, root, timestamp_ms=T1 + 1000,
            sort_by=["id"], zorder_by=["id"],
        )
    with pytest.raises(ValueError, match="unsupported type"):
        compact_iceberg_table(
            spark, root, timestamp_ms=T1 + 1000, zorder_by=["name"]
        )
    with pytest.raises(ValueError, match="not in table"):
        compact_iceberg_table(
            spark, root, timestamp_ms=T1 + 1000, zorder_by=["missing"]
        )


def test_rename_then_stats_skip_on_new_name(spark, tmp_path):
    """Bounds are recorded under write-time column names; after a rename
    the conjunct on the CURRENT name must still skip via the history map."""
    root = str(tmp_path / "tren")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("amount", pa.int64())])
    )
    t.append_snapshot(
        [
            pa.table({"id": [1], "amount": [10]}),
            pa.table({"id": [2], "amount": [500]}),
        ],
        timestamp_ms=T1,
    )
    t.rename_column("amount", "value", timestamp_ms=T1 + 1000)
    df = _resolved_df(
        spark, f"SELECT id FROM iceberg_scan('{root}') WHERE value > 100"
    )
    assert [r["id"] for r in df.collect()] == [2]
    assert len(set(df.inputFiles())) == 1


class TestFileSurvivesStats:
    TYPES = {"id": "long", "v": "string", "f": "double"}

    def _stats(self, **kw):
        base = {
            "lower": {"id": "10", "v": "alpha", "f": "1.5"},
            "upper": {"id": "19", "v": "omega", "f": "9.25"},
            "nulls": {"id": 0, "v": 2, "f": 0},
            "records": 10,
        }
        base.update(kw)
        return base

    def test_equality_inside_and_outside(self):
        s = self._stats()
        assert pp.file_survives_stats(s, [("id", "=", 15)], self.TYPES)
        assert not pp.file_survives_stats(s, [("id", "=", 25)], self.TYPES)
        assert pp.file_survives_stats(s, [("id", "=", 10)], self.TYPES)
        assert pp.file_survives_stats(s, [("id", "=", 19)], self.TYPES)

    def test_ranges(self):
        s = self._stats()
        assert not pp.file_survives_stats(s, [("id", "<", 10)], self.TYPES)
        assert pp.file_survives_stats(s, [("id", "<=", 10)], self.TYPES)
        assert not pp.file_survives_stats(s, [("id", ">", 19)], self.TYPES)
        assert pp.file_survives_stats(s, [("id", ">=", 19)], self.TYPES)
        assert not pp.file_survives_stats(
            s, [("f", ">", 9.5)], self.TYPES
        )

    def test_in_list(self):
        s = self._stats()
        assert not pp.file_survives_stats(
            s, [("id", "in", [1, 2, 99])], self.TYPES
        )
        assert pp.file_survives_stats(
            s, [("id", "in", [1, 15])], self.TYPES
        )

    def test_null_ops(self):
        s = self._stats()
        assert pp.file_survives_stats(s, [("v", "isnull", None)], self.TYPES)
        assert not pp.file_survives_stats(
            s, [("id", "isnull", None)], self.TYPES
        )
        assert pp.file_survives_stats(s, [("v", "notnull", None)], self.TYPES)
        s_allnull = self._stats(nulls={"v": 10}, records=10)
        assert not pp.file_survives_stats(
            s_allnull, [("v", "notnull", None)], self.TYPES
        )

    def test_sound_by_omission(self):
        assert pp.file_survives_stats(None, [("id", "=", 99)], self.TYPES)
        assert pp.file_survives_stats({}, [("id", "=", 99)], self.TYPES)
        # unknown column / missing bounds / garbage bound → never prune
        s = self._stats(lower={"id": "not-a-number"})
        assert pp.file_survives_stats(s, [("id", "=", 99)], self.TYPES)
        assert pp.file_survives_stats(
            self._stats(), [("other", "=", 99)], self.TYPES
        )

    def test_rename_history(self):
        s = self._stats()
        hist = {"id": "row_id"}
        assert not pp.file_survives_stats(
            s, [("row_id", "=", 25)], {"row_id": "long"}, hist
        )
        assert pp.file_survives_stats(
            s, [("row_id", "=", 15)], {"row_id": "long"}, hist
        )


def test_time_travel_prunes_on_rename_free_tables(spark, three_range_files):
    """Snapshot-pinned reads prune too when the schema log has no renames
    (names are stable across versions, so current-name conjuncts are
    valid against every snapshot's files)."""
    root = three_range_files
    from cloudfloe_spark.sources import iceberg_meta as im

    s1 = im.resolve_snapshot(root)["snapshot-id"]
    df = _resolved_df(
        spark,
        f"SELECT id FROM iceberg_scan('{root}') VERSION AS OF {s1} "
        "WHERE id >= 20",
    )
    assert sorted(r["id"] for r in df.collect()) == list(range(20, 30))
    assert len(set(df.inputFiles())) == 1


def test_time_travel_never_prunes_after_rename(spark, tmp_path):
    """A rename anywhere in the schema log disables time-travel pruning
    (write-time names could mismatch current-name conjuncts) — results
    stay correct and every file is read."""
    root = str(tmp_path / "ttt")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("amount", pa.int64())])
    )
    t.append_snapshot(
        [
            pa.table({"id": [1], "amount": [10]}),
            pa.table({"id": [2], "amount": [500]}),
        ],
        timestamp_ms=T1,
    )
    from cloudfloe_spark.sources import iceberg_meta as im

    s1 = im.resolve_snapshot(root)["snapshot-id"]
    t.rename_column("amount", "value", timestamp_ms=T1 + 1000)
    df = _resolved_df(
        spark,
        f"SELECT id FROM iceberg_scan('{root}') VERSION AS OF {s1} "
        "WHERE amount > 100",  # snapshot resolves under write-time names
    )
    assert [r["id"] for r in df.collect()] == [2]
    assert len(set(df.inputFiles())) == 2  # unpruned by design
