"""Partition-aware DML writes (r8): UPDATE/MERGE/apply_changelog fan
their new data files out per partition tuple and stamp the tuple +
spec id in the manifest entry, so partition pruning keeps working on
post-DML rows (pre-r8, DML-written files carried no partition metadata
and could never be pruned again until compaction).

Two layers: a differential test of the Spark-side transform expressions
against the pure-Python spec implementation
(``partition_pruning.transform_value`` — the same function the PRUNER
uses, so agreement here is exactly pruning soundness), and end-to-end
DML-on-partitioned-table tests asserting stamped tuples, pruned
follow-up scans, and unchanged results."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.sources import iceberg_meta as im
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.maintenance import (
    apply_changelog,
    merge_into,
    update_where,
)
from cloudfloe_spark.sources.maintenance import delete_where as delete_where_
from cloudfloe_spark.sources.partition_pruning import transform_value

T1 = 1700000000000
_CFG = ConnectionConfig(
    storageType="local", endpoint="", accessKey="", secretKey=""
)


def _rows(spark, sql):
    return [tuple(r) for r in run_query(spark, sql, _CFG).rows]


# --- differential: Spark transform exprs vs the spec implementation --------

_CASES = [
    ("identity", "int", [0, 1, -5, 2147483647]),
    ("identity", "string", ["", "a", "héllo", "x/y=z"]),
    (
        "identity",
        "date",
        [datetime.date(1969, 12, 31), datetime.date(2024, 2, 29)],
    ),
    ("truncate[10]", "int", [0, 9, 10, -1, -10, -11, 12345]),
    ("truncate[3]", "string", ["", "ab", "abcd", "ααββγγ"]),
    (
        "year",
        "timestamptz",
        [
            datetime.datetime(1969, 6, 1, 12, tzinfo=datetime.timezone.utc),
            datetime.datetime(2024, 12, 31, 23, 59, 59, tzinfo=datetime.timezone.utc),
        ],
    ),
    (
        "month",
        "date",
        [datetime.date(1969, 12, 31), datetime.date(2024, 1, 1)],
    ),
    (
        "day",
        "timestamptz",
        [
            datetime.datetime(1969, 12, 31, 23, tzinfo=datetime.timezone.utc),
            datetime.datetime(2024, 6, 1, 0, 0, 1, tzinfo=datetime.timezone.utc),
        ],
    ),
    (
        "hour",
        "timestamptz",
        [
            datetime.datetime(2024, 6, 1, 13, 59, 59, tzinfo=datetime.timezone.utc),
            datetime.datetime(1970, 1, 1, 0, 0, 1, tzinfo=datetime.timezone.utc),
            # ADVICE r14: 1 µs below an hour boundary PAST 2^53 µs
            # (~2255), where a timestamp→double cast has ulp 2 µs — the
            # old double divide rounded this into the NEXT hour
            datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            + datetime.timedelta(
                microseconds=2_600_000 * 3_600_000_000 - 1
            ),
        ],
    ),
    ("bucket[16]", "int", [0, 1, 34, -123, 2147483647]),
    ("bucket[8]", "long", [0, 10**12, -7]),
    ("bucket[4]", "string", ["", "iceberg", "héllo"]),
]


@pytest.mark.parametrize("transform,src_type,values", _CASES)
def test_spark_transform_matches_spec(spark, transform, src_type, values):
    """The fanout's Spark-side partition expression must agree with
    ``transform_value`` (what the pruner evaluates) on every value —
    including negatives, pre-1970 temporals, and multi-byte strings —
    or post-DML pruning would be unsound."""
    from pyspark.sql import functions as F

    from cloudfloe_spark.sources.maintenance import _pt_expr

    spark_type = {
        "int": "int",
        "long": "long",
        "string": "string",
        "date": "date",
        "timestamptz": "timestamp",
    }[src_type]
    df = spark.createDataFrame([(v,) for v in values], f"c {spark_type}")
    field = {"column": "c", "transform": transform, "type": src_type}
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        expr = _pt_expr(spark, field)
        assert expr is not None
        got = [r[0] for r in df.select(expr).collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    def canon(x):
        if x is None or isinstance(x, (str, datetime.date)):
            return x
        return int(x)

    want = [canon(transform_value(transform, v, src_type)) for v in values]
    got = [canon(g) for g in got]
    assert got == want, (transform, src_type, values)


def test_unsupported_transforms_skip_fanout(spark):
    from cloudfloe_spark.sources.maintenance import _pt_expr

    # identity on timestamp: stringified dir value can't match the
    # fixture's canonical form — must skip, not guess
    assert _pt_expr(
        spark, {"column": "c", "transform": "identity", "type": "timestamptz"}
    ) is None
    assert _pt_expr(
        spark, {"column": "c", "transform": "hour", "type": "date"}
    ) is None


# --- end-to-end: DML on partitioned tables ---------------------------------


@pytest.fixture()
def lang_table(tmp_path):
    root = str(tmp_path / "tpart")
    t = LocalIcebergTable(
        root,
        pa.schema(
            [
                ("id", pa.int64()),
                ("lang", pa.string()),
                ("n", pa.int64()),
            ]
        ),
        partition_by=[("lang", "identity")],
    )
    t.append_snapshot(
        [
            pa.table(
                {
                    "id": [1, 2, 3, 4, 5, 6],
                    "lang": ["en", "en", "de", "de", "fr", None],
                    "n": [10, 20, 30, 40, 50, 60],
                }
            )
        ],
        timestamp_ms=T1,
    )
    return root, t


def test_update_stamps_partition_tuples_and_prunes(spark, lang_table):
    """UPDATE on a partitioned table: the rewritten rows land in
    per-partition files whose manifest entries carry the tuple, and a
    follow-up partition-filtered DML scans only that partition's files —
    including pruning AWAY the post-update files of other partitions."""
    root, _ = lang_table
    res = update_where(
        spark, root, "lang IS NOT NULL", {"n": "n + 1"}, timestamp_ms=T1 + 1000
    )
    assert res["matched"] == 5

    snap = im.resolve_snapshot(root)
    parts = im.live_data_partitions(root, snap)
    new_files = {
        p: pv for p, pv in parts.items() if "/update-" in p
    }
    assert new_files, "update wrote no partition-stamped files"
    stamped = sorted(
        pv.get("lang") for pv in new_files.values() if pv is not None
    )
    assert stamped == ["de", "en", "fr"]  # one partition tuple per file
    # every new file carries a tuple (the NULL-lang row was not matched)
    assert all(pv is not None for pv in new_files.values())

    # results correct under current + time-travel reads
    rows = _rows(spark, f"SELECT id, n FROM iceberg_scan('{root}') ORDER BY id")
    assert rows == [(1, 11), (2, 21), (3, 31), (4, 41), (5, 51), (6, 60)]

    # partition-pruned follow-up DML: only 'de' files scanned — the
    # original 'de' file (still live under merge-on-read, rows
    # position-deleted) plus the ONE post-update 'de' file. Without the
    # tuple stamping, all 3 new update files would be unprunable and
    # this would scan 4.
    res2 = update_where(
        spark, root, "lang = 'de'", {"n": "n * 100"}, timestamp_ms=T1 + 2000
    )
    assert res2["matched"] == 2
    assert res2["files_scanned"] == 2, res2
    assert res2["files_total"] == 7  # 4 original + 3 stamped update files


def test_update_null_partition_value_roundtrips(spark, lang_table):
    root, _ = lang_table
    res = update_where(
        spark, root, "lang IS NULL", {"n": "n + 5"}, timestamp_ms=T1 + 1000
    )
    assert res["matched"] == 1
    snap = im.resolve_snapshot(root)
    parts = im.live_data_partitions(root, snap)
    new = {p: pv for p, pv in parts.items() if "/update-" in p}
    assert list(new.values()) == [{"lang": None}]
    rows = _rows(spark, f"SELECT id, n FROM iceberg_scan('{root}') ORDER BY id")
    assert rows[-1] == (6, 65)


def test_merge_into_stamps_partitions(spark, lang_table):
    root, _ = lang_table
    src = spark.createDataFrame(
        [(3, "de", 300), (7, "it", 70)], "id long, lang string, n long"
    )
    res = merge_into(
        spark, root, src, on="id",
        when_matched={"n": "s.n"},
        timestamp_ms=T1 + 1000,
    )
    assert res["matched"] == 1 and res["inserted"] == 1
    snap = im.resolve_snapshot(root)
    parts = im.live_data_partitions(root, snap)
    new = {p: pv for p, pv in parts.items() if "/merge-" in p}
    assert sorted(pv["lang"] for pv in new.values()) == ["de", "it"]
    rows = _rows(spark, f"SELECT id, n FROM iceberg_scan('{root}') ORDER BY id")
    assert (3, 300) in rows and (7, 70) in rows


def test_apply_changelog_stamps_partitions(spark, lang_table):
    root, _ = lang_table
    changes = spark.createDataFrame(
        [
            (2, "en", 20, "delete"),
            (8, "pt", 80, "insert"),
        ],
        "id long, lang string, n long, _change_type string",
    )
    res = apply_changelog(spark, root, changes, "id", timestamp_ms=T1 + 1000)
    assert res["retracted"] == 1 and res["inserted"] == 1
    snap = im.resolve_snapshot(root)
    parts = im.live_data_partitions(root, snap)
    new = {p: pv for p, pv in parts.items() if "/changelog-" in p}
    assert [pv["lang"] for pv in new.values()] == ["pt"]


def test_update_on_day_partitioned_table_prunes(spark, tmp_path):
    """Temporal transform end-to-end: day(ts) partitioning survives an
    UPDATE — new files stamp the day ordinal and a later day-filtered
    DML scans one file."""
    root = str(tmp_path / "tday")
    t = LocalIcebergTable(
        root,
        pa.schema([("id", pa.int64()), ("ts", pa.timestamp("us", tz="UTC"))]),
        partition_by=[("ts", "day")],
    )
    d1 = datetime.datetime(2024, 6, 1, 10, tzinfo=datetime.timezone.utc)
    d2 = datetime.datetime(2024, 6, 2, 10, tzinfo=datetime.timezone.utc)
    t.append_snapshot(
        [pa.table({"id": pa.array([1, 2], pa.int64()),
                   "ts": pa.array([d1, d2], pa.timestamp("us", tz="UTC"))})],
        timestamp_ms=T1,
    )
    res = update_where(
        spark, root, "id >= 1", {"id": "id + 10"}, timestamp_ms=T1 + 1000
    )
    assert res["matched"] == 2
    snap = im.resolve_snapshot(root)
    new = {
        p: pv
        for p, pv in im.live_data_partitions(root, snap).items()
        if "/update-" in p
    }
    want = {
        str(transform_value("day", d1, "timestamptz")),
        str(transform_value("day", d2, "timestamptz")),
    }
    assert {list(pv.values())[0] for pv in new.values()} == want
    res2 = update_where(
        spark,
        root,
        "ts >= TIMESTAMP '2024-06-02 00:00:00' AND "
        "ts < TIMESTAMP '2024-06-03 00:00:00'",
        {"id": "id + 100"},
        timestamp_ms=T1 + 2000,
    )
    assert res2["matched"] == 1
    # the original day-2 file (live, rows position-deleted) + the
    # stamped update file for that day; day-1's update file is pruned
    assert res2["files_scanned"] == 2, res2


def test_update_on_bucket_partitioned_table_stamps_spec_hash(spark, tmp_path):
    """bucket[4](id) partitioning: the pandas-UDF fanout must stamp the
    SPEC's murmur3 bucket (not Spark's hash), proven by recomputing with
    bucket_value; a later key-filtered DML then prunes to that bucket's
    file."""
    from cloudfloe_spark.sources.partition_pruning import bucket_value

    root = str(tmp_path / "tbuck")
    t = LocalIcebergTable(
        root,
        pa.schema([("id", pa.int64()), ("v", pa.string())]),
        partition_by=[("id", "bucket[4]")],
    )
    t.append_snapshot(
        [pa.table({"id": list(range(8)), "v": [f"v{i}" for i in range(8)]})],
        timestamp_ms=T1,
    )
    res = update_where(
        spark, root, "id < 8", {"v": "upper(v)"}, timestamp_ms=T1 + 1000
    )
    assert res["matched"] == 8
    snap = im.resolve_snapshot(root)
    new = {
        p: pv
        for p, pv in im.live_data_partitions(root, snap).items()
        if "/update-" in p
    }
    assert new
    # recompute expected bucket membership per file from its rows
    import pyarrow.parquet as pq

    for p, pv in new.items():
        got_bucket = list(pv.values())[0]
        ids = pq.read_table(p.removeprefix("file://")).column("id").to_pylist()
        want = {str(bucket_value(i, 4, "long")) for i in ids}
        assert want == {got_bucket}, (p, pv, want)
    res2 = update_where(
        spark, root, "id = 5", {"v": "'five'"}, timestamp_ms=T1 + 2000
    )
    assert res2["matched"] == 1
    # id=5's bucket: the original bucket file + its stamped update file;
    # every other bucket's update file is pruned by the spec hash
    assert res2["files_scanned"] == 2, res2


def test_compaction_preserves_partition_tuples(spark, lang_table):
    """Partition-preserving compaction (r8): compacting a partitioned
    table after DML fans the rewrite out per partition tuple, so the
    compacted layout keeps pruning (pre-r8 the rewrite coalesced across
    partitions and erased every tuple)."""
    from cloudfloe_spark.sources.maintenance import compact_iceberg_table

    root, _ = lang_table
    update_where(
        spark, root, "lang = 'en'", {"n": "n + 1"}, timestamp_ms=T1 + 1000
    )
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 2000)

    snap = im.resolve_snapshot(root)
    parts = im.live_data_partitions(root, snap)
    assert parts and all(pv is not None for pv in parts.values()), parts
    langs = sorted(
        pv["lang"] if pv["lang"] is not None else "~null~"
        for pv in parts.values()
    )
    assert langs == ["de", "en", "fr", "~null~"]

    rows = _rows(spark, f"SELECT id, n FROM iceberg_scan('{root}') ORDER BY id")
    assert rows == [(1, 11), (2, 21), (3, 30), (4, 40), (5, 50), (6, 60)]

    # post-compaction partition-filtered DML: exactly one file scanned
    res = update_where(
        spark, root, "lang = 'fr'", {"n": "0"}, timestamp_ms=T1 + 3000
    )
    assert res["matched"] == 1
    assert res["files_scanned"] == 1, res
    assert res["files_total"] == 4


def test_compaction_sorted_and_partitioned(spark, lang_table):
    """sort_by composes with the fanout: each output file owns one
    partition value AND tight disjoint sort bounds."""
    from cloudfloe_spark.sources.maintenance import compact_iceberg_table

    root, _ = lang_table
    compact_iceberg_table(spark, root, timestamp_ms=T1 + 1000, sort_by=["id"])
    snap = im.resolve_snapshot(root)
    parts = im.live_data_partitions(root, snap)
    assert all(pv is not None for pv in parts.values())
    rows = _rows(spark, f"SELECT id, n FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5, 6]


def test_compaction_zorder_and_partitioned(spark, lang_table):
    """zorder_by composes with the partition fanout: output files keep
    their partition tuple (still prunable) and cluster on the z-code
    within each tuple; the helper z column never reaches the data files."""
    from cloudfloe_spark.sources.maintenance import compact_iceberg_table

    root, _ = lang_table
    compact_iceberg_table(
        spark, root, timestamp_ms=T1 + 1000, zorder_by=["id", "n"]
    )
    snap = im.resolve_snapshot(root)
    parts = im.live_data_partitions(root, snap)
    assert all(pv is not None for pv in parts.values())
    df = spark.read.parquet(*list(parts))
    assert "__cf_z" not in df.columns
    rows = _rows(spark, f"SELECT id, n FROM iceberg_scan('{root}') ORDER BY id")
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5, 6]


def test_streaming_sink_stamps_partitions(spark, lang_table, tmp_path):
    """The exactly-once streaming sink fans each micro-batch out per
    partition tuple on a partitioned table — streamed-in rows stay
    prunable without waiting for compaction."""
    from cloudfloe_spark.streaming.iceberg_sink import (
        append_stream_to_iceberg,
    )

    root, _ = lang_table
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [(10, "en", 100), (11, "pt", 110)], "id LONG, lang STRING, n LONG"
    ).coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema("id LONG, lang STRING, n LONG").parquet(src)
    res = append_stream_to_iceberg(
        sdf,
        root,
        checkpoint_dir=str(tmp_path / "ck"),
        timestamp_ms=T1 + 1000,
    )
    assert res["batches"] == 1
    snap = im.resolve_snapshot(root)
    new = {
        p: pv
        for p, pv in im.live_data_partitions(root, snap).items()
        if "/stream-" in p
    }
    assert sorted(pv["lang"] for pv in new.values()) == ["en", "pt"]
    rows = _rows(spark, f"SELECT id, n FROM iceberg_scan('{root}') ORDER BY id")
    assert (10, 100) in rows and (11, 110) in rows


def test_pruned_read_skips_nontargeting_delete_files(
    spark, lang_table, monkeypatch
):
    """Delete-FILE pruning on the read path (r8): after partition pruning
    cuts the scan to one partition, the merge-on-read anti-join applies
    only the delete files that NAME the surviving data files — a
    WHERE lang='de' read after an en-only DELETE reads ZERO delete
    parquet files, and a lang='en' read reads exactly the one."""
    from pyspark.sql.readwriter import DataFrameReader

    root, _ = lang_table
    res = delete_where_(spark, root, "lang = 'en' AND id = 1", timestamp_ms=T1 + 1000)
    assert res["matched"] == 1

    calls: list[tuple[str, ...]] = []
    orig = DataFrameReader.parquet

    def spy(self, *paths, **kw):
        calls.append(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    rows = _rows(
        spark,
        f"SELECT id, n FROM iceberg_scan('{root}') WHERE lang = 'de' "
        f"ORDER BY id",
    )
    assert rows == [(3, 30), (4, 40)]
    del_reads = [
        ps for ps in calls if any("/deletes-" in p for p in ps)
    ]
    assert del_reads == [], del_reads  # en's delete file never read

    calls.clear()
    rows = _rows(
        spark,
        f"SELECT id, n FROM iceberg_scan('{root}') WHERE lang = 'en' "
        f"ORDER BY id",
    )
    assert rows == [(2, 20)]  # id=1 deleted
    del_reads = [ps for ps in calls if any("/deletes-" in p for p in ps)]
    assert len(del_reads) == 1, del_reads
