"""MERGE ``WHEN NOT MATCHED BY SOURCE`` (r9 — VERDICT r08 #2): the
full-table-sync clause Spark/Iceberg MERGE has. Target rows absent from
the source are deleted (or rewritten with t.-side assignments), optionally
gated by a condition, in the SAME atomic commit as the matched updates and
unmatched-source inserts — the one-statement mirror `replication.py`
previously emulated with CDC netting.

Reference parity: the reference has no DML at all (backend/main.py is
read-only); this matches Spark SQL's MERGE semantics (SPARK-40921), with
the final states verified against a DuckDB full-outer-join oracle.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.sources import iceberg_meta as im
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.maintenance import (
    MergeCardinalityError,
    merge_into,
)

T1 = 1700000000000

TARGET = {"k": [1, 2, 3, 4, 5, 6], "v": list("abcdef"),
          "n": [10, 20, 30, 40, 50, 60]}
SOURCE = [(2, "B", 5), (4, "D", 7), (7, "G", 70), (8, "H", 80)]


def _cfg():
    return ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )


def _rows(spark, sql):
    return run_query(spark, sql, _cfg()).rows


def _target(tmp_path, name="tsync", two_files=True):
    root = str(tmp_path / name)
    t = LocalIcebergTable(
        root,
        pa.schema([("k", pa.int64()), ("v", pa.string()), ("n", pa.int64())]),
    )
    if two_files:
        batches = [
            pa.table({c: TARGET[c][:3] for c in TARGET}),
            pa.table({c: TARGET[c][3:] for c in TARGET}),
        ]
    else:
        batches = [pa.table(TARGET)]
    t.append_snapshot(batches, timestamp_ms=T1)
    return root


def _source_df(spark):
    return spark.createDataFrame(SOURCE, "k LONG, v STRING, n LONG")


def _oracle_full_sync():
    """DuckDB full-outer oracle for the three-clause MERGE: matched →
    (s.v, t.n + s.n); source-only → insert as-is; target-only → delete."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tgt AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({k}, '{v}', {n})"
            for k, v, n in zip(TARGET["k"], TARGET["v"], TARGET["n"])
        )
        + ") AS x(k, v, n)"
    )
    con.execute(
        "CREATE TABLE src AS SELECT * FROM (VALUES "
        + ", ".join(f"({k}, '{v}', {n})" for k, v, n in SOURCE)
        + ") AS x(k, v, n)"
    )
    rows = con.execute(
        """
        SELECT COALESCE(t.k, s.k) AS k,
               s.v AS v,
               CASE WHEN t.k IS NOT NULL THEN t.n + s.n ELSE s.n END AS n
        FROM tgt t FULL OUTER JOIN src s ON t.k = s.k
        WHERE s.k IS NOT NULL
        ORDER BY k
        """
    ).fetchall()
    con.close()
    return [list(r) for r in rows]


@pytest.mark.parametrize("mode", ["merge-on-read", "copy-on-write"])
def test_merge_full_sync_one_commit(spark, tmp_path, mode):
    """Matched update + unmatched insert + not-matched-by-source delete in
    ONE commit, both physical modes, vs the DuckDB full-outer oracle."""
    root = _target(tmp_path, f"tsync_{mode[:3]}")
    n_snaps_before = len(im.load_metadata(root)["snapshots"])
    res = merge_into(
        spark,
        root,
        _source_df(spark),
        "k",
        when_matched={"v": "s.v", "n": "t.n + s.n"},
        when_not_matched_by_source="delete",
        timestamp_ms=T1 + 1000,
        mode=mode,
    )
    assert res["matched"] == 2
    assert res["inserted"] == 2
    assert res["not_matched_by_source"] == 4
    got = _rows(
        spark, f"SELECT k, v, n FROM iceberg_scan('{root}') ORDER BY k"
    )
    assert got == _oracle_full_sync()
    # exactly ONE new snapshot — the sync is atomic
    assert len(im.load_metadata(root)["snapshots"]) == n_snaps_before + 1
    if mode == "copy-on-write":
        # the table stays delete-file-free
        agg = _rows(
            spark,
            f"""SELECT BOOL_OR(manifest_content <> 'DATA') AS has_deletes
                FROM iceberg_metadata('{root}')""",
        )
        assert agg == [[False]]


@pytest.mark.parametrize("mode", ["merge-on-read", "copy-on-write"])
def test_merge_nms_update_assignments(spark, tmp_path, mode):
    """NMS as ASSIGNMENTS: target rows absent from the source are rewritten
    in place (mark-stale idiom) instead of deleted."""
    root = _target(tmp_path, f"tstale_{mode[:3]}")
    res = merge_into(
        spark,
        root,
        _source_df(spark),
        "k",
        when_matched={"v": "s.v"},
        insert_unmatched=False,
        when_not_matched_by_source={"v": "'stale'", "n": "t.n * -1"},
        timestamp_ms=T1 + 1000,
        mode=mode,
    )
    assert res["matched"] == 2 and res["inserted"] == 0
    assert res["not_matched_by_source"] == 4
    got = _rows(
        spark, f"SELECT k, v, n FROM iceberg_scan('{root}') ORDER BY k"
    )
    assert got == [
        [1, "stale", -10],
        [2, "B", 20],
        [3, "stale", -30],
        [4, "D", 40],
        [5, "stale", -50],
        [6, "stale", -60],
    ]


@pytest.mark.parametrize("mode", ["merge-on-read", "copy-on-write"])
def test_merge_nms_condition_gates_the_clause(spark, tmp_path, mode):
    """The optional condition: only non-matching rows satisfying it are
    touched; a NULL/false condition keeps the row (WHERE semantics)."""
    root = _target(tmp_path, f"tcond_{mode[:3]}")
    res = merge_into(
        spark,
        root,
        _source_df(spark),
        "k",
        when_matched={"v": "s.v"},
        insert_unmatched=False,
        when_not_matched_by_source="delete",
        not_matched_by_source_condition="t.n >= 50",
        timestamp_ms=T1 + 1000,
        mode=mode,
    )
    # non-matching rows are k=1,3,5,6 (n=10,30,50,60); condition keeps 5,6
    assert res["not_matched_by_source"] == 2
    got = _rows(spark, f"SELECT k FROM iceberg_scan('{root}') ORDER BY k")
    assert [r[0] for r in got] == [1, 2, 3, 4]


def test_merge_nms_cardinality_guard_still_applies(spark, tmp_path):
    root = _target(tmp_path, "tdupnms")
    src = spark.createDataFrame(
        [(2, "x", 1), (2, "y", 2)], "k LONG, v STRING, n LONG"
    )
    with pytest.raises(MergeCardinalityError):
        merge_into(
            spark, root, src, "k",
            when_matched={"v": "s.v"},
            when_not_matched_by_source="delete",
            timestamp_ms=T1 + 1000,
        )
    assert len(im.load_metadata(root)["snapshots"]) == 1


def test_merge_nms_time_travel_preserves_presync_state(spark, tmp_path):
    root = _target(tmp_path, "ttt")
    s1 = im.resolve_snapshot(root)["snapshot-id"]
    merge_into(
        spark, root, _source_df(spark), "k",
        when_matched={"v": "s.v", "n": "t.n + s.n"},
        when_not_matched_by_source="delete",
        timestamp_ms=T1 + 1000,
    )
    old = _rows(
        spark,
        f"SELECT COUNT(*) FROM iceberg_scan('{root}') VERSION AS OF {s1}",
    )
    assert old == [[6]]


def test_merge_nms_validation_errors(spark, tmp_path):
    root = _target(tmp_path, "tval")
    src = _source_df(spark)
    with pytest.raises(ValueError, match="must be 'delete'"):
        merge_into(
            spark, root, src, "k",
            when_not_matched_by_source="truncate",
            timestamp_ms=T1 + 1000,
        )
    with pytest.raises(ValueError, match="unknown columns"):
        merge_into(
            spark, root, src, "k",
            when_not_matched_by_source={"zzz": "1"},
            timestamp_ms=T1 + 1000,
        )
    with pytest.raises(ValueError, match="requires"):
        merge_into(
            spark, root, src, "k",
            not_matched_by_source_condition="t.n > 0",
            timestamp_ms=T1 + 1000,
        )
    # nothing committed by any rejected call
    assert len(im.load_metadata(root)["snapshots"]) == 1


def test_merge_nms_noop_when_everything_matches(spark, tmp_path):
    """A source covering every target key deletes nothing; the clause is
    inert (and the result still reports 0)."""
    root = _target(tmp_path, "tnoop", two_files=False)
    src = spark.createDataFrame(
        [(k, v, n) for k, v, n in zip(TARGET["k"], TARGET["v"], TARGET["n"])],
        "k LONG, v STRING, n LONG",
    )
    res = merge_into(
        spark, root, src, "k",
        insert_unmatched=False,
        when_not_matched_by_source="delete",
        timestamp_ms=T1 + 1000,
    )
    assert res["not_matched_by_source"] == 0
    got = _rows(spark, f"SELECT COUNT(*) FROM iceberg_scan('{root}')")
    assert got == [[6]]
