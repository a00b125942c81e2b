"""Incremental curation end-to-end: the 100-TB operating loop.

A training-data pipeline does NOT rescan the corpus per run — it reads
only the rows appended since its last processed snapshot
(``iceberg_changes``), pushes them through the curation operators, and
appends the survivors. This test drives that composition through the real
service surface (validated SQL → snapshot-pinned jarless Iceberg reads →
the same fingerprint/quality expressions the catalog operators use),
proving the pieces compose — not just pass their individual oracles.
"""

from __future__ import annotations

import pyarrow as pa

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.engine import run_query
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

T1, T2 = 1700000000000, 1700000100000


def _cfg():
    return ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )


def _docs(ids_texts):
    return pa.table(
        {
            "doc_id": pa.array([i for i, _ in ids_texts], pa.int64()),
            "text": pa.array([t for _, t in ids_texts], pa.string()),
        }
    )


def test_incremental_batch_dedups_only_new_docs(spark, tmp_path):
    """Two commits; the curation pass over iceberg_changes(s1, s2) must
    see EXACTLY the second batch, dedup within it, and flag
    already-ingested content via an anti-join against the s1 snapshot —
    without rescanning snapshot-1 rows as candidates."""
    root = str(tmp_path / "docs_tbl")
    t = LocalIcebergTable(
        root, pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    )
    s1 = t.append_snapshot(
        [_docs([(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")])],
        timestamp_ms=T1,
    )
    s2 = t.append_snapshot(
        [
            _docs(
                [
                    (4, "epsilon zeta"),  # genuinely new
                    (5, "epsilon zeta"),  # dup WITHIN the new batch
                    (6, "gamma delta"),  # dup of an ALREADY-INGESTED doc
                ]
            )
        ],
        timestamp_ms=T2,
    )

    # 1) The incremental read surfaces only the appended rows.
    resp = run_query(
        spark,
        f"SELECT doc_id FROM iceberg_changes('{root}', {s1}, {s2}) "
        "ORDER BY doc_id",
        _cfg(),
    )
    assert [r[0] for r in resp.rows] == [4, 5, 6]

    # 2) The curation pass: fingerprint the new batch, keep one
    # representative per new fingerprint, and drop content whose
    # fingerprint already exists in the processed snapshot (s1) — the
    # decontamination anti-join runs against fingerprints, never text.
    resp = run_query(
        spark,
        f"""
        WITH new_batch AS (
            SELECT doc_id, md5(text) AS fp
            FROM iceberg_changes('{root}', {s1}, {s2})
        ),
        seen AS (
            SELECT DISTINCT md5(text) AS fp
            FROM iceberg_scan('{root}') VERSION AS OF {s1}
        ),
        fresh AS (
            SELECT n.doc_id, n.fp
            FROM new_batch n LEFT JOIN seen s ON n.fp = s.fp
            WHERE s.fp IS NULL
        )
        SELECT fp, MIN(doc_id) AS keep_doc, COUNT(*) AS n_copies
        FROM fresh GROUP BY fp ORDER BY keep_doc
        """,
        _cfg(),
    )
    # doc 6 duplicates already-ingested content → dropped by the
    # anti-join; docs 4+5 collapse to one representative (4).
    assert [tuple(r) for r in resp.rows] == [
        (resp.rows[0][0], 4, 2),
    ]
    assert resp.stats.bytesScanned > 0


def test_incremental_read_rejects_rewritten_history(spark, tmp_path):
    """If compaction rewrote files inside the range, the append-only
    incremental contract is violated and the service must 400 (silently
    re-reading rewritten rows would double-count downstream)."""
    import os

    import pytest

    from cloudfloe_spark.service.errors import CloudfloeError
    from cloudfloe_spark.sources.iceberg_fixture import commit_rewrite_snapshot

    root = str(tmp_path / "docs_rw")
    t = LocalIcebergTable(
        root, pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    )
    s1 = t.append_snapshot([_docs([(1, "a"), (2, "b")])], timestamp_ms=T1)
    # external compaction rewrite: same rows, new file
    import pyarrow.parquet as pq

    newfile = os.path.join(root, "data", "rewritten.parquet")
    pq.write_table(_docs([(1, "a"), (2, "b")]), newfile)
    s2 = commit_rewrite_snapshot(
        root, [(newfile, 2)], timestamp_ms=T2
    )
    with pytest.raises(CloudfloeError):
        run_query(
            spark,
            f"SELECT doc_id FROM iceberg_changes('{root}', {s1}, {s2})",
            _cfg(),
        )


def test_curated_output_publishes_as_iceberg_table(spark, tmp_path):
    """The write half of the loop: survivors of a curation pass are
    PUBLISHED as a fresh Iceberg table (fixture writer), immediately
    readable back through iceberg_scan / iceberg_snapshots — so the next
    pipeline stage consumes a snapshot-pinned table, not loose parquet."""
    import pyarrow.parquet as pq

    src_root = str(tmp_path / "raw_docs")
    t = LocalIcebergTable(
        src_root, pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    )
    t.append_snapshot(
        [
            _docs(
                [
                    (1, "alpha beta"),
                    (2, "alpha beta"),  # dup of 1
                    (3, "gamma delta"),
                ]
            )
        ],
        timestamp_ms=T1,
    )

    # curation pass through the service: keep one doc per fingerprint
    resp = run_query(
        spark,
        f"""
        SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
        FROM iceberg_scan('{src_root}')
        GROUP BY md5(text)
        ORDER BY doc_id
        """,
        _cfg(),
    )
    survivors = [(r[0], r[1]) for r in resp.rows]
    assert [d for d, _ in survivors] == [1, 3]

    # publish as a NEW Iceberg table
    out_root = str(tmp_path / "curated_docs")
    out = LocalIcebergTable(
        out_root, pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    )
    out.append_snapshot([_docs(survivors)], timestamp_ms=T2)

    # the published table is a first-class Iceberg source again
    resp2 = run_query(
        spark,
        f"SELECT doc_id, text FROM iceberg_scan('{out_root}') ORDER BY doc_id",
        _cfg(),
    )
    assert [tuple(r) for r in resp2.rows] == survivors
    snaps = run_query(
        spark, f"SELECT snapshot_id FROM iceberg_snapshots('{out_root}')", _cfg()
    )
    assert len(snaps.rows) == 1


def test_streaming_ingest_then_retroactive_dedup_loop(spark, tmp_path):
    """The r6 loop closed end-to-end: documents STREAM into the Iceberg
    table (exactly-once epoch commits), exact duplicates are detected
    through the validated query surface (fingerprint window over
    iceberg_scan), retro-actively removed with delete_where (no data-file
    rewrite), and compaction materializes the curated corpus — every
    write-side piece composing with the read surface it will meet in
    production."""
    import os

    from cloudfloe_spark.sources import iceberg_meta as im
    from cloudfloe_spark.sources.maintenance import (
        compact_iceberg_table,
        delete_where,
    )
    from cloudfloe_spark.streaming.iceberg_sink import (
        append_stream_to_iceberg,
    )

    root = str(tmp_path / "docs_stream")
    t = LocalIcebergTable(
        root, pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    )
    t.append_snapshot(
        [_docs([(1, "the quick brown fox"), (2, "unique seed doc")])],
        timestamp_ms=T1,
    )

    # two source files → two streamed batches; doc 11 duplicates doc 1
    src = str(tmp_path / "src")
    os.makedirs(src)
    for rows in (
        [(10, "freshly crawled page"), (11, "the quick brown fox")],
        [(12, "another new page")],
    ):
        spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(
            1
        ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    append_stream_to_iceberg(
        sdf, root, checkpoint_dir=str(tmp_path / "ck"), timestamp_ms=T2
    )

    # duplicate detection through the VALIDATED query surface
    dup_rows = run_query(
        spark,
        f"""
        SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER (
                PARTITION BY md5(trim(regexp_replace(lower(text), '\\\\s+', ' ')))
                ORDER BY doc_id
            ) AS rn
            FROM iceberg_scan('{root}')
        ) WHERE rn > 1
        """,
        _cfg(),
    ).rows
    dup_ids = sorted(r[0] for r in dup_rows)
    assert dup_ids == [11]

    res = delete_where(
        spark,
        root,
        f"doc_id IN ({','.join(str(i) for i in dup_ids)})",
        timestamp_ms=T2 + 5000,
    )
    assert res["matched"] == 1
    compact_iceberg_table(spark, root, timestamp_ms=T2 + 6000)
    final = run_query(
        spark,
        f"SELECT doc_id FROM iceberg_scan('{root}') ORDER BY doc_id",
        _cfg(),
    ).rows
    assert [r[0] for r in final] == [1, 2, 10, 12]
    assert im.position_delete_paths(root, im.resolve_snapshot(root)) == []


def test_second_ingest_query_not_deduped_and_replay_still_skipped(
    spark, tmp_path
):
    """Exactly-once must key on (query id, epoch id), not epoch id alone:
    a SECOND ingest query into the same table (fresh checkpoint) restarts
    its epochs at 0 — its batches must COMMIT, must not overwrite the
    first query's committed data files, while a true replay (same
    checkpoint re-drained) is still skipped."""
    import os

    from cloudfloe_spark.streaming.iceberg_sink import (
        append_stream_to_iceberg,
        committed_batches,
    )

    root = str(tmp_path / "docs_2q")
    t = LocalIcebergTable(
        root, pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    )
    t.append_snapshot([_docs([(1, "seed doc")])], timestamp_ms=T1)

    schema = "doc_id LONG, text STRING"

    def _stream_src(name, rows):
        src = str(tmp_path / name)
        os.makedirs(src)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    ck1 = str(tmp_path / "ck1")
    r1 = append_stream_to_iceberg(
        _stream_src("src1", [(10, "first query batch")]),
        root,
        checkpoint_dir=ck1,
        timestamp_ms=T2,
    )
    assert r1 == {"batches": 1, "skipped": 0}

    # second query, fresh checkpoint → epoch ids restart at 0; keying on
    # the epoch alone would silently skip this batch (data loss)
    r2 = append_stream_to_iceberg(
        _stream_src("src2", [(20, "second query batch")]),
        root,
        checkpoint_dir=str(tmp_path / "ck2"),
        timestamp_ms=T2 + 1000,
    )
    assert r2 == {"batches": 1, "skipped": 0}

    # replay of query 1 from its own checkpoint: nothing new → 0 commits,
    # and the drained-source replay (if any) dedups rather than re-commits
    r1b = append_stream_to_iceberg(
        spark.readStream.schema(
            spark.read.parquet(str(tmp_path / "src1")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src1")),
        root,
        checkpoint_dir=ck1,
        timestamp_ms=T2,
    )
    assert r1b["batches"] == 0

    pairs = committed_batches(root)
    assert len(pairs) == 2
    qids = {q for q, _ in pairs}
    assert len(qids) == 2 and None not in qids
    assert {e for _, e in pairs} == {0}  # both queries committed epoch 0

    final = run_query(
        spark,
        f"SELECT doc_id FROM iceberg_scan('{root}') ORDER BY doc_id",
        _cfg(),
    ).rows
    assert [r[0] for r in final] == [1, 10, 20]
