"""Streaming ingest INTO Iceberg: the write half of the streaming story.

``append_stream_to_iceberg`` runs a streaming DataFrame through
``foreachBatch`` and commits each micro-batch as an Iceberg APPEND snapshot
(via :func:`iceberg_fixture.commit_row_delta_snapshot` with no delete
files), recording the epoch id in the snapshot summary. On restart from
the same checkpoint, Structured Streaming MAY replay the last batch —
the sink dedups by epoch id (already-committed batch ids are skipped),
giving the exactly-once table state Spark's own Iceberg sink provides
through the same idempotent-commit construction.

Scale shape: each batch's rows are written as parquet by a DISTRIBUTED
Spark job (files sized by the batch, not the table); the commit is a
driver-side metadata append reading only parquet footers. Snapshot
history therefore grows one per batch — run
``maintenance.compact_iceberg_table`` / ``expire_snapshots`` on the
usual schedule, exactly as Iceberg deployments do.
"""

from __future__ import annotations

import glob as globmod
import os

from pyspark.sql import DataFrame


def committed_epochs(root: str) -> set[int]:
    """Epoch ids already committed to the table (from snapshot summaries)."""
    from cloudfloe_spark.sources import iceberg_meta as im

    try:
        meta = im.load_metadata(root)
    except im.IcebergMetadataError:
        return set()
    out = set()
    for s in meta.get("snapshots", []):
        e = (s.get("summary") or {}).get("streaming-epoch-id")
        if e is not None:
            out.add(int(e))
    return out


def append_stream_to_iceberg(
    sdf: DataFrame,
    root: str,
    *,
    checkpoint_dir: str,
    timestamp_ms: int,
    timeout_s: int = 180,
) -> dict:
    """Drain ``sdf`` (Trigger.AvailableNow) into the Iceberg table at
    ``root``, one APPEND snapshot per micro-batch, exactly-once by epoch
    id. The table must already exist (seed it with
    ``LocalIcebergTable.append_snapshot`` — the sink appends, it does not
    create). Returns ``{"batches": n_committed, "skipped": n_deduped}``.
    """
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot,
    )

    seen = committed_epochs(root)
    stats = {"batches": 0, "skipped": 0}

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in seen:
            stats["skipped"] += 1
            return
        out_dir = os.path.join(root, "data", f"stream-{epoch_id:010d}")
        # overwrite, not errorifexists: a crash between write and commit
        # leaves a half-written dir; the replayed epoch must supersede it
        # (the commit is what makes a batch visible — overwriting an
        # uncommitted dir is the exactly-once recovery path)
        batch_df.write.mode("overwrite").parquet(out_dir)
        files = []
        for f in sorted(globmod.glob(os.path.join(out_dir, "*.parquet"))):
            cnt = pq.ParquetFile(f).metadata.num_rows
            if cnt:
                files.append((f, cnt))
        if not files:
            return
        commit_row_delta_snapshot(
            root,
            new_data_files=files,
            timestamp_ms=timestamp_ms + epoch_id,
            summary_extra={"streaming-epoch-id": str(epoch_id)},
        )
        seen.add(epoch_id)
        stats["batches"] += 1

    q = (
        sdf.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"append_stream_to_iceberg: drain exceeded {timeout_s}s"
        )
    return stats
