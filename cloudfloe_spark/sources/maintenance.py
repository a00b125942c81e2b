"""Table maintenance: small-file compaction.

The reference documents the small-file problem ("sluggish past ~10,000
files", `reference/README.md:232`) and ADVISES compaction in an error
message (`backend/main.py:405-413`) — but ships no tool. This module is
that tool for parquet-layout tables: rewrite a directory into
target-sized files.

At scale this is the operation that keeps scan task counts sane: file
listing, footer reads, and task-launch overhead are all O(files), and
1000-executor clusters stall on millions of tiny files long before data
volume matters. (For Iceberg tables with the runtime present, prefer the
built-in ``rewrite_data_files`` procedure — this is the path-table
equivalent.)
"""

from __future__ import annotations

import glob as globmod
import os

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # cluster-sized default


def plan_compaction(
    path: str, target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES
) -> dict:
    """Inspect a parquet dir: file count/bytes and the output file count a
    compaction would produce. Pure metadata — no Spark job."""
    files = sorted(globmod.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_files": max(1, -(-total // target_file_bytes)),
    }


def seed_demo_warehouse(
    root: str, sf_dir: str, *, rows_per_snapshot: int = 500
) -> dict:
    """Seed a local demo warehouse with a two-snapshot Iceberg v2 table
    (A16 analog of `reference/scripts/upload_sample_data.py`, which writes
    a pyiceberg table to MinIO — this sandbox has neither, so the table is
    written in the Iceberg layout directly via
    :mod:`~cloudfloe_spark.sources.iceberg_fixture`).

    Two snapshots on purpose: the demo then exercises the full no-runtime
    Iceberg surface — current-snapshot scan, ``VERSION AS OF`` time
    travel, and snapshot/file listings. Returns table root + snapshot ids.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    src = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    )
    table_root = os.path.join(root, "warehouse", "demo", "orders")
    t = LocalIcebergTable(
        table_root,
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_totalprice", pa.float64()),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    half = min(rows_per_snapshot, src.num_rows // 2)
    s1 = t.append_snapshot(
        [src.slice(0, half)], timestamp_ms=1700000000000
    )
    s2 = t.append_snapshot(
        [src.slice(half, half)], timestamp_ms=1700000100000
    )
    return {"root": table_root, "snapshots": [s1, s2]}


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    *,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite ``src`` (parquet dir) into ``dest`` with approximately
    target-sized files; optionally (re)partition by columns (hive layout)
    so downstream queries get partition pruning.

    Uses a repartition to the computed file count — one shuffle, which at
    the same time fixes row clustering destroyed by many small appends.
    Returns the before/after plan.
    """
    before = plan_compaction(src, target_file_bytes)
    df = spark.read.parquet(src)
    writer = df.repartition(before["target_files"]).write.mode("overwrite")
    if partition_by:
        # spread files within each hive partition instead of globally
        writer = (
            df.repartition(before["target_files"], *partition_by)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
        )
    writer.parquet(dest)
    return {"before": before, "after": plan_compaction(dest, target_file_bytes)}
