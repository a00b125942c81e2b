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
