"""Bucketed-table support: co-located joins and aggregations with no
exchange.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides on
the join key. Spark's table bucketing pre-shuffles AT WRITE TIME:
``bucketBy(n, key)`` hash-partitions rows into a fixed number of buckets
per partition directory, and records the layout in the catalog. A join or
aggregation keyed on the bucket columns then satisfies its distribution
requirement straight off the scan — ``.explain`` shows SortMergeJoin with
NO Exchange under either side (and no sort either, when ``sortBy`` matches
the join key). One shuffle paid once at ingest amortizes over every
downstream query — the batch analog of the reference's advice to keep
file counts sane (`reference/README.md:232`).

Caveats encoded here rather than left to folklore:
- Both join sides must have the SAME bucket count (Spark does not
  coalesce mismatched buckets by default).
- Bucket metadata lives in the session catalog (`saveAsTable``) — a plain
  ``.parquet(path)`` write silently drops bucketing.
- One file per bucket per task: repartition to the bucket count first so
  output is exactly ``n_buckets`` files, not tasks×buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet table.

    ``sort_cols`` defaulting to the bucket columns makes bucket files
    sort-merge-join-ready with zero runtime sort."""
    sort = sort_cols if sort_cols is not None else bucket_cols
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_tables_cojoin(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket columns — plans
    exchange-free when both layouts match."""
    return spark.table(left).join(spark.table(right), on)
