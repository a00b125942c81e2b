"""Non-parquet source/sink formats: CSV, JSON-lines, and text-glob reads.

Reference surface being re-expressed (SURVEY.md §2C "Scans / sources /
sinks"):
- CSV export — client-side in the reference (frontend/js/app.js:450-479);
  here also a distributed sink (``df.write.csv``) for results too large to
  materialize through the HTTP layer.
- JSON rows — the reference's wire format (backend/main.py:588-611); the
  JSONL sink is its distributed counterpart.
- ``read_text('…/*.metadata.json') ORDER BY filename DESC LIMIT 1`` —
  the reference's newest-metadata-file probe (backend/main.py:476-480);
  ``read_text_glob`` reproduces the (filename, content) relation with
  ``input_file_name`` so the same ORDER BY works in Spark SQL.

Scale notes: every writer here is executor-parallel (one file per
partition); readers take an explicit schema so no inference job runs over
100 TB of text. ``single_file=True`` exists for small exports only — it
coalesces to one partition, which serializes the write and must never be
used on large results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink with header; timestamps serialized in the reference's
    ISO-8601 style (UTC session TZ assumed, reference backend/main.py:494)."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema'd CSV read — explicit schema keeps scans single-pass (no
    inference job) and types stable across engines."""
    return (
        spark.read.option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .schema(schema)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines sink — the distributed analog of the reference's JSON
    rows wire format."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_text_glob(spark: SparkSession, glob: str) -> DataFrame:
    """Whole-line text read over a glob as a (filename, content) relation —
    the Spark form of DuckDB ``read_text`` (reference backend/main.py:476:
    ``SELECT content FROM read_text(?) ORDER BY filename DESC LIMIT 1``).

    ``wholetext`` concatenates each file into one row so multi-line JSON
    metadata files stay intact; ``input_file_name`` supplies the filename
    ordering column.
    """
    return (
        spark.read.text(glob, wholetext=True)
        .select(
            F.input_file_name().alias("filename"),
            F.col("value").alias("content"),
        )
    )


def latest_file_content(spark: SparkSession, glob: str) -> str | None:
    """The reference's newest-metadata-file idiom: lexically-last filename
    wins (works for both pyiceberg ``NNNNN-uuid`` and Spark ``vN`` metadata
    naming, reference backend/main.py:474-475)."""
    rows = (
        read_text_glob(spark, glob)
        .orderBy(F.desc("filename"))
        .limit(1)
        .collect()
    )
    return rows[0]["content"] if rows else None
