"""Round-trip tests for the non-parquet source/sink formats.

Pins: CSV and JSONL sinks preserve row sets and types under an explicit
schema; text-glob reads expose the (filename, content) relation with the
reference's ORDER BY filename DESC LIMIT 1 idiom (backend/main.py:476-480).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cloudfloe_spark.sources.formats import (
    latest_file_content,
    read_csv,
    read_jsonl,
    read_text_glob,
    write_csv,
    write_jsonl,
)
from cloudfloe_spark.sources.tables import load_table


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_csv_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "customer_csv")
    write_csv(src, path)
    back = read_csv(spark, path, src.schema)
    assert back.schema == src.schema
    cols = src.columns
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_csv_round_trip_timestamps(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_csv")
    write_csv(src, path, single_file=True)
    back = read_csv(spark, path, src.schema)
    cols = ["o_orderkey", "o_orderdate"]
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "supplier")
    path = str(tmp_path / "supplier_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, src.schema)
    assert back.schema == src.schema
    cols = src.columns
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_text_glob_filename_ordering(spark, tmp_path):
    # Mimic an Iceberg metadata/ directory: newest file must win by
    # lexical filename order, exactly like the reference's probe.
    meta = tmp_path / "metadata"
    meta.mkdir()
    for i, snap in [(1, 100), (2, 200), (3, 300)]:
        (meta / f"v{i}.metadata.json").write_text(
            json.dumps({"format-version": 2, "current-snapshot-id": snap})
        )
    df = read_text_glob(spark, str(meta / "*.metadata.json"))
    assert df.count() == 3
    newest = latest_file_content(spark, str(meta / "*.metadata.json"))
    assert json.loads(newest)["current-snapshot-id"] == 300


def test_text_glob_columns(spark, tmp_path):
    (tmp_path / "a.txt").write_text("hello\nworld")
    df = read_text_glob(spark, str(tmp_path / "*.txt"))
    row = df.collect()[0]
    assert row["filename"].endswith("a.txt")
    assert row["content"] == "hello\nworld"


def test_csv_sink_is_partition_parallel(spark, sf_dir, tmp_path):
    """Default (non-single-file) sink writes one file per partition —
    the property that makes the sink scale with executors."""
    src = load_table(spark, sf_dir, "lineitem").repartition(4)
    path = str(tmp_path / "li_csv")
    write_csv(src, path)
    files = [
        f
        for f in __import__("os").listdir(path)
        if f.startswith("part-") and f.endswith(".csv")
    ]
    assert len(files) == 4
    back = read_csv(spark, path, src.schema)
    assert back.count() == src.count()
