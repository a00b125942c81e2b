#!/usr/bin/env python
"""Seed a demo warehouse with an Iceberg v2 table — the analog of the
reference's ``scripts/upload_sample_data.py``.

The reference combines its sample parquet into one Arrow table and writes
it as Iceberg v2 to ``s3://<bucket>/warehouse/demo/movies`` via pyiceberg
+ MinIO, so DuckDB's path-based ``iceberg_scan()`` reads it without a
catalog (reference ``scripts/upload_sample_data.py:1-34``). This sandbox
has neither MinIO nor pyiceberg; the same outcome — an Iceberg v2 table a
path-based ``iceberg_scan('<root>')`` reads with no catalog and no
runtime jar — comes from the in-repo Iceberg layout writer
(:mod:`cloudfloe_spark.sources.iceberg_fixture`).

The demo table is seeded as TWO snapshots (an initial slice, then the
rest), so the demo connection exercises snapshot listings and
``VERSION AS OF`` time travel out of the box. Recorded URIs may carry any
fsio-served scheme via ``CLOUDFLOE_DEMO_URI_PREFIX`` (e.g. the
ViewFs-mounted ``s3://`` seam), mirroring the reference's object-store
target.

Usage: ``python scripts/seed_demo.py [warehouse_dir] [sf_dir]``
Prints one JSON line: the seeded table's connection payload (the
``/api/demo/connection`` shape) plus its snapshot ids.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMESPACE = os.environ.get("CLOUDFLOE_DEMO_NAMESPACE", "demo")
TABLE_NAME = os.environ.get("CLOUDFLOE_DEMO_TABLE_NAME", "documents")
URI_PREFIX = os.environ.get("CLOUDFLOE_DEMO_URI_PREFIX", "file://")
FIRST_SNAPSHOT_ROWS = 100


def seed(warehouse_dir: str, sf_dir: str) -> dict:
    """Write ``<warehouse>/<namespace>/<table>`` as a two-snapshot Iceberg
    v2 table from the fixture ``documents`` parquet; returns the demo
    payload."""
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    root = os.path.join(warehouse_dir, NAMESPACE, TABLE_NAME)
    t = LocalIcebergTable(root, src.schema, uri_prefix=URI_PREFIX)
    first = src.slice(0, FIRST_SNAPSHOT_ROWS)
    rest = src.slice(FIRST_SNAPSHOT_ROWS)
    s1 = t.append_snapshot([first], timestamp_ms=1700000000000)
    s2 = t.append_snapshot([rest], timestamp_ms=1700000100000)
    table_path = f"{URI_PREFIX}{root}" if URI_PREFIX != "file://" else root
    return {
        # /api/demo/connection payload shape (service/api.py)
        "connection": {
            "storageType": "local",
            "endpoint": "",
            "accessKey": "",
            "secretKey": "",
            "tablePath": table_path,
        },
        "suggestedQuery": (
            f"SELECT * FROM iceberg_scan('{table_path}') LIMIT 100"
        ),
        "snapshots": [str(s1), str(s2)],  # stringified: JS-unsafe 64-bit
        "rows": src.num_rows,
    }


def main() -> None:
    warehouse = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cloudfloe_demo_warehouse"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    print(json.dumps(seed(warehouse, sf_dir)))


if __name__ == "__main__":
    main()
