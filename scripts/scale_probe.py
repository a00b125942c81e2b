#!/usr/bin/env python
"""Scaling probe: measure headline operators at 1x/2x/4x/8x of sf0.1.

Builds scaled fixture copies by unioning the sf0.1 tables N times with
key remapping (so join cardinalities and dedup groups scale realistically
instead of collapsing onto identical keys), then times a representative
query per operator family at each scale. Near-linear wall-clock growth —
on a fixed local core budget — is the evidence that the plans are
scan/shuffle-bound (the property that transfers to a real cluster, where
the core budget grows with the data).

Usage: python scripts/scale_probe.py [max_scale] [out_dir]
Prints one JSON line per scale plus a final ratio summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudfloe_spark.queries import all_queries  # noqa: E402
from cloudfloe_spark.session import get_spark  # noqa: E402
from cloudfloe_spark.sources.tables import TABLES, load_table  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY_OFFSET = 1_000_000_000

# table → columns to remap per replica (keep joins 1:1 across replicas)
REMAP: dict[str, list[str]] = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

PROBE_QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "dedup_minhash_lsh_pairs",
    "asof_last_purchase_before_click",
    "window_range_90d_revenue",
    # round-2 additions: iterative graph + ANN + chunking families
    "dedup_minhash_clusters",
    "sim_ivf_ann_topk",
    "text_chunk_windows",
    # round-3: the O(log n) star-contraction variant — its advantage is
    # round count at scale, so growth ratios are the evidence that matters
    "dedup_clusters_star",
]


def build_scale(spark, n: int, out_dir: str) -> str:
    dest = os.path.join(out_dir, f"x{n}")
    if os.path.isdir(dest):
        return dest
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        src = load_table(spark, BASE_SF, t)
        if t in REMAP and n > 1:
            parts = []
            for i in range(n):
                p = src
                for col in REMAP[t]:
                    p = p.withColumn(col, F.col(col) + F.lit(i * KEY_OFFSET))
                parts.append(p)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        else:
            df = src
        df.write.mode("overwrite").parquet(os.path.join(dest, f"{t}.parquet"))
    return dest


def main() -> None:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cloudfloe_scale_probe"
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = all_queries()

    scales = [n for n in (1, 2, 4, 8) if n <= max_scale]
    results: dict[int, dict[str, float]] = {}
    for n in scales:
        sf_dir = build_scale(spark, n, out_dir)
        timings: dict[str, float] = {}
        for name in PROBE_QUERIES:
            fn = catalog[name].fn
            fn(spark, sf_dir).count()  # warm (plan + codegen)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
        results[n] = timings
        print(json.dumps({"scale": n, "queries": timings}), flush=True)

    base = results[scales[0]]
    summary = {
        name: {
            f"x{n}": round(results[n][name] / max(base[name], 1e-9), 2)
            for n in scales
        }
        for name in PROBE_QUERIES
    }
    print(json.dumps({"metric": "scale_ratios", "ratios": summary}))
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
