"""Build/exec split profiler for the iceberg/geo query family (guide §1).

Times each entry's BUILD (Python query construction: metadata resolve,
view registration) separately from EXEC (noop-sink computation, guide
§1.4), three execs per entry, medians printed as one JSON line each.

Usage: python tools/profile_iceberg.py [query ...]   (default: the family)
"""

import json
import statistics
import sys
import time

QUERIES = [
    "iceberg_shredded_dml_scan",
    "iceberg_v3_defaults_scan",
    "iceberg_v3_dv_scan",
    "iceberg_v3_variant_scan",
    "iceberg_cdc_lineage_compaction",
    "iceberg_geo_scan_pushdown",
    "geo_geography_wrap_scan",
    "cdc_doc_changelog",
    "iceberg_v3_branch_dml_scan",
    "iceberg_zorder_scan",
    "iceberg_cow_dml_scan",
    "iceberg_matview_incremental",
    "iceberg_matview_join_both_moved",
    "merge_full_table_sync",
    "iceberg_variant_dml_scan",
    "iceberg_variant_typed_pushdown",
    "iceberg_geometry_bbox_scan",
    "iceberg_v3_timestamp_ns_scan",
    "iceberg_shredded_renamed_scan",
    "geo_haversine_nearest",
]


def main() -> None:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cloudfloe_spark.queries import all_queries
    from cloudfloe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    names = sys.argv[1:] or QUERIES
    cat = all_queries()
    rows = []
    for name in names:
        q = cat[name]
        builds, execs = [], []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"profile {name} #{i}")
            t0 = time.monotonic()
            df = q.fn(spark, sf_dir)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        rec = {
            "query": name,
            "build_med": round(statistics.median(builds), 3),
            "exec_med": round(statistics.median(execs), 3),
            "total_med": round(
                statistics.median(builds) + statistics.median(execs), 3
            ),
            "builds": [round(b, 3) for b in builds],
            "execs": [round(e, 3) for e in execs],
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    print("\n=== sorted by total_med ===")
    for r in sorted(rows, key=lambda r: -r["total_med"]):
        print(
            f"  {r['total_med']:6.3f}  (build {r['build_med']:6.3f}"
            f" + exec {r['exec_med']:6.3f})  {r['query']}"
        )


if __name__ == "__main__":
    main()
