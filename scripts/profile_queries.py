#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds.

For each (or selected) HEADLINE query: time the DataFrame BUILD (Python
construction + analysis triggered by .schema), the noop-sink EXECUTION
(guide §1.4 — computes every column, no count-prune), and the bench-style
.count() execution; capture .explain("formatted") to plans/<tag>/.

Usage:
    python scripts/profile_queries.py [--tag r15_before] [--reps 3] [q1 q2 ...]

Prints one JSON line per query and a sorted summary. This is a
measurement tool only — bench.py remains the driver contract.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: bench HEADLINE)")
    ap.add_argument("--tag", default="profile", help="plans/<tag>/ output dir")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sink", choices=["noop", "count"], default="count")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from bench import HEADLINE
    from cloudfloe_spark.queries import all_queries
    from cloudfloe_spark.session import get_spark
    from cloudfloe_spark.sources.tables import load_table

    names = args.names or HEADLINE
    spark = get_spark(app_name="cloudfloe-profile")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = all_queries()

    for t in ("lineitem", "orders", "customer", "documents", "embeddings", "events"):
        load_table(spark, SF_DIR, t).count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    if not args.no_plans:
        os.makedirs(plans_dir, exist_ok=True)

    results = {}
    for name in names:
        fn = catalog[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm-up (codegen + planning caches), untimed — mirrors bench.py
        fn(spark, SF_DIR).count()

        builds, execs = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.schema  # force analysis
            t1 = time.perf_counter()
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)

        if not args.no_plans:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(
                os.path.join(plans_dir, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())

        row = {
            "query": name,
            "build_med": round(statistics.median(builds), 3),
            "exec_med": round(statistics.median(execs), 3),
            "total_med": round(
                statistics.median([b + e for b, e in zip(builds, execs)]), 3
            ),
            "execs": [round(e, 3) for e in execs],
        }
        results[name] = row
        print(json.dumps(row), flush=True)
        spark.sparkContext.setJobDescription(None)

    print("\n=== sorted by total_med ===")
    for name, row in sorted(results.items(), key=lambda kv: -kv[1]["total_med"]):
        print(
            f"{row['total_med']:7.3f}  (build {row['build_med']:6.3f} "
            f"+ exec {row['exec_med']:6.3f})  {name}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
