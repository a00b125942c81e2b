#!/usr/bin/env python
"""Derive per-query cost-surface weights for bench.py's norm_version-3
normalization (r10, VERDICT r9 #2).

Why: the v2 normalization divided every query by the MEAN of the three
calibration probes (scan / shuffle / cpu). Host drift on this shared VM is
ASYMMETRIC across those surfaces (r9 measured scan 0.67x vs cpu 1.92x in
one run), so the mean inflates cpu-bound queries and deflates scan-bound
ones — it manufactured an apparent +39% regression on
``dedup_minhash_signatures`` in r8 and an apparent +18% total in r9, both
diagnosed as artifacts. v3 normalizes each query by the WEIGHTED factor of
the probes matching its own cost mix.

How the weights are estimated (one calibration run, checked in as
``bench_weights.json`` — deterministic inputs, re-run only when the
headline set changes):

- Spark's REST status API (UI enabled for this run only) exposes per-stage
  ``inputBytes`` / ``shuffleReadBytes`` / ``shuffleWriteBytes``. Queries
  run sequentially, so the DELTA of the cumulative sums around one query
  is that query's byte footprint. Bytes are deterministic — host drift
  cannot touch them.
- The scan and shuffle probes' own byte footprints give reference RATES:
  ``R_scan = scan_probe_bytes / REF_PROBES['scan']`` (bytes per second at
  reference-machine speed), likewise shuffle.
- Per query: ``t_scan = input_bytes / R_scan``, ``t_shuffle =
  shuffle_bytes / R_shuffle``, and the remainder of the query's
  drift-corrected wall time is attributed to cpu (floored at 5% — every
  query executes SOME codegen). If the byte-derived parts overshoot the
  wall time (rates are approximations), they are rescaled to fit.
- Weights = the three parts normalized to sum 1.

Run:  python scripts/bench_calibrate.py            (writes bench_weights.json)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (HEADLINE, REF_PROBES, _make_probes, SF_DIR)

CPU_FLOOR = 0.05  # every query gets at least 5% cpu weight


def _rest_totals(ui_url: str) -> dict[str, int]:
    """Cumulative input/shuffle byte sums over all completed stages."""
    apps = json.load(
        urllib.request.urlopen(f"{ui_url}/api/v1/applications", timeout=10)
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        )
    )
    out = {"input": 0, "shuffle": 0}
    for s in stages:
        out["input"] += int(s.get("inputBytes") or 0)
        out["shuffle"] += int(s.get("shuffleReadBytes") or 0) + int(
            s.get("shuffleWriteBytes") or 0
        )
    return out


def main() -> None:
    from cloudfloe_spark.queries import all_queries
    from cloudfloe_spark.session import get_spark
    from cloudfloe_spark.sources.tables import load_table

    spark = get_spark(
        app_name="cloudfloe-bench-calibrate",
        extra_conf={
            "spark.ui.enabled": "true",
            # cumulative-sum deltas need every stage retained
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("Spark UI did not start; cannot read stage metrics")
    catalog = all_queries()

    for t in ("lineitem", "orders", "customer", "documents", "embeddings",
              "events"):
        load_table(spark, bench.SF_DIR, t).count()
    probes = bench._make_probes(spark, load_table)
    for fn in probes.values():
        fn()

    # Probe byte footprints → reference rates (bytes/sec at ref speed)
    before = _rest_totals(ui)
    probes["scan"]()
    mid = _rest_totals(ui)
    probes["shuffle"]()
    after = _rest_totals(ui)
    scan_bytes = mid["input"] - before["input"]
    shuffle_bytes = after["shuffle"] - mid["shuffle"]
    r_scan = scan_bytes / bench.REF_PROBES["scan"]
    r_shuffle = shuffle_bytes / bench.REF_PROBES["shuffle"]
    print(f"rates: scan {r_scan/1e6:.0f} MB/s  shuffle "
          f"{r_shuffle/1e6:.0f} MB/s (reference speed)")

    weights: dict[str, dict[str, float]] = {}
    station = bench._probe_station(probes)
    drift = bench._drift_factor(station)
    for i, name in enumerate(bench.HEADLINE):
        if i and i % bench.PROBE_EVERY == 0:
            station = bench._probe_station(probes)
            drift = bench._drift_factor(station)
        fn = catalog[name].fn
        fn(spark, bench.SF_DIR).count()  # warm-up: planning/codegen/caches
        b0 = _rest_totals(ui)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, bench.SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        b1 = _rest_totals(ui)
        t_ref = statistics.median(runs) / drift  # seconds at ref speed
        t_scan = (b1["input"] - b0["input"]) / 3 / r_scan
        t_shuf = (b1["shuffle"] - b0["shuffle"]) / 3 / r_shuffle
        # byte-derived parts can overshoot wall time (rates are rough);
        # rescale so cpu keeps its floor share
        cap = t_ref * (1 - CPU_FLOOR)
        if t_scan + t_shuf > cap > 0:
            k = cap / (t_scan + t_shuf)
            t_scan, t_shuf = t_scan * k, t_shuf * k
        t_cpu = max(t_ref - t_scan - t_shuf, t_ref * CPU_FLOOR)
        tot = t_scan + t_shuf + t_cpu
        weights[name] = {
            "scan": round(t_scan / tot, 3),
            "shuffle": round(t_shuf / tot, 3),
            "cpu": round(t_cpu / tot, 3),
        }
        print(f"{name}: {weights[name]}  (t_ref {t_ref:.2f}s)")

    out = {
        "_meta": {
            "sf_dir": bench.SF_DIR,
            "ref_probes": bench.REF_PROBES,
            "rate_scan_bytes_per_s": round(r_scan),
            "rate_shuffle_bytes_per_s": round(r_shuffle),
            "cpu_floor": CPU_FLOOR,
            "method": "REST stage-metric byte deltas + drift-corrected "
                      "wall-time remainder (scripts/bench_calibrate.py)",
        },
        "weights": weights,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_weights.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
