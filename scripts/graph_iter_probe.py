#!/usr/bin/env python
"""Iteration-structure probes for the graph operators (r16, VERDICT r15 #3).

Two questions the sf0.1 bench cannot answer:

1. Does the r15 pre-partition of the static edge frame actually remove
   one shuffle exchange per iteration (pagerank / min-label CC), or is
   the claim bench-invisible noise? Evidence: run the SAME query at a
   scaled input with the pre-partition active (current code) and with
   every ``repartition`` neutralized (identity patch), and count, from
   the Spark event log, the probe job's completed stages and total
   shuffle-write bytes. One fewer edge-list-sized exchange per iteration
   shows up as ``iterations x |sym edges|`` fewer shuffled bytes.

2. Does the r15 removal of ``_large_star``'s ``.distinct()`` inflate the
   small-star window input on hot keys? Adversarial graph: spokes
   u_1..u_d each connected to BOTH the global min (0) and a max-id hub —
   every u-group emits the identical directed edge (hub, 0), so the
   large-star output carries d duplicates of one row landing in a single
   window partition. Measure per-round large-star output rows vs their
   distinct count, end-to-end wall time, and verify the labeling.

Usage:
    python scripts/graph_iter_probe.py pagerank <scale> <pre|nopre>
    python scripts/graph_iter_probe.py ccprop   <scale> <pre|nopre>
    python scripts/graph_iter_probe.py skew     <spokes> [dup|dedup]

Each invocation is one process (event log finalized on exit) printing
one JSON line. Fixture dirs are cached under /tmp/graph_probe_* —
probe fixtures, never bench inputs.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/graph_probe_eventlog"


def _session(cpus: int):
    from pyspark.sql import SparkSession

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graph-iter-probe")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.driver.memory", "2g")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )


def _neutralize_repartition():
    """Identity-patch DataFrame.repartition: the only repartition calls on
    the probed query paths are the r15 static-frame pre-partitions, so
    this is exactly the 'before' variant without a source edit."""
    from pyspark.sql import DataFrame

    DataFrame.repartition = lambda self, *a, **k: self  # type: ignore


def _probe_job_metrics(app_id: str) -> dict:
    """Sum completed-stage counts and shuffle metrics for jobs whose
    description starts with 'probe:' in the finalized event log."""
    # v1: one file per app; v2 (rolling): a directory of events_* files.
    paths = []
    for p in glob.glob(os.path.join(EVDIR, "*")):
        if os.path.isdir(p):
            paths.extend(
                f
                for f in glob.glob(os.path.join(p, "*"))
                if os.path.basename(f).startswith("events")
            )
        else:
            paths.append(p)
    probe_stages: set[int] = set()
    stage_rows = []
    lines = (line for path in sorted(paths) for line in open(path))
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if True:
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                if desc.startswith("probe:"):
                    probe_stages.update(ev.get("Stage IDs", []))
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                acc = {
                    a["Name"]: a.get("Value", 0)
                    for a in si.get("Accumulables", [])
                    if str(a.get("Name", "")).startswith("internal.metrics.")
                }
                stage_rows.append(
                    (
                        si["Stage ID"],
                        int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0)),
                        int(
                            acc.get("internal.metrics.shuffle.write.recordsWritten", 0)
                        ),
                    )
                )
    rows = [r for r in stage_rows if r[0] in probe_stages]
    return {
        "stages": len(rows),
        "shuffle_write_stages": sum(1 for r in rows if r[1] > 0),
        "shuffle_bytes": sum(r[1] for r in rows),
        "shuffle_records": sum(r[2] for r in rows),
    }


def _scaled_dir(spark, scale: int) -> str:
    from scripts.scale_probe import build_scale

    return build_scale(spark, scale, f"/tmp/graph_probe_x{scale}")


def probe_query(qname: str, scale: int, variant: str) -> None:
    spark = _session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = (
        _scaled_dir(spark, scale)
        if scale > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    if variant == "nopre":
        _neutralize_repartition()
    from cloudfloe_spark.queries import all_queries

    fn = all_queries()[qname].fn
    # warm-up on the tiny SF so JVM/codegen startup stays out of the jobs
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    sc = spark.sparkContext
    sc.setJobDescription(f"probe:{qname}")
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = round(time.time() - t0, 3)
    sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()
    out = {"probe": qname, "scale": scale, "variant": variant, "wall_s": wall}
    out.update(_probe_job_metrics(app_id))
    print(json.dumps(out))


def probe_skew(spokes: int, variant: str) -> None:
    """Hot-key star-CC probe. Graph: 0 -- u_i -- hub for i in 1..spokes
    (every spoke adjacent to both the global min and a single max hub).
    Large-star emits (hub, 0) once PER SPOKE GROUP — the exact duplicated-
    intermediate shape the r15 distinct removal allows through."""
    from pyspark.sql import functions as F

    spark = _session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    hub = spokes + 1
    u = spark.range(1, spokes + 1).select(F.col("id").alias("a"))
    edges = (
        u.select(F.lit(0).alias("src"), F.col("a").alias("dst"))
        .unionByName(
            u.select(F.col("a").alias("src"), F.lit(hub).alias("dst"))
        )
        .localCheckpoint()
    )

    # Per-round intermediate diagnostics with replicas of the operator's
    # round bodies (kept in lockstep with operators/graph.py).
    from pyspark.sql import Window

    _wu = Window.partitionBy("u")

    def large_star(cur, dedup: bool):
        sym = cur.select("u", "v").unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = F.least(F.min("v").over(_wu), F.col("u"))
        out = (
            sym.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        return out.distinct() if dedup else out

    def small_star(cur):
        withm = cur.withColumn("m", F.min("v").over(_wu))
        relink = withm.select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).filter(F.col("u") != F.col("v"))
        self_link = withm.select("u", F.col("m").alias("v"))
        return relink.unionByName(self_link).distinct()

    dedup = variant == "dedup"
    e = (
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    rounds = []
    t0 = time.time()
    for _ in range(10):
        ls = large_star(e, dedup).localCheckpoint()
        n_ls = ls.count()
        n_ls_distinct = ls.distinct().count()
        e2 = small_star(ls).localCheckpoint()
        stat = e2.agg(
            F.count("*").alias("n"), F.expr("bit_xor(xxhash64(u, v))").alias("h")
        ).collect()[0]
        rounds.append(
            {
                "large_star_rows": n_ls,
                "large_star_distinct": n_ls_distinct,
                "edges_after": stat["n"],
            }
        )
        prev = e
        e = e2
        pstat = prev.agg(
            F.count("*").alias("n"), F.expr("bit_xor(xxhash64(u, v))").alias("h")
        ).collect()[0]
        if (stat["n"], stat["h"]) == (pstat["n"], pstat["h"]):
            break
    wall = round(time.time() - t0, 3)

    # End-to-end product-code run on the same graph for the wall-clock.
    from cloudfloe_spark.operators.graph import connected_components_star

    t1 = time.time()
    labels = connected_components_star(edges, src="src", dst="dst")
    n_comp = labels.select("cluster_id").distinct().count()
    wall_product = round(time.time() - t1, 3)
    spark.stop()
    print(
        json.dumps(
            {
                "probe": "skew_star",
                "spokes": spokes,
                "variant": variant,
                "rounds": rounds,
                "diag_wall_s": wall,
                "product_wall_s": wall_product,
                "n_components": n_comp,
            }
        )
    )


def main() -> None:
    mode = sys.argv[1]
    if mode in ("pagerank", "ccprop"):
        qname = (
            "graph_pagerank_iter" if mode == "pagerank" else "dedup_minhash_clusters"
        )
        probe_query(qname, int(sys.argv[2]), sys.argv[3])
    elif mode == "skew":
        probe_skew(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else "dup")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
