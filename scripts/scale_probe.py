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
    # l_partkey is remapped along with the order key so the derived
    # co-purchase graph grows in NODES (N disjoint replicas of the base
    # graph — how a real corpus grows) rather than DENSIFYING (same part
    # keys, N× the orders → every pair's support multiplies, the support
    # prune stops pruning, and wedge work goes quadratic: the un-remapped
    # probe OOMed at x2). part.p_partkey mirrors the remap so part joins
    # stay 1:1 per replica.
    "lineitem": ["l_orderkey", "l_partkey"],
    "part": ["p_partkey"],
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
    # round-5: rolling-distinct (explode construction) and the oriented
    # triangle count (support-pruned co-purchase graph). Note replicas
    # multiply pair support (same part keys, N× the orders), so the
    # triangle probe measures the operator under a DENSIFYING graph —
    # the adversarial direction for wedge work.
    "events_rolling_active_users",
    "graph_triangle_count",
    # round-5b: PageRank shares the triangle probe's densifying-graph
    # hazard (same edge builder); boilerplate stripping stresses the
    # segment-frequency groupBy whose hot keys GROW with replicas (every
    # replica repeats the same segments — df scales ×N by construction).
    "graph_pagerank_iter",
    "text_boilerplate_segments",
    # round-6 (VERDICT r05 #8): the widest r5 plans — PQ ADC scoring
    # (broadcast LUT + per-row array fold), the exact+fuzzy+semantic
    # composed dedup verdict (the widest multi-family plan in the repo),
    # and hourly seasonality (two-level pivot-shaped agg over events).
    "sim_pq_adc_topk",
    "dedup_document_verdict",
    "events_hourly_seasonality",
    # round-6b: the verbatim-reuse inverted index (hot boilerplate grams
    # are the skew hazard) and the one-pass Gram + bounded power
    # iteration (the corpus-size-independent-iterations claim).
    "text_char_kgram_dup_rate",
    "vec_pca_top_component",
    # round-6c: the convergence-checked graph operators — the interesting
    # growth axis is the fixpoint ROUND COUNT, which node-growth replicas
    # keep constant (measured sublinear x8).
    "graph_pagerank_directed",
    "graph_kcore_fixpoint",
    # round-6d: BM25 — the widest shared-subtree plan (five derivations off
    # one (doc, term) aggregate; replicas multiply every query term's df, the
    # stress for the broadcast-pruned scoring join).
    "text_bm25_topk",
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


# --- skewed-growth probes (VERDICT r03 'Next round' #5) ----------------------
# The uniform replicas above grow every key's group at the same rate; real
# 100-TB inputs don't — a handful of hot keys own most rows. These probes
# scale a DELIBERATELY skewed distribution and time the two paths whose
# 100-TB story depends on skew handling: the salted join/agg operators and
# the LSH band join (degenerate-duplicate buckets vs _LSH_MAX_BUCKET cap).

_SKEW_BASE_ROWS = 800_000  # fact rows at x1; 90% land on ONE hot key


def build_skewed_docs(spark, n: int, out_dir: str) -> str:
    """documents replica where 60% of all docs are near-copies of one of
    three hot texts — LSH bucket sizes then GROW with scale instead of
    staying constant, the degenerate case the bucket cap exists for."""
    dest = os.path.join(out_dir, f"skew_x{n}")
    if os.path.isdir(dest):
        return dest
    os.makedirs(dest, exist_ok=True)
    src = load_table(spark, BASE_SF, "documents")
    hot = [
        r["text"]
        for r in src.orderBy("doc_id").limit(3).select("text").collect()
    ]
    parts = []
    for i in range(n):
        parts.append(
            src.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_OFFSET))
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    hot_col = (
        F.when(F.col("doc_id") % 5 == 0, F.lit(hot[0]))
        .when(F.col("doc_id") % 5 == 1, F.lit(hot[1]))
        .when(F.col("doc_id") % 5 == 2, F.lit(hot[2]))
        .otherwise(F.col("text"))
    )
    # near-copies, not byte-copies: a per-doc suffix keeps exact-dedup from
    # trivializing the probe while shingles still collide into hot buckets
    df = df.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 <= 2,
            F.concat(hot_col, F.lit(" tail "), F.col("doc_id").cast("string")),
        ).otherwise(F.col("text")),
    )
    df.write.mode("overwrite").parquet(os.path.join(dest, "documents.parquet"))
    return dest


def build_skewed_lang_docs(spark, n: int, out_dir: str) -> str:
    """documents replica where 90% of docs carry ONE lang — the hot-window
    hazard for text_pack_token_shards, whose running sum partitions by
    lang (r4 VERDICT #7: both new r4 paths are window-over-hot-partition
    shapes)."""
    dest = os.path.join(out_dir, f"skew_lang_x{n}")
    if os.path.isdir(dest):
        return dest
    os.makedirs(dest, exist_ok=True)
    src = load_table(spark, BASE_SF, "documents")
    parts = [
        src.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_OFFSET))
        for i in range(n)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df = df.withColumn(
        "lang",
        F.when(F.col("doc_id") % 10 < 9, F.lit("en")).otherwise(F.col("lang")),
    )
    df.write.mode("overwrite").parquet(os.path.join(dest, "documents.parquet"))
    return dest


def build_skewed_events(spark, n: int, out_dir: str) -> str:
    """events replica where 90% of events belong to ONE user — the hot
    cohort-window hazard for events_retention_cohorts (window MIN over
    user_id)."""
    dest = os.path.join(out_dir, f"skew_events_x{n}")
    if os.path.isdir(dest):
        return dest
    os.makedirs(dest, exist_ok=True)
    src = load_table(spark, BASE_SF, "events")
    parts = [
        src.withColumn("event_id", F.col("event_id") + F.lit(i * KEY_OFFSET))
        for i in range(n)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df = df.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 9, F.lit(1).cast("long")).otherwise(
            F.col("user_id")
        ),
    )
    df.write.mode("overwrite").parquet(os.path.join(dest, "events.parquet"))
    return dest


def skew_probe(spark, n: int, out_dir: str) -> dict[str, float]:
    from cloudfloe_spark.operators.skew import salted_agg, salted_join

    catalog = all_queries()
    timings: dict[str, float] = {}

    # 1) LSH band join over duplicate-skewed documents.
    skew_dir = build_skewed_docs(spark, n, out_dir)
    fn = catalog["dedup_minhash_lsh_pairs"].fn
    fn(spark, skew_dir).count()  # warm
    t0 = time.perf_counter()
    fn(spark, skew_dir).count()
    timings["lsh_pairs_dup_skew"] = round(time.perf_counter() - t0, 3)

    # 2) Salted fact⋈dim join, 90% of fact rows on one key.
    rows = _SKEW_BASE_ROWS * n
    fact = spark.range(rows).select(
        F.when(F.col("id") % 10 < 9, F.lit(1).cast("long"))
        .otherwise(F.col("id") % 9973)
        .alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 3).alias("tier")
    )

    def run_salted_join():
        salted_join(fact, dim, ["user_id"], spread_col="event_id").groupBy(
            "tier"
        ).agg(F.sum("v").alias("s")).count()

    run_salted_join()  # warm
    t0 = time.perf_counter()
    run_salted_join()
    timings["salted_join_hot90"] = round(time.perf_counter() - t0, 3)

    # 3) Salted aggregation on the same hot-key distribution.
    def run_salted_agg():
        salted_agg(
            fact,
            ["user_id"],
            [("v", "sum", "s"), ("v", "count", "c")],
            spread_col="event_id",
        ).count()

    run_salted_agg()  # warm
    t0 = time.perf_counter()
    run_salted_agg()
    timings["salted_agg_hot90"] = round(time.perf_counter() - t0, 3)

    # 4) Token-budget shard packing, 90% of docs in one lang: the per-lang
    # running-sum window serializes the hot language through one task, so
    # this measures the worst case the docstring's lang×bucket subsplit
    # exists for.
    lang_dir = build_skewed_lang_docs(spark, n, out_dir)
    fn = catalog["text_pack_token_shards"].fn
    fn(spark, lang_dir).count()  # warm
    t0 = time.perf_counter()
    fn(spark, lang_dir).count()
    timings["pack_shards_lang_hot90"] = round(time.perf_counter() - t0, 3)

    # 5) Retention cohorts, 90% of events on one user: hot cohort-window
    # partition; the post-window distinct collapses the hot user to a
    # handful of (cohort, offset) rows, so growth should stay scan-bound.
    ev_dir = build_skewed_events(spark, n, out_dir)
    fn = catalog["events_retention_cohorts"].fn
    fn(spark, ev_dir).count()  # warm
    t0 = time.perf_counter()
    fn(spark, ev_dir).count()
    timings["retention_cohorts_user_hot90"] = round(time.perf_counter() - t0, 3)

    # 6) Composed dedup verdict over the duplicate-skewed corpus (round 6):
    # 60% of docs collapse into three hot exact/fuzzy groups — the hazard
    # for every stage of the exact+fuzzy+semantic composition at once.
    fn = catalog["dedup_document_verdict"].fn
    fn(spark, skew_dir).count()  # warm
    t0 = time.perf_counter()
    fn(spark, skew_dir).count()
    timings["document_verdict_dup_skew"] = round(time.perf_counter() - t0, 3)

    # 7) Hourly seasonality with 90% of events on one user (round 6): the
    # two-level (hour, type) agg has BOUNDED key space, so hot users must
    # collapse map-side — flat growth is the expected signature.
    fn = catalog["events_hourly_seasonality"].fn
    fn(spark, ev_dir).count()  # warm
    t0 = time.perf_counter()
    fn(spark, ev_dir).count()
    timings["hourly_seasonality_user_hot90"] = round(time.perf_counter() - t0, 3)
    return timings


# --- skewed-DML + CDC probes (VERDICT r06 #9 / r07 #2) ------------------------
# delete_where's write path shuffles matched (file_path, pos) pairs via
# repartitionByRange — a 90%-hot-key table whose hot rows sit in ONE data
# file makes every match share the same file_path, so the range split must
# happen on pos alone (the single-hot-file stress). The CDC probe measures
# the r8 carried-scan pruning: a point DELETE followed by iceberg_cdc must
# read only the delete-referenced file, so the read stays ~flat while the
# table grows 8x in FILE COUNT.

_DML_BASE_ROWS = 400_000
_CDC_FILE_ROWS = 25_000
_CDC_BASE_FILES = 16
_T0 = 1_700_000_000_000


def build_dml_table(spark, n: int, out_dir: str) -> tuple[str, int]:
    """Fresh Iceberg fixture at scale n: ONE hot data file holding 90% of
    all rows on a single key k=0, plus 8 cold files. Rebuilt per call
    (DML mutates the table)."""
    import numpy as np
    import pyarrow as pa

    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    parent = os.path.join(out_dir, f"dml_x{n}")
    shutil.rmtree(parent, ignore_errors=True)
    root = os.path.join(parent, "t")
    rows = _DML_BASE_ROWS * n
    hot = int(rows * 0.9)
    t = LocalIcebergTable(
        root,
        pa.schema(
            [("id", pa.int64()), ("k", pa.int64()), ("v", pa.float64())]
        ),
    )
    tables = [
        pa.table(
            {
                "id": np.arange(hot, dtype="int64"),
                "k": np.zeros(hot, dtype="int64"),
                "v": (np.arange(hot) % 97).astype("float64"),
            }
        )
    ]
    cold = rows - hot
    per = max(cold // 8, 1)
    for j in range(8):
        lo, hi = hot + j * per, min(hot + (j + 1) * per, rows)
        if lo >= hi:
            break
        ids = np.arange(lo, hi, dtype="int64")
        tables.append(
            pa.table(
                {
                    "id": ids,
                    "k": (ids % 9973) + 1,
                    "v": (ids % 97).astype("float64"),
                }
            )
        )
    t.append_snapshot(tables, timestamp_ms=_T0)
    return root, hot


def build_cdc_table(spark, n: int, out_dir: str) -> str:
    """Fresh Iceberg fixture whose FILE COUNT grows with n (16·n files of
    a fixed 25k rows, ids sequential across files) — the shape where the
    r8 carried-scan pruning matters: a point delete touches file 0 only."""
    import numpy as np
    import pyarrow as pa

    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    parent = os.path.join(out_dir, f"cdc_x{n}")
    shutil.rmtree(parent, ignore_errors=True)
    root = os.path.join(parent, "t")
    t = LocalIcebergTable(
        root, pa.schema([("id", pa.int64()), ("v", pa.float64())])
    )
    tables = []
    for j in range(_CDC_BASE_FILES * n):
        ids = np.arange(
            j * _CDC_FILE_ROWS, (j + 1) * _CDC_FILE_ROWS, dtype="int64"
        )
        tables.append(
            pa.table({"id": ids, "v": (ids % 97).astype("float64")})
        )
    t.append_snapshot(tables, timestamp_ms=_T0)
    return root


def dml_probe(spark, n: int, out_dir: str) -> dict[str, float]:
    from cloudfloe_spark.service.config import ConnectionConfig
    from cloudfloe_spark.service.engine import run_query
    from cloudfloe_spark.sources.maintenance import delete_where, update_where

    cfg = ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )
    timings: dict[str, float] = {}

    # DML cannot re-run on the same table (it mutates), so warm the path's
    # one-time plan/codegen cost on a throwaway tiny table instead — the
    # first timed scale would otherwise absorb ~5 s of JVM warm-up and
    # poison every ratio against it.
    import numpy as np
    import pyarrow as pa

    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    wroot = os.path.join(out_dir, f"dml_warm_x{n}", "t")
    shutil.rmtree(os.path.dirname(wroot), ignore_errors=True)
    wt = LocalIcebergTable(
        wroot,
        pa.schema(
            [("id", pa.int64()), ("k", pa.int64()), ("v", pa.float64())]
        ),
    )
    ids = np.arange(1000, dtype="int64")
    wt.append_snapshot(
        [pa.table({"id": ids, "k": ids % 7, "v": ids.astype("float64")})],
        timestamp_ms=_T0,
    )
    delete_where(spark, wroot, "k = 0", timestamp_ms=_T0 + 1000)
    from pyspark.sql import functions as _F

    from cloudfloe_spark.sources.maintenance import apply_changelog as _ac

    _ac(
        spark,
        wroot,
        spark.range(3).select(
            _F.col("id"),
            _F.col("id").alias("k"),
            _F.col("id").cast("double").alias("v"),
            _F.lit("delete").alias("_change_type"),
        ),
        "id",
        timestamp_ms=_T0 + 2000,
    )

    # ... warm the incremental matview-refresh path too (CDC frame +
    # touched-group recompute + apply all compile once):
    from cloudfloe_spark.sources.iceberg_views import (
        create_iceberg_view as _civ,
        materialize_iceberg_view as _miv,
        refresh_materialized_view as _rmv,
    )

    _wp = os.path.dirname(wroot)
    _civ(
        os.path.join(_wp, "v"),
        f"SELECT k, COUNT(*) AS n FROM iceberg_scan('{wroot}') GROUP BY k",
        timestamp_ms=_T0 + 3000,
    )
    _miv(
        spark, os.path.join(_wp, "v"), os.path.join(_wp, "mv"),
        timestamp_ms=_T0 + 3100,
    )
    delete_where(spark, wroot, "id = 5", timestamp_ms=_T0 + 3200)
    _wres = _rmv(
        spark, os.path.join(_wp, "v"), os.path.join(_wp, "mv"),
        timestamp_ms=_T0 + 3300,
    )
    assert _wres["path"] == "incremental-agg", _wres

    # ... and warm the STREAMING-source path the same way (python
    # data-source worker spawn + stream-engine startup are one-time):
    import tempfile as _tf

    from cloudfloe_spark.streaming.iceberg_source import (
        register_iceberg_commits_source as _reg,
    )

    _reg(spark)
    _wbase = _tf.mkdtemp(dir=out_dir, prefix="tail_warm_")
    _wq = (
        spark.readStream.format("iceberg_commits")
        .option("mode", "cdc")
        .load(wroot)
        .writeStream.format("parquet")
        .option("path", os.path.join(_wbase, "out"))
        .option("checkpointLocation", os.path.join(_wbase, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    assert _wq.awaitTermination(300), "stream warm-up timed out"
    _wq.stop()

    # (a) skewed DELETE: 90% of rows on one key in ONE hot file — times
    # the full DML path (MOR scan + filter + sorted position-delete write
    # + commit) under the single-file repartitionByRange stress.
    root, hot = build_dml_table(spark, n, out_dir)
    t0 = time.perf_counter()
    res = delete_where(spark, root, "k = 0", timestamp_ms=_T0 + 1000)
    timings["delete_where_hot90"] = round(time.perf_counter() - t0, 3)
    assert res["matched"] == hot, res

    # (b) CDC read after a POINT delete on a table whose file count grows
    # with n: the carried scan must stay pruned to the one referenced
    # file, so the read should stay ~flat 1x→8x.
    root = build_cdc_table(spark, n, out_dir)
    delete_where(spark, root, "id < 1000", timestamp_ms=_T0 + 1000)
    snaps = [
        int(r[0])
        for r in run_query(
            spark,
            f"SELECT snapshot_id FROM iceberg_snapshots('{root}') "
            "ORDER BY sequence_number",
            cfg,
        ).rows
    ]
    sql = (
        f"SELECT count(*) AS n FROM "
        f"iceberg_cdc('{root}', {snaps[0]}, {snaps[-1]})"
    )
    assert run_query(spark, sql, cfg).rows[0][0] == 1000  # warm + correct
    t0 = time.perf_counter()
    run_query(spark, sql, cfg)
    timings["cdc_after_point_delete"] = round(time.perf_counter() - t0, 3)

    # (b2) streaming tail catch-up on the same growing table: one
    # checkpointed pass over the point-delete commit through the
    # iceberg_commits source (cdc mode). The microbatch plans only the
    # delete-referenced file, so the pass — fixed streaming-engine
    # overhead aside — should stay ~flat as the file count grows 16→128.
    import tempfile

    from cloudfloe_spark.streaming.iceberg_source import (
        register_iceberg_commits_source,
    )

    register_iceberg_commits_source(spark)
    sbase = tempfile.mkdtemp(dir=out_dir, prefix="tail_")
    t0 = time.perf_counter()
    q = (
        spark.readStream.format("iceberg_commits")
        .option("mode", "cdc")
        .option("start", str(snaps[0]))
        .load(root)
        .writeStream.format("parquet")
        .option("path", os.path.join(sbase, "out"))
        .option("checkpointLocation", os.path.join(sbase, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream tail probe timed out"
    q.stop()
    timings["stream_tail_point_delete"] = round(time.perf_counter() - t0, 3)
    n_rows = spark.read.parquet(os.path.join(sbase, "out")).count()
    assert n_rows == 1000, n_rows

    # (c) apply_changelog of a FIXED-SIZE changelog onto a replica whose
    # file count grows with n: the retraction scan prunes by the keys'
    # [min, max] through manifest stats, so the sync should stay ~flat.
    from pyspark.sql import functions as F

    from cloudfloe_spark.sources.maintenance import apply_changelog

    replica = build_cdc_table(spark, n, out_dir)  # fresh, un-deleted copy
    changes = spark.range(500).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.lit("delete").alias("_change_type"),
    )
    t0 = time.perf_counter()
    res = apply_changelog(
        spark, replica, changes, "id", timestamp_ms=_T0 + 2000
    )
    timings["apply_changelog_point"] = round(time.perf_counter() - t0, 3)
    assert res["retracted"] == 500, res

    # (d) COPY-ON-WRITE point delete on the growing-file-count table:
    # pass 1 scans only the stats-pruned candidate file and pass 2
    # rewrites the one affected file, so the whole op should stay ~flat
    # as the table grows 16n files — the COW scale contract (cost tracks
    # affected files, never the table).
    root = build_cdc_table(spark, n, out_dir)
    t0 = time.perf_counter()
    res = delete_where(
        spark, root, "id < 1000", timestamp_ms=_T0 + 1000,
        mode="copy-on-write",
    )
    timings["cow_delete_point"] = round(time.perf_counter() - t0, 3)
    assert res["matched"] == 1000 and res["files_rewritten"] == 1, res

    # (e) COW delete matching the 90%-hot file: the rewrite IS the hot
    # file, so this grows ~linearly with n by design — the documented
    # write-amplification trade against (a)'s flat-commit MOR delete.
    root, hot = build_dml_table(spark, n, out_dir)
    t0 = time.perf_counter()
    res = delete_where(
        spark, root, "k = 0 AND id % 10 = 0", timestamp_ms=_T0 + 1000,
        mode="copy-on-write",
    )
    timings["cow_delete_hot_rewrite"] = round(time.perf_counter() - t0, 3)
    assert res["files_rewritten"] == 1, res

    # (e2) MOR point delete on the growing-FILE-COUNT table: with
    # manifest reuse (r8) the commit writes only the delta manifest, so
    # the whole op — pruned scan + tiny delete write + commit — should
    # stay ~flat as the table grows 16n files (pre-reuse, the commit
    # rewrote the full O(files) manifest every time).
    root = build_cdc_table(spark, n, out_dir)
    t0 = time.perf_counter()
    res = delete_where(spark, root, "id < 1000", timestamp_ms=_T0 + 1000)
    timings["mor_delete_point_commit"] = round(time.perf_counter() - t0, 3)
    assert res["matched"] == 1000, res

    # (e3) position-delete rewrite on the growing-file-count table with a
    # FIXED number of small DML delete files: reads only the delete
    # files + a metadata-scale key join, so it should stay ~flat.
    from cloudfloe_spark.sources.maintenance import (
        rewrite_position_deletes,
    )

    root = build_cdc_table(spark, n, out_dir)
    for j in range(4):
        delete_where(
            spark, root, f"id = {j * 100}", timestamp_ms=_T0 + 1000 + j
        )
    t0 = time.perf_counter()
    res = rewrite_position_deletes(spark, root, timestamp_ms=_T0 + 2000)
    timings["rewrite_pos_deletes"] = round(time.perf_counter() - t0, 3)
    assert res["files_before"] == 4 and res["files_after"] == 1, res

    # (e4) manifest rewrite (r9) on the growing-file-count table after a
    # 4-commit DML chain: pure driver-side metadata, O(total manifest
    # entries) by design — expected LINEAR in the table's file count at
    # ms-scale absolute cost, with zero data movement.
    from cloudfloe_spark.sources.maintenance import rewrite_manifests

    root = build_cdc_table(spark, n, out_dir)
    for j in range(4):
        delete_where(
            spark, root, f"id = {j * 100}", timestamp_ms=_T0 + 1000 + j
        )
    t0 = time.perf_counter()
    res = rewrite_manifests(root, timestamp_ms=_T0 + 2000)
    timings["rewrite_manifests_meta"] = round(time.perf_counter() - t0, 3)
    assert res["manifests_after"] <= 2, res

    # (e5) BIN-PACK partial compaction (r9) on the growing-file-count
    # table with a FIXED set of 6 appended tiny files: the rewrite reads
    # and writes only the small files, so the op should stay ~flat as
    # the table grows 16n files — cost tracks small-file bytes, never
    # the table (contrast (f): the whole-table rewrite is linear).
    import numpy as np
    import pyarrow as pa

    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot as _crds,
    )
    from cloudfloe_spark.sources.maintenance import compact_small_files

    root = build_cdc_table(spark, n, out_dir)
    base_rows = _CDC_FILE_ROWS * _CDC_BASE_FILES * n
    small_dir = os.path.join(root, "data")
    small_files = []
    for j in range(6):
        ids = np.arange(
            base_rows + j * 50, base_rows + (j + 1) * 50, dtype="int64"
        )
        p = os.path.join(small_dir, f"tiny-{j}.parquet")
        import pyarrow.parquet as _pq

        _pq.write_table(
            pa.table({"id": ids, "v": (ids % 97).astype("float64")}), p
        )
        small_files.append((p, 50))
    _crds(root, new_data_files=small_files, timestamp_ms=_T0 + 500)
    t0 = time.perf_counter()
    res = compact_small_files(
        spark, root, timestamp_ms=_T0 + 1000,
        small_file_bytes=16 * 1024, min_files=2,
    )
    timings["binpack_small_files"] = round(time.perf_counter() - t0, 3)
    assert res["files_rewritten"] == 6, res

    # (f) z-order compaction of the 16n-file table: a whole-table rewrite
    # is linear by definition; this pins that the Morton machinery
    # (approxQuantile pass + map-side bucketing) adds no super-linear
    # term on top of the rewrite itself.
    from cloudfloe_spark.sources.maintenance import compact_iceberg_table

    root = build_cdc_table(spark, n, out_dir)
    t0 = time.perf_counter()
    compact_iceberg_table(
        spark, root, timestamp_ms=_T0 + 1000, zorder_by=["id", "v"],
    )
    timings["zorder_compact_full"] = round(time.perf_counter() - t0, 3)

    # (g) INCREMENTAL matview refresh (r9, VERDICT r08 #1) on a table
    # whose file count grows with n, after a FIXED-size point DML: the
    # refresh must track the DELTA (CDC reads only touched files; the agg
    # recompute prunes to the touched groups' [min,max] files; the row
    # apply retracts against the bounds-pruned target) — ~flat 1x→8x,
    # while a full refresh would grow linearly with the table.
    from cloudfloe_spark.sources.iceberg_views import (
        create_iceberg_view,
        materialize_iceberg_view,
        refresh_materialized_view,
    )

    def build_mv_table(tag: str) -> str:
        import numpy as np
        import pyarrow as pa

        from cloudfloe_spark.sources.iceberg_fixture import (
            LocalIcebergTable,
        )

        parent = os.path.join(out_dir, f"mv_{tag}_x{n}")
        shutil.rmtree(parent, ignore_errors=True)
        mroot = os.path.join(parent, "t")
        mt = LocalIcebergTable(
            mroot,
            pa.schema(
                [("id", pa.int64()), ("g", pa.int64()), ("v", pa.float64())]
            ),
        )
        tables = []
        for j in range(_CDC_BASE_FILES * n):
            ids = np.arange(
                j * _CDC_FILE_ROWS, (j + 1) * _CDC_FILE_ROWS, dtype="int64"
            )
            # g is file-clustered (one value per file) so the touched
            # groups' bounds prune the recompute scan — the layout a
            # partitioned/sorted 100-TB table gives for free
            tables.append(
                pa.table(
                    {
                        "id": ids,
                        "g": ids // _CDC_FILE_ROWS,
                        "v": (ids % 97).astype("float64"),
                    }
                )
            )
        mt.append_snapshot(tables, timestamp_ms=_T0)
        return parent, mroot

    parent, mroot = build_mv_table("agg")
    create_iceberg_view(
        os.path.join(parent, "v"),
        f"SELECT g, COUNT(*) AS n_rows, SUM(v) AS sum_v "
        f"FROM iceberg_scan('{mroot}') GROUP BY g",
        timestamp_ms=_T0 + 500,
    )
    materialize_iceberg_view(  # one-time build, untimed
        spark, os.path.join(parent, "v"), os.path.join(parent, "mv"),
        timestamp_ms=_T0 + 600,
    )
    delete_where(spark, mroot, "id < 1000", timestamp_ms=_T0 + 1000)
    t0 = time.perf_counter()
    res = refresh_materialized_view(
        spark, os.path.join(parent, "v"), os.path.join(parent, "mv"),
        timestamp_ms=_T0 + 2000,
    )
    timings["matview_incremental_agg"] = round(time.perf_counter() - t0, 3)
    assert res["path"] == "incremental-agg", res

    parent, mroot = build_mv_table("row")
    create_iceberg_view(
        os.path.join(parent, "v"),
        f"SELECT id, g, v FROM iceberg_scan('{mroot}') WHERE v >= 0",
        timestamp_ms=_T0 + 500,
    )
    materialize_iceberg_view(
        spark, os.path.join(parent, "v"), os.path.join(parent, "mv"),
        timestamp_ms=_T0 + 600, key_cols=["id"],
    )
    delete_where(spark, mroot, "id < 500", timestamp_ms=_T0 + 1000)
    t0 = time.perf_counter()
    res = refresh_materialized_view(
        spark, os.path.join(parent, "v"), os.path.join(parent, "mv"),
        timestamp_ms=_T0 + 2000,
    )
    timings["matview_incremental_row"] = round(time.perf_counter() - t0, 3)
    assert res["path"] == "incremental-row", res

    # (h) BOTH-BASES-MOVED join refresh (r10, VERDICT r9 #3): the fact
    # side grows with n (file-clustered on the join key), the dim stays
    # small, and BOTH take a point DML inside one staleness window. The
    # algebraic delta's full-side terms are bounded by the deltas'
    # join-key [min,max] (manifest pruning), so the refresh must stay
    # ~flat while the fact grows 1x→8x.
    import numpy as np
    import pyarrow as pa

    from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

    parent = os.path.join(out_dir, f"mv_both_x{n}")
    shutil.rmtree(parent, ignore_errors=True)
    froot = os.path.join(parent, "fact")
    droot = os.path.join(parent, "dim")
    ft = LocalIcebergTable(
        froot,
        pa.schema(
            [("id", pa.int64()), ("k", pa.int64()), ("v", pa.float64())]
        ),
    )
    tables = []
    for j in range(_CDC_BASE_FILES * n):
        ids = np.arange(
            j * _CDC_FILE_ROWS, (j + 1) * _CDC_FILE_ROWS, dtype="int64"
        )
        tables.append(
            pa.table(
                {
                    "id": ids,
                    "k": ids // _CDC_FILE_ROWS,  # file-clustered join key
                    "v": (ids % 97).astype("float64"),
                }
            )
        )
    ft.append_snapshot(tables, timestamp_ms=_T0)
    n_keys = _CDC_BASE_FILES * n
    dt = LocalIcebergTable(
        droot, pa.schema([("k", pa.int64()), ("name", pa.string())])
    )
    dt.append_snapshot(
        [
            pa.table(
                {
                    "k": np.arange(n_keys, dtype="int64"),
                    "name": [f"k{j}" for j in range(n_keys)],
                }
            )
        ],
        timestamp_ms=_T0,
    )
    create_iceberg_view(
        os.path.join(parent, "v"),
        f"SELECT f.id, f.v, d.name FROM iceberg_scan('{froot}') f "
        f"JOIN iceberg_scan('{droot}') d ON f.k = d.k",
        timestamp_ms=_T0 + 500,
    )
    materialize_iceberg_view(
        spark, os.path.join(parent, "v"), os.path.join(parent, "mv"),
        timestamp_ms=_T0 + 600, key_cols=["id"],
    )
    delete_where(spark, froot, "id < 500", timestamp_ms=_T0 + 1000)
    update_where(
        spark, droot, "k = 0", {"name": "'K0'"}, timestamp_ms=_T0 + 1100
    )
    t0 = time.perf_counter()
    res = refresh_materialized_view(
        spark, os.path.join(parent, "v"), os.path.join(parent, "mv"),
        timestamp_ms=_T0 + 2000,
    )
    timings["matview_join_both_moved"] = round(time.perf_counter() - t0, 3)
    assert res["path"] == "incremental-join-both", res

    # (i) Iceberg v3 DV point delete (r10): the table grows 16n files;
    # a fixed-size MOR delete commits per-file DELETION VECTORS
    # (executor-side roaring build, blob-only driver collect) — the cost
    # must track the pruned match scan + delete-set-sized blobs, ~flat.
    from cloudfloe_spark.sources.maintenance import (
        migrate_position_deletes_to_dvs,
    )

    root3 = build_cdc_table(spark, n, os.path.join(out_dir, "v3"))
    migrate_position_deletes_to_dvs(spark, root3, timestamp_ms=_T0 + 500)
    t0 = time.perf_counter()
    res = delete_where(spark, root3, "id < 500", timestamp_ms=_T0 + 1000)
    timings["v3_dv_delete_point"] = round(time.perf_counter() - t0, 3)
    assert res.get("deletion_vectors"), res

    # (j) STREAMING matview follower, AGG shape (r11, VERDICT r10 #3):
    # the base grows 16n files; after a fixed-size point DML, ONE
    # follower drain applies the epoch through the pinned-range
    # incremental machinery — the epoch cost must track the delta
    # (touched-group recompute bounded by key [min,max]), ~flat, plus
    # the fixed streaming-query startup.
    from cloudfloe_spark.streaming.matview_follow import (
        follow_materialized_view,
    )

    parent, mroot = build_mv_table("fol")
    create_iceberg_view(
        os.path.join(parent, "v"),
        f"SELECT g, COUNT(*) AS n_rows, SUM(v) AS sum_v "
        f"FROM iceberg_scan('{mroot}') GROUP BY g",
        timestamp_ms=_T0 + 500,
    )
    materialize_iceberg_view(
        spark, os.path.join(parent, "v"), os.path.join(parent, "mv"),
        timestamp_ms=_T0 + 600,
    )
    delete_where(spark, mroot, "id < 1000", timestamp_ms=_T0 + 1000)
    t0 = time.perf_counter()
    fstats = follow_materialized_view(
        spark, os.path.join(parent, "v"), os.path.join(parent, "mv"),
        checkpoint_dir=os.path.join(parent, "ck"),
        timestamp_ms=_T0 + 2000,
    )
    timings["matview_follow_agg_epoch"] = round(time.perf_counter() - t0, 3)
    assert fstats["paths"] == ["incremental-agg"], fstats

    # (k) v3 READ-SIDE DEFAULTS scan (r11, VERDICT r10 #4): every file
    # predates the defaulted column, so the whole scan pays the fill —
    # which is a constant literal folded into codegen; the aggregate
    # must scale exactly like the plain scan (scan-linear, overhead-
    # dominated at these sizes), with no per-row Python anywhere.
    import pyarrow as pa_

    from cloudfloe_spark.sources.iceberg_fixture import (
        LocalIcebergTable as _LIT,
    )

    droot2 = os.path.join(out_dir, f"defaults_x{n}", "t")
    shutil.rmtree(os.path.dirname(droot2), ignore_errors=True)
    dt2 = _LIT(
        droot2, pa_.schema([("id", pa_.int64()), ("v", pa_.float64())])
    )
    import numpy as np_

    dt2.append_snapshot(
        [
            pa_.table(
                {
                    "id": np_.arange(
                        j * _CDC_FILE_ROWS,
                        (j + 1) * _CDC_FILE_ROWS,
                        dtype="int64",
                    ),
                    "v": np_.zeros(_CDC_FILE_ROWS),
                }
            )
            for j in range(_CDC_BASE_FILES * n)
        ],
        timestamp_ms=_T0,
    )
    dt2.add_column("tier", pa_.int32(), timestamp_ms=_T0 + 500, default=3)
    run_query(  # warm plan/codegen for the filled scan shape
        spark,
        f"SELECT tier, COUNT(*) AS c FROM iceberg_scan('{droot2}') "
        "GROUP BY tier",
        cfg,
    )
    t0 = time.perf_counter()
    out = run_query(
        spark,
        f"SELECT tier, COUNT(*) AS c, SUM(v) AS s "
        f"FROM iceberg_scan('{droot2}') GROUP BY tier",
        cfg,
    )
    timings["v3_defaults_scan_agg"] = round(time.perf_counter() - t0, 3)
    assert out.rows and out.rows[0][0] == 3, out.rows

    # (l) CDC ACROSS COMPACTION via row lineage (r11, VERDICT r10 #5):
    # a lineage table (16n files) takes a point delete, then a WHOLE-
    # TABLE compaction; the timed read is iceberg_cdc over the full
    # range — the rid-keyed net diff. Expected ~LINEAR in n: the diff is
    # sized by the REWRITTEN set, which here is the whole table — the
    # documented, honest price of crossing a compaction (a DML-only
    # range on the same table stays flat via the coordinate path, row
    # `cdc_after_point_delete`).
    from cloudfloe_spark.sources import iceberg_meta as _im
    from cloudfloe_spark.sources.maintenance import (
        compact_iceberg_table as _compact,
    )

    lroot = os.path.join(out_dir, f"lineage_x{n}", "t")
    shutil.rmtree(os.path.dirname(lroot), ignore_errors=True)
    lt = _LIT(
        lroot,
        pa_.schema([("id", pa_.int64()), ("v", pa_.float64())]),
        row_lineage=True,
    )
    lt.append_snapshot(
        [
            pa_.table(
                {
                    "id": np_.arange(
                        j * _CDC_FILE_ROWS,
                        (j + 1) * _CDC_FILE_ROWS,
                        dtype="int64",
                    ),
                    "v": np_.zeros(_CDC_FILE_ROWS),
                }
            )
            for j in range(_CDC_BASE_FILES * n)
        ],
        timestamp_ms=_T0,
    )
    s0_l = _im.resolve_snapshot(lroot)["snapshot-id"]
    delete_where(spark, lroot, "id < 500", timestamp_ms=_T0 + 1000)
    _compact(spark, lroot, timestamp_ms=_T0 + 2000)
    cur_l = _im.resolve_snapshot(lroot)["snapshot-id"]
    t0 = time.perf_counter()
    out = run_query(
        spark,
        f"SELECT COUNT(*) AS c FROM iceberg_cdc('{lroot}', {s0_l}, {cur_l})",
        cfg,
    )
    timings["cdc_lineage_across_compaction"] = round(
        time.perf_counter() - t0, 3
    )
    assert out.rows[0][0] == 500, out.rows

    # (m) theta-sketch ANALYZE (r12, VERDICT r11 #3): the stats pass
    # over the defaults table (16n files × 25k rows; `id` all-distinct →
    # estimation mode, numpy-vectorized hashing; `v` constant → 1 hash
    # per batch). Expected scan-linear: the Python cost is per-batch
    # dedup + KMV truncation, bounded by k=4096 retained per column per
    # partition; the driver unions ≤32 KB rows.
    from cloudfloe_spark.sources.maintenance import (
        analyze_iceberg_table as _analyze,
    )

    t0 = time.perf_counter()
    ares = _analyze(spark, droot2, timestamp_ms=_T0 + 3000)
    timings["analyze_theta_stats"] = round(time.perf_counter() - t0, 3)
    assert ares["statistics_path"].endswith(".stats"), ares

    # (n) v3 timestamp_ns scan (r12, VERDICT r11 #4): the truncating
    # read is one codegen'd integer division per value — the aggregate
    # must scale exactly like a plain scan-agg.
    nroot = os.path.join(out_dir, f"tsns_x{n}", "t")
    shutil.rmtree(os.path.dirname(nroot), ignore_errors=True)
    nt = _LIT(
        nroot,
        pa_.schema([("id", pa_.int64()), ("ts", pa_.timestamp("ns"))]),
    )
    nt.append_snapshot(
        [
            pa_.table(
                {
                    "id": np_.arange(
                        j * _CDC_FILE_ROWS,
                        (j + 1) * _CDC_FILE_ROWS,
                        dtype="int64",
                    ),
                    "ts": (
                        1_700_000_000_000_000_000
                        + np_.arange(_CDC_FILE_ROWS, dtype="int64") * 1000
                        + 7
                    ).view("datetime64[ns]"),
                }
            )
            for j in range(_CDC_BASE_FILES * n)
        ],
        timestamp_ms=_T0,
    )
    run_query(  # warm the plan shape
        spark,
        f"SELECT COUNT(*) AS c FROM iceberg_scan('{nroot}')",
        cfg,
    )
    t0 = time.perf_counter()
    out = run_query(
        spark,
        "SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS c "
        f"FROM iceberg_scan('{nroot}') GROUP BY hr",
        cfg,
    )
    timings["v3_timestamp_ns_scan_agg"] = round(
        time.perf_counter() - t0, 3
    )
    assert out.rows, out.rows

    # (o) row-lineage scan with BOTH inherited columns (r12, VERDICT
    # r11 #2): the post-compaction lineage table reads _row_id AND
    # _last_updated_sequence_number from the materialized columns via
    # ONE broadcast file-count-sized map join — scan-linear, zero row
    # shuffle.
    t0 = time.perf_counter()
    out = run_query(
        spark,
        "SELECT COUNT(*) AS c, MAX(_last_updated_sequence_number) AS m "
        f"FROM iceberg_row_lineage('{lroot}')",
        cfg,
    )
    timings["row_lineage_seq_scan"] = round(time.perf_counter() - t0, 3)
    assert out.rows[0][1] is not None, out.rows

    # (p) shredded typed-path pushdown (r13, VERDICT r12 #2): a
    # typed-only shredded table (no residual anywhere) serves
    # variant_get from the NATIVE parquet subcolumn — zero Python in
    # the plan; expected to scale like a plain scan-agg, NOT like the
    # reassembly decode.
    sroot = os.path.join(out_dir, f"vshred_x{n}", "t")
    shutil.rmtree(os.path.dirname(sroot), ignore_errors=True)
    from cloudfloe_spark.functions.variant import (
        encode_variant as _enc_v,
    )

    md_const = _enc_v({"a": 0})[0]

    def _shred_file(j):
        ids = np_.arange(
            j * _CDC_FILE_ROWS, (j + 1) * _CDC_FILE_ROWS, dtype="int64"
        )
        md = pa_.array([md_const] * _CDC_FILE_ROWS, pa_.binary())
        a_g = pa_.StructArray.from_arrays(
            [pa_.array(ids, pa_.int64())], ["typed_value"]
        )
        tv = pa_.StructArray.from_arrays([a_g], ["a"])
        col = pa_.StructArray.from_arrays([md, tv], ["metadata",
                                                     "typed_value"])
        return pa_.table(
            {"id": pa_.array(ids, pa_.int64()), "v": col}
        )

    st_ = _LIT(
        sroot,
        _shred_file(0).schema,
        variant_cols=("v",),
    )
    st_.append_snapshot(
        [_shred_file(j) for j in range(_CDC_BASE_FILES * n)],
        timestamp_ms=_T0,
    )
    t0 = time.perf_counter()
    out = run_query(
        spark,
        "SELECT COUNT(*) AS c, "
        "SUM(variant_get(parse_json(v), '$.a', 'bigint')) AS s "
        f"FROM iceberg_scan('{sroot}')",
        cfg,
    )
    timings["variant_typed_pushdown_agg"] = round(
        time.perf_counter() - t0, 3
    )
    assert out.rows[0][0] == _CDC_FILE_ROWS * _CDC_BASE_FILES * n, out.rows

    # (q) variant MOR DELETE (r13, VERDICT r12 #1): predicate on the
    # decoded surface; the write is coordinates only (DVs). Expected
    # scan-linear — the unavoidable unshredded decode is one Arrow pass.
    vroot = os.path.join(out_dir, f"vdml_x{n}", "t")
    shutil.rmtree(os.path.dirname(vroot), ignore_errors=True)
    pats = [
        dict(zip(("metadata", "value"), _enc_v({"k": i})))
        for i in range(10)
    ]
    vt_ = pa_.struct([("metadata", pa_.binary()), ("value", pa_.binary())])

    def _var_file(j):
        ids = np_.arange(
            j * _CDC_FILE_ROWS, (j + 1) * _CDC_FILE_ROWS, dtype="int64"
        )
        col = pa_.array(
            [pats[int(i) % 10] for i in ids], vt_
        )
        return pa_.table(
            {"id": pa_.array(ids, pa_.int64()), "v": col}
        )

    vt_tbl = _LIT(vroot, _var_file(0).schema, variant_cols=("v",))
    vt_tbl.append_snapshot(
        [_var_file(j) for j in range(_CDC_BASE_FILES * n)],
        timestamp_ms=_T0,
    )
    t0 = time.perf_counter()
    dres = delete_where(
        spark, vroot, "get_json_object(v, '$.k') = '3'",
        timestamp_ms=_T0 + 1000,
    )
    timings["variant_mor_delete"] = round(time.perf_counter() - t0, 3)
    assert dres["matched"] == _CDC_FILE_ROWS * _CDC_BASE_FILES * n // 10

    # (r) incremental ANALYZE (r13, VERDICT r12 #6): analyze a fresh
    # 16n-file table, append ONE file (1/16n of the data), refresh with
    # incremental=True — cost must track the DELTA (one file scanned +
    # a sketch union), not the table; the x8 row should stay flat while
    # the full analyze row (m) grows with the table.
    import pyarrow.parquet as pq_
    from cloudfloe_spark.sources.iceberg_fixture import (
        commit_row_delta_snapshot as _crds,
    )

    iroot = os.path.join(out_dir, f"inc_analyze_x{n}", "t")
    shutil.rmtree(os.path.dirname(iroot), ignore_errors=True)
    it_ = _LIT(
        iroot, pa_.schema([("id", pa_.int64()), ("v", pa_.float64())])
    )
    it_.append_snapshot(
        [
            pa_.table(
                {
                    "id": np_.arange(
                        j * _CDC_FILE_ROWS,
                        (j + 1) * _CDC_FILE_ROWS,
                        dtype="int64",
                    ),
                    "v": np_.full(_CDC_FILE_ROWS, 0.5),
                }
            )
            for j in range(_CDC_BASE_FILES * n)
        ],
        timestamp_ms=_T0,
    )
    _analyze(spark, iroot, timestamp_ms=_T0 + 3000)
    base_rows = _CDC_FILE_ROWS * _CDC_BASE_FILES * n
    extra = os.path.join(os.path.dirname(iroot), "inc-extra.parquet")
    pq_.write_table(
        pa_.table(
            {
                "id": np_.arange(
                    base_rows, base_rows + _CDC_FILE_ROWS, dtype="int64"
                ),
                "v": np_.full(_CDC_FILE_ROWS, 0.5),
            }
        ),
        extra,
    )
    _crds(
        iroot, new_data_files=[(extra, _CDC_FILE_ROWS)],
        timestamp_ms=_T0 + 4000,
    )
    t0 = time.perf_counter()
    ares2 = _analyze(
        spark, iroot, timestamp_ms=_T0 + 5000, incremental=True
    )
    timings["analyze_incremental_delta"] = round(
        time.perf_counter() - t0, 3
    )
    assert ares2["mode"] == "incremental", ares2
    assert ares2["row_count"] == base_rows + _CDC_FILE_ROWS, ares2

    # (r2) incremental ANALYZE under REMOVALS (r14, VERDICT r13 #7): a
    # COW delete rewrites ONE of the 16n files; the refresh unions the
    # surviving files' cached per-file partials with a scan of the one
    # replacement file — cost tracks the rewritten set, not the table,
    # so the x8 row should stay flat while full analyze grows.
    delete_where(
        spark, iroot, "id = 7", timestamp_ms=_T0 + 6000,
        mode="copy-on-write",
    )
    t0 = time.perf_counter()
    ares3 = _analyze(
        spark, iroot, timestamp_ms=_T0 + 7000, incremental=True
    )
    timings["analyze_incremental_removal"] = round(
        time.perf_counter() - t0, 3
    )
    assert ares3["mode"] == "incremental-removal", ares3
    assert ares3["row_count"] == base_rows + _CDC_FILE_ROWS - 1, ares3

    # (r3) incremental ANALYZE under removals, GROUPED cache (r15,
    # VERDICT r14 #5): past the per-file cap the cache stores one
    # merged sketch per group of files; a COW rewrite of ONE file
    # demotes only ITS group (a bounded rescan) while every other
    # group's bytes carry verbatim. The probe forces the grouped
    # representation (cache_mode='group', small group size so the
    # table spans many groups at every scale) and pins the removal
    # refresh cost to (demoted group + replacement file), not table
    # size — the x8 row should stay flat/sublinear exactly like the
    # per-file row above, proving the shape survives past 4096 files.
    import cloudfloe_spark.sources.maintenance as _mt

    groot = os.path.join(out_dir, f"grp_analyze_x{n}", "t")
    shutil.rmtree(os.path.dirname(groot), ignore_errors=True)
    gt_ = _LIT(
        groot, pa_.schema([("id", pa_.int64()), ("v", pa_.float64())])
    )
    gt_.append_snapshot(
        [
            pa_.table(
                {
                    "id": np_.arange(
                        j * _CDC_FILE_ROWS,
                        (j + 1) * _CDC_FILE_ROWS,
                        dtype="int64",
                    ),
                    "v": np_.full(_CDC_FILE_ROWS, 0.5),
                }
            )
            for j in range(_CDC_BASE_FILES * n)
        ],
        timestamp_ms=_T0,
    )
    _old_target = _mt._GROUP_TARGET_FILES
    _mt._GROUP_TARGET_FILES = 8
    try:
        _analyze(
            spark, groot, timestamp_ms=_T0 + 3000, cache_mode="group"
        )
        delete_where(
            spark, groot, "id = 7", timestamp_ms=_T0 + 6000,
            mode="copy-on-write",
        )
        t0 = time.perf_counter()
        gres = _analyze(
            spark, groot, timestamp_ms=_T0 + 7000, incremental=True,
            cache_mode="group",
        )
        timings["analyze_incremental_removal_grouped"] = round(
            time.perf_counter() - t0, 3
        )
        assert gres["mode"] == "incremental-removal", gres
        assert gres["row_count"] == (
            _CDC_FILE_ROWS * _CDC_BASE_FILES * n - 1
        ), gres
    finally:
        _mt._GROUP_TARGET_FILES = _old_target

    # (s) ns MOR UPDATE (r13, VERDICT r12 #5): rewritten rows route
    # through the pyarrow executor write so files keep the ns logical
    # type — cost must be sized by the MATCH COUNT (constant here: one
    # file's worth of ids), not the table.
    n2root = os.path.join(out_dir, f"nsdml_x{n}", "t")
    shutil.rmtree(os.path.dirname(n2root), ignore_errors=True)
    n2t = _LIT(
        n2root,
        pa_.schema([("id", pa_.int64()), ("ts", pa_.timestamp("ns"))]),
    )
    n2t.append_snapshot(
        [
            pa_.table(
                {
                    "id": np_.arange(
                        j * _CDC_FILE_ROWS,
                        (j + 1) * _CDC_FILE_ROWS,
                        dtype="int64",
                    ),
                    "ts": (
                        1_700_000_000_000_000_000
                        + np_.arange(_CDC_FILE_ROWS, dtype="int64") * 1000
                        + 3
                    ).view("datetime64[ns]"),
                }
            )
            for j in range(_CDC_BASE_FILES * n)
        ],
        timestamp_ms=_T0,
    )
    t0 = time.perf_counter()
    ures = update_where(
        spark, n2root, f"id < {_CDC_FILE_ROWS}",
        {"id": "id + 1000000000"},
        timestamp_ms=_T0 + 1000,
    )
    timings["ns_mor_update"] = round(time.perf_counter() - t0, 3)
    assert ures["matched"] == _CDC_FILE_ROWS, ures

    # (t) write-side shredding (r15, VERDICT r14 #3): compaction with
    # target_layout="shredded" decodes each unshredded variant row and
    # re-encodes it shredded on the executors — the probe pins the pass
    # SCAN-LINEAR (time/row flat as the table grows; a super-linear row
    # would mean a driver-side or quadratic term hid in the rewrite).
    from cloudfloe_spark.functions.variant import (
        encode_variant as _encv,
    )
    from cloudfloe_spark.sources.maintenance import (
        compact_iceberg_table as _cit,
    )

    shroot = os.path.join(out_dir, f"reshred_x{n}", "t")
    shutil.rmtree(os.path.dirname(shroot), ignore_errors=True)
    _rsh_rows = 5_000
    vt_ = pa_.struct(
        [("metadata", pa_.binary()), ("value", pa_.binary())]
    )
    # one template batch, reused per file: the probe times the
    # DISTRIBUTED re-shred, not driver-side fixture encoding
    pairs = [
        dict(
            zip(
                ("metadata", "value"),
                _encv({"k": i, "s": f"x{i}", "extra": i % 3}),
            )
        )
        for i in range(_rsh_rows)
    ]
    sht = _LIT(
        shroot,
        pa_.schema([("id", pa_.int64()), ("v", vt_)]),
        variant_cols=("v",),
    )
    sht.append_snapshot(
        [
            pa_.table(
                {
                    "id": np_.arange(
                        j * _rsh_rows, (j + 1) * _rsh_rows, dtype="int64"
                    ),
                    "v": pa_.array(pairs, vt_),
                }
            )
            for j in range(4 * n)
        ],
        timestamp_ms=_T0,
    )
    t0 = time.perf_counter()
    _cit(
        spark, shroot, timestamp_ms=_T0 + 1000,
        target_layout="shredded",
        shred_descriptors={
            "v": {
                "kind": "object",
                "fields": {
                    "k": {"value": True, "typed": {"kind": "int"}},
                    "s": {"value": True, "typed": {"kind": "string"}},
                },
            }
        },
    )
    timings["reshred_compaction"] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    dml_only = "--dml-only" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_scale = int(args[0]) if args else 4
    out_dir = args[1] if len(args) > 1 else "/tmp/cloudfloe_scale_probe"
    if dml_only:
        spark = get_spark(app_name="scale-probe-dml")
        spark.sparkContext.setLogLevel("ERROR")
        scales = [n for n in (1, 2, 4, 8) if n <= max_scale]
        dml_results: dict[int, dict[str, float]] = {}
        for n in scales:
            dml_results[n] = dml_probe(spark, n, out_dir)
            print(
                json.dumps({"scale": n, "dml_queries": dml_results[n]}),
                flush=True,
            )
        base = dml_results[scales[0]]
        summary = {
            name: {
                f"x{n}": round(dml_results[n][name] / max(base[name], 1e-9), 2)
                for n in scales
            }
            for name in base
        }
        print(json.dumps({"metric": "dml_scale_ratios", "ratios": summary}))
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()
        return
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = all_queries()

    scales = [n for n in (1, 2, 4, 8) if n <= max_scale]
    results: dict[int, dict[str, float]] = {}
    skew_results: dict[int, dict[str, float]] = {}
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
        skew_results[n] = skew_probe(spark, n, out_dir)
        print(
            json.dumps({"scale": n, "skew_queries": skew_results[n]}),
            flush=True,
        )
        skew_results[n].update(dml_probe(spark, n, out_dir))
        print(
            json.dumps(
                {
                    "scale": n,
                    "dml_queries": {
                        k: v
                        for k, v in skew_results[n].items()
                        if k.startswith(("delete_where", "cdc_"))
                    },
                }
            ),
            flush=True,
        )

    base = results[scales[0]]
    summary = {
        name: {
            f"x{n}": round(results[n][name] / max(base[name], 1e-9), 2)
            for n in scales
        }
        for name in PROBE_QUERIES
    }
    print(json.dumps({"metric": "scale_ratios", "ratios": summary}))
    skew_base = skew_results[scales[0]]
    skew_summary = {
        name: {
            f"x{n}": round(skew_results[n][name] / max(skew_base[name], 1e-9), 2)
            for n in scales
        }
        for name in skew_base
    }
    print(json.dumps({"metric": "skew_scale_ratios", "ratios": skew_summary}))
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
