"""Pure-Python Iceberg table-metadata reader: snapshots, manifests, file
lists, and snapshot resolution for time travel — no Iceberg runtime jar.

The reference reads Iceberg natively through DuckDB's iceberg extension
(`backend/main.py:464` iceberg_scan, `:494-512` snapshot/metadata
listings, `README.md:197` time travel). Without the Spark-Iceberg runtime
on the classpath, this module supplies the same three surfaces from the
table's own metadata files:

- ``metadata/*.metadata.json``   → table state, snapshot log, schemas
- snapshot ``manifest-list`` avro → the snapshot's manifest files
- manifest avro                   → data/delete file entries

so a snapshot is exactly its manifest-listed parquet files — a correct
snapshot-pinned read for append/overwrite tables (row-level delete files
are detected and REJECTED upstream; applying them without the runtime
would be wrong).

Spec: https://iceberg.apache.org/spec/ (v1+v2 table metadata; manifest
entry status 0=EXISTING 1=ADDED 2=DELETED; data_file.content 0=data
1=position-deletes 2=equality-deletes).
"""

from __future__ import annotations

import functools as _functools
import glob as globmod
import json
import os
import re
from typing import Any, Optional

from cloudfloe_spark.sources import fsio
from cloudfloe_spark.sources.avrolite import read_avro, read_avro_bytes


class IcebergMetadataError(ValueError):
    """Unreadable/unsupported table layout, or an unknown snapshot."""


def _local_path(uri: str) -> str:
    if uri.startswith("file://"):
        return uri[len("file://"):]
    return uri


def _norm_root(root: str) -> str:
    """Table root in the form reads should use: a plain local path, or the
    scheme-qualified URI when it's served by a Hadoop FileSystem."""
    return root if fsio.is_remote(root) else _local_path(root)


def data_file_suffix(p: str) -> str:
    """Canonical table-relative key of a data-file path: URL-decoded,
    scheme-stripped, everything after the LAST ``/data/`` component.
    The ONE helper every path-keyed comparison must use — manifest
    ``file_path`` URIs, ``_metadata.file_path`` values (URL-encoded),
    ``input_file_name()`` output and local paths all key identically
    through it (r14, consolidating four per-module copies)."""
    from urllib.parse import unquote

    s = unquote(str(p))
    if s.startswith("file://"):
        s = s[len("file://"):]
    return s.rsplit("/data/", 1)[-1]


def _exists(path: str) -> bool:
    if fsio.is_remote(path):
        return fsio.exists(path)
    return os.path.exists(_local_path(path))


def _read_text(path: str) -> str:
    if fsio.is_remote(path):
        return fsio.read_text(path)
    with open(_local_path(path)) as f:
        return f.read()


@_functools.lru_cache(maxsize=256)
def _read_remote_manifest_cached(path: str) -> tuple:
    return tuple(read_avro_bytes(fsio.read_bytes(path), name=path))


def _read_manifest(path: str) -> list[dict]:
    if fsio.is_remote(path):
        # Iceberg manifests and manifest lists are immutable once written
        # (new snapshots write NEW files), so caching by full URI is
        # spec-safe — and one iceberg_scan resolves the same manifests
        # from several projections (live paths, delete files, sequence
        # numbers), which must not mean several network fetches each.
        return list(_read_remote_manifest_cached(path))
    return read_avro(_local_path(path))


def _join(root: str, *parts: str) -> str:
    return (
        fsio.join(root, *parts)
        if fsio.is_remote(root)
        else os.path.join(root, *parts)
    )


def _relocate(uri: str, root: str) -> str:
    """Resolve a metadata-recorded absolute URI against the table root.
    Iceberg records absolute paths from write time; a copied/moved table
    keeps its layout, so re-anchor at the last ``/metadata/`` or ``/data/``
    component when the recorded path doesn't exist. ``root`` may be a local
    path or a served-scheme URI — candidates stay in the root's scheme."""
    p = uri if fsio.is_remote(uri) else _local_path(uri)
    if _exists(p):
        return p
    for anchor in ("/metadata/", "/data/"):
        if anchor in p:
            candidate = _join(root, p[p.rindex(anchor) + 1 :])
            if _exists(candidate):
                return candidate
    return p  # let the caller's read raise with the original path


def latest_metadata_path(root: str) -> str:
    """Newest table-metadata file under ``<root>/metadata/``.

    HadoopCatalog names these ``v<N>.metadata.json`` with an UNPADDED version
    number, so a lexicographic sort would serve stale state from v9 once v10
    exists. Honor ``version-hint.text`` when present (the catalog's own
    pointer), else sort by the parsed numeric version with a lexicographic
    fallback for uuid-style names (``<padded-N>-<uuid>.metadata.json``)."""
    root_n = _norm_root(root)
    meta_dir = _join(root_n, "metadata")
    hint = _join(meta_dir, "version-hint.text")
    if _exists(hint):
        try:
            v = int(_read_text(hint).strip())
            candidate = _join(meta_dir, f"v{v}.metadata.json")
            if _exists(candidate):
                return candidate
        except (OSError, ValueError):
            pass  # malformed hint — fall through to the directory scan
    if fsio.is_remote(root_n):
        try:
            files = [
                p
                for p in fsio.listdir(meta_dir)
                if p.endswith(".metadata.json")
            ]
        except OSError:
            files = []
    else:
        files = globmod.glob(os.path.join(meta_dir, "*.metadata.json"))
    if not files:
        raise IcebergMetadataError(f"no Iceberg metadata under {root!r}")

    def _version_key(path: str) -> tuple[int, str]:
        m = re.match(r"v?(\d+)", os.path.basename(path))
        return (int(m.group(1)) if m else -1, path)

    return max(files, key=_version_key)


def load_metadata(root: str, metadata_path: Optional[str] = None) -> dict:
    """Parse table metadata — the newest file under the root by default,
    or an explicit ``metadata_path`` when a catalog (e.g. REST
    LoadTableResult's metadata-location) is authoritative about which
    version is current; a directory scan could disagree with the catalog
    after a failed-then-retried commit left an orphan metadata file."""
    path = (
        _relocate(metadata_path, _norm_root(root))
        if metadata_path
        else latest_metadata_path(root)
    )
    try:
        if fsio.is_remote(path):
            # Version metadata files (vN.metadata.json / NNNNN-uuid) are
            # immutable — commits write a NEW version — so the remote
            # fetch caches by resolved path. Resolution itself (directory
            # listing / version-hint) stays uncached above.
            raw = _read_remote_bytes_cached(path)
        else:
            with open(_local_path(path), "rb") as fh:
                raw = fh.read()
        # gzip-compressed metadata (r12): tables written with
        # write.metadata.compression-codec=gzip name their files
        # vN.gz.metadata.json — detected by magic, not name, so catalog
        # locations without the marker read too
        if raw[:2] == b"\x1f\x8b":
            import gzip as _gzip

            raw = _gzip.decompress(raw)
        return json.loads(raw.decode("utf-8"))
    except (OSError, json.JSONDecodeError) as e:
        raise IcebergMetadataError(f"cannot read metadata {path!r}: {e}")


@_functools.lru_cache(maxsize=64)
def _read_remote_bytes_cached(path: str) -> bytes:
    return fsio.read_bytes(path)


def snapshots(root: str) -> list[dict]:
    """All snapshots, oldest→newest (metadata JSON order)."""
    return list(load_metadata(root).get("snapshots", []))


def resolve_snapshot(
    root: str,
    *,
    version: Optional[int] = None,
    timestamp_ms: Optional[int] = None,
    metadata_path: Optional[str] = None,
) -> dict:
    """The snapshot for a time-travel clause — or the current one.

    ``version``      → exact snapshot id (error when unknown);
    ``timestamp_ms`` → latest snapshot with timestamp-ms <= the bound
    (error when the table has no snapshot that old) — Iceberg/Spark
    ``TIMESTAMP AS OF`` semantics.
    """
    meta = load_metadata(root, metadata_path)
    snaps = meta.get("snapshots", [])
    if version is not None:
        for s in snaps:
            if s.get("snapshot-id") == version:
                return s
        raise IcebergMetadataError(
            f"snapshot {version} not found (known: "
            f"{[s.get('snapshot-id') for s in snaps]})"
        )
    if timestamp_ms is not None:
        eligible = [
            s for s in snaps if s.get("timestamp-ms", 0) <= timestamp_ms
        ]
        if not eligible:
            raise IcebergMetadataError(
                f"no snapshot at or before timestamp {timestamp_ms}"
            )
        return max(eligible, key=lambda s: s.get("timestamp-ms", 0))
    cur = meta.get("current-snapshot-id")
    if cur is None or cur == -1:
        raise IcebergMetadataError("table has no current snapshot")
    for s in snaps:
        if s.get("snapshot-id") == cur:
            return s
    raise IcebergMetadataError(f"current snapshot {cur} missing from metadata")


def manifest_entries(root: str, snapshot: dict) -> list[dict]:
    """Flattened manifest entries for a snapshot: one dict per file entry,
    each with ``manifest_path``, ``manifest_content``, ``status`` and the
    nested ``data_file`` record."""
    mlist_uri = snapshot.get("manifest-list")
    if not mlist_uri:
        raise IcebergMetadataError(
            f"snapshot {snapshot.get('snapshot-id')} has no manifest-list "
            "(v1 'manifests' inline form not supported)"
        )
    root_n = _norm_root(root)
    out: list[dict] = []
    for m in _read_manifest(_relocate(mlist_uri, root_n)):
        mpath = _relocate(m["manifest_path"], root_n)
        # v1 manifest lists have no 'content' field; 0 == data manifests
        mcontent = m.get("content", 0)
        for entry in _read_manifest(mpath):
            # v2 data sequence number, with the spec's inheritance chain:
            # entry value → manifest-list sequence → snapshot sequence
            # (v1 files carry none of these; 0 sorts before any v2 seq,
            # matching the spec's "v1 rows are sequence 0" rule).
            seq = entry.get("sequence_number")
            if seq is None:
                seq = m.get("sequence_number")
            if seq is None:
                seq = snapshot.get("sequence-number", 0)
            out.append(
                {
                    "manifest_path": m["manifest_path"],
                    "manifest_content": mcontent,
                    "status": entry.get("status", 0),
                    "sequence_number": seq,
                    "data_file": entry["data_file"],
                }
            )
    return out


def live_data_files(root: str, snapshot: dict) -> list[dict]:
    """data_file records that are LIVE in this snapshot (status != DELETED,
    content == data)."""
    return [
        e["data_file"]
        for e in manifest_entries(root, snapshot)
        if e["status"] != 2
        and e["manifest_content"] == 0
        and e["data_file"].get("content", 0) == 0
    ]


def has_delete_files(root: str, snapshot: dict) -> bool:
    """True when the snapshot carries row-level delete files (manifest
    content=1, or data_file.content in (1,2))."""
    for e in manifest_entries(root, snapshot):
        if e["status"] == 2:
            continue
        if e["manifest_content"] != 0 or e["data_file"].get("content", 0) != 0:
            return True
    return False


def delete_file_records(root: str, snapshot: dict) -> list[dict]:
    """Live delete-file records (Iceberg v2 content 1=position, 2=equality)."""
    return [
        e["data_file"]
        for e in manifest_entries(root, snapshot)
        if e["status"] != 2
        and (
            e["manifest_content"] == 1
            or e["data_file"].get("content", 0) in (1, 2)
        )
    ]


def _is_dv(f: dict) -> bool:
    """True for a v3 DELETION-VECTOR entry: content=1 but the file is a
    Puffin blob reference, not position-delete parquet."""
    return (
        str(f.get("file_format") or "").upper() == "PUFFIN"
        or f.get("referenced_data_file") is not None
    )


def position_delete_paths(root: str, snapshot: dict) -> list[str]:
    """Local paths of the snapshot's position-delete parquet files
    (content=1: rows of ``(file_path, pos)`` naming deleted rows). These
    ARE readable without the Iceberg runtime — apply with an anti-join
    against the data scan's per-file row index. v3 deletion-vector
    entries are EXCLUDED (Puffin, not parquet) — they surface through
    :func:`deletion_vector_records` and consumers that cannot apply them
    must check :func:`has_deletion_vectors` explicitly."""
    root_local = _norm_root(root)
    return sorted(
        _relocate(f["file_path"], root_local)
        for f in delete_file_records(root, snapshot)
        if f.get("content", 0) == 1 and not _is_dv(f)
    )


def deletion_vector_records(root: str, snapshot: dict) -> list[dict]:
    """Live v3 DELETION-VECTOR entries (r10 stretch): ``{"path"`` (the
    Puffin file), ``"referenced_data_file", "offset", "length", "seq"}``
    — everything :mod:`sources.puffin` needs to decode the deleted
    positions of one data file. Entries missing the blob coordinates
    raise (reading AROUND a delete would silently resurrect rows)."""
    root_local = _norm_root(root)
    out = []
    for e in manifest_entries(root, snapshot):
        f = e["data_file"]
        if e["status"] == 2 or f.get("content", 0) != 1 or not _is_dv(f):
            continue
        if (
            f.get("referenced_data_file") is None
            or f.get("content_offset") is None
            or f.get("content_size_in_bytes") is None
        ):
            raise IcebergMetadataError(
                "v3 deletion-vector entry lacks referenced_data_file/"
                "content_offset/content_size_in_bytes — cannot apply it, "
                "and reading around it would resurrect deleted rows"
            )
        out.append(
            {
                "path": _relocate(f["file_path"], root_local),
                "referenced_data_file": f["referenced_data_file"],
                "offset": int(f["content_offset"]),
                "length": int(f["content_size_in_bytes"]),
                "seq": e.get("sequence_number"),
            }
        )
    return sorted(out, key=lambda d: (d["referenced_data_file"], d["path"]))


def has_deletion_vectors(root: str, snapshot: dict) -> bool:
    """Cheap manifest-level check for consumers that cannot apply DVs
    (CDC ranges, the streaming source, position-delete rewrites) — they
    must FAIL clearly rather than silently miss deletions."""
    return any(
        f.get("content", 0) == 1 and _is_dv(f)
        for f in delete_file_records(root, snapshot)
    )


#: v3 column types this reader cannot materialize. EMPTY as of r12 —
#: every v3 type reads: variant decodes both physical layouts to a
#: JSON-string surface; timestamp_ns/timestamptz_ns read as
#: microsecond-truncated TIMESTAMP (DuckDB's own ns→µs rule);
#: `unknown` (the always-null placeholder) reads as an all-NULL STRING
#: column; geometry/geography surface their PHYSICAL form — raw WKB
#: bytes as BINARY (Spark has no geo type; WKB is what geo engines
#: consume). The set stays for future spec types.
_V3_UNSUPPORTED_TYPES: set = set()

_NS_TYPES = ("timestamp_ns", "timestamptz_ns")

#: primitive Iceberg types whose JSON single-value default the reader
#: can materialize as a Spark literal-cast (``lit(v).cast(ddl)``) —
#: date/timestamp/decimal defaults arrive as their spec JSON string
#: form, which Spark's cast parses. binary/fixed (base16 strings) and
#: nested types are NOT fillable and keep rejecting.
_DEFAULTABLE_PRIMITIVES = {
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "date",
    "timestamp",
    "timestamptz",
    "string",
    "uuid",
}


def _fillable_default(f: dict) -> bool:
    """Can this schema field's ``initial-default`` be honored on read?"""
    t = f.get("type")
    if not isinstance(t, str):
        return False  # nested-type defaults: not supported
    if t in _DEFAULTABLE_PRIMITIVES or t.startswith("decimal("):
        d = f.get("initial-default")
        return not isinstance(d, (dict, list))
    return False


def schema_default_fills(
    meta: dict, schema_id: Optional[int] = None
) -> "dict[str, tuple]":
    """``current column name → (initial-default JSON value, spark DDL
    type)`` for every field of the target schema carrying an
    ``initial-default`` (Iceberg v3): the value a reader must produce
    for rows in data files written BEFORE the column existed — the
    add-column-with-default schema evolution. Fields whose defaults the
    reader cannot honor are absent here; ``unsupported_v3_features``
    rejects those tables outright."""
    sch = _schema_for(meta, schema_id)
    out: dict[str, tuple] = {}
    for f in sch.get("fields", []):
        if f.get("initial-default") is None:
            continue
        if _fillable_default(f):
            out[f["name"]] = (
                f["initial-default"],
                _iceberg_type_to_ddl(f["type"]),
            )
    return out


def variant_columns(
    meta: dict, schema_id: Optional[int] = None
) -> list[str]:
    """Top-level column names of the target schema typed ``variant``
    (Iceberg v3) — the columns the batch scan decodes to the engine's
    canonical-JSON STRING surface (r12)."""
    try:
        sch = _schema_for(meta, schema_id)
    except IcebergMetadataError:
        return []
    return [
        f["name"]
        for f in sch.get("fields", [])
        if f.get("type") == "variant"
    ]


_FOOTER_SCHEMA_CACHE: dict = {}


def variant_shred_groups(
    paths: "list[str]",
    cols: "list[str]",
    name_history: "dict[str, str] | None" = None,
    resolve_renames: bool = False,
) -> "tuple[list[str], list, list[str]]":
    """Split a snapshot's data files by variant PHYSICAL layout (r12,
    shredded reads): ``(unshredded_paths, shred_groups, errors)`` where
    each shred group is ``(paths, {col: reassembly descriptor})`` for
    files sharing an identical footer schema (same descriptors AND same
    non-variant physical shape, so one footer-inferred read per group
    is sound). ``errors`` names files whose shredding shape this reader
    cannot render (unsupported leaf types, malformed groups) — the
    caller 400s precisely. Cached per immutable file.

    ``name_history`` (historical→current names): a variant column
    RENAMED after shredded files were written keeps its OLD parquet
    name in those footers. With ``resolve_renames=False`` such files
    are reported as errors (without historical-name detection the
    plain path's explicit (metadata, value) DDL would silently DROP
    every typed_value via struct pruning). With ``resolve_renames=True``
    (r15, VERDICT r14 #1) each group instead resolves its descriptor
    leaves against the file's WRITE-TIME names and the group tuple
    grows a third element — the group's on-disk→current rename map over
    ALL footer columns — so the scan can rename after delete
    application exactly as plain groups do; descriptors are keyed by
    CURRENT column name either way."""
    import pyarrow as pa

    from cloudfloe_spark.functions.variant import shred_descriptor

    hist = name_history or {}
    old_names: dict = {}
    for old, cur in hist.items():
        if cur in cols and old != cur:
            old_names.setdefault(cur, []).append(old)

    plain: list[str] = []
    groups: dict = {}
    errors: list[str] = []
    for p in paths:
        sch = _FOOTER_SCHEMA_CACHE.get(p)
        if sch is None:
            import pyarrow.parquet as pq

            from cloudfloe_spark.sources import fsio

            if fsio.is_remote(p):
                sch = pq.read_schema(pa.BufferReader(fsio.read_bytes(p)))
            else:
                sch = pq.read_schema(p.removeprefix("file://"))
            _FOOTER_SCHEMA_CACHE[p] = sch
        suffix = p.rsplit("/data/", 1)[-1]
        descs: dict = {}
        bad = False
        for c in cols:
            disk = c if c in sch.names else None
            for old in old_names.get(c, []):
                if old not in sch.names:
                    continue
                if not resolve_renames:
                    # a renamed variant column keeps its OLD parquet
                    # name in pre-rename files — a shredded layout
                    # hiding there must surface as an error, never as
                    # a silent typed_value drop
                    is_shredded_old = pa.types.is_struct(
                        sch.field(old).type
                    ) and "typed_value" in {
                        sch.field(old).type.field(i).name
                        for i in range(sch.field(old).type.num_fields)
                    }
                    if is_shredded_old:
                        errors.append(
                            f"variant column {c!r} (on-disk name "
                            f"{old!r}) in {suffix} is SHREDDED and the "
                            "column was renamed since — this consumer "
                            "did not declare a rename-aware shredded "
                            "read surface; compact_iceberg_table "
                            "normalizes the layout first"
                        )
                        bad = True
                    continue
                if disk is not None:
                    # one physical file carrying BOTH the old and the
                    # current name for one field id cannot exist under
                    # Iceberg's metadata-only renames; refuse rather
                    # than guess which column holds the data
                    errors.append(
                        f"variant column {c!r} in {suffix} appears "
                        f"under both {old!r} and {c!r} — ambiguous "
                        "footer; rewrite the file"
                    )
                    bad = True
                else:
                    disk = old
            if bad or disk is None:
                continue  # predates the column: NULL either way
            t = sch.field(disk).type
            label = (
                f"variant column {c!r}"
                if disk == c
                else f"variant column {c!r} (on-disk name {disk!r})"
            )
            if not pa.types.is_struct(t):
                errors.append(
                    f"{label} in {suffix} has non-struct "
                    f"physical type {t}"
                )
                bad = True
                continue
            sub = {t.field(i).name for i in range(t.num_fields)}
            if "typed_value" not in sub:
                if "metadata" in sub and "value" in sub and not (
                    sub - {"metadata", "value"}
                ):
                    continue  # unshredded
                errors.append(
                    f"{label} in {suffix} lacks the "
                    "(metadata, value) pair"
                )
                bad = True
                continue
            if "metadata" not in sub or sub - {
                "metadata", "value", "typed_value"
            }:
                errors.append(
                    f"{label} in {suffix} has unexpected "
                    f"subcolumns {sorted(sub)}"
                )
                bad = True
                continue
            try:
                descs[c] = shred_descriptor(
                    t.field("typed_value").type
                )
            except ValueError as e:
                errors.append(f"{label} in {suffix}: {e}")
                bad = True
        if bad:
            continue
        if descs:
            if resolve_renames:
                rmap = {
                    n: hist[n]
                    for n in sch.names
                    if n in hist and hist[n] != n
                }
                groups.setdefault(str(sch), ([], descs, rmap))[
                    0
                ].append(p)
            else:
                groups.setdefault(str(sch), ([], descs))[0].append(p)
        else:
            plain.append(p)
    return plain, list(groups.values()), errors


def schema_read_pairs(
    root: str,
    metadata_path: "Optional[str]" = None,
    schema_id: "Optional[int]" = None,
    variant_as: "str | None" = None,
    ns_as: "str | None" = None,
) -> "list[tuple[str, str]]":
    """``(column name, spark DDL type)`` pairs of the target schema —
    what a non-DDL (footer-inferred) read uses to align its columns
    with the explicit-DDL groups before a union."""
    meta = load_metadata(root, metadata_path)
    sch = _schema_for(meta, schema_id)
    return [
        (f["name"], _iceberg_type_to_ddl(f["type"], variant_as, ns_as))
        for f in sch["fields"]
    ]


def ns_timestamp_columns(
    meta: dict, schema_id: Optional[int] = None
) -> list[str]:
    """Top-level column names of the target schema typed
    ``timestamp_ns`` / ``timestamptz_ns`` (Iceberg v3) — the columns
    the batch scan reads as raw nanosecond longs (physical DDL BIGINT
    under ``spark.sql.legacy.parquet.nanosAsLong``) and truncates to
    microsecond TIMESTAMP (r12, VERDICT r11 #4). Truncation toward
    zero is Spark's ``div`` on the long — the same rule DuckDB applies
    casting TIMESTAMP_NS to TIMESTAMP (verified on pre-epoch values),
    so oracles see identical values; int64 ns→µs division cannot
    overflow."""
    try:
        sch = _schema_for(meta, schema_id)
    except IcebergMetadataError:
        return []
    return [
        f["name"]
        for f in sch.get("fields", [])
        if f.get("type") in _NS_TYPES
    ]


def ns_precision_errors(
    paths: "list[str]",
    cols: "list[str]",
    name_history: "dict[str, str] | None" = None,
) -> list[str]:
    """Per-file footer probe of the ns columns' physical precision: a
    v3 ``timestamp → timestamp_ns`` type promotion leaves older files
    at MICROsecond physical precision, which the raw-long read would
    misscale by 1000× — such files are named here so the read can 400
    precisely. ``name_history`` (historical→current) extends the probe
    to files written before a RENAME of the ns column (their footers
    carry the old name). Only ns tables pay the footer read (cached per
    immutable file)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources import fsio

    names_for: dict[str, list[str]] = {c: [c] for c in cols}
    for old, cur in (name_history or {}).items():
        if cur in names_for and old != cur:
            names_for[cur].append(old)

    out: list[str] = []
    for p in paths:
        sch = _FOOTER_SCHEMA_CACHE.get(p)
        if sch is None:
            if fsio.is_remote(p):
                sch = pq.read_schema(pa.BufferReader(fsio.read_bytes(p)))
            else:
                sch = pq.read_schema(p.removeprefix("file://"))
            _FOOTER_SCHEMA_CACHE[p] = sch
        suffix = p.rsplit("/data/", 1)[-1]
        for c, cand in names_for.items():
            disk = next((n for n in cand if n in sch.names), None)
            if disk is None:
                continue  # file predates the column: reads as NULL
            t = sch.field(disk).type
            if not (pa.types.is_timestamp(t) and t.unit == "ns"):
                out.append(
                    f"timestamp_ns column {c!r} in {suffix} has physical "
                    f"type {t} (written before a µs→ns type promotion?) "
                    "— rewrite the file at nanosecond precision first"
                )
    return out


def unsupported_v3_features(
    root: str, metadata_path: "Optional[str]" = None
) -> list[str]:
    """Iceberg v3 features in this table's metadata that the reader does
    NOT support — deletion vectors ARE supported (r10), and primitive
    schema default values are honored on read as of r11 (VERDICT r10
    #4: ``initial-default`` fills the column for data files that predate
    it; ``write-default`` is writer-side advice that never changes read
    semantics). Still rejected: defaults on binary/fixed/nested columns
    (no literal-cast materialization), the v3-only column types, and any
    format-version above 3. Row-lineage bookkeeping fields
    (``next-row-id``, ``first-row-id``) are additive metadata a plain
    read can safely ignore, so they do not reject. Empty list ⇒ the
    table is readable."""
    meta = load_metadata(root, metadata_path)
    fv = int(meta.get("format-version") or 1)
    out: list[str] = []
    if fv > 3:
        out.append(f"format-version {fv}")
        return out
    if fv < 3:
        return out
    schemas = meta.get("schemas") or (
        [meta["schema"]] if meta.get("schema") else []
    )
    for sch in schemas:
        for f in sch.get("fields", []):
            if f.get("initial-default") is not None and not _fillable_default(
                f
            ):
                out.append(
                    f"non-primitive default value on column "
                    f"{f.get('name')!r}"
                )
            t = f.get("type")
            # variant (r12, VERDICT r11 #1) is READABLE unshredded: the
            # batch scan decodes the (metadata, value) pair to a
            # canonical-JSON STRING column (functions/variant.py);
            # shredded FILES are rejected per file at scan time
            # (variant_shredding_errors), not here at the schema level.
            if isinstance(t, str) and t in _V3_UNSUPPORTED_TYPES:
                out.append(
                    f"v3 type {t!r} on column {f.get('name')!r}"
                )
    return out


def row_lineage_available(
    root: str, metadata_path: "Optional[str]" = None
) -> bool:
    """Does this table carry v3 row lineage (``next-row-id`` in the
    table metadata)? Lineage-carrying tables expose ``_row_id`` through
    ``iceberg_row_lineage()`` and let changelogs survive compaction."""
    return (
        load_metadata(root, metadata_path).get("next-row-id") is not None
    )


def first_row_ids(root: str, snapshot: dict) -> "dict[str, int | None]":
    """Live data files' ``first_row_id`` keyed by path suffix under
    ``data/`` — row N of a file has id ``first_row_id + N``. ``None``
    for rewritten (compacted) files, whose rows carry a materialized
    ``_row_id`` parquet column instead."""
    out: dict = {}
    for e in manifest_entries(root, snapshot):
        f = e["data_file"]
        if e["status"] == 2 or f.get("content", 0) != 0:
            continue
        out[f["file_path"].rsplit("/data/", 1)[-1]] = f.get("first_row_id")
    return out


def file_sequence_numbers(root: str, snapshot: dict) -> "dict[str, int]":
    """Live data files' DATA sequence numbers keyed by path suffix under
    ``data/`` — the inherited ``_last_updated_sequence_number`` for rows
    whose files don't materialize the column (Iceberg v3 row lineage:
    a row's last-updated sequence is the materialized parquet value when
    present, else its file's data sequence number)."""
    out: dict = {}
    for e in manifest_entries(root, snapshot):
        f = e["data_file"]
        if e["status"] == 2 or f.get("content", 0) != 0:
            continue
        out[f["file_path"].rsplit("/data/", 1)[-1]] = int(
            e.get("sequence_number") or 0
        )
    return out


def position_delete_records(root: str, snapshot: dict) -> list[dict]:
    """Live position-delete files WITH their commit sequence numbers:
    ``{"path", "seq"}`` — the ordering a changelog read needs to tell
    in-range deletes from pre-range ones."""
    root_local = _norm_root(root)
    out = []
    for e in manifest_entries(root, snapshot):
        f = e["data_file"]
        if e["status"] == 2 or f.get("content", 0) != 1 or _is_dv(f):
            continue
        out.append(
            {
                "path": _relocate(f["file_path"], root_local),
                "seq": e["sequence_number"],
            }
        )
    return sorted(out, key=lambda d: (d["seq"], d["path"]))


def position_delete_targets(paths: list[str]) -> set[str]:
    """Distinct data-file path SUFFIXES (after the last ``/data/``
    component — unique within a table: uuid file names) referenced by a
    set of position-delete parquet files, read driver-side. Position
    deletes name their target data files explicitly (spec column
    ``file_path``), so a changelog/read planner can restrict the carried
    scan to exactly the files a delete touches — a 10-row DELETE followed
    by ``iceberg_cdc`` then scans those files, not the table. Driver-side
    is the right side of the plan: this is planning metadata, the same
    role manifests play — and it's almost always FOOTER-ONLY: the spec
    requires position-delete files sorted by (file_path, pos), so a row
    group whose file_path min == max names exactly one data file in its
    statistics; only row groups spanning a file boundary (at most one per
    referenced-file transition) need their column read. A production
    reader gets the same answer from the manifest's
    ``referenced_data_file`` / per-column bounds when present."""
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources import fsio

    out: set[str] = set()
    for p in paths:
        if fsio.is_remote(p):
            import pyarrow as pa

            pf = pq.ParquetFile(pa.BufferReader(fsio.read_bytes(p)))
        else:
            pf = pq.ParquetFile(p.removeprefix("file://"))
        col_idx = pf.schema_arrow.get_field_index("file_path")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(col_idx).statistics
            # Trust the stats only when min == max AND the value ends in
            # ".parquet": writers may TRUNCATE long string min/max, and a
            # truncated prefix can read equal while the true paths differ —
            # a data-file path ends in ".parquet" exactly once, so a value
            # with that suffix is provably untruncated.
            if (
                st is not None
                and st.has_min_max
                and st.min is not None
                and st.min == st.max
                and str(st.min).endswith(".parquet")
            ):
                out.add(str(st.min).rsplit("/data/", 1)[-1])
                continue
            # boundary row group (or absent/truncated stats): read its column
            for v in (
                pf.read_row_group(rg, columns=["file_path"])
                .column("file_path")
                .to_pylist()
            ):
                if v is not None:
                    out.add(v.rsplit("/data/", 1)[-1])
    return out


_DELETE_TARGET_CACHE: dict[str, frozenset] = {}


def position_delete_targets_cached(path: str) -> frozenset:
    """Per-file cached :func:`position_delete_targets` (delete files are
    immutable, like data files — the footer answer never changes)."""
    t = _DELETE_TARGET_CACHE.get(path)
    if t is None:
        t = frozenset(position_delete_targets([path]))
        _DELETE_TARGET_CACHE[path] = t
    return t


def prune_position_deletes(
    delete_paths: list[str], scanned_paths: list[str]
) -> list[str]:
    """Restrict a scan's position-delete file list to the files that NAME
    at least one scanned data file — sound because the delete anti-join
    keys on (file suffix, pos): a delete file whose referenced data files
    are all outside the scan cannot match any scanned row.

    This is the READ-side twin of the CDC carried-scan pruning: after
    partition/stats pruning cuts a 100-TB scan to one partition, the scan
    should not pay an anti-join against every delete file the table has
    accumulated — only against the ones targeting its files. Driver cost
    is footer-stats-only per delete file (cached across queries); an
    unreadable footer keeps the file (sound)."""
    scanned = {p.rsplit("/data/", 1)[-1] for p in scanned_paths}
    kept = []
    for d in delete_paths:
        try:
            if position_delete_targets_cached(d) & scanned:
                kept.append(d)
        except Exception:
            kept.append(d)
    return kept


def has_equality_deletes(root: str, snapshot: dict) -> bool:
    """True when the snapshot carries equality-delete files (content=2)."""
    return any(
        f.get("content", 0) == 2 for f in delete_file_records(root, snapshot)
    )


def equality_delete_records(root: str, snapshot: dict) -> list[dict]:
    """Live equality-delete files (content=2) with the data they need for
    sequence-ordered application: local ``path``, the delete's data
    ``seq`` (it removes rows whose data sequence is strictly lower), and
    the schema field ``equality_ids`` it matches on."""
    root_local = _norm_root(root)
    out = []
    for e in manifest_entries(root, snapshot):
        f = e["data_file"]
        if e["status"] == 2 or f.get("content", 0) != 2:
            continue
        out.append(
            {
                "path": _relocate(f["file_path"], root_local),
                "seq": e["sequence_number"],
                "equality_ids": f.get("equality_ids") or [],
            }
        )
    return sorted(out, key=lambda d: (d["seq"], d["path"]))


def live_data_seqs(root: str, snapshot: dict) -> dict[str, int]:
    """Local path → data sequence number for the snapshot's live data
    files (the ordering key equality deletes apply against)."""
    root_local = _norm_root(root)
    return {
        _relocate(e["data_file"]["file_path"], root_local): e[
            "sequence_number"
        ]
        for e in manifest_entries(root, snapshot)
        if e["status"] != 2
        and e["manifest_content"] == 0
        and e["data_file"].get("content", 0) == 0
    }


def schema_field_names(
    root: str,
    metadata_path: Optional[str] = None,
    schema_id: Optional[int] = None,
) -> dict[int, str]:
    """Field id → column name for ``schema_id`` (default: the current
    schema; a snapshot-pinned read passes ITS schema id so time travel
    resolves names as of that snapshot). Equality_ids are field ids.
    Top-level fields only — nested equality deletes are out of scope for
    the no-runtime reader."""
    meta = load_metadata(root, metadata_path)
    schemas = meta.get("schemas") or []
    target = schema_id if schema_id is not None else meta.get(
        "current-schema-id", 0
    )
    schema = next(
        (s for s in schemas if s.get("schema-id") == target),
        meta.get("schema"),  # v1 single-schema form
    )
    if not schema:
        return {}
    return {
        f["id"]: f["name"]
        for f in schema.get("fields", [])
        if "id" in f and "name" in f
    }


def unreadable_equality_deletes(
    root: str, snapshot: dict, metadata_path: Optional[str] = None
) -> list[str]:
    """Paths of equality-delete files the no-runtime reader CANNOT apply:
    missing equality_ids, or ids that don't resolve to top-level fields
    of the current schema. Empty ⇒ every equality delete is applicable."""
    names = schema_field_names(root, metadata_path)
    return [
        d["path"]
        for d in equality_delete_records(root, snapshot)
        if not d["equality_ids"]
        or any(i not in names for i in d["equality_ids"])
    ]


def live_data_paths(root: str, snapshot: dict) -> list[str]:
    """Local filesystem paths of the snapshot's live parquet data files."""
    root_local = _norm_root(root)
    return sorted(
        _relocate(f["file_path"], root_local)
        for f in live_data_files(root, snapshot)
    )


# --- Iceberg schema JSON → Spark DDL (for empty-snapshot reads) --------------

_PRIMITIVES = {
    "boolean": "BOOLEAN",
    "int": "INT",
    "long": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "date": "DATE",
    "time": "BIGINT",  # Spark has no TIME; microseconds-since-midnight
    # Iceberg `timestamp` (naive) maps to TIMESTAMP, not TIMESTAMP_NTZ:
    # with spark.sql.parquet.inferTimestampNTZ.enabled=false (see
    # sources/tables.py) a naive column in the DATA files reads as
    # TIMESTAMP (LTZ, session tz pinned UTC), so the empty-snapshot DDL
    # branch must declare the same type or the one table would change
    # schema depending on whether the resolved snapshot has data files.
    "timestamp": "TIMESTAMP",
    "timestamptz": "TIMESTAMP",
    "string": "STRING",
    "uuid": "STRING",
    "binary": "BINARY",
    # v3 `unknown` (r12): the spec's type-not-yet-known placeholder —
    # every value is null by definition, so an all-NULL STRING column
    # is an exact read (files never carry non-null values for it)
    "unknown": "STRING",
}


#: physical Parquet layout of an UNSHREDDED v3 variant column — the
#: (metadata, value) binary pair the batch scan reads before decoding
#: to the engine's JSON-string surface (functions/variant.py)
VARIANT_PHYSICAL_DDL = "STRUCT<`metadata`: BINARY, `value`: BINARY>"


def _iceberg_type_to_ddl(
    t: Any, variant_as: "str | None" = None, ns_as: "str | None" = None
) -> str:
    """``variant_as`` controls the v3 ``variant`` type (r12):
    ``"physical"`` emits the unshredded (metadata, value) struct the
    parquet reader needs; ``"string"`` emits the engine's surfaced type
    (canonical JSON text); the default rejects with the gap named —
    only the batch ``iceberg_scan`` path implements the decode, so
    every OTHER consumer (CDC, DML, streaming, changelog) keeps its
    clear 400 instead of silently emitting raw binary structs.

    ``ns_as`` controls the v3 nanosecond timestamps the same way:
    ``"physical"`` emits BIGINT (the raw nanosecond long the parquet
    reader produces under ``nanosAsLong``), ``"timestamp"`` emits the
    surfaced µs-truncated TIMESTAMP, and the default rejects — a
    non-scan consumer reading the raw long would silently emit
    nanosecond integers where timestamps belong."""
    if isinstance(t, str):
        if t == "variant":
            if variant_as == "physical":
                return VARIANT_PHYSICAL_DDL
            if variant_as == "string":
                return "STRING"
            raise IcebergMetadataError(
                "variant column: this consumer did not declare a "
                "variant read surface (pass variant_as='string' for "
                "the canonical-JSON surface or 'physical' for the raw "
                "struct) — refusing to emit raw binary structs"
            )
        if t in _NS_TYPES:
            if ns_as == "physical":
                return "BIGINT"
            if ns_as == "timestamp":
                return "TIMESTAMP"
            raise IcebergMetadataError(
                f"{t} column: this consumer did not declare a "
                "nanosecond-timestamp read surface (pass "
                "ns_as='timestamp' for the µs-truncated TIMESTAMP "
                "surface or 'physical' for the raw nanosecond BIGINT) "
                "— refusing to silently emit nanosecond integers "
                "where timestamps belong"
            )
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        if t.startswith("decimal("):
            return t.upper()
        if t.startswith("fixed["):
            return "BINARY"
        if t.startswith(("geometry", "geography")):
            # v3 geo types (r12): surfaced as their PHYSICAL form — raw
            # WKB bytes (the optional CRS parameter rides in the type
            # string only); what Sedona-style consumers decode
            return "BINARY"
        raise IcebergMetadataError(f"unsupported iceberg type {t!r}")
    kind = t.get("type")
    if kind == "struct":
        # nested variant stays rejected (no variant_as pass-through):
        # the decode surface is top-level columns only
        inner = ", ".join(
            f"`{f['name']}`: {_iceberg_type_to_ddl(f['type'])}"
            for f in t["fields"]
        )
        return f"STRUCT<{inner}>"
    if kind == "list":
        return f"ARRAY<{_iceberg_type_to_ddl(t['element'])}>"
    if kind == "map":
        return (
            f"MAP<{_iceberg_type_to_ddl(t['key'])}, "
            f"{_iceberg_type_to_ddl(t['value'])}>"
        )
    raise IcebergMetadataError(f"unsupported iceberg type {t!r}")


def _ddl_ok(t: Any) -> bool:
    """Whether ``_iceberg_type_to_ddl`` can map ``t`` without a variant
    surface decision (used to SKIP fields in contexts where the column
    could never participate anyway, e.g. identity-partition sources)."""
    try:
        _iceberg_type_to_ddl(t)
        return True
    except IcebergMetadataError:
        return False


def current_schema_ddl(
    root: str,
    metadata_path: Optional[str] = None,
    schema_id: Optional[int] = None,
    variant_as: "str | None" = None,
    ns_as: "str | None" = None,
) -> str:
    """Spark DDL column list for ``schema_id`` (default current) — lets an
    empty snapshot read return zero rows WITH the right columns.
    ``metadata_path`` keeps a catalog-named metadata file authoritative
    (a directory scan could disagree after a failed-then-retried commit
    left an orphan newer file)."""
    meta = load_metadata(root, metadata_path)
    schema = None
    sid = schema_id if schema_id is not None else meta.get("current-schema-id")
    for s in meta.get("schemas", []):
        if s.get("schema-id") == sid:
            schema = s
            break
    if schema is None:
        schema = meta.get("schema")  # v1 single-schema form
    if schema is None:
        raise IcebergMetadataError("metadata carries no schema")
    return ", ".join(
        f"`{f['name']}` {_iceberg_type_to_ddl(f['type'], variant_as, ns_as)}"
        for f in schema["fields"]
    )


# --- schema evolution: field-id-based rename resolution ----------------------


def schema_name_history(
    root: str,
    metadata_path: Optional[str] = None,
    schema_id: Optional[int] = None,
) -> dict[str, str]:
    """Historical column name → CURRENT column name, joined on the field
    id across the metadata's schema log — the mapping a rename leaves
    behind (Iceberg renames are metadata-only; already-written data files
    keep the old parquet column name, and a spec-correct reader projects
    by field id, never by name).

    Raises :class:`IcebergMetadataError` when the history is ambiguous
    for a NAME-based file mapping: an old name that now denotes a
    different live field (rename a→b then add a new column a), or one
    old name pointing at two current names. Footer sniffing cannot tell
    those apart — the parquet-level field-id path (or compaction) is the
    remedy, and silently guessing would corrupt reads."""
    meta = load_metadata(root, metadata_path)
    schemas = meta.get("schemas") or (
        [meta["schema"]] if meta.get("schema") else []
    )
    current_id = (
        schema_id
        if schema_id is not None
        else meta.get("current-schema-id", 0)
    )
    current = next(
        (s for s in schemas if s.get("schema-id") == current_id),
        schemas[-1] if schemas else None,
    )
    if not current:
        return {}
    cur_by_id = {
        f["id"]: f["name"]
        for f in current.get("fields", [])
        if "id" in f and "name" in f
    }
    cur_names = set(cur_by_id.values())
    hist: dict[str, str] = {}
    ambiguous: set[str] = set()
    # Only schemas UP TO the target matter: a snapshot's files were all
    # written under schema-ids <= the snapshot's own, so later schemas
    # can neither supply mappings nor create collisions for this read
    # (keeps time travel working across an evolution that happened
    # AFTER the pinned snapshot).
    for s in schemas:
        if s.get("schema-id", 0) > current_id:
            continue
        for f in s.get("fields", []):
            fid, old = f.get("id"), f.get("name")
            cur = cur_by_id.get(fid)
            if old is None:
                continue
            if cur is None:
                # retired field id (DROP COLUMN). If its NAME was later
                # re-used by a different live field, name-based footer
                # mapping would RESURRECT the dropped column's bytes
                # into the new field — refuse instead.
                if old in cur_names:
                    ambiguous.add(old)
                continue
            if cur == old:
                continue
            if old in cur_names or (old in hist and hist[old] != cur):
                ambiguous.add(old)
            else:
                hist[old] = cur
    if ambiguous:
        raise IcebergMetadataError(
            f"ambiguous column history for {sorted(ambiguous)}: an old "
            "name collides with a live column (renamed away and re-used, "
            "or dropped and re-added), so name-based footer mapping "
            "cannot resolve old data files. Compact the table to rewrite "
            "files under the current schema."
        )
    return hist


# Footer column names are immutable for a given (immutable) Iceberg data
# file path, so cache them process-wide: without this, ANY rename in the
# schema log turns every subsequent read of the table into a re-fetch of
# every live file's footer — and for remote schemes (which fsio fetches
# whole at fixture scale) a double full-corpus download per query.
_FOOTER_NAME_CACHE: dict[str, list[str]] = {}


def parquet_column_names(path: str) -> list[str]:
    """Top-level column names from a parquet file's footer, cached per
    path (Iceberg data files are immutable). Local paths read the footer
    directly; served remote schemes go through fsio (the whole object at
    fixture scale — a production reader range-reads the footer)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfloe_spark.sources import fsio

    cached = _FOOTER_NAME_CACHE.get(path)
    if cached is not None:
        return cached
    if fsio.is_remote(path):
        names = pq.read_schema(pa.BufferReader(fsio.read_bytes(path))).names
    else:
        names = pq.read_schema(path.removeprefix("file://")).names
    _FOOTER_NAME_CACHE[path] = names
    return names


def scan_groups(
    root: str,
    paths: list[str],
    metadata_path: Optional[str] = None,
    schema_id: Optional[int] = None,
    variant_as: "str | None" = None,
    ns_as: "str | None" = None,
) -> list[tuple[list[str], dict[str, str], Optional[str], dict]]:
    """Partition a snapshot's data files for a schema-evolution-correct
    read: ``(paths, rename_map, read_schema_ddl, default_fills)`` per
    group.

    - No evolution (single schema in the log): one group, no rename, no
      explicit schema — the plain fast path, footers never touched.
    - Adds/drops only (multi-schema log, no renames): one group read under
      an EXPLICIT current-schema DDL, so columns added after a file was
      written surface as NULL (a footer-inferred read would silently pick
      one file's schema) and dropped columns are ignored. Footers still
      never touched.
    - Renames: files grouped by the old-name→current-name map their footer
      needs (field-id resolution via the schema log); each group reads
      under the current schema translated to ITS on-disk names, then
      renames after delete application.
    - v3 ``initial-default`` columns (r11): files are additionally
      grouped by WHICH defaulted columns their footer lacks, and each
      group's ``default_fills`` maps those columns to ``(json_value,
      spark_ddl_type)`` — the reader overwrites the NULL the explicit
      DDL produced with the default literal. Only tables that actually
      carry defaults pay the per-file footer read.
    """
    meta = load_metadata(root, metadata_path)
    schemas = meta.get("schemas") or []
    target_sid = (
        schema_id
        if schema_id is not None
        else meta.get("current-schema-id", 0)
    )
    evolved = len(schemas) > 1 or target_sid not in (0, None)
    # row-lineage tables (r11) ALWAYS read under an explicit DDL: their
    # rewritten (compacted) files carry a materialized ``_row_id``
    # parquet column that a footer-inferred read would leak into the
    # table's schema
    lineage = meta.get("next-row-id") is not None
    # variant tables (r12) also read under an explicit DDL: the reader
    # needs the PHYSICAL (metadata, value) struct form, never a
    # footer-inferred schema
    has_variant = bool(variant_columns(meta, target_sid))
    # ns-timestamp tables (r12) too: the physical BIGINT surface only
    # exists under an explicit DDL (an inferred read may pick a µs
    # file's TIMESTAMP and fork the union's schema)
    has_ns = bool(ns_timestamp_columns(meta, target_sid))
    hist = schema_name_history(root, metadata_path, schema_id=target_sid)
    fills = (
        schema_default_fills(meta, target_sid)
        if int(meta.get("format-version") or 1) >= 3
        else {}
    )
    if not hist and not fills:
        ddl = (
            current_schema_ddl(
                root, metadata_path, schema_id=target_sid,
                variant_as=variant_as, ns_as=ns_as,
            )
            if (evolved or lineage or has_variant or has_ns)
            else None
        )
        return [(list(paths), {}, ddl, {})]

    cur = _schema_for(meta, target_sid)
    fields = [
        (f["name"], _iceberg_type_to_ddl(f["type"], variant_as, ns_as))
        for f in cur["fields"]
    ]

    def _ddl(rmap: dict[str, str]) -> str:
        inv = {v: k for k, v in rmap.items()}
        return ", ".join(f"`{inv.get(n, n)}` {t}" for n, t in fields)

    groups: dict[tuple, tuple[list[str], dict[str, str], dict]] = {}
    for p in paths:
        cols = parquet_column_names(p)
        rmap = {c: hist[c] for c in cols if c in hist}
        present = {rmap.get(c, c) for c in cols}
        fill = {n: v for n, v in fills.items() if n not in present}
        key = (tuple(sorted(rmap.items())), tuple(sorted(fill)))
        groups.setdefault(key, ([], dict(rmap), fill))[0].append(p)
    return [(ps, rm, _ddl(rm), fl) for ps, rm, fl in groups.values()]


def _schema_for(meta: dict, schema_id: Optional[int] = None) -> dict:
    sid = (
        schema_id
        if schema_id is not None
        else meta.get("current-schema-id")
    )
    for s in meta.get("schemas", []):
        if s.get("schema-id") == sid:
            return s
    if meta.get("schema"):
        return meta["schema"]
    raise IcebergMetadataError("metadata carries no schema")


# --- partition pruning support ------------------------------------------------


def identity_partition_fields(
    root: str, metadata_path: Optional[str] = None
) -> list[tuple[str, str]]:
    """``(column_name, spark_ddl_type)`` for each IDENTITY-transform field
    of the default partition spec — the fields whose per-file values the
    reader can stamp as literals (non-identity transforms carry derived
    values that must NOT overwrite the source column; they contribute no
    pruning here and read normally)."""
    meta = load_metadata(root, metadata_path)
    specs = meta.get("partition-specs") or []
    spec_id = meta.get("default-spec-id", 0)
    spec = next((s for s in specs if s.get("spec-id") == spec_id), None)
    if not spec:
        return []
    by_id = {}
    schema = _schema_for(meta) if meta.get("schemas") or meta.get("schema") else None
    if schema:
        by_id = {
            f["id"]: (f["name"], _iceberg_type_to_ddl(f["type"]))
            for f in schema.get("fields", [])
            # variant/unknown fields can never be identity-partition
            # SOURCES; skip them instead of failing the whole table
            if "id" in f and _ddl_ok(f["type"])
        }
    out = []
    for f in spec.get("fields", []):
        if f.get("transform") != "identity":
            continue
        src = by_id.get(f.get("source-id"))
        if src:
            out.append(src)
    return out


def partition_specs_by_id(
    root: str, metadata_path: Optional[str] = None
) -> dict[int, list[dict]]:
    """EVERY partition spec in the metadata's spec log, keyed by spec-id,
    each field with its source-column resolution: ``{"field_name",
    "column", "transform", "type"}`` where ``column`` is the CURRENT
    schema name of the source field and ``type`` its Iceberg type string.

    Spec evolution means a table's files span specs: evaluating a file
    under the table DEFAULT spec is wrong whenever the file was written
    under an older one (no pruning on its fields at best; a field name
    reused across specs with a different transform at worst). Pruning
    must resolve each file's OWN spec via :func:`live_data_spec_ids`."""
    meta = load_metadata(root, metadata_path)
    specs = meta.get("partition-specs") or []
    try:
        schema = _schema_for(meta)
    except IcebergMetadataError:
        return {}
    by_id = {
        f["id"]: (f["name"], f["type"])
        for f in schema.get("fields", [])
        if "id" in f and isinstance(f.get("type"), str)
    }
    out: dict[int, list[dict]] = {}
    for spec in specs:
        sid = spec.get("spec-id")
        if sid is None:
            continue
        fields = []
        for f in spec.get("fields", []):
            src = by_id.get(f.get("source-id"))
            if src and f.get("transform"):
                fields.append(
                    {
                        "field_name": f.get("name"),
                        "column": src[0],
                        "transform": f["transform"],
                        "type": src[1],
                    }
                )
        out[sid] = fields
    return out


def partition_spec_fields(
    root: str, metadata_path: Optional[str] = None
) -> list[dict]:
    """The DEFAULT partition spec's fields (see
    :func:`partition_specs_by_id` for the full log — pruning resolves
    per-file specs through that; this remains for single-spec callers).
    """
    meta = load_metadata(root, metadata_path)
    return partition_specs_by_id(root, metadata_path).get(
        meta.get("default-spec-id", 0), []
    )


def live_data_spec_ids(
    root: str, snapshot: dict
) -> dict[str, Optional[int]]:
    """Relocated data-file path → the partition-spec id the file was
    written under (manifest entry ``spec_id`` stamp; None for entries
    written before the stamp existed — those may only be pruned when the
    table has a single spec, see the soundness rule in
    ``partition_pruning``'s callers)."""
    root_local = _norm_root(root)
    return {
        _relocate(f["file_path"], root_local): f.get("spec_id")
        for f in live_data_files(root, snapshot)
    }


def live_data_partitions(
    root: str, snapshot: dict
) -> dict[str, Optional[dict]]:
    """Relocated data-file path → stringified identity-partition values
    (None for files written without a partition tuple, e.g. compaction
    rewrites — those never prune)."""
    root_local = _norm_root(root)
    return {
        _relocate(f["file_path"], root_local): f.get("partition")
        for f in live_data_files(root, snapshot)
    }


def live_data_stats(root: str, snapshot: dict) -> dict[str, dict]:
    """Relocated data-file path → file-statistics record for metrics-based
    file skipping (Iceberg's InclusiveMetricsEvaluator surface,
    data_file fields 110/125/128 — the fixture stores them as
    name-keyed stringified maps, see iceberg_fixture._MANIFEST_SCHEMA):
    ``{"lower": {col: str}|None, "upper": {...}|None,
    "nulls": {col: int}|None, "records": int}``. Files written before the
    stats fields existed (or by rewrite/compaction paths) yield None maps
    and are never pruned."""
    root_local = _norm_root(root)
    out: dict[str, dict] = {}
    for f in live_data_files(root, snapshot):
        out[_relocate(f["file_path"], root_local)] = {
            "lower": f.get("lower_bounds"),
            "upper": f.get("upper_bounds"),
            "nulls": f.get("null_value_counts"),
            "records": f.get("record_count"),
        }
    return out


def schema_column_types(
    root: str, metadata_path: Optional[str] = None
) -> dict[str, str]:
    """Current-schema column name → primitive Iceberg type string (complex
    types omitted — metrics pruning only applies to primitives)."""
    meta = load_metadata(root, metadata_path)
    cur = _schema_for(meta)
    out: dict[str, str] = {}
    for f in cur.get("fields", []):
        t = f.get("type")
        if isinstance(t, str):
            out[f["name"]] = t
    return out


def resolve_ref(
    root: str, name: str, metadata_path: Optional[str] = None
) -> int:
    """Snapshot id for a named ref (tag or branch) from the metadata's
    ``refs`` map (Iceberg v2 table-metadata field). Unknown name → error
    listing the known refs."""
    meta = load_metadata(root, metadata_path)
    refs = meta.get("refs") or {}
    r = refs.get(name)
    if not isinstance(r, dict) or "snapshot-id" not in r:
        raise IcebergMetadataError(
            f"ref {name!r} not found (known refs: {sorted(refs)})"
        )
    return int(r["snapshot-id"])
